package graft.api

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

import graft.operators.EventOps

/** The reference's library surface (`generate_eventlog`,
  * event_reader.py:7-45) re-expressed as one declarative DataFrame
  * pipeline. Stage order preserves the reference's observable semantics,
  * including the quirks SURVEY.md §2.8 says to keep:
  *
  *   1. scan-side filters (resources / null case / scan-reduction
  *      exclusions / date range) — these all push to the source,
  *   2. rename to XES names + enum remap,
  *   3. post-load whitelist + lifecycle filters (stronger than the
  *      scan-side ones; lifecycle filter runs BEFORE the null fill, so
  *      null-lifecycle rows drop when `includeLifecycleStart=false` but
  *      survive as 'complete' when true),
  *   4. optional JSON widening of REMARKS,
  *   5. null fills.
  *
  * Divergences (decided, per SURVEY §2.8): flags are real booleans, not
  * truthy strings; caching is an explicit opt-in flag.
  */
object EventLogGenerator {

  final case class Params(
      resourceIds: Seq[String] = Nil,
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      includeBotMessages: Boolean = false,
      includeLifecycleStart: Boolean = false,
      deserializeRemarks: Boolean = false)

  /** Decode map for EVENT_TYPE (event_reader.py:11-16). */
  val EventTypeDecode: Map[String, String] = Map(
    "SERVICE_CUSTOM_MESSAGE_1" -> "USER_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_2" -> "BOT_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_3" -> "SERVICE_REQUEST")

  /** Declared superset schema for REMARKS (SURVEY §1.3) — the fast path;
    * schema inference is the opt-in two-pass mirror of the reference's
    * promote-every-key behavior.
    */
  val RemarksSchema: StructType = StructType(Seq(
    StructField("user", StringType),
    StructField("intent", StringType),
    StructField("stateLabel", StringType),
    StructField("serviceEndpoint", StringType),
    StructField("in-service-context", BooleanType)))

  def generate(eventlog: DataFrame, params: Params,
               inferRemarksSchema: Boolean = false): DataFrame = {
    val scanSide = eventlog
      .transform(EventOps.nullReject("CASE_ID"))
      .transform(EventOps.resourceFilter("RESOURCE", params.resourceIds))
      .transform(if (params.includeBotMessages) identity[DataFrame]
                 else EventOps.excludeValue("EVENT_TYPE", "SERVICE_CUSTOM_MESSAGE_2"))
      .transform(if (params.includeLifecycleStart) identity[DataFrame]
                 else EventOps.excludeValue("LIFECYCLE_PHASE", "start"))
      .transform(EventOps.dateRange("TIME_STAMP", params.startDate, params.endDate))

    val renamed = scanSide
      .transform(EventOps.rename(EventOps.XesRenames))
      .transform(EventOps.castTimestamp("time:timestamp"))
      .transform(EventOps.remapValues("EVENT_TYPE", EventTypeDecode))

    val postFiltered = renamed
      .transform(if (params.includeBotMessages) identity[DataFrame]
                 else EventOps.whitelist("EVENT_TYPE", Seq("SERVICE_REQUEST", "USER_MESSAGE")))
      .transform(if (params.includeLifecycleStart) identity[DataFrame]
                 else EventOps.equalityFilter("lifecycle:transition", "complete"))

    val widened =
      if (!params.deserializeRemarks) postFiltered
      else if (inferRemarksSchema) postFiltered.transform(EventOps.flattenJsonInferred("REMARKS"))
      else postFiltered.transform(EventOps.flattenJson("REMARKS", RemarksSchema))

    widened.transform(EventOps.fillDefaults(
      Map("lifecycle:transition" -> "complete", "serviceEndpoint" -> "", "user" -> ""),
      Map("in-service-context" -> false)))
  }

  /** End-to-end XES generation (reference `generateXESfile`,
    * app.py:180-218): generate → empty→None (the HTTP layer maps that to
    * 204) → parameter-keyed file → XES write.
    *
    * Date bounds: when `startDate`/`endDate` are absent they are
    * defaulted from the data (min/max of `time:timestamp` —
    * event_reader.py:26-29) and the RESOLVED bounds key the cache file
    * (app.py:221-226). The bounds are resolved at FULL timestamp
    * precision (not the reference's day truncation): `dateRange`
    * compares whole timestamps, so a day-truncated end bound would
    * exclude the last day's events and the dateless request would share
    * a key with an explicit-date twin whose content differs. With
    * full-precision bounds the twin's `ts >= min && ts <= max` filter
    * is a no-op, so the shared cache entry is byte-identical for both.
    * Divergence from the reference, documented: the reference's
    * route-level cache probe uses the raw (None) dates so a dateless
    * request can never hit the entry its own generation wrote. The
    * min/max probe is one cheap aggregate-only job; it doubles as the
    * emptiness check (null min = no rows).
    */
  def generateXes(eventlog: DataFrame, params: Params, cache: ResultCache,
                  inferRemarksSchema: Boolean = false,
                  useCache: Boolean = true): Option[Path] = {
    val df = generate(eventlog, params, inferRemarksSchema)
    val resolved =
      if (params.startDate.isDefined && params.endDate.isDefined) Some(params)
      else {
        val row = df.agg(
          org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.min(df("time:timestamp")), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
          org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.max(df("time:timestamp")), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head()
        if (row.isNullAt(0)) None // empty input → 204 intent
        else Some(params.copy(
          startDate = params.startDate.orElse(Some(row.getString(0))),
          endDate = params.endDate.orElse(Some(row.getString(1)))))
      }
    resolved.flatMap { p =>
      val key = cacheKey(p)
      // explicit opt-in probe (the reference's `use_cache` flag was dead
      // code, SURVEY §2.8.2); a regeneration still lands on the keyed
      // path, so later cached requests see the fresh artifact
      val hit = if (useCache) cache.lookup(key) else None
      hit.orElse {
        graft.xes.XesWriter.write(df, cache.pathFor(key))
      }
    }
  }

  /** Deterministic cache key (O-22): injective over the parameter tuple.
    * Unlike the reference's raw concatenation, fields are length-prefixed
    * so distinct tuples can't collide, and the whole key is hashed to
    * stay filesystem-safe.
    */
  def cacheKey(params: Params): String = {
    // Each resource id is length-prefixed individually and the list
    // carries its own element count, so Seq("a\u0000b") vs Seq("a","b")
    // and Nil vs Seq("") cannot collide (a flat separator-join would).
    val idsField = params.resourceIds.length.toString + ":" +
      params.resourceIds.map(id => s"${id.length}:$id").mkString
    // Options carry a presence tag: None and Some("") are DIFFERENT
    // requests (an empty date string parses to null and filters every
    // row, while an absent date means no bound), so they must never
    // share a cache entry — the ScalaCheck injectivity property caught
    // exactly this collision under a bare getOrElse("") encoding.
    def opt(o: Option[String]): String = o.fold("N")(s => s"S$s")
    val canonical = Seq(
      idsField,
      opt(params.startDate),
      opt(params.endDate),
      params.includeBotMessages.toString,
      params.includeLifecycleStart.toString,
      params.deserializeRemarks.toString
    ).map(f => s"${f.length}:$f").mkString("|")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(32)
  }
}

/** Parameter-keyed result cache with TTL eviction (O-5 + O-29).
  * Explicit opt-in per call (the reference's `use_cache` flag was dead
  * code — SURVEY §2.8.2); eviction deletes entries older than the TTL
  * rather than wiping the directory wholesale.
  */
final class ResultCache(dir: Path, ttlSeconds: Long = 60) {
  Files.createDirectories(dir)

  def pathFor(key: String, ext: String = "xes"): Path = dir.resolve(s"$key.$ext")

  def lookup(key: String, ext: String = "xes"): Option[Path] = {
    val p = pathFor(key, ext)
    if (Files.exists(p)) Some(p) else None
  }

  def evictExpired(): Int = {
    val cutoff = System.currentTimeMillis() - ttlSeconds * 1000
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      var n = 0
      while (it.hasNext) {
        val p = it.next()
        if (Files.getLastModifiedTime(p).toMillis < cutoff) {
          Files.deleteIfExists(p); n += 1
        }
      }
      n
    } finally s.close() // Files.list holds a directory handle until closed
  }

  /** Background eviction loop (reference: APScheduler interval job). */
  def startEvictionLoop(intervalSeconds: Long = 60): ScheduledExecutorService = {
    val ses = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-cache-evict"); t.setDaemon(true); t
    }
    ses.scheduleAtFixedRate(() => { try evictExpired() catch { case _: Throwable => () } },
      intervalSeconds, intervalSeconds, TimeUnit.SECONDS)
    ses
  }
}
