package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

object StreamingSpec {
  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class XesEv(case_id: String, ts: Timestamp, activity: String)
  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class EmbDoc(doc_id: Long, ts: Timestamp, embedding: Seq[Double])
  final case class Win(user_id: Long, start_ts: Timestamp, end_ts: Timestamp, promo_id: Long)
}

/** Streaming smoke gate: MemoryStream → watermarked session_window →
  * memory sink, and MemoryStream → foreachBatch XES sharded sink.
  * Sessions only emit in append mode once the watermark passes them,
  * so each test pushes a far-future flush event to close the windows.
  */
class StreamingSpec extends SparkSpec {
  import StreamingSpec._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("windowed counts: closed windows emit once, late events drop, sliding overlaps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val counts = EventStream.windowedCounts(in.toDF(), "ts", "user_id",
      windowDuration = "10 minutes", watermarkDelay = "5 minutes")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("wc_out").start()
    try {
      in.addData(
        Ev(1L, ts("2024-01-01 10:01:00"), "a"),
        Ev(1L, ts("2024-01-01 10:04:00"), "b"),
        Ev(2L, ts("2024-01-01 10:02:00"), "c"),
        Ev(1L, ts("2024-01-01 10:11:00"), "d")) // next window
      q.processAllAvailable()
      // nothing closed yet (watermark at 10:06); flush past both windows
      in.addData(Ev(99L, ts("2024-01-01 11:00:00"), "flush"))
      q.processAllAvailable()
      def rows = spark.table("wc_out")
        .select("window_start", "user_id", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), 1L, 2L),
        (ts("2024-01-01 10:00:00"), 2L, 1L),
        (ts("2024-01-01 10:10:00"), 1L, 1L)),
        s"closed windows exactly once: $rows")
      // a late event behind the watermark must not re-open 10:00
      in.addData(Ev(1L, ts("2024-01-01 10:03:00"), "late"))
      q.processAllAvailable()
      assert(!rows.exists(r => r._1 == ts("2024-01-01 10:00:00") && r._3 == 3L),
        "late event dropped, closed window not re-emitted")
    } finally q.stop()

    // sliding variant: one event lands in window/slide = 2 windows
    val in2 = MemoryStream[Ev]
    val sliding = EventStream.windowedCounts(in2.toDF(), "ts", "user_id",
      windowDuration = "10 minutes", slideDuration = Some("5 minutes"),
      watermarkDelay = "5 minutes")
    val q2 = sliding.writeStream.outputMode("append")
      .format("memory").queryName("wc_slide_out").start()
    try {
      in2.addData(Ev(1L, ts("2024-01-01 10:06:00"), "a"))
      in2.addData(Ev(99L, ts("2024-01-01 11:00:00"), "flush"))
      q2.processAllAvailable()
      val starts = spark.table("wc_slide_out").filter(col("user_id") === 1L)
        .select("window_start").collect().map(_.getTimestamp(0)).toSet
      assert(starts == Set(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
        s"event contributes to both overlapping windows: $starts")
    } finally q2.stop()
  }

  test("streaming prep pipeline composes: quality gate → watermarked dedup → chunk") {
    // the batch prep stages ARE the streaming stages: the stateless
    // ones (quality filter, chunking) run unchanged, and the only
    // stateful stage is the watermark-bounded dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.Chunking
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val prepped = Chunking.chunkDocuments(
      EventStream.dedupExact(
        docs.filter(size(split(col("text"), " ")) >= 4), "text", "ts",
        watermarkDelay = "10 minutes"),
      "doc_id", "text", chunkTokens = 8, overlapTokens = 2)
    val q = prepped.writeStream.outputMode("append")
      .format("memory").queryName("prep_stream_out").start()
    try {
      val long12 = (1 to 12).map(i => s"w$i").mkString(" ")
      in.addData(
        (1L, long12, ts("2024-01-01 10:00:00")),            // 12 toks → 2 chunks
        (2L, long12, ts("2024-01-01 10:01:00")),            // exact dup of 1 → dropped
        (3L, "too short", ts("2024-01-01 10:02:00")),       // quality gate drops
        (4L, "four tokens right here", ts("2024-01-01 10:03:00"))) // 1 chunk
      q.processAllAvailable()
      val rows = spark.table("prep_stream_out")
        .select("doc_id", "chunk_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(rows == Set((1L, 0), (1L, 1), (4L, 0)),
        s"dup and low-quality docs never reach the chunker: $rows")
    } finally q.stop()
  }

  test("streaming intra-doc cleaning: the row-local dedup tier runs unchanged on a stream") {
    // intraDocDedup is a pure HOF select — no state, no watermark, no
    // output-mode constraint — so the SAME operator object serves the
    // batch oracle query and the streaming ingest path (the map-only
    // plan gate in PlanShapeSpec is what makes this composition safe)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val cleaned = graft.llm.Dedup.intraDocDedup(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", w = 2)
    val q = cleaned.writeStream.outputMode("append")
      .format("memory").queryName("intradoc_stream_out").start()
    try {
      in.addData((1L, "nav bar alpha beta nav bar"), (2L, "x y x y x y"))
      q.processAllAvailable()
      in.addData((3L, "clean doc here now"))  // second microbatch
      q.processAllAvailable()
      val rows = spark.table("intradoc_stream_out")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
      assert(rows == Map(
        1L -> (("nav bar alpha beta", 1L)),
        2L -> (("x y", 2L)),
        3L -> (("clean doc here now", 0L))), s"got $rows")
    } finally q.stop()
  }

  test("streaming greedy packing: overflow closes packs, silence flushes the tail") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.{PackDoc, ClosedPack}
    val in = MemoryStream[PackDoc]
    val packs = EventStream.packStream(in.toDS(), budgetTokens = 128,
      flushGapMinutes = 30, watermarkDelay = "5 minutes")
    val q = packs.writeStream.outputMode("append")
      .format("memory").queryName("pack_out").start()
    try {
      in.addData(
        PackDoc("s1", 1L, ts("2024-01-01 10:00:00"), 50L),
        PackDoc("s1", 2L, ts("2024-01-01 10:01:00"), 60L),
        PackDoc("s1", 3L, ts("2024-01-01 10:02:00"), 30L),  // 110+30 overflows → pack 1 closes
        PackDoc("s2", 9L, ts("2024-01-01 10:00:00"), 5L))
      q.processAllAvailable()
      def rows = spark.table("pack_out").as[ClosedPack].collect()
        .map(p => (p.shard, p.packId, p.nDocs, p.packTokens, p.firstDoc, p.lastDoc)).toSet
      assert(rows == Set(("s1", 1L, 2L, 110L, 1L, 2L)),
        s"only the overflowed pack emits while shards are live: $rows")
      // cross-batch continuation: doc 4 joins the open pack 2 (30+90=120)
      in.addData(PackDoc("s1", 4L, ts("2024-01-01 10:03:00"), 90L))
      q.processAllAvailable()
      assert(rows == Set(("s1", 1L, 2L, 110L, 1L, 2L)), "open pack stays open across batches")
      // silence: watermark passes last-event + gap → tails flush
      in.addData(PackDoc("s3", 99L, ts("2024-01-01 12:00:00"), 1L))
      q.processAllAvailable()
      in.addData(PackDoc("s3", 98L, ts("2024-01-01 13:00:00"), 1L))
      q.processAllAvailable()
      assert(rows.contains(("s1", 2L, 2L, 120L, 3L, 4L)),
        s"tail pack flushed on event-time silence: $rows")
      assert(rows.contains(("s2", 1L, 1L, 5L, 9L, 9L)))
    } finally q.stop()
  }

  test("streaming decontamination: shared gram alerts once per doc, clean docs pass silently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over dogs"),
      (101L, "lorem ipsum dolor sit amet")).toDF("doc_id", "text")
    val in = MemoryStream[Doc]
    val alerts = EventStream.decontaminateStream(
      in.toDF(), bench, "doc_id", "text", "ts", n = 3)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try {
      in.addData(
        // shares TWO bench trigrams → still exactly one alert
        Doc(1L, ts("2024-01-01 10:00:00"), "said the quick brown fox jumps today"),
        // no 3-gram overlap (only unigram words collide) → silent
        Doc(2L, ts("2024-01-01 10:01:00"), "the slow brown dog sits around"),
        // bench doc 101's gram → alert
        Doc(3L, ts("2024-01-01 10:02:00"), "copy lorem ipsum dolor here now"),
        // too short for any trigram window shared with bench → silent
        Doc(4L, ts("2024-01-01 10:03:00"), "tiny note"))
      q.processAllAvailable()
      val got = spark.table("decon_out").select("doc_id").collect()
        .map(_.getLong(0)).toSeq
      assert(got.sorted == Seq(1L, 3L), s"alerts: $got")
      assert(got.size == 2, "one alert per contaminated doc, never per gram")
    } finally q.stop()
  }

  test("streaming semantic dedup: planted near-dups alert once in-watermark, clean docs silent, agrees with batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.Similarity
    val store = Seq(
      (101L, Seq(1.0, 0.2, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0)),
      (102L, Seq(0.0, 0.0, 1.0, 0.4, 0.0, 0.0, 0.2, 0.0)),
      (103L, Seq(0.3, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.5))
    ).toDF("vec_id", "embedding")
    val near101 = Seq(0.99, 0.21, 0.0, 0.0, 0.1, 0.0, 0.0, 0.01)
    val in = MemoryStream[EmbDoc]
    val alerts = EventStream.semanticDedupStream(in.toDF(), store,
      "doc_id", "embedding", "ts", "vec_id", threshold = 0.9,
      tables = 4, nbits = 2)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("semdedup_out").start()
    try {
      in.addData(
        EmbDoc(1L, ts("2024-01-01 10:00:00"), near101),                      // near-copy of 101
        EmbDoc(2L, ts("2024-01-01 10:01:00"),
          Seq(0.0, 1.0, 0.0, 0.0, -0.5, 0.0, 0.3, 0.0)),                     // clean
        EmbDoc(3L, ts("2024-01-01 10:02:00"),
          Seq(0.0, 0.0, 1.0, 0.4, 0.0, 0.0, 0.2, 0.0)))                      // exact copy of 102
      q.processAllAvailable()
      val got = spark.table("semdedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == Set((1L, 101L), (3L, 102L)), s"alerts: $got")
      // same doc id again inside the watermark: state dedups, no re-alert
      in.addData(EmbDoc(1L, ts("2024-01-01 10:03:00"), near101))
      q.processAllAvailable()
      assert(spark.table("semdedup_out").count() == 2,
        "one alert per doc, never per table/neighbor/retry")
      // batch-twin agreement: the exact SemDeDup pair scan over
      // (stream docs ∪ store) must flag exactly the alerted doc ids
      // as having a store-side partner at the same threshold
      val combined = Seq(
        (1L, near101),
        (2L, Seq(0.0, 1.0, 0.0, 0.0, -0.5, 0.0, 0.3, 0.0)),
        (3L, Seq(0.0, 0.0, 1.0, 0.4, 0.0, 0.0, 0.2, 0.0))
      ).toDF("id", "embedding").unionByName(
        store.select(col("vec_id").as("id"), col("embedding")))
      val batchFlagged = Similarity.cosineNearDupPairs(combined, "id",
          "embedding", threshold = 0.9)
        .filter(col("id_a") < 100 && col("id_b") >= 100)
        .select("id_a").collect().map(_.getLong(0)).toSet
      assert(batchFlagged == got.map(_._1),
        s"stream alerts ${got.map(_._1)} != batch twin $batchFlagged")
    } finally q.stop()
  }

  test("streaming sessionization: gap splits sessions, append emits closed ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val sessions = EventStream.sessionize(in.toDF(), "user_id", "ts",
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      in.addData(
        Ev(1L, ts("2024-01-01 10:00:00"), "click"),
        Ev(1L, ts("2024-01-01 10:10:00"), "view"),     // same session (gap 10m < 30m)
        Ev(1L, ts("2024-01-01 11:30:00"), "click"),    // new session (gap 80m)
        Ev(2L, ts("2024-01-01 10:05:00"), "purchase")) // other user
      q.processAllAvailable()
      // close everything: advance the watermark far past all sessions
      in.addData(Ev(99L, ts("2024-01-02 00:00:00"), "flush"))
      q.processAllAvailable()

      val rows = spark.table("sessions_out")
        .select("session_id", "user_id", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(
        (s"1-${ts("2024-01-01 10:00:00").getTime / 1000}", 1L, 2L),
        (s"1-${ts("2024-01-01 11:30:00").getTime / 1000}", 1L, 1L),
        (s"2-${ts("2024-01-01 10:05:00").getTime / 1000}", 2L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup: within-watermark copies drop, post-eviction copies re-emit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Doc]
    val deduped = EventStream.dedupExact(in.toDF(), "text", "ts",
      watermarkDelay = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), "alpha beta"),
        Doc(2L, ts("2024-01-01 10:01:00"), "alpha beta"),   // dup within watermark
        Doc(3L, ts("2024-01-01 10:02:00"), "gamma delta"))
      q.processAllAvailable()
      in.addData(Doc(4L, ts("2024-01-01 10:03:00"), "alpha beta")) // later batch, still in window
      q.processAllAvailable()
      def ids = spark.table("dedup_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"within-watermark dedup failed: $ids")
      // advance the watermark far past the keys: state evicts, and a
      // much-later copy re-emits — the documented within-watermark
      // contract whose state-eviction is what bounds memory unbounded
      in.addData(Doc(5L, ts("2024-01-01 12:00:00"), "flush"))
      q.processAllAvailable()
      in.addData(Doc(6L, ts("2024-01-01 12:01:00"), "alpha beta"))
      q.processAllAvailable()
      assert(ids == Set(1L, 3L, 5L, 6L), s"post-eviction re-emit failed: $ids")
    } finally q.stop()
  }

  test("flatMapGroupsWithState trace assembly: gap timeout emits the whole ordered trace once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.TraceEvent
    val in = MemoryStream[TraceEvent]
    val traces = EventStream.assembleTraces(in.toDS(), gapMinutes = 30,
      watermarkDelay = "10 minutes")
    val q = traces.writeStream.outputMode("append")
      .format("memory").queryName("traces_out").start()
    try {
      in.addData(
        TraceEvent("c1", ts("2024-01-01 10:00:05"), "b"), // out of order on purpose
        TraceEvent("c1", ts("2024-01-01 10:00:00"), "a"),
        TraceEvent("c2", ts("2024-01-01 10:01:00"), "x"))
      q.processAllAvailable()
      // two flush batches: the first advances the watermark, the second
      // lets the event-time timeouts fire against it
      in.addData(TraceEvent("flush", ts("2024-01-02 00:00:00"), "f"))
      q.processAllAvailable()
      in.addData(TraceEvent("flush2", ts("2024-01-02 00:00:01"), "f"))
      q.processAllAvailable()

      val rows = spark.table("traces_out")
        .select("caseId", "nEvents", "activities").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2).toList)).toSet
      assert(rows == Set(
        ("c1", 2, List("a", "b")), // chronological despite arrival order
        ("c2", 1, List("x"))))
    } finally q.stop()
  }

  test("streaming episodes: switch emits closed runs, timeout flushes the open one, agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.{Episode, EpisodeEvent}
    val in = MemoryStream[EpisodeEvent]
    val q = EventStream.episodeStream(in.toDS(), closeAfterMinutes = 5,
        watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("episodes_out").start()
    try {
      // u1: a,a then (next batch) b — the a-run must close on the switch;
      // within-batch arrival order is deliberately scrambled
      in.addData(
        EpisodeEvent(1L, ts("2024-01-01 10:01:00"), "a"),
        EpisodeEvent(1L, ts("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("episodes_out").count() == 0,
        "an open run must not emit")
      in.addData(EpisodeEvent(1L, ts("2024-01-01 10:02:00"), "b"))
      q.processAllAvailable()
      val closedA = spark.table("episodes_out").as[Episode].collect()
      assert(closedA.toSeq == Seq(Episode(1L, "a",
        ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 2L)),
        s"switch must close the a-run exactly once, got ${closedA.toSeq}")
      // two flush batches advance the watermark past endTs + 5 min and
      // let the event-time timeout flush the open b-run
      in.addData(EpisodeEvent(99L, ts("2024-01-02 00:00:00"), "z"))
      q.processAllAvailable()
      in.addData(EpisodeEvent(98L, ts("2024-01-02 00:00:01"), "z"))
      q.processAllAvailable()
      val all = spark.table("episodes_out").as[Episode].collect()
        .filter(_.userId == 1L)
      assert(all.toSet == Set(
        Episode(1L, "a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 2L),
        Episode(1L, "b", ts("2024-01-01 10:02:00"), ts("2024-01-01 10:02:00"), 1L)),
        s"timeout must flush the open run once, got ${all.toSet}")
      // batch twin on the same u1 events: identical episode rows
      val batch = Seq(
        (1L, "a", ts("2024-01-01 10:00:00"), 1L),
        (1L, "a", ts("2024-01-01 10:01:00"), 2L),
        (1L, "b", ts("2024-01-01 10:02:00"), 3L))
        .toDF("user_id", "activity", "ts", "event_id")
      val bt = graft.analytics.Timeline
        .episodes(batch, "user_id", "activity", "ts", "event_id")
        .collect().map(r => (r.getString(2), r.getTimestamp(3),
          r.getTimestamp(4), r.getLong(5))).toSet
      assert(bt == all.map(e => (e.activity, e.startTs, e.endTs, e.nEvents)).toSet,
        "stream episodes must agree with the batch twin")
    } finally q.stop()
  }

  test("stream-static as-of enrich: latest preceding state attaches, none -> null") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val state = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0))
      .toDF("user_id", "state_ts", "price")
      .withColumnRenamed("state_ts", "ts")
    val enriched = EventStream.asofEnrich(
      in.toDF().withColumnRenamed("ts", "ts"), state,
      keyCol = "user_id", tsCol = "ts", payloadCols = Seq("price"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      in.addData(
        Ev(1L, ts("2024-01-01 09:00:00"), "before_any"),   // no state yet -> null
        Ev(1L, ts("2024-01-01 10:00:00"), "at_first"),     // inclusive -> 100
        Ev(1L, ts("2024-01-01 10:59:00"), "mid"),          // -> 100
        Ev(1L, ts("2024-01-01 12:00:00"), "after_last"),   // -> 110
        Ev(2L, ts("2024-01-01 11:00:00"), "other_key"),    // -> 200
        Ev(3L, ts("2024-01-01 11:00:00"), "no_state"))     // -> null
      q.processAllAvailable()
      val rows = spark.table("asof_out")
        .select("event_type", "price").collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      assert(rows == Set(
        ("before_any", None), ("at_first", Some(100.0)), ("mid", Some(100.0)),
        ("after_last", Some(110.0)), ("other_key", Some(200.0)), ("no_state", None)))
      assert(spark.table("asof_out").count() == 6, "exactly one row per event")
    } finally q.stop()
  }

  test("streaming interval join: in-watermark events match, late events drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evIn = MemoryStream[Ev]
    val winIn = MemoryStream[Win]
    val joined = EventStream.intervalJoinStream(
      evIn.toDF(), winIn.toDF(),
      keyCol = "user_id", tsCol = "ts", startCol = "start_ts", endCol = "end_ts",
      maxSpanSeconds = 7200, eventDelay = "10 minutes", intervalDelay = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      winIn.addData(
        Win(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 100L),
        Win(1L, ts("2024-01-01 10:00:00"), ts("2024-01-02 20:00:00"), 666L), // > maxSpan: dropped
        Win(2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 200L))
      evIn.addData(
        Ev(1L, ts("2024-01-01 10:30:00"), "inside"),   // in window 100
        Ev(1L, ts("2024-01-01 12:00:00"), "outside"),  // after window 100 ends
        Ev(3L, ts("2024-01-01 10:30:00"), "nokey"))    // no window for user 3
      q.processAllAvailable()
      def rows = spark.table("ij_out")
        .select("event_type", "promo_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("inside", 100L)),
        s"expected exactly the in-window match, got $rows")

      // advance both watermarks far past the windows, then replay an
      // event that WOULD have matched window 100: it is late (older
      // than the event watermark) and must be dropped, not matched
      // against evicted state
      evIn.addData(Ev(98L, ts("2024-01-01 15:00:00"), "flush"))
      winIn.addData(Win(97L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:01:00"), 999L))
      q.processAllAvailable()
      evIn.addData(Ev(1L, ts("2024-01-01 10:45:00"), "late"))
      q.processAllAvailable()
      assert(rows == Set(("inside", 100L)),
        s"late event must not join against evicted interval state: $rows")
    } finally q.stop()
  }

  test("XES sink checkpoint recovery: restart resumes without duplicating traces") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[XesEv]
    val out = tmpDir("stream-xes-rec")
    val ckpt = tmpDir("stream-ckpt-rec")
    def log = in.toDF()
      .withColumnRenamed("case_id", "case:concept:name")
      .withColumnRenamed("ts", "time:timestamp")
      .withColumnRenamed("activity", "concept:name")

    val q1 = EventStream.xesSink(log, out.toString, ckpt.toString)
    in.addData(XesEv("r1", ts("2024-01-01 09:00:00"), "a"))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint; only the new data may land
    val q2 = EventStream.xesSink(log, out.toString, ckpt.toString)
    in.addData(XesEv("r2", ts("2024-01-01 09:05:00"), "b"))
    q2.processAllAvailable()
    q2.stop()

    val caseIds = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("batch-")).flatMap { d =>
        Files.list(d).iterator().asScala
          .filter(f => f.getFileName.toString.startsWith("part-") && Files.size(f) > 0)
          .flatMap { f =>
            val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
              .newDocumentBuilder().parse(f.toFile)
            val traces = doc.getElementsByTagName("trace")
            (0 until traces.getLength).map { i =>
              traces.item(i).asInstanceOf[org.w3c.dom.Element]
                .getElementsByTagName("string").item(0)
                .getAttributes.getNamedItem("value").getNodeValue
            }
          }
      }.toSeq
    assert(caseIds.sorted == Seq("r1", "r2")) // each exactly once
  }

  test("streaming XES sink: each micro-batch lands as a parseable sharded XES dir") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[XesEv]
    val out = tmpDir("stream-xes")
    val ckpt = tmpDir("stream-ckpt")
    val log = in.toDF()
      .withColumnRenamed("case_id", "case:concept:name")
      .withColumnRenamed("ts", "time:timestamp")
      .withColumnRenamed("activity", "concept:name")
    val q = EventStream.xesSink(log, out.toString, ckpt.toString)
    try {
      in.addData(
        XesEv("c1", ts("2024-01-01 09:00:00"), "a"),
        XesEv("c1", ts("2024-01-01 09:00:05"), "b"),
        XesEv("c2", ts("2024-01-01 09:01:00"), "a"))
      q.processAllAvailable()

      val batchDirs = Files.list(out).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("batch-")).toSeq
      assert(batchDirs.nonEmpty)
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      val caseIds = batchDirs.flatMap { d =>
        Files.list(d).iterator().asScala
          .filter(f => f.getFileName.toString.startsWith("part-") && Files.size(f) > 0)
          .flatMap { f =>
            val doc = dbf.newDocumentBuilder().parse(f.toFile) // well-formed check
            val traces = doc.getElementsByTagName("trace")
            (0 until traces.getLength).map { i =>
              traces.item(i).asInstanceOf[org.w3c.dom.Element]
                .getElementsByTagName("string").item(0)
                .getAttributes.getNamedItem("value").getNodeValue
            }
          }
      }
      assert(caseIds.sorted == Seq("c1", "c2"))
    } finally q.stop()
  }

  test("streaming burst alerts: planted burst fires, human pace silent, emits at watermark close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = EventStream.burstAlerts(in.toDF(), "user_id", "ts",
        windowSec = 60, threshold = 5L, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("burst_alerts")
      .outputMode("append").start()
    try {
      // u1: six events in 20 s (a burst); u2: one event per 10 min
      in.addData((1 to 6).map(i => Ev(1L, ts(f"2024-01-01 10:00:0$i"), "click")) ++
        (0 to 5).map(i => Ev(2L, ts(f"2024-01-01 10:${i}0:00"), "view")): _*)
      q.processAllAvailable()
      // flush event far in the future closes all windows
      in.addData(Ev(9L, ts("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("burst_alerts")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.nonEmpty && rows.forall(_._1 == 1L),
        s"only the burst user may alert, got ${rows.toSeq}")
      assert(rows.exists(_._2 == 6L),
        "the 20 s burst lies entirely inside some half-slid window")
    } finally q.stop()
  }

  test("streaming funnel: emits once on completion, agrees with batch, never re-emits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.{Conversion, FunnelEvent}
    val in = MemoryStream[FunnelEvent]
    val q = EventStream.funnelStream(in.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // u1 converts across batches; u2 stalls at click; u3's purchase
      // arrives BEFORE its click — strict order must reject it
      in.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(2L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(3L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(3L, ts("2024-01-01 10:00:10"), "purchase"))
      q.processAllAvailable()
      in.addData(
        FunnelEvent(1L, ts("2024-01-01 10:01:00"), "click"),
        FunnelEvent(2L, ts("2024-01-01 10:01:00"), "click"),
        FunnelEvent(3L, ts("2024-01-01 10:01:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 0,
        "no conversion before the final stage fills")
      in.addData(
        FunnelEvent(1L, ts("2024-01-01 10:02:30"), "purchase"),
        // u1 purchases AGAIN — must not re-emit
        FunnelEvent(1L, ts("2024-01-01 10:03:00"), "purchase"))
      q.processAllAvailable()
      val out = spark.table("funnel_stream").as[Conversion].collect()
      assert(out.toSeq == Seq(Conversion(1L, ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:02:30"), 150L)),
        s"exactly one conversion for u1, got ${out.toSeq}")
      // batch twin on the same events: identical staged outcome
      val batch = Seq(
        (1L, "view", ts("2024-01-01 10:00:00")),
        (1L, "click", ts("2024-01-01 10:01:00")),
        (1L, "purchase", ts("2024-01-01 10:02:30")),
        (1L, "purchase", ts("2024-01-01 10:03:00")),
        (2L, "view", ts("2024-01-01 10:00:00")),
        (2L, "click", ts("2024-01-01 10:01:00")),
        (3L, "view", ts("2024-01-01 10:00:00")),
        (3L, "purchase", ts("2024-01-01 10:00:10")),
        (3L, "click", ts("2024-01-01 10:01:00"))
      ).toDF("user_id", "event_type", "ts")
      val bt = graft.analytics.Funnel.stageTimes(batch, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
      assert(bt(1L).contains(ts("2024-01-01 10:02:30")) && bt(2L).isEmpty &&
        bt(3L).isEmpty, "stream conversions must agree with the batch twin")
      // one more purchase much later — state is terminal, still silent
      in.addData(FunnelEvent(1L, ts("2024-01-01 11:00:00"), "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 1)
    } finally q.stop()
  }

  test("streaming index maintenance: upserts land bit-equal to a rebuild, snapshots immutable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.IndexMaintenance
    import graft.llm.Retrieval
    val in = MemoryStream[Doc]
    val idxDir = tmpDir("lexidx-stream").toString
    val ckpt = tmpDir("lexidx-ckpt").toString
    val q = IndexMaintenance.maintainLexIndex(
      in.toDF().select("doc_id", "text"), idxDir, ckpt, "doc_id", "text")
    try {
      in.addData(
        Doc(1L, ts("2024-01-01 09:00:00"), "key row key"),
        Doc(2L, ts("2024-01-01 09:00:01"), "hash table scan"))
      q.processAllAvailable()
      val v1 = IndexMaintenance.latestVersion(spark, idxDir).get
      val v1Postings = Retrieval.loadLexIndex(spark, "doc_id", v1)
        .postings.collect().toSet
      // batch 2: doc 2 CHANGES, doc 3 arrives — an upsert, not append
      in.addData(
        Doc(2L, ts("2024-01-01 09:10:00"), "hash hash join"),
        Doc(3L, ts("2024-01-01 09:10:01"), "scan table row"))
      q.processAllAvailable()
      val v2 = IndexMaintenance.latestVersion(spark, idxDir).get
      assert(v2 != v1, "a new micro-batch must publish a NEW version")
      val got = Retrieval.loadLexIndex(spark, "doc_id", v2)
      val full = Retrieval.buildLexIndex(
        Seq((1L, "key row key"), (2L, "hash hash join"),
          (3L, "scan table row")).toDF("doc_id", "text"), "doc_id", "text")
      assert(got.postings.collect().toSet == full.postings.collect().toSet)
      assert(got.termDf.collect().toSet == full.termDf.collect().toSet)
      assert(got.docLens.collect().toSet == full.docLens.collect().toSet)
      assert(got.stats.collect().toSet == full.stats.collect().toSet)
      val probe = Seq(0 -> Seq("hash", "row"))
      assert(Retrieval.bm25TopKWith(got, "doc_id", probe, k = 3).collect().toSet ==
        Retrieval.bm25TopKWith(full, "doc_id", probe, k = 3).collect().toSet,
        "a search through the streamed index must equal the rebuild bit-for-bit")
      // the v1 snapshot is immutable — still loadable, still its old content
      assert(Retrieval.loadLexIndex(spark, "doc_id", v1)
        .postings.collect().toSet == v1Postings,
        "published snapshots must never mutate")
    } finally q.stop()
  }

  test("streaming index maintenance: duplicate ids in one batch fail loud; minhash arm matches rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.IndexMaintenance
    import graft.llm.Dedup
    // duplicate ids: no well-defined winner — the upsert must refuse
    val dup = Seq((1L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      IndexMaintenance.upsertLexBatch(dup,
        tmpDir("lexidx-dup").toString, "doc_id", "text", "v0")
    }
    assert(ex.getMessage.contains("duplicate"))

    val in = MemoryStream[Doc]
    val idxDir = tmpDir("mhidx-stream").toString
    val ckpt = tmpDir("mhidx-ckpt").toString
    val q = IndexMaintenance.maintainMinhashIndex(
      in.toDF().select("doc_id", "text"), idxDir, ckpt, "doc_id", "text",
      numHashes = 16, nBands = 4, shingleN = 2)
    try {
      in.addData(Doc(1L, ts("2024-01-01 09:00:00"), "the quick brown fox jumps"))
      q.processAllAvailable()
      in.addData(
        Doc(1L, ts("2024-01-01 09:10:00"), "the quick brown fox sleeps"),
        Doc(2L, ts("2024-01-01 09:10:01"), "entirely different words here"))
      q.processAllAvailable()
      val v = IndexMaintenance.latestVersion(spark, idxDir).get
      val got = Dedup.loadMinhashIndex(spark, "doc_id", v)
      val full = Dedup.buildMinhashIndex(
        Seq((1L, "the quick brown fox sleeps"),
          (2L, "entirely different words here")).toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 16, nBands = 4, shingleN = 2)
      assert(got.sigs.collect().toSet == full.sigs.collect().toSet,
        "streamed signature store must equal the rebuild (changed doc re-signed once)")
      assert(got.bands.collect().toSet == full.bands.collect().toSet)
      // the store's params survive; a probe through the streamed index
      // alerts on a verbatim copy of the CURRENT doc 1, not the old one
      val alert = Dedup.minhashProbe(got,
        Seq((99L, "the quick brown fox sleeps")).toDF("doc_id", "text"),
        "doc_id", "text", thresholdMicro = 1000000L).collect()
      assert(alert.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq((99L, 1L, 1000000L)))
    } finally q.stop()
  }

  test("streaming media quarantine: the row-local audit runs unchanged on an ingest stream") {
    // auditMedia is a pure Catalyst CASE over length + header parse —
    // no state, no watermark — so the SAME operator serves the batch
    // audit and the crawl-ingest stream; this pins that the binary
    // column and the CASE survive the streaming planner and that the
    // stream's verdicts equal the batch twin's per row.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.Multimodal
    val batch = Multimodal.withFakeMedia(
      Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text").select("doc_id", "media")
      .unionByName(Seq(
        (3L, null.asInstanceOf[Array[Byte]]),   // null_media
        (4L, Array[Byte](1, 2, 3)),             // short_header
        (5L, Array.fill[Byte](8)(0))            // empty_payload
      ).toDF("doc_id", "media"))
    val want = Multimodal.auditMedia(batch, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val in = MemoryStream[(Long, Array[Byte])]
    val audited = Multimodal.auditMedia(
      in.toDF().toDF("doc_id", "media"), "doc_id", "media")
    val q = audited.writeStream.outputMode("append")
      .format("memory").queryName("media_quarantine_stream").start()
    try {
      in.addData(batch.collect().map(r =>
        (r.getLong(0), r.getAs[Array[Byte]]("media"))).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("media_quarantine_stream")
        .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(got == want,
        s"stream verdicts must equal the batch twin: $got vs $want")
      assert(got(3L).contains("null_media") && got(4L).contains("short_header")
        && got(5L).contains("empty_payload") && got(1L).isEmpty)
    } finally q.stop()
  }

  test("streaming artifact scoring: a ModelStore-loaded scorer runs unchanged on a stream") {
    // the train-batch / score-stream split: the quality scorer is a
    // row-local HOF with the weight table as a plan literal, so the
    // SAME operator serves the batch query and the streaming ingest
    // path once the weights come from the store — no retrain on the
    // hot path, no state, no watermark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (w, b) = graft.llm.TextOps.trainQualityScorerWeak(docs, "doc_id",
      "text", Seq("the", "a", "of", "and", "is", "to"), dims = 128,
      iters = 50, trainSample = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_qs_").toString + "/m"
    graft.api.ModelStore.saveQualityScorer(spark, w, b, path)
    val (lw, lb) = graft.api.ModelStore.loadQualityScorer(spark, path)
    val in = MemoryStream[(Long, String)]
    val scored = graft.llm.TextOps.qualityScoreLearned(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", lw, lb)
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("qscore_stream_out").start()
    try {
      val probe = docs.limit(3).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(probe.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("qscore_stream_out")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("q_score"))))
        .sortBy(_._1).toSeq
      val batch = graft.llm.TextOps.qualityScoreLearned(
        docs.limit(3), "doc_id", "text", lw, lb)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("q_score"))))
        .sortBy(_._1).toSeq
      assert(streamed == batch,
        "stream scoring must be bit-equal to the batch tier")
    } finally q.stop()
  }

  test("ksDriftStream: clean window reads 0, shifted window alerts, both bit-equal to the batch KS, closed windows emit once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.ScoreEvent
    import graft.analytics.Forensics
    // reference = {1.0, 2.0, 3.0, 4.0} as a milli histogram
    val reference = Seq(1000L -> 1L, 2000L -> 1L, 3000L -> 1L, 4000L -> 1L)
    val in = MemoryStream[ScoreEvent]
    val out = EventStream.ksDriftStream(in.toDS(), reference,
      windowMinutes = 10, alertMicro = 500000L,
      watermarkDelay = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ks_out").start()
    try {
      val w1 = Seq(1.0, 2.0, 3.0, 4.0)           // ≡ reference → ks 0
      val w2 = Seq(51.0, 52.0)                   // disjoint → ks 1e6
      in.addData(w1.map(v => ScoreEvent(v, ts("2024-01-01 10:01:00"))): _*)
      in.addData(w2.map(v => ScoreEvent(v, ts("2024-01-01 10:11:00"))): _*)
      in.addData(ScoreEvent(9.9, ts("2024-01-01 11:00:00")))  // flush
      q.processAllAvailable()
      val rows = spark.table("ks_out").collect()
        .map(r => r.getTimestamp(0) -> r).toMap
      val clean = rows(ts("2024-01-01 10:00:00"))
      assert(clean.getLong(3) == 0L && !clean.getBoolean(5), s"got $clean")
      val drifted = rows(ts("2024-01-01 10:10:00"))
      assert(drifted.getLong(3) == 1000000L && drifted.getBoolean(5))
      // bit-equal to the batch twin on the same window slices
      def batch(vals: Seq[Double]) = Forensics.ksTwoSample(
        Seq(1.0, 2.0, 3.0, 4.0).toDF("value"), vals.toDF("value"), "value")
        .head()
      val b1 = batch(w1); val b2 = batch(w2)
      assert(clean.getLong(3) == b1.getLong(2)
        && clean.getLong(4) == b1.getLong(3), "clean ≡ batch incl. at_v")
      assert(drifted.getLong(3) == b2.getLong(2)
        && drifted.getLong(4) == b2.getLong(3), "drifted ≡ batch incl. at_v")
      // a late event behind the watermark must not re-emit the window
      val before = spark.table("ks_out").count()
      in.addData(ScoreEvent(1.0, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      assert(spark.table("ks_out").count() == before,
        "closed windows report exactly once")
    } finally q.stop()
  }

  test("streaming isotonic calibration: a ModelStore-loaded mapping remaps a stream bit-equal to batch, unseen scores NULL") {
    // MEASURE → FIX → SERVE: the PAV fit is batch-trained, persisted,
    // and the apply is a stateless broadcast equi-join — the same
    // operator on the stream and the batch path
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.TextOps
    val train = (Seq.fill(8)((true, 900000L)) ++ Seq.fill(2)((false, 900000L)) ++
      Seq.fill(6)((true, 100000L)) ++ Seq.fill(4)((false, 100000L)))
      .toDF("y", "s")
    val fit = TextOps.isotonicFit(train, "y", "s")
      .select("s", "rate_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft_iso_")
      .toString + "/m"
    graft.api.ModelStore.saveIsotonic(spark, fit, path)
    val loaded = graft.api.ModelStore.loadIsotonic(spark, path)
    assert(loaded.sorted == fit.sorted, "store round-trip is exact")
    val in = MemoryStream[(Long, Long)]
    val out = TextOps.isotonicApply(
      in.toDF().toDF("id", "s"), "s", loaded)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("iso_stream_out").start()
    try {
      in.addData((1L, 900000L), (2L, 100000L), (3L, 555555L)) // 3 unseen
      q.processAllAvailable()
      val got = spark.table("iso_stream_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      val batch = TextOps.isotonicApply(
        Seq((1L, 900000L), (2L, 100000L), (3L, 555555L)).toDF("id", "s"),
        "s", loaded).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(got == batch, s"stream ≡ batch: $got vs $batch")
      assert(got(3L).isEmpty, "an unseen score is NULL, never a guess")
      assert(got(1L).contains(800000L) && got(2L).contains(600000L),
        s"empirical rates served: $got")
    } finally q.stop()
  }

  test("isotonic serve drift guard: recalibrate fires on the planted drift window, silent otherwise") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.ScoreEvent
    import graft.llm.TextOps
    // fit-time distribution: the SAME train the serve test calibrates
    // on — per-distinct-score (s, n) from the PAV fit, 10×900000 and
    // 10×100000
    val train = (Seq.fill(8)((true, 900000L)) ++ Seq.fill(2)((false, 900000L)) ++
      Seq.fill(6)((true, 100000L)) ++ Seq.fill(4)((false, 100000L)))
      .toDF("y", "s")
    val fitHist = TextOps.isotonicFit(train, "y", "s")
      .select("s", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val in = MemoryStream[ScoreEvent]
    val out = EventStream.isotonicServeDriftStream(in.toDS(), fitHist,
      windowMinutes = 10, alertMicro = 400000L,
      watermarkDelay = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("iso_drift_out").start()
    try {
      // window 10:00 — scores in the fit proportions (50/50): KS 0
      in.addData(
        ScoreEvent(900000.0, ts("2024-01-01 10:01:00")),
        ScoreEvent(100000.0, ts("2024-01-01 10:02:00")),
        ScoreEvent(900000.0, ts("2024-01-01 10:03:00")),
        ScoreEvent(100000.0, ts("2024-01-01 10:04:00")))
      // window 10:10 — every score UNSEEN at fit: the serve side
      // would NULL all three; the guard must flag
      in.addData(
        ScoreEvent(555555.0, ts("2024-01-01 10:11:00")),
        ScoreEvent(555555.0, ts("2024-01-01 10:12:00")),
        ScoreEvent(555556.0, ts("2024-01-01 10:13:00")))
      in.addData(ScoreEvent(900000.0, ts("2024-01-01 11:00:00"))) // flush
      q.processAllAvailable()
      val rows = spark.table("iso_drift_out").collect()
        .map(r => r.getTimestamp(0) -> r).toMap
      val clean = rows(ts("2024-01-01 10:00:00"))
      assert(clean.getLong(3) == 0L && !clean.getBoolean(5),
        s"fit-shaped window must stay silent: $clean")
      assert(clean.getLong(2) == 0L, "no unseen mass in the clean window")
      val drifted = rows(ts("2024-01-01 10:10:00"))
      assert(drifted.getBoolean(5), s"planted drift must flag: $drifted")
      // unseen 555555s sit between the fit scores: ref CDF 0.5 vs
      // window CDF 1.0 there → KS exactly 500000
      assert(drifted.getLong(3) == 500000L, s"exact KS: $drifted")
      assert(drifted.getLong(2) == 3L,
        "every event the serve side would NULL is counted unseen")
    } finally q.stop()
  }

  test("media dedup stream: re-encoded twin alerts once against the store, fresh/undecodable stay silent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.Multimodal
    // static fingerprint store: the pixel hashes of 6 corpus images
    val store = Multimodal.dHashPixel(
        (1L to 6L).map(i => (i, Multimodal.synthImage(i)))
          .toDF("doc_id", "media"), "doc_id", "media")
      .select(col("id").as("sid"), col("dhash64").as("sdh"))
    val in = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val out = EventStream.mediaDedupStream(
      in.toDF().toDF("id", "media", "ts"), store,
      "id", "media", "ts", "sid", "sdh",
      maxHamming = 3, watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("media_dedup_out").start()
    try {
      in.addData(
        (100L, Multimodal.reencodeJpeg(Multimodal.synthImage(2L)),
          ts("2024-01-01 10:00:00")),                      // twin of stored 2
        (101L, Multimodal.synthImage(40L), ts("2024-01-01 10:01:00")), // fresh
        (102L, "just prose, not an image".getBytes("UTF-8"),
          ts("2024-01-01 10:02:00")))                      // undecodable
      q.processAllAvailable()
      val rows = spark.table("media_dedup_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3), r.getBoolean(4))))
      assert(rows.map(_._1).toSeq == Seq(100L),
        s"only the planted twin may alert: ${rows.toSeq}")
      val (dupOf, hamming, decoded) = rows.head._2
      assert(dupOf == 2L && hamming <= 3 && decoded,
        s"alert must witness stored image 2 within the ball: ${rows.head}")
      // in-watermark re-send of the same doc is suppressed
      in.addData((100L, Multimodal.reencodeJpeg(Multimodal.synthImage(2L)),
        ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      assert(spark.table("media_dedup_out").count() == 1,
        "exactly one alert per doc within the watermark")
    } finally q.stop()
  }

  test("gumbel standing sample: final version ≡ batch draw, order-free, re-send idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.WeightedDoc
    import graft.llm.Chunking
    val docs = (0L until 200L).map(i => WeightedDoc("s", i, 1L + i % 17))
    def finalSample(batches: Seq[Seq[WeightedDoc]], name: String): Seq[(Long, Long, Int)] = {
      val in = MemoryStream[WeightedDoc]
      val q = EventStream.gumbelSampleStream(in.toDS(), k = 10)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table(name).collect()
        val vMax = rows.map(_.getLong(4)).max
        rows.filter(_.getLong(4) == vMax)
          .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._3)
      } finally q.stop()
    }
    // two batches, in-order: the final-version ledger equals the batch
    // operator on the same corpus — same key, same rank, same ids
    val streamed = finalSample(Seq(docs.take(120), docs.drop(120)), "gum1")
    val batch = Chunking.sampleGumbelTopK(
        docs.map(d => (d.stratum, d.id, d.weight)).toDF("src", "id", "w"),
        "src", "id", "w", k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._3)
    assert(streamed == batch.toSeq, s"stream ≡ batch:\n$streamed\nvs\n$batch")
    // order-free: scrambled slicing, same final state
    val scrambled = finalSample(
      Seq(docs.reverse.take(50), docs.reverse.slice(50, 57),
        docs.reverse.drop(57)), "gum2")
    assert(scrambled == streamed, "any arrival order, same standing sample")
    // re-delivery of a standing doc is a no-op (identical (key, id))
    val resent = finalSample(Seq(docs, docs.take(30)), "gum3")
    assert(resent == streamed, "re-sent docs dedupe, versions advance")
    // a standing doc re-sent with a DIFFERENT weight refuses loud
    val in = MemoryStream[WeightedDoc]
    val q = EventStream.gumbelSampleStream(in.toDS(), k = 5)
      .writeStream.outputMode("append").format("memory").queryName("gum4").start()
    try {
      in.addData(WeightedDoc("s", 1L, 10L)); q.processAllAvailable()
      in.addData(WeightedDoc("s", 1L, 20L))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
      assert(chain(e).exists(m => m != null && m.contains("immutable by contract")),
        s"weight mutation must refuse loud: ${chain(e)}")
    } finally q.stop()
  }

  test("streaming drift monitor: window reports emit once with exact shares/TV, silent sources surface") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.DriftDoc
    val baseline = Map("s1" -> 500000L, "s2" -> 500000L)
    val in = MemoryStream[DriftDoc]
    val out = EventStream.driftStream(in.toDS(), baseline,
      windowMinutes = 10, watermarkDelay = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    try {
      in.addData(
        DriftDoc("s1", "a b c d", ts("2024-01-01 10:01:00")),
        DriftDoc("s2", "e f g h", ts("2024-01-01 10:02:00")),   // window 10:00 matches baseline
        DriftDoc("s1", "a b c d e f", ts("2024-01-01 10:11:00")),
        DriftDoc("s3", "x y", ts("2024-01-01 10:12:00")))       // window 10:10 drifted
      q.processAllAvailable()
      in.addData(DriftDoc("s1", "flush", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      def rows = spark.table("drift_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val w1 = ts("2024-01-01 10:00:00")
      val w2 = ts("2024-01-01 10:10:00")
      assert(rows == Set(
        (w1, "s1", 4L, 500000L, 500000L, 0L, 0L),
        (w1, "s2", 4L, 500000L, 500000L, 0L, 0L),
        // drifted window: s2 went silent (0 tokens, NOT dropped), s3
        // is new; TV = (250000 + 500000 + 250000) / 2
        (w2, "s1", 6L, 750000L, 500000L, 250000L, 500000L),
        (w2, "s2", 0L, 0L, 500000L, -500000L, 500000L),
        (w2, "s3", 2L, 250000L, 0L, 250000L, 500000L)), s"got $rows")
      // a late event behind the watermark must not re-emit a window
      val before = rows.size
      in.addData(DriftDoc("s1", "late late", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      assert(rows.size == before, "closed windows report exactly once")
    } finally q.stop()
  }

  test("attributionJoinStream: matches emit, unmatched NULL after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.attributionJoinStream(
        imps.toDF().toDF("key", "imp_ts"),
        clicks.toDF().toDF("key", "click_ts"),
        "key", "imp_ts", "click_ts", windowSeconds = 60,
        impDelay = "1 minute", clickDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      // impression 1 gets a click inside the window; 2 never does;
      // 3's click is OUTSIDE the attribution window (too late)
      imps.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:05")),
        (3L, ts("2024-01-01 10:00:10")))
      clicks.addData((1L, ts("2024-01-01 10:00:30")),
        (3L, ts("2024-01-01 10:02:10")))
      q.processAllAvailable()
      val matched = spark.table("attr_out").collect()
        .map(r => r.getLong(0) -> !r.isNullAt(2)).toMap
      assert(matched.getOrElse(1L, false),
        "the in-window match must emit without waiting for watermark")
      assert(!matched.contains(2L) && !matched.contains(3L),
        "unmatched impressions must NOT emit before the watermark closes them")
      // push both watermarks far past every window end
      imps.addData((99L, ts("2024-01-01 12:00:00")))
      clicks.addData((99L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      imps.addData((98L, ts("2024-01-01 12:00:01")))
      clicks.addData((98L, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      val all = spark.table("attr_out").collect()
        .filter(r => r.getLong(0) == 2L || r.getLong(0) == 3L)
      assert(all.length == 2 && all.forall(_.isNullAt(2)),
        s"unmatched impressions emit exactly once with NULL click: ${all.toSeq}")
    } finally q.stop()
  }

  test("trendingAlerts: latch-once crossing, silence below, stale reset") {
    import graft.streaming.EventStream.{CountEvent, TrendAlert}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[CountEvent]
    val q = EventStream.trendingAlerts(in.toDS(), threshold = 3L,
        staleMinutes = 5, watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("trend_out").start()
    try {
      in.addData(CountEvent("hot", ts("2024-01-01 10:00:00")),
        CountEvent("hot", ts("2024-01-01 10:00:10")),
        CountEvent("cool", ts("2024-01-01 10:00:20")))
      q.processAllAvailable()
      assert(spark.table("trend_out").count() == 0,
        "below threshold must stay silent")
      in.addData(CountEvent("hot", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      val first = spark.table("trend_out").as[TrendAlert].collect()
      assert(first.toSeq == Seq(TrendAlert("hot", 3L,
        ts("2024-01-01 10:00:30"))),
        s"the crossing emits exactly one alert, got ${first.toSeq}")
      // more activity must NOT re-alert (the latch)
      in.addData(CountEvent("hot", ts("2024-01-01 10:00:40")),
        CountEvent("hot", ts("2024-01-01 10:00:50")))
      q.processAllAvailable()
      assert(spark.table("trend_out").count() == 1, "alert latches once")
      // push the watermark far past hot's staleness window, evicting
      // its state; a FRESH burst then re-alerts — recency semantics
      in.addData(CountEvent("zz", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData(CountEvent("zz2", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()
      in.addData(CountEvent("hot", ts("2024-01-01 11:10:00")),
        CountEvent("hot", ts("2024-01-01 11:10:01")),
        CountEvent("hot", ts("2024-01-01 11:10:02")))
      q.processAllAvailable()
      val after = spark.table("trend_out").as[TrendAlert].collect()
        .filter(_.item == "hot")
      assert(after.length == 2 && after.exists(_.n == 3L),
        s"a fresh burst after eviction re-alerts with a reset count: ${after.toSeq}")
    } finally q.stop()
  }

  test("urlDedupStream: seen/accepted/malformed triage, raw variants collapse to one verdict") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // frontier store: canonical forms of pages 1..2
    val store = Seq(
      (1L, "http://www.site.com/a?x=1"),
      (2L, "https://site.com/b")).toDF("page_id", "canonical")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.urlDedupStream(
        in.toDF().toDF("id", "url", "ts"), store,
        "id", "url", "ts", "canonical", "page_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("url_frontier").start()
    try {
      in.addData(
        // messy raw variant of stored page 2 -> seen, witness 2
        (100L, "HTTPS://Site.COM:443/b?utm_source=rss#top", ts("2024-01-01 10:00:00")),
        // fresh page -> accepted
        (101L, "http://site.com/c?z=9", ts("2024-01-01 10:01:00")),
        // a SECOND raw variant of the same fresh page, in-watermark ->
        // collapses to the first verdict, no second row
        (102L, "HTTP://SITE.com:80/c?z=9&fbclid=1", ts("2024-01-01 10:02:00")),
        // two malformed arrivals: both surface (no canonical to collapse on)
        (103L, "site.com/no-scheme", ts("2024-01-01 10:03:00")),
        (104L, "not a url", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val rows = spark.table("url_frontier").collect()
        .map(r => r.getLong(0) -> ((r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
      assert(rows.keySet == Set(100L, 101L, 103L, 104L),
        s"variant 102 must collapse into 101's verdict: ${rows.keySet}")
      assert(rows(100L) == (("seen", 2L)), s"stored page witnesses: $rows")
      assert(rows(101L) == (("accepted", -1L)))
      assert(rows(103L) == (("malformed", -1L)) &&
        rows(104L) == (("malformed", -1L)),
        "junk rows surface loudly, never become fetchable pages")
      // the accepted row carries the canonical the frontier will store
      val acc = spark.table("url_frontier").collect()
        .find(_.getLong(0) == 101L).get
      assert(acc.getString(2) == "http://site.com/c?z=9")
    } finally q.stop()
  }

  test("linkGraphStream: stateful fold equals the batch link graph, accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = Seq(
      // one page, two links to the same host (messy + clean form):
      // n_links counts links, n_pages counts the page once
      (1L, "https://a.example/p/1",
        "x HTTP://B.Example:80/l?utm_source=1 and https://b.example/m"),
      (2L, "https://c.example/", "see https://a.example/1"))
    val b2 = Seq(
      // a SECOND page on the a->b pair: the pair's totals must grow
      // from state, not restart
      (3L, "https://a.example/p/3",
        "again https://b.example/n plus http:///junk"),
      // malformed own-URL: its edge surfaces under src NULL
      (4L, "b.example/broken", "ref https://a.example/z"))
    val in = MemoryStream[(Long, String, String)]
    val q = EventStream.linkGraphStream(
        in.toDF().toDF("id", "url", "body"), "id", "url", "body")
      .writeStream.outputMode("update").format("memory")
      .queryName("link_graph").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // update mode re-emits a pair on every change: the LATEST row
      // per pair (totals are monotone) is the maintained edge
      val latest = spark.table("link_graph").collect()
        .map(r => (Option(r.getString(0)).orNull,
          Option(r.getString(1)).orNull) -> ((r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest(("a.example", "b.example")) == ((3L, 2L)),
        s"the repeated pair accumulates from state: $latest")
      val batchTwin = graft.llm.TextOps.hostLinkGraph(
          (b1 ++ b2).toDF("id", "url", "body"), "id", "url", "body")
        .collect().map(r => (Option(r.getString(0)).orNull,
          Option(r.getString(1)).orNull) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(latest == batchTwin,
        s"stream fold must equal the batch twin: $latest vs $batchTwin")
      assert(batchTwin.contains((null, "a.example")) &&
        batchTwin.contains(("a.example", null)),
        "both audit classes present in the fixture and preserved")
    } finally q.stop()
  }

  test("revisitStream: bit-equal to the batch estimator under an out-of-order split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStream.VisitArrival
    val day = 86400L
    def ts0(sec: Long) = new Timestamp(1704067200000L + sec * 1000L)
    // page 1: the TextOpsSpec hand fixture (3 visits, 1 change);
    // page 2: never changed; page 3: single visit (NULL quarantine);
    // page 4: changes at every visit. Delivered DELIBERATELY out of
    // event-time order and split mid-page across batches — the fold
    // is order-invariant, so the law needs no ordering caveat.
    val all = Seq(
      VisitArrival(1L, ts0(2 * day), false),
      VisitArrival(2L, ts0(day), false),
      VisitArrival(4L, ts0(day), true),
      VisitArrival(1L, ts0(0L), false),
      VisitArrival(3L, ts0(5L), true),
      VisitArrival(2L, ts0(2 * day), false),
      VisitArrival(1L, ts0(day), true),
      VisitArrival(4L, ts0(0L), true),
      VisitArrival(2L, ts0(0L), false))
    val (b1, b2) = all.splitAt(4)
    val in = MemoryStream[VisitArrival]
    val q = EventStream.revisitStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("revisit").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // latest row per page (n_visits is monotone) = the estimate
      val latest = spark.table("revisit").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      val batch = graft.llm.TextOps.revisitSchedule(
          all.toDF("page_id", "ts", "changed"), "page_id", "ts", "changed")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
        .toMap
      assert(latest == batch,
        s"stream fold must be BIT-equal to the batch arm: $latest vs $batch")
      assert(latest(1L)._5.contains(336472L),
        "the hand-computed lambda lands identically on the stream side")
      assert(latest(3L)._5.isEmpty && latest(2L)._5.contains(0L),
        "quarantine NULL and exact-zero classes survive the stream fold")
    } finally q.stop()
  }

  test("streaming media-ingest capstone: dedup gate → standing sample → drift watch compose") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.llm.{Chunking, Multimodal, TextOps}
    import EventStream.{ScoreEvent, WeightedDoc}
    // The crawl-ingest architecture end to end, three stages chained
    // the way production chains them (each stage's sink feeds the
    // next stage's source): (1) the perceptual dedup GATE against the
    // standing fingerprint store decides which incoming media to
    // accept; (2) the ACCEPTED stream maintains the standing
    // labeling sample ∝ weight; (3) the accepted stream's model
    // scores run under the isotonic drift WATCH. Laws: the gate
    // alerts exactly once per planted re-encode with its witness, the
    // standing sample's final version is BIT-EQUAL to the batch draw
    // over exactly the accepted corpus, and the watch stays silent on
    // the fit-shaped window while flagging the planted drift window.
    val store = Multimodal.dHashPixel(
        (1L to 5L).map(i => (i, Multimodal.synthImage(i)))
          .toDF("doc_id", "media"), "doc_id", "media")
      .select(col("id").as("sid"), col("dhash64").as("sdh"))
    // ingest: 20 fresh docs in the 10:00 window (scores in the fit
    // 50/50 proportions), 2 re-encodes of stored images, then 6
    // fresh docs in the 10:10 window whose scores the fit never saw
    val fresh1 = (100L until 120L).map(id => (id,
      Multimodal.synthImage(id),
      if (id % 2 == 0) 900000.0 else 100000.0,
      ts(f"2024-01-01 10:0${(id % 5).toInt}:30")))
    val dups = Seq(
      (200L, Multimodal.reencodeJpeg(Multimodal.synthImage(2L)), 900000.0,
        ts("2024-01-01 10:02:00")),
      (201L, Multimodal.reencodeJpeg(Multimodal.synthImage(4L)), 100000.0,
        ts("2024-01-01 10:03:00")))
    val fresh2 = (300L until 306L).map(id => (id,
      Multimodal.synthImage(id), 555555.0,
      ts(f"2024-01-01 10:1${(id % 5).toInt}:30")))
    // ---- stage 1: the gate
    val gateIn = MemoryStream[(Long, Array[Byte], Timestamp)]
    val gate = EventStream.mediaDedupStream(
      gateIn.toDF().toDF("id", "media", "ts"), store,
      "id", "media", "ts", "sid", "sdh", maxHamming = 3)
    val gq = gate.writeStream.outputMode("append")
      .format("memory").queryName("caps_gate").start()
    val alerted = try {
      gateIn.addData((fresh1 ++ dups ++ fresh2).map(d => (d._1, d._2, d._4)): _*)
      gq.processAllAvailable()
      val rows = spark.table("caps_gate").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3), r.getBoolean(4))))
      assert(rows.map(_._1).sorted.toSeq == Seq(200L, 201L),
        s"the gate must alert exactly the planted re-encodes: ${rows.toSeq}")
      val w = rows.toMap
      assert(w(200L)._1 == 2L && w(201L)._1 == 4L &&
        rows.forall { case (_, (_, h, dec)) => h <= 3 && dec },
        s"each alert must witness its stored original in the ball: ${rows.toSeq}")
      rows.map(_._1).toSet
    } finally gq.stop()
    // ---- stage 2: the accepted stream's standing labeling sample
    val accepted = (fresh1 ++ dups ++ fresh2).filterNot(d => alerted(d._1))
    val sampIn = MemoryStream[WeightedDoc]
    val sq = EventStream.gumbelSampleStream(sampIn.toDS(), k = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("caps_sample").start()
    val streamedSample = try {
      // arrive in two micro-batches, order scrambled — order-free law
      val docs = accepted.map(d => WeightedDoc("crawl", d._1, 1L + d._1 % 7))
      sampIn.addData(docs.reverse.take(9): _*); sq.processAllAvailable()
      sampIn.addData(docs.reverse.drop(9): _*); sq.processAllAvailable()
      val rows = spark.table("caps_sample").collect()
      val vMax = rows.map(_.getLong(4)).max
      rows.filter(_.getLong(4) == vMax)
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._3).toSeq
    } finally sq.stop()
    val batchSample = Chunking.sampleGumbelTopK(
        accepted.map(d => ("crawl", d._1, 1L + d._1 % 7)).toDF("src", "id", "w"),
        "src", "id", "w", k = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._3).toSeq
    assert(streamedSample == batchSample,
      s"standing sample over the ACCEPTED corpus must equal the batch " +
        s"draw:\n$streamedSample\nvs\n$batchSample")
    assert(streamedSample.nonEmpty &&
      streamedSample.forall { case (id, _, _) => !alerted(id) },
      "no gated-out dup may reach the labeling sample")
    // ---- stage 3: the accepted stream's scores under the drift watch
    val train = (Seq.fill(8)((true, 900000L)) ++ Seq.fill(2)((false, 900000L)) ++
      Seq.fill(6)((true, 100000L)) ++ Seq.fill(4)((false, 100000L)))
      .toDF("y", "s")
    val fitHist = TextOps.isotonicFit(train, "y", "s")
      .select("s", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val watchIn = MemoryStream[ScoreEvent]
    val wq = EventStream.isotonicServeDriftStream(watchIn.toDS(), fitHist,
        windowMinutes = 10, alertMicro = 400000L,
        watermarkDelay = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("caps_watch").start()
    try {
      watchIn.addData(accepted.map(d => ScoreEvent(d._3, d._4)): _*)
      watchIn.addData(ScoreEvent(900000.0, ts("2024-01-01 11:00:00"))) // flush
      wq.processAllAvailable()
      val wins = spark.table("caps_watch").collect()
        .map(r => r.getTimestamp(0) -> r).toMap
      val clean = wins(ts("2024-01-01 10:00:00"))
      assert(clean.getLong(3) == 0L && !clean.getBoolean(5) &&
        clean.getLong(2) == 0L,
        s"the fit-shaped accepted window must stay silent: $clean")
      val drifted = wins(ts("2024-01-01 10:10:00"))
      assert(drifted.getBoolean(5) && drifted.getLong(3) == 500000L &&
        drifted.getLong(2) == 6L,
        s"the planted drift window must flag with its unseen mass: $drifted")
    } finally wq.stop()
  }

  test("politeness scheduler: burst host defers only itself, quota exact across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.{FrontierArrival, PolitenessVerdict}
    val in = MemoryStream[FrontierArrival]
    val out = EventStream.politenessStream(in.toDS(), windowSeconds = 600L,
      perHostQuota = 3, watermarkDelay = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("polite_out").start()
    try {
      // batch 1: a 5-arrival BURST on host a (quota 3) and two quiet
      // arrivals on host b, all inside the same 10:00 window
      in.addData(
        (1 to 5).map(i => FrontierArrival("a.example", i.toLong,
          ts(s"2024-01-01 10:0$i:00"))) ++
          Seq(FrontierArrival("b.example", 21L, ts("2024-01-01 10:02:00")),
            FrontierArrival("b.example", 22L, ts("2024-01-01 10:03:00"))): _*)
      q.processAllAvailable()
      def rows = spark.table("polite_out").as[PolitenessVerdict].collect()
      val b1 = rows.map(v => v.docId -> ((v.hostRank, v.scheduled))).toMap
      assert((1 to 3).forall(i => b1(i.toLong) == ((i, true))) &&
        b1(4L) == ((4, false)) && b1(5L) == ((5, false)),
        s"burst host: first 3 scheduled, 4/5 deferred: $b1")
      assert(b1(21L) == ((1, true)) && b1(22L) == ((2, true)),
        s"the quiet host is never starved by the burst next door: $b1")
      // batch 2: rank continuity from STATE (not from 1) in the same
      // window, and a fresh quota in the NEXT window
      in.addData(
        FrontierArrival("a.example", 6L, ts("2024-01-01 10:07:00")),
        FrontierArrival("b.example", 23L, ts("2024-01-01 10:12:00")))
      q.processAllAvailable()
      val b2 = rows.map(v => v.docId -> ((v.hostRank, v.scheduled))).toMap
      assert(b2(6L) == ((6, false)),
        s"cross-batch continuation: rank 6 from state, deferred: $b2")
      assert(b2(23L) == ((1, true)),
        s"a new window starts a fresh per-host quota: $b2")
      // batch-twin agreement: the batch scheduler over the SAME
      // arrivals (as canonical URLs, with their original event times)
      // produces the same verdicts
      val orig = Seq(
        (1L, "2024-01-01 10:01:00"), (2L, "2024-01-01 10:02:00"),
        (3L, "2024-01-01 10:03:00"), (4L, "2024-01-01 10:04:00"),
        (5L, "2024-01-01 10:05:00"), (6L, "2024-01-01 10:07:00"),
        (21L, "2024-01-01 10:02:00"), (22L, "2024-01-01 10:03:00"),
        (23L, "2024-01-01 10:12:00")).map { case (id, t) =>
        (id, s"https://${if (id < 20) "a.example" else "b.example"}/p/$id",
          ts(t))
      }.toDF("doc_id", "canonical_url", "ts")
      val batchTwin = graft.llm.TextOps.politenessSchedule(orig,
          "canonical_url", "doc_id", "ts", windowSeconds = 600L,
          perHostQuota = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(3), r.getString(4) == "scheduled"))).toMap
      assert(batchTwin == b2,
        s"stream fold must equal the batch twin: $batchTwin vs $b2")
    } finally q.stop()
  }

  test("politeness scheduler per-host quotas: verdicts move, ranks don't, batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.{FrontierArrival, PolitenessVerdict}
    val in = MemoryStream[FrontierArrival]
    // host a tightened to 1, host b rides the global default 3
    val out = EventStream.politenessStream(in.toDS(), windowSeconds = 600L,
      perHostQuota = 3, watermarkDelay = "5 minutes",
      hostQuotas = Map("a.example" -> 1))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("polite_hq").start()
    try {
      in.addData(
        (1 to 3).map(i => FrontierArrival("a.example", i.toLong,
          ts(s"2024-01-01 10:0$i:00"))) ++
          Seq(FrontierArrival("b.example", 21L, ts("2024-01-01 10:02:00")),
            FrontierArrival("b.example", 22L, ts("2024-01-01 10:03:00"))): _*)
      q.processAllAvailable()
      val got = spark.table("polite_hq").as[PolitenessVerdict].collect()
        .map(v => v.docId -> ((v.hostRank, v.scheduled))).toMap
      assert(got(1L) == ((1, true)) && got(2L) == ((2, false)) &&
        got(3L) == ((3, false)),
        s"a's quota 1: rank 1 only; ranks still 1..3: $got")
      assert(got(21L) == ((1, true)) && got(22L) == ((2, true)),
        s"b rides the default quota untouched: $got")
      // batch twin with the same per-host rules as a broadcast table
      val orig = Seq(
        (1L, "2024-01-01 10:01:00"), (2L, "2024-01-01 10:02:00"),
        (3L, "2024-01-01 10:03:00"),
        (21L, "2024-01-01 10:02:00"), (22L, "2024-01-01 10:03:00"))
        .map { case (id, t) =>
          (id, s"https://${if (id < 20) "a.example" else "b.example"}/p/$id",
            ts(t))
        }.toDF("doc_id", "canonical_url", "ts")
      val twin = graft.llm.TextOps.politenessSchedule(orig,
          "canonical_url", "doc_id", "ts", windowSeconds = 600L,
          perHostQuota = 3,
          hostQuotas = Some(Seq(("a.example", 1)).toDF("host", "quota")))
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(3), r.getString(4) == "scheduled"))).toMap
      assert(twin == got,
        s"per-host-quota stream fold must equal the batch twin: $twin vs $got")
    } finally q.stop()
  }
}
