package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.api.EventLogGenerator
import graft.api.EventLogGenerator.Params
import graft.operators.EventOps

/** Pins the reference semantics quirks (SURVEY.md §2.8) against the
  * flagship `generate` API itself, over a FIXTURES.md §A1-shaped
  * in-memory EVENTLOG.
  */
class EventLogGeneratorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("EVENT_TYPE", StringType, nullable = false),
    StructField("CASE_ID", StringType, nullable = true),
    StructField("ACTIVITY_NAME", StringType, nullable = false),
    StructField("TIME_STAMP", TimestampType, nullable = false),
    StructField("LIFECYCLE_PHASE", StringType, nullable = true),
    StructField("RESOURCE", StringType, nullable = false),
    StructField("RESOURCE_TYPE", StringType, nullable = false),
    StructField("REMARKS", StringType, nullable = true)))

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 2 resources, 3 cases, every EVENT_TYPE, NULL CASE_ID, NULL/start/
    * complete lifecycle mix, varied REMARKS key sets (FIXTURES §A1/A2).
    */
  private def fixture: DataFrame = {
    val rows = Seq(
      // case c1, resource r1: full remarks, lifecycle complete
      Row("SERVICE_CUSTOM_MESSAGE_1", "c1", "requestMenu", ts("2023-11-08 16:32:34"), "complete", "r1", "bot",
        """{"user":"u1","intent":"requestMenu","stateLabel":"s","serviceEndpoint":"https://x/y","in-service-context":true,"debug-flag":42}"""),
      Row("SERVICE_CUSTOM_MESSAGE_3", "c1", "getMenu", ts("2023-11-08 16:32:40"), "complete", "r1", "bot",
        """{"user":"u1"}"""),
      // bot message in c1 (excluded unless includeBotMessages)
      Row("SERVICE_CUSTOM_MESSAGE_2", "c1", "botReply", ts("2023-11-08 16:32:41"), "complete", "r1", "bot",
        """{"user":"u1"}"""),
      // case c2, resource r1: NULL lifecycle (the §2.8.6 quirk pivot)
      Row("SERVICE_CUSTOM_MESSAGE_1", "c2", "greet", ts("2023-11-08 16:33:00"), null, "r1", "bot", "{}"),
      // case c2: 'start' row (dropped unless includeLifecycleStart)
      Row("SERVICE_CUSTOM_MESSAGE_3", "c2", "getMenu", ts("2023-11-08 16:33:04"), "start", "r1", "bot", null),
      // NULL CASE_ID row: always dropped (O-8)
      Row("SERVICE_CUSTOM_MESSAGE_1", null, "orphan", ts("2023-11-08 16:34:00"), "complete", "r1", "bot", "{}"),
      // other event type: survives O-9 but not the whitelist (O-12)
      Row("SOMETHING_ELSE", "c1", "other", ts("2023-11-08 16:35:00"), "complete", "r1", "bot", "{}"),
      // case c3, resource r2 (filtered out by resourceIds=[r1])
      Row("SERVICE_CUSTOM_MESSAGE_1", "c3", "greet", ts("2023-11-08 17:00:00"), "complete", "r2", "bot", "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def gen(p: Params, infer: Boolean = false): DataFrame =
    EventLogGenerator.generate(fixture, p, inferRemarksSchema = infer)

  test("default flags: whitelist + lifecycle filter-before-fill drop NULL-lifecycle rows") {
    val out = gen(Params(resourceIds = Seq("r1")))
    val acts = out.select("`concept:name`").collect().map(_.getString(0)).sorted
    // c1 requestMenu + getMenu only: botReply is SCM_2 (whitelist), greet has
    // NULL lifecycle (equality filter runs BEFORE the 'complete' fill),
    // getMenu@c2 is 'start', orphan has NULL case, other fails whitelist,
    // c3 is resource r2.
    assert(acts.toSeq == Seq("getMenu", "requestMenu"))
    // remap happened (O-17)
    val types = out.select("EVENT_TYPE").collect().map(_.getString(0)).toSet
    assert(types == Set("USER_MESSAGE", "SERVICE_REQUEST"))
  }

  test("includeLifecycleStart=true: NULL lifecycle survives and is filled 'complete', start survives") {
    val out = gen(Params(resourceIds = Seq("r1"), includeLifecycleStart = true))
    val byAct = out.collect().map(r =>
      r.getAs[String]("concept:name") -> r.getAs[String]("lifecycle:transition")).toMap
    assert(byAct("greet") == "complete") // filled, not dropped
    assert(byAct("getMenu") == "start" || byAct.contains("getMenu"))
    assert(out.filter("`lifecycle:transition` = 'start'").count() == 1)
  }

  test("includeBotMessages=true: BOT_MESSAGE rows survive, whitelist skipped") {
    val out = gen(Params(resourceIds = Seq("r1"), includeBotMessages = true))
    val types = out.select("EVENT_TYPE").collect().map(_.getString(0)).toSet
    assert(types.contains("BOT_MESSAGE"))
    assert(types.contains("SOMETHING_ELSE")) // no whitelist when bots included
  }

  test("=!= null-rejection: excludeValue drops NULL rows like SQL !=") {
    val df = fixture.transform(EventOps.excludeValue("LIFECYCLE_PHASE", "start"))
    assert(df.filter("LIFECYCLE_PHASE IS NULL").count() == 0)
    assert(df.filter("LIFECYCLE_PHASE = 'complete'").count() == 6)
  }

  test("NULL CASE_ID rows are always rejected") {
    assert(gen(Params(resourceIds = Seq("r1"), includeBotMessages = true,
      includeLifecycleStart = true)).filter("`case:concept:name` IS NULL").count() == 0)
  }

  test("JSON widening (declared schema) promotes keys and fills defaults") {
    val out = gen(Params(resourceIds = Seq("r1"), deserializeRemarks = true))
    val full = out.filter("`concept:name` = 'requestMenu'").head()
    assert(full.getAs[String]("user") == "u1")
    assert(full.getAs[String]("serviceEndpoint") == "https://x/y")
    assert(full.getAs[Boolean]("in-service-context"))
    val sparse = out.filter("`concept:name` = 'getMenu'").head()
    assert(sparse.getAs[String]("user") == "u1")
    assert(sparse.getAs[String]("serviceEndpoint") == "") // filled (O-19)
    assert(!sparse.getAs[Boolean]("in-service-context"))  // filled false
  }

  test("JSON widening (inferred) promotes every key like the reference") {
    val out = gen(Params(resourceIds = Seq("r1"), includeBotMessages = true,
      includeLifecycleStart = true, deserializeRemarks = true), infer = true)
    assert(out.columns.contains("intent"))
    assert(out.columns.contains("stateLabel"))
    // the key OUTSIDE the declared RemarksSchema is the whole point of
    // the inference path: a user's unlisted key must surface, with its
    // inferred type — the declared-schema fast path can never produce it
    assert(out.columns.contains("debug-flag"))
    assert(out.filter("`concept:name` = 'requestMenu'").head()
      .getAs[Long]("debug-flag") == 42L)
    // declared-schema path stays blind to it (and must not error)
    val declared = gen(Params(resourceIds = Seq("r1"), deserializeRemarks = true))
    assert(!declared.columns.contains("debug-flag"))
  }

  test("date range bounds filter inclusively") {
    val out = gen(Params(resourceIds = Seq("r1"),
      startDate = Some("2023-11-08 16:32:40"), endDate = Some("2023-11-08 16:32:40")))
    assert(out.count() == 1)
    assert(out.head().getAs[String]("concept:name") == "getMenu")
  }

  test("empty result: generate yields zero rows, not an error") {
    assert(gen(Params(resourceIds = Seq("no-such-resource"))).isEmpty)
  }
}
