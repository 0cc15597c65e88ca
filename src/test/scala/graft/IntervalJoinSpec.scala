package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.IntervalJoin

/** Unit semantics for the bucketed interval join (the fixture-scale
  * gate is q_interval_join's plain range-join DuckDB oracle).
  */
class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val leftSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("ts", TimestampType)))
  private val rightSchema = StructType(Seq(
    StructField("k", StringType), StructField("start_ts", TimestampType),
    StructField("end_ts", TimestampType), StructField("w", LongType)))

  test("matches containment inclusively, across bucket boundaries, never across keys") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:00:00")), // == start of w10, inclusive
      Row(2L, "a", ts("2024-01-01 11:30:00")), // inside w10, bucket after start's
      Row(3L, "a", ts("2024-01-01 12:00:00")), // == end of w10 AND == start of w12
      Row(4L, "a", ts("2024-01-01 15:00:00")), // outside all windows
      Row(5L, "b", ts("2024-01-01 10:30:00"))  // other key
    ).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 10L),
      Row("a", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), 12L),
      Row("a", ts("2024-01-01 09:00:00"), null, 90L),  // null bound: never matches
      Row("a", ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00"), 99L) // reversed
    ).asJava, rightSchema)
    val out = IntervalJoin.intervalJoin(left, right, "k", "ts", "start_ts", "end_ts")
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 12L)))
  }

  test("each (event, interval) pair emits once even when the interval spans many buckets") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 01:00:00"), ts("2024-01-01 23:00:00"), 1L)).asJava, rightSchema)
    val out = IntervalJoin.intervalJoin(left, right, "k", "ts", "start_ts", "end_ts",
      bucketSeconds = Some(600L))
    assert(out.count() == 1)
  }

  test("auto-sized buckets (parameter omitted) match an explicit width bit-for-bit") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:00:00")),
      Row(2L, "a", ts("2024-01-01 11:30:00")),
      Row(3L, "a", ts("2024-01-01 12:00:00")),
      Row(4L, "a", ts("2024-01-01 15:00:00")),
      Row(5L, "b", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 10L),
      Row("a", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), 12L),
      Row("b", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 20L)).asJava, rightSchema)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = rows(IntervalJoin.intervalJoin(left, right, "k", "ts", "start_ts", "end_ts"))
    val explicit = rows(IntervalJoin.intervalJoin(left, right, "k", "ts", "start_ts", "end_ts",
      bucketSeconds = Some(123L)))
    assert(auto == explicit)
    assert(auto == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 12L), (5L, 20L)))
  }

  test("maxSpanBuckets drops pathological intervals and the audit names them") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 1L),
      Row("a", ts("2024-01-01 00:00:00"), ts("2030-01-01 00:00:00"), 666L) // dirty row
    ).asJava, rightSchema)
    val capped = IntervalJoin.intervalJoin(left, right, "k", "ts", "start_ts", "end_ts",
      bucketSeconds = Some(3600L), maxSpanBuckets = Some(100L))
      .select("w").collect().map(_.getLong(0)).toSet
    assert(capped == Set(1L), "the six-year interval must be dropped, the sane one kept")
    val audited = IntervalJoin.pathologicalIntervals(right, "k", "start_ts", "end_ts",
      bucketSeconds = 3600L, maxSpanBuckets = 100L)
      .select("w").collect().map(_.getLong(0)).toSet
    assert(audited == Set(666L))
    // a cap nothing exceeds is a no-op and the audit agrees
    assert(IntervalJoin.pathologicalIntervals(right, "k", "start_ts", "end_ts",
      3600L, 1000000L).count() == 0)
  }

  test("reserved working-column name fails loudly instead of silently overwriting") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val poisoned = spark.createDataFrame(
      Seq(Row("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 1L)).asJava,
      rightSchema).withColumn("__b", org.apache.spark.sql.functions.lit(7))
    intercept[IllegalArgumentException](
      IntervalJoin.intervalJoin(left, poisoned, "k", "ts", "start_ts", "end_ts"))
    intercept[IllegalArgumentException](
      IntervalJoin.intervalJoin(left.withColumn("__b", org.apache.spark.sql.functions.lit(7)),
        poisoned.drop("__b"), "k", "ts", "start_ts", "end_ts"))
  }

  test("plans an equality join, never a nested-loop range join") {
    val p = SparkEntry.queries("q_interval_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join degenerated to an all-pairs range join")
  }
}
