package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.AsofJoin

/** Unit semantics for the union-window as-of join (the fixture-scale
  * gate is q_asof_join's DuckDB ASOF LEFT JOIN oracle).
  */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val leftSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("ts", TimestampType)))
  private val rightSchema = StructType(Seq(
    StructField("k", StringType), StructField("ts", TimestampType),
    StructField("price", DoubleType)))

  test("attaches the nearest preceding right row, inclusive at equal ts") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:00:00")), // before any state -> null
      Row(2L, "a", ts("2024-01-01 10:05:00")), // exactly at state -> inclusive
      Row(3L, "a", ts("2024-01-01 10:30:00")), // between states -> first state
      Row(4L, "a", ts("2024-01-01 11:30:00")), // after second -> second state
      Row(5L, "b", ts("2024-01-01 10:30:00"))  // other key, no state -> null
    ).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 10:05:00"), 1.5),
      Row("a", ts("2024-01-01 11:00:00"), 2.5)).asJava, rightSchema)
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("price"), tieCols = Seq("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out == Map(
      1L -> None, 2L -> Some(1.5), 3L -> Some(1.5), 4L -> Some(2.5), 5L -> None))
  }

  test("a matched state with a NULL payload attaches as null, not an older value") {
    // SQL ASOF LEFT JOIN semantics: the 11:00 state IS the match even
    // though its payload is null — a naive last(payload, ignoreNulls)
    // would fall through to the stale 10:05 value
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 11:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 10:05:00"), 1.5),
      Row("a", ts("2024-01-01 11:00:00"), null)).asJava, rightSchema)
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3),
      s"null-payload state must win and attach null, got ${out.head}")
  }

  test("right rows with null key or null ts never match (SQL comparison semantics)") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", null, 9.9),   // null ts: ts >= NULL is never true
      Row(null, ts("2024-01-01 09:00:00"), 8.8)).asJava, rightSchema)
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3),
      s"null-key/ts right rows must not attach, got ${out.head}")
  }

  test("reserved working-column names fail loudly instead of silently overwriting") {
    val left = spark.createDataFrame(Seq(
      Row(1L, "a", ts("2024-01-01 10:30:00"))).asJava, leftSchema)
    val right = spark.createDataFrame(Seq(
      Row("a", ts("2024-01-01 09:00:00"), 8.8)).asJava, rightSchema)
    import org.apache.spark.sql.functions.lit
    intercept[IllegalArgumentException](AsofJoin.asof(
      left.withColumn("__side", lit(1)), right, "k", "ts", Seq("price")))
    intercept[IllegalArgumentException](AsofJoin.asof(
      left, right.withColumn("__r", lit(1)), "k", "ts", Seq("price")))
  }

  test("plans a window over one shuffle, never a range or nested-loop join") {
    val p = SparkEntry.queries("q_asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "asof degenerated to an all-pairs join")
    assert(p.contains("Window"), "expected the union-window realization")
  }
}
