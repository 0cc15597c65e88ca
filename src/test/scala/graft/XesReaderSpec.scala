package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.xes.{XesReader, XesWriter}

/** Write → read round-trip gates for the XES source: both writers,
  * all attribute types, XML escaping, omitted-null attributes, and
  * sidecar tolerance. The fixture-scale identity gate is
  * q_xes_roundtrip's DuckDB oracle.
  */
class XesReaderSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("case:concept:name", StringType),
    StructField("time:timestamp", TimestampType),
    StructField("concept:name", StringType),
    StructField("n", LongType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType)))

  private def sample = spark.createDataFrame(Seq(
    Row("c1", ts("2024-01-01 09:00:00"), "a<&>\"'", 7L, 1.25, true),
    Row("c1", ts("2024-01-01 09:00:05"), "b", null, null, false),
    Row("c2", ts("2024-01-01 09:01:00"), "a", -3L, 0.5, null)
  ).asJava, schema)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.select("case:concept:name", "time:timestamp", "concept:name",
      "n", "score", "flag").collect().toSet

  test("single-file write → read returns exactly the input rows, types intact") {
    val tmp = Files.createTempDirectory("xes-read")
    val file = tmp.resolve("log.xes")
    XesWriter.write(sample, file)
    val back = XesReader.read(spark, file.toString)
    assert(back.schema("time:timestamp").dataType == TimestampType)
    assert(back.schema("n").dataType == LongType)
    assert(back.schema("score").dataType == DoubleType)
    assert(back.schema("flag").dataType == BooleanType)
    assert(canon(back) == canon(sample))
  }

  test("sharded write → read returns exactly the input rows (sidecars skipped)") {
    val tmp = Files.createTempDirectory("xes-read-shards")
    val dir = tmp.resolve("shards").toString
    XesWriter.writeShards(sample, dir)
    assert(canon(XesReader.read(spark, dir)) == canon(sample))
  }

  test("conflicting attribute types widen to string with the raw text") {
    val tmp = Files.createTempDirectory("xes-read-conflict")
    val file = tmp.resolve("log.xes")
    val s1 = StructType(Seq(
      StructField("case:concept:name", StringType),
      StructField("time:timestamp", TimestampType),
      StructField("v", LongType)))
    val s2 = StructType(Seq(
      StructField("case:concept:name", StringType),
      StructField("time:timestamp", TimestampType),
      StructField("v", StringType)))
    XesWriter.write(spark.createDataFrame(
      Seq(Row("c1", ts("2024-01-01 09:00:00"), 5L)).asJava, s1), file)
    val file2 = tmp.resolve("log2.xes")
    XesWriter.write(spark.createDataFrame(
      Seq(Row("c2", ts("2024-01-01 09:01:00"), "five")).asJava, s2), file2)
    val back = XesReader.read(spark, tmp.toString + "/*.xes")
    assert(back.schema("v").dataType == StringType)
    val vs = back.select("v").collect().map(_.getString(0)).toSet
    assert(vs == Set("5", "five"))
  }
}
