package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.functions.{GraftExtensions, GraftFunctions}
import graft.streaming.IncrementalReader

/** Gates for the SQL function surface and the high-watermark poller. */
class FunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API kernels") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT minhash_sig(array(1L, 2L, 3L), 8) AS sig,
        |       simhash64(array(1L, 2L, 3L)) AS sh,
        |       minhash_sig(array(1L, 2L, 3L)) AS sig_default""".stripMargin).head()
    assert(viaSql.getSeq[Long](0).length == 8)
    assert(viaSql.getSeq[Long](2).length == 64)

    import org.apache.spark.sql.functions._
    val viaCols = spark.range(1)
      .select(
        graft.functions.Sketches.minhashSig(expr("array(1L, 2L, 3L)"), 8).as("sig"),
        graft.functions.Sketches.simhash64(expr("array(1L, 2L, 3L)")).as("sh"))
      .head()
    assert(viaSql.getSeq[Long](0) == viaCols.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaCols.getLong(1))
  }

  test("extensions entry point wires the same builders without throwing") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("centroid_dists kernel is bit-identical to the aggregate/zip_with HOF it replaced") {
    import org.apache.spark.sql.functions._
    // awkward doubles on purpose: bit-equality must survive non-exact
    // decimal fractions and the same dim-order summation
    val centroids = Array(0.1, -0.2, 0.3, 0.7, 1.0 / 3.0, -7.0)
    val k = 2
    val df = spark.range(50).select(
      expr("transform(sequence(0, 2), d -> CAST(id AS double) / 7.0 - CAST(d AS double) * 0.37)")
        .as("nd"))
    def hofDist(c: Seq[Double]) =
      aggregate(zip_with(col("nd"), typedLit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, b) => a + b)
    val rows = df.select(
        graft.functions.Sketches.centroidDists(col("nd"), centroids, k).as("kernel"),
        array(hofDist(centroids.take(3).toSeq), hofDist(centroids.drop(3).toSeq)).as("hof"))
      .collect()
    rows.foreach { r =>
      val kv = r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val hv = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
      assert(kv == hv, s"kernel ${r.getSeq[Double](0)} != hof ${r.getSeq[Double](1)}")
    }
    // malformed input (length mismatch) propagates NULL like zip_with+null arithmetic
    val bad = spark.range(1).select(expr("array(1.0d, 2.0d)").as("nd"))
      .select(graft.functions.Sketches.centroidDists(col("nd"), centroids, k).as("d"))
      .head()
    assert(bad.isNullAt(0))
  }

  test("mat_vec kernel is bit-identical to the aggregate/zip_with HOF it replaces") {
    import org.apache.spark.sql.functions._
    // same discipline as the centroid_dists gate: awkward doubles, and
    // the HOF must seed the fold with the bias and sweep dims in order
    // — exactly the kernel's summation
    val m = Array(0.1, -0.2, 1.0 / 3.0, 0.7, -7.0, 0.37)
    val bias = Array(0.25, -1.0 / 7.0)
    val df = spark.range(50).select(
      expr("transform(sequence(0, 2), d -> CAST(id AS double) / 7.0 - CAST(d AS double) * 0.37)")
        .as("vd"))
    def hofRow(row: Seq[Double], b: Double) =
      aggregate(zip_with(col("vd"), typedLit(row), (x, w) => w * x),
        lit(b), (a, v) => a + v)
    val rows = df.select(
        graft.functions.Sketches.matVec(col("vd"), m, bias).as("kernel"),
        array(hofRow(m.take(3).toSeq, bias(0)),
          hofRow(m.drop(3).toSeq, bias(1))).as("hof"))
      .collect()
    rows.foreach { r =>
      val kv = r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val hv = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
      assert(kv == hv, s"kernel ${r.getSeq[Double](0)} != hof ${r.getSeq[Double](1)}")
    }
    // malformed input propagates NULL, matching the quarantine contract
    val bad = spark.range(1).select(expr("array(1.0d, 2.0d)").as("vd"))
      .select(graft.functions.Sketches.matVec(col("vd"), m, bias).as("p"))
      .head()
    assert(bad.isNullAt(0))
  }

  test("pq_adc kernel is bit-identical to the aggregate/element_at HOF it replaces") {
    import org.apache.spark.sql.functions._
    val m = 4; val kEff = 16
    // lut from awkward doubles; codes with every byte masked to < kEff
    val df = spark.range(200).toDF("i")
      .withColumn("lut", expr(
        s"transform(sequence(0, ${m * kEff - 1}), j -> sin(CAST(i * 31 + j AS double)))"))
      .withColumn("code", expr("CAST(xxhash64(i) & 252645135 AS bigint)")) // 0x0F0F0F0F
    val hof = expr(
      s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS double),
         |  (a, j) -> a + element_at(lut,
         |    CAST(j * $kEff + (shiftright(code, 8 * j) & ${kEff - 1}) + 1 AS int)))""".stripMargin)
    val rows = df.select(
        graft.functions.Sketches.pqAdc(col("lut"), col("code"), m, kEff).as("kernel"),
        hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"kernel ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
    // out-of-range code byte (>= kEff) and short lut both propagate NULL
    val bad = spark.range(1)
      .select(expr(s"transform(sequence(0, ${m * kEff - 1}), j -> CAST(j AS double))").as("lut"),
        expr("CAST(255 AS bigint)").as("code"))
      .select(graft.functions.Sketches.pqAdc(col("lut"), col("code"), m, kEff).as("p"))
      .head()
    assert(bad.isNullAt(0))
    val short = spark.range(1)
      .select(expr("array(1.0d)").as("lut"), expr("CAST(0 AS bigint)").as("code"))
      .select(graft.functions.Sketches.pqAdc(col("lut"), col("code"), m, kEff).as("p"))
      .head()
    assert(short.isNullAt(0))
  }

  test("incremental reader: first poll takes all, next polls take only the delta") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    var rows = Seq(
      Row(Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      Row(Timestamp.valueOf("2024-01-01 10:01:00"), 2L))
    def load() = spark.createDataFrame(rows.asJava, schema)
    val reader = new IncrementalReader(() => load(), "ts")

    assert(reader.poll().count() == 2)
    assert(reader.currentWatermark.contains(Timestamp.valueOf("2024-01-01 10:01:00")))

    // no new data → empty batch, watermark unchanged
    assert(reader.poll().count() == 0)

    rows = rows ++ Seq(
      Row(Timestamp.valueOf("2024-01-01 10:02:00"), 3L),
      Row(Timestamp.valueOf("2024-01-01 10:03:00"), 4L))
    val delta = reader.poll().collect().map(_.getLong(1)).sorted.toSeq
    assert(delta == Seq(3L, 4L))
    assert(reader.currentWatermark.contains(Timestamp.valueOf("2024-01-01 10:03:00")))
  }

  test("incremental reader lag holds back the newest interval") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val rows = Seq(
      Row(Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      Row(Timestamp.valueOf("2024-01-01 10:10:00"), 2L))
    val reader = new IncrementalReader(
      () => spark.createDataFrame(rows.asJava, schema), "ts", lagSeconds = 300)
    // watermark = 10:10 - 5min = 10:05 → only the first row qualifies
    assert(reader.poll().collect().map(_.getLong(1)).toSeq == Seq(1L))
    assert(reader.currentWatermark.contains(Timestamp.valueOf("2024-01-01 10:05:00")))
  }
}
