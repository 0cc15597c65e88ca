package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Zorder

/** Gates for the Z-order clustering layer: the Morton code must match
  * a bit-by-bit reference implementation, and — the part that matters
  * at 100 TB — a Z-clustered file layout must give per-file bounding
  * boxes that let a 2-d box predicate SKIP most files, where a
  * single-column sort order cannot.
  */
class ZorderSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("mortonCode matches the bit-by-bit reference on a deterministic grid") {
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    // corners, axes, and a splitmix-ish scatter — all deterministic
    val pts = (for (i <- 0L until 200L) yield {
      val h = i * 0x9e3779b97f4a7c15L
      ((h >>> 13) & 0xFFFFL, (h >>> 37) & 0xFFFFL)
    }) ++ Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (1L, 2L))
    val df = spark.createDataFrame(pts.map(p => Row(p._1, p._2)).asJava, schema)
    val got = df.select(col("x"), col("y"),
        Zorder.mortonCode(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == mortonRef(x, y), s"morton($x,$y)")
  }

  test("inputs above 16 bits are masked, not corrupted") {
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val df = spark.createDataFrame(
      Seq(Row(65536L + 5L, (1L << 40) + 9L)).asJava, schema)
    val z = df.select(Zorder.mortonCode(col("x"), col("y"))).head.getLong(0)
    assert(z == mortonRef(5L, 9L), "only the low 16 bits participate")
  }

  test("Z-clustered layout prunes a 2-d box query; id-sorted layout cannot") {
    // 4096 points on a 64x64 grid (xi = i % 64, yi = i / 64 — id order
    // is a y-major raster, so an id-sort gives tight y ranges but
    // full-width x ranges). Query box: 1/8 of each dimension = 1/64 of
    // the area. With 16 files:
    //  - id-sorted: every file spans all of x — only the y stat helps;
    //  - Z-sorted: each file is a tight 2-d tile — both stats help.
    val schema = StructType(Seq(StructField("id", LongType)))
    val pts = spark.createDataFrame(
        (0L until 4096L).map(Row(_)).asJava, schema)
      .withColumn("x", pmod(col("id"), lit(64)).cast("long"))
      .withColumn("y", (col("id") / 64).cast("long"))
    val dir = Files.createTempDirectory("graft-zorder")
    dir.toFile.deleteOnExit()
    val zPath = s"$dir/z"; val idPath = s"$dir/id"
    Zorder.clusterByZ(pts, "x", "y", numFiles = 16).write.parquet(zPath)
    pts.repartitionByRange(16, col("id")).sortWithinPartitions("id")
      .write.parquet(idPath)

    // per-file bounding boxes — exactly the min/max stats a parquet
    // footer carries; a file can be skipped iff its box misses the
    // query box
    def filesOverlapping(path: String, x0: Long, x1: Long, y0: Long, y1: Long): (Int, Int) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("xmin"), max("x").as("xmax"),
          min("y").as("ymin"), max("y").as("ymax"))
        .collect()
      val hit = boxes.count(r =>
        r.getLong(1) <= x1 && r.getLong(2) >= x0 &&
          r.getLong(3) <= y1 && r.getLong(4) >= y0)
      (hit, boxes.length)
    }
    val (zHit, zTotal) = filesOverlapping(zPath, 8, 15, 8, 15)
    val (idHit, idTotal) = filesOverlapping(idPath, 8, 15, 8, 15)
    assert(zTotal == 16 && idTotal == 16)
    // id order: y in [8,15] is 512 consecutive ids → 2 of 16 files
    // pass the y stat, and x stats never help. Z order: the box is
    // 1/64 of the area → ~1 of 16 Z-range files overlaps it. The gate
    // is relative: Z must not be worse, and must actually skip files.
    assert(zHit <= idHit, s"Z-order hit $zHit files vs $idHit id-sorted")
    assert(zHit <= 2, s"Z-order should localize the box to <=2 of 16 files, hit $zHit")

    // and the layout loses no rows
    assert(spark.read.parquet(zPath).count() == 4096L)
  }

  test("compaction plan: biggest-first bins, overshoot bound, compact flag") {
    import spark.implicits._
    import graft.operators.Compaction
    // partition p: sizes 5000, 3000, 2000, 1500, 500 at target 4096 —
    // walk desc: before = 0, 5000, 8000, 10000, 11500
    //            bin    = 0,    1,    1,     2,     2
    val files = Seq(
      ("p", 1L, 5000L), ("p", 2L, 3000L), ("p", 3L, 2000L),
      ("p", 4L, 1500L), ("p", 5L, 500L), ("q", 9L, 100L))
      .toDF("part", "file", "bytes")
    val out = Compaction.plan(files, "part", "file", "bytes", 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("p", 1L)) == ((0L, true)), "full file: own bin, no rewrite")
    assert(out(("p", 2L)) == ((1L, false)) && out(("p", 3L)) == ((1L, false)))
    assert(out(("p", 4L)) == ((2L, false)) && out(("p", 5L)) == ((2L, false)))
    assert(out(("q", 9L)) == ((0L, false)), "partitions bin independently")
    // overshoot bound: every bin total < target + its largest member
    val byBin = Compaction.plan(files, "part", "file", "bytes", 4096L)
      .collect().groupBy(r => (r.getString(0), r.getLong(3)))
    byBin.values.foreach { rs =>
      val sizes = rs.map(_.getLong(2))
      assert(sizes.sum < 4096L + sizes.max,
        s"bin overshoot beyond one file: ${sizes.toSeq}")
    }
    intercept[IllegalArgumentException] {
      Compaction.plan(files, "part", "file", "bytes", 0L)
    }
  }

  test("zoneMap/pruneAudit: envelope overlap, all-null shard prunes, exact flag, loud args") {
    import spark.implicits._
    import graft.operators.ZoneMaps
    val df = Seq(
      ("s1", Some(1.0)), ("s1", Some(5.0)),     // below the range
      ("s2", Some(8.0)), ("s2", Some(25.0)),    // straddles
      ("s3", Some(12.0)), ("s3", Some(18.0)),   // fully inside
      ("s4", None), ("s4", None),               // all-null
      ("s5", Some(15.0)), ("s5", None)          // inside but has a null
    ).toDF("shard", "v")
    val zm = ZoneMaps.zoneMap(df, "shard", Seq("v"))
    val audit = ZoneMaps.pruneAudit(zm, "v", 10.0, 20.0).collect()
      .map(r => r.getString(0) -> (r.getBoolean(5), r.getBoolean(6))).toMap
    assert(audit == Map(
      "s1" -> ((false, false)),  // envelope below: pruned
      "s2" -> ((true, false)),   // overlaps: scan, not guaranteed
      "s3" -> ((true, true)),    // inside, no nulls: every row matches
      "s4" -> ((false, false)),  // all-null: range never matches NULL
      "s5" -> ((true, false))    // inside but nulls: scan, not exact
    ), s"got $audit")
    // stats are exact per shard
    val s2 = zm.filter(col("shard") === "s2").head()
    assert(s2.getLong(1) == 2L && s2.getDouble(2) == 8.0 &&
      s2.getDouble(3) == 25.0 && s2.getLong(4) == 0L)
    intercept[IllegalArgumentException] {
      ZoneMaps.pruneAudit(zm, "v", 20.0, 10.0)
    }
    intercept[IllegalArgumentException] {
      ZoneMaps.pruneAudit(zm, "missing", 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      ZoneMaps.zoneMap(df, "shard", Seq("nope"))
    }
  }

  test("clusterAdvisor: the predicate column wins at exactly the selectivity, an uncorrelated layout full-scans, NULL keys excluded") {
    import spark.implicits._
    import graft.operators.ZoneMaps
    // 100 rows; a = 1..100; b = a bit-scrambled permutation that
    // interleaves low and high a-values in every b-decile
    val rows = (1 to 100).map { i =>
      (i.toDouble, ((i * 37) % 100).toDouble, i.toLong) }
    val df = rows.toDF("a", "b", "id")
    val got = ZoneMaps.clusterAdvisor(df, Seq("a", "b"), "a",
      lo = 10.0, hi = 19.0, nShards = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    // clustered by a: deciles (1-10)(11-20)... → the [10,19] box
    // touches exactly 2 shards (20 rows of 100)
    val byA = got("a")
    assert(byA.getLong(1) == 10L && byA.getLong(2) == 2L
      && byA.getLong(4) == 20L && byA.getLong(5) == 200000L, s"got $byA")
    // clustered by the scrambled b: every decile's a-envelope spans
    // the box → full scan
    val byB = got("b")
    assert(byB.getLong(2) == 10L && byB.getLong(5) == 1000000L, s"got $byB")
    // NULL cluster keys are excluded from that candidate only
    val withNull = rows.map { case (a, b, i) =>
      (a, if (i <= 50) Some(b) else None, i) }.toDF("a", "b", "id")
    val g2 = ZoneMaps.clusterAdvisor(withNull, Seq("a", "b"), "a",
      10.0, 19.0, 10).collect().map(r => r.getString(0) -> r).toMap
    assert(g2("a").getLong(3) == 100L && g2("b").getLong(3) == 50L,
      "per-candidate rows_total reports the exclusion")
    intercept[IllegalArgumentException] {
      ZoneMaps.clusterAdvisor(df, Seq("nope"), "a", 0.0, 1.0, 10)
    }
  }
}
