package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Hilbert

/** Laws for the Hilbert layout: the defining curve properties
  * (bijectivity + unit-step adjacency, exhaustive on the corner
  * sub-grid), kernel/canonical agreement, map-only plan, and the
  * file-pruning gate mirroring ZorderSpec's experiment.
  */
class HilbertSpec extends SparkSpec {

  test("xy2d is a Hilbert curve: bijective and 4-adjacent on the 32x32 corner") {
    // for x,y < 32 every level s >= 32 contributes d += 0 and at most a
    // swap, so the corner is a complete order-5 sub-curve: d in [0, 1024)
    val n = 32
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.xy2d(x.toLong, y.toLong) -> ((x, y))).toMap
    assert(byD.size == n * n, "indexes must be distinct (bijective)")
    assert(byD.keys.min == 0L && byD.keys.max == (n * n - 1).toLong,
      "corner sub-grid must map onto a contiguous d range")
    for (d <- 0L until (n * n - 1).toLong) {
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"consecutive codes must be adjacent cells: d=$d ($x0,$y0)->($x1,$y1)")
    }
  }

  test("compiled kernel replays the canonical loop; map-only plan") {
    import spark.implicits._
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val out = pts.select(col("x"), col("y"),
      Hilbert.hilbertIndex(col("x"), col("y")).as("h"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hilbertIndex must be map-only:\n$plan")
    out.collect().foreach { r =>
      assert(r.getLong(2) == Hilbert.xy2d(r.getLong(0), r.getLong(1)),
        s"kernel/canonical drift at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("hilbert layout prunes a box query at least as well as id-sort, and tightly") {
    // same raster fixture as ZorderSpec: 64x64 grid, y-major ids
    val schema = StructType(Seq(StructField("id", LongType)))
    val pts = spark.createDataFrame(
        (0L until 4096L).map(Row(_)).asJava, schema)
      .withColumn("x", pmod(col("id"), lit(64)).cast("long"))
      .withColumn("y", (col("id") / 64).cast("long"))
    val dir = Files.createTempDirectory("graft-hilbert")
    dir.toFile.deleteOnExit()
    val hPath = s"$dir/h"; val idPath = s"$dir/id"
    Hilbert.clusterByHilbert(pts, "x", "y", numFiles = 16).write.parquet(hPath)
    pts.repartitionByRange(16, col("id")).sortWithinPartitions("id")
      .write.parquet(idPath)
    def filesOverlapping(path: String, x0: Long, x1: Long,
                         y0: Long, y1: Long): (Int, Int) = {
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
    val (hHit, hTotal) = filesOverlapping(hPath, 8, 15, 8, 15)
    val (idHit, idTotal) = filesOverlapping(idPath, 8, 15, 8, 15)
    assert(hTotal == 16 && idTotal == 16)
    assert(hHit <= idHit, s"Hilbert hit $hHit files vs $idHit id-sorted")
    assert(hHit <= 2, s"Hilbert should localize the 1/64 box to <=2 of 16 files, hit $hHit")
    assert(spark.read.parquet(hPath).count() == 4096L)
    // reserved-column guard is loud
    intercept[IllegalArgumentException] {
      Hilbert.clusterByHilbert(pts.withColumn("h", lit(1L)), "x", "y", 4)
    }
  }
}
