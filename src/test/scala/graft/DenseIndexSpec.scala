package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.llm.{DenseIndex, Similarity}
import graft.streaming.IndexMaintenance

object DenseIndexSpec {
  final case class EmbRow(vec_id: Long, ts: Timestamp, embedding: Seq[Double])
}

/** Gates for the persisted dense (IVF) ANN store and its streaming
  * maintenance arm — the r9-verdict item: "search over the maintained
  * index ≡ search over a rebuilt index on the updated store".
  */
class DenseIndexSpec extends SparkSpec {
  import DenseIndexSpec._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // a deterministic little corpus with visible cluster structure:
  // vectors near 4 axis directions in 8 dims, id-salted so nothing ties
  private def corpus(n: Int, dims: Int = 8) = {
    import spark.implicits._
    (0 until n).map { i =>
      val axis = i % 4
      val v = Array.tabulate(dims)(d =>
        (if (d == axis) 10.0 else 0.0) + ((i * 7 + d * 3) % 5) * 0.1)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def searchKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet

  test("dense index: search through the store equals ivfTopKWith on the corpus with the same model") {
    val df = corpus(64)
    val idx = DenseIndex.build(df, "vec_id", "embedding", nClusters = 4).get
    val probes = df.filter(col("vec_id") < 6)
    val got = DenseIndex.search(idx, probes, "vec_id", "embedding",
      k = 5, nProbe = 2)
    val want = Similarity.ivfTopKWith(df, "vec_id", "embedding",
      col("vec_id") < 6, k = 5, idx.flatCentroids, idx.kEff, nProbe = 2)
    assert(searchKey(got) == searchKey(want),
      "the stored members must reproduce the corpus-scan IVF search bit-for-bit")
  }

  test("dense index: incremental update is bit-equal to re-assignment of the updated corpus") {
    import spark.implicits._
    val v1 = corpus(64)
    val idx = DenseIndex.build(v1, "vec_id", "embedding", nClusters = 4).get
    // diff: ids 0..3 change (shifted vectors), ids 100..103 arrive
    val changed = corpus(4).withColumn("embedding",
      expr("transform(embedding, x -> x + CAST(0.5 AS double))"))
    val added = corpus(108).filter(col("vec_id") >= 100)
    val removedIds = changed.select("vec_id")
    val updated = DenseIndex.update(idx, removedIds,
      changed.unionByName(added), "vec_id", "embedding")
    val v2 = v1.filter(col("vec_id") >= 4)
      .unionByName(changed).unionByName(added)
    val rebuilt = DenseIndex.assignMembers(v2, "vec_id", "embedding",
      idx.flatCentroids, idx.kEff)
    assert(updated.members.collect().toSet == rebuilt.collect().toSet,
      "frozen-centroid upsert must equal full re-assignment")
    // and a search agrees with the rebuilt twin end to end
    val probes = Seq((999L, Seq.tabulate(8)(d => if (d == 0) 10.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val got = DenseIndex.search(updated, probes, "vec_id", "embedding", k = 3)
    val want = DenseIndex.search(
      DenseIndex(rebuilt, idx.flatCentroids, idx.kEff),
      probes, "vec_id", "embedding", k = 3)
    assert(searchKey(got) == searchKey(want))
  }

  test("dense index: save/load round-trips; drift flags a piled-up cell and only that") {
    val df = corpus(64)
    val idx = DenseIndex.build(df, "vec_id", "embedding", nClusters = 4).get
    val dir = tmpDir("graft_dense_").toString + "/idx"
    DenseIndex.save(idx, "vec_id", dir)
    val back = DenseIndex.load(spark, "vec_id", dir)
    assert(back.kEff == idx.kEff &&
      back.flatCentroids.toSeq == idx.flatCentroids.toSeq)
    assert(back.members.collect().toSet == idx.members.collect().toSet)
    // balanced 4-axis corpus: no cell near 4x the balanced share
    assert(!DenseIndex.needsRetrain(back, skewFactor = 3.0))
    // pile 200 near-axis-0 vectors in: cell occupancy skews loudly
    import spark.implicits._
    val skewed = (0 until 200).map { i =>
      (1000L + i, Seq.tabulate(8)(d =>
        (if (d == 0) 10.0 else 0.0) + (i % 3) * 0.01))
    }.toDF("vec_id", "embedding")
    val drifted = DenseIndex.update(back, skewed.select("vec_id").limit(0)
      .select(col("vec_id")), skewed, "vec_id", "embedding")
    val audit = DenseIndex.drift(drifted, skewFactor = 3.0)
      .filter(col("skewed")).collect()
    assert(audit.length == 1,
      s"exactly the piled-up cell must flag, got ${audit.length}")
    assert(DenseIndex.needsRetrain(drifted, skewFactor = 3.0))
  }

  test("streaming dense maintenance: published snapshot search equals a rebuilt index on the updated store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[EmbRow]
    val idxDir = tmpDir("denseidx-stream").toString
    val ckpt = tmpDir("denseidx-ckpt").toString
    val base = corpus(64).collect().map(r =>
      EmbRow(r.getLong(0), ts("2024-01-01 09:00:00"), r.getSeq[Double](1)))
    val q = IndexMaintenance.maintainDenseIndex(
      in.toDF().select("vec_id", "embedding"), idxDir, ckpt,
      "vec_id", "embedding", nClusters = 4)
    try {
      in.addData(base.toIndexedSeq)
      q.processAllAvailable()
      val v1 = IndexMaintenance.latestVersion(spark, idxDir).get
      val model1 = DenseIndex.load(spark, "vec_id", v1)
      // batch 2: id 0 CHANGES, ids 200..204 arrive — an upsert
      in.addData(
        (EmbRow(0L, ts("2024-01-01 10:00:00"),
          Seq.tabulate(8)(d => if (d == 3) 9.0 else 0.2)) +:
          (200 until 205).map(i => EmbRow(i.toLong,
            ts("2024-01-01 10:00:01"),
            Seq.tabulate(8)(d => (if (d == i % 4) 10.0 else 0.0) + 0.05 * (i % 7))))).toIndexedSeq)
      q.processAllAvailable()
      val v2 = IndexMaintenance.latestVersion(spark, idxDir).get
      assert(v2 != v1, "a new micro-batch must publish a NEW version")
      val got = DenseIndex.load(spark, "vec_id", v2)
      assert(got.flatCentroids.toSeq == model1.flatCentroids.toSeq,
        "upserts must never retrain the coarse quantizer")
      // rebuilt twin: re-assign the full updated corpus with the SAME model
      val updatedCorpus = corpus(64).filter(col("vec_id") =!= 0L)
        .unionByName(Seq(
          (0L, Seq.tabulate(8)(d => if (d == 3) 9.0 else 0.2))).toDF(
          "vec_id", "embedding"))
        .unionByName((200 until 205).map(i => (i.toLong,
          Seq.tabulate(8)(d => (if (d == i % 4) 10.0 else 0.0) + 0.05 * (i % 7))))
          .toDF("vec_id", "embedding"))
      val rebuilt = DenseIndex(
        DenseIndex.assignMembers(updatedCorpus, "vec_id", "embedding",
          got.flatCentroids, got.kEff), got.flatCentroids, got.kEff)
      assert(got.members.collect().toSet == rebuilt.members.collect().toSet,
        "the streamed store must equal the rebuild (changed doc re-assigned once)")
      val probes = Seq((999L, Seq.tabulate(8)(d => if (d == 3) 9.0 else 0.1)))
        .toDF("vec_id", "embedding")
      assert(searchKey(DenseIndex.search(got, probes, "vec_id", "embedding", k = 4)) ==
        searchKey(DenseIndex.search(rebuilt, probes, "vec_id", "embedding", k = 4)),
        "a search through the streamed index must equal the rebuild bit-for-bit")
      // drift audit rides the snapshot
      assert(spark.read.parquet(v2 + "/drift").count() >= got.kEff)
      assert(!IndexMaintenance.denseNeedsRetrain(spark, idxDir))
      // v1 snapshot immutable
      assert(DenseIndex.load(spark, "vec_id", v1)
        .members.collect().toSet == model1.members.collect().toSet,
        "published snapshots must never mutate")
    } finally q.stop()
  }

  test("streaming probes: a query stream searches the published snapshot, results equal the batch search") {
    // the other half of the daily-crawl story: maintenance streams
    // vectors IN, this streams queries THROUGH — each micro-batch
    // resolves _LATEST once and searches that immutable snapshot, so
    // a concurrent publish can never torture a half-read index
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val df = corpus(64)
    val idx = DenseIndex.build(df, "vec_id", "embedding", nClusters = 4).get
    val dir = tmpDir("dense-probe").toString
    val idxDir = dir + "/idx/v0"
    DenseIndex.save(idx, "vec_id", idxDir)
    val in = MemoryStream[EmbRow]
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Long)]()
    val q = in.toDF().select("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", dir + "/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val snap = DenseIndex.load(spark, "vec_id", idxDir)
          out.synchronized {
            out ++= DenseIndex.search(snap, batch, "vec_id", "embedding",
              k = 4).collect().map(r => (r.getLong(0), r.getLong(1),
              r.getInt(2), java.lang.Double.doubleToLongBits(r.getDouble(3))))
            ()
          }
        }
        ()
      }.start()
    try {
      val probes = Seq(
        EmbRow(901L, ts("2024-01-01 09:00:00"),
          Seq.tabulate(8)(d => if (d == 1) 8.0 else 0.3)),
        EmbRow(902L, ts("2024-01-01 09:00:01"),
          Seq.tabulate(8)(d => if (d == 2) 7.0 else 0.1)))
      in.addData(probes.toIndexedSeq)
      q.processAllAvailable()
      val want = DenseIndex.search(idx,
        probes.map(p => (p.vec_id, p.embedding)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      assert(out.toSet == want,
        "streamed probe results must equal the batch search bit-for-bit")
    } finally q.stop()
  }
}
