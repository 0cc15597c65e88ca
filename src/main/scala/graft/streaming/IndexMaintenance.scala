package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.{Dedup, DenseIndex, Retrieval}

/** Continuous index maintenance — the daily-crawl shape made UNBOUNDED:
  * a document stream upserts into the persisted lexical (L-99) and
  * MinHash (L-106) indexes via `foreachBatch`, so every micro-batch
  * pays touched-data cost (`updateLexIndex` / `updateMinhashIndex`)
  * and readers always see one complete, immutable snapshot.
  *
  * Snapshot protocol: each micro-batch writes a NEW versioned
  * directory `v<batchId>` and only then publishes it by rewriting the
  * tiny `_LATEST` pointer file. Readers resolve `_LATEST` once and
  * read an immutable snapshot — there is no in-place mutation to race
  * with. Crash-safety is the foreachBatch replay contract: a batch
  * that died between save and publish is re-run by the checkpoint
  * with the SAME batchId, overwriting the same unpublished version
  * directory (its input — the pointer — still names the previous
  * version), so the upsert is idempotent end to end. On a real
  * cluster the pointer rewrite is the place a table catalog
  * (HMS/Iceberg-style swap) slots in; a single-block overwrite is the
  * same shape without the dependency.
  *
  * Upsert-only BY DESIGN: a batch's ids are treated as added-or-
  * changed (`removedIds` = the batch's ids, the snapshotDiff
  * convention — removal of an id not in the batch is a batch-side
  * administrative action via `updateLexIndex` directly, not a stream
  * event). Ids must be unique within a batch — checked LOUDLY per
  * batch, because two versions of one doc in one micro-batch have no
  * well-defined winner.
  */
object IndexMaintenance {

  private val Pointer = "_LATEST"

  private def hadoopFs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** The currently-published snapshot directory, if any. */
  def latestVersion(spark: SparkSession, indexDir: String): Option[String] = {
    val fs = hadoopFs(spark, indexDir)
    val p = new Path(indexDir, Pointer)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val name = new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        if (name.isEmpty) None else Some(new Path(indexDir, name).toString)
      } finally in.close()
    }
  }

  private def publish(spark: SparkSession, indexDir: String,
                      version: String): Unit = {
    val fs = hadoopFs(spark, indexDir)
    val out = fs.create(new Path(indexDir, Pointer), true)
    try out.write(version.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireUniqueIds(batch: DataFrame, idCol: String): Unit = {
    val agg = batch.agg(count(lit(1)).as("n"),
      countDistinct(col(idCol)).as("d")).head()
    require(agg.getLong(0) == agg.getLong(1),
      s"index maintenance: batch carries duplicate $idCol values — " +
        "two versions of one doc in one micro-batch have no well-defined winner")
  }

  /** One lexical-index upsert, exposed for batch callers and tests:
    * build on first publish, touched-data update after, never reading
    * and writing the same files.
    */
  def upsertLexBatch(batch: DataFrame, indexDir: String, idCol: String,
                     textCol: String, version: String): Unit = {
    val spark = batch.sparkSession
    requireUniqueIds(batch, idCol)
    val updated = latestVersion(spark, indexDir) match {
      case None => Retrieval.buildLexIndex(batch, idCol, textCol)
      case Some(cur) =>
        Retrieval.updateLexIndex(Retrieval.loadLexIndex(spark, idCol, cur),
          batch.select(col(idCol)), batch, idCol, textCol)
    }
    Retrieval.saveLexIndex(updated, new Path(indexDir, version).toString)
    publish(spark, indexDir, version)
  }

  /** One MinHash-index upsert; parameters come from the stored meta
    * table after the first publish, so a drifting caller cannot mix
    * incompatible signatures into one store.
    */
  def upsertMinhashBatch(batch: DataFrame, indexDir: String, idCol: String,
                         textCol: String, version: String,
                         numHashes: Int = 64, nBands: Int = 16,
                         shingleN: Int = 2): Unit = {
    val spark = batch.sparkSession
    requireUniqueIds(batch, idCol)
    val updated = latestVersion(spark, indexDir) match {
      case None =>
        Dedup.buildMinhashIndex(batch, idCol, textCol, numHashes, nBands, shingleN)
      case Some(cur) =>
        Dedup.updateMinhashIndex(Dedup.loadMinhashIndex(spark, idCol, cur),
          batch.select(col(idCol)), batch, idCol, textCol)
    }
    Dedup.saveMinhashIndex(updated, idCol, new Path(indexDir, version).toString)
    publish(spark, indexDir, version)
  }

  /** One dense-index (IVF) upsert — the r9-verdict gap closed: the
    * ANN store gets the same daily-crawl arm as the lexical/MinHash
    * indexes. First publish trains the coarse quantizer
    * (`DenseIndex.build`); every later batch assigns its vectors
    * against the FROZEN stored centroids (`DenseIndex.update`), which
    * is what keeps the incremental result bit-equal to a rebuild over
    * the updated corpus with the same model (DenseIndexSpec gates
    * that equality through this very method). Centroids are NEVER
    * retrained here — retraining rewrites every assignment and is an
    * offline rebuild decision; instead each published snapshot
    * carries its `drift` occupancy audit so the decay that would
    * motivate a retrain is visible in the store itself
    * (`denseNeedsRetrain` reads it back).
    */
  def upsertDenseBatch(batch: DataFrame, indexDir: String, idCol: String,
                       embCol: String, version: String,
                       nClusters: Int = 16, lloydIters: Int = 5,
                       trainSample: Int = 512,
                       skewFactor: Double = 4.0): Unit = {
    val spark = batch.sparkSession
    requireUniqueIds(batch, idCol)
    val updated = latestVersion(spark, indexDir) match {
      case None =>
        DenseIndex.build(batch, idCol, embCol, nClusters, lloydIters,
          trainSample).getOrElse(return ()) // nothing indexable yet
      case Some(cur) =>
        DenseIndex.update(DenseIndex.load(spark, idCol, cur),
          batch.select(col(idCol)), batch, idCol, embCol)
    }
    val vDir = new Path(indexDir, version).toString
    DenseIndex.save(updated, idCol, vDir)
    // re-load so the drift audit reads the WRITTEN members, then store
    // it beside them: the snapshot describes its own health
    DenseIndex.drift(DenseIndex.load(spark, idCol, vDir), skewFactor)
      .write.mode("overwrite").parquet(vDir + "/drift")
    publish(spark, indexDir, version)
  }

  /** Does the published dense snapshot need an offline retrain? Reads
    * the stored drift audit — no recompute, no corpus access.
    */
  def denseNeedsRetrain(spark: SparkSession, indexDir: String): Boolean =
    latestVersion(spark, indexDir).exists { cur =>
      !spark.read.parquet(cur + "/drift").filter(col("skewed")).isEmpty
    }

  /** The unbounded arm for the dense ANN store. */
  def maintainDenseIndex(docs: DataFrame, indexDir: String,
                         checkpointDir: String, idCol: String,
                         embCol: String, nClusters: Int = 16,
                         lloydIters: Int = 5, trainSample: Int = 512,
                         skewFactor: Double = 4.0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          upsertDenseBatch(batch, indexDir, idCol, embCol, s"v$batchId",
            nClusters, lloydIters, trainSample, skewFactor)
      }
      .start()

  /** The unbounded arm: every micro-batch of `docs` upserts into the
    * lexical index at `indexDir`.
    */
  def maintainLexIndex(docs: DataFrame, indexDir: String,
                       checkpointDir: String, idCol: String,
                       textCol: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          upsertLexBatch(batch, indexDir, idCol, textCol, s"v$batchId")
      }
      .start()

  /** The unbounded arm for the near-dup signature index. */
  def maintainMinhashIndex(docs: DataFrame, indexDir: String,
                           checkpointDir: String, idCol: String,
                           textCol: String, numHashes: Int = 64,
                           nBands: Int = 16, shingleN: Int = 2): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          upsertMinhashBatch(batch, indexDir, idCol, textCol, s"v$batchId",
            numHashes, nBands, shingleN)
      }
      .start()
}
