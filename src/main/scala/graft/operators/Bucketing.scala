package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the shuffle-elimination technique for
  * REPEATED big-big joins: pay the partitioning once at write time
  * (`bucketBy` on the join key), and every subsequent join/aggregate
  * on that key plans with ZERO Exchange on both sides (Spark's
  * bucketing metadata satisfies the join's distribution requirement;
  * `sortBy` additionally pre-sorts each bucket file so the sort-merge
  * join skips its per-task sort). At 100 TB this is the difference
  * between re-shuffling the corpus on every pipeline run and
  * scanning co-located files: the dedup-pairs ⋈ documents,
  * embeddings ⋈ documents, and spans ⋈ corpus joins in this repo all
  * key on the doc id — ONE bucketed write serves them all.
  *
  * This is deliberately thin glue over the public DataFrameWriter
  * API: the VALUE is the contract gated in BucketingSpec — the
  * bucketed-join plan contains no Exchange where the plain-parquet
  * twin shuffles both sides — not the two calls themselves.
  * Bucketed tables are catalog tables (buck metadata lives in the
  * metastore), hence `saveAsTable`, not `parquet(path)`.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table on
    * `keyCol`. `nBuckets` plays the `shardPlan` role: size it so a
    * bucket is a few hundred MB at the target scale.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets > 0, "writeBucketed: nBuckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Equi-join two tables from the catalog on `keyCol`. When both
    * were written with `writeBucketed` at the SAME bucket count, the
    * plan is exchange-free (gated in BucketingSpec); on plain tables
    * it degrades to the normal shuffle join — same results, one
    * repartitioning of each side per run.
    */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    keyCol: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keyCol)
}
