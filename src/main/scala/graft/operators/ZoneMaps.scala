package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone maps — the statistics layer data skipping rests on (Parquet
  * row-group min/max, Iceberg/Delta file stats, Netezza's original
  * zone maps): per storage shard, min/max/null-count per tracked
  * column, plus the prune audit that answers the planner question
  * "which shards would this predicate touch?". Completes the layout
  * family: Z-order/Hilbert decide the ORDER that makes these stats
  * tight, compaction decides the file sizes, this measures the
  * skipping the layout actually buys — the feedback loop a 100 TB
  * deployment tunes its clustering with.
  */
object ZoneMaps {

  /** One row per shard: n_rows plus (min_c, max_c, nulls_c) for every
    * tracked column — one partial-aggregated pass, the wide-schema
    * shape stats catalogs store. min/max are over NON-NULL values
    * (an all-null shard reports NULL bounds, never a fake sentinel).
    */
  def zoneMap(df: DataFrame, shardCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMap: no columns tracked")
    require(cols.forall(df.columns.contains),
      s"zoneMap: unknown columns ${cols.filterNot(df.columns.contains)}")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    df.groupBy(col(shardCol).as("shard")).agg(aggs.head, aggs.tail: _*)
  }

  /** The prune audit for a closed range predicate `c BETWEEN lo AND
    * hi`: a shard needs scanning iff its [min, max] envelope overlaps
    * [lo, hi] — an all-null shard is PRUNED (a range predicate never
    * matches NULL; its bounds are NULL and the coalesce makes the
    * decision explicit rather than three-valued). `scan_needed` is
    * the planner verdict; `exact` marks shards where the envelope
    * decision is guaranteed tight (no nulls and the whole envelope
    * inside the range — every row matches) vs merely "may contain
    * matches". One broadcast-sized pass over the stats table; the
    * data itself is never read — that is the point.
    */
  def pruneAudit(zm: DataFrame, c: String, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"pruneAudit: lo <= hi, got ($lo, $hi)")
    require(zm.columns.contains(s"min_$c"),
      s"pruneAudit: column $c is not tracked in this zone map")
    zm.select(col("shard"), col("n_rows"),
        col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"),
        col(s"nulls_$c").as("n_nulls"))
      .withColumn("scan_needed",
        coalesce(col("max_v") >= lo && col("min_v") <= hi, lit(false)))
      .withColumn("exact",
        coalesce(col("min_v") >= lo && col("max_v") <= hi &&
          col("n_nulls") === 0L, lit(false)))
  }
}
