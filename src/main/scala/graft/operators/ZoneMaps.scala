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

  /** Clustering-column advisor — the DECISION op the layout family
    * feeds (Z-order/Hilbert give the mechanism, zone maps the
    * measurement; this closes the loop): for each CANDIDATE column,
    * simulate re-clustering the table into `nShards` equal-population
    * contiguous shards sorted by that column (the liftCurve
    * block-atomic bucket: per-value collapse, bucket =
    * cum_before·nShards div N — a tied key value cannot straddle a
    * simulated shard boundary, exactly as a sorted write would lay it
    * out), build the zone map each layout WOULD produce, and run the
    * prune audit for the target predicate. One row per candidate:
    * shards/rows scanned and the exact micro scan fraction — sorted
    * ascending, the top row IS the advice. Clustering by the
    * predicate column itself should approach the predicate's
    * selectivity; an uncorrelated candidate reads ~1e6 (full scan) —
    * the honest baseline q_zone_map already shows. NULL candidate
    * keys are EXCLUDED from that candidate's simulation BY CONTRACT
    * (a NULL sorts nowhere; its rows_total reflects the exclusion —
    * reported, not hidden, via per-candidate rows_total).
    *
    * Scale shape, per candidate: one per-value collapse (the only
    * corpus shuffle), the cumulative window on the bounded
    * distinct-value table, a bucket-map equi join back (broadcast
    * when small), one zone-map pass, and the audit on the nShards
    * stats table. The advisor reads stats, never re-sorts the data —
    * the real re-cluster happens once, after the decision.
    */
  def clusterAdvisor(df: DataFrame, candidates: Seq[String],
                     targetCol: String, lo: Double, hi: Double,
                     nShards: Int): DataFrame = {
    require(nShards >= 2 && nShards <= 100000,
      s"clusterAdvisor: nShards in [2, 100000], got $nShards")
    require(candidates.nonEmpty && candidates.forall(df.columns.contains),
      s"clusterAdvisor: unknown candidates ${candidates.filterNot(df.columns.contains)}")
    require(df.columns.contains(targetCol),
      s"clusterAdvisor: unknown target $targetCol")
    import org.apache.spark.sql.expressions.Window
    val audits = candidates.map { cand =>
      val base = df
        .select(col(targetCol), expr(s"CAST(floor($cand * 1000) AS BIGINT)")
          .as("__c"))
        .filter(col("__c").isNotNull)
      val pv = base.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
      val wv = Window.orderBy(col("__c").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bm = pv.withColumn("__cum", sum("__cnt").over(wv))
        .crossJoin(broadcast(pv.agg(sum("__cnt").as("__N"))))
        .select(col("__c"),
          expr(s"((__cum - __cnt) * ${nShards}L) div __N").as("shard"))
      val mapped = base.join(bm, Seq("__c"))
        .select(col(targetCol), col("shard"))
      pruneAudit(zoneMap(mapped, "shard", Seq(targetCol)), targetCol, lo, hi)
        .agg(count(lit(1)).as("n_shards"),
          sum(when(col("scan_needed"), 1L).otherwise(0L))
            .as("shards_scanned"),
          sum("n_rows").as("rows_total"),
          sum(when(col("scan_needed"), col("n_rows")).otherwise(0L))
            .as("rows_scanned"))
        .withColumn("candidate", lit(cand))
    }
    audits.reduce(_.unionByName(_))
      .withColumn("scan_fraction_micro",
        expr("(rows_scanned * 1000000L) div nullif(rows_total, 0L)"))
      .select(col("candidate"), col("n_shards"), col("shards_scanned"),
        col("rows_total"), col("rows_scanned"), col("scan_fraction_micro"))
  }
}
