package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Directly-follows graph (SURVEY.md O-26): for consecutive events within
  * each case, count (activity, next_activity) pairs. This is the kernel
  * under inductive process discovery (reference example.ipynb cell 3).
  *
  * Plan shape: one shuffle on the case key for the window, then a partial
  * (map-side) + final aggregation on the edge pair. Edges are bounded by
  * |activities|², so the second aggregation's reduce side is tiny at any
  * data scale — the window shuffle dominates and is unavoidable for
  * per-case ordering.
  */
object Dfg {

  /** (activity, next_activity, n) edge counts. Ordering inside a case is
    * (tsCol, tieCol) — the tie column keeps results engine-deterministic.
    */
  def edges(df: DataFrame, caseCol: String, activityCol: String,
            tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("next_activity", lead(col(activityCol), 1).over(w))
      .filter(col("next_activity").isNotNull)
      .groupBy(col(activityCol).as("activity"), col("next_activity"))
      .agg(count(lit(1)).as("n"))
  }

  /** Start/end activity frequencies — the other inputs process discovery
    * needs besides the edge counts.
    *
    * Single sort: one ascending `row_number` plus an unordered per-case
    * `count` over the same partitioning (the count window needs no sort,
    * and Catalyst reuses the one Exchange). A descending second
    * `row_number` would cost a second full sort of every partition.
    * A one-event case is both first and last; it is labeled 'start',
    * matching the reference-shaped oracle's CASE WHEN rn = 1 branch.
    */
  def startEndCounts(df: DataFrame, caseCol: String, activityCol: String,
                     tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col(caseCol))))
      .filter(col("rn") === 1 || col("rn") === col("cnt"))
      .select(
        col(activityCol).as("activity"),
        when(col("rn") === 1, lit("start")).otherwise(lit("end")).as("position"))
      .groupBy("activity", "position")
      .agg(count(lit(1)).as("n"))
  }

  /** Alpha-miner footprint relations over the DFG edges: for every
    * ordered activity pair with a directly-follows edge, `parallel`
    * when the reverse edge also exists, else `causal`. (The `choice`
    * cells of the full footprint matrix are the absent pairs — an
    * |activities|² blowup nobody materializes at scale.)
    *
    * One extra broadcast self-join over the edge table, which is
    * bounded by |activities|² — negligible next to the window shuffle
    * that produced it.
    */
  def footprint(edgesDf: DataFrame): DataFrame = {
    val fwd = edgesDf.select(col("activity"), col("next_activity"), col("n"))
    val rev = edgesDf.select(
      col("next_activity").as("activity"),
      col("activity").as("next_activity"),
      lit(1).as("has_rev"))
    fwd.join(broadcast(rev), Seq("activity", "next_activity"), "left")
      .select(col("activity"), col("next_activity"),
        when(col("has_rev").isNotNull, "parallel").otherwise("causal").as("relation"),
        col("n"))
  }
}
