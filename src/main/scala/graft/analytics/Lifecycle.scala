package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lifecycle pairing — the pm4py "interval log conversion" (reference
  * event_reader.py keeps LIFECYCLE_PHASE precisely so downstream
  * tooling can do this): an atomic event log whose events carry a
  * start/complete lifecycle phase becomes a log of ACTIVITY INSTANCES
  * with a duration, the input every service-time / waiting-time
  * analysis actually wants (the SLA and inter-arrival screens measure
  * BETWEEN events; this measures the work itself).
  */
object Lifecycle {

  /** Pair the i-th 'start' with the i-th 'complete' of each
    * (case, activity) by time order — deterministic INDEX pairing
    * (the pm4py default for equal-priority matches), with every
    * mismatch surfaced loudly instead of dropped: a start with no
    * matching complete is an `open` instance (NULL end — crashed or
    * still running), a complete with no preceding start is an
    * `orphan` (lost start event), and a matched pair whose duration
    * comes out NEGATIVE (clock skew, corrupted log) keeps its row
    * with the `negative` status — a pairing that silently discarded
    * any of the three would hide exactly the log-quality defects this
    * view exists to find.
    *
    * Scale shape: ONE corpus scan — the per-phase index is a
    * row_number window on (case, activity, phase), and the pairing is
    * NOT a self-join (whose branches would each re-scan the corpus)
    * but a partial-aggregated groupBy on (case, activity, idx):
    * each group holds at most one start and one complete, so two
    * conditional MAXes reassemble the pair. Two keyed Exchanges
    * total, join-free, plan-gated.
    */
  def intervals(df: DataFrame, caseCol: String, activityCol: String,
                phaseCol: String, tsCol: String, tieCol: String,
                startPhase: String = "start",
                completePhase: String = "complete"): DataFrame = {
    require(startPhase != completePhase,
      "intervals: start and complete phases must differ")
    val w = Window
      .partitionBy(col(caseCol), col(activityCol), col(phaseCol))
      .orderBy(col(tsCol), col(tieCol))
    df.filter(col(phaseCol).isin(startPhase, completePhase))
      .withColumn("__idx", row_number().over(w))
      .groupBy(col(caseCol).as("case_id"),
        col(activityCol).as("activity"),
        col("__idx").cast("long").as("idx"))
      .agg(
        max(when(col(phaseCol) === startPhase, col(tsCol))).as("start_ts"),
        max(when(col(phaseCol) === completePhase, col(tsCol))).as("end_ts"))
      // sign-decomposed: negative durations are real rows here (the
      // `negative` status), and Spark's div truncates where DuckDB's
      // // floors — they only agree on non-negative numerators
      .withColumn("dur_sec", expr(
        """CASE WHEN unix_micros(end_ts) >= unix_micros(start_ts)
          |  THEN (unix_micros(end_ts) - unix_micros(start_ts)) div 1000000L
          |  ELSE -((unix_micros(start_ts) - unix_micros(end_ts)) div 1000000L)
          |END""".stripMargin))
      .withColumn("status",
        when(col("start_ts").isNull, lit("orphan"))
          .when(col("end_ts").isNull, lit("open"))
          .when(col("dur_sec") < 0L, lit("negative"))
          .otherwise(lit("matched")))
      .select(col("case_id"), col("activity"), col("idx"),
        col("start_ts"), col("end_ts"), col("dur_sec"), col("status"))
  }
}
