package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trace variants (SURVEY.md O-27): the activity sequence of each case,
  * grouped and counted. Implemented as a single aggregation —
  * `sort_array(collect_list(struct(ts, tie, activity)))` builds the
  * ordered sequence inside the aggregate buffer, so there is exactly one
  * shuffle (on the case key) and no window pass.
  *
  * Scale note: a variant string is bounded by trace length; collect_list
  * buffers one trace at a time per key. Pathological million-event traces
  * would need the streaming trace assembler (graft.streaming) instead.
  */
object Variants {

  /** (variant, n_cases) for every distinct activity sequence. */
  def counts(df: DataFrame, caseCol: String, activityCol: String,
             tsCol: String, tieCol: String, sep: String = "->"): DataFrame = {
    perCase(df, caseCol, activityCol, tsCol, tieCol, sep)
      .groupBy("variant")
      .agg(count(lit(1)).as("n_cases"))
  }

  /** (case, variant, n_events) — one row per case with its ordered
    * activity sequence.
    */
  def perCase(df: DataFrame, caseCol: String, activityCol: String,
              tsCol: String, tieCol: String, sep: String = "->"): DataFrame = {
    df.groupBy(col(caseCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(tsCol), col(tieCol), col(activityCol)))),
            e => e(activityCol)),
          sep).as("variant"),
        count(lit(1)).as("n_events"))
  }

  /** Top-k variants by frequency, ties broken by variant text so the
    * result is deterministic across engines and runs.
    */
  def topK(df: DataFrame, caseCol: String, activityCol: String,
           tsCol: String, tieCol: String, k: Int): DataFrame =
    counts(df, caseCol, activityCol, tsCol, tieCol)
      .orderBy(col("n_cases").desc, col("variant"))
      .limit(k)
}
