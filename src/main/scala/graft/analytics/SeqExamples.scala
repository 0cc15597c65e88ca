package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Next-event training examples from sessionized event logs — the
  * bridge from the process-mining surface to the training-data layer:
  * each event becomes one supervised row (context = the types of the
  * up-to-`contextLen` preceding events in its session, label = its own
  * type), the sliding-window layout a sequence model trains on.
  *
  * LINEAR, not quadratic: the context is a bounded look-back window,
  * so output rows = input events and each row carries ≤ `contextLen`
  * tokens — unlike all-prefixes expansion, this survives a 100 TB log.
  * One shuffle on the session key; `row_number` and the frame-bounded
  * `collect_list` share the same window spec, so Catalyst computes
  * both in a single WindowExec over one sort (plan-gated). Ordering
  * carries the `event_id` tie-break, and a frame-bounded collect_list
  * over a deterministic order is itself deterministic — the DuckDB
  * `list(...) OVER (ROWS BETWEEN k PRECEDING AND 1 PRECEDING)` replay
  * is bit-equal.
  *
  * The first event of a session (pos = 1, empty context) is dropped:
  * there is nothing to condition on. Sessions are never concatenated —
  * the window partitions on the session key, so context cannot leak
  * across a session boundary (the law the spec pins).
  */
object SeqExamples {

  def nextEventExamples(df: DataFrame, sessionCol: String, typeCol: String,
                        tsCol: String, tieCol: String,
                        contextLen: Int): DataFrame = {
    require(contextLen >= 1, "nextEventExamples: contextLen must be >= 1")
    val w = Window.partitionBy(col(sessionCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(sessionCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("pos", row_number().over(w))
      .withColumn("context", concat_ws(" ",
        collect_list(col(typeCol)).over(
          w.rowsBetween(-contextLen.toLong, -1L))))
      .filter(col("pos") >= 2)
      .select(col(sessionCol), col("pos"), col("context"),
        col(typeCol).as("label"))
  }
}
