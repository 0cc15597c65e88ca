package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: derive trace/case ids for an event stream
  * that has no explicit case column (the testdata `events` table;
  * TESTDATA.md / FIXTURES.md map `session = user_id + time gap` onto the
  * reference's CASE_ID, SURVEY.md §1.2).
  *
  * One shuffle on `user_id`, then two window passes over the same
  * partitioning (Catalyst reuses the sort — `.explain` shows a single
  * Exchange). Deterministic: ordering is (ts, event_id), so ties cannot
  * reorder between runs or engines.
  *
  * Scale note: partitions by user — 100 TB with hot users is fine as long
  * as a single user's events fit a partition's sort spill; Window uses
  * an external sorter, so this degrades to disk, not OOM.
  */
object Sessionize {

  /** Adds `session_id` (string `user-seq`), keyed by gaps > `gapMinutes`. */
  def byGap(userCol: String = "user_id", tsCol: String = "ts",
            tieCol: String = "event_id", gapMinutes: Int = 30): DataFrame => DataFrame = { df =>
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gapSec = gapMinutes * 60L
    val newSession =
      when(col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long") > gapSec, 1)
        .otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
      .withColumn("session_id", concat_ws("-", col(userCol), col("session_seq")))
  }
}
