package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: users grouped by the calendar
  * day they were FIRST seen (the cohort), tracked by how many are
  * active again n days later — the standard growth-analytics triangle
  * view, here with exact integer retention shares.
  *
  * Scale shape: the corpus shuffles only on its natural keys — one
  * user-keyed aggregate for first-seen days, one (user, day) distinct
  * for activity (both partial-aggregated map-side), one user-keyed
  * equi-join to attach the cohort, then a partial aggregate collapsing
  * to (cohort_day × offset) rows. That output is bounded by the SQUARE
  * OF THE CALENDAR SPAN — independent of corpus size — so the cohort
  * size table (one row per cohort day) rides back on a broadcast join
  * and the retention division is exact integer micro-units.
  *
  * Offset 0 is the cohort itself by construction (a user's first day
  * is an active day), so retention_micro = 1e6 on the diagonal — a
  * built-in self-check the spec pins.
  */
object Cohort {

  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = df
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = df
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    val offsets = active.join(firsts, userCol)
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("offset_days"),
        col(userCol))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = firsts
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("__cohort_size"))
    offsets.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention_micro",
        expr("(n_users * 1000000L) div __cohort_size"))
      .select(col("cohort_day"), col("offset_days"), col("n_users"),
        col("__cohort_size").as("cohort_size"), col("retention_micro"))
  }
}
