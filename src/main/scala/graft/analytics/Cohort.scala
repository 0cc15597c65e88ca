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

  /** Rolling active users — DAU / WAU / MAU and the DAU/MAU
    * stickiness ratio per calendar day, the other standard growth
    * view. A user is active for report day r under window w when they
    * have any activity in the trailing w days (r-w, r].
    *
    * Scale shape: the corpus collapses to distinct (user, day) FIRST
    * (one natural-key shuffle); the ×28 report-day explode, the
    * (user, report_day) min-gap aggregate, and the per-day conditional
    * counts all run on that users×days-bounded table. The data's
    * calendar range rides back as a 1-row broadcast (the date-bounds
    * pattern), clipping report days to observed time — a day with
    * zero DAU still surfaces as long as its trailing 28 days saw any
    * activity (only a >28-day fully-dead stretch has no row, since a
    * report day exists exactly where some window is non-empty);
    * stickiness is 0 when MAU is 0, never a division error.
    */
  def rollingActives(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val maxW = 28
    val ud = df
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    val bounds = ud.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    ud.select(col(userCol), explode(sequence(lit(0), lit(maxW - 1))).as("__i"),
        col("day"))
      .select(col(userCol), expr("date_add(day, __i)").as("day"), col("__i"))
      .groupBy(col(userCol), col("day"))
      .agg(min(col("__i")).as("__gap"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("__d1"))
      .groupBy(col("day"))
      .agg(sum(when(col("__gap") < 1, 1L).otherwise(0L)).as("dau"),
        sum(when(col("__gap") < 7, 1L).otherwise(0L)).as("wau"),
        sum(when(col("__gap") < 28, 1L).otherwise(0L)).as("mau"))
      .withColumn("stickiness_micro",
        when(col("mau") === 0L, 0L)
          .otherwise(expr("(dau * 1000000L) div mau")))
  }

  /** Burst profile — the automation/bot screen the reference's domain
    * (bot event logs) actually needs: per user, the PEAK number of
    * events inside any trailing `windowSec`-second window, total
    * events, and a burst flag at `threshold`. A scripted client fires
    * dozens of events in a minute; a human cannot.
    *
    * The peak is a RANGE-frame count over epoch seconds (same-second
    * peers included in both engines, so ties are frame-symmetric and
    * the result engine-deterministic), then a per-user max — one
    * shuffle on the user key, window and aggregate sharing it.
    */
  def burstProfile(df: DataFrame, userCol: String, tsCol: String,
                   windowSec: Long, threshold: Long): DataFrame = {
    require(windowSec > 0 && threshold > 0, "burstProfile: positive params")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-windowSec, 0)
    df.withColumn("__inwin", count(lit(1)).over(w))
      .groupBy(col(userCol))
      .agg(max(col("__inwin")).as("peak_in_window"),
        count(lit(1)).as("n_events"))
      .withColumn("is_burst", col("peak_in_window") >= threshold)
  }

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
