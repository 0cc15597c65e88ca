package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-axis views over an event log: run-length episode compaction
  * (the SCD2/gaps-and-islands shape) and exact-integer CUSUM
  * change-point detection on daily volume.
  */
object Timeline {

  /** Run-length episode compaction — collapse each user's consecutive
    * same-activity events into one episode row (start/end timestamp,
    * event count): the islands half of gaps-and-islands, and the same
    * shape that compacts a change-log into SCD2 validity intervals
    * (attribute runs → effective_from/effective_to). A 100 TB raw
    * click stream compacts to its behavioral segments without ever
    * leaving the user partition.
    *
    * Plan shape: ONE Exchange on the user key — the episode id is a
    * running sum of boundary flags (`lag` ≠ current) over the same
    * partition+order the flag itself uses, so both windows share one
    * sort; the groupBy that follows is partial-aggregated. The
    * first event of a user opens episode 1 (lag NULL => boundary).
    */
  def episodes(df: DataFrame, userCol: String, activityCol: String,
               tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val boundary = when(lag(col(activityCol), 1).over(w).isNull ||
      lag(col(activityCol), 1).over(w) =!= col(activityCol), 1L).otherwise(0L)
    df.withColumn("__ep", sum(boundary)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__ep").as("episode"), col(activityCol))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  /** Calendar densify + LOCF (last observation carried forward) — the
    * standard as-of daily panel a metrics warehouse derives from an
    * irregular event stream: per user one row PER CALENDAR DAY from
    * their first observed day to the log's last day, carrying the most
    * recent observed value forward across the gaps (`is_observed`
    * distinguishes carried rows — loud, never silent). Values are
    * CARRIED, never recomputed, so doubles pass through bit-exact and
    * the whole panel is hash-verifiable cross-engine.
    *
    * The day's representative value is the value of its LAST event
    * under the deterministic (ts, tie) order. LOCF itself is
    * `last(value, ignoreNulls)` over the user's day order — frame-
    * complete by construction (rows unbounded preceding).
    *
    * Scale shape: the corpus collapses to (user, day) rows in one
    * window + partial-agg pass on the user key; the densify explode
    * runs on the users × calendar-span-bounded panel (the
    * rollingActives argument), with the global last day riding a
    * 1-row broadcast. The LOCF window reuses the user partitioning.
    */
  def densifyLocf(df: DataFrame, userCol: String, valueCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol), to_date(col(tsCol)))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val daily = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(userCol), to_date(col(tsCol)).as("day"),
        col(valueCol).as("__v"))
    val lastDay = daily.agg(max(col("day")).as("__d1"))
    val wl = Window.partitionBy(col(userCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .groupBy(col(userCol)).agg(min(col("day")).as("__d0"))
      .crossJoin(broadcast(lastDay))
      .select(col(userCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
      .join(daily, Seq(userCol, "day"), "left")
      .withColumn("value_filled", last(col("__v"), ignoreNulls = true).over(wl))
      .select(col(userCol), col("day"), col("value_filled"),
        col("__v").isNotNull.as("is_observed"))
  }

  /** Work-in-progress (open-case concurrency) profile — for every
    * calendar day on which the count changes, how many cases are
    * simultaneously open (a case is open from its first event's day
    * through its last event's day, inclusive). The classic sweep-line:
    * each case contributes +1 on its start day and −1 on the day AFTER
    * its end day; the running sum of the per-day deltas is the open
    * count. Days with no boundary are omitted (the count is constant
    * across them); the final end_day+1 row closes the chart at 0 —
    * an executed conservation check (sum of deltas is zero).
    *
    * Scale shape: the corpus collapses to one (start, end) row per
    * case in a single partial-aggregated shuffle, then to per-day
    * deltas bounded by the CALENDAR span — the running-sum window runs
    * on that tiny table (single partition over ≤ span·2 rows BY
    * CONTRACT, same as `volumeChangepoint`'s chart), never on corpus
    * data.
    */
  def wipDaily(df: DataFrame, caseCol: String, tsCol: String): DataFrame = {
    val spans = df.groupBy(col(caseCol)).agg(
      to_date(min(col(tsCol))).as("__start"),
      to_date(max(col(tsCol))).as("__end"))
    // Both boundary rows come out of ONE pass over the span table (a
    // row-local explode) — a UNION of two selects would recompute the
    // whole per-case collapse, and the corpus scan under it, twice.
    val deltas = spans.select(explode(array(
        struct(col("__start").as("day"), lit(1L).as("__d")),
        struct(date_add(col("__end"), 1).as("day"), lit(-1L).as("__d"))))
        .as("__b"))
      .select(col("__b.day").as("day"), col("__b.__d").as("__d"))
      .groupBy(col("day")).agg(sum(col("__d")).as("delta"))
      .withColumn("__g", lit(0))
    deltas
      .withColumn("open_cases", sum(col("delta")).over(
        Window.partitionBy(col("__g")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("delta"), col("open_cases"))
  }

  /** Inter-arrival ("time since the user's previous action") statistics
    * by action type — per event_type of the CURRENT event, the count,
    * exact BIGINT sum, and p50/p90/p99 of the microsecond gap back to
    * the same user's previous event (any type) under the deterministic
    * (ts, tie) order. Each user's first event has no predecessor and is
    * excluded. The percentiles are exact LOWER ORDER STATISTICS at
    * ranks ceil(q·(n+1)) under the (gap, tie) order — the same
    * integer-rank convention as `Dfg.performanceEdges`, replayable
    * bit-for-bit by any engine with row_number (never interpolated
    * doubles).
    *
    * Scale shape: one user-key Exchange for the lag window, then one
    * Exchange on the type key shared by the rank window and the final
    * partial-aggregated collapse to |event types| rows. At 100 TB the
    * per-type rank sort is the cost — swap in `approx_percentile`
    * (the `q_quantiles_approx` arm) for a one-pass bounded sketch.
    */
  def interarrival(df: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val tw = Window.partitionBy(col(typeCol))
    df.withColumn("__gap_us",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
      .filter(col("__gap_us").isNotNull)
      .select(col(typeCol), col("__gap_us"), col(tieCol))
      .withColumn("__rk", row_number().over(
        tw.orderBy(col("__gap_us"), col(tieCol))))
      .withColumn("__n", count(lit(1)).over(tw))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__gap_us")).as("sum_gap_us"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("__gap_us")))
          .as("p50_us"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"), col("__gap_us")))
          .as("p90_us"),
        max(when(col("__rk") === expr("(99 * __n + 99) div 100"), col("__gap_us")))
          .as("p99_us"))
  }

  /** Waiting-time decomposition per activity — the CASE-keyed sibling
    * of `interarrival` (which profiles the USER axis) and the other
    * half of the sojourn split the lifecycle pairing (L-184) gives
    * service time for: the gap between an event and its PREDECESSOR
    * IN THE CASE, attributed to the waiting activity — where queues,
    * handover delays and batching (L-165's pattern) actually show up.
    * Per activity: count, exact microsecond sum, and p50/p90/p99 as
    * exact lower order statistics at ranks ceil(q·(n+1)) under the
    * (gap, tie) order — the `interarrival` conventions verbatim, so
    * the two views are comparable cell by cell. Case-opening events
    * have no predecessor and are excluded BY CONTRACT (their wait is
    * the inter-CASE arrival, a different question).
    *
    * Scale shape: one case-keyed lag window, then the rank window and
    * final aggregate share one activity-keyed Exchange.
    */
  def waitingTime(df: DataFrame, caseCol: String, activityCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val aw = Window.partitionBy(col(activityCol))
    df.withColumn("__gap_us",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
      .filter(col("__gap_us").isNotNull)
      .select(col(activityCol), col("__gap_us"), col(tieCol))
      .withColumn("__rk", row_number().over(
        aw.orderBy(col("__gap_us"), col(tieCol))))
      .withColumn("__n", count(lit(1)).over(aw))
      .groupBy(col(activityCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__gap_us")).as("sum_wait_us"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("__gap_us")))
          .as("p50_us"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"), col("__gap_us")))
          .as("p90_us"),
        max(when(col("__rk") === expr("(99 * __n + 99) div 100"), col("__gap_us")))
          .as("p99_us"))
  }

  /** Daily SLA report — per calendar day (of case start), how many
    * cases began and their duration p50/p90/max in whole seconds, the
    * percentiles as exact LOWER ORDER STATISTICS at ranks
    * ceil(q·(n+1)) under the (duration, case-id) order (the
    * `interarrival` convention — replayable integer ranks, never
    * interpolated doubles). The operations-review view over the same
    * spans `wipDaily` sweeps.
    *
    * Scale shape: one case collapse (partial-aggregated), then the
    * rank window and final aggregate share one day-keyed Exchange
    * over the per-case table.
    */
  def slaDaily(df: DataFrame, caseCol: String, tsCol: String): DataFrame = {
    val spans = df.groupBy(col(caseCol))
      .agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__t1"))
      .select(col(caseCol), to_date(col("__t0")).as("day"),
        (col("__t1").cast("long") - col("__t0").cast("long")).as("dur_sec"))
    val dw = Window.partitionBy(col("day"))
    spans
      .withColumn("__rk", row_number().over(
        dw.orderBy(col("dur_sec"), col(caseCol))))
      .withColumn("__n", count(lit(1)).over(dw))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("dur_sec")))
          .as("p50_sec"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"), col("dur_sec")))
          .as("p90_sec"),
        max(col("dur_sec")).as("max_sec"))
  }

  /** Weekday × hour seasonality profile per event type — the load
    * heat-map capacity planning and anomaly baselining read (is
    * Tuesday 14:00 normally busy?): per (type, weekday 0=Monday,
    * hour) cell the event count, the exact micro-unit share of the
    * type's total, and a peak flag (ties all flagged — deterministic,
    * no float comparison). Weekday is ISO-based on both engines
    * (Spark `weekday` ≡ DuckDB `isodow − 1`), never the
    * locale-convention `dayofweek`.
    *
    * Scale shape: the corpus collapses to ≤ |types|·168 cells in ONE
    * partial-aggregated shuffle; the share/peak windows run on the
    * collapsed table.
    */
  def seasonality(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val tw = Window.partitionBy(col(typeCol))
    df.groupBy(col(typeCol), expr(s"weekday($tsCol)").as("dow"),
        hour(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(tw))
      .withColumn("share_micro", expr("(n * 1000000L) div __tot"))
      .withColumn("is_peak", col("n") === max(col("n")).over(tw))
      .select(col(typeCol), col("dow"), col("hour"), col("n"),
        col("share_micro"), col("is_peak"))
  }

  /** Daily-volume CUSUM change-point screen — the classic
    * cumulative-sum control chart (Page 1954) on the log's daily event
    * count, in EXACT integers end to end: mean_micro is one floored
    * integral division of BIGINTs, each day's deviation is
    * n·1e6 − mean_micro, and the CUSUM is their running sum — so the
    * whole chart replays bit-for-bit in any engine and the argmax
    * |CUSUM| day (the estimated change point, flagged on every row
    * that ties the max) needs no float comparison. The calendar is
    * DENSIFIED between the observed min and max day, so a dead day
    * counts as 0 instead of silently shrinking the denominator.
    *
    * Scale shape: the corpus collapses to per-day counts in ONE
    * partial-aggregated shuffle; the date bounds ride back as a 1-row
    * broadcast (the minmax-bounds pattern), and the densify/window/
    * flag steps all run on the calendar-span-bounded table.
    */
  /** Densified per-day event counts (dead days = loud 0) over the
    * observed [min, max] day span, with the total riding along as the
    * constant window-partition key — shared by the CUSUM chart and
    * the forecast backtest. Corpus collapses in ONE partial-agg
    * shuffle; everything downstream is calendar-bounded.
    */
  private def denseDailyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"),
        sum(col("n")).as("__total"))
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"),
        col("__total"))
      .join(daily, Seq("day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Seasonal-naive forecast backtest — the capacity-planning baseline
    * every fancier model must beat (Hyndman's "no forecast should be
    * published without it"): predict each day's event count with the
    * SAME WEEKDAY LAST WEEK (lag 7 on the densified calendar) and
    * with yesterday (lag 1, the persistence baseline), and report
    * both absolute errors in exact integers plus a strict
    * weekly-beats-naive flag per day. Days before the first full week
    * have no seasonal prediction and are excluded BY CONTRACT (a
    * backtest over undefined predictions would be silent fiction).
    *
    * Scale shape: the `denseDailyCounts` collapse, then two lags over
    * one calendar-bounded window.
    */
  def seasonalNaiveBacktest(df: DataFrame, tsCol: String): DataFrame = {
    val wo = Window.partitionBy(col("__total")).orderBy(col("day"))
    denseDailyCounts(df, tsCol)
      .withColumn("pred_weekly", lag(col("n"), 7).over(wo))
      .withColumn("pred_naive", lag(col("n"), 1).over(wo))
      .filter(col("pred_weekly").isNotNull)
      .select(col("day"), col("n"), col("pred_weekly"), col("pred_naive"),
        abs(col("n") - col("pred_weekly")).as("err_weekly"),
        abs(col("n") - col("pred_naive")).as("err_naive"))
      .withColumn("weekly_wins", col("err_weekly") < col("err_naive"))
  }

  def volumeChangepoint(df: DataFrame, tsCol: String): DataFrame = {
    val dense = denseDailyCounts(df, tsCol)
      .withColumn("__days", count(lit(1)).over(Window.partitionBy(col("__total"))))
      .withColumn("mean_micro", expr("(__total * 1000000L) div __days"))
      .withColumn("dev_micro", col("n") * lit(1000000L) - col("mean_micro"))
    val wo = Window.partitionBy(col("__total")).orderBy(col("day"))
    dense
      .withColumn("cusum_micro", sum(col("dev_micro"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__peak", max(abs(col("cusum_micro")))
        .over(Window.partitionBy(col("__total"))))
      .withColumn("is_changepoint", abs(col("cusum_micro")) === col("__peak"))
      .select(col("day"), col("n"), col("mean_micro"), col("dev_micro"),
        col("cusum_micro"), col("is_changepoint"))
  }

  /** Daily-volume OLS trend — the "is traffic growing" one-row
    * headline next to the CUSUM chart: least-squares slope and
    * intercept of events-per-day against the day index on the
    * DENSIFIED calendar (a dead day pulls the trend down as a loud 0
    * instead of silently shrinking the sample), plus Pearson r² as the
    * fit quality — all EXACT integer micro-units. The closed-form
    * sums n·Σxy − Σx·Σy etc. run in DECIMAL(38,0) ≡ HUGEINT; the two
    * signed divisions go through sign-decomposition (integral div on
    * non-negative operands — the Spark-truncates / DuckDB-floors trap),
    * and r² = num²·1e6 / (denx·deny) has a non-negative numerator by
    * construction. Degenerate inputs surface as NULL, never a crash:
    * a single-day log has denx = 0 (no slope is defined), a constant
    * log has deny = 0 (r² is 0/0). Headroom: num² · 1e6 must stay
    * under 10^38 — |num| ≤ T·X with T total events, X span days, so
    * the exact-r² design point is T·X < 10^16 (e.g. 10^12 events over
    * 10^4 days); beyond it BOTH engines fail LOUD on decimal/HUGEINT
    * overflow rather than returning a quietly wrong fit.
    *
    * Scale shape: the shared `denseDailyCounts` collapse (one
    * partial-agg shuffle over the corpus), then one aggregate over the
    * calendar-span-bounded table. One row out.
    */
  def volumeTrend(df: DataFrame, tsCol: String): DataFrame = {
    val wAll = Window.partitionBy(col("__total"))
    denseDailyCounts(df, tsCol)
      .withColumn("x",
        datediff(col("day"), min(col("day")).over(wAll)).cast("long"))
      .groupBy()
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("__sx"), sum(col("n")).as("total_events"),
        sum(col("x") * col("x")).as("__sxx"),
        // n² and x·n accumulate in DECIMAL(38,0): a 1e10-events day
        // squares past Long range long before the r² bound bites.
        sum(col("n").cast("decimal(38,0)") * col("n")).as("__syy"),
        sum(col("x").cast("decimal(38,0)") * col("n")).as("__sxy"))
      .withColumn("__num", expr(
        "CAST(n_days AS DECIMAL(38,0)) * __sxy - CAST(__sx AS DECIMAL(38,0)) * total_events"))
      .withColumn("__denx", expr(
        "CAST(n_days AS DECIMAL(38,0)) * __sxx - CAST(__sx AS DECIMAL(38,0)) * __sx"))
      .withColumn("__deny", expr(
        "CAST(n_days AS DECIMAL(38,0)) * __syy - CAST(total_events AS DECIMAL(38,0)) * total_events"))
      .withColumn("__ic", expr(
        "CAST(total_events AS DECIMAL(38,0)) * __sxx - CAST(__sx AS DECIMAL(38,0)) * __sxy"))
      .withColumn("slope_micro", expr(
        """CASE WHEN __denx = 0 THEN NULL
          |  WHEN __num >= 0 THEN (__num * 1000000) div __denx
          |  ELSE -((-__num * 1000000) div __denx) END""".stripMargin))
      .withColumn("intercept_micro", expr(
        """CASE WHEN __denx = 0 THEN NULL
          |  WHEN __ic >= 0 THEN (__ic * 1000000) div __denx
          |  ELSE -((-__ic * 1000000) div __denx) END""".stripMargin))
      .withColumn("r2_micro", expr(
        """CASE WHEN __denx = 0 OR __deny = 0 THEN NULL
          |  ELSE (__num * __num * 1000000) div (__denx * __deny) END""".stripMargin))
      .select(col("n_days"), col("total_events"), col("slope_micro"),
        col("intercept_micro"), col("r2_micro"))
  }

  /** Non-parametric trend pair for the daily volume — the robust
    * sibling of `volumeTrend`'s OLS: the Mann-Kendall statistic
    * S = Σ sign(y_j − y_i) over day pairs i < j with Kendall's
    * tau = S / (n(n−1)/2), plus the Theil-Sen slope (median of all
    * pairwise slopes — up to ~29% outlier days cannot move it, where
    * one flash-crowd day drags OLS arbitrarily). S and tau are EXACT
    * integers end to end; each pairwise slope is ONE IEEE double
    * division (bit-identical cross-engine — the zscore convention:
    * single float ops are fine, float ACCUMULATION is not), the
    * median is the exact lower order statistic at rank
    * ceil((n_pairs+1)/2) under the (slope, day_i, day_j) order, and
    * only the final floor(·1e6) quantizes.
    *
    * Scale shape: the `denseDailyCounts` collapse, then a self
    * EQUI-join on the span key with day_i < day_j as post-filter —
    * QUADRATIC IN CALENDAR DAYS BY CONTRACT (the statistic is defined
    * over all day pairs; a decade is ~6.7M pairs — trivial — and the
    * corpus only ever pays the daily collapse). The rank window runs
    * single-partition on the pair table, bounded by the same
    * contract.
    */
  def pairwiseTrend(df: DataFrame, tsCol: String): DataFrame = {
    // materialize the (tiny, calendar-bounded) daily table before the
    // self-join: without this, BOTH join branches re-scan and
    // re-collapse the corpus — the recompute trap the heuristic-deps
    // gate caught, here cut by an eager localCheckpoint because the
    // two branches differ (no common Exchange to reuse)
    val dense = denseDailyCounts(df, tsCol).localCheckpoint(true)
    val lhs = dense.select(col("__total"), col("day").as("__d1"),
      col("n").as("__y1"))
    val rhs = dense.select(col("__total").as("__t2"), col("day").as("__d2"),
      col("n").as("__y2"))
    val pairs = lhs.join(rhs,
        col("__total") === col("__t2") && col("__d1") < col("__d2"))
      .withColumn("__dy", col("__y2") - col("__y1"))
      .withColumn("__slope",
        col("__dy").cast("double") /
          datediff(col("__d2"), col("__d1")).cast("double"))
    val wo = Window.partitionBy(col("__total"))
      .orderBy(col("__slope"), col("__d1"), col("__d2"))
    pairs
      .withColumn("__np", count(lit(1)).over(Window.partitionBy(col("__total"))))
      .withColumn("__rk", row_number().over(wo))
      // GLOBAL aggregate, not groupBy(__total): __total is constant so
      // the non-degenerate result is identical, but a single-day log
      // (zero pairs) must still emit its one n_pairs=0 row — matching
      // the oracle's global aggregate and making the n_pairs=0 CASE
      // branch reachable (r9 advisor)
      .groupBy()
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(signum(col("__dy")).cast("long")).as("s"),
        // rank ceil((n_pairs+1)/2) = (n_pairs+2) div 2 — the exact
        // lower median under the repo's order-statistic convention
        max(when(col("__rk") === expr("(__np + 2) div 2"),
          col("__slope"))).as("__med"))
      .withColumn("tau_micro", expr(
        """CASE WHEN n_pairs = 0 THEN NULL
          |  WHEN s >= 0 THEN (s * 1000000L) div n_pairs
          |  ELSE -((-s * 1000000L) div n_pairs) END""".stripMargin))
      .withColumn("theilsen_micro",
        expr("CAST(floor(__med * 1000000.0) AS BIGINT)"))
      .select(col("n_pairs"), col("s"), col("tau_micro"),
        col("theilsen_micro"))
  }
}
