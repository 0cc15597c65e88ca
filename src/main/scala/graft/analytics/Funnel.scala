package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Staged conversion-funnel analysis over an event log — the classic
  * product-analytics companion to the process-mining views (DFG,
  * variants): for an ordered list of steps, how many users reach each
  * step IN ORDER, and the step-to-step conversion rates.
  *
  * Semantics (the strict-ordering definition every analytics engine
  * documents): a user reaches step k at time t_k = the earliest event
  * of type steps(k) STRICTLY AFTER t_{k-1} (t_0 = earliest steps(0)
  * event). An event at exactly t_{k-1} does not count — simultaneous
  * events cannot witness an ordering, and the strict rule is the one
  * that stays deterministic under ties without consulting event ids.
  *
  * Scale shape: ONE shuffle on the user column; the k staged times are
  * k chained Window projections over the SAME partitioning (Catalyst
  * reuses the Exchange and sort — plan-gated), each referencing the
  * previous stage's column. A NULL previous stage propagates NULL
  * through the strict comparison, so unreached stages need no special
  * casing. The per-user collapse is an ordinary partial aggregate
  * (users × k rows pre-exchange), and everything after it is k-row
  * arithmetic — the conversion-share window runs over k rows, so its
  * single-partition WindowExec is a non-issue by construction.
  *
  * Conversion shares are exact integer micro-units (n·1e6 div base),
  * so the DuckDB oracle replays bit-for-bit.
  */
object Funnel {

  /** Per-user staged reach times: (user, t_0 .. t_{k-1}).
    *
    * `withinSec`, when set, requires every later stage to land within
    * that many seconds of t_0 — the "complete the funnel within T of
    * entry" conversion window, ANCHORED AT THE EARLIEST ENTRY BY
    * CONTRACT: a user whose first entry times out is not re-tried
    * from a later entry event. That anchoring is what keeps the
    * operator a deterministic one-window pass (and SQL-replayable);
    * the re-entrant definition is a per-entry dynamic program over a
    * sorted scan — a different operator with no relational oracle.
    * Exact timestamp-interval arithmetic, no seconds truncation.
    */
  def stageTimes(df: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String],
                 withinSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    require(withinSec.forall(_ > 0), "funnel: withinSec must be positive")
    val w = Window.partitionBy(col(userCol))
    val staged = steps.zipWithIndex.foldLeft(
      df.select(col(userCol), col(typeCol), col(tsCol))) {
      case (acc, (step, 0)) =>
        acc.withColumn("__t0",
          min(when(col(typeCol) === step, col(tsCol))).over(w))
      case (acc, (step, i)) =>
        val inWindow = withinSec match {
          case None => lit(true)
          case Some(t) =>
            col(tsCol) <= col("__t0") + expr(s"INTERVAL $t SECONDS")
        }
        acc.withColumn(s"__t$i",
          min(when(col(typeCol) === step && col(tsCol) > col(s"__t${i - 1}") &&
            inWindow, col(tsCol))).over(w))
    }
    staged.groupBy(col(userCol))
      .agg(min("__t0").as("t0"),
        (1 until steps.size).map(i => min(s"__t$i").as(s"t$i")): _*)
  }

  /** The funnel report: one row per step with users reached, share of
    * the first step, and share of the previous step (micro-units).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             withinSec: Option[Long] = None): DataFrame = {
    val times = stageTimes(df, userCol, typeCol, tsCol, steps, withinSec)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"$i, '$s', t$i" }.mkString(", ")
    val perStep = times
      .select(expr(s"stack(${steps.size}, $stackArgs) AS (step_idx, step, t)"))
      .groupBy(col("step_idx"), col("step"))
      .agg(count(col("t")).as("n_users"))
    // k-row tail: shares against the first and previous step. A zero
    // base (funnel dead from some step on) yields 0, never a division
    // error — dead steps stay visible as loud zero rows.
    val w = Window.orderBy(col("step_idx"))
    perStep
      .withColumn("__first", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prev",
        coalesce(lag(col("n_users"), 1).over(w), col("n_users")))
      .withColumn("conv_first_micro",
        when(col("__first") === 0L, 0L)
          .otherwise(expr("(n_users * 1000000L) div __first")))
      .withColumn("conv_prev_micro",
        when(col("__prev") === 0L, 0L)
          .otherwise(expr("(n_users * 1000000L) div __prev")))
      .select(col("step_idx"), col("step"), col("n_users"),
        col("conv_first_micro"), col("conv_prev_micro"))
  }

  /** First/last-touch conversion attribution — the marketing-analytics
    * companion to the funnel: for every conversion event, which
    * touchpoint "gets the credit". Definitions pinned for determinism:
    *
    *  - first_touch = the session's FIRST event type (frame-complete
    *    first_value under the (ts, tie) order) — a conversion that
    *    opens its session self-attributes, loudly visible as a
    *    conversion-typed touch;
    *  - last_touch = the nearest STRICTLY-PRECEDING non-conversion
    *    event type in the session (IGNORE NULLS last_value over the
    *    [unbounded, -1] frame), `direct` when none exists.
    *
    * Both are one expression over the ONE session-keyed window the
    * log already pays; the report collapses to the |types|²-bounded
    * (first_touch, last_touch) count table. Exact counts — the DuckDB
    * oracle replays bit-for-bit.
    */
  def attribution(df: DataFrame, caseCol: String, typeCol: String,
                  tsCol: String, tieCol: String,
                  conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__first",
        first(col(typeCol)).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__last_np",
        last(when(col(typeCol) =!= conversionType, col(typeCol)),
          ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col(typeCol) === conversionType)
      .groupBy(col("__first").as("first_touch"),
        coalesce(col("__last_np"), lit("direct")).as("last_touch"))
      .agg(count(lit(1)).as("n"))
  }

  /** Conversion path analysis — the "which routes lead here" view next
    * to the funnel: per case that converts, the ordered tail of up to
    * `depth` non-conversion touches immediately before the FIRST
    * conversion (the same first-conversion/strictly-before contract as
    * `multiTouch`), collapsed to a path string and counted. Touchless
    * conversions surface as the `direct` path — never dropped. Depth
    * keeps the operator LINEAR: unbounded paths are the variants
    * table's job; anchored bounded tails are what path reports read.
    *
    * Scale shape: one corpus scan, one case-keyed Exchange shared by
    * the windows and the per-case path collapse, then a
    * partial-aggregated count on the bounded path key.
    */
  def conversionPaths(df: DataFrame, caseCol: String, typeCol: String,
                      tsCol: String, tieCol: String, conversionType: String,
                      depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 8,
      s"conversionPaths: depth in [1, 8], got $depth")
    val w = Window.partitionBy(col(caseCol))
    val wo = w.orderBy(col(tsCol), col(tieCol))
    val isTouch = col("__is_touch")
    df
      .withColumn("__conv", min(when(col(typeCol) === conversionType,
        struct(col(tsCol), col(tieCol)))).over(w))
      .filter(col("__conv").isNotNull)
      .withColumn("__is_touch", col(typeCol) =!= conversionType &&
        struct(col(tsCol), col(tieCol)) < col("__conv"))
      .withColumn("__k", sum(when(isTouch, 1L).otherwise(0L)).over(w))
      .withColumn("__rn", sum(when(isTouch, 1L).otherwise(0L))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__step", when(isTouch && col("__rn") > col("__k") - depth,
          col(typeCol))
        .when(struct(col(tsCol), col(tieCol)) === col("__conv") &&
          col("__k") === 0L, lit("direct")))
      .filter(col("__step").isNotNull)
      .groupBy(col(caseCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col("__step")))),
        e => e("__step")), "->").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_cases"))
  }

  /** One-row process health report — the event-side capstone mirroring
    * the corpus side's `q_corpus_report`: total events, cases, users,
    * distinct variants, the top variant's case count, cases with
    * rework (any repeated activity), converting cases, and the median
    * case duration as an exact order statistic. The numbers a process
    * owner reads before opening any detailed view — and because every
    * one is an exact integer, the whole dashboard is hash-verifiable.
    *
    * Scale shape: ONE case collapse (n, duration, distinct count,
    * conversion flag, variant string in one aggregate buffer), then
    * variant counting and the duration rank run on the case table;
    * the three 1-row aggregates cross-broadcast into the final row.
    */
  def processReport(df: DataFrame, caseCol: String, userCol: String,
                    typeCol: String, tsCol: String, tieCol: String,
                    conversionType: String): DataFrame = {
    val perCase = df.groupBy(col(caseCol))
      .agg(count(lit(1)).as("__n"),
        // min, not first: the case's user is constant (the session id
        // derives from it) and min is ENGINE-DETERMINISTIC
        min(col(userCol)).as("__u"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long"))
          .as("__dur"),
        countDistinct(col(typeCol)).as("__ndist"),
        max(when(col(typeCol) === conversionType, 1L).otherwise(0L))
          .as("__conv"),
        array_join(transform(
          array_sort(collect_list(struct(col(tsCol), col(tieCol),
            col(typeCol)))), e => e(typeCol)), "->").as("__variant"))
    val w0 = Window.partitionBy(lit(0))
    val ranked = perCase
      .withColumn("__rk", row_number().over(
        w0.orderBy(col("__dur"), col(caseCol))))
      .withColumn("__nc", count(lit(1)).over(w0))
    val caseAgg = ranked.agg(
      sum(col("__n")).as("n_events"),
      count(lit(1)).as("n_cases"),
      countDistinct(col("__u")).as("n_users"),
      countDistinct(col("__variant")).as("n_variants"),
      sum(when(col("__ndist") < col("__n"), 1L).otherwise(0L))
        .as("rework_cases"),
      sum(col("__conv")).as("conversion_cases"),
      max(when(col("__rk") === expr("(__nc + 1) div 2"), col("__dur")))
        .as("p50_duration_sec"))
    val topVariant = perCase.groupBy(col("__variant"))
      .agg(count(lit(1)).as("__vn"))
      .agg(max(col("__vn")).as("top_variant_cases"))
    caseAgg.crossJoin(broadcast(topVariant))
  }

  /** Activity → outcome lift — the root-cause view product analytics
    * reads after the funnel: for every non-conversion activity, how
    * much MORE likely a case containing it is to convert than the
    * average case. Per activity: distinct-case support, converting
    * support, conversion rate, the corpus baseline rate, and
    * lift = P(convert | activity) / P(convert), all in exact integer
    * micro-units (the cross-product through DECIMAL(38,0) ≡ DuckDB
    * HUGEINT). Correlation, not causation — the standard caveat, but
    * the standard screen too.
    *
    * Scale shape: one case collapse for outcomes, one distinct
    * (case, activity) collapse, one case-keyed equi-join between
    * them, then the |activities|-bounded aggregate with the 1-row
    * corpus baseline broadcast back.
    */
  def outcomeLift(df: DataFrame, caseCol: String, typeCol: String,
                  conversionType: String): DataFrame = {
    val outcomes = df.groupBy(col(caseCol))
      .agg(max(when(col(typeCol) === conversionType, 1L).otherwise(0L))
        .as("__y"))
    val base = outcomes.agg(count(lit(1)).as("__n_cases"),
      sum(col("__y")).as("__n_conv"))
    df.filter(col(typeCol) =!= conversionType)
      .select(col(caseCol), col(typeCol)).distinct()
      .join(outcomes, Seq(caseCol))
      .groupBy(col(typeCol).as("activity"))
      .agg(count(lit(1)).as("n_cases_with"),
        sum(col("__y")).as("n_conv_with"))
      .crossJoin(broadcast(base))
      .withColumn("rate_micro",
        expr("(n_conv_with * 1000000L) div n_cases_with"))
      .withColumn("baseline_micro",
        expr("(__n_conv * 1000000L) div __n_cases"))
      .withColumn("lift_micro", expr(
        """CAST(CAST(n_conv_with AS DECIMAL(38,0)) * __n_cases * 1000000
          |  div (CAST(n_cases_with AS DECIMAL(38,0)) * __n_conv)
          |  AS BIGINT)""".stripMargin))
      .select(col("activity"), col("n_cases_with"), col("n_conv_with"),
        col("rate_micro"), col("baseline_micro"), col("lift_micro"))
  }

  /** Position-based ("U-shaped") multi-touch attribution — the
    * fractional-credit middle ground between `attribution`'s
    * first/last extremes: each case's FIRST conversion distributes
    * exactly 1e6 micro-units of credit over the non-conversion
    * touches strictly before it — 40% to the first touch, 40% to the
    * last, 20% split across the middles by integer division with the
    * remainder assigned to the EARLIEST middle (deterministic, and
    * per-case conservation is exact — a law the spec executes). A
    * single touch takes the full 1e6, two touches split 50/50, and a
    * touchless conversion credits the `direct` pseudo-touch — loud,
    * never dropped. Only the first conversion per case attributes
    * (the linear-layout contract: later conversions would need
    * per-conversion prefix lists — an all-prefixes quadratic surface).
    *
    * Scale shape: ONE corpus scan and ONE case-keyed Exchange shared
    * by the first-conversion window, the running touch rank and the
    * per-case touch count (the `direct` row is emitted BY THE
    * CONVERSION ROW ITSELF when its case has no touches — a separate
    * touchless-cases branch would recompute the whole scan, the
    * q_wip lesson); the final collapse is a partial-aggregated
    * groupBy on the |types|-bounded touch key. No join, no explode.
    */
  def multiTouch(df: DataFrame, caseCol: String, typeCol: String,
                 tsCol: String, tieCol: String,
                 conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol))
    val wo = w.orderBy(col(tsCol), col(tieCol))
    val isTouch = col("__is_touch")
    df
      .withColumn("__conv", min(when(col(typeCol) === conversionType,
        struct(col(tsCol), col(tieCol)))).over(w))
      .filter(col("__conv").isNotNull)
      .withColumn("__is_touch", col(typeCol) =!= conversionType &&
        struct(col(tsCol), col(tieCol)) < col("__conv"))
      .withColumn("__k", sum(when(isTouch, 1L).otherwise(0L)).over(w))
      .withColumn("__rn", sum(when(isTouch, 1L).otherwise(0L))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("touch", when(isTouch, col(typeCol))
        .when(struct(col(tsCol), col(tieCol)) === col("__conv") &&
          col("__k") === 0L, lit("direct")))
      .filter(col("touch").isNotNull)
      .withColumn("credit_micro", expr(
        """CASE WHEN __k = 0 THEN 1000000L
          |     WHEN __k = 1 THEN 1000000L
          |     WHEN __k = 2 THEN 500000L
          |     WHEN __rn = 1 OR __rn = __k THEN 400000L
          |     ELSE 200000L div (__k - 2) +
          |       (CASE WHEN __rn = 2
          |             THEN 200000L % (__k - 2) ELSE 0L END)
          |END""".stripMargin))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
  }
}
