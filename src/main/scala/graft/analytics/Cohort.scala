package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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

  /** RFM feature table (recency / frequency / monetary — the classic
    * customer-value segmentation a marketing warehouse derives first):
    * per user the days since their last event (anchored at the LOG's
    * last day, broadcast back), event count, and exact DECIMAL value
    * sum, each scored 1–5 against corpus quintile boundaries and
    * concatenated into the familiar `segment` code ("555" = best).
    *
    * Scoring is by comparison against the four exact-percentile
    * boundaries (a 1-row broadcast) — NEVER a global `ntile`, whose
    * single-partition full sort is the 100 TB killer; ties get equal
    * scores by construction (boundary comparisons, no rank). Recency
    * scores are INVERTED (small gap = high score) as RFM convention
    * demands. Monetary goes through integer cents so the boundaries
    * replay cross-engine.
    *
    * Scale shape: one partial-aggregated user collapse, two 1-row
    * bounds aggregates broadcast back — the user table never sorts
    * globally. The UNCACHED plan recomputes the collapse under each
    * bounds pass (visible as repeated scans); at production scale
    * persist/checkpoint the |users|-sized collapse first — the same
    * caching valve `pageRank` applies internally.
    */
  def rfm(df: DataFrame, userCol: String, tsCol: String,
          valueCol: String): DataFrame = {
    val users = df.groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("__m"))
      .withColumn("monetary_cents",
        (col("__m") * 100).cast("long"))
    val bounds = users.agg(
      max(col("__last")).as("__d1"),
      expr("percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("__fq"),
      expr("percentile(monetary_cents, array(0.2D, 0.4D, 0.6D, 0.8D))").as("__mq"))
    def score(c: Column, qs: Column): Column =
      when(c <= element_at(qs, 1), 1)
        .when(c <= element_at(qs, 2), 2)
        .when(c <= element_at(qs, 3), 3)
        .when(c <= element_at(qs, 4), 4)
        .otherwise(5)
    val scored = users.crossJoin(broadcast(bounds))
      .withColumn("recency_days",
        datediff(col("__d1"), col("__last")).cast("long"))
    // recency quantiles need the recency column itself — a second
    // 1-row aggregate over the user table, still broadcast-sized
    val rq = scored.agg(expr(
      "percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("__rq"))
    scored.crossJoin(broadcast(rq))
      .withColumn("r_score", lit(6) - score(col("recency_days"), col("__rq")))
      .withColumn("f_score", score(col("frequency"), col("__fq")))
      .withColumn("m_score", score(col("monetary_cents"), col("__mq")))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  /** Automation (bot) screen — the composite read over the behavioral
    * signals this layer already measures one-by-one: per user, the
    * trailing-`windowSec` burst peak (the L-124 RANGE frame), the
    * median inter-event gap as an exact lower order statistic (the
    * L-155 rank convention), event count and distinct action types —
    * each thresholded into an evidence flag, summed into an integer
    * `score`. Emits EVERY user with their flags (downstream filters
    * by score) — a screen that silently dropped the innocent would
    * hide its own false-positive rate.
    *
    * Single-event users have no gap: their median surfaces as the
    * −1 sentinel and the gap flag stays false — loud, never NULL.
    *
    * Scale shape: ONE user-keyed Exchange shared by the range-frame
    * window, the gap lag, the gap-rank window and the final
    * aggregate (all partition on the user key; the rank's different
    * sort order costs a sort, not a shuffle).
    */
  def automationScreen(df: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String,
                       windowSec: Long = 30L, peakThreshold: Long = 5L,
                       gapP50MaxSec: Long = 60L, minEvents: Long = 50L,
                       maxTypes: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
    val wr = w.orderBy(col(tsCol).cast("long")).rangeBetween(-windowSec, 0)
    val wo = w.orderBy(col(tsCol), col(tieCol))
    // each user's single null gap (their first event) sorts LAST via
    // the MaxValue coalesce — engine NULL-ordering conventions differ
    // (Spark NULLS FIRST asc, DuckDB NULLS LAST), so never rank on a
    // nullable column directly
    val wg = w.orderBy(coalesce(col("__gap"), lit(Long.MaxValue)),
      col(tieCol))
    df.withColumn("__inwin", count(lit(1)).over(wr))
      .withColumn("__gap",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wo)))
      .withColumn("__rk", row_number().over(wg))
      .withColumn("__ng", count(col("__gap")).over(w))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(typeCol)).as("n_types"),
        max(col("__inwin")).as("peak_in_window"),
        coalesce(max(when(col("__rk") === expr("(__ng + 1) div 2"),
          col("__gap"))), lit(-1L)).as("gap_p50_us"))
      .withColumn("flag_burst", col("peak_in_window") >= peakThreshold)
      .withColumn("flag_fast",
        col("gap_p50_us") >= 0L &&
          col("gap_p50_us") <= gapP50MaxSec * 1000000L)
      .withColumn("flag_monotone",
        col("n_events") >= minEvents && col("n_types") <= maxTypes)
      .withColumn("score",
        col("flag_burst").cast("int") + col("flag_fast").cast("int") +
          col("flag_monotone").cast("int"))
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

  /** Gini coefficient of per-key activity — the "do whale users own
    * the log" concentration headline (the distribution-inequality
    * sibling of L-146's per-source Simpson index): with per-key event
    * counts x(1) ≤ … ≤ x(n), G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx),
    * in exact integer micro-units. The naive formulation needs a
    * GLOBAL RANK of all n keys — a single-partition sort of 10^9 users
    * at 100 TB, the ntile trap the RFM screen already dodges. This one
    * uses the VALUE-HISTOGRAM identity instead: keys sharing a count v
    * occupy a contiguous rank block, and the block's Σ i·x(i) is
    * v·(R·m + m(m+1)/2) with R the keys before it — so the rank
    * window runs on the (v, m) histogram, bounded by DISTINCT activity
    * levels (≤ max events per key, a tiny table at any corpus size),
    * never on keys. Within-block order is arbitrary and provably
    * cancels (same v), so the result is deterministic without any
    * tie-break. Products run in DECIMAL(38,0) ≡ HUGEINT; a keyless
    * input yields zero rows (nothing to measure), an all-equal log
    * yields exactly 0, maximal concentration approaches 1 − 1/n.
    *
    * Scale shape: one key-collapse shuffle (partial-aggregated), one
    * histogram collapse, then windows + the final 1-row aggregate on
    * the histogram table (single partition BY CONTRACT — it is
    * value-bounded, not corpus-bounded).
    */
  def gini(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__m"))
    val wo = Window.partitionBy(lit(0)).orderBy(col("__v"))
    hist
      .withColumn("__r", coalesce(sum(col("__m")).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // block contribution to Σ rank·x: v · (R·m + m(m+1)/2)
      .withColumn("__w", expr(
        """CAST(__v AS DECIMAL(38,0)) *
          |  (CAST(__r AS DECIMAL(38,0)) * __m +
          |   (CAST(__m AS DECIMAL(38,0)) * (__m + 1)) div 2)""".stripMargin))
      .groupBy()
      .agg(sum(col("__m")).as("n_keys"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __m")).as("total_events"),
        sum(col("__w")).as("__sw"))
      .withColumn("gini_micro", expr(
        """CAST(((2 * __sw - CAST(n_keys + 1 AS DECIMAL(38,0)) * total_events)
          |  * 1000000)
          | div nullif(CAST(n_keys AS DECIMAL(38,0)) * total_events,
          |            CAST(0 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      // a keyless input: the global agg still emits its one row, all
      // NULL — filter it so "zero rows when nothing to measure" is
      // literally true (r9 advisor)
      .filter(col("n_keys").isNotNull)
      .select(col("n_keys"),
        col("total_events").cast("long").as("total_events"),
        col("gini_micro"))
  }

  /** Kaplan-Meier survival estimator (Kaplan & Meier 1958) — the
    * CENSORING-aware duration analysis the retention triangle can't
    * express: "how long until churn/conversion" when many subjects
    * are still alive at observation end. Right-censored rows
    * (event = false) leave the risk set without counting as deaths —
    * dropping them (what a naive duration histogram does) biases
    * survival DOWN, pinned by law. Input is one row per subject
    * (duration, event observed?); output one row per DISTINCT event
    * time ascending: n_risk (subjects with duration ≥ t), d (deaths
    * at t), n_censored (censorings at t — by the standard convention
    * censored-at-t subjects are still at risk AT t), and
    * s_micro = the product-limit Π(1 − dᵢ/nᵢ) FLOOR-QUANTIZED to
    * micro at every step BY CONTRACT (the exact rational's
    * denominator grows without bound; per-step floor keeps the
    * estimate deterministic, monotone non-increasing, and within
    * #steps micro of exact — the chi2Contingency quantization class).
    * With NO censoring the estimator must equal the empirical
    * survival count ratio (within that quantization) — the executed
    * identity law.
    *
    * Scale shape: one per-(duration, event) collapse — the corpus's
    * only shuffle — then a driver loop over the BOUNDED distinct-time
    * table (the PAV/BPE class of driver work), capped loud at 100k
    * distinct times. Unlike PAV (whose pooling stack pops arbitrarily
    * far back), the product-limit is a per-row LINEAR recurrence, so
    * a recursive-CTE oracle replays it exactly — q_kaplan_meier is
    * hash-gated, not rows-only.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val spark = df.sparkSession
    val collapsed = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(expr(s"CAST(floor($durationCol * 1000) AS BIGINT)").as("t"),
        col(eventCol).cast("boolean").as("e"))
      .groupBy("t")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("e"), 1L).otherwise(0L)).as("c"))
      .orderBy(col("t").asc)
      .collect()
    require(collapsed.length <= 100000,
      s"kaplanMeier: ${collapsed.length} distinct times exceed the bounded" +
        " driver-table contract (100k) — pre-quantize the duration")
    val total = collapsed.map(r => r.getLong(1) + r.getLong(2)).sum
    var atRisk = total
    var s = 1000000L
    val rows = collapsed.flatMap { r =>
      val (t, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val row = if (d > 0) {
        s = s * (atRisk - d) / atRisk // floor BY CONTRACT, atRisk >= d
        Some((t, atRisk, d, c, s))
      } else Some((t, atRisk, 0L, c, s))
      atRisk -= d + c
      row
    }.toSeq
    import spark.implicits._
    rows.toDF("t", "n_risk", "d", "n_censored", "s_micro")
  }
}
