package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensic / audit screens over numeric facts — the fraud-detection
  * classics a warehouse runs next to the data-quality gates (z-score
  * fences, column profiler): Benford's-law digit conformity and the
  * exact 2×2 chi-square independence test. Both are single-scan
  * partial aggregates with exact integer arithmetic, so they
  * hash-verify cross-engine and scale to any corpus the scan itself
  * survives.
  */
object Forensics {

  /** Benford micro-unit expectations: floor(log10(1 + 1/d) · 1e6) for
    * d = 1..9, pinned as constants so no libm log enters the pipeline.
    * They sum to exactly 1e6.
    */
  private val BenfordMicro =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  /** Benford's-law first-digit screen (Newcomb 1881 / Benford 1938;
    * Nigrini's forensic-accounting workhorse): the distribution of the
    * first significant digit of a positive amount column against the
    * logarithmic expectation — invoices, payments and order totals
    * follow it, fabricated numbers usually don't. Amounts quantize to
    * cents by the floor(value·100) convention; the first digit comes
    * from the DECIMAL STRING of that integer (exact on both engines —
    * no log10, no float power), zero/negative amounts are excluded BY
    * CONTRACT (Benford is defined on positive magnitudes). ALL nine
    * digits are emitted — an absent digit is the loudest possible
    * deviation and must surface as n = 0, not as a missing row — with
    * observed/expected micro shares, |Δ|, and Nigrini's MAD conformity
    * statistic (Σ|Δ| div 9) stamped on every row (a column, not an
    * extra row: a union summary would re-scan the corpus subtree — the
    * q_wip recompute lesson).
    *
    * Scale shape: the corpus collapses to ≤ 9 digit counts in ONE
    * partial-aggregated shuffle; the spine join and windows run on the
    * 9-row table (single partition BY CONTRACT).
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val observed = df
      .select(expr(s"CAST(floor($valueCol * 100) AS BIGINT)").as("__cents"))
      .filter(col("__cents") > 0L)
      .select(expr("CAST(substring(CAST(__cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"),
        element_at(array(BenfordMicro.map(lit): _*), col("id").cast("int"))
          .as("expected_micro"))
    val w = Window.partitionBy(lit(0))
    spine.join(observed, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__tot", sum(col("n")).over(w))
      .withColumn("share_micro", expr("(n * 1000000L) div nullif(__tot, 0L)"))
      .withColumn("delta_micro", abs(col("share_micro") - col("expected_micro")))
      .withColumn("mad_micro",
        expr("CAST(sum(delta_micro) OVER () AS BIGINT) div 9"))
      .select(col("digit"), col("n"), col("share_micro"),
        col("expected_micro"), col("delta_micro"), col("mad_micro"))
  }

  /** Exact 2×2 chi-square independence test (Pearson 1900) between a
    * boolean group split and a boolean outcome — the A/B-test
    * significance screen: χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)),
    * which for the 2×2 table needs NO expected-value floats — the
    * whole statistic is one integral division of exact DECIMAL(38,0)
    * ≡ HUGEINT products ((ad−bc)² is non-negative by construction, so
    * the floor/truncate divergence never applies). Per-group
    * conversion rates ride along in micro-units; a degenerate margin
    * (an empty group or a constant outcome) yields NULL via NULLIF —
    * independence is undefined there, never a division error.
    * Headroom: N·(ad−bc)²·1e6 under 10^38 holds through N ≈ 10^6.4 of
    * perfectly-split data (worst case (ad−bc)² ≈ N⁴/16); beyond that
    * BOTH engines fail loud on decimal/HUGEINT overflow — at true
    * 100 TB row counts run the screen per-stratum (the natural A/B
    * shape) or accept the documented double-precision valve of the
    * z-score family.
    *
    * Scale shape: ONE conditional-sum aggregate over the corpus — the
    * cheapest possible screen. One row out.
    */
  def chi2(df: DataFrame, groupCol: String, outcomeCol: String): DataFrame =
    df.select(col(groupCol).as("__g"), col(outcomeCol).as("__o"))
      .agg(
        sum(when(col("__g") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__g") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__g") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__g") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("rate_g_micro", expr("(a * 1000000L) div nullif(a + b, 0L)"))
      .withColumn("rate_o_micro", expr("(c * 1000000L) div nullif(c + d, 0L)"))
      .withColumn("chi2_micro", expr(
        """(CAST(n AS DECIMAL(38,0)) *
          |   (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c) *
          |   (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c) *
          |   1000000)
          | div nullif(
          |   CAST(a + b AS DECIMAL(38,0)) * (c + d) *
          |     CAST(a + c AS DECIMAL(38,0)) * (b + d),
          |   CAST(0 AS DECIMAL(38,0)))""".stripMargin))
      .select(col("a"), col("b"), col("c"), col("d"), col("n"),
        col("rate_g_micro"), col("rate_o_micro"), col("chi2_micro"))

  /** Poisson-bootstrap cumulative thresholds on a 1e6 grid:
    * floor(1e6·P(X ≤ k)) for X ~ Poisson(1), k = 0..4; the tail
    * (~0.37%) caps at weight 5. Pinned constants so no libm exp
    * enters the pipeline (e⁻¹-derived, same class as BenfordMicro).
    */
  private val PoissonCum = Seq(367879L, 735758L, 919698L, 981011L, 996340L)

  /** Deterministic Poisson-bootstrap confidence intervals (Chamandy
    * et al., "Estimating Uncertainty for Massive Data Streams" — the
    * bootstrap that works when the data cannot be resampled by index:
    * each row gets an independent Poisson(1) pseudo-count per
    * replica, so one pass computes ALL replica means). Per key:
    * the point mean plus the [2.5%, 97.5%] percentile interval over
    * `replicas` bootstrap means — the error bar any A/B readout or
    * quality-metric report should carry.
    *
    * Deterministic END TO END: the pseudo-count comes from an exact
    * integer mix hash of (id, replica) on a 1e6 grid against the
    * pinned Poisson(1) inverse-CDF thresholds above (documented:
    * hash-derived replication, not cryptographic randomness — rerun
    * reproduces the same interval, the dpCounts seeding philosophy);
    * values quantize to milli-units; each replica mean is an exact
    * integer division; the interval bounds are exact LOWER order
    * statistics at ranks ceil(0.025·R)/ceil(0.975·R) under the
    * (mean, replica) order. Empty-weight replicas (possible on tiny
    * keys) emit NULL means and are EXCLUDED from ranking with their
    * count reported — never a fabricated zero.
    *
    * Scale shape: the replica explode is map-side (corpus × R rows
    * partial-aggregate to keys × R before the shuffle); ranking runs
    * on the keys × R table. R = 100-500 is the published sweet spot.
    */
  def bootstrapCi(df: DataFrame, keyCol: String, idCol: String,
                  valueCol: String, replicas: Int = 200): DataFrame = {
    require(replicas >= 20 && replicas <= 2000,
      s"bootstrapCi: replicas in [20, 2000], got $replicas")
    import org.apache.spark.sql.expressions.Window
    val cumCase = PoissonCum.zipWithIndex
      .map { case (c, k) => s"WHEN __h < ${c}L THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 5L END")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(idCol),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    val point = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        expr("""CAST((sum(CAST(v AS DECIMAL(38,0))) * 1000)
          | div count(1) AS BIGINT)""".stripMargin).as("mean_micro"))
    val reps = base
      .select(col(keyCol), col(idCol), col("v"),
        explode(expr(s"sequence(0, ${replicas - 1})")).as("r"))
      .withColumn("__h", expr(
        s"pmod($idCol * 2654435761L + r * 40503L, 2147483648L) % 1000000L"))
      .withColumn("w", expr(cumCase))
      .groupBy(col(keyCol), col("r"))
      .agg(sum(expr("CAST(w * v AS DECIMAL(38,0))")).as("__wv"),
        sum(col("w")).as("__w"))
      .withColumn("rep_mean_micro", expr(
        """CAST((__wv * 1000) div nullif(CAST(__w AS DECIMAL(38,0)),
          |  CAST(0 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
    val ranked = reps.filter(col("rep_mean_micro").isNotNull)
      .withColumn("__rk", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col("rep_mean_micro").asc, col("r").asc)))
      .withColumn("__nr", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    def at(q: Double) = ranked
      .filter(col("__rk") === expr(
        s"CAST(ceil(CAST(__nr AS DOUBLE) * $q) AS INT)"))
      .select(col(keyCol), col("rep_mean_micro"))
    val empties = reps.groupBy(col(keyCol))
      .agg(sum(when(col("rep_mean_micro").isNull, 1L).otherwise(0L))
        .as("n_empty_replicas"))
    point
      .join(at(0.025).withColumnRenamed("rep_mean_micro", "lo_micro"),
        Seq(keyCol), "left")
      .join(at(0.975).withColumnRenamed("rep_mean_micro", "hi_micro"),
        Seq(keyCol), "left")
      .join(empties, Seq(keyCol), "left")
      .select(col(keyCol), col("n"), col("mean_micro"),
        col("lo_micro"), col("hi_micro"),
        coalesce(col("n_empty_replicas"), lit(0L)).as("n_empty_replicas"))
  }

  /** Numeric-distribution drift monitor — the production companion to
    * the categorical source-mix drift (`Dedup.snapshotDrift`): bin a
    * score/value column on a FIXED equal-width grid derived from the
    * combined min/max of both snapshots (the grid must be shared, or
    * the comparison measures the grid), report per-bin counts and
    * exact micro-unit shares for both sides, the share delta, and the
    * total-variation distance Σ|p−q|/2 stamped on every row — the
    * PSI-style drift gate with TV in place of PSI's ln (ln is not
    * cross-engine-hashable; TV is exact integers end to end and
    * bounds every deployment decision PSI would drive). Every bin of
    * the grid is EMITTED, empty on one or both sides included — a
    * vanished bin is the loudest drift signal. Values quantize to
    * milli-units first so binning is integer arithmetic; each side's
    * share uses its own total (the snapshots may differ in size).
    *
    * Scale shape: one bounded min/max aggregate + one partial-
    * aggregated bin count per side; the grid is a broadcast spine.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
                     nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000,
      s"histogramDrift: nBins in [2, 1000], got $nBins")
    val spark = a.sparkSession
    import spark.implicits._
    def q(df: DataFrame) = df.filter(col(valueCol).isNotNull)
      .select(expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    val qa = q(a); val qb = q(b)
    val bounds = qa.unionByName(qb).agg(min("v"), max("v")).head()
    require(!bounds.isNullAt(0), "histogramDrift: both snapshots empty")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // width ceil so bin index < nBins even at v = hi; a constant
    // column (hi = lo) puts everything in bin 0 — one bin, zero TV
    val width = math.max(1L, (hi - lo) / nBins + (if ((hi - lo) % nBins == 0) 0L else 1L))
    def binned(df: DataFrame, as: String) = df
      .select(expr(s"(v - ${lo}L) div ${width}L").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val joined = spine
      .join(binned(qa, "n_a"), Seq("bin"), "left")
      .join(binned(qb, "n_b"), Seq("bin"), "left")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val tot = joined.agg(sum("n_a"), sum("n_b")).head()
    val (ta, tb) = (math.max(tot.getLong(0), 1L), math.max(tot.getLong(1), 1L))
    val shares = joined
      .withColumn("share_a_micro", expr(s"(n_a * 1000000L) div ${ta}L"))
      .withColumn("share_b_micro", expr(s"(n_b * 1000000L) div ${tb}L"))
      .withColumn("delta_micro", col("share_b_micro") - col("share_a_micro"))
    val tv = shares.agg(sum(abs(col("delta_micro")))).head().getLong(0) / 2L
    shares
      .withColumn("lo_v", lit(lo) + col("bin") * width)
      .withColumn("tv_micro", lit(tv))
      .select(col("bin"), col("lo_v"), col("n_a"), col("n_b"),
        col("share_a_micro"), col("share_b_micro"), col("delta_micro"),
        col("tv_micro"))
  }

  /** Median-absolute-deviation outlier screen — the ROBUST sibling of
    * the z-score tier (L-170): where mean/σ let one flash value drag
    * the threshold (masking its neighbors), the median and MAD ignore
    * up to ~50% contamination, the textbook Hampel identifier. All
    * EXACT integers: values quantize to milli-units, the per-key
    * median and the MAD are exact LOWER order statistics at rank
    * ceil(n/2) under the deterministic (value, id) / (deviation, id)
    * orders (the variantPerformance convention — never interpolated
    * doubles), and the flag is the division-free cross-multiplied
    * compare dev · 1e6 > threshold · mad. A CONSTANT group has
    * mad = 0 and flags any deviating row — deviation from a constant
    * is the loudest outlier, not a division error.
    *
    * Scale shape: two rank windows + two 1-row-per-key aggregates,
    * all sharing ONE key partitioning; the moment tables broadcast
    * back; the corpus never shuffles twice.
    */
  def madOutliers(df: DataFrame, keyCol: String, idCol: String,
                  valueCol: String, thresholdMicro: Long): DataFrame = {
    require(thresholdMicro > 0L,
      s"madOutliers: thresholdMicro must be positive, got $thresholdMicro")
    import org.apache.spark.sql.expressions.Window
    val v = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(idCol),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    val wk = Window.partitionBy(col(keyCol))
    val med = v
      .withColumn("__rn", row_number().over(
        wk.orderBy(col("v").asc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(wk))
      .filter(col("__rn") === expr("CAST((__n + 1) div 2 AS INT)"))
      .select(col(keyCol), col("v").as("med_v"))
    val dev = v.join(broadcast(med), Seq(keyCol))
      .withColumn("dev", abs(col("v") - col("med_v")))
    val mad = dev
      .withColumn("__rn", row_number().over(
        wk.orderBy(col("dev").asc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(wk))
      .filter(col("__rn") === expr("CAST((__n + 1) div 2 AS INT)"))
      .select(col(keyCol), col("dev").as("mad_v"))
    dev.join(broadcast(mad), Seq(keyCol))
      .withColumn("is_outlier",
        col("dev") * 1000000L > lit(thresholdMicro) * col("mad_v"))
      .select(col(keyCol), col(idCol), col("v"), col("med_v"),
        col("mad_v"), col("is_outlier"))
  }

  /** Two-sample Kolmogorov–Smirnov drift — the UNBINNED companion to
    * `histogramDrift`: where the histogram gate measures drift through
    * a chosen grid (and a sub-bin shift can hide inside a bin), KS is
    * the supremum gap between the two EMPIRICAL CDFs over every
    * distinct value, grid-free by construction. All exact integers:
    * values quantize to milli-units (the shared convention), per-value
    * class counts cumulate over the ascending distinct-value order,
    * and the gap is the CROSS-MULTIPLIED |cum_a·n_b − cum_b·n_a|
    * through DECIMAL(38,0) (cum·n passes int64 around 3B rows per
    * side) — no division until the final
    * ks_micro = max_gap · 1e6 div (n_a·n_b). One row out:
    * (n_a, n_b, ks_micro, at_v) where at_v is the LOWEST value
    * attaining the supremum (deterministic tie-break — "where does the
    * drift live" is the actionable half of the statistic). Identical
    * samples give 0; disjoint supports give exactly 1e6. An empty side
    * fails loud — a one-sided KS is undefined, never silently 0.
    *
    * Scale shape: one partial-aggregated per-value collapse (the
    * corpus's only shuffle), then the cumulative window on the
    * bounded distinct-value table — single partition BY CONTRACT, the
    * prCurve/benford spine class.
    */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def q(df: DataFrame, side: Int) = df.filter(col(valueCol).isNotNull)
      .select(expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"),
        lit(side).as("side"))
    val perValue = q(a, 0).unionByName(q(b, 1))
      .groupBy("v")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("c_b"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perValue
      .withColumn("cum_a", sum("c_a").over(w))
      .withColumn("cum_b", sum("c_b").over(w))
    val tot = cum.agg(max("cum_a"), max("cum_b")).head()
    val (na, nb) =
      (if (tot.isNullAt(0)) 0L else tot.getLong(0),
        if (tot.isNullAt(1)) 0L else tot.getLong(1))
    require(na > 0L && nb > 0L,
      s"ksTwoSample: both samples must be non-empty, got n_a=$na n_b=$nb")
    cum
      .withColumn("gap", expr(
        s"abs(CAST(cum_a AS DECIMAL(38,0)) * ${nb}L - " +
          s"CAST(cum_b AS DECIMAL(38,0)) * ${na}L)"))
      .orderBy(col("gap").desc, col("v").asc)
      .limit(1)
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        expr(s"CAST(gap * 1000000 div (CAST(${na} AS DECIMAL(38,0)) * ${nb}L) AS BIGINT)")
          .as("ks_micro"),
        col("v").as("at_v"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    * two categorical verdict columns: two quality detectors, two
    * annotation passes, a model vs its distilled student. Raw accuracy
    * rewards two detectors that both say "keep" 95% of the time for
    * agreeing by luck; kappa subtracts exactly that chance term.
    * Everything exact integers via the cross-multiplied identity
    * κ = (N·Σ_k n_kk − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k):
    * one row out with n, po_micro (observed agreement), pe_micro
    * (chance agreement) and kappa_micro, all floor-div micro-units
    * through DECIMAL(38,0) (N² passes int64 at ~3B rows). When both
    * raters are constant the denominator is 0 and kappa is NULL via
    * nullif — agreement indistinguishable from chance is undefined,
    * never a fake 1e6 (the aucRoc single-class convention). Rows with
    * a NULL on either side are excluded — an unrated item is not an
    * agreement. Works for any number of classes.
    *
    * Scale shape: one per-(a,b)-cell collapse (the corpus's only
    * shuffle, partial-aggregated map-side to |A|·|B| cells), then the
    * marginal algebra on the bounded cell table; one final 1-row
    * aggregate. No window, no join back to the corpus.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("ka"), col(bCol).as("kb"))
      .agg(count(lit(1)).as("c"))
    // Σ_k row_k·col_k over classes seen on EITHER side: full-outer
    // join of the two marginals on the class label, so a class one
    // rater never uses contributes 0 (coalesce), never a dropped term.
    val peNum = cells.groupBy("ka").agg(sum("c").as("r"))
      .join(cells.groupBy("kb").agg(sum("c").as("s")),
        col("ka") === col("kb"), "full")
      .agg(sum(expr(
        "CAST(coalesce(r, 0) AS DECIMAL(38,0)) * coalesce(s, 0)"))
        .as("__pe_num"))
    cells
      .agg(
        sum("c").as("n"),
        sum(when(col("ka") === col("kb"), col("c")).otherwise(0L)).as("__diag"))
      .crossJoin(broadcast(peNum))
      .withColumn("po_micro",
        expr("CAST(CAST(__diag AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
      .withColumn("pe_micro", expr(
        "CAST(__pe_num * 1000000 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .withColumn("kappa_micro", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * __diag - __pe_num) * 1000000
          | div nullif(CAST(n AS DECIMAL(38,0)) * n - __pe_num,
          |            CAST(0 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .select(col("n"), col("po_micro"), col("pe_micro"), col("kappa_micro"))
  }

  /** Spearman rank correlation — the MONOTONE-association companion to
    * Kendall's tau (`Timeline.pairwiseTrend`): Pearson over the rank
    * transforms, robust to any monotone rescaling of either column and
    * to heavy tails that wreck raw-value Pearson. Ties take AVERAGE
    * ranks, kept integer by the aucRoc DOUBLING trick (avg2 =
    * 2·cum − cnt + 1 over the per-value cumulative); every moment
    * (Σr, Σr², Σrxry) is an exact DECIMAL(38,0) integer (n·Σr² ≤ 4n⁴
    * passes 38 digits to ~1.3B rows), so num = n·Σxy − Σx·Σy and the
    * two variance terms d1/d2 are exact, and ONLY the final
    * rho_micro = floor(1e6·num / (√d1·√d2)) touches floats — a PINNED
    * IEEE order (two correctly-rounded sqrts of exact integers, one
    * divide) both engines replay bit-for-bit, the q_zscore float-tail
    * contract. The sqrt runs per-factor, never on d1·d2 (whose product
    * would overflow 38 digits at ~4M rows). A constant column has
    * d = 0 → NULL via CASE — correlation with a constant is undefined,
    * never a fake 0 (the aucRoc single-class convention). Values
    * quantize to milli-units (the shared convention) before ranking —
    * rank-equivalent for any sub-milli-preserving data.
    *
    * Scale shape: one per-value collapse per column (two
    * partial-aggregated shuffles), cumulative rank windows on the
    * bounded distinct-value tables — single partition BY CONTRACT,
    * the prCurve spine class — then two equi joins map ranks back to
    * the corpus (broadcast when the value tables are small) and one
    * 1-row moment aggregate.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(expr(s"CAST(floor($xCol * 1000) AS BIGINT)").as("x"),
        expr(s"CAST(floor($yCol * 1000) AS BIGINT)").as("y"))
    def rankMap(c: String) = {
      val w = Window.orderBy(col(c).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .withColumn("__cum", sum("__cnt").over(w))
        // doubled average rank: 2·min_rank + cnt − 1 = 2·cum − cnt + 1
        .select(col(c),
          (lit(2L) * col("__cum") - col("__cnt") + lit(1L)).as(s"r$c"))
    }
    base.join(rankMap("x"), Seq("x")).join(rankMap("y"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * ry")).as("__sxy"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * rx")).as("__sxx"),
        sum(expr("CAST(ry AS DECIMAL(38,0)) * ry")).as("__syy"),
        sum(expr("CAST(rx AS DECIMAL(38,0))")).as("__sx"),
        sum(expr("CAST(ry AS DECIMAL(38,0))")).as("__sy"))
      .withColumn("__num", expr("n * __sxy - __sx * __sy"))
      .withColumn("__d1", expr("n * __sxx - __sx * __sx"))
      .withColumn("__d2", expr("n * __syy - __sy * __sy"))
      .withColumn("rho_micro", expr(
        """CASE WHEN __d1 IS NULL OR __d1 = 0 OR __d2 = 0 THEN NULL
          |ELSE CAST(floor(1000000.0 * CAST(__num AS DOUBLE) /
          |  (sqrt(CAST(__d1 AS DOUBLE)) * sqrt(CAST(__d2 AS DOUBLE))))
          |  AS BIGINT) END""".stripMargin))
      .select(col("n"), col("rho_micro"))
  }

  /** Fleiss' kappa (Fleiss 1971) — the MULTI-rater generalization of
    * `cohenKappa`: chance-corrected agreement when EVERY item is rated
    * by the same number n of raters (an annotation pool, an ensemble
    * of quality detectors). From the item×category count table n_ik:
    * Po = Σ n_ik(n_ik−1) / (N·n·(n−1)) and Pe = Σ_k (c_k/(N·n))², and
    * after clearing denominators with T = N·n the whole statistic is
    * the exact integer identity
    * κ = (poNum·T − peNum·(n−1)) / ((n−1)·(T² − peNum)) — every term
    * DECIMAL(38,0) (T³ headroom passes int64-squared to ~1e12
    * ratings), po/pe/kappa floor-div micro-units. All raters constant
    * on one category → Pe = 1 → NULL via nullif (the cohenKappa
    * undefined convention). FAIL-LOUD contracts: a duplicate
    * (item, rater) rating is a caller bug (one vote per rater); an
    * UNEQUAL rater count per item breaks Fleiss' denominator — both
    * require() with the offending evidence, never a silently wrong κ.
    * NULL on any of (item, rater, category) is excluded first — an
    * unrated item-slot is not a rating.
    *
    * Scale shape: one (item, category) cell collapse (the corpus's
    * only data shuffle, map-side combined), marginals on the bounded
    * cell table, two 1-row probes for the equal-n/duplicate guards,
    * one final 1-row aggregate. No window, no join back.
    */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
                  categoryCol: String): DataFrame = {
    val base = df
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull &&
        col(categoryCol).isNotNull)
      .select(col(itemCol).as("__i"), col(raterCol).as("__r"),
        col(categoryCol).as("__k"))
    val dup = base.groupBy("__i", "__r").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1L).limit(1).collect()
    require(dup.isEmpty,
      s"fleissKappa: duplicate (item, rater) rating, e.g. ${dup.headOption}")
    val cells = base.groupBy("__i", "__k").agg(count(lit(1)).as("c"))
    val shape = cells.groupBy("__i").agg(sum("c").as("ni"))
      .agg(min("ni"), max("ni"), count(lit(1))).head()
    require(!shape.isNullAt(0),
      "fleissKappa: empty input — kappa over zero items is undefined")
    val (nMin, nMax, nItems) =
      (shape.getLong(0), shape.getLong(1), shape.getLong(2))
    require(nMin == nMax,
      s"fleissKappa: unequal raters per item ($nMin vs $nMax) — Fleiss requires a constant n")
    require(nMin >= 2L, s"fleissKappa: need >= 2 raters per item, got $nMin")
    val t = nItems * nMin
    cells
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("__po_num"))
      .crossJoin(broadcast(cells.groupBy("__k").agg(sum("c").as("ck"))
        .agg(sum(expr("CAST(ck AS DECIMAL(38,0)) * ck")).as("__pe_num"))))
      .select(lit(nItems).as("n_items"), lit(nMin).as("n_raters"),
        expr(s"CAST(__po_num * 1000000 div (CAST(${t}L AS DECIMAL(38,0)) * ${nMin - 1}L) AS BIGINT)")
          .as("po_micro"),
        expr(s"CAST(__pe_num * 1000000 div (CAST(${t}L AS DECIMAL(38,0)) * ${t}L) AS BIGINT)")
          .as("pe_micro"),
        expr(
          s"""CAST((__po_num * ${t}L - __pe_num * ${nMin - 1}L) * 1000000
             | div nullif(${nMin - 1}L *
             |   (CAST(${t}L AS DECIMAL(38,0)) * ${t}L - __pe_num),
             |   CAST(0 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
          .as("kappa_micro"))
  }

  /** Deterministic randomization (permutation) test for a two-group
    * mean difference — the SIGNIFICANCE companion to `bootstrapCi`'s
    * error bars: is the observed gap between group means larger than
    * chance relabeling produces? Each replica reassigns every row's
    * group by ONE MIDDLE BIT OF THE SQUARE of the affine (id, replica)
    * mix, forced into [2³⁰, 2³¹) first so the square always fills bits
    * 60..62 (von Neumann middle-square; measured: 0 skewed replicas in
    * 999, ~50% collision rate). The low bit of the affine mix itself
    * is NOT usable — with odd multipliers parity(h) = parity(id + r),
    * a deterministic stripe, and ANY single output bit of an affine
    * map is affine; squaring is the cheapest arithmetic non-linearity
    * both engines replay exactly in int64 (x² < 2⁶² by the range
    * forcing). Documented: hash-derived randomization, not
    * cryptographic randomness — a rerun reproduces the same p, the
    * dpCounts seeding philosophy; random RELABELING, the standard
    * large-N randomization test, not an exact fixed-margin permutation
    * — at any real N the two are indistinguishable and relabeling
    * needs no global shuffle of the label multiset. Group means are quantized to integer NANO-value
    * units (milli-quantized values, micro-scaled division) BEFORE the
    * comparison BY CONTRACT, so replica-vs-observed is an exact
    * integer comparison; p_micro = (1 + #{stat_r ≥ stat_obs})·1e6
    * div (R_valid + 1) — the add-one estimator, never a fake p = 0.
    * A replica that relabels one side empty has an undefined mean and
    * is EXCLUDED with its count reported, never a fabricated zero.
    * An observed-empty side fails loud — no one-group test.
    *
    * Scale shape: the replica explode is map-side (corpus × R rows
    * partial-aggregate to R rows before the shuffle); the verdict is
    * one aggregate over the R-row replica table joined to the 1-row
    * observed stats.
    */
  def permutationTest(df: DataFrame, idCol: String, groupCol: String,
                      valueCol: String, replicas: Int = 200): DataFrame = {
    require(replicas >= 20 && replicas <= 2000,
      s"permutationTest: replicas in [20, 2000], got $replicas")
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol).as("__id"), col(groupCol).cast("boolean").as("__g"),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    def sides(g: org.apache.spark.sql.Column) = Seq(
      sum(when(g, expr("CAST(v AS DECIMAL(38,0))")).otherwise(
        expr("CAST(0 AS DECIMAL(38,0))"))).as("sa"),
      sum(when(g, 1L).otherwise(0L)).as("na"),
      sum(when(!g, expr("CAST(v AS DECIMAL(38,0))")).otherwise(
        expr("CAST(0 AS DECIMAL(38,0))"))).as("sb"),
      sum(when(!g, 1L).otherwise(0L)).as("nb"))
    val statExpr =
      """abs(CAST(sa * 1000000 div nullif(CAST(na AS DECIMAL(38,0)),
        |            CAST(0 AS DECIMAL(38,0))) AS BIGINT) -
        |    CAST(sb * 1000000 div nullif(CAST(nb AS DECIMAL(38,0)),
        |            CAST(0 AS DECIMAL(38,0))) AS BIGINT))""".stripMargin
    val s = sides(col("__g"))
    val obs = base.agg(s.head, s.tail: _*)
      .withColumn("stat_nano", expr(statExpr))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("stat_nano"))
    val o = obs.head()
    require(o.getLong(0) > 0L && o.getLong(1) > 0L,
      s"permutationTest: both groups must be non-empty, got n_a=${o.getLong(0)} n_b=${o.getLong(1)}")
    val sr = sides((col("__h") % 2L) === 0L)
    val reps = base
      .select(col("__id"), col("v"),
        explode(expr(s"sequence(0, ${replicas - 1})")).as("r"))
      .withColumn("__x", expr(
        "pmod(__id * 2654435761L + r * 97530707L + 12345L, 2147483648L) div 2 + 1073741824L"))
      .withColumn("__h", expr("(__x * __x) div 2147483648L"))
      .groupBy("r").agg(sr.head, sr.tail: _*)
      .withColumn("rep_stat_nano",
        expr(s"CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE $statExpr END"))
    reps
      .agg(
        sum(when(col("rep_stat_nano").isNull, 1L).otherwise(0L))
          .as("n_empty_replicas"),
        sum(when(col("rep_stat_nano") >= o.getLong(2), 1L).otherwise(0L))
          .as("n_ge"),
        sum(when(col("rep_stat_nano").isNotNull, 1L).otherwise(0L))
          .as("n_valid"))
      .select(lit(o.getLong(0)).as("n_a"), lit(o.getLong(1)).as("n_b"),
        lit(o.getLong(2)).as("stat_nano"), col("n_valid"),
        col("n_empty_replicas"), col("n_ge"),
        expr("((n_ge + 1) * 1000000L) div (n_valid + 1)").as("p_micro"))
  }

  /** Keyed randomization test — `permutationTest` run independently
    * per key in ONE pass (the bootstrapCi shape: the replica explode
    * partial-aggregates corpus × R to keys × R before any shuffle);
    * the input table for multiple-testing control (`bhFdr`). Same
    * middle-square relabeling, same nano-unit exact comparison, same
    * add-one p. Per-key degeneracy is handled by EMISSION, not a
    * crash (the keyed twin cannot fail loud on one bad key and drop
    * the rest): a key whose OBSERVED groups are one-sided emits with
    * NULL stat/p; one-side-empty replicas are excluded per key with
    * their count reported.
    */
  def permutationTestByKey(df: DataFrame, keyCol: String, idCol: String,
                           groupCol: String, valueCol: String,
                           replicas: Int = 200): DataFrame = {
    require(replicas >= 20 && replicas <= 2000,
      s"permutationTestByKey: replicas in [20, 2000], got $replicas")
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(keyCol).as("__key"), col(idCol).as("__id"),
        col(groupCol).cast("boolean").as("__g"),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    def sides(g: org.apache.spark.sql.Column) = Seq(
      sum(when(g, expr("CAST(v AS DECIMAL(38,0))")).otherwise(
        expr("CAST(0 AS DECIMAL(38,0))"))).as("sa"),
      sum(when(g, 1L).otherwise(0L)).as("na"),
      sum(when(!g, expr("CAST(v AS DECIMAL(38,0))")).otherwise(
        expr("CAST(0 AS DECIMAL(38,0))"))).as("sb"),
      sum(when(!g, 1L).otherwise(0L)).as("nb"))
    val statExpr =
      """CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE
        |abs(CAST(sa * 1000000 div CAST(na AS DECIMAL(38,0)) AS BIGINT) -
        |    CAST(sb * 1000000 div CAST(nb AS DECIMAL(38,0)) AS BIGINT))
        |END""".stripMargin
    val s = sides(col("__g"))
    val obs = base.groupBy(col("__key")).agg(s.head, s.tail: _*)
      .select(col("__key"), col("na").as("n_a"), col("nb").as("n_b"),
        expr(statExpr).as("stat_nano"))
    // one replica table (keys × R after the map-side partial agg),
    // observed stats broadcast onto it so n_valid / n_empty / n_ge
    // come out of a single per-key aggregate
    val sr = sides((col("__h") % 2L) === 0L)
    val reps = base
      .select(col("__key"), col("__id"), col("v"),
        explode(expr(s"sequence(0, ${replicas - 1})")).as("r"))
      .withColumn("__x", expr(
        "pmod(__id * 2654435761L + r * 97530707L + 12345L, 2147483648L) div 2 + 1073741824L"))
      .withColumn("__h", expr("(__x * __x) div 2147483648L"))
      .groupBy(col("__key"), col("r")).agg(sr.head, sr.tail: _*)
      .withColumn("rep_stat_nano", expr(statExpr))
      .join(broadcast(obs.select(col("__key"), col("stat_nano"))),
        Seq("__key"))
      .groupBy(col("__key"))
      .agg(
        sum(when(col("rep_stat_nano").isNull, 1L).otherwise(0L))
          .as("n_empty_replicas"),
        sum(when(col("rep_stat_nano").isNotNull, 1L).otherwise(0L))
          .as("n_valid"),
        sum(when(col("rep_stat_nano") >= col("stat_nano"), 1L)
          .otherwise(0L)).as("n_ge"))
    obs
      .join(reps, Seq("__key"), "left")
      .select(col("__key").as(keyCol), col("n_a"), col("n_b"),
        col("stat_nano"), col("n_valid"), col("n_empty_replicas"),
        col("n_ge"),
        expr("""CASE WHEN stat_nano IS NULL THEN NULL
          |ELSE ((n_ge + 1) * 1000000L) div (n_valid + 1) END""".stripMargin)
          .as("p_micro"))
  }

  /** Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) — the
    * multiple-testing gate a battery of per-key tests needs: running
    * 30 per-source drift tests at α = 0.05 each expects 1.5 false
    * alarms; BH bounds the FALSE DISCOVERY RATE instead. Tests sort by
    * p ascending (tie-break by id — deterministic), the largest rank
    * k with p_(k)·m ≤ k·α survives (CROSS-MULTIPLIED exact integers —
    * no division enters the gate), and BH rejects EVERY test of rank
    * ≤ k — including ones whose own inequality fails, the step-up
    * subtlety naive per-row thresholding gets wrong (pinned by law).
    * Per test: rank, the BH critical value crit_micro = rank·α div m,
    * whether its own inequality holds, and the step-up verdict. NULL
    * p tests are EXCLUDED from m and emitted with NULL rank/verdict —
    * a test that produced no p-value cannot count against the budget.
    *
    * Scale shape: runs on the TESTS table (one row per hypothesis —
    * bounded by construction, the prCurve-spine class): one rank
    * window + one max window over m rows, single partition BY
    * CONTRACT.
    */
  def bhFdr(df: DataFrame, idCol: String, pCol: String,
            alphaMicro: Long = 50000L): DataFrame = {
    require(alphaMicro >= 1L && alphaMicro <= 1000000L,
      s"bhFdr: alphaMicro in [1, 1e6], got $alphaMicro")
    val w = Window.orderBy(col(pCol).asc, col(idCol).asc)
    val all = Window.partitionBy(lit(1))
    val ranked = df.filter(col(pCol).isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("passes_own",
        expr(s"$pCol * m <= rank * ${alphaMicro}L"))
      .withColumn("__kstar",
        max(when(col("passes_own"), col("rank")).otherwise(0L)).over(all))
      .select(col(idCol), col(pCol), col("rank"), col("m"),
        expr(s"(rank * ${alphaMicro}L) div m").as("crit_micro"),
        col("passes_own"), (col("rank") <= col("__kstar")).as("rejected"))
    val excluded = df.filter(col(pCol).isNull)
      .select(col(idCol), col(pCol), lit(null).cast("long").as("rank"),
        lit(null).cast("long").as("m"),
        lit(null).cast("long").as("crit_micro"),
        lit(null).cast("boolean").as("passes_own"),
        lit(null).cast("boolean").as("rejected"))
    ranked.unionByName(excluded)
  }

  /** r×c chi-square independence + Cramér's V — the general-table
    * association test next to the exact 2×2 `chi2`: are two
    * categorical columns (event type × weekday, source × language
    * verdict) independent? χ² = N·Σ n²ᵢₖ/(rᵢ·cₖ) − N; the per-cell
    * terms have DIFFERENT denominators, so unlike the 2×2 the exact
    * rational sum has no bounded common denominator — each cell's
    * term is floor-quantized to micro BEFORE the sum BY CONTRACT
    * (deterministic and addition-order-free where float accumulation
    * is not; underestimates by < #cells micro, and #cells is bounded
    * by the level product). Cramér's V² = χ²/(N·(min(r,c)−1)) in
    * micro — the [0,1e6]-normalized effect size χ²'s raw scale hides;
    * a single-level column has dof 0 → NULL via nullif (association
    * with a constant is undefined, the kappa convention). One row
    * out: (n, r_levels, c_levels, dof, chi2_micro, v2_micro).
    *
    * Scale shape: one (a,b) cell collapse (the corpus's only shuffle,
    * map-side combined to r·c cells), marginals on the bounded cell
    * table broadcast back, one 1-row aggregate.
    */
  def chi2Contingency(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("ka"), col(bCol).as("kb"))
      .agg(count(lit(1)).as("c"))
    val rowm = cells.groupBy("ka").agg(sum("c").as("r"))
    val colm = cells.groupBy("kb").agg(sum("c").as("s"))
    val tot = cells.agg(
      sum("c").as("n"),
      countDistinct("ka").as("r_levels"),
      countDistinct("kb").as("c_levels"))
    cells
      .join(broadcast(rowm), Seq("ka"))
      .join(broadcast(colm), Seq("kb"))
      .crossJoin(broadcast(tot))
      .withColumn("__term", expr(
        """CAST(CAST(c AS DECIMAL(38,0)) * c * n * 1000000
          | div (CAST(r AS DECIMAL(38,0)) * s) AS BIGINT)""".stripMargin))
      .agg(max("n").as("n"), max("r_levels").as("r_levels"),
        max("c_levels").as("c_levels"),
        (sum("__term") - max("n") * lit(1000000L)).as("chi2_micro"))
      .withColumn("dof",
        (col("r_levels") - 1L) * (col("c_levels") - 1L))
      .withColumn("v2_micro", expr(
        """chi2_micro div nullif(
          |  n * (least(r_levels, c_levels) - 1L), 0L)""".stripMargin))
      .select(col("n"), col("r_levels"), col("c_levels"), col("dof"),
        col("chi2_micro"), col("v2_micro"))
  }

  /** One-pass Pearson correlation matrix — the profiler's numeric
    * association sweep (which measures move together BEFORE any
    * modeling), completing the correlation family: Pearson here (raw
    * linear), Spearman (monotone, rank), Kendall (`pairwiseTrend`).
    * ONE aggregate computes every column's sum/sum-of-squares and
    * every pair's cross-moment over milli-quantized values — exact
    * DECIMAL(38,0) integers; rows with a NULL in ANY listed column
    * are dropped (LISTWISE deletion BY CONTRACT — pairwise-complete
    * matrices can be non-positive-definite and the n differs per
    * pair; listwise keeps one n and one contract); only each pair's
    * final r_micro touches floats — the pinned spearman two-sqrt IEEE
    * tail. Constant columns → NULL for their pairs. One row per
    * unordered pair (i < j in the given column order).
    *
    * Scale shape: one partial-aggregated 1-row moment pass (d² + d
    * sums for d columns — driver-bounded by the column list), then
    * the pair table is unpivoted from that single row with stack();
    * the corpus never shuffles.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"correlationMatrix: 2..16 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size,
      s"correlationMatrix: duplicate columns in $cols")
    val kept = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.zipWithIndex.map { case (c, i) =>
        expr(s"CAST(floor($c * 1000) AS BIGINT)").as(s"v$i")
      }: _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.indices.map(i =>
        sum(expr(s"CAST(v$i AS DECIMAL(38,0))")).as(s"s$i")) ++
      cols.indices.map(i =>
        sum(expr(s"CAST(v$i AS DECIMAL(38,0)) * v$i")).as(s"q$i")) ++
      pairs.map { case (i, j) =>
        sum(expr(s"CAST(v$i AS DECIMAL(38,0)) * v$j")).as(s"x${i}_$j") }
    val m = kept.agg(aggs.head, aggs.tail: _*)
    val rExprs = pairs.map { case (i, j) =>
      s"""'${cols(i)}', '${cols(j)}',
         |CASE WHEN x${i}_$j IS NULL
         |  OR n * q$i - s$i * s$i = 0 OR n * q$j - s$j * s$j = 0 THEN NULL
         |ELSE CAST(floor(1000000.0 *
         |  CAST(n * x${i}_$j - s$i * s$j AS DOUBLE) /
         |  (sqrt(CAST(n * q$i - s$i * s$i AS DOUBLE)) *
         |   sqrt(CAST(n * q$j - s$j * s$j AS DOUBLE)))) AS BIGINT) END"""
        .stripMargin
    }.mkString(", ")
    m.select(col("n"), expr(
      s"stack(${pairs.size}, $rExprs) AS (col_a, col_b, r_micro)"))
      .select(col("col_a"), col("col_b"), col("n"), col("r_micro"))
  }

  /** Winsorize — the TRANSFORM member of the robust family (madOutliers
    * FLAGS, trimmedMean AGGREGATES, winsorize REWRITES): per key, clamp
    * every value into the exact [pctLo, pctHi] percentile fences —
    * LOWER order statistics at ranks max(1, ⌈n·pct/100⌉) under the
    * pinned (value, id) order, the madOutliers rank discipline — and
    * emit every row with both raw and clamped value (milli-quantized,
    * the shared convention). The tail treatment a robust-mean pipeline
    * wants when rows cannot be DROPPED (budget accounting, conserved
    * token counts): mass is preserved, only the extremes move to the
    * fences.
    *
    * Scale shape: one rank window + one count window sharing the
    * per-key Exchange, a 1-row-per-key fence aggregate broadcast back
    * onto the rows; output is corpus-sized BY DESIGN (it is a
    * transform).
    */
  def winsorize(df: DataFrame, keyCol: String, idCol: String,
                valueCol: String, pctLo: Int = 5, pctHi: Int = 95): DataFrame = {
    require(pctLo >= 1 && pctHi <= 99 && pctLo < pctHi,
      s"winsorize: need 1 <= pctLo < pctHi <= 99, got ($pctLo, $pctHi)")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(idCol),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    val byKey = Window.partitionBy(col(keyCol))
    val ranked = base
      .withColumn("__rk", row_number().over(
        byKey.orderBy(col("v").asc, col(idCol).asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
    val fences = ranked
      .withColumn("__lo_rk",
        expr(s"greatest(1L, (__n * ${pctLo}L + 99L) div 100L)"))
      .withColumn("__hi_rk", expr(s"(__n * ${pctHi}L + 99L) div 100L"))
      .groupBy(col(keyCol))
      .agg(min(when(col("__rk") === col("__lo_rk"), col("v"))).as("lo_v"),
        min(when(col("__rk") === col("__hi_rk"), col("v"))).as("hi_v"))
    base
      .join(broadcast(fences), Seq(keyCol))
      .select(col(keyCol), col(idCol), col("v"),
        least(greatest(col("v"), col("lo_v")), col("hi_v"))
          .as("v_winsor"), col("lo_v"), col("hi_v"))
  }

  /** Trimmed mean — the third robust-location tool next to the median
    * (`madOutliers`) and the plain mean: per key, drop the k =
    * ⌊n·trimPct/100⌋ smallest and k largest values by rank and average
    * the rest, reported next to the RAW mean so the gap itself is the
    * outlier signal (a large raw-vs-trimmed gap = tail mass). Exact
    * integers: milli-quantized values, DECIMAL sums, micro floor-div
    * means. Rank ties need no tie-break BY ARGUMENT: which of several
    * EQUAL values gets trimmed cannot change the kept-set SUM — the
    * output is deterministic even though row_number on ties is not.
    * A fully-trimmed key (2k ≥ n can't happen at trimPct ≤ 25 and
    * n ≥ 1, pinned by the require) would emit NULL via nullif, never
    * a division error.
    *
    * Scale shape: one rank window + one count window sharing the
    * per-key partition (one Exchange), one per-key aggregate.
    */
  def trimmedMean(df: DataFrame, keyCol: String, valueCol: String,
                  trimPct: Int = 10): DataFrame = {
    require(trimPct >= 1 && trimPct <= 25,
      s"trimmedMean: trimPct in [1, 25], got $trimPct")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
        expr(s"CAST(floor($valueCol * 1000) AS BIGINT)").as("v"))
    val byKey = Window.partitionBy(col(keyCol))
    base
      .withColumn("__rk", row_number().over(byKey.orderBy(col("v").asc))
        .cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__k", expr(s"(__n * ${trimPct}L) div 100L"))
      .groupBy(col(keyCol))
      .agg(
        max("__n").as("n"), max("__k").as("k_trimmed"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0))) * 1000 div count(1) AS BIGINT)")
          .as("mean_micro"),
        expr(
          """CAST(sum(CASE WHEN __rk > __k AND __rk <= __n - __k
            |  THEN CAST(v AS DECIMAL(38,0))
            |  ELSE CAST(0 AS DECIMAL(38,0)) END) * 1000
            | div nullif(sum(CASE WHEN __rk > __k AND __rk <= __n - __k
            |  THEN 1L ELSE 0L END), 0L) AS BIGINT)""".stripMargin)
          .as("trimmed_mean_micro"))
  }
}
