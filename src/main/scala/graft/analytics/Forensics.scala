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
}
