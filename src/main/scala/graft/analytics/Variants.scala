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

  /** k-anonymity report for event-log publication (the suppression
    * half of the PRETSA/log-sanitization literature): a published
    * trace whose variant is shared by fewer than k cases re-identifies
    * its subject, so sub-k variants must be suppressed. Per variant:
    * case support, the keep verdict, and the GLOBAL suppressed-case
    * share in exact micro-units stamped on every row (the
    * snapshotDrift convention — the publication decision needs the
    * damage number next to each verdict).
    *
    * Scale shape: the `perCase` collapse (one case-keyed shuffle),
    * one partial-aggregated variant count, then window arithmetic on
    * the |variants|-bounded table.
    */
  def kAnonymityReport(df: DataFrame, caseCol: String, activityCol: String,
                       tsCol: String, tieCol: String, k: Long): DataFrame = {
    require(k >= 2, s"kAnonymityReport: k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(0))
    counts(df, caseCol, activityCol, tsCol, tieCol)
      .withColumn("kept", col("n_cases") >= k)
      .withColumn("__tot", sum(col("n_cases")).over(w))
      .withColumn("__sup", sum(when(col("kept"), 0L)
        .otherwise(col("n_cases"))).over(w))
      .withColumn("suppressed_share_micro",
        expr("(__sup * 1000000L) div __tot"))
      .select(col("variant"), col("n_cases"), col("kept"),
        col("suppressed_share_micro"))
  }

  /** The publication op itself: the event rows of cases whose variant
    * passes `kAnonymityReport`'s floor — sub-k cases drop WHOLE (a
    * partially-suppressed trace is still a fingerprint). One extra
    * case-keyed semi-join against the kept case list; the spec pins
    * that every surviving variant has ≥ k cases and survivors are
    * byte-identical to their input rows.
    */
  def anonymizeLog(df: DataFrame, caseCol: String, activityCol: String,
                   tsCol: String, tieCol: String, k: Long): DataFrame = {
    require(k >= 2, s"anonymizeLog: k must be >= 2, got $k")
    val keptCases = perCase(df, caseCol, activityCol, tsCol, tieCol)
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("variant"))))
      .filter(col("__n") >= k)
      .select(col(caseCol))
    df.join(keptCases, Seq(caseCol), "left_semi")
  }

  /** Sequential pattern support — contiguous activity k-grams (k in
    * 2..maxK) with CASE support (distinct cases containing the
    * pattern at least once): the frequent-subsequence view sitting
    * between the DFG (k=2 occurrence counts) and full variants (whole
    * traces). Support counts CASES, not occurrences, so a loop that
    * repeats a pattern a hundred times in one case still counts once —
    * the standard sequential-pattern-mining semantics.
    *
    * Scale shape: the k-gram levels are built from ONE lead-chain pass
    * (all `lead` offsets share the same window partition+order, so one
    * Exchange + one sort), packed into a per-row array and exploded
    * once — never one window pass per k. Then a (case, k, gram)
    * DISTINCT (the case-support collapse) and a partial-aggregated
    * count; output is bounded by the distinct-gram space, never corpus
    * size.
    */
  def seqPatterns(df: DataFrame, caseCol: String, activityCol: String,
                  tsCol: String, tieCol: String, maxK: Int = 3,
                  minSupport: Long = 1L, sep: String = "->"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxK >= 2, "seqPatterns: maxK must be >= 2")
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val withLeads = (1 until maxK).foldLeft(df) { (d, i) =>
      d.withColumn(s"__a$i", lead(col(activityCol), i).over(w))
    }
    val levels = (2 to maxK).map { k =>
      val parts = col(activityCol) +: (1 until k).map(i => col(s"__a$i"))
      when(col(s"__a${k - 1}").isNotNull,
        struct(lit(k).as("k"), concat_ws(sep, parts: _*).as("pattern")))
    }
    withLeads
      .select(col(caseCol), explode(array(levels: _*)).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col(caseCol), col("__g.k").as("k"), col("__g.pattern").as("pattern"))
      .distinct()
      .groupBy(col("k"), col("pattern"))
      .agg(count(lit(1)).as("n_cases"))
      .filter(col("n_cases") >= minSupport)
  }

  /** Variant performance table — the throughput-time KPI view process
    * analysts read next to the variant counts: per distinct activity
    * sequence, case count and duration min / median / p90 / max in
    * whole seconds. The "median" and "p90" are LOWER ORDER STATISTICS
    * (rank ceil(n/2) and ceil(9n/10) under a deterministic
    * (duration, case-id) order) — exact, engine-replayable integers,
    * never an interpolated double (interpolation halving is where
    * cross-engine float drift creeps in).
    *
    * Scale shape: the per-case collapse is `perCase`'s single
    * case-keyed aggregate with the duration folded into the same
    * buffer; the rank window and the final aggregate both partition
    * on the variant, so Catalyst reuses one variant Exchange over the
    * CASE-COUNT-sized table. Nothing corpus-sized shuffles twice.
    */
  def performance(df: DataFrame, caseCol: String, activityCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cases = df.groupBy(col(caseCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(tsCol), col(tieCol), col(activityCol)))),
            e => e(activityCol)),
          "->").as("variant"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long"))
          .as("duration_sec"))
    val w = Window.partitionBy(col("variant"))
      .orderBy(col("duration_sec").asc, col(caseCol).asc)
    cases
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("variant"))))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_cases"),
        min(col("duration_sec")).as("dur_min"),
        max(when(col("__rk") === expr("(__n + 1) div 2"),
          col("duration_sec"))).as("dur_median"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"),
          col("duration_sec"))).as("dur_p90"),
        max(col("duration_sec")).as("dur_max"))
  }
}
