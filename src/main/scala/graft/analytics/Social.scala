package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Organizational mining over an event log — the resource-level views
  * process-mining suites derive next to the control-flow DFG (van der
  * Aalst's "social network miner"; the reference's EVENTLOG rows carry
  * the acting agent in REMARKS, cf. `event_reader.py:119-126`'s
  * flattened columns). Where `Dfg` asks "which ACTIVITY follows
  * which", these ask "which RESOURCE hands work to which".
  */
object Social {

  /** Loud upper bound on the dense role-matrix's distinct-resource
    * cardinality: 10⁴ resources ⇒ ≤ 5·10⁷ unordered pairs, the
    * largest dense similarity matrix org-mining clustering plausibly
    * consumes. Beyond it `roleSimilarity` fails loud by contract.
    */
  val MaxRoleResources = 10000L

  /** Handover-of-work network: for each ordered resource pair
    * (res_from, res_to), how often a res_to event directly follows a
    * res_from event within the same case, plus the distinct-case
    * support. Self-loops (res_from == res_to) are kept — they are the
    * "work stays put" mass, and dropping them would make the row sums
    * stop reconciling against the DFG transition count.
    *
    * Scale shape: ONE case-key Exchange for the lag window (the same
    * sort `Dfg.edges` pays — a caller computing both should derive
    * them from one sorted pass); the mixed distinct aggregate then
    * collapses via (pair, case) partial aggregation before the final
    * |resources|²-bounded pair table. No joins, no explode.
    */
  def handover(df: DataFrame, caseCol: String, resourceCol: String,
               tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(resourceCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("res_from"), col(resourceCol).as("res_to"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col(caseCol)).as("n_cases"))
  }

  /** Organizational role discovery input — the resource-similarity
    * matrix of the "roles from activity profiles" literature (Song &
    * van der Aalst's organizational mining): each resource's profile
    * is its integer activity-count vector; for every unordered
    * resource pair the profile cosine in floored micro-units (exact
    * BIGINT dot/norms — counts, not floats — with the one-division-
    * two-sqrts tail the drift monitor uses) plus a `same_role` verdict
    * at `threshMicro`. EVERY unordered pair of observed resources
    * appears — a pair with no shared activity surfaces with cosine
    * 0, never vanishes (the matrix is the clustering input; a
    * missing cell would read as "unknown", not "orthogonal").
    *
    * Scale shape: the corpus collapses to the |resources|×|activities|
    * profile table in ONE partial-aggregated shuffle; the pair
    * enumeration (a |resources|² cross of the DISTINCT resource list
    * BY CONTRACT — a collapsed-table surface, never a corpus one),
    * the shared-activity dot aggregate and the verdict all run on
    * bounded tables. The all-pairs contract is what makes the
    * |resources|² surface irreducible, so it is guarded LOUD (the
    * `kaplanMeier`/`isotonicFit` bounded-surface convention): more
    * than `MaxRoleResources` distinct resources fails with an
    * explicit error instead of materializing a quadratic blow-up —
    * an org-mining role matrix past ~10⁸ cells is a caller error,
    * not a workload. A corpus that genuinely needs pair output at
    * that cardinality should consume the sparse `dots` join (only
    * activity-sharing pairs, absent pair ⇒ cos 0) instead of the
    * dense matrix. The small side of the guarded cross is broadcast,
    * so the enumeration is a map-side nested loop, never a shuffle.
    */
  def roleSimilarity(df: DataFrame, resourceCol: String,
                     activityCol: String, threshMicro: Long): DataFrame = {
    // localCheckpoint (eager) the collapsed profile: the guard's
    // count() is an action, and prof feeds FOUR consumers (res, dots'
    // two sides, both norm aggregates) — materialized once, the
    // corpus is scanned once and the guard is nearly free. Unlike
    // persist(), the checkpointed blocks are released by the context
    // cleaner when this plan is GC'd, so repeated invocations (the
    // bench's min-of-passes loop) don't accumulate live cache entries
    // with no unpersist hook on the returned lazy plan. The
    // lineage-truncation tradeoff is acceptable here BECAUSE the
    // table is bounded by the very contract being enforced
    // (|resources|×|activities| with |resources| ≤ 10⁴). Caveat for
    // long-lived returned plans on clusters with dynamic allocation:
    // localCheckpoint blocks live on executors and are NOT
    // recomputable after an executor loss (persist() would recover
    // via lineage) — a caller keeping this plan across executor
    // churn should consume it promptly or re-invoke on failure.
    val prof = df.groupBy(col(resourceCol).as("__r"),
        col(activityCol).as("__a"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val res = prof.select(col("__r")).distinct()
    val nRes = res.count()
    require(nRes <= MaxRoleResources,
      s"roleSimilarity: $nRes distinct resources exceed the dense " +
        s"all-pairs role-matrix contract ($MaxRoleResources) — " +
        "call roleSimilaritySparse instead: it emits only the " +
        "activity-sharing pairs (absent pair = cosine 0 by contract)")
    val dots = prof.select(col("__r").as("res_a"), col("__a"),
        col("__c").as("__ca"))
      .join(prof.select(col("__r").as("res_b"), col("__a"),
        col("__c").as("__cb")), Seq("__a"))
      .filter(col("res_a") < col("res_b"))
      .groupBy(col("res_a"), col("res_b"))
      .agg(sum(col("__ca") * col("__cb")).as("__dot"))
    res.select(col("__r").as("res_a"))
      .crossJoin(broadcast(res.select(col("__r").as("res_b"))))
      .filter(col("res_a") < col("res_b"))
      .join(dots, Seq("res_a", "res_b"), "left")
      .join(prof.groupBy(col("__r").as("res_a"))
        .agg(sum(col("__c") * col("__c")).as("__na")), Seq("res_a"))
      .join(prof.groupBy(col("__r").as("res_b"))
        .agg(sum(col("__c") * col("__c")).as("__nb")), Seq("res_b"))
      .withColumn("cos_micro",
        floor(coalesce(col("__dot"), lit(0L)).cast("double") /
          (sqrt(col("__na").cast("double")) *
            sqrt(col("__nb").cast("double"))) * lit(1000000.0))
          .cast("long"))
      .withColumn("same_role", col("cos_micro") >= threshMicro)
      .select(col("res_a"), col("res_b"), col("cos_micro"), col("same_role"))
  }

  /** Sparse arm of the role-similarity matrix — the operator the
    * dense guard's error message points a >`MaxRoleResources` caller
    * at. Emits ONLY the unordered resource pairs that share at least
    * one activity; an absent pair is cosine 0 BY CONTRACT (the caller
    * treats a missing cell as orthogonal, which is exactly what the
    * dense matrix would have said). Same exact arithmetic as the
    * dense matrix — integer BIGINT dot/norms from the activity-count
    * profiles, one floored micro-unit division at the end — so on
    * every emitted pair the two operators agree cell-for-cell (law:
    * `TimelineSpec` "dense and sparse agree on every emitted pair").
    *
    * Scale shape: NO cardinality cap and NO quadratic surface — the
    * pair enumeration is an inverted-index self-equi-join on the
    * activity key (pairs are generated per shared activity, the
    * classic sparse dot-product join), so the output is bounded by
    * Σ_a |resources(a)|², the activity-sharing mass, not
    * |resources|². The profile aggregate feeds three consumers but
    * is ONE shuffle: all three plans build on the identical groupBy
    * Exchange, which Spark's exchange reuse dedups at runtime — no
    * persist, no guard action, fully lazy.
    */
  def roleSimilaritySparse(df: DataFrame, resourceCol: String,
                           activityCol: String,
                           threshMicro: Long): DataFrame = {
    val prof = df.groupBy(col(resourceCol).as("__r"),
        col(activityCol).as("__a"))
      .agg(count(lit(1)).as("__c"))
    val norms = prof.groupBy(col("__r"))
      .agg(sum(col("__c") * col("__c")).as("__nsq"))
    prof.select(col("__r").as("res_a"), col("__a"), col("__c").as("__ca"))
      .join(prof.select(col("__r").as("res_b"), col("__a"),
        col("__c").as("__cb")), Seq("__a"))
      .filter(col("res_a") < col("res_b"))
      .groupBy(col("res_a"), col("res_b"))
      .agg(sum(col("__ca") * col("__cb")).as("__dot"))
      .join(norms.select(col("__r").as("res_a"), col("__nsq").as("__na")),
        Seq("res_a"))
      .join(norms.select(col("__r").as("res_b"), col("__nsq").as("__nb")),
        Seq("res_b"))
      .withColumn("cos_micro",
        floor(col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) *
            sqrt(col("__nb").cast("double"))) * lit(1000000.0))
          .cast("long"))
      .withColumn("same_role", col("cos_micro") >= threshMicro)
      .select(col("res_a"), col("res_b"), col("cos_micro"), col("same_role"))
  }

  /** Batch-work detection (Martin et al.'s batch-processing
    * identification): runs where ONE resource performs the SAME
    * activity across cases with at most `gapSec` between consecutive
    * executions — the "clerk stamps forty forms in a row" pattern that
    * distorts per-case waiting-time statistics if not recognized.
    * Unlike `Timeline.episodes` (within one case) this compacts
    * ACROSS cases: the partition key is (resource, activity) and the
    * batch id is the classic gap-sessionize running boundary sum.
    * Only runs of ≥ `minSize` executions are batches; the
    * distinct-case count distinguishes true cross-case batching from
    * one case looping.
    *
    * Scale shape: ONE Exchange on the (resource, activity) key shared
    * by the lag window, the boundary running sum and the
    * partial-aggregated batch collapse.
    */
  def batchWork(df: DataFrame, caseCol: String, resourceCol: String,
                activityCol: String, tsCol: String, tieCol: String,
                gapSec: Long, minSize: Long): DataFrame = {
    require(gapSec > 0 && minSize >= 2,
      s"batchWork: gapSec > 0 and minSize >= 2, got ($gapSec, $minSize)")
    val w = Window.partitionBy(col(resourceCol), col(activityCol))
      .orderBy(col(tsCol), col(tieCol))
    val boundary = when(lag(col(tsCol), 1).over(w).isNull ||
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
        > gapSec, 1L).otherwise(0L)
    df.withColumn("__b", sum(boundary)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(resourceCol), col(activityCol), col("__b").as("batch"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"),
        countDistinct(col(caseCol)).as("n_cases"))
      .filter(col("n_events") >= minSize)
  }
}
