package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Directly-follows graph (SURVEY.md O-26): for consecutive events within
  * each case, count (activity, next_activity) pairs. This is the kernel
  * under inductive process discovery (reference example.ipynb cell 3).
  *
  * Plan shape: one shuffle on the case key for the window, then a partial
  * (map-side) + final aggregation on the edge pair. Edges are bounded by
  * |activities|², so the second aggregation's reduce side is tiny at any
  * data scale — the window shuffle dominates and is unavoidable for
  * per-case ordering.
  */
object Dfg {

  /** (activity, next_activity, n) edge counts. Ordering inside a case is
    * (tsCol, tieCol) — the tie column keeps results engine-deterministic.
    */
  def edges(df: DataFrame, caseCol: String, activityCol: String,
            tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("next_activity", lead(col(activityCol), 1).over(w))
      .filter(col("next_activity").isNotNull)
      .groupBy(col(activityCol).as("activity"), col("next_activity"))
      .agg(count(lit(1)).as("n"))
  }

  /** Start/end activity frequencies — the other inputs process discovery
    * needs besides the edge counts.
    *
    * Single sort: one ascending `row_number` plus an unordered per-case
    * `count` over the same partitioning (the count window needs no sort,
    * and Catalyst reuses the one Exchange). A descending second
    * `row_number` would cost a second full sort of every partition.
    * A one-event case is both first and last; it is labeled 'start',
    * matching the reference-shaped oracle's CASE WHEN rn = 1 branch.
    */
  def startEndCounts(df: DataFrame, caseCol: String, activityCol: String,
                     tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col(caseCol))))
      .filter(col("rn") === 1 || col("rn") === col("cnt"))
      .select(
        col(activityCol).as("activity"),
        when(col("rn") === 1, lit("start")).otherwise(lit("end")).as("position"))
      .groupBy("activity", "position")
      .agg(count(lit(1)).as("n"))
  }

  /** Frequency-simplified DFG — the pm4py/Disco "simplification
    * slider": rank edges by frequency and keep the head that covers
    * `keepShareMicro` of the total transition mass (an edge is kept
    * while the cumulative mass BEFORE it is still under the target, so
    * the heaviest edge always survives and coverage overshoots by at
    * most one edge — deterministic, (n desc, edge) tie-break). Every
    * edge is emitted with its cumulative micro share and verdict —
    * the slider needs the whole curve, not just the survivors.
    *
    * Scale shape: `edges`' one case-keyed window, then rank/cumsum
    * windows on the |activities|²-bounded edge table (single
    * partition BY CONTRACT — the collapsed-table convention).
    */
  def simplified(df: DataFrame, caseCol: String, activityCol: String,
                 tsCol: String, tieCol: String,
                 keepShareMicro: Long): DataFrame = {
    require(keepShareMicro > 0L && keepShareMicro <= 1000000L,
      s"simplified: keepShareMicro in (0, 1e6], got $keepShareMicro")
    val w = Window.partitionBy(lit(0))
    val wo = w.orderBy(col("n").desc, col("activity"), col("next_activity"))
    edges(df, caseCol, activityCol, tsCol, tieCol)
      .withColumn("__tot", sum(col("n")).over(w))
      .withColumn("__before", coalesce(sum(col("n")).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cum_micro",
        expr("((__before + n) * 1000000L) div __tot"))
      .withColumn("kept",
        expr(s"(__before * 1000000L) div __tot") < keepShareMicro)
      .select(col("activity"), col("next_activity"), col("n"),
        col("cum_micro"), col("kept"))
  }

  /** Performance-annotated DFG — the waiting-time view process-mining
    * tools draw on the discovery graph's edges (pm4py's "performance
    * DFG"): per directly-follows pair, transition count and the gap
    * seconds min / median / p90 / max. Like `Variants.performance`,
    * the mid statistics are exact LOWER ORDER STATISTICS (ranks
    * ceil(n/2), ceil(9n/10)) under the deterministic (gap, event-id)
    * order — integers an oracle replays, never interpolated doubles.
    *
    * Scale shape: the case window is the same one `edges` pays; the
    * rank window and final aggregate both partition on the edge pair,
    * sharing one Exchange over the PAIR-count-sized table (bounded by
    * corpus transitions, collapsing to |activities|² output rows).
    */
  def performanceEdges(df: DataFrame, caseCol: String, activityCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("next_activity", lead(col(activityCol), 1).over(w))
      .withColumn("__gap",
        lead(col(tsCol), 1).over(w).cast("long") - col(tsCol).cast("long"))
      .filter(col("next_activity").isNotNull)
      .select(col(activityCol).as("activity"), col("next_activity"),
        col("__gap"), col(tieCol))
    val ew = Window.partitionBy(col("activity"), col("next_activity"))
    pairs
      .withColumn("__rk", row_number().over(
        ew.orderBy(col("__gap").asc, col(tieCol).asc)))
      .withColumn("__n", count(lit(1)).over(ew))
      .groupBy(col("activity"), col("next_activity"))
      .agg(count(lit(1)).as("n"),
        min(col("__gap")).as("gap_min"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("__gap")))
          .as("gap_median"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"), col("__gap")))
          .as("gap_p90"),
        max(col("__gap")).as("gap_max"))
  }

  /** First-order Markov transition model over cases — the DFG with
    * `__START__`/`__END__` pseudo-states and exact integer transition
    * probabilities: the generative baseline a next-event predictor is
    * measured against, and the row-normalized matrix simulation /
    * log-replay tooling consumes. Every event emits its outgoing
    * transition (to `__END__` for the case's last event) and first
    * events additionally emit the `__START__` entry — so per state,
    * outgoing counts sum to that state's visit count and the
    * micro-unit probabilities row-normalize by construction (floored
    * integer division; the ≤ state-degree shortfall is the documented
    * rounding, never a hidden renormalization).
    *
    * Same scale shape as `edges`: one case-keyed window shuffle, the
    * transition explode is row-local (≤ 2 rows per event), and the
    * probability window runs over the collapsed |states|²-bounded
    * count table.
    */
  def transitionMatrix(df: DataFrame, caseCol: String, activityCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val pw = Window.partitionBy(col("state"))
    df.withColumn("__next", lead(col(activityCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .select(explode(when(col("__rn") === 1,
          array(
            struct(lit("__START__").as("state"), col(activityCol).as("next_state")),
            struct(col(activityCol).as("state"),
              coalesce(col("__next"), lit("__END__")).as("next_state"))))
        .otherwise(array(
          struct(col(activityCol).as("state"),
            coalesce(col("__next"), lit("__END__")).as("next_state"))))).as("t"))
      .select(col("t.state"), col("t.next_state"))
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__sum", sum(col("n")).over(pw))
      .withColumn("p_micro", expr("(n * 1000000L) div __sum"))
      .select(col("state"), col("next_state"), col("n"), col("p_micro"))
  }

  /** Order-n Markov transitions — `transitionMatrix` generalized to
    * n-gram states (the higher-order process model / n-gram LM over
    * activities): the state for each event is its previous `order`
    * activities, positions before the trace start padded with
    * `__START__`, joined with `|`; each case additionally emits its
    * terminal (last `order` activities) → `__END__` transition.
    * Probabilities are the same floored integer micro-units.
    *
    * Same scale shape as the first-order matrix: the lags ride the
    * one case window (Catalyst computes all `order` lags in one
    * WindowExec), the transition rows are row-local, and the count /
    * probability tail runs on the |states|·|activities|-bounded
    * collapsed table — the state-space growth is the CALLER'S model
    * choice, not a shuffle problem.
    */
  def ngramTransitions(df: DataFrame, caseCol: String, activityCol: String,
                       tsCol: String, tieCol: String, order: Int): DataFrame = {
    require(order >= 1 && order <= 4, "ngramTransitions: order must be 1..4")
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val pw = Window.partitionBy(col("state"))
    val lags = (order to 1 by -1).map(j =>
      coalesce(lag(col(activityCol), j).over(w), lit("__START__")))
    // terminal state drops the oldest lag and appends the last activity
    val endLags = (order - 1 to 1 by -1).map(j =>
      coalesce(lag(col(activityCol), j).over(w), lit("__START__"))) :+
      col(activityCol)
    val base = df
      .withColumn("state", concat_ws("|", lags: _*))
      .withColumn("__endstate", concat_ws("|", endLags: _*))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(caseCol))))
    base.select(col("state"), col(activityCol).as("next_state"))
      .unionByName(base.filter(col("__rn") === col("__cnt"))
        .select(col("__endstate").as("state"), lit("__END__").as("next_state")))
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__sum", sum(col("n")).over(pw))
      .withColumn("p_micro", expr("(n * 1000000L) div __sum"))
      .select(col("state"), col("next_state"), col("n"), col("p_micro"))
  }

  /** Footprint conformance — the checking half of process mining: per
    * case, how much of its directly-follows behavior a MODEL (a table
    * of allowed `(activity, next_activity)` pairs, e.g. the frequent
    * edges of a reference log) actually covers. Output per case:
    * observed pair count, violations, and fitness in exact integer
    * micro-units. A one-event case has no pairs and is VACUOUSLY
    * conformant (fitness 1e6, n_pairs 0 — visible, documented, never
    * a division error).
    *
    * Scale shape: the model is |activities|²-bounded and rides a
    * broadcast; the log pays the same case-keyed window shuffle as
    * `edges` plus a per-case partial aggregate. No pairwise surface.
    */
  def footprintConformance(df: DataFrame, caseCol: String,
                           activityCol: String, tsCol: String,
                           tieCol: String, modelEdges: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val model = modelEdges
      .select(col("activity"), col("next_activity"), lit(1).as("__ok"))
      .distinct()
    df.withColumn("next_activity", lead(col(activityCol), 1).over(w))
      .select(col(caseCol), col(activityCol).as("activity"), col("next_activity"))
      .join(broadcast(model), Seq("activity", "next_activity"), "left")
      .groupBy(col(caseCol))
      .agg(count(col("next_activity")).as("n_pairs"),
        sum(when(col("next_activity").isNotNull && col("__ok").isNull, 1L)
          .otherwise(0L)).as("n_violations"))
      .withColumn("fitness_micro",
        when(col("n_pairs") === 0L, lit(1000000L))
          .otherwise(expr("((n_pairs - n_violations) * 1000000L) div n_pairs")))
  }

  /** Alpha-miner footprint relations over the DFG edges: for every
    * ordered activity pair with a directly-follows edge, `parallel`
    * when the reverse edge also exists, else `causal`. (The `choice`
    * cells of the full footprint matrix are the absent pairs — an
    * |activities|² blowup nobody materializes at scale.)
    *
    * One extra broadcast self-join over the edge table, which is
    * bounded by |activities|² — negligible next to the window shuffle
    * that produced it.
    */
  def footprint(edgesDf: DataFrame): DataFrame = {
    val fwd = edgesDf.select(col("activity"), col("next_activity"), col("n"))
    val rev = edgesDf.select(
      col("next_activity").as("activity"),
      col("activity").as("next_activity"),
      lit(1).as("has_rev"))
    fwd.join(broadcast(rev), Seq("activity", "next_activity"), "left")
      .select(col("activity"), col("next_activity"),
        when(col("has_rev").isNotNull, "parallel").otherwise("causal").as("relation"),
        col("n"))
  }

  /** Next-event prediction backtest — the EVALUATION closing the
    * generative loop that `transitionMatrix` opens: train the
    * first-order model on one log slice, predict the successor of
    * every test transition as the argmax outgoing edge of its source
    * type, and report exact per-state hit rates — the yardstick any
    * learned sequence model has to beat before it ships.
    *
    * Determinism discipline: argmax ties break lexicographically on
    * the next state; accuracy is exact integer micro-units over
    * PREDICTED transitions. States never seen in training surface via
    * n_pred < n_test (loud — neither silently scored as misses nor
    * dropped), and a state with zero predictions reports NULL accuracy
    * instead of a division error. A grand-total `__ALL__` row makes
    * the headline number exact too.
    *
    * Scale shape: one case-keyed window per slice, counts collapse to
    * the |types|²-bounded table, the prediction table (≤ |types| rows)
    * joins back by broadcast — the corpus is never shuffled twice.
    */
  /** DFG concept-drift report — the process-mining drift screen: how
    * far the directly-follows distribution moved between two log
    * slices (classically: time halves). Per edge, counts and exact
    * integer micro-unit shares in each slice plus |Δshare|; a final
    * `__TV__` row carries the total-variation distance ΣΔ div 2 — the
    * headline "how much did the process change" number, exact.
    *
    * Empty-slice discipline: a slice with no transitions yields NULL
    * shares via NULLIF (surfaced, never a division error); edges
    * absent from one slice join in with loud zero counts through the
    * full-outer union of edge keys.
    *
    * Scale shape: one case window per slice, counts collapse to the
    * |types|²-bounded tables, the full-outer join and the 1-row total
    * run on those — the corpus never shuffles twice.
    */
  def dfgDrift(a: DataFrame, b: DataFrame, caseCol: String,
               activityCol: String, tsCol: String,
               tieCol: String): DataFrame = {
    def edges(df: DataFrame, out: String): DataFrame = {
      val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
      df.withColumn("__next", lead(col(activityCol), 1).over(w))
        .filter(col("__next").isNotNull)
        .groupBy(col(activityCol).as("activity"),
          col("__next").as("next_activity"))
        .agg(count(lit(1)).as(out))
        .select(col("activity"), col("next_activity"), col(out))
    }
    val j = edges(a, "__na").join(edges(b, "__nb"),
        Seq("activity", "next_activity"), "full_outer")
      .select(col("activity"), col("next_activity"),
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"))
    val tot = j.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    val sc = j.crossJoin(broadcast(tot))
      .withColumn("share_a_micro", expr("(n_a * 1000000L) div nullif(__ta, 0L)"))
      .withColumn("share_b_micro", expr("(n_b * 1000000L) div nullif(__tb, 0L)"))
      .withColumn("delta_micro", abs(col("share_a_micro") - col("share_b_micro")))
    sc.select(col("activity"), col("next_activity"), col("n_a"), col("n_b"),
        col("share_a_micro"), col("share_b_micro"), col("delta_micro"))
      .unionByName(sc.groupBy(col("__ta"), col("__tb"))
        .agg(expr("CAST(sum(delta_micro) AS BIGINT) div 2").as("delta_micro"))
        .select(lit("__TV__").as("activity"), lit("").as("next_activity"),
          col("__ta").as("n_a"), col("__tb").as("n_b"),
          lit(1000000L).as("share_a_micro"), lit(1000000L).as("share_b_micro"),
          col("delta_micro")))
  }

  /** Eventually-follows graph — the other standard process-discovery
    * relation next to the DFG (pm4py's `efg`): for every ordered pair
    * of positions i < j within a case, one (activity_i, activity_j)
    * observation, so `n` counts occurrence PAIRS (same-activity pairs
    * included). Heuristic miners and long-term-dependency checks read
    * this where the DFG only sees adjacency; every DFG edge is an EFG
    * edge with n_efg >= n_dfg (a law the spec pins).
    *
    * Scale shape: one case-key window for positions, then a case
    * EQUI-join with the i<j rank predicate as post-filter — pair
    * volume is Σ L(L−1)/2 over case lengths, QUADRATIC IN CASE LENGTH
    * BY CONTRACT (the relation itself is defined over all position
    * pairs). Cases here come from gap sessionization, so L is bounded
    * by the session gap, not by corpus size — the same bounded-case
    * argument the variants explode rests on. Output collapses to
    * ≤ |activities|² rows in a partial-aggregated count.
    */
  def eventuallyFollows(df: DataFrame, caseCol: String, activityCol: String,
                        tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val pos = df.withColumn("__rn", row_number().over(w))
      .select(col(caseCol), col(activityCol), col("__rn"))
    val lhs = pos.select(col(caseCol).as("__c"), col(activityCol).as("activity"),
      col("__rn").as("__ri"))
    val rhs = pos.select(col(caseCol).as("__c2"),
      col(activityCol).as("eventually"), col("__rn").as("__rj"))
    lhs.join(rhs, col("__c") === col("__c2") && col("__ri") < col("__rj"))
      .groupBy(col("activity"), col("eventually"))
      .agg(count(lit(1)).as("n"))
  }

  /** Activity rework report — per activity, how often a case executes
    * it MORE THAN ONCE: cases touched, cases with rework, the extra
    * (beyond-first) occurrence total, and the rework share in exact
    * integer micro-units. The process-quality screen read next to the
    * variants table: rework is where loops, retries and ping-pong
    * transfers hide.
    *
    * Scale shape: ONE partial-aggregated (case, activity) count
    * shuffle; everything after runs on the collapsed table, which then
    * collapses again to ≤ |activities| rows. No window, no join.
    */
  def rework(df: DataFrame, caseCol: String, activityCol: String): DataFrame =
    df.groupBy(col(caseCol), col(activityCol))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(activityCol).as("activity"))
      .agg(count(lit(1)).as("n_cases"),
        sum(when(col("__cnt") >= 2L, 1L).otherwise(0L)).as("n_rework_cases"),
        sum(col("__cnt") - 1L).as("extra_occurrences"))
      .withColumn("rework_micro",
        expr("(n_rework_cases * 1000000L) div n_cases"))

  /** Heuristics-miner dependency graph (Weijters & van der Aalst 2006,
    * "Process mining with the Heuristics Miner algorithm") — the
    * noise-robust order relation the heuristics family mines instead
    * of the raw DFG: for a != b the dependency measure
    * (|a>b| - |b>a|) / (|a>b| + |b>a| + 1), for a == b the length-one
    * loop measure |a>a| / (|a>a| + 1), and the length-TWO loop measure
    * (|a>b>a| + |b>a>b|) / (|a>b>a| + |b>a>b| + 1) that rescues
    * two-activity loops the plain measure suppresses. All three in
    * EXACT integer micro-units: the signed division goes through
    * sign-decomposition — integral div on NON-NEGATIVE operands under
    * an explicit CASE, because Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, and the two only agree when the
    * numerator is non-negative (the cross-engine trap the zscore /
    * drift family already pins). One row per OBSERVED directly-follows
    * edge (n_ab >= 1); the reverse direction surfaces through n_ba,
    * never as its own phantom row.
    *
    * Scale shape: ONE case-keyed window pass computes BOTH the lead-1
    * edge and the lead-2 loop observation (same partition + order, one
    * Exchange + one sort), collapsing partial-aggregated to ONE
    * |activities|²-bounded pair table that carries the loop count as a
    * conditional sum. The reverse direction is then merged JOIN-FREE:
    * ordered pairs re-key to their unordered (least, greatest) form
    * with a direction flag, one tiny aggregate zips both directions
    * side by side, and a conditional explode re-emits each observed
    * ordered row with its counterpart's counts in place. A first draft
    * self-joined the edge table against itself four ways — Spark
    * replicates the un-cached corpus subtree per join branch, so the
    * "tiny" joins silently re-scanned and re-windowed the corpus 4×
    * (caught by this file's plan gate); the unordered-merge shape does
    * it in one pass with zero joins. `kept` applies the classic
    * dependency threshold, emitted per row so the slider is
    * re-runnable without touching the corpus.
    */
  def heuristicDependencies(df: DataFrame, caseCol: String,
                            activityCol: String, tsCol: String,
                            tieCol: String,
                            thresholdMicro: Long = 900000L): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"heuristicDependencies: thresholdMicro in [0, 1e6], got $thresholdMicro")
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__n1", lead(col(activityCol), 1).over(w))
      .withColumn("__n2", lead(col(activityCol), 2).over(w))
      .filter(col("__n1").isNotNull)
      .select(col(activityCol).as("__a"), col("__n1").as("__b"),
        // a>b>a loop observation (a != b), carried as a 0/1 column so
        // the loop table costs no second corpus pass and no union
        when(col("__n2").isNotNull && col("__n2") === col(activityCol) &&
          col(activityCol) =!= col("__n1"), lit(1L)).otherwise(lit(0L))
          .as("__loop"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__loop")).as("__nl"))
    val merged = pairs
      .withColumn("__lo", least(col("__a"), col("__b")))
      .withColumn("__hi", greatest(col("__a"), col("__b")))
      .withColumn("__fwd", col("__a") <= col("__b"))
      .groupBy(col("__lo"), col("__hi"))
      .agg(
        sum(when(col("__fwd"), col("__n")).otherwise(lit(0L))).as("__nf"),
        sum(when(!col("__fwd"), col("__n")).otherwise(lit(0L))).as("__nr"),
        sum(when(col("__fwd"), col("__nl")).otherwise(lit(0L))).as("__lf"),
        sum(when(!col("__fwd"), col("__nl")).otherwise(lit(0L))).as("__lr"))
    val fwdRow = struct(col("__lo").as("activity"),
      col("__hi").as("next_activity"), col("__nf").as("n_ab"),
      col("__nr").as("n_ba"), col("__lf").as("n_aba"),
      col("__lr").as("n_bab"))
    val revRow = struct(col("__hi").as("activity"),
      col("__lo").as("next_activity"), col("__nr").as("n_ab"),
      col("__nf").as("n_ba"), col("__lr").as("n_aba"),
      col("__lf").as("n_bab"))
    merged
      .select(explode(when(col("__lo") =!= col("__hi"),
        array(fwdRow, revRow)).otherwise(array(fwdRow))).as("__e"))
      .select(col("__e.*"))
      // only OBSERVED directly-follows edges get a row; the reverse
      // direction surfaces through n_ba, never as a phantom row
      .filter(col("n_ab") > 0L)
      // the reverse of a>a is a>a itself, so a self-loop's n_ba IS its
      // n_ab (what a reverse-direction join would naturally produce)
      .withColumn("n_ba",
        when(col("activity") === col("next_activity"), col("n_ab"))
          .otherwise(col("n_ba")))
      .withColumn("dep_micro",
        when(col("activity") === col("next_activity"),
          expr("(n_ab * 1000000L) div (n_ab + 1L)"))
        .otherwise(expr(
          """CASE WHEN n_ab >= n_ba
            |  THEN ((n_ab - n_ba) * 1000000L) div (n_ab + n_ba + 1L)
            |  ELSE -(((n_ba - n_ab) * 1000000L) div (n_ab + n_ba + 1L))
            |END""".stripMargin)))
      .withColumn("l2_micro",
        when(col("activity") === col("next_activity"),
          lit(null).cast("long"))
        .otherwise(expr(
          "((n_aba + n_bab) * 1000000L) div (n_aba + n_bab + 1L)")))
      .withColumn("kept", col("dep_micro") >= lit(thresholdMicro))
      .select(col("activity"), col("next_activity"), col("n_ab"),
        col("n_ba"), col("n_aba"), col("n_bab"), col("dep_micro"),
        col("l2_micro"), col("kept"))
  }

  /** DFG escaping-edges precision (the simplified ETC-style metric of
    * Muñoz-Gama & Carmona 2010, as pm4py's DFG-based precision
    * baseline): mine the allowed directly-follows edges from a MODEL
    * log (support >= minSupport), then measure, per source activity
    * in the EVALUATION log, how much of its outgoing transition mass
    * "escapes" the model — precision = allowed mass / total mass in
    * exact integer micro-units, plus the mass-weighted `__ALL__`
    * headline row. The graded companion to the binary footprint
    * conformance check: a model that allows everything scores 1e6, a
    * drifted model shows exactly WHERE the new behavior escapes.
    *
    * Scale shape: both logs collapse through `edges`' one case-keyed
    * window to |activities|²-bounded tables; the allowed-set join runs
    * on those, with the model side broadcast. The `__ALL__` headline
    * comes from a ROLLUP over the same scored table — one Expand pass,
    * not a union whose second branch would re-scan and re-window the
    * whole eval log (the recompute trap the heuristic-deps gate
    * caught in its first draft).
    */
  def dfgPrecision(model: DataFrame, eval: DataFrame, caseCol: String,
                   activityCol: String, tsCol: String, tieCol: String,
                   minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1L, s"dfgPrecision: minSupport >= 1, got $minSupport")
    val allowed = edges(model, caseCol, activityCol, tsCol, tieCol)
      .filter(col("n") >= minSupport)
      .select(col("activity"), col("next_activity"), lit(true).as("__ok"))
    edges(eval, caseCol, activityCol, tsCol, tieCol)
      .join(broadcast(allowed), Seq("activity", "next_activity"), "left")
      .rollup(col("activity"))
      .agg(sum(col("n")).as("n_total"),
        sum(when(col("__ok").isNull, col("n")).otherwise(lit(0L)))
          .as("n_escaping"))
      .withColumn("activity", coalesce(col("activity"), lit("__ALL__")))
      .withColumn("precision_micro",
        expr("((n_total - n_escaping) * 1000000L) div n_total"))
      .select(col("activity"), col("n_total"), col("n_escaping"),
        col("precision_micro"))
  }

  def backtestNextEvent(train: DataFrame, test: DataFrame, caseCol: String,
                        activityCol: String, tsCol: String,
                        tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieCol))
    def pairs(df: DataFrame): DataFrame =
      df.withColumn("__next", lead(col(activityCol), 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col(activityCol).as("state"), col("__next").as("next_state"))
    val pw = Window.partitionBy(col("state"))
      .orderBy(col("n").desc, col("next_state").asc)
    val pred = pairs(train)
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__rk", row_number().over(pw))
      .filter(col("__rk") === 1)
      .select(col("state"), col("next_state").as("predicted"))
    val scored = pairs(test).join(broadcast(pred), Seq("state"), "left")
    def score(grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
      grouped.agg(count(lit(1)).as("n_test"),
        sum(when(col("predicted").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_pred"),
        sum(when(col("predicted") === col("next_state"), lit(1L))
          .otherwise(lit(0L))).as("n_hit"))
    score(scored.groupBy(col("state")))
      .unionByName(score(scored.groupBy(lit("__ALL__").as("state"))))
      .withColumn("acc_micro",
        expr("(n_hit * 1000000L) div nullif(n_pred, 0L)"))
  }

  /** Remaining-time prediction backtest — the duration sibling of
    * `backtestNextEvent` and the mandatory baseline of the
    * predictive-process-monitoring literature (van der Aalst et al.'s
    * annotated-transition-system predictor, state = current
    * activity): train the mean remaining seconds per activity on one
    * case population, score MAE on a held-out one. Remaining time =
    * case end − event time, so every quantity is a NON-NEGATIVE exact
    * integer (the one place a duration model gets to skip
    * sign-decomposition); the mean and the MAE are integral
    * divisions. Unseen test states surface via n_pred < n_test —
    * loud, the backtestNextEvent convention — and the `__ALL__`
    * headline comes from a ROLLUP, not a union re-scan.
    *
    * Scale shape: one case-keyed window per population for the case
    * end, the model collapses to ≤ |activities| rows and broadcasts
    * back, one Expand aggregate. The windows ride the sessionize
    * Exchange the log already pays.
    */
  def backtestRemainingTime(train: DataFrame, test: DataFrame,
                            caseCol: String, activityCol: String,
                            tsCol: String, tieCol: String): DataFrame = {
    def rem(df: DataFrame): DataFrame =
      df.withColumn("__end", max(unix_micros(col(tsCol)))
          .over(Window.partitionBy(col(caseCol))))
        .select(col(activityCol).as("state"),
          expr(s"(__end - unix_micros($tsCol)) div 1000000L").as("rem_sec"))
    val model = rem(train).groupBy(col("state"))
      .agg(count(lit(1)).as("n_train"), sum(col("rem_sec")).as("__sum"))
      .withColumn("pred_sec", expr("__sum div n_train"))
      .select(col("state"), col("pred_sec"))
    rem(test).join(broadcast(model), Seq("state"), "left")
      .rollup(col("state"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("pred_sec").isNotNull, 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("pred_sec").isNotNull,
          abs(col("rem_sec") - col("pred_sec"))).otherwise(0L)).as("__ae"))
      .withColumn("state", coalesce(col("state"), lit("__ALL__")))
      .withColumn("mae_sec", expr("__ae div nullif(n_pred, 0L)"))
      .select(col("state"), col("n_test"), col("n_pred"), col("mae_sec"))
  }
}
