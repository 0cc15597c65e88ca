package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TokenReplay

/** Distributed token-based replay of an event log against a discovered
  * Petri net — the conformance-checking fitness that pm4py's
  * `token_based_replay` computes, re-shaped for Spark: replay runs
  * ONCE PER DISTINCT VARIANT (the standard optimization — a million
  * cases sharing 50 variants pay 50 replays), with the compiled
  * per-row kernel (`functions/ReplayFunctions.scala`) walking each
  * variant against the broadcast-literal net.
  *
  * Fitness per variant (Rozinat & van der Aalst 2008), exact integer
  * micro-units: 500000·(c−m) div c + 500000·(p−r) div p. A variant
  * with missing = remaining = unknown = 0 fits perfectly (`fits` is
  * that executed check — on conforming textbook logs it agrees with
  * `Inductive.accepts`, spec-gated).
  *
  * Scale shape: ONE case-key shuffle builds the per-case sequence
  * inside the aggregate buffer (the `Variants.perCase` shape), one
  * partial-aggregated collapse to the variant table, then the replay
  * kernel is row-local over |variants| rows — the net rides inside
  * the expression, never a join. Case counts stay attached, so
  * corpus-level fitness is one further aggregate over the collapsed
  * table.
  */
object Replay {

  /** Serialize a net for the kernel: deterministic line order (places,
    * transitions, arcs each sorted) so two equal nets produce equal
    * expressions (Catalyst content-equality).
    */
  def serialize(net: Inductive.PetriNet): Array[String] = {
    val US = TokenReplay.US
    val names = net.places ++ net.transitions.keySet ++
      net.transitions.values.flatten
    require(names.forall(n => !n.contains(US)),
      "Replay.serialize: a net name contains the reserved separator \\u0001")
    val labels = net.transitions.values.flatten.toSeq
    require(labels.distinct.size == labels.size,
      s"Replay.serialize: duplicate transition labels — token replay " +
        "needs unique labels (inductive-miner nets guarantee this)")
    (net.places.toSeq.sorted.map(p => s"P$US$p") ++
      net.transitions.toSeq.sortBy(_._1).map { case (t, l) =>
        s"T$US$t$US${l.getOrElse("")}" } ++
      net.arcs.toSeq.sorted.map { case (a, b) => s"A$US$a$US$b" } :+
      s"M$US${net.source}$US${net.sink}").toArray
  }

  /** Per-variant replay report: (variant, n_cases, n_events, produced,
    * consumed, missing, remaining, unknown, fits, fitness_micro).
    */
  def tokenReplay(df: DataFrame, caseCol: String, activityCol: String,
                  tsCol: String, tieCol: String,
                  net: Inductive.PetriNet): DataFrame = {
    val spec = serialize(net)
    df.groupBy(col(caseCol))
      .agg(transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol),
          col(activityCol)))),
        e => e(activityCol)).as("__seq"))
      .groupBy(array_join(col("__seq"), "->").as("variant"))
      .agg(count(lit(1)).as("n_cases"), first(col("__seq")).as("__seq"))
      // the variant table is tiny, so AQE coalesces it to ONE
      // partition — which would run every replay SERIALLY; the replay
      // kernel is the expensive part, so spread variants first
      .repartition(32)
      .withColumn("__r", TokenReplay.tokenReplayCounts(col("__seq"), spec))
      .select(col("variant"), col("n_cases"),
        size(col("__seq")).cast("long").as("n_events"),
        col("__r.produced").as("produced"),
        col("__r.consumed").as("consumed"),
        col("__r.missing").as("missing"),
        col("__r.remaining").as("remaining"),
        col("__r.unknown").as("unknown"))
      .withColumn("fits",
        col("missing") === 0L && col("remaining") === 0L &&
          col("unknown") === 0L)
      .withColumn("fitness_micro", expr(
        "(500000L * (consumed - missing)) div consumed + " +
          "(500000L * (produced - remaining)) div produced"))
  }

  /** Per-variant OPTIMAL alignments (Adriansyah et al. 2011) — the
    * exact conformance metric above `tokenReplay`'s heuristic counts:
    * minimum-cost path through the synchronous product (sync 0,
    * log/labeled-model 1, τ 0), with the standard alignment fitness
    * 1 − cost / (emptyTraceCost + |trace|) in exact integer
    * micro-units (the pm4py normalization: the worst alignment logs
    * every event and walks the cheapest model path). cost = 0 ⟺ the
    * net accepts the variant — gated against `Inductive.accepts`.
    *
    * Scale shape: identical to `tokenReplay` — one case collapse, one
    * variant collapse, then the compiled Dijkstra kernel row-local
    * over |variants| rows with the net baked into the expression; the
    * empty-trace cost is ONE driver-side kernel call, a constant in
    * the plan.
    */
  def alignments(df: DataFrame, caseCol: String, activityCol: String,
                 tsCol: String, tieCol: String,
                 net: Inductive.PetriNet): DataFrame = {
    val spec = serialize(net)
    val emptyCost =
      graft.functions.Alignment.align(TokenReplay.parse(spec), Vector.empty)._1
    df.groupBy(col(caseCol))
      .agg(transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol),
          col(activityCol)))),
        e => e(activityCol)).as("__seq"))
      .groupBy(array_join(col("__seq"), "->").as("variant"))
      .agg(count(lit(1)).as("n_cases"), first(col("__seq")).as("__seq"))
      // spread variants before the Dijkstra kernel: AQE's coalesce of
      // the tiny variant table would serialize the whole search (the
      // tokenReplay lesson — the kernel IS the cost here)
      .repartition(32)
      .withColumn("__a",
        graft.functions.Alignment.alignCounts(col("__seq"), spec))
      .select(col("variant"), col("n_cases"),
        size(col("__seq")).cast("long").as("n_events"),
        col("__a.cost").as("cost"),
        col("__a.log_moves").as("log_moves"),
        col("__a.model_moves").as("model_moves"),
        col("__a.sync_moves").as("sync_moves"))
      .withColumn("fitness_micro", expr(
        s"(((${emptyCost}L + n_events) - cost) * 1000000L) " +
          s"div nullif(${emptyCost}L + n_events, 0L)"))
  }
}
