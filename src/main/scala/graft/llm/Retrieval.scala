package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independent rankers (lexical BM25, dense
  * cosine, ...) with reciprocal-rank fusion (Cormack et al., SIGIR
  * 2009): score(d) = Σ_arms 1/(c + rank_arm(d)). RRF is the standard
  * production fusion because it needs NO score calibration across
  * arms — only ranks — and c≈60 damps the head so one arm can't
  * dominate.
  *
  * Determinism (the oracle-exactness rule of this package): each
  * arm's contribution is quantized to integer NANO-units —
  * floor(1e9/(c+rank)), one correctly-rounded IEEE divide of exactly
  * representable doubles, then floor — BEFORE the cross-arm sum, so
  * the fused score is integer arithmetic and addition-order-free.
  *
  * Scale shape: each arm's output is already cut to its own top-k
  * (probes × k rows — tiny next to the corpus), so fusion runs on
  * rank tables, never on corpus-sized data: one hash aggregate over
  * |probes|·k·n_arms rows and a rank-limit window per probe.
  */
object Retrieval {

  /** Fuse per-probe rankings. Each input must have columns
    * (`qidCol`, `idCol`, `rankCol`) with rank 1-based and at most one
    * row per (qid, id). Output: (qid, id, rrf_micro, n_arms, rank)
    * with the fused top `k` per qid; `n_arms` says how many arms
    * surfaced the doc (agreement is itself a useful signal).
    */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k > 0 && c >= 0, "rrfFuse: k must be positive, c non-negative")
    val contribs = rankings.map { r =>
      r.select(col(qidCol).as("qid"), col(idCol).as("id"),
        floor(lit(1e9) / (lit(c).cast("double") + col(rankCol).cast("double")))
          .cast("long").as("__c"))
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("id").asc)
    contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("__c")).as("rrf_micro"), count(lit(1)).as("n_arms"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Query-by-example HYBRID retrieval over an id-aligned corpus: the
    * dense arm is exact quantized-cosine top-k over the embedding
    * table (`Similarity.bruteForceTopK`, probe side broadcast), the
    * lexical arm is BM25 with the probe doc's distinct tokens as the
    * query (`TextOps.bm25TopKByDoc`), and the two rank tables fuse by
    * RRF. `kArm` is each arm's cut (the fusion pool), `k` the fused
    * cut. Both arms exclude the probe doc itself.
    *
    * At 100 TB the two arms scan their corpora independently (each
    * with its own scale story — the dense arm swaps to an ANN tier,
    * the lexical arm's postings shuffle only probe terms) and the
    * fusion cost stays |probes|·kArm·2 regardless of corpus size.
    */
  def hybridTopKByDoc(docs: DataFrame, embeds: DataFrame,
                      docIdCol: String, textCol: String,
                      vecIdCol: String, embCol: String,
                      probePred: Column => Column, kArm: Int, k: Int,
                      c: Int = 60,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lexical = TextOps.bm25TopKByDoc(docs, docIdCol, textCol,
      probePred(col(docIdCol)), kArm, k1, b)
    val dense = Similarity.bruteForceTopK(embeds, vecIdCol, embCol,
        probePred(col(vecIdCol)), kArm)
      .select(col("probe_id").as("qid"),
        col("neighbor_id").as(docIdCol), col("rank"))
    rrfFuse(Seq(lexical, dense), "qid", docIdCol, "rank", k, c)
      .withColumnRenamed("id", docIdCol)
  }

  /** Budgeted context assembly — the last stage of a RAG pipeline:
    * walk each probe's ranked candidates in rank order and keep the
    * prefix whose running token total stays within `budgetTokens`.
    * The top-ranked candidate is kept even if it alone exceeds the
    * budget (the packGreedy never-split rule: an empty context is
    * worse than an oversized one — and loud-never-silent: a probe
    * never vanishes from the output).
    *
    * One window over probes×k rank-table rows (tiny); the running sum
    * is integer token counts — exact and order-free given the total
    * (rank) ordering.
    */
  def contextPack(ranked: DataFrame, qidCol: String, rankCol: String,
                  tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "contextPack: budgetTokens must be positive")
    require(!ranked.columns.contains("cum_tokens"),
      "contextPack: 'cum_tokens' is reserved — rename it")
    val w = Window.partitionBy(col(qidCol)).orderBy(col(rankCol).asc)
    ranked
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budgetTokens || col(rankCol) === 1)
  }

  /** The SCALE arm of `hybridTopKByDoc`: identical fusion, but the
    * dense arm is multiprobe hyperplane-LSH ANN (`Similarity.annTopK`)
    * instead of the brute-force scan — bucket-join candidates, so the
    * dense cost drops to the candidate fraction while the lexical arm
    * and the fusion are unchanged. Approximate only through the dense
    * arm's bucket misses; recall vs the exact hybrid is gated in
    * `RetrievalSpec`. RRF is itself the safety net here: a dense miss
    * costs at most that one arm's contribution, and docs the lexical
    * arm surfaces keep their exact lexical ranks.
    */
  def hybridTopKByDocAnn(docs: DataFrame, embeds: DataFrame,
                         docIdCol: String, textCol: String,
                         vecIdCol: String, embCol: String,
                         probePred: Column => Column, kArm: Int, k: Int,
                         c: Int = 60,
                         k1: Double = 1.2, b: Double = 0.75,
                         nbits: Int = 5, probeFlips: Int = 1): DataFrame = {
    val lexical = TextOps.bm25TopKByDoc(docs, docIdCol, textCol,
      probePred(col(docIdCol)), kArm, k1, b)
    val dense = Similarity.annTopK(embeds, vecIdCol, embCol,
        probePred(col(vecIdCol)), kArm, nbits, probeFlips)
      .select(col("probe_id").as("qid"),
        col("neighbor_id").as(docIdCol), col("rank"))
    rrfFuse(Seq(lexical, dense), "qid", docIdCol, "rank", k, c)
      .withColumnRenamed("id", docIdCol)
  }
}
