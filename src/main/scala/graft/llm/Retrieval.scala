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

  /** Persisted inverted index — the `ivfTrain`/`ivfTopKWith` split
    * applied to the LEXICAL arm: pay the corpus tokenize + explode +
    * count shuffle ONCE at build time, then every later BM25 search
    * is a broadcast query-term join against the postings table; the
    * corpus text is never re-read. Unlike the `ModelStore` artifacts
    * (bounded driver tables by construction) the index is DISTRIBUTED
    * — corpus-sized — so persistence is a plain partitioned parquet
    * write, not the bounded-artifact schema.
    *
    * Four tables, normalized exactly where INCREMENTAL maintenance
    * (`updateLexIndex`) needs it:
    *  - `postings` (term, `idCol`, tf, dl): dl stays DENORMALIZED —
    *    a changed doc is remove+add, so its postings are rewritten
    *    with the new dl anyway, and search skips a corpus-sized
    *    docLens join;
    *  - `termDf` (term, df): document frequency NORMALIZED out — the
    *    one number a single touched doc would otherwise smear across
    *    every posting row of its (possibly very common) terms;
    *  - `docLens` (`idCol`, dl): the doc table of record — token-less
    *    docs appear here too, so incremental n_docs/sum_dl deltas are
    *    exact;
    *  - `stats` (n_docs, sum_dl): one row.
    * All computed EXACTLY as `bm25TopK`'s internal tables (same
    * integers), so indexed search is bit-equal to the from-scratch
    * scan — gated in `RetrievalSpec`, not recall-bounded.
    */
  final case class LexIndex(postings: DataFrame, termDf: DataFrame,
                            docLens: DataFrame, stats: DataFrame)

  def buildLexIndex(df: DataFrame, idCol: String, textCol: String): LexIndex = {
    for (c <- Seq("term", "df", "tf", "dl", "__toks", "n_docs", "sum_dl")
        if df.columns.contains(c))
      require(false, s"buildLexIndex: '$c' is reserved for internal use — rename it")
    val docs = df
      .withColumn("__toks", TextOps.tokens(textCol))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("dl"))
    val docLens = docs.select(col(idCol), col("dl").cast("long").as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = docs
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // (term, id) is unique after the groupBy, so rows-per-term IS the
    // document frequency — the same value bm25TopK derives per query
    LexIndex(
      tf.select(col("term"), col(idCol), col("tf").cast("long").as("tf"),
        col("dl").cast("long").as("dl")),
      tf.groupBy("term").agg(count(lit(1)).cast("long").as("df")),
      docLens,
      stats.select(col("n_docs").cast("long").as("n_docs"),
        col("sum_dl").cast("long").as("sum_dl")))
  }

  /** INCREMENTAL index maintenance — the daily-crawl shape: apply a
    * snapshot diff (`Dedup.snapshotDiff`: `removedIds` = ids with
    * status removed|changed, `addedDocs` = the new text of ids with
    * status added|changed) WITHOUT re-tokenizing the unchanged
    * corpus. The touched-data costs: postings change by an id-keyed
    * anti-join + a union of the added docs' postings; `termDf`
    * changes by an exact ±delta computed from ONLY the touched
    * posting rows (terms nobody touched are never read, terms whose
    * df hits 0 are dropped); `stats` moves by the docLens deltas.
    * Every table lands bit-identical to a full rebuild on the new
    * corpus — gated in `RetrievalSpec`, which is what makes the
    * incremental path trustworthy enough to run unattended.
    */
  def updateLexIndex(idx: LexIndex, removedIds: DataFrame,
                     addedDocs: DataFrame, idCol: String,
                     textCol: String): LexIndex = {
    require(removedIds.columns.toSeq == Seq(idCol),
      s"updateLexIndex: removedIds must be exactly ($idCol)")
    val rem = removedIds.distinct()
    val add = buildLexIndex(addedDocs, idCol, textCol)
    val removedPost = idx.postings.join(rem, Seq(idCol), "left_semi")
    val postings = idx.postings.join(rem, Seq(idCol), "left_anti")
      .unionByName(add.postings)
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    val dfDelta = add.termDf.select(col("term"), col("df").as("__d"))
      .unionByName(removedPost.groupBy("term")
        .agg((-count(lit(1))).cast("long").as("__d")))
      .groupBy("term").agg(sum("__d").cast("long").as("__d"))
    val termDf = idx.termDf.join(dfDelta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    val removedLens = idx.docLens.join(rem, Seq(idCol), "left_semi")
    val docLens = idx.docLens.join(rem, Seq(idCol), "left_anti")
      .unionByName(add.docLens)
    val delta = removedLens
      .agg(count(lit(1)).cast("long").as("__rn"),
        coalesce(sum("dl"), lit(0L)).cast("long").as("__rdl"))
    val stats = idx.stats.crossJoin(broadcast(delta))
      .crossJoin(broadcast(add.stats.select(
        col("n_docs").as("__an"), coalesce(col("sum_dl"), lit(0L)).as("__adl"))))
      .select((col("n_docs") - col("__rn") + col("__an")).as("n_docs"),
        (coalesce(col("sum_dl"), lit(0L)) - col("__rdl") + col("__adl")).as("sum_dl"))
    LexIndex(postings, termDf, docLens, stats)
  }

  /** Write the index: postings term-clustered (repartition on the
    * term, sorted within partitions) so a term's posting list is
    * contiguous and parquet min/max stats prune term-predicate scans;
    * at 100 TB you would `Bucketing.writeBucketed` on the term to
    * also kill the search-time shuffle — the write partitioning you
    * want anyway.
    */
  def saveLexIndex(idx: LexIndex, dir: String): Unit = {
    idx.postings.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(dir + "/postings")
    idx.termDf.write.mode("overwrite").parquet(dir + "/term_df")
    idx.docLens.write.mode("overwrite").parquet(dir + "/doc_lens")
    idx.stats.write.mode("overwrite").parquet(dir + "/stats")
  }

  /** Load a saved index; fails LOUD on an unexpected schema (a stale
    * or foreign directory must not score silently wrong).
    */
  def loadLexIndex(spark: org.apache.spark.sql.SparkSession, idCol: String,
                   dir: String): LexIndex = {
    val p = spark.read.parquet(dir + "/postings")
    val t = spark.read.parquet(dir + "/term_df")
    val l = spark.read.parquet(dir + "/doc_lens")
    val s = spark.read.parquet(dir + "/stats")
    require(p.columns.toSeq == Seq("term", idCol, "tf", "dl"),
      s"loadLexIndex: unexpected postings schema ${p.columns.mkString(",")}")
    require(t.columns.toSeq == Seq("term", "df"),
      s"loadLexIndex: unexpected term_df schema ${t.columns.mkString(",")}")
    require(l.columns.toSeq == Seq(idCol, "dl"),
      s"loadLexIndex: unexpected doc_lens schema ${l.columns.mkString(",")}")
    require(s.columns.toSeq == Seq("n_docs", "sum_dl"),
      s"loadLexIndex: unexpected stats schema ${s.columns.mkString(",")}")
    LexIndex(p, t, l, s)
  }

  /** Search through the index: see `TextOps.bm25TopKIndexed`. */
  def bm25TopKWith(idx: LexIndex, idCol: String,
                   queries: Seq[(Int, Seq[String])], k: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame =
    TextOps.bm25TopKIndexed(idx.postings, idx.termDf, idx.stats, idCol,
      queries, k, k1, b)

  /** Query-by-example through the index: see
    * `TextOps.bm25TopKByDocIndexed`.
    */
  def bm25TopKByDocWith(idx: LexIndex, idCol: String, probeIds: Seq[Long],
                        k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    TextOps.bm25TopKByDocIndexed(idx.postings, idx.termDf, idx.stats, idCol,
      probeIds, k, k1, b)

  /** 1e6/log2(r+1) for r = 1..10, floored — the NDCG discount table as
    * PINNED integer constants, so no libm log2 enters the metric and
    * the whole evaluation hash-verifies cross-engine.
    */
  private[llm] val DiscountMicro = Seq(1000000L, 630929L, 500000L, 430676L,
    386852L, 356207L, 333333L, 315464L, 301029L, 289064L)
  private[llm] val DiscountPrefix = DiscountMicro.scanLeft(0L)(_ + _)

  /** Binary-relevance retrieval evaluation at cutoff k ≤ 10 — the IR
    * report card every retrieval tier in this library (BM25, dense,
    * hybrid RRF, ANN arms) can be scored with: per query, hits@k,
    * MRR, precision@k, recall and NDCG@k, ALL in exact integer
    * micro-units — the log2 discounts are the pinned constant table
    * above, the ideal DCG is its prefix sum at min(n_rel, k), and
    * every division is integral. Queries with no relevant documents
    * report NULL recall/NDCG (undefined, never a fake zero); queries
    * whose top-k missed every relevant doc report MRR/precision 0 —
    * the miss IS the signal.
    *
    * Scale shape: one (qid, doc) equi-join of the run against the
    * qrels, one per-qid partial aggregate, the n_rel table broadcast
    * back. Output is one row per query in the run.
    */
  def evalBinary(run: DataFrame, qrels: DataFrame, qidCol: String,
                 docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"evalBinary: k in [1, 10] (pinned " +
      s"discount table), got $k")
    val rel = qrels.select(col(qidCol), col(docCol), lit(true).as("__rel"))
    val nrel = qrels.groupBy(col(qidCol)).agg(count(lit(1)).as("n_rel"))
    val disc = element_at(array(DiscountMicro.map(lit): _*),
      col(rankCol).cast("int"))
    val idcgArr = array(DiscountPrefix.tail.map(lit): _*)
    run.filter(col(rankCol) <= k)
      .join(rel, Seq(qidCol, docCol), "left")
      .groupBy(col(qidCol))
      .agg(
        sum(when(col("__rel"), 1L).otherwise(0L)).as("n_hits"),
        min(when(col("__rel"), col(rankCol).cast("long"))).as("__fr"),
        sum(when(col("__rel"), disc).otherwise(0L)).as("__dcg"))
      .join(broadcast(nrel), Seq(qidCol), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("mrr_micro",
        coalesce(expr("1000000L div __fr"), lit(0L)))
      .withColumn("precision_micro", expr(s"(n_hits * 1000000L) div ${k}L"))
      .withColumn("recall_micro",
        expr("(n_hits * 1000000L) div nullif(n_rel, 0L)"))
      .withColumn("__idcg", when(col("n_rel") === 0L, lit(null))
        .otherwise(element_at(idcgArr,
          least(col("n_rel"), lit(k.toLong)).cast("int"))))
      .withColumn("ndcg_micro", expr("(__dcg * 1000000L) div __idcg"))
      .select(col(qidCol), col("n_rel"), col("n_hits"), col("mrr_micro"),
        col("precision_micro"), col("recall_micro"), col("ndcg_micro"))
  }

  /** Exact phrase search over positional postings — the "quoted query"
    * every lexical engine supports beside BM25's bag-of-words: find
    * documents containing the EXACT token sequence, with occurrence
    * counts and the first match position (1-based). The classic
    * positional-index algorithm: a token at position p matching
    * phrase term i votes for anchor p − i; an anchor with all m
    * DISTINCT offsets present is an occurrence. That turns the
    * m-way positional self-join of the textbook formulation into ONE
    * aggregation: explode positions, keep only the phrase's terms
    * (everything else never leaves the scan), broadcast-join the
    * (term → offset) table, group by (doc, anchor) counting votes —
    * a repeated phrase term votes for several anchors from one
    * position, which the anchor arithmetic handles for free.
    *
    * Scale shape: one corpus scan; only matching-term postings (a
    * phrase-selectivity fraction of the corpus) reach the single
    * (doc, anchor) shuffle; the term table broadcasts. Compare the
    * DuckDB oracle, which scans every window of every document — the
    * plan gap between an index probe and a brute-force scan.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phraseSearch: phrase terms must be non-empty single tokens: $phrase")
    val spark = df.sparkSession
    import spark.implicits._
    val m = phrase.length
    val terms = broadcast(phrase.zipWithIndex.toDF("__t", "__off"))
    df.withColumn("__toks", TextOps.tokens(textCol))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__term")))
      .filter(col("__term").isin(phrase.distinct: _*))
      .join(terms, col("__term") === col("__t"))
      .select(col(idCol), (col("__pos") - col("__off")).as("__p0"))
      .filter(col("__p0") >= 0)
      .groupBy(col(idCol), col("__p0"))
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") === m)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        (min(col("__p0")) + 1).cast("long").as("first_pos"))
  }
}
