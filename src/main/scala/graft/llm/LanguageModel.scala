package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the second half of the
  * CCNet quality recipe (Wenzek et al. 2020: a KenLM trained on
  * Wikipedia scores Common Crawl; docs are bucketed head/middle/tail
  * by per-slice perplexity terciles). `TextOps.trainQualityScorerWeak`
  * is the fastText-style half; this is the LM half, with an add-α
  * smoothed bigram model in place of KenLM's 5-gram (same pipeline
  * shape: train on a REFERENCE slice, score everything, bucket within
  * groups):
  *   p(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·(V+1))
  * over a bounded top-V vocabulary with an explicit <unk> bucket.
  * Surprise (mean negative log-likelihood, nats/token) is monotone in
  * perplexity (ppl = exp(surprise)) and can't overflow.
  *
  * Scale shape: TRAINING is two distributed count aggregations over
  * the reference slice, each cut to a bounded table (top-V unigrams,
  * top-B bigrams) by TakeOrdered — the only driver collects are those
  * bounded tables (the capped-BPE-vocab pattern). SCORING explodes
  * each doc's adjacent token pairs once; vocab membership, the <unk>
  * map, and both count lookups are BROADCAST hash joins (never an
  * O(V) literal scan per token); per-pair surprise is quantized to
  * integer MICRO-NATS before the per-doc sum, so the aggregate is
  * addition-order-free (the repo's never-SUM-doubles rule) and the
  * exploded rows combine map-side before the one doc-keyed shuffle.
  * No UDFs anywhere.
  *
  * Harness status: ln is not bit-identical across ENGINES, so the
  * queries are rows-only BY CONTRACT; LmSpec pins the semantics with
  * a driver-side reimplementation bit-equality gate (same JVM ln on
  * the same doubles), planted-gibberish ordering, determinism, and
  * bucket-conservation laws.
  */
object LanguageModel {

  /** Bounded trained model: `vocab` = top-V unigrams with counts PLUS
    * the aggregated <unk> count under `UnkToken`; `bigrams` = top-B
    * bigram counts over the UNK-mapped stream; `vocabSize` = V (the
    * smoothing fan-out is V+1: vocab plus <unk>).
    */
  final case class BigramLm(vocab: Array[(String, Long)],
                            bigrams: Array[((String, String), Long)],
                            vocabSize: Int) {
    require(vocab.nonEmpty, "BigramLm: empty vocabulary")
  }

  val UnkToken = "<unk>"

  /** Adjacent-pair view of a tokens column, guarded for short docs
    * (sequence(1, 0) counts DOWN in Spark — same pitfall as
    * `TextOps.ngrams`).
    */
  private def pairExpr(toksCol: String): Column = expr(
    s"""CASE WHEN size($toksCol) < 2 THEN array()
       |ELSE transform(sequence(1, size($toksCol) - 1),
       |  i -> struct(element_at($toksCol, i) AS w1r,
       |              element_at($toksCol, i + 1) AS w2r)) END""".stripMargin)

  /** Train on the `refPred` slice of `df` (CCNet's "Wikipedia"): the
    * clean reference the rest of the corpus is judged against.
    */
  def trainBigramLm(df: DataFrame, textCol: String, refPred: Column,
                    vocabSize: Int = 2048,
                    maxBigrams: Int = 16384): BigramLm = {
    require(vocabSize > 0 && maxBigrams > 0, "trainBigramLm: bad bounds")
    val spark = df.sparkSession
    import spark.implicits._
    val ref = df.filter(refPred)
      .select(TextOps.tokens(textCol).as("__toks"))
    val uni = ref.select(explode(col("__toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    // top-V by (count desc, token asc) — a total order, so the cut is
    // deterministic; TakeOrdered keeps it one local top-V per
    // partition + a bounded driver merge, never a global sort
    val topV = uni.orderBy(col("c").desc, col("t").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vocabDf = broadcast(topV.map(_._1).toSeq.toDF("t"))
    val unkCount = uni.join(vocabDf, Seq("t"), "left_anti")
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    // bigram counts over the UNK-MAPPED stream (must match scoring):
    // membership via two broadcast hash joins, not a per-token scan
    val bi = ref
      .select(explode(pairExpr("__toks")).as("p"))
      .select(col("p.w1r").as("w1r"), col("p.w2r").as("w2r"))
      .join(vocabDf.select(col("t").as("__v1")),
        col("w1r") === col("__v1"), "left")
      .join(vocabDf.select(col("t").as("__v2")),
        col("w2r") === col("__v2"), "left")
      .select(coalesce(col("__v1"), lit(UnkToken)).as("w1"),
        coalesce(col("__v2"), lit(UnkToken)).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc).limit(maxBigrams)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    BigramLm(topV :+ (UnkToken, unkCount), bi, topV.length)
  }

  /** Score every document: mean bigram surprise in micro-nats/token
    * over the UNK-mapped token stream (`surprise_micro` = the per-pair
    * floor(1e6·(−ln p)) summed as BIGINT, divided by the pair count —
    * one IEEE divide at the end, so the score is deterministic under
    * any partitioning). Docs with fewer than 2 tokens have no bigram
    * — they surface with NULL surprise and n_bigrams = 0, never
    * vanish.
    */
  def perplexityScore(df: DataFrame, idCol: String, textCol: String,
                      lm: BigramLm, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "perplexityScore: alpha must be positive")
    for (c <- Seq("__toks", "w1", "w2", "c1", "c2", "n_bigrams",
        "surprise_micro", "__v1", "__v2", "__s") if df.columns.contains(c))
      require(false, s"perplexityScore: '$c' is reserved — rename it")
    val spark = df.sparkSession
    import spark.implicits._
    val uniDf = broadcast(lm.vocab.toSeq.toDF("w1", "c1"))
    val biDf = broadcast(lm.bigrams.toSeq
      .map { case ((a, b), c) => (a, b, c) }.toDF("w1", "w2", "c2"))
    val vocabDf = broadcast(
      lm.vocab.iterator.map(_._1).filter(_ != UnkToken).toSeq.toDF("t"))
    val fanout = lm.vocabSize + 1
    val pairs = df
      .withColumn("__toks", TextOps.tokens(textCol))
      .select(col(idCol), explode(pairExpr("__toks")).as("p"))
      .select(col(idCol), col("p.w1r").as("w1r"), col("p.w2r").as("w2r"))
      .join(vocabDf.select(col("t").as("__v1")),
        col("w1r") === col("__v1"), "left")
      .join(vocabDf.select(col("t").as("__v2")),
        col("w2r") === col("__v2"), "left")
      .select(col(idCol),
        coalesce(col("__v1"), lit(UnkToken)).as("w1"),
        coalesce(col("__v2"), lit(UnkToken)).as("w2"))
    val scored = pairs
      .join(uniDf, Seq("w1"))
      .join(biDf, Seq("w1", "w2"), "left")
      .withColumn("__s", floor(lit(-1e6) * log(
        (coalesce(col("c2"), lit(0L)).cast("double") + lit(alpha)) /
          (col("c1").cast("double") + lit(alpha * fanout)))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__s")).as("surprise_micro"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("surprise_micro").cast("double") /
          col("n_bigrams").cast("double") / lit(1e6)).as("surprise"))
  }

  /** The CCNet head/middle/tail cut: per-`groupCol` surprise terciles
    * (exact 1/3 and 2/3 percentiles over the group's scored docs),
    * then bucket = head (≤ t1), middle (≤ t2), tail. Docs with no
    * bigrams bucket as 'short' — loud, never dropped. The tercile
    * table is one row per group and broadcasts back; the corpus never
    * shuffles for the bucketing itself.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, lm: BigramLm,
                        alpha: Double = 0.5): DataFrame = {
    val scored = perplexityScore(df, idCol, textCol, lm, alpha)
      .join(df.select(col(idCol), col(groupCol)), Seq(idCol))
    val cuts = scored.filter(col("surprise").isNotNull)
      .groupBy(col(groupCol))
      .agg(expr("percentile(surprise, array(CAST(1.0D/3.0D AS double), CAST(2.0D/3.0D AS double)))").as("__qs"))
      .select(col(groupCol),
        element_at(col("__qs"), 1).as("t1"),
        element_at(col("__qs"), 2).as("t2"))
    scored.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bucket",
        when(col("surprise").isNull, lit("short"))
          .when(col("surprise") <= col("t1"), lit("head"))
          .when(col("surprise") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(groupCol), col("n_bigrams"),
        col("surprise"), col("bucket"))
  }

  /** Moore-Lewis cross-entropy data selection (Moore & Lewis, ACL
    * 2010 — the classic "intelligent selection" recipe every domain-
    * adaptation pipeline reruns): score each document under an
    * IN-DOMAIN bigram LM and a GENERAL one, keep documents where
    * ml_score = H_in − H_gen < threshold — text that looks more like
    * the target domain than like the background corpus. The
    * difference cancels the document's own entropy, which is what
    * makes the ranking work where a raw in-domain perplexity cut
    * would just select short/common text.
    *
    * Scale shape: ONE pair explode over the corpus (NOT two
    * `perplexityScore` passes — that would tokenize and shuffle the
    * corpus twice); both models' vocab/unigram/bigram tables ride
    * six BROADCAST joins on the exploded stream (model sizes are
    * bounded by construction), both surprise sums come out of one
    * partial-aggregated groupBy, and the final doc join is the only
    * other shuffle. Docs with < 2 tokens surface with NULL scores and
    * selected = false — unjudgeable is not selectable, but it is
    * visible.
    */
  def mooreLewis(df: DataFrame, idCol: String, textCol: String,
                 inLm: BigramLm, genLm: BigramLm, threshold: Double = 0.0,
                 alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "mooreLewis: alpha must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def vocabDf(lm: BigramLm, n: String) = broadcast(
      lm.vocab.iterator.map(_._1).filter(_ != UnkToken).toSeq.toDF(n))
    def uniDf(lm: BigramLm, w: String, c: String) = broadcast(
      lm.vocab.toSeq.toDF(w, c))
    def biDf(lm: BigramLm, w1: String, w2: String, c: String) = broadcast(
      lm.bigrams.toSeq.map { case ((a, b), n) => (a, b, n) }.toDF(w1, w2, c))
    def surprise(c2: String, c1: String, fanout: Int) =
      floor(lit(-1e6) * log(
        (coalesce(col(c2), lit(0L)).cast("double") + lit(alpha)) /
          (col(c1).cast("double") + lit(alpha * fanout)))).cast("long")
    val pairs = df
      .withColumn("__toks", TextOps.tokens(textCol))
      .select(col(idCol), explode(pairExpr("__toks")).as("p"))
      .select(col(idCol), col("p.w1r").as("w1r"), col("p.w2r").as("w2r"))
      // per-model UNK mapping (the vocabularies differ)
      .join(vocabDf(inLm, "__i1"), col("w1r") === col("__i1"), "left")
      .join(vocabDf(inLm, "__i2"), col("w2r") === col("__i2"), "left")
      .join(vocabDf(genLm, "__g1"), col("w1r") === col("__g1"), "left")
      .join(vocabDf(genLm, "__g2"), col("w2r") === col("__g2"), "left")
      .select(col(idCol),
        coalesce(col("__i1"), lit(UnkToken)).as("wi1"),
        coalesce(col("__i2"), lit(UnkToken)).as("wi2"),
        coalesce(col("__g1"), lit(UnkToken)).as("wg1"),
        coalesce(col("__g2"), lit(UnkToken)).as("wg2"))
    val scored = pairs
      .join(uniDf(inLm, "wi1", "ci1"), Seq("wi1"))
      .join(biDf(inLm, "wi1", "wi2", "ci2"), Seq("wi1", "wi2"), "left")
      .join(uniDf(genLm, "wg1", "cg1"), Seq("wg1"))
      .join(biDf(genLm, "wg1", "wg2", "cg2"), Seq("wg1", "wg2"), "left")
      .withColumn("__si", surprise("ci2", "ci1", inLm.vocabSize + 1))
      .withColumn("__sg", surprise("cg2", "cg1", genLm.vocabSize + 1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__si")).as("__smi"), sum(col("__sg")).as("__smg"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("surprise_in", col("__smi").cast("double") /
        col("n_bigrams").cast("double") / lit(1e6))
      .withColumn("surprise_gen", col("__smg").cast("double") /
        col("n_bigrams").cast("double") / lit(1e6))
      .withColumn("ml_score", col("surprise_in") - col("surprise_gen"))
      .withColumn("selected",
        coalesce(col("ml_score") < lit(threshold), lit(false)))
      .select(col(idCol), col("n_bigrams"), col("surprise_in"),
        col("surprise_gen"), col("ml_score"), col("selected"))
  }
}
