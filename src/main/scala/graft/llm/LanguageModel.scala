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
}
