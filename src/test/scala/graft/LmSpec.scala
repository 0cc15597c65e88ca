package graft

import org.apache.spark.sql.functions._

import graft.llm.LanguageModel
import graft.llm.LanguageModel.{BigramLm, UnkToken}

/** Gates for the bigram-LM perplexity tier (rows-only in the harness:
  * ln is not bit-identical cross-engine). The semantics are pinned by
  * a driver-side reimplementation BIT-equality gate — same JVM ln on
  * the same doubles — plus ordering, determinism, and conservation
  * laws.
  */
class LmSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def fixture = {
    import spark.implicits._
    // reference slice (src=ref): repetitive clean pattern; eval docs:
    // one reference-like, one OOV gibberish, one too short to score
    Seq(
      (0L, "ref", "the cat sat on the mat and the dog sat on the rug"),
      (1L, "ref", "the dog sat on the mat and the cat sat on the rug"),
      (2L, "ref", "the cat and the dog sat on the mat"),
      (10L, "eval", "the cat sat on the rug"),
      (11L, "eval", "zxq qzx xqz glorp wibble frumious"),
      (12L, "eval", "the")
    ).toDF("doc_id", "src", "text")
  }

  test("training is deterministic and bounds hold; unk count is the leftover mass") {
    val df = fixture
    val lm1 = LanguageModel.trainBigramLm(df, "text", col("src") === "ref",
      vocabSize = 8, maxBigrams = 32)
    val lm2 = LanguageModel.trainBigramLm(df, "text", col("src") === "ref",
      vocabSize = 8, maxBigrams = 32)
    assert(lm1.vocab.toSeq == lm2.vocab.toSeq)
    assert(lm1.bigrams.toSeq == lm2.bigrams.toSeq)
    assert(lm1.vocabSize == 8 && lm1.vocab.length == 9) // top-8 + <unk>
    // total unigram mass is conserved: vocab counts + unk = all tokens
    val totalRef = fixture.filter(col("src") === "ref")
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(lm1.vocab.map(_._2).sum == totalRef)
  }

  test("scores bit-match a driver reimplementation; gibberish scores worse") {
    val df = fixture
    val lm = LanguageModel.trainBigramLm(df, "text", col("src") === "ref",
      vocabSize = 8, maxBigrams = 64)
    val alpha = 0.5
    val scored = LanguageModel.perplexityScore(df, "doc_id", "text", lm, alpha)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    // driver reimplementation, same op order: floor(-1e6·ln p) per
    // pair, integer sum, two IEEE divides
    val inVocab = lm.vocab.iterator.map(_._1).filter(_ != UnkToken).toSet
    val uni = lm.vocab.toMap
    val bi = lm.bigrams.toMap
    val fanout = lm.vocabSize + 1
    def score(text: String): (Long, Option[Double]) = {
      val m = text.split(" ").map(t => if (inVocab(t)) t else UnkToken)
      if (m.length < 2) (0L, None)
      else {
        val s = m.sliding(2).map { case Array(a, b) =>
          val p = (bi.getOrElse((a, b), 0L).toDouble + alpha) /
            (uni(a).toDouble + alpha * fanout)
          math.floor(-1e6 * math.log(p)).toLong
        }.sum
        val n = (m.length - 1).toLong
        (n, Some(s.toDouble / n.toDouble / 1e6))
      }
    }
    Seq(0L -> "the cat sat on the mat and the dog sat on the rug",
        10L -> "the cat sat on the rug",
        11L -> "zxq qzx xqz glorp wibble frumious",
        12L -> "the").foreach { case (id, text) =>
      assert(scored(id) == score(text), s"doc $id")
    }
    // ordering: reference-like eval doc beats OOV gibberish
    assert(scored(10L)._2.get < scored(11L)._2.get,
      "reference-like text must have lower surprise than OOV gibberish")
    // short doc surfaces loudly, never vanishes
    assert(scored(12L) == ((0L, None)))
  }

  test("buckets: conservation, short tag, tercile ordering on the fixture tables") {
    val docs = Tables.documents(spark, Sf)
    val lm = LanguageModel.trainBigramLm(docs, "text", col("lang") === "en",
      vocabSize = 512, maxBigrams = 4096)
    val bucketed = LanguageModel.perplexityBuckets(
      docs, "doc_id", "text", "source", lm)
    val rows = bucketed.collect()
    assert(rows.length == docs.count(), "every doc surfaces exactly once")
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
    assert((byBucket.keySet -- Set("head", "middle", "tail", "short")).isEmpty)
    // every scored bucket member is consistent with its group's cuts:
    // head ≤ middle ≤ tail by construction of the tercile CASE — check
    // via max(head) ≤ min(middle) is NOT implied (cuts differ per
    // group), so check within one group
    val groups = rows.filter(_.getAs[String]("bucket") != "short")
      .groupBy(_.getAs[String]("source"))
    groups.foreach { case (_, g) =>
      def s(b: String) = g.filter(_.getAs[String]("bucket") == b)
        .map(_.getAs[Double]("surprise"))
      if (s("head").nonEmpty && s("tail").nonEmpty)
        assert(s("head").max <= s("tail").min,
          "a head doc must not out-surprise a tail doc within its group")
      if (s("head").nonEmpty && s("middle").nonEmpty)
        assert(s("head").max <= s("middle").min)
      if (s("middle").nonEmpty && s("tail").nonEmpty)
        assert(s("middle").max <= s("tail").min)
    }
    // ~thirds per group among scored docs (percentile cut: head gets
    // at least a quarter, at most half, on any non-degenerate group)
    groups.filter(_._2.length >= 12).foreach { case (src, g) =>
      val h = g.count(_.getAs[String]("bucket") == "head").toDouble / g.length
      assert(h > 0.15 && h < 0.55, s"head fraction $h degenerate for $src")
    }
  }

  test("mooreLewis: single pass bit-matches two perplexityScore runs") {
    import spark.implicits._
    val df = Seq(
      (0L, "in", "the cat sat on the mat and the cat sat on the mat"),
      (1L, "in", "the cat sat on the mat and the dog sat on the mat"),
      (2L, "gen", "stocks fell on the news and bonds rose on the news"),
      (3L, "gen", "stocks rose on the data and bonds fell on the data"),
      (10L, "eval", "the cat sat on the mat"),
      (11L, "eval", "stocks fell on the data"),
      (12L, "eval", "the")
    ).toDF("doc_id", "src", "text")
    val inLm = LanguageModel.trainBigramLm(df, "text", col("src") === "in",
      vocabSize = 16, maxBigrams = 64)
    val genLm = LanguageModel.trainBigramLm(df, "text", col("src") === "gen",
      vocabSize = 16, maxBigrams = 64)
    val ml = LanguageModel.mooreLewis(df, "doc_id", "text", inLm, genLm)
      .collect().map(r => r.getLong(0) -> r).toMap
    val si = LanguageModel.perplexityScore(df, "doc_id", "text", inLm)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val sg = LanguageModel.perplexityScore(df, "doc_id", "text", genLm)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    ml.foreach { case (id, r) =>
      val (i2, g2) = (si(id), sg(id))
      if (i2.isEmpty) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        assert(r.getDouble(2) == i2.get,
          s"doc $id: fused in-surprise must BIT-match the two-pass run")
        assert(r.getDouble(3) == g2.get)
      }
    }
    // domain ordering: the cat doc selects, the stocks doc does not
    assert(ml(10L).getBoolean(5) && ml(10L).getDouble(4) < 0)
    assert(!ml(11L).getBoolean(5) && ml(11L).getDouble(4) > 0)
    // the 1-token doc is unjudgeable: NULL score, selected FALSE, visible
    assert(ml(12L).isNullAt(4) && !ml(12L).getBoolean(5))
    assert(ml.size == 7, "every doc must surface")
  }
}
