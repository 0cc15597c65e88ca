package graft

import org.apache.spark.sql.functions._

import graft.api.ModelStore
import graft.llm.{Bpe, LanguageModel, Similarity, TextOps}

/** Round-trip laws for the artifact store: every trained artifact
  * survives save/load BIT-exactly (doubles included — parquet is
  * IEEE-754), and scoring with a loaded artifact equals scoring with
  * the freshly trained one row-for-row.
  */
class ModelStoreSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/artifact"

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("BPE merges round-trip and re-encode identically") {
    val merges = Bpe.train(docs, "text", numMerges = 64, maxVocab = 512)
    val path = tmp("graft_bpe_")
    ModelStore.saveBpe(spark, merges, path)
    val loaded = ModelStore.loadBpe(spark, path)
    assert(loaded == merges, "merge table must round-trip in order")
    def enc(ms: Seq[(String, String)]) = docs.limit(20)
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("t"))
      .select(col("doc_id"), col("t"), Bpe.encode(col("t"), ms).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).toSeq)).sortBy(t => (t._1, t._2)).toSeq
    assert(enc(loaded) == enc(merges))
  }

  test("bigram LM round-trips bit-exactly and re-scores identically") {
    val lm = LanguageModel.trainBigramLm(docs, "text",
      col("lang") === "en", vocabSize = 256, maxBigrams = 1024)
    val path = tmp("graft_lm_")
    ModelStore.saveBigramLm(spark, lm, path)
    val loaded = ModelStore.loadBigramLm(spark, path)
    assert(loaded.vocab.toSeq == lm.vocab.toSeq)
    assert(loaded.bigrams.toSeq == lm.bigrams.toSeq)
    assert(loaded.vocabSize == lm.vocabSize)
    def score(m: LanguageModel.BigramLm) =
      LanguageModel.perplexityScore(docs, "doc_id", "text", m)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_bigrams"),
          if (r.isNullAt(r.fieldIndex("surprise"))) None
          else Some(java.lang.Double.doubleToLongBits(
            r.getAs[Double]("surprise"))))).sortBy(_._1).toSeq
    assert(score(loaded) == score(lm), "loaded LM must score bit-equal")
  }

  test("PCA basis round-trips bit-exactly and re-projects identically") {
    val (mean, comps, eig) = Similarity.pcaTrain(embs, "vec_id", "embedding", k = 4)
    val path = tmp("graft_pca_")
    ModelStore.savePca(spark, mean, comps, eig, path)
    val (m2, c2, e2) = ModelStore.loadPca(spark, path)
    assert(m2.toSeq == mean.toSeq && c2.toSeq == comps.toSeq && e2.toSeq == eig.toSeq,
      "basis doubles must round-trip bit-exactly")
    def proj(mm: Array[Double], cc: Array[Double], ee: Array[Double]) =
      Similarity.pcaProjectWith(embs, "vec_id", "embedding", mm, cc, ee,
          whiten = true)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)))
        .sortBy(_._1).toSeq
    assert(proj(m2, c2, e2) == proj(mean, comps, eig),
      "loaded basis must project bit-equal")
  }

  test("quality scorer round-trips bit-exactly and re-scores identically") {
    val (w, b) = TextOps.trainQualityScorerWeak(docs, "doc_id", "text",
      Seq("the", "a", "of", "and", "is", "to"), dims = 128, iters = 50,
      trainSample = 64)
    val path = tmp("graft_q_")
    ModelStore.saveQualityScorer(spark, w, b, path)
    val (w2, b2) = ModelStore.loadQualityScorer(spark, path)
    assert(w2.toSeq == w.toSeq && b2 == b)
    def score(ww: Array[Double], bb: Double) =
      TextOps.qualityScoreLearned(docs, "doc_id", "text", ww, bb)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("q_score"))))
        .sortBy(_._1).toSeq
    assert(score(w2, b2) == score(w, b))
  }

  test("malformed artifacts fail loudly") {
    val path = tmp("graft_bad_")
    ModelStore.saveQualityScorer(spark, Array(1.0, 2.0), 0.5, path)
    intercept[IllegalArgumentException] {
      ModelStore.loadPca(spark, path)
    }
    intercept[IllegalArgumentException] {
      ModelStore.loadBigramLm(spark, path)
    }
  }

  test("IVF centroids round-trip bit-exactly and searches agree") {
    val trained = Similarity.ivfTrain(embs, "vec_id", "embedding",
      nClusters = 8, trainSample = 128)
    assert(trained.nonEmpty)
    val (cent, kEff) = trained.get
    val path = tmp("graft_ivf_")
    ModelStore.saveIvf(spark, cent, kEff, path)
    val (c2, k2) = ModelStore.loadIvf(spark, path)
    assert(c2.toSeq == cent.toSeq && k2 == kEff)
    def search(cc: Array[Double], kk: Int) =
      Similarity.ivfTopKWith(embs, "vec_id", "embedding",
          col("vec_id") % 50 === 0, k = 5, cc, kk, nProbe = 4)
        .collect().map(r => (r.getAs[Long]("probe_id"),
          r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))
        .sortBy(t => (t._1, t._3)).toSeq
    assert(search(c2, k2) == search(cent, kEff),
      "a loaded index must search bit-equal")
  }
}
