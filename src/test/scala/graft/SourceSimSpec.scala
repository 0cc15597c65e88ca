package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Laws for the source-centroid domain-similarity matrix: geometry on
  * constructed sources (parallel ≈ 1, orthogonal = 0), the
  * strict-upper-triangle pair contract, count correctness, the
  * embeddingless-doc exclusion, and bit-determinism under
  * repartitioning (the dim-ordered fold contract).
  */
class SourceSimSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    // source A and B share the e0 direction (B = scaled A), C is e1:
    // cos(A,B) ≈ 1, cos(A,C) = cos(B,C) = 0 exactly (axis vectors).
    val docs = Seq(
      (1L, "a", "A"), (2L, "a", "A"),
      (3L, "b", "B"), (4L, "b", "B"), (5L, "b", "B"),
      (6L, "c", "C"),
      (7L, "d", "A") // doc with NO embedding row — must not count
    ).toDF("doc_id", "text", "source")
    val embs = Seq(
      (1L, Seq(1.0f, 0f, 0f)), (2L, Seq(1.0f, 0f, 0f)),
      (3L, Seq(0.5f, 0f, 0f)), (4L, Seq(0.5f, 0f, 0f)), (5L, Seq(0.5f, 0f, 0f)),
      (6L, Seq(0f, 2.0f, 0f))
    ).toDF("vec_id", "embedding")
    (docs, embs)
  }

  test("parallel sources ≈ 1, orthogonal sources = 0, strict upper triangle, counts") {
    val (docs, embs) = fixture()
    val out = Similarity.sourceCentroidSim(docs, embs,
      "doc_id", "source", "vec_id", "embedding").collect()
    assert(out.length == 3, "3 sources -> 3 unordered pairs")
    val m = out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b")) -> r.getAs[Double]("cos")).toMap
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")),
      "pairs are source_a < source_b, no diagonal, no mirror")
    assert(math.abs(m(("A", "B")) - 1.0) < 1e-12, s"parallel: ${m(("A", "B"))}")
    assert(m(("A", "C")) == 0.0 && m(("B", "C")) == 0.0,
      "axis-orthogonal centroids have exactly zero dot")
    val counts = out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b"),
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSet
    // doc 7 (source A, no embedding) is excluded: n_A stays 2
    assert(counts == Set(("A", "B", 2L, 3L), ("A", "C", 2L, 1L),
      ("B", "C", 3L, 1L)))
  }

  test("bit-determinism under repartitioning (dim-ordered folds)") {
    val (docs, embs) = fixture()
    def run(p: Int) = Similarity.sourceCentroidSim(
      docs.repartition(p), embs.repartition(p + 1),
      "doc_id", "source", "vec_id", "embedding")
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))
      .sortBy(t => (t._1, t._2))
    assert(run(1).toSeq == run(7).toSeq,
      "cos must be bit-identical regardless of partitioning")
  }

  test("sf0.001 matrix: one row per source pair, cosines in [-1, 1]") {
    val out = SparkEntry.queries("q_source_sim")(spark, "/root/testdata/sf0.001")
      .collect()
    val srcs = Tables.documents(spark, "/root/testdata/sf0.001")
      .join(Tables.embeddings(spark, "/root/testdata/sf0.001"),
        col("doc_id") === col("vec_id"))
      .select("source").distinct().count()
    assert(out.length == (srcs * (srcs - 1)) / 2)
    out.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos out of range: $c")
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }
}
