package graft

import org.apache.spark.sql.functions._

import graft.llm.{Similarity, Topics}

/** Laws for the clustering-composition layer: the topic-model capstone
  * (clusterAssign + discriminativeTerms) and the simplified-silhouette
  * diagnostic. Both harness queries are rows-only BY CONTRACT (k-means
  * centroids are data-dependent, not SQL-expressible) — these gates
  * are their named evidence (`ContractSpec.rowsOnlyByDesign`).
  */
class TopicsSpec extends SparkSpec {

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  // Two well-separated unit blobs in 4-d: ids 0-19 hug e1, ids 20-39
  // hug e2 (tiny deterministic jitter keeps Lloyd honest — points are
  // not literally identical). Texts give each blob an exclusive
  // vocabulary plus one shared filler term.
  private def blobFixture = {
    val vecs = (0L until 40L).map { i =>
      val j = (i % 5).toFloat * 0.01f
      if (i < 20L) (i, Seq(1.0f, j, 0.0f, 0.0f))
      else (i, Seq(j, 1.0f, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val docs = (0L until 40L).map { i =>
      if (i < 20L) (i, "apple fruit common filler")
      else (i, "rocket space common filler")
    }.toDF("doc_id", "text")
    (docs, vecs)
  }

  test("topic model: planted blobs get exclusive top terms; shared terms never rank first") {
    val (docs, vecs) = blobFixture
    val out = Topics.topicModel(docs, vecs, "doc_id", "text",
        "vec_id", "embedding", nClusters = 2, topTerms = 2, minCount = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getInt(5)))
    val byTopic = out.groupBy(_._1)
    assert(byTopic.size == 2, s"expected 2 topics, got ${byTopic.keySet}")
    // each topic's rank-1 term is one of the planted exclusive words,
    // and the two topics claim DIFFERENT blobs
    val top1 = byTopic.map { case (t, rows) =>
      t -> rows.find(_._4 == 1).get._2
    }
    val exclusive = Set("apple", "fruit", "rocket", "space")
    assert(top1.values.forall(exclusive.contains),
      s"rank-1 terms must be blob-exclusive words: $top1")
    val blobOf = Map("apple" -> 1, "fruit" -> 1, "rocket" -> 2, "space" -> 2)
    assert(top1.values.map(blobOf).toSet.size == 2,
      s"topics must split the two blobs, got $top1")
    // an exclusive term concentrated in half the corpus lifts to ~2e6;
    // the shared fillers sit at ~1e6 and never rank first
    val lifts = out.filter(r => exclusive.contains(r._2)).map(_._3)
    assert(lifts.forall(l => l > 1900000L && l <= 2000000L),
      s"exclusive-term lifts should approach 2e6: ${lifts.toSeq}")
    assert(!out.exists(r => r._2 == "common" && r._4 == 1))
    // deterministic end to end
    val again = Topics.topicModel(docs, vecs, "doc_id", "text",
        "vec_id", "embedding", nClusters = 2, topTerms = 2, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5))).toSet
    assert(again == out.map(r => (r._1, r._2, r._4)).toSet)
  }

  test("cluster quality: separated blobs score high; a forced split of one blob scores lower") {
    val (_, vecs) = blobFixture
    val sep = Similarity.clusterQuality(vecs, "vec_id", "embedding",
        nClusters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sep.map(_._2).sum == 40L, "every vector lands in exactly one cluster")
    assert(sep.forall(_._3 >= 800000L),
      s"well-separated blobs should score near 1e6: ${sep.toSeq}")

    // one tight blob forced into k=2: boundary points sit between the
    // split centroids, so the mean silhouette must drop well below the
    // separated reading
    val oneBlob = (0L until 40L).map { i =>
      val j = (i % 7).toFloat * 0.02f
      (i, Seq(1.0f, j, (i % 3).toFloat * 0.02f, 0.0f))
    }.toDF("vec_id", "embedding")
    val split = Similarity.clusterQuality(oneBlob, "vec_id", "embedding",
        nClusters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(split.map(_._2).sum == 40L)
    val worst = split.map(_._3).min
    assert(worst < 800000L,
      s"a split single blob must expose low silhouette, got ${split.toSeq}")
  }

  test("cluster quality: zero vectors quarantine to -1 with NULL silhouette, never 0/0") {
    val vecs = ((0L until 10L).map(i => (i, Seq(1.0f, (i % 3).toFloat * 0.01f, 0f, 0f))) ++
      (10L until 14L).map(i => (i, Seq(0f, 0f, 1.0f, (i % 2).toFloat * 0.01f))) ++
      Seq((99L, Seq(0f, 0f, 0f, 0f)))).toDF("vec_id", "embedding")
    val rows = Similarity.clusterQuality(vecs, "vec_id", "embedding",
        nClusters = 2).collect()
    val q = rows.find(_.getLong(0) == -1L)
    assert(q.isDefined, "quarantine cell must surface")
    assert(q.get.getLong(1) == 1L && q.get.isNullAt(2),
      "zero-norm row: counted, silhouette NULL (loud, not defaulted)")
    assert(rows.filter(_.getLong(0) >= 0L).forall(!_.isNullAt(2)))
  }
}
