package graft

import graft.llm.WordVectors

/** Laws for the PPMI-SVD word-embedding trainer. `q_word_vectors` is
  * rows-only BY CONTRACT (ln + the Jacobi eigensolve are not
  * SQL-expressible); these gates are its named evidence.
  */
class WordVectorsSpec extends SparkSpec {

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private def vectorsOf(out: Array[(String, Int, Long)]): Map[String, Array[Double]] =
    out.groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(_._2).map(_._3.toDouble / 1e6)
    }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / math.max(na * nb, 1e-300)
  }

  test("identical-context synonyms get near-identical vectors; disjoint-context words do not") {
    // aaa and bbb share EXACTLY the same contexts (likes, food); zzz
    // lives in a disjoint context world. Identical PPMI rows force
    // identical embedding rows (eigenvectors of nonzero eigenvalue are
    // orthogonal to e_aaa − e_bbb, which the symmetric matrix kills).
    val docs = ((1 to 20).map(i => (i.toLong, "aaa likes food")) ++
      (21 to 40).map(i => (i.toLong, "bbb likes food")) ++
      (41 to 60).map(i => (i.toLong, "zzz drives car")))
      .toDF("doc_id", "text")
    val out = WordVectors.ppmiSvd(docs, "text", vocabSize = 8,
        window = 2, dims = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val vecs = vectorsOf(out)
    assert(vecs.keySet == Set("aaa", "bbb", "zzz", "likes", "food", "drives", "car"))
    assert(vecs.values.forall(_.length == 4), "every term gets exactly dims values")
    val synCos = cos(vecs("aaa"), vecs("bbb"))
    assert(synCos > 0.999, s"identical-context synonyms must align: cos=$synCos")
    val farCos = cos(vecs("aaa"), vecs("zzz"))
    assert(farCos < 0.8, s"disjoint-context words must not align: cos=$farCos")
    // micro-unit equality is the strongest form of the synonym law
    val aRows = out.filter(_._1 == "aaa").sortBy(_._2).map(_._3)
    val bRows = out.filter(_._1 == "bbb").sortBy(_._2).map(_._3)
    assert(aRows.zip(bRows).forall { case (x, y) => math.abs(x - y) <= 1 },
      s"synonym micro-units drift: ${aRows.toSeq} vs ${bRows.toSeq}")
  }

  test("deterministic across runs; vocab cap and guards are loud") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5}"))
      .toDF("doc_id", "text")
    val a = WordVectors.ppmiSvd(docs, "text", 5, 2, 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val b = WordVectors.ppmiSvd(docs, "text", 5, 2, 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "two identical trains must emit identical micro-units")
    assert(a.size == 15, "V*dims rows")
    intercept[IllegalArgumentException] {
      WordVectors.ppmiSvd(docs, "text", 1000, 2, 3)
    }
    intercept[IllegalArgumentException] {
      WordVectors.ppmiSvd(docs, "text", 5, 0, 3)
    }
    intercept[IllegalArgumentException] {
      WordVectors.ppmiSvd(docs, "text", 5, 2, 6)
    }
  }

  test("doc embeddings: exact integer means, OOV docs loud, map-only plan, store round-trip") {
    val vectors = Seq(
      ("alpha", 0, 1000000L), ("alpha", 1, -2000000L),
      ("beta", 0, 3000000L), ("beta", 1, 5000001L)).toDF("term", "dim", "value_micro")
    val docs = Seq(
      (1L, "alpha"),                 // exactly alpha's vector
      (2L, "alpha beta"),            // elementwise mean, truncating div
      (3L, "unknown words only"),    // loud dim=-1 row
      (4L, "alpha unknown alpha")    // OOV token skipped, n_known = 2
    ).toDF("doc_id", "text")
    val out = WordVectors.docEmbeddings(docs, "doc_id", "text", vectors)
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).toSet == Set((1L, 0, Some(1000000L), 1L), (1L, 1, Some(-2000000L), 1L)))
    // (1e6+3e6) div 2 = 2e6; (-2e6+5000001) div 2 = 3000001 div 2 = 1500000
    assert(byDoc(2L).toSet == Set((2L, 0, Some(2000000L), 2L), (2L, 1, Some(1500000L), 2L)))
    assert(byDoc(3L).toSet == Set((3L, -1, None, 0L)),
      "OOV-only doc: one loud row, never dropped, never a div error")
    assert(byDoc(4L).toSet == Set((4L, 0, Some(1000000L), 2L), (4L, 1, Some(-2000000L), 2L)))
    // the operator is row-local after the model collect: no Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"docEmbeddings must be map-only:\n$plan")
    // ragged vector tables refuse loudly
    intercept[IllegalArgumentException] {
      WordVectors.docEmbeddings(docs, "doc_id", "text",
        Seq(("alpha", 0, 1L), ("beta", 0, 1L), ("beta", 1, 2L))
          .toDF("term", "dim", "value_micro"))
    }
    // ModelStore round-trip is bit-equal (micro-units are longs)
    val trained = vectors.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val path = java.nio.file.Files.createTempDirectory("wv").toString + "/wv"
    graft.api.ModelStore.saveWordVectors(spark, trained, path)
    val loaded = graft.api.ModelStore.loadWordVectors(spark, path)
    assert(loaded.toSet == trained.toSet)
    val viaStore = WordVectors.docEmbeddings(docs, "doc_id", "text",
      loaded.toDF("term", "dim", "value_micro"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet
    assert(viaStore == got.toSet, "store-loaded model embeds bit-equal")
  }
}
