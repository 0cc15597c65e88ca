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
}
