package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Laws for the orthogonal Procrustes alignment (tolerances at the
  * Jacobi convergence level — off-mass 1e-12 of the diagonal leaves
  * ~1e-5 in W's components, which alignment quality is insensitive
  * to): recovery of a
  * planted rotation, orthogonality of the trained map, and the
  * geometry-preservation property that separates a rotation from a
  * general least-squares fit.
  */
class ProcrustesSpec extends SparkSpec {

  private val D = 8

  // a planted orthogonal map: signed reverse permutation
  private def rot(x: Array[Double]): Array[Double] =
    Array.tabulate(D)(i => (if (i % 2 == 0) 1.0 else -1.0) * x(D - 1 - i))

  // full-rank fixture: a deterministic hash per (i, d). A sinusoidal
  // fixture sin(a·i + b·d) secretly spans only 3 dimensions
  // (angle-addition) and leaves W unconstrained on the 5-dim null
  // space — caught when recovery "failed" on a rank-3 anchor set.
  private def mkVecs(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      (i.toLong, Seq.tabulate(D) { d =>
        val h = (i * 1000003L + d * 7919L + 17L) * 2654435761L
        ((math.abs(h) % 2000L) - 1000L) / 500.0
      })
    }

  test("planted signed-permutation rotation is recovered; W is orthogonal") {
    import spark.implicits._
    val pairs = mkVecs(64).map { case (id, x) =>
      (id, x, rot(x.toArray).toSeq)
    }.toDF("id", "x", "y")
    val w = Similarity.procrustesTrain(pairs.select("x", "y"), "x", "y")
    // the true W maps x -> y: row i of W = s_i * e_{D-1-i}
    for (i <- 0 until D; j <- 0 until D) {
      val want = if (j == D - 1 - i) (if (i % 2 == 0) 1.0 else -1.0) else 0.0
      assert(math.abs(w(i * D + j) - want) < 1e-4,
        s"W($i,$j) = ${w(i * D + j)}, want $want")
    }
    // orthogonality: WᵀW = I
    for (i <- 0 until D; j <- 0 until D) {
      var s = 0.0
      for (r <- 0 until D) s += w(r * D + i) * w(r * D + j)
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-4,
        s"WᵀW($i,$j) = $s")
    }
  }

  test("apply aligns every vector onto its target; pairwise geometry is preserved") {
    import spark.implicits._
    val base = mkVecs(32)
    val pairs = base.map { case (id, x) => (id, x, rot(x.toArray).toSeq) }
      .toDF("id", "x", "y")
    val w = Similarity.procrustesTrain(pairs.select("x", "y"), "x", "y")
    val aligned = Similarity.procrustesApply(pairs, "id", "x", w)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val tgt = base.map { case (id, x) => id -> rot(x.toArray) }.toMap
    for ((id, a) <- aligned; i <- 0 until D)
      assert(math.abs(a(i) - tgt(id)(i)) < 1e-3,
        s"vec $id dim $i: ${a(i)} vs ${tgt(id)(i)}")
    // a rotation preserves ALL pairwise dot products
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (p, q) => p * q }.sum
    val xs = base.map { case (id, x) => id -> x.toArray }.toMap
    for (i <- 0L until 5L; j <- (i + 1) until 6L)
      assert(math.abs(dot(aligned(i), aligned(j)) - dot(xs(i), xs(j))) < 1e-3,
        s"pairwise geometry moved for ($i, $j)")
  }

  test("noisy anchors: recovery degrades gracefully, map stays orthogonal; empty input is loud") {
    import spark.implicits._
    val pairs = mkVecs(64).zipWithIndex.map { case ((id, x), i) =>
      val y = rot(x.toArray).zipWithIndex.map { case (v, d) =>
        v + 0.01 * math.cos(i * 1.7 + d) }
      (id, x, y.toSeq)
    }.toDF("id", "x", "y")
    val w = Similarity.procrustesTrain(pairs.select("x", "y"), "x", "y")
    for (i <- 0 until D; j <- 0 until D) {
      var s = 0.0
      for (r <- 0 until D) s += w(r * D + i) * w(r * D + j)
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-4,
        "W must stay orthogonal under noise — that is the constraint")
    }
    val want = Array.tabulate(D, D)((i, j) =>
      if (j == D - 1 - i) (if (i % 2 == 0) 1.0 else -1.0) else 0.0)
    val maxErr = (for (i <- 0 until D; j <- 0 until D)
      yield math.abs(w(i * D + j) - want(i)(j))).max
    assert(maxErr < 0.05, s"noisy recovery drifted too far: $maxErr")
    intercept[IllegalArgumentException] {
      Similarity.procrustesTrain(
        Seq.empty[(Seq[Double], Seq[Double])].toDF("x", "y"), "x", "y")
    }
  }
}
