package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Mathematical laws for the PCA tier (`q_pca_project` is rows-only by
  * contract — an eigensolve has no SQL twin — so the operator is held
  * to the properties that DEFINE a principal-component basis instead:
  * orthonormality, descending variance capture, rotation isometry at
  * full rank, exact recovery of a planted low-rank subspace, and unit
  * covariance after whitening).
  */
class PcaSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, Sf)

  test("components are orthonormal with descending non-negative eigenvalues") {
    val (_, comps, eig) = Similarity.pcaTrain(emb, "vec_id", "embedding", k = 8)
    val d = comps.length / 8
    for (a <- 0 until 8; b <- a until 8) {
      var s = 0.0
      for (i <- 0 until d) s += comps(a * d + i) * comps(b * d + i)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-8, s"⟨v$a,v$b⟩ = $s")
    }
    eig.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi >= lo - 1e-12, s"eigenvalues must descend: $hi < $lo")
    }
    assert(eig.forall(_ >= -1e-9), "covariance eigenvalues are non-negative")
  }

  test("full-rank projection is an isometry; top-k captures the eigenvalue mass") {
    val d = emb.select(size(col("embedding"))).head.getInt(0)
    val (_, _, eig) = Similarity.pcaTrain(emb, "vec_id", "embedding", k = d)
    val orig = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS double))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = Similarity.pcaProject(emb, "vec_id", "embedding", k = d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sqd(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(20)
    for (Seq(x, y) <- ids.combinations(2).take(50).toSeq) {
      val (do_, dp) = (sqd(orig(x), orig(y)), sqd(proj(x), proj(y)))
      assert(math.abs(do_ - dp) < 1e-6 * math.max(1.0, do_),
        s"rotation must preserve distances: $do_ vs $dp")
    }
    // per-dimension variance of the projection equals its eigenvalue
    val n = proj.size.toDouble
    for (c <- 0 until math.min(4, d)) {
      val vals = proj.values.map(_(c))
      val mu = vals.sum / n
      val varc = vals.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(varc - eig(c)) < 1e-6 * math.max(1.0, eig(c)),
        s"dim $c variance $varc vs eigenvalue ${eig(c)}")
    }
  }

  test("a planted 2-D subspace is recovered exactly; whitening yields unit covariance") {
    import spark.implicits._
    // 200 points in span{u1, u2} ⊂ R^6 (u1 ⊥ u2), deterministic coeffs
    val u1 = Array(1.0, 1.0, 0.0, 0.0, 1.0, 1.0).map(_ / 2.0)
    val u2 = Array(1.0, -1.0, 1.0, -1.0, 0.0, 0.0).map(_ / 2.0)
    val pts = (0 until 200).map { i =>
      val a = math.sin(i * 0.37) * 3.0
      val b = math.cos(i * 0.59) * 1.5
      (i.toLong, (0 until 6).map(j => (a * u1(j) + b * u2(j)).toFloat).toArray)
    }
    val df = pts.toDF("vec_id", "embedding")
    val (_, _, eig) = Similarity.pcaTrain(df, "vec_id", "embedding", k = 6)
    assert(eig(0) > 1e-3 && eig(1) > 1e-3, "two real directions")
    (2 until 6).foreach(i => assert(math.abs(eig(i)) < 1e-9,
      s"rank-2 data: eigenvalue $i must vanish, got ${eig(i)}"))
    // whitened projection onto the true rank: identity covariance
    val w = Similarity.pcaProject(df, "vec_id", "embedding", k = 2, whiten = true)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = w.length.toDouble
    val mu = Array.tabulate(2)(c => w.map(_(c)).sum / n)
    for (a <- 0 until 2; b <- 0 until 2) {
      val cov = w.map(p => (p(a) - mu(a)) * (p(b) - mu(b))).sum / n
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"whitened cov($a,$b) = $cov")
    }
  }
}
