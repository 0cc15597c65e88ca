package graft

import org.apache.spark.sql.functions._

import graft.analytics.LabelProp

/** Laws for synchronous label propagation: cluster convergence, seed
  * immutability, the smallest-label tie-break, and loud unreached
  * nodes. (The harness fixture's embeddings are near-isotropic, so
  * propagated labels sit at chance there BY DATA — the oracle checks
  * the mechanics; these gates check the semantics on graphs with
  * actual structure.)
  */
class LabelPropSpec extends SparkSpec {

  test("two rings converge to their seed's label; seeds never change") {
    import spark.implicits._
    // ring 0-9 seeded at node 0 (label 7), ring 10-19 at node 10
    // (label 3); rings are disjoint
    val edges = ((0 until 10).map(i => (i.toLong, ((i + 1) % 10).toLong)) ++
      (0 until 10).map(i => (10L + i, 10L + (i + 1) % 10))).toDF("src", "dst")
    val seeds = (0L until 20L).map(v =>
      (v, if (v == 0L) Some(7) else if (v == 10L) Some(3) else None))
      .toDF("vec_id", "seed")
    val out = LabelProp.propagate(
      LabelProp.symmetrize(edges, "src", "dst"), seeds, "vec_id", "seed",
      iters = 6).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Int]), r.getAs[String]("origin"))).toMap
    // symmetrized ring: 6 rounds reach 6 hops each way — whole ring
    (0L until 10L).foreach(v => assert(out(v)._1.contains(7), s"node $v"))
    (10L until 20L).foreach(v => assert(out(v)._1.contains(3), s"node $v"))
    assert(out(0L)._2 == "seed" && out(10L)._2 == "seed")
    assert(out(1L)._2 == "propagated" && out(19L)._2 == "propagated")
  }

  test("equal votes break toward the smallest label; seeds hold against majority") {
    import spark.implicits._
    // node 2 hears label 9 (from seed 0) and label 4 (from seed 1) —
    // one vote each → takes 4. Seed 3 (label 8) neighbors both seeds
    // but must keep 8.
    val edges = Seq((0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq((0L, Some(9)), (1L, Some(4)), (2L, None), (3L, Some(8)))
      .toDF("vec_id", "seed")
    val out = LabelProp.propagate(
      LabelProp.symmetrize(edges, "src", "dst"), seeds, "vec_id", "seed",
      iters = 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> Option(r.get(1)).map(_.asInstanceOf[Int]))
      .toMap
    assert(out(2L).contains(4), "tie must break to the smallest label")
    assert(out(3L).contains(8), "a seed never flips")
  }

  test("nodes no label can reach surface as unreached, never vanish") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (2L, 3L)).toDF("src", "dst") // 2-3 unlabeled island
    val seeds = Seq((0L, Some(5)), (1L, None), (2L, None), (3L, None))
      .toDF("vec_id", "seed")
    val out = LabelProp.propagate(
      LabelProp.symmetrize(edges, "src", "dst"), seeds, "vec_id", "seed",
      iters = 4).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Int]), Option(r.getAs[String]("origin"))))
      .toMap
    assert(out.size == 4)
    assert(out(1L) == ((Some(5), Some("propagated"))))
    assert(out(2L) == ((None, None)) && out(3L) == ((None, None)),
      "unreached nodes keep null label and null origin — loud, not dropped")
  }

  test("modularity: two clean cliques score 1/4 each, one blob scores 0, split community goes negative") {
    import spark.implicits._
    def und(pairs: (Long, Long)*) =
      LabelProp.symmetrize(pairs.toDF("src", "dst"), "src", "dst")
    // two disjoint triangles, labels = components: per community
    // e_c = 3, d_c = 6, m = 6 → Q_c = 3/6 − (6/12)² = 0.25
    val tri = und((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val labels = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
      .toDF("vec_id", "label")
    val q = LabelProp.modularity(tri, labels, "src", "dst", "vec_id", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(q(0) == ((3L, 3L, 6L, 250000L)) && q(1) == ((3L, 3L, 6L, 250000L)))
    // everything one community: Q = m/m − (2m/2m)² = 0 exactly
    val one = labels.withColumn("label", lit(7))
    val q1 = LabelProp.modularity(tri, one, "src", "dst", "vec_id", "label")
      .collect().map(_.getLong(4))
    assert(q1.toSeq == Seq(0L))
    // a community cut across the two triangles: no internal edges,
    // negative contribution — the diagnostic the metric exists for
    val bad = Seq((1L, 0), (4L, 0), (2L, 1), (3L, 1), (5L, 1), (6L, 1))
      .toDF("vec_id", "label")
    val qb = LabelProp.modularity(tri, bad, "src", "dst", "vec_id", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(qb(0) < 0L, "a cross-cut community must score negative")
  }

  test("bfsHops: path distances, multi-source min, unreachable NULL") {
    import spark.implicits._
    def sym(pairs: (Long, Long)*) = LabelProp.symmetrize(
      pairs.toDF("src", "dst"), "src", "dst")
    // path 1-2-3-4 plus a separate component 8-9
    val g = sym((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L))
    def seeds(ids: Long*) = ids.toDF("id")
    val one = LabelProp.bfsHops(g, "src", "dst", seeds(1L), "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      8L -> -1L, 9L -> -1L),
      s"single-source hops wrong: $one")
    // multi-source takes the minimum over seeds
    val multi = LabelProp.bfsHops(g, "src", "dst", seeds(1L, 4L), "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(multi == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      8L -> -1L, 9L -> -1L))
    // the maxIters radius is a contract: hops past it stay NULL
    val capped = LabelProp.bfsHops(g, "src", "dst", seeds(1L), "id",
        maxIters = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(capped(3L) == 2L && capped(4L) == -1L,
      s"radius cap must leave far nodes NULL: $capped")
    intercept[IllegalArgumentException] {
      LabelProp.bfsHops(g, "src", "dst", seeds(1L), "id", maxIters = 0)
    }
  }

  test("bfsHops on a DIRECTED edge list: sink-only nodes surface, edge-less seeds keep hop 0") {
    import spark.implicits._
    // directed chain 1→2→3 plus sink-only 9 (appears only as dst) and
    // seed 7 with no edges at all (r9 advisor: neither may vanish)
    val g = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val out = LabelProp.bfsHops(g, "src", "dst", Seq(1L, 7L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      7L -> 0L, 8L -> -1L, 9L -> -1L),
      s"directed universe wrong: $out")
  }

  test("linkPredict: wedges, Jaccard, existing-edge and threshold exclusion") {
    import spark.implicits._
    def sym(pairs: (Long, Long)*) = LabelProp.symmetrize(
      pairs.toDF("src", "dst"), "src", "dst")
    // square 1-2-3-4-1: (1,3) and (2,4) are the distance-2 pairs,
    // each with BOTH remaining corners as common neighbors →
    // jaccard = 2/(2+2-2) = 1e6 exactly
    val square = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val out = LabelProp.linkPredict(square, "src", "dst", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(out == Map((1L, 3L) -> ((2L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L))))
    // a triangle has no non-edge distance-2 pairs: every wedge closes
    val tri = sym((1L, 2L), (2L, 3L), (1L, 3L))
    assert(LabelProp.linkPredict(tri, "src", "dst", 1L).collect().isEmpty,
      "existing edges must never be predicted")
    // path 1-2-3: one wedge, one common neighbor — the minCommon
    // valve thins it out at 2, keeps it at 1 (jaccard 1/(1+1-1))
    val path = sym((1L, 2L), (2L, 3L))
    assert(LabelProp.linkPredict(path, "src", "dst", 2L).collect().isEmpty)
    val p1 = LabelProp.linkPredict(path, "src", "dst", 1L).collect()
    assert(p1.length == 1 && p1.head.getLong(2) == 1L &&
      p1.head.getLong(5) == 1000000L)
    intercept[IllegalArgumentException] {
      LabelProp.linkPredict(path, "src", "dst", 0L)
    }
  }
}
