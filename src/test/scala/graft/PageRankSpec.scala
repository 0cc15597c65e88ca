package graft

import org.apache.spark.sql.functions._

import graft.analytics.PageRank

/** Laws for the integer PageRank: symmetry, centrality ordering,
  * mass conservation up to the documented floor leak, determinism,
  * and the top-N rank contract.
  */
class PageRankSpec extends SparkSpec {

  test("directed cycle: perfect symmetry gives identical masses summing to ~1e12") {
    import spark.implicits._
    val n = 10
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val pr = PageRank.pageRank(edges, "src", "dst", iters = 10).collect()
    assert(pr.length == n)
    val masses = pr.map(_.getAs[Long]("pr_pico")).distinct
    assert(masses.length == 1, s"cycle nodes must tie exactly, got ${masses.toSeq}")
    val total = pr.map(_.getAs[Long]("pr_pico")).sum
    // floor leak: ≤ 1 pico-unit per (edge + base) per iteration
    assert(total <= PageRank.MassUnit)
    assert(total >= PageRank.MassUnit - 10L * (2 * n) - n)
  }

  test("hub-and-spoke: the hub out-ranks every leaf; ranks are (mass desc, id asc)") {
    import spark.implicits._
    // leaves 1..9 all point at hub 0; the hub spreads back over all
    // leaves (no dangling nodes — the kNN-graph contract this operator
    // rides). The star is bipartite, so mass oscillates hub↔leaves
    // with amplitude ~0.85² per round trip: 30 iterations put the
    // residual well under the hub-leaf gap.
    val edges = ((1 to 9).map(i => (i.toLong, 0L)) ++
      (1 to 9).map(i => (0L, i.toLong))).toDF("src", "dst")
    val pr = PageRank.pageRank(edges, "src", "dst", iters = 30).collect()
    val byId = pr.map(r => r.getAs[Long]("src") ->
      (r.getAs[Long]("pr_pico"), r.getAs[Int]("rank"))).toMap
    assert(byId(0L)._2 == 1, s"hub must rank first, got $byId")
    assert((1L to 9L).forall(l => byId(0L)._1 > byId(l)._1))
    // leaves are symmetric: identical masses, ranks 2..10 by id
    val tail = (1L to 9L).map(byId).map(_._1).distinct
    assert(tail.length == 1)
    assert((1L to 9L).map(byId).map(_._2).toSeq == (2 to 10))
  }

  test("curriculum layout: one row per vector, Weyl shards, centrality-desc positions") {
    val rows = SparkEntry.queries("q_curriculum")(spark, "/root/testdata/sf0.001")
      .collect()
    val nVecs = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(rows.length == nVecs, "every vector gets exactly one curriculum slot")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("shard") == (((id % 65536L) * 40503L) % 65536L % 8L).toInt)
    }
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, g) =>
      val byPos = g.sortBy(_.getAs[Int]("pos"))
      assert(byPos.map(_.getAs[Int]("pos")).toSeq == (1 to g.length))
      val order = byPos.map(r => (r.getAs[Long]("pr_pico"), r.getAs[Long]("doc_id")))
      assert(order.sliding(2).forall { case Array((m1, d1), (m2, d2)) =>
        m1 > m2 || (m1 == m2 && d1 < d2) }, "positions must follow (pr desc, id asc)")
    }
  }

  test("deterministic across runs and partitionings; topN cuts after full fixpoint") {
    import spark.implicits._
    val edges = (0 until 40).flatMap { i =>
      Seq((i.toLong, ((i + 7) % 40).toLong), (i.toLong, ((i * 3 + 1) % 40).toLong))
    }.filter { case (a, b) => a != b }.toDF("src", "dst")
    val full = PageRank.pageRank(edges, "src", "dst", iters = 8).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("pr_pico"), r.getAs[Int]("rank")))
    val again = PageRank.pageRank(edges.repartition(7), "src", "dst", iters = 8)
      .collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("pr_pico"), r.getAs[Int]("rank")))
    assert(full.sortBy(_._3).toSeq == again.sortBy(_._3).toSeq)
    val top5 = PageRank.pageRank(edges, "src", "dst", iters = 8, topN = 5)
      .collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("pr_pico"), r.getAs[Int]("rank")))
    assert(top5.sortBy(_._3).toSeq == full.sortBy(_._3).take(5).toSeq,
      "topN must be the prefix of the full ranking, not a re-converged fixpoint")
  }
}
