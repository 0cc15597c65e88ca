package graft

import org.apache.spark.sql.functions._

import graft.analytics.Triangles
import graft.llm.Similarity

/** Laws for the Schank–Wagner triangle count: textbook graphs with
  * hand-computable answers, input-form invariance (the orientation
  * must collapse directed/duplicated kNN output), and partitioning
  * determinism on the real fixture graph.
  */
class TrianglesSpec extends SparkSpec {

  private def asMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("ring of 6: degree 2 everywhere, zero triangles, zero coefficient") {
    import spark.implicits._
    val edges = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong))
      .toDF("a", "b")
    val out = Triangles.localTriangles(edges, "a", "b").collect()
    assert(out.length == 6)
    assert(out.forall(r =>
      r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("K5: every node in C(4,2)=6 triangles, coefficient exactly 1e6") {
    import spark.implicits._
    val edges = (for { i <- 0 until 5; j <- 0 until 5 if i < j }
      yield (i.toLong, j.toLong)).toDF("a", "b")
    val out = Triangles.localTriangles(edges, "a", "b").collect()
    assert(out.length == 5)
    assert(out.forall(r =>
      r.getLong(1) == 4L && r.getLong(2) == 6L && r.getLong(3) == 1000000L))
  }

  test("K4 plus pendant: pendant surfaces loud with zeros, hub's open wedges dilute its coefficient") {
    import spark.implicits._
    val k4 = for { i <- 0 until 4; j <- 0 until 4 if i < j }
      yield (i.toLong, j.toLong)
    val m = asMap(Triangles.localTriangles(
      (k4 :+ ((3L, 9L))).toDF("a", "b"), "a", "b").collect())
    assert(m(9L) == ((1L, 0L, 0L)), "degree-1 pendant: zero triangles, never dropped")
    assert(m(0L) == ((3L, 3L, 1000000L)), "pure K4 member: closed neighborhood")
    assert(m(3L) == ((4L, 3L, 500000L)), "hub: 2*3*1e6 div (4*3)")
  }

  test("input-form invariance: reversed and duplicated directed edges count identically") {
    import spark.implicits._
    val base = for { i <- 0 until 4; j <- 0 until 4 if i < j }
      yield (i.toLong, j.toLong)
    val messy = (base ++ base.map(_.swap) ++ base).toDF("a", "b")
    val clean = base.toDF("a", "b")
    assert(Triangles.localTriangles(messy, "a", "b").collect().toSet ==
      Triangles.localTriangles(clean, "a", "b").collect().toSet)
  }

  test("partitioning determinism on the fixture kNN graph") {
    val edges = Similarity.knnGraph(
        Tables.embeddings(spark, "/root/testdata/sf0.001"),
        "vec_id", "embedding", k = 3)
      .select(col("src"), col("dst"))
    val a = Triangles.localTriangles(edges, "src", "dst").collect().toSet
    val b = Triangles.localTriangles(edges.repartition(7), "src", "dst")
      .collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
