package graft

import graft.analytics.Alpha

/** Alpha-miner-lite against the classic textbook log
  * L1 = [⟨a,b,c,d⟩³, ⟨a,c,b,d⟩², ⟨a,e,d⟩]: b and c are parallel, e is
  * the bypass, and the discovered maximal places are
  * ({a},{b,e}), ({a},{c,e}), ({b,e},{d}), ({c,e},{d}).
  */
class AlphaSpec extends SparkSpec {

  private def dfgOf(traces: Seq[Seq[String]]): Seq[(String, String)] =
    traces.flatMap(t => t.zip(t.tail)).distinct

  test("classic L1 log yields the textbook places") {
    val traces = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a", "c", "b", "d"),
      Seq("a", "e", "d"))
    val net = Alpha.mine(dfgOf(traces), starts = Set("a"), ends = Set("d"))
    val places = net.places.map(p => (p.in, p.out)).toSet
    assert(places == Set(
      (Set("a"), Set("b", "e")),
      (Set("a"), Set("c", "e")),
      (Set("b", "e"), Set("d")),
      (Set("c", "e"), Set("d"))))
    assert(net.transitions == Set("a", "b", "c", "d", "e"))
  }

  test("pure sequence collapses to chain places") {
    val net = Alpha.mine(dfgOf(Seq(Seq("x", "y", "z"))), Set("x"), Set("z"))
    assert(net.places.map(p => (p.in, p.out)).toSet ==
      Set((Set("x"), Set("y")), (Set("y"), Set("z"))))
  }

  test("alphabet guard refuses exponential inputs") {
    val big = (1 to 20).map(i => (s"t$i", s"t${i + 1}"))
    intercept[IllegalArgumentException](Alpha.mine(big, Set("t1"), Set("t21")))
  }

  test("footprint over a Spark DFG frame matches relations") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("activity", StringType), StructField("next_activity", StringType),
      StructField("n", LongType)))
    val edges = spark.createDataFrame(Seq(
      Row("a", "b", 3L), Row("b", "c", 2L), Row("c", "b", 1L)).asJava, schema)
    val fp = graft.analytics.Dfg.footprint(edges)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(fp == Map(
      ("a", "b") -> "causal",
      ("b", "c") -> "parallel",
      ("c", "b") -> "parallel"))
  }
}
