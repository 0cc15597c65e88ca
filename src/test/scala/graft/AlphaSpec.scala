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

  test("invisible-transition reduction fuses τ's places (notebook cell 3 analogue)") {
    // a → τ → b: the silent transition and its two places collapse to
    // the direct place ({a},{b})
    val net = Alpha.Net(
      transitions = Set("a", "tau", "b"),
      places = Seq(Alpha.Place(Set("a"), Set("tau")), Alpha.Place(Set("tau"), Set("b"))),
      starts = Set("a"), ends = Set("b"))
    val reduced = Alpha.reduceInvisibles(net, _ == "tau")
    assert(reduced.transitions == Set("a", "b"))
    assert(reduced.places == Seq(Alpha.Place(Set("a"), Set("b"))))
  }

  test("invisible reduction keeps τ when fusion would change choice semantics") {
    // p1 = ({a},{tau,c}) has a SECOND consumer c and p2 = ({tau,d},{b})
    // a second producer d — neither series condition holds, so the
    // reduction must refuse (fusing would let d's token enable paths
    // the original net forbids)
    val net = Alpha.Net(
      transitions = Set("a", "tau", "b", "c", "d"),
      places = Seq(
        Alpha.Place(Set("a"), Set("tau", "c")),
        Alpha.Place(Set("tau", "d"), Set("b"))),
      starts = Set("a"), ends = Set("b"))
    val reduced = Alpha.reduceInvisibles(net, _ == "tau")
    assert(reduced == net)
  }

  test("chained invisibles reduce to fixpoint") {
    // a → τ1 → τ2 → b collapses fully
    val net = Alpha.Net(
      transitions = Set("a", "t1", "t2", "b"),
      places = Seq(
        Alpha.Place(Set("a"), Set("t1")),
        Alpha.Place(Set("t1"), Set("t2")),
        Alpha.Place(Set("t2"), Set("b"))),
      starts = Set("a"), ends = Set("b"))
    val reduced = Alpha.reduceInvisibles(net, _.startsWith("t"))
    assert(reduced.transitions == Set("a", "b"))
    assert(reduced.places == Seq(Alpha.Place(Set("a"), Set("b"))))
  }

  test("implicit-place reduction drops shortcut and duplicate places") {
    // a → b → c with the transitive shortcut ({a},{c}): the chain
    // ({a},{b}) → ({b},{c}) re-derives it, so it goes; the chain stays
    val net = Alpha.Net(
      transitions = Set("a", "b", "c"),
      places = Seq(
        Alpha.Place(Set("a"), Set("b")),
        Alpha.Place(Set("b"), Set("c")),
        Alpha.Place(Set("a"), Set("c")),
        Alpha.Place(Set("a"), Set("b"))), // duplicate
      starts = Set("a"), ends = Set("c"))
    val reduced = Alpha.reduceImplicitPlaces(net)
    assert(reduced.places.toSet == Set(
      Alpha.Place(Set("a"), Set("b")), Alpha.Place(Set("b"), Set("c"))))
  }

  test("implicit-place reduction is a no-op on the textbook L1 net") {
    val traces = Seq(
      Seq("a", "b", "c", "d"), Seq("a", "c", "b", "d"), Seq("a", "e", "d"))
    val net = Alpha.mine(dfgOf(traces), starts = Set("a"), ends = Set("d"))
    val reduced = Alpha.reduceImplicitPlaces(net)
    assert(reduced.places.toSet == net.places.toSet)
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
