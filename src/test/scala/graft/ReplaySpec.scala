package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.{Inductive, Replay}
import graft.functions.TokenReplay

/** Token-replay laws: hand-computed produced/consumed/missing/remaining
  * on the textbook nets (sequence, xor, and, loop), agreement with
  * `Inductive.accepts` on both fitting and broken traces, the
  * never-stall contract, and the distributed per-variant wrapper.
  */
class ReplaySpec extends SparkSpec {

  import Inductive._

  private def replay(tree: Tree, trace: String*) = {
    val net = toPetriNet(tree)
    TokenReplay.replay(TokenReplay.parse(Replay.serialize(net)),
      trace.toIndexedSeq)
  }

  test("sequence net: perfect fit and the three textbook degradations") {
    val t = Sequence(List(Leaf("a"), Leaf("b")))
    // a,b: every token produced is consumed
    assert(replay(t, "a", "b") == ((3L, 3L, 0L, 0L, 0L)))
    // a only: sink token missing at the end, mid token remains
    assert(replay(t, "a") == ((2L, 2L, 1L, 1L, 0L)))
    // b only: mid token conjured (missing), source token remains
    assert(replay(t, "b") == ((2L, 2L, 1L, 1L, 0L)))
    // unknown activities consume nothing and are counted
    val (p, c, m, r, u) = replay(t, "z", "z")
    assert((p, c, m, r, u) == ((1L, 1L, 1L, 1L, 2L)))
  }

  test("xor net: chosen branch fits; firing BOTH branches is penalized") {
    val t = Xor(List(Leaf("a"), Leaf("b")))
    assert(replay(t, "a") == ((2L, 2L, 0L, 0L, 0L)))
    assert(replay(t, "b") == ((2L, 2L, 0L, 0L, 0L)))
    val (p, c, m, r, _) = replay(t, "a", "b")
    assert(m == 1L && r == 1L, "the second branch conjures its source " +
      "token and strands a sink token")
    assert(p == 3L && c == 3L)
  }

  test("and / loop nets: τ-path search makes silent routing free") {
    val and = And(List(Leaf("a"), Leaf("b")))
    for (tr <- Seq(Seq("a", "b"), Seq("b", "a"))) {
      val (_, _, m, r, u) = replay(and, tr: _*)
      assert((m, r, u) == ((0L, 0L, 0L)), s"AND order $tr must fit")
    }
    val loop = Loop(Leaf("a"), Leaf("b"))
    for (tr <- Seq(Seq("a"), Seq("a", "b", "a"), Seq("a", "b", "a", "b", "a"))) {
      val (_, _, m, r, u) = replay(loop, tr: _*)
      assert((m, r, u) == ((0L, 0L, 0L)), s"loop unrolling $tr must fit")
    }
    // leaving the loop after the redo (a,b) strands the body-entry token
    val (_, _, m2, r2, _) = replay(loop, "a", "b")
    assert(m2 == 1L && r2 == 1L)
  }

  test("fits agrees with accepts on every variant of a mined textbook log") {
    // the L1-style log: a,b,d / a,c,d / a,b,b,d (loop on b)
    val traces = Seq(Seq("a", "b", "d"), Seq("a", "c", "d"),
      Seq("a", "b", "b", "d"), Seq("a", "d"), Seq("b", "a", "d"))
    val edges = traces.flatMap(tr => tr.zip(tr.tail)).distinct
    val net = toPetriNet(mine(edges, starts = Set("a", "b"), ends = Set("d")))
    val parsed = TokenReplay.parse(Replay.serialize(net))
    traces.foreach { tr =>
      val (_, _, m, r, u) = TokenReplay.replay(parsed, tr.toIndexedSeq)
      val fits = m == 0L && r == 0L && u == 0L
      assert(fits == accepts(net, tr),
        s"replay fits=$fits but accepts=${accepts(net, tr)} on $tr")
    }
  }

  test("serialize: duplicate labels and reserved separator fail loudly") {
    val dup = PetriNet(Set("source", "sink"),
      Map("t1" -> Some("a"), "t2" -> Some("a")),
      Set(("source", "t1"), ("t1", "sink"), ("source", "t2"), ("t2", "sink")),
      "source", "sink")
    intercept[IllegalArgumentException] { Replay.serialize(dup) }
    val bad = PetriNet(Set("source", "sink"),
      Map("t1" -> Some("ab")),
      Set(("source", "t1"), ("t1", "sink")), "source", "sink")
    intercept[IllegalArgumentException] { Replay.serialize(bad) }
  }

  test("distributed wrapper: one row per variant, case counts, fitness order") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val net = toPetriNet(Sequence(List(Leaf("a"), Leaf("b"))))
    // two conforming cases (same variant) and one broken case
    val df = Seq(
      ("c1", "a", ts("2024-01-01 10:00:00"), 1L),
      ("c1", "b", ts("2024-01-01 10:01:00"), 2L),
      ("c2", "a", ts("2024-01-01 11:00:00"), 3L),
      ("c2", "b", ts("2024-01-01 11:01:00"), 4L),
      ("c3", "b", ts("2024-01-01 12:00:00"), 5L))
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Replay.tokenReplay(df, "case_id", "activity", "ts", "event_id", net)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(8), r.getLong(9)))).toMap
    assert(out.size == 2)
    assert(out("a->b") == ((2L, 2L, true, 1000000L)))
    val (n3, e3, fits3, f3) = out("b")
    assert(n3 == 1L && e3 == 1L && !fits3 && f3 == 500000L,
      "the broken variant scores (2-1)/2 + (2-1)/2")
  }

  private def alignOn(tree: Inductive.Tree, trace: String*) = {
    val net = Inductive.toPetriNet(tree)
    graft.functions.Alignment.align(
      TokenReplay.parse(Replay.serialize(net)), trace.toIndexedSeq)
  }

  test("alignments: textbook costs on sequence, xor, and, loop nets") {
    val seqN = Sequence(List(Leaf("a"), Leaf("b"), Leaf("c")))
    assert(alignOn(seqN, "a", "b", "c") == ((0L, 0L, 0L, 3L)))
    // skipping b: ONE model move, both others synchronize
    assert(alignOn(seqN, "a", "c") == ((1L, 0L, 1L, 2L)))
    // inserting noise: ONE log move
    assert(alignOn(seqN, "a", "b", "x", "c") == ((1L, 1L, 0L, 3L)))
    // empty trace: the full model path is model moves
    assert(alignOn(seqN) == ((3L, 0L, 3L, 0L)))
    val xor = Xor(List(Leaf("a"), Leaf("b")))
    assert(alignOn(xor, "a")._1 == 0L)
    // both branches: one synchronizes, the other is a log move
    assert(alignOn(xor, "a", "b") == ((1L, 1L, 0L, 1L)))
    val and = And(List(Leaf("a"), Leaf("b")))
    assert(alignOn(and, "b", "a")._1 == 0L, "AND order must align free")
    val loop = Loop(Leaf("a"), Leaf("b"))
    assert(alignOn(loop, "a", "b", "a", "b", "a")._1 == 0L)
    // OOV activity can only be a log move — never a crash
    assert(alignOn(seqN, "a", "zz", "b", "c") == ((1L, 1L, 0L, 3L)))
  }

  test("alignments: cost 0 ⟺ accepts, and cost ≤ worst on every variant") {
    val traces = Seq(Seq("a", "b", "d"), Seq("a", "c", "d"),
      Seq("a", "b", "b", "d"), Seq("a", "d"), Seq("b", "a", "d"),
      Seq("d"), Seq("a", "b", "c", "d"))
    val edges = traces.flatMap(tr => tr.zip(tr.tail)).distinct
    val tree = mine(edges, starts = Set("a", "b"), ends = Set("d"))
    val net = toPetriNet(tree)
    val parsed = TokenReplay.parse(Replay.serialize(net))
    val empty = graft.functions.Alignment.align(parsed, Vector.empty)._1
    traces.foreach { tr =>
      val (c, lg, md, sc) = graft.functions.Alignment.align(
        parsed, tr.toIndexedSeq)
      assert((c == 0L) == accepts(net, tr),
        s"cost-0 ⟺ accepts must hold on $tr (cost $c)")
      assert(c <= empty + tr.length, s"cost must not exceed worst on $tr")
      assert(lg + sc == tr.length,
        s"every trace event is a log or sync move on $tr")
    }
  }

  test("alignments: distributed wrapper fitness is exact and ordered") {
    import spark.implicits._
    val tree = Sequence(List(Leaf("a"), Leaf("b")))
    val df = Seq(
      ("c1", "a", Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      ("c1", "b", Timestamp.valueOf("2024-01-01 10:01:00"), 2L),
      ("c2", "b", Timestamp.valueOf("2024-01-01 11:00:00"), 3L))
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Replay.alignments(df, "case_id", "activity", "ts", "event_id",
        Inductive.toPetriNet(tree))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(7)))).toMap
    // perfect variant: cost 0, fitness 1e6; 'b' alone: cost 1 (model
    // move a), worst = emptyCost(2) + 1 = 3 → fitness 666666
    assert(out("a->b") == ((0L, 1000000L)))
    assert(out("b") == ((1L, 666666L)))
  }

  test("model quality: the flower/strict tension and the perfect model") {
    import spark.implicits._
    import graft.analytics.ModelQuality
    def logDf(traces: Seq[Seq[String]]) = traces.zipWithIndex.flatMap {
      case (tr, c) => tr.zipWithIndex.map { case (a, i) =>
        (s"c$c", a, Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"),
          (c * 100 + i).toLong)
      }
    }.toDF("case_id", "activity", "ts", "event_id")
    val seqLog = logDf(Seq.fill(4)(Seq("a", "b", "c")))
    val strict = Inductive.toPetriNet(
      Sequence(List(Leaf("a"), Leaf("b"), Leaf("c"))))
    val flower = Inductive.toPetriNet(
      Loop(Xor(List(Leaf("a"), Leaf("b"), Leaf("c"))), Silent))
    def row(net: Inductive.PetriNet) =
      ModelQuality.report(seqLog, "case_id", "activity", "ts", "event_id",
        net).collect().head
    val s = row(strict); val f = row(flower)
    // the strict model is perfect on its own log
    assert(s.getLong(2) == 1000000L && s.getLong(3) == 1000000L,
      s"strict: fitness ${s.getLong(2)}, precision ${s.getLong(3)}")
    // the flower replays everything but allows far more than observed
    assert(f.getLong(2) == 1000000L, "flower fitness must be perfect")
    assert(f.getLong(3) < s.getLong(3),
      s"flower precision ${f.getLong(3)} must crater vs strict")
    // generalization/simplicity are in range and deterministic
    Seq(s, f).foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert(r.getLong(5) > 0L && r.getLong(5) <= 1000000L)
    }
    assert(row(strict).toSeq == s.toSeq, "report must be deterministic")
    // netDirectlyFollows on the strict net is exactly the chain
    val parsed = TokenReplay.parse(Replay.serialize(strict))
    assert(ModelQuality.netDirectlyFollows(parsed) ==
      Set(("a", "b"), ("b", "c")))
  }
}
