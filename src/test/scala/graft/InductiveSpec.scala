package graft

import graft.analytics.{Alpha, Inductive}
import graft.analytics.Inductive._

/** Inductive-miner-lite gates: the discovered tree on the textbook L1
  * log, the short-loop log the alpha miner cannot model, and token
  * replay (fitness + a rejection) on the constructed Petri nets.
  */
class InductiveSpec extends SparkSpec {

  private def dfgOf(traces: Seq[Seq[String]]): Seq[(String, String)] =
    traces.flatMap(t => t.zip(t.tail)).distinct

  private val l1 = Seq(
    Seq("a", "b", "c", "d"),
    Seq("a", "c", "b", "d"),
    Seq("a", "e", "d"))

  test("classic L1 log yields seq(a, xor(and(b,c), e), d) — the pm4py IM result") {
    val tree = Inductive.mine(dfgOf(l1), starts = Set("a"), ends = Set("d"))
    assert(tree == Sequence(List(
      Leaf("a"),
      Xor(List(And(List(Leaf("b"), Leaf("c"))), Leaf("e"))),
      Leaf("d"))))
  }

  test("L1 net replays every log trace and rejects a skip") {
    val tree = Inductive.mine(dfgOf(l1), Set("a"), Set("d"))
    val net = Inductive.toPetriNet(tree)
    l1.foreach(t => assert(Inductive.accepts(net, t), s"must fit $t"))
    // the middle branch is mandatory: a,d skips it
    assert(!Inductive.accepts(net, Seq("a", "d")))
    assert(!Inductive.accepts(net, Seq("a", "b", "d")), "b without its parallel c")
    assert(Inductive.accepts(net, Seq("a", "c", "b", "d")))
  }

  test("short loop a·(b·a)*: inductive discovers it, alpha cannot") {
    val traces = Seq(Seq("a"), Seq("a", "b", "a"), Seq("a", "b", "a", "b", "a"))
    val tree = Inductive.mine(dfgOf(traces), starts = Set("a"), ends = Set("a"))
    assert(tree == Loop(Leaf("a"), Leaf("b")))
    val net = Inductive.toPetriNet(tree)
    traces.foreach(t => assert(Inductive.accepts(net, t), s"must fit $t"))
    assert(!Inductive.accepts(net, Seq("a", "b")), "trace may not end mid-loop")
    assert(!Inductive.accepts(net, Seq("b", "a")))
    // the alpha footprint sees a∥b (edges both ways), so causal places
    // never form: the mined net is placeless — unfitting by construction
    val alphaNet = Alpha.mine(dfgOf(traces), Set("a"), Set("a"))
    assert(alphaNet.places.isEmpty)
  }

  test("self-loop base case: one-or-more repetitions") {
    val traces = Seq(Seq("x"), Seq("x", "x"), Seq("x", "x", "x"))
    val tree = Inductive.mine(dfgOf(traces), Set("x"), Set("x"))
    assert(tree == Loop(Leaf("x"), Silent))
    val net = Inductive.toPetriNet(tree)
    traces.foreach(t => assert(Inductive.accepts(net, t)))
    assert(!Inductive.accepts(net, Seq.empty))
  }

  test("xor of disconnected branches") {
    val traces = Seq(Seq("a", "b"), Seq("c", "d"))
    val tree = Inductive.mine(dfgOf(traces), Set("a", "c"), Set("b", "d"))
    assert(tree == Xor(List(
      Sequence(List(Leaf("a"), Leaf("b"))),
      Sequence(List(Leaf("c"), Leaf("d"))))))
  }

  test("uncuttable DFG falls back to the flower model (fits everything)") {
    // a↔b with start only a, end only b: xor — connected; seq — one
    // mutual-reachability class; par — neither singleton holds a start
    // AND an end; loop — seed {a,b} is the whole alphabet. No cut ⇒
    // flower, which accepts any word over the alphabet.
    val edges = Seq(("a", "b"), ("b", "a"))
    val tree = Inductive.mine(edges, starts = Set("a"), ends = Set("b"))
    assert(tree == Loop(Silent, Xor(List(Leaf("a"), Leaf("b")))))
    val net = Inductive.toPetriNet(tree)
    assert(Inductive.accepts(net, Seq.empty))
    assert(Inductive.accepts(net, Seq("b", "b", "a", "b")))
  }

  test("parallel parts with self-loops recurse into loop leaves") {
    // a and b fully bidirectional with self-loops, both start and end:
    // the parallel cut splits them; each singleton's self-loop becomes
    // the one-or-more base case
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b"))
    val tree = Inductive.mine(edges, starts = Set("a", "b"), ends = Set("a", "b"))
    assert(tree == And(List(Loop(Leaf("a"), Silent), Loop(Leaf("b"), Silent))))
    val net = Inductive.toPetriNet(tree)
    assert(Inductive.accepts(net, Seq("b", "b", "a", "b")))
    assert(!Inductive.accepts(net, Seq("a", "a")), "needs at least one b")
  }

  test("sequence skip: a bypass edge makes the middle part optional (pm4py parity)") {
    // ⟨a,b,c⟩ + ⟨a,c⟩ — the classic optional step
    val tree = Inductive.mine(dfgOf(Seq(Seq("a", "b", "c"), Seq("a", "c"))),
      starts = Set("a"), ends = Set("c"))
    assert(tree == Sequence(List(
      Leaf("a"), Xor(List(Leaf("b"), Silent)), Leaf("c"))))
    val net = Inductive.toPetriNet(tree)
    assert(Inductive.accepts(net, Seq("a", "b", "c")))
    assert(Inductive.accepts(net, Seq("a", "c")))
    assert(!Inductive.accepts(net, Seq("b", "c")), "a is not optional")
  }

  test("prefix skip: a start inside a later part makes the prefix optional") {
    val tree = Inductive.mine(dfgOf(Seq(Seq("a", "b"), Seq("b"))),
      starts = Set("a", "b"), ends = Set("b"))
    assert(tree == Sequence(List(Xor(List(Leaf("a"), Silent)), Leaf("b"))))
    val net = Inductive.toPetriNet(tree)
    assert(Inductive.accepts(net, Seq("a", "b")))
    assert(Inductive.accepts(net, Seq("b")))
    assert(!Inductive.accepts(net, Seq("a")))
  }

  test("noise threshold: one misordered trace no longer collapses the tree to a flower") {
    // dominant sequence a→b (100×) plus a single noisy b→a edge: the
    // fake 2-cycle welds a,b into one SCC, every cut fails, and the
    // unfiltered miner emits the flower; IMf-style filtering at 0.2
    // drops the rare reverse edge and recovers the sequence
    val edges = Seq(("a", "b", 100L), ("b", "a", 1L))
    val noisy = Inductive.mineWithNoise(edges, Set("a"), Set("b"), noiseThreshold = 0.0)
    assert(noisy == Loop(Silent, Xor(List(Leaf("a"), Leaf("b")))))
    val clean = Inductive.mineWithNoise(edges, Set("a"), Set("b"), noiseThreshold = 0.2)
    assert(clean == Sequence(List(Leaf("a"), Leaf("b"))))
    intercept[IllegalArgumentException](
      Inductive.mineWithNoise(edges, Set("a"), Set("b"), noiseThreshold = 1.0))
  }

  test("sequence of parallel: seq cut orders around the and-block") {
    val traces = Seq(Seq("s", "p", "q", "e"), Seq("s", "q", "p", "e"))
    val tree = Inductive.mine(dfgOf(traces), Set("s"), Set("e"))
    assert(tree == Sequence(List(
      Leaf("s"), And(List(Leaf("p"), Leaf("q"))), Leaf("e"))))
  }

  test("DOT export mirrors the net and is deterministic (view_petri_net analogue)") {
    val net = Inductive.toPetriNet(
      Inductive.mine(dfgOf(l1), starts = Set("a"), ends = Set("d")))
    val dot = Inductive.toDot(net)
    assert(dot.startsWith("digraph petri_net {"))
    // every place, transition and arc appears exactly once as a node/edge line
    net.places.foreach(p => assert(dot.contains(s""""$p" [shape=circle""")))
    net.transitions.foreach { case (t, label) =>
      assert(dot.contains(s""""$t" [shape=box"""))
      label.foreach(l => assert(dot.contains(s"""label="$l"""")))
    }
    net.arcs.foreach { case (x, y) => assert(dot.contains(s""""$x" -> "$y";""")) }
    assert(dot.linesIterator.count(_.contains(" -> ")) == net.arcs.size)
    assert(dot.contains("xlabel=\"source\"") && dot.contains("xlabel=\"sink\""))
    assert(dot == Inductive.toDot(net), "sorted emission ⇒ byte-stable")
  }

  test("DOT export matches the checked-in golden for the textbook L1 net") {
    // byte-stability alone can't catch a rendering change (both runs
    // would drift together) — the golden file makes one a visible diff.
    // Regenerate deliberately if the format evolves:
    //   Inductive.toDot(toPetriNet(mine(dfgOf(l1), Set("a"), Set("d"))))
    //   -> src/test/resources/l1_petri_net.dot (UTF-8; note the ● token)
    val net = Inductive.toPetriNet(
      Inductive.mine(dfgOf(l1), starts = Set("a"), ends = Set("d")))
    val golden = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource("/l1_petri_net.dot").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(Inductive.toDot(net) == golden,
      "DOT rendering changed — diff against src/test/resources/l1_petri_net.dot and regenerate if intentional")
  }
}
