package graft.analytics

/** Inductive-miner-lite: the discovery algorithm the reference notebook
  * actually calls (`pm4py.discover_petri_net_inductive`,
  * /root/reference/example.ipynb cell 3). This is the IMD ("inductive
  * miner over the directly-follows graph") variant: it recurses on
  * (edges, starts, ends) alone, which is exactly what this engine
  * already computes distributed (Dfg.edges / Dfg.startEndCounts) — the
  * log itself never reaches the driver, only the |activities|²-bounded
  * DFG does.
  *
  * Recursion: try the four canonical cuts in order — exclusive choice
  * (connected components), sequence (merged SCC condensation ordered by
  * reachability), parallel (components of the not-bidirectional graph,
  * each holding a start and an end), loop (body = starts∪ends closure,
  * redo parts touching the body only via end→redo and redo→start) —
  * project the DFG onto each part and recurse; fall back to the flower
  * model when no cut applies. Unlike the alpha miner, this discovers
  * short loops (⟨a⟩, ⟨a,b,a⟩ → a·(b·a)*) and guarantees a sound
  * workflow net by construction (InductiveSpec replays both).
  */
object Inductive {

  // ---- process trees ----------------------------------------------------

  sealed trait Tree
  final case class Leaf(activity: String) extends Tree
  case object Silent extends Tree
  final case class Sequence(children: List[Tree]) extends Tree
  final case class Xor(children: List[Tree]) extends Tree
  final case class And(children: List[Tree]) extends Tree
  /** body · (redo · body)* — pm4py's binary loop operator. */
  final case class Loop(body: Tree, redo: Tree) extends Tree

  final case class Dfg(edges: Set[(String, String)],
                       starts: Set[String], ends: Set[String]) {
    val activities: Set[String] =
      edges.flatMap(e => Set(e._1, e._2)) ++ starts ++ ends
  }

  /** Discover a process tree from DFG edges + endpoint activities.
    * Deterministic: parts and children are ordered by smallest member
    * activity, so the same DFG always yields the same tree.
    */
  def mine(edges: Seq[(String, String)], starts: Set[String],
           ends: Set[String]): Tree =
    mineDfg(Dfg(edges.toSet, starts, ends))

  /** IMf-style noise-filtered discovery (the `noise_threshold`
    * parameter of pm4py's `discover_petri_net_inductive`): a
    * directly-follows edge is kept only while its count is at least
    * `noiseThreshold` × the strongest count among edges INCIDENT TO
    * EITHER of its endpoints. Relative-to-local-context (rather than
    * source-outgoing only) is what actually kills the classic failure:
    * one misordered trace's reverse edge b→a is its source's ONLY
    * outgoing edge — trivially its own maximum — yet sits next to a
    * dominant a→b; the incident maximum sees the dominant edge and
    * drops the noise, un-welding the fake SCC that otherwise collapses
    * the tree to the flower model (InductiveSpec pins exactly that).
    * threshold 0 ⇔ unfiltered.
    */
  def mineWithNoise(edges: Seq[(String, String, Long)], starts: Set[String],
                    ends: Set[String], noiseThreshold: Double): Tree = {
    require(noiseThreshold >= 0.0 && noiseThreshold < 1.0,
      "noiseThreshold must be in [0, 1)")
    val maxAt = edges.flatMap { case (a, b, n) => Seq(a -> n, b -> n) }
      .groupBy(_._1).map { case (act, ns) => act -> ns.map(_._2).max }
    val kept = edges.collect {
      case (a, b, n)
        if n.toDouble >= noiseThreshold * math.max(maxAt(a), maxAt(b)).toDouble =>
        (a, b)
    }
    mineDfg(Dfg(kept.toSet, starts, ends))
  }

  private def mineDfg(g: Dfg): Tree = {
    val acts = g.activities
    if (acts.isEmpty) return Silent
    if (acts.size == 1) {
      val a = acts.head
      // self-loop base case: a·(τ·a)* ⇔ one-or-more a's
      return if (g.edges((a, a))) Loop(Leaf(a), Silent) else Leaf(a)
    }
    xorCut(g).map(parts => Xor(projectXor(g, parts).map(mineDfg)))
      .orElse(seqCut(g).map(parts => Sequence(seqChildren(g, parts))))
      .orElse(parCut(g).map(parts => And(projectPar(g, parts).map(mineDfg))))
      .orElse(loopCut(g).map { case (body, redos) =>
        val bodyTree = mineDfg(projectLoopBody(g, body))
        val redoTree = redos match {
          case Seq(r) => mineDfg(projectLoopRedo(g, body, r))
          case rs => Xor(rs.toList.map(r => mineDfg(projectLoopRedo(g, body, r))))
        }
        Loop(bodyTree, redoTree)
      })
      .getOrElse(flower(acts))
  }

  /** Fallback when no cut applies: τ·(Σaᵢ·τ)* — any sequence over the
    * alphabet, the standard fitness-preserving flower model.
    */
  private def flower(acts: Set[String]): Tree =
    Loop(Silent, Xor(acts.toList.sorted.map(Leaf.apply)))

  private def sortParts(parts: Seq[Set[String]]): List[Set[String]] =
    parts.sortBy(_.min).toList

  // ---- cut detection ----------------------------------------------------

  /** Exclusive-choice cut: connected components of the undirected DFG. */
  private def xorCut(g: Dfg): Option[List[Set[String]]] = {
    val comps = components(g.activities,
      (a, b) => g.edges((a, b)) || g.edges((b, a)))
    if (comps.size >= 2) Some(sortParts(comps)) else None
  }

  /** Sequence cut: SCC condensation, then merge classes that are not
    * strictly ordered by reachability (mutually unreachable = could run
    * in either order; mutually reachable at class level = a cycle the
    * condensation split) to fixpoint. ≥2 classes ⇒ a total order ⇒ cut.
    */
  private def seqCut(g: Dfg): Option[List[Set[String]]] = {
    val acts = g.activities
    val reach = transitiveClosure(acts, g.edges)
    // SCC classes: mutual reachability
    var classes = components(acts,
      (a, b) => reach((a, b)) && reach((b, a))).toList
    def classReach(x: Set[String], y: Set[String]): Boolean =
      x.exists(a => y.exists(b => reach((a, b))))
    var changed = true
    while (changed && classes.size > 1) {
      changed = false
      val pair = classes.combinations(2).collectFirst {
        case List(x, y) if classReach(x, y) == classReach(y, x) => (x, y)
      } // merge when unordered either way
      pair.foreach { case (x, y) =>
        classes = (x ++ y) :: classes.filterNot(c => c == x || c == y)
        changed = true
      }
    }
    if (classes.size < 2) None
    else Some(classes.sortWith((x, y) => classReach(x, y)))
  }

  /** Parallel cut: components of the "cannot separate" graph (a—b when
    * the pair is NOT bidirectional). A part without a start or an end
    * can't run concurrently on its own — merge it into the first part
    * that has both; ≥2 surviving parts ⇒ cut.
    */
  private def parCut(g: Dfg): Option[List[Set[String]]] = {
    val comps = components(g.activities,
      (a, b) => !(g.edges((a, b)) && g.edges((b, a))))
    def selfContained(p: Set[String]) =
      p.exists(g.starts) && p.exists(g.ends)
    val (ok, rest) = comps.partition(selfContained)
    if (ok.size < 2) return None
    val merged = rest.foldLeft(sortParts(ok)) { (ps, r) =>
      (ps.head ++ r) :: ps.tail
    }
    if (merged.size >= 2) Some(sortParts(merged)) else None
  }

  /** Loop cut: body seeded with starts ∪ ends; each remaining component
    * is a redo part iff its only contact with the body is end→redo and
    * redo→start — otherwise it belongs to the body. Redo nonempty ⇒ cut.
    */
  private def loopCut(g: Dfg): Option[(Set[String], List[Set[String]])] = {
    val seed = g.starts ++ g.ends
    if (seed.isEmpty || seed == g.activities) return None
    val comps = components(g.activities -- seed,
      (a, b) => g.edges((a, b)) || g.edges((b, a)))
    def isRedo(c: Set[String]): Boolean =
      g.edges.forall { case (x, y) =>
        val xin = c(x); val yin = c(y)
        if (xin && !yin) g.starts(y)       // redo exits only into starts
        else if (!xin && yin) g.ends(x)    // redo entered only from ends
        else true
      }
    val (redos, bodyExtra) = comps.partition(isRedo)
    if (redos.isEmpty) None
    else Some((seed ++ bodyExtra.flatten, sortParts(redos)))
  }

  // ---- DFG projections --------------------------------------------------

  private def restrict(g: Dfg, part: Set[String]): Set[(String, String)] =
    g.edges.filter { case (a, b) => part(a) && part(b) }

  private def projectXor(g: Dfg, parts: List[Set[String]]): List[Dfg] =
    parts.map(p => Dfg(restrict(g, p), g.starts & p, g.ends & p))

  private def projectSeq(g: Dfg, parts: List[Set[String]]): List[Dfg] =
    parts.map { p =>
      // a part's entries: original starts plus activities fed from
      // outside the part; exits symmetric
      val starts = p.filter(a => g.starts(a) ||
        g.edges.exists { case (x, y) => y == a && !p(x) })
      val ends = p.filter(a => g.ends(a) ||
        g.edges.exists { case (x, y) => x == a && !p(y) })
      Dfg(restrict(g, p), starts, ends)
    }

  /** Sequence children with SKIP detection: a middle part is optional
    * when some directly-follows edge bypasses it (earlier part →
    * later part), or when the whole prefix/suffix around it can be
    * skipped via a start that is not in the first part / an end that
    * is not in the last part. An optional part becomes Xor(child, τ) —
    * the same language pm4py's inductive miner emits for logs like
    * ⟨a,b,c⟩ + ⟨a,c⟩.
    */
  private def seqChildren(g: Dfg, parts: List[Set[String]]): List[Tree] = {
    val idx = parts.zipWithIndex
    def partOf(a: String): Int = idx.collectFirst { case (p, i) if p(a) => i }.get
    val children = projectSeq(g, parts).map(mineDfg)
    idx.zip(children).map { case ((p, k), child) =>
      val bypassed =
        g.edges.exists { case (x, y) => partOf(x) < k && partOf(y) > k } ||
          g.starts.exists(s => partOf(s) > k) || // trace can begin after p
          g.ends.exists(e => partOf(e) < k)      // trace can end before p
      child match {
        case _ if !bypassed => child
        case Xor(cs) if cs.contains(Silent) => child
        case Xor(cs) => Xor(cs :+ Silent)
        case _ => Xor(List(child, Silent))
      }
    }
  }

  private def projectPar(g: Dfg, parts: List[Set[String]]): List[Dfg] =
    parts.map(p => Dfg(restrict(g, p), g.starts & p, g.ends & p))

  private def projectLoopBody(g: Dfg, body: Set[String]): Dfg =
    Dfg(restrict(g, body), g.starts, g.ends)

  private def projectLoopRedo(g: Dfg, body: Set[String], redo: Set[String]): Dfg =
    Dfg(restrict(g, redo),
      redo.filter(a => g.edges.exists { case (x, y) => y == a && g.ends(x) }),
      redo.filter(a => g.edges.exists { case (x, y) => x == a && g.starts(y) }))

  // ---- small graph helpers (|activities|-bounded, driver-side) ----------

  private def components(nodes: Set[String],
                         adj: (String, String) => Boolean): Seq[Set[String]] = {
    val remaining = scala.collection.mutable.Set[String](nodes.toSeq: _*)
    val out = Seq.newBuilder[Set[String]]
    while (remaining.nonEmpty) {
      val root = remaining.min
      var comp = Set(root)
      var frontier = List(root)
      remaining -= root
      while (frontier.nonEmpty) {
        val n = frontier.head
        frontier = frontier.tail
        val next = remaining.filter(m => adj(n, m)).toList
        next.foreach(remaining -= _)
        comp ++= next
        frontier = next ::: frontier
      }
      out += comp
    }
    out.result()
  }

  private def transitiveClosure(nodes: Set[String],
                                edges: Set[(String, String)]): Set[(String, String)] = {
    var reach = edges
    var changed = true
    while (changed) {
      changed = false
      val add = for {
        (a, b) <- reach; (c, d) <- reach if b == c && !reach((a, d))
      } yield (a, d)
      if (add.nonEmpty) { reach ++= add; changed = true }
    }
    reach
  }

  // ---- tree → Petri net -------------------------------------------------

  /** Explicit-id Petri net (pm4py's accept-net shape): label None = τ.
    * One token on `source` is the initial marking; one on `sink` the
    * final.
    */
  final case class PetriNet(places: Set[String],
                            transitions: Map[String, Option[String]],
                            arcs: Set[(String, String)],
                            source: String, sink: String)

  /** Standard compositional construction: each subtree is wired between
    * an entry and an exit place; And forks/joins and Loop entry/exit use
    * τ transitions (reducible afterwards — the notebook applies pm4py's
    * invisible/implicit reductions, mirrored in Alpha.reduceInvisibles /
    * reduceImplicitPlaces for the alpha arm).
    */
  def toPetriNet(tree: Tree): PetriNet = {
    var nextId = 0
    def fresh(prefix: String): String = { nextId += 1; s"${prefix}_$nextId" }
    var places = Set("source", "sink")
    var transitions = Map.empty[String, Option[String]]
    var arcs = Set.empty[(String, String)]
    def tau(pIn: String, pOut: String): Unit = {
      val t = fresh("tau"); transitions += t -> None
      arcs += ((pIn, t)); arcs += ((t, pOut))
    }
    def build(t: Tree, pIn: String, pOut: String): Unit = t match {
      case Leaf(a) =>
        val id = fresh(s"t_$a"); transitions += id -> Some(a)
        arcs += ((pIn, id)); arcs += ((id, pOut))
      case Silent => tau(pIn, pOut)
      case Sequence(cs) =>
        val mids = cs.init.map(_ => { val p = fresh("p"); places += p; p })
        val ins = pIn +: mids
        val outs = mids :+ pOut
        cs.lazyZip(ins).lazyZip(outs).foreach((c, i, o) => build(c, i, o))
      case Xor(cs) => cs.foreach(build(_, pIn, pOut))
      case And(cs) =>
        val split = fresh("tau_split"); val join = fresh("tau_join")
        transitions += split -> None; transitions += join -> None
        arcs += ((pIn, split)); arcs += ((join, pOut))
        cs.foreach { c =>
          val i = fresh("p"); val o = fresh("p"); places += i; places += o
          arcs += ((split, i)); arcs += ((o, join))
          build(c, i, o)
        }
      case Loop(body, redo) =>
        val p1 = fresh("p"); val p2 = fresh("p"); places += p1; places += p2
        tau(pIn, p1)
        build(body, p1, p2)
        build(redo, p2, p1)
        tau(p2, pOut)
    }
    build(tree, "source", "sink")
    PetriNet(places, transitions, arcs, "source", "sink")
  }

  /** Token replay with silent-move search: does the net accept `trace`
    * (source marking → exactly the sink marking)? BFS over markings;
    * the visited-set bounds it for the |activities|-sized nets this
    * layer builds.
    */
  def accepts(net: PetriNet, trace: Seq[String]): Boolean = {
    type Marking = Map[String, Int]
    val inOf = net.transitions.keys.map(t =>
      t -> net.arcs.collect { case (p, `t`) => p }.toSeq).toMap
    val outOf = net.transitions.keys.map(t =>
      t -> net.arcs.collect { case (`t`, p) => p }.toSeq).toMap
    def enabled(m: Marking, t: String) = inOf(t).forall(p => m.getOrElse(p, 0) > 0)
    def fire(m: Marking, t: String): Marking = {
      val afterIn = inOf(t).foldLeft(m)((mm, p) => mm.updated(p, mm(p) - 1))
      outOf(t).foldLeft(afterIn)((mm, p) => mm.updated(p, mm.getOrElse(p, 0) + 1))
    }
    val init: Marking = Map(net.source -> 1)
    val finalM: Marking = Map(net.sink -> 1)
    def norm(m: Marking): Marking = m.filter(_._2 > 0)
    // states: (marking, index into trace)
    val seen = scala.collection.mutable.Set[(Marking, Int)]()
    var frontier = List((norm(init), 0))
    seen += frontier.head
    while (frontier.nonEmpty) {
      val (m, i) = frontier.head
      frontier = frontier.tail
      if (i == trace.length && norm(m) == finalM) return true
      // toSeq first: collecting (marking, index) pairs straight off the
      // transitions MAP would build a map KEYED BY MARKING, silently
      // merging a silent move and a labeled move that land on the same
      // marking at different trace positions (found via the skip nets,
      // where τ and the optional activity share both endpoints)
      val moves = net.transitions.toSeq.collect {
        case (t, None) if enabled(m, t) => (norm(fire(m, t)), i)
        case (t, Some(l)) if i < trace.length && l == trace(i) && enabled(m, t) =>
          (norm(fire(m, t)), i + 1)
      }
      moves.foreach { s =>
        if (!seen(s)) { seen += s; frontier = s :: frontier }
      }
    }
    false
  }

  /** Graphviz DOT rendering of a discovered net — the library analogue
    * of the notebook's final `pm4py.view_petri_net(net, im, fm)` call
    * (/root/reference/example.ipynb cell 3; pm4py renders through
    * graphviz too, so the artifact consumers see is the same kind).
    * Deterministic output: nodes and edges emit in sorted order, so
    * the rendering is diff- and golden-test-stable. Labeled
    * transitions are boxes, τ transitions filled black (the pm4py
    * convention), places circles, with source/sink marked.
    */
  def toDot(net: PetriNet): String = {
    val sb = new StringBuilder("digraph petri_net {\n  rankdir=LR;\n")
    net.places.toSeq.sorted.foreach { p =>
      val extra =
        if (p == net.source) ", label=\"●\", xlabel=\"source\""
        else if (p == net.sink) ", label=\"◎\", xlabel=\"sink\""
        else ", label=\"\""
      sb ++= s"""  "$p" [shape=circle$extra];\n"""
    }
    net.transitions.toSeq.sortBy(_._1).foreach {
      case (t, Some(l)) =>
        sb ++= s"""  "$t" [shape=box, label="${l.replace("\"", "\\\"")}"];\n"""
      case (t, None) =>
        sb ++= s"""  "$t" [shape=box, style=filled, fillcolor=black, label=""];\n"""
    }
    net.arcs.toSeq.sorted.foreach { case (a, b) => sb ++= s"""  "$a" -> "$b";\n""" }
    sb ++= "}\n"
    sb.result()
  }
}
