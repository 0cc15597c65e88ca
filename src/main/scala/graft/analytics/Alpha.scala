package graft.analytics

/** Alpha-miner-lite: the Petri-net discovery step the reference
  * notebook delegates to pm4py (`discover_petri_net_inductive`,
  * example.ipynb cell 3), over the DFG this engine computes
  * distributed (Dfg.edges / Dfg.startEndCounts).
  *
  * Deliberately driver-side (SURVEY §7.3): the input is the edge list
  * over ACTIVITIES, not events — bounded by |activities|², thousands
  * of times smaller than the log. The classic alpha place-candidate
  * search is exponential in |activities|; this is fine at the tens of
  * activities real processes have, and the guard below refuses larger
  * alphabets instead of silently stalling.
  */
object Alpha {

  /** A discovered place: every input activity causally precedes every
    * output activity, and both sides are internally conflict-free.
    */
  final case class Place(in: Set[String], out: Set[String])

  final case class Net(
      transitions: Set[String],
      places: Seq[Place],
      starts: Set[String],
      ends: Set[String])

  def mine(edges: Seq[(String, String)], starts: Set[String], ends: Set[String],
           maxActivities: Int = 16): Net = {
    val follows = edges.toSet
    val acts = (follows.flatMap(e => Set(e._1, e._2)) ++ starts ++ ends).toSeq.sorted
    require(acts.size <= maxActivities,
      s"alpha miner is exponential in |activities|; got ${acts.size} > $maxActivities")

    def causal(a: String, b: String) = follows((a, b)) && !follows((b, a))
    def choice(a: String, b: String) = !follows((a, b)) && !follows((b, a))

    val subsets: Seq[Set[String]] = (1 until (1 << acts.size)).map { mask =>
      acts.zipWithIndex.collect { case (a, i) if (mask & (1 << i)) != 0 => a }.toSet
    }
    def conflictFree(s: Set[String]) =
      s.forall(a => s.forall(b => a == b || choice(a, b)))

    val candidates = for {
      in <- subsets if conflictFree(in)
      out <- subsets if conflictFree(out)
      if in.forall(a => out.forall(b => causal(a, b)))
    } yield Place(in, out)

    // keep only maximal (in, out) pairs
    val places = candidates.filterNot { p =>
      candidates.exists(q => q != p &&
        p.in.subsetOf(q.in) && p.out.subsetOf(q.out))
    }
    Net(acts.toSet, places, starts, ends)
  }

  /** Invisible-transition reduction (the notebook's
    * `reduce_petri_net_invisibles`, /root/reference/example.ipynb cell 3
    * — pm4py's single-entry/single-exit simple reduction): a silent
    * transition τ with exactly one input place p₁ and one output place
    * p₂ is removed and the places fused, provided τ is p₁'s only
    * consumer or p₂'s only producer (Murata series fusion — the
    * condition under which the fusion is language-preserving). Runs to
    * fixpoint; |places|-bounded like everything else in this
    * driver-side layer.
    */
  def reduceInvisibles(net: Net, isInvisible: String => Boolean): Net = {
    var current = net
    var changed = true
    while (changed) {
      changed = false
      val candidate = current.transitions.toSeq.sorted.filter(isInvisible).flatMap { t =>
        val ins = current.places.filter(_.out.contains(t))
        val outs = current.places.filter(_.in.contains(t))
        (ins, outs) match {
          case (Seq(p1), Seq(p2)) if p1 != p2 &&
            (p1.out == Set(t) || p2.in == Set(t)) => Some((t, p1, p2))
          case _ => None
        }
      }.headOption
      candidate.foreach { case (t, p1, p2) =>
        val fused = Place(p1.in ++ p2.in - t, p1.out ++ p2.out - t)
        current = Net(
          current.transitions - t,
          current.places.filterNot(p => p == p1 || p == p2) :+ fused,
          current.starts - t,
          current.ends - t)
        changed = true
      }
    }
    current
  }

  /** Implicit-place reduction (the notebook's
    * `reduce_petri_net_implicit_places`): drops duplicate places and
    * structural shortcut places — p is removed when a CHAIN of other
    * places q₁…qₖ (k ≥ 2) re-derives it (q₁.in = p.in, qₖ.out = p.out,
    * consecutive places sharing a linking transition), because a token
    * on the chain implies the token p would carry. This is the
    * structural sufficient condition (transitive/series place), not
    * Berthelot's full linear-programming implicitness test — adequate
    * for the sound workflow-shaped nets the alpha step emits, and
    * O(|places|²·|chain|) on an |activities|-bounded input.
    */
  def reduceImplicitPlaces(net: Net): Net = {
    val dedup = net.places.distinct
    def chainExists(p: Place, pool: Seq[Place]): Boolean = {
      // BFS over places: start from any q with q.in == p.in, follow
      // q -> r when they share a linking transition (q.out ∩ r.in ≠ ∅),
      // and require at least two hops before accepting q.out == p.out
      val startQs = pool.filter(_.in == p.in)
      var frontier = startQs.map(q => (q, 1))
      val seen = scala.collection.mutable.Set[Place](startQs: _*)
      while (frontier.nonEmpty) {
        val (q, depth) = frontier.head
        frontier = frontier.tail
        if (depth >= 2 && q.out == p.out) return true
        for (r <- pool if !seen(r) && (q.out & r.in).nonEmpty) {
          seen += r
          frontier = frontier :+ ((r, depth + 1))
        }
      }
      false
    }
    val kept = dedup.filterNot(p => chainExists(p, dedup.filterNot(_ == p)))
    net.copy(places = kept)
  }
}
