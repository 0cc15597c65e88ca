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
}
