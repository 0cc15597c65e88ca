package graft.analytics

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Alignment, TokenReplay}

/** The four quality dimensions of a discovered process model (van der
  * Aalst's conformance quadrant — the headline every process-mining
  * evaluation reports): FITNESS (can the model replay the log),
  * PRECISION (does it allow much more than the log does),
  * GENERALIZATION (does it overfit the sample), SIMPLICITY (is the
  * net readable). One exact-integer row; a flower model maxes fitness
  * while cratering precision, an enumerating model maxes precision
  * while cratering generalization/simplicity — the tension is the
  * point, and both extremes are executed as laws.
  */
object ModelQuality {

  private val ExploreCap = 100000

  /** The net's own directly-follows relation, by bounded exploration
    * of (marking, lastLabel) states — τ moves pass `last` through,
    * labeled firings emit (last, label). This is the model-side DFG
    * that DFG-based precision compares against (the pm4py baseline
    * when a net is the model). LOUD on state-space overflow.
    */
  def netDirectlyFollows(net: TokenReplay.Net): Set[(String, String)] = {
    val labelOfIdx = {
      val m = mutable.HashMap.empty[Int, String]
      net.labelOf.forEach((l, t) => m.update(t, l))
      m
    }
    val start = {
      val a = new Array[Int](net.nPlaces); a(net.sourceIdx) = 1
      (mutable.ArraySeq.from(a), -1)
    }
    val seen = mutable.HashSet[(mutable.ArraySeq[Int], Int)](start)
    val queue = mutable.Queue(start)
    val pairs = mutable.HashSet.empty[(String, String)]
    while (queue.nonEmpty) {
      val (mk, last) = queue.dequeue()
      val m = mk.toArray
      var t = 0
      while (t < net.inOf.length) {
        if (net.inOf(t).forall(p => m(p) > 0)) {
          val nm = m.clone()
          net.inOf(t).foreach(p => nm(p) -= 1)
          net.outOf(t).foreach(p => nm(p) += 1)
          val lbl = labelOfIdx.get(t)
          val nextLast = lbl.fold(last)(_ => t)
          for (l <- lbl; pl <- labelOfIdx.get(last)) pairs += ((pl, l))
          val st = (mutable.ArraySeq.from(nm), nextLast)
          if (!seen(st)) {
            if (seen.size >= ExploreCap)
              throw new IllegalStateException(
                s"netDirectlyFollows: exploration exceeded $ExploreCap " +
                  "states — net too large for DFG derivation")
            seen += st; queue += st
          }
        }
        t += 1
      }
    }
    pairs.toSet
  }

  /** One-row quality report. Fitness is the mass-weighted alignment
    * fitness Σ n_cases·(worst−cost) / Σ n_cases·worst; precision is
    * the MODEL-side directly-follows ratio |allowed ∩ observed| /
    * |allowed| (`netDirectlyFollows`); generalization is pm4py's token-based
    * form 1 − (Σ_t 1/√executions(t)) / |T_labeled| with executions =
    * log occurrences of the label and unexecuted transitions pinned
    * to contribute a full 1 (maximally un-generalizing); simplicity
    * is the inverse-arc-degree form 1e6·1e6 / (1e6 + max(0,
    * meanDegree − 2e6)) over places+transitions. All micro-units;
    * the √ terms sum driver-side over the SORTED label list (a
    * bounded ≤|activities| set), so the float accumulation order is
    * pinned.
    *
    * Scale shape: the two corpus passes are `Replay.alignments`'
    * variant collapse and one DFG edge collapse; everything else is
    * |activities|-bounded driver arithmetic assembling one row.
    * Rows-only by design (alignment kernel + √).
    */
  def report(df: DataFrame, caseCol: String, activityCol: String,
             tsCol: String, tieCol: String,
             net: Inductive.PetriNet): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parsed = TokenReplay.parse(Replay.serialize(net))
    val emptyCost = Alignment.align(parsed, Vector.empty)._1
    val al = Replay.alignments(df, caseCol, activityCol, tsCol, tieCol, net)
      .agg(count(lit(1)).as("nv"), sum(col("n_cases")).as("nc"),
        sum(expr(s"n_cases * ((${emptyCost}L + n_events) - cost)")).as("good"),
        sum(expr(s"n_cases * (${emptyCost}L + n_events)")).as("worst"))
      .head()
    val (nVariants, nCases) = (al.getLong(0), al.getLong(1))
    val fitnessMicro =
      if (al.getLong(3) == 0L) 1000000L
      else al.getLong(2) * 1000000L / al.getLong(3)
    // precision is MODEL-side: of the directly-follows pairs the net
    // can produce, how many does the log actually exhibit — so a
    // flower model (which allows every pair) scores low even though
    // every observed pair is allowed (the direction a log-side ratio
    // gets exactly backwards)
    val allowed = netDirectlyFollows(parsed)
    val observed = Dfg.edges(df, caseCol, activityCol, tsCol, tieCol)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val precisionMicro =
      if (allowed.isEmpty) 1000000L
      else allowed.count(observed).toLong * 1000000L / allowed.size
    val counts = df.groupBy(col(activityCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = {
      val b = mutable.ArrayBuffer.empty[String]
      parsed.labelOf.forEach((l, _) => b += l)
      b.sorted
    }
    val genMicro =
      if (labels.isEmpty) 0L
      else {
        val s = labels.iterator.map(l =>
          counts.get(l).fold(1.0)(n => 1.0 / math.sqrt(n.toDouble))).sum
        math.max(0L, 1000000L - math.floor(1000000.0 * s / labels.size).toLong)
      }
    val nNodes = net.places.size + net.transitions.size
    val meanDegMicro = if (nNodes == 0) 0L
      else 2L * net.arcs.size * 1000000L / nNodes
    val simplicityMicro =
      1000000L * 1000000L / (1000000L + math.max(0L, meanDegMicro - 2000000L))
    Seq((nVariants, nCases, fitnessMicro, precisionMicro, genMicro,
      simplicityMicro))
      .toDF("n_variants", "n_cases", "fitness_micro", "precision_micro",
        "generalization_micro", "simplicity_micro")
  }
}
