package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Token-based replay (Rozinat & van der Aalst 2008) of one trace over
  * a Petri net, as a compiled per-row kernel — the CHECKING metric the
  * discovery surface was missing: unlike the boolean `accepts`, replay
  * degrades gracefully, counting produced / consumed / missing /
  * remaining tokens so a 95%-fitting log is distinguishable from a 5%
  * one.
  *
  * The variant (deterministic, and pinned by `ReplaySpec`):
  *  - the initial source token counts as produced; the final sink
  *    token is always consumed at the end (from the net when present,
  *    from thin air — counted missing — when not);
  *  - before each labeled firing, the SHORTEST enabling sequence of
  *    τ firings is searched breadth-first (expansion in sorted
  *    transition-id order, so the chosen path is unique); τ firings
  *    count produced/consumed like any other;
  *  - inputs still short after the τ search are conjured one token
  *    each (counted missing), then the transition fires — replay
  *    NEVER stalls;
  *  - activities with no transition in the net are counted in
  *    `unknown` and skipped (they consume nothing — the pm4py
  *    convention for out-of-vocabulary events);
  *  - at the end, among all τ-reachable markings the one minimizing
  *    (missing-at-sink, tokens-remaining, path length) is taken —
  *    BFS order breaks ties — and what is left besides the sink
  *    token counts as remaining.
  *
  * Labels must be UNIQUE across transitions (inductive-miner trees
  * guarantee this; the wrapper enforces it loudly) — with that, the
  * only nondeterminism in token replay is τ-path choice, which the
  * BFS order pins. State-space searches are visited-set-bounded and
  * FAIL LOUDLY on overflow rather than return a silently-wrong count.
  */
object TokenReplay {

  /** Compact net: places indexed, transitions split into labeled
    * (label → index) and τ (sorted), arcs as index arrays.
    */
  final class Net(val nPlaces: Int, val sourceIdx: Int, val sinkIdx: Int,
                  val labelOf: java.util.HashMap[String, Int],
                  val inOf: Array[Array[Int]], val outOf: Array[Array[Int]],
                  val taus: Array[Int]) extends Serializable

  /** spec lines: "P<US>place", "T<US>id<US>label" (label empty = τ),
    * "A<US>from<US>to", "M<US>source<US>sink"; <US> = \u0001 (a char no place/activity
    * name contains — the serializer enforces it).
    */
  val US = '\u0001'

  def parse(spec: Array[String]): Net = {
    val placeIdx = new java.util.HashMap[String, Int]()
    val transIds = mutable.ArrayBuffer.empty[String]
    val labels = mutable.ArrayBuffer.empty[String]
    var source = ""; var sink = ""
    val arcs = mutable.ArrayBuffer.empty[(String, String)]
    spec.foreach { line =>
      val parts = line.split(US)
      parts(0) match {
        case "P" => placeIdx.putIfAbsent(parts(1), placeIdx.size)
        case "T" => transIds += parts(1)
          labels += (if (parts.length > 2) parts(2) else "")
        case "A" => arcs += ((parts(1), parts(2)))
        case "M" => source = parts(1); sink = parts(2)
      }
    }
    val tIdx = transIds.zipWithIndex.toMap
    val inB = Array.fill(transIds.length)(mutable.ArrayBuffer.empty[Int])
    val outB = Array.fill(transIds.length)(mutable.ArrayBuffer.empty[Int])
    arcs.foreach { case (a, b) =>
      if (tIdx.contains(b)) inB(tIdx(b)) += placeIdx.get(a)
      else outB(tIdx(a)) += placeIdx.get(b)
    }
    val labelOf = new java.util.HashMap[String, Int]()
    val taus = mutable.ArrayBuffer.empty[Int]
    // spec order is sorted by transition id (the serializer's
    // contract), so `taus` inherits the deterministic expansion order
    transIds.indices.foreach { i =>
      if (labels(i).isEmpty) taus += i
      else labelOf.put(labels(i), i)
    }
    new Net(placeIdx.size, placeIdx.get(source), placeIdx.get(sink),
      labelOf, inB.map(_.toArray), outB.map(_.toArray), taus.toArray)
  }

  private val SearchCap = 100000

  private def fire(m: Array[Int], net: Net, t: Int): Array[Int] = {
    val nm = m.clone()
    net.inOf(t).foreach(p => nm(p) -= 1)
    net.outOf(t).foreach(p => nm(p) += 1)
    nm
  }

  private def enabled(m: Array[Int], net: Net, t: Int): Boolean =
    net.inOf(t).forall(p => m(p) > 0)

  /** Shortest τ sequence from `m` to a marking enabling `target`
    * (or, when target < 0, the best final marking per the minimizing
    * order). Returns the τ path, or null when unreachable.
    */
  private def tauSearch(m: Array[Int], net: Net, target: Int): (Array[Int], List[Int]) = {
    val seen = mutable.HashSet[mutable.ArraySeq[Int]]()
    val queue = mutable.Queue[(Array[Int], List[Int])]((m, Nil))
    seen += mutable.ArraySeq.from(m)
    var best: (Array[Int], List[Int]) = null
    var bestKey: (Int, Int, Int) = null
    def finalKey(mm: Array[Int], path: List[Int]): (Int, Int, Int) = {
      val sinkTok = math.min(1, mm(net.sinkIdx))
      (1 - sinkTok, mm.sum - sinkTok, path.length)
    }
    while (queue.nonEmpty) {
      val (cur, path) = queue.dequeue()
      if (target >= 0) {
        if (enabled(cur, net, target)) return (cur, path.reverse)
      } else {
        val k = finalKey(cur, path)
        // strict-< : BFS order makes the first hit at a given
        // (missing, remaining) the lexicographically-least shortest path
        if (best == null || Ordering[(Int, Int, Int)].lt(k, bestKey)) {
          best = (cur, path.reverse); bestKey = k
        }
      }
      net.taus.foreach { t =>
        if (enabled(cur, net, t)) {
          val nm = fire(cur, net, t)
          val key = mutable.ArraySeq.from(nm)
          if (!seen(key)) {
            if (seen.size >= SearchCap)
              throw new IllegalStateException(
                "token_replay: τ-reachability search exceeded " +
                  s"$SearchCap markings — net too large for replay")
            seen += key
            queue += ((nm, t :: path))
          }
        }
      }
    }
    if (target >= 0) null else best
  }

  /** Replay one trace; returns (produced, consumed, missing,
    * remaining, unknown).
    */
  def replay(net: Net, trace: IndexedSeq[String]): (Long, Long, Long, Long, Long) = {
    var m = new Array[Int](net.nPlaces)
    m(net.sourceIdx) = 1
    var produced = 1L; var consumed = 0L; var missing = 0L; var unknown = 0L
    trace.foreach { a =>
      val t = net.labelOf.getOrDefault(a, -1)
      if (t < 0) unknown += 1L
      else {
        if (!enabled(m, net, t)) {
          val hit = tauSearch(m, net, t)
          if (hit != null) {
            m = hit._1
            hit._2.foreach { tt =>
              consumed += net.inOf(tt).length; produced += net.outOf(tt).length
            }
          }
        }
        net.inOf(t).foreach { p =>
          if (m(p) <= 0) { missing += 1L; m(p) += 1 }
        }
        m = fire(m, net, t)
        consumed += net.inOf(t).length; produced += net.outOf(t).length
      }
    }
    val (fm, fpath) = tauSearch(m, net, -1)
    fpath.foreach { tt =>
      consumed += net.inOf(tt).length; produced += net.outOf(tt).length
    }
    m = fm
    if (m(net.sinkIdx) > 0) { m(net.sinkIdx) -= 1; consumed += 1L }
    else { missing += 1L; consumed += 1L }
    val remaining = m.map(_.toLong).sum
    (produced, consumed, missing, remaining, unknown)
  }

  def tokenReplayCounts(trace: Column, spec: Array[String]): Column =
    GraftBridge.column(TokenReplayExpr(GraftBridge.expression(trace), spec))
}

/** Per-row token replay over an array<string> trace. Output:
  * struct<produced, consumed, missing, remaining, unknown: bigint>.
  * Null input propagates NULL.
  */
case class TokenReplayExpr(child: Expression, spec: Array[String])
    extends UnaryExpression with CodegenFallback {

  // content equality for the Array param (the MatVecExpr lesson)
  override def equals(o: Any): Boolean = o match {
    case e: TokenReplayExpr => child == e.child &&
      java.util.Arrays.equals(
        spec.asInstanceOf[Array[AnyRef]], e.spec.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(java.util.Arrays.hashCode(
      spec.asInstanceOf[Array[AnyRef]])))

  @transient private lazy val net = TokenReplay.parse(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if spec.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<string> trace and a non-empty net, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("produced", LongType, nullable = false),
    StructField("consumed", LongType, nullable = false),
    StructField("missing", LongType, nullable = false),
    StructField("remaining", LongType, nullable = false),
    StructField("unknown", LongType, nullable = false)))
  override def prettyName: String = "token_replay"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val trace = Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString)
    val (p, c, m, r, u) = TokenReplay.replay(net, trace)
    new GenericInternalRow(Array[Any](p, c, m, r, u))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenReplayExpr =
    copy(child = newChild)
}
