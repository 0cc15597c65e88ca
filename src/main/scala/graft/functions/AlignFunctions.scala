package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Optimal trace-to-model ALIGNMENTS (Adriansyah, van Dongen &
  * van der Aalst 2011) — the definitive conformance metric above
  * token replay's graded-but-heuristic counts: the minimum-cost path
  * through the synchronous product of the trace and the Petri net,
  * where a synchronous move costs 0, a log-only or labeled
  * model-only move costs 1, and τ model moves cost 0. Token replay
  * can over- or under-count when it conjures tokens; the alignment
  * cost is OPTIMAL by construction — cost 0 if and only if the net
  * accepts the trace (an executed law against `Inductive.accepts`).
  *
  * Determinism: Dijkstra over the product with the LEXICOGRAPHIC cost
  * tuple (cost, logMoves, modelMoves, pathLength) — each move adds
  * componentwise and the order is monotone, so the tuple-optimal
  * alignment is unique up to the tuple, making the reported move
  * DECOMPOSITION deterministic, not just the scalar cost — and the
  * whole search is a single-threaded loop expanding transitions in
  * index order, so no hash-iteration order ever reaches a decision.
  * The search is visited-bounded and FAILS LOUD on state-space
  * overflow (never a silently truncated cost).
  *
  * Reuses `TokenReplay`'s net model/parser — same serialized spec,
  * same unique-label contract.
  */
object Alignment {

  private val SettleCap = 200000

  private type CostT = (Long, Long, Long, Long) // cost, log, model, length

  private implicit val costOrd: Ordering[CostT] =
    Ordering.Tuple4[Long, Long, Long, Long]

  /** Align one trace; returns (cost, logMoves, modelMoves, syncMoves).
    * Every trace aligns (log moves always exist), so this is total.
    *
    * Performance notes (the first draft was the bench's slowest
    * query): states are keyed by a STRING encoding of the marking
    * (Strings cache their hash; an ArraySeq re-murmurs every map
    * lookup), markings are carried as raw arrays next to the key, and
    * the heap orders by the cost tuple ALONE — a per-comparison state
    * tie-break is unnecessary for determinism, because the settled
    * goal's MINIMAL tuple is unique regardless of pop order among
    * equals, and the tuple is the entire output.
    */
  def align(net: TokenReplay.Net, trace: IndexedSeq[String]): (Long, Long, Long, Long) = {
    val n = trace.length
    // the 16-bit state-key packing below aliases beyond Char range —
    // fail loud rather than return a wrong (too-low) cost (r9 advisor)
    require(n < 65536,
      s"align: trace length $n exceeds the 16-bit state-key range")
    // state key: marking chars + pos (place counts < 2^16 by far —
    // and guarded below, never silently aliased)
    def keyOf(m: Array[Int], pos: Int): String = {
      val cs = new Array[Char](m.length + 1)
      var i = 0
      while (i < m.length) {
        if (m(i) >= 65535)
          throw new IllegalStateException(
            s"align: marking count ${m(i)} at place $i exceeds the " +
              "16-bit state-key range — refusing to alias states")
        cs(i) = m(i).toChar; i += 1
      }
      cs(m.length) = pos.toChar
      new String(cs)
    }
    val goalKey = {
      val a = new Array[Int](net.nPlaces); a(net.sinkIdx) = 1
      keyOf(a, n)
    }
    val startMark = {
      val a = new Array[Int](net.nPlaces); a(net.sourceIdx) = 1; a
    }
    final case class Entry(c: CostT, mark: Array[Int], pos: Int, key: String)
    implicit val qOrd: Ordering[Entry] = Ordering.by((e: Entry) => e.c)
    val queue = mutable.PriorityQueue.empty[Entry](qOrd.reverse)
    val settled = mutable.HashSet.empty[String]
    val best = mutable.HashMap.empty[String, CostT]
    def push(c: CostT, m: Array[Int], pos: Int): Unit = {
      val k = keyOf(m, pos)
      if (!settled(k) && best.get(k).forall(costOrd.gt(_, c))) {
        best.update(k, c); queue.enqueue(Entry(c, m, pos, k))
      }
    }
    def plus(c: CostT, a: Long, b: Long, d: Long, e: Long): CostT =
      (c._1 + a, c._2 + b, c._3 + d, c._4 + e)
    push((0L, 0L, 0L, 0L), startMark, 0)
    while (queue.nonEmpty) {
      val Entry(c, m, pos, k) = queue.dequeue()
      if (!settled(k) && best.get(k).contains(c)) {
        if (k == goalKey) return (c._1, c._2, c._3, n - c._2)
        settled += k
        if (settled.size >= SettleCap)
          throw new IllegalStateException(
            s"align: product state space exceeded $SettleCap states — " +
              "net/trace too large for exact alignment")
        // log move: consume the trace event, model stands still
        if (pos < n) push(plus(c, 1L, 1L, 0L, 1L), m, pos + 1)
        // model / synchronous moves over every enabled transition
        var t = 0
        while (t < net.inOf.length) {
          if (net.inOf(t).forall(p => m(p) > 0)) {
            val nm = m.clone()
            net.inOf(t).foreach(p => nm(p) -= 1)
            net.outOf(t).foreach(p => nm(p) += 1)
            val isTau = java.util.Arrays.binarySearch(net.taus, t) >= 0
            // model-only move: τ free, labeled costs 1
            push(plus(c, if (isTau) 0L else 1L, 0L, 1L, 1L), nm, pos)
            // synchronous move: label matches the current trace event
            if (!isTau && pos < n &&
                net.labelOf.getOrDefault(trace(pos), -2) == t)
              push(plus(c, 0L, 0L, 0L, 1L), nm, pos + 1)
          }
          t += 1
        }
      }
    }
    throw new IllegalStateException(
      "align: no alignment found — the net has no source→sink path " +
        "(malformed net); log moves alone cannot reach the final marking")
  }

  def alignCounts(trace: Column, spec: Array[String]): Column =
    GraftBridge.column(AlignExpr(GraftBridge.expression(trace), spec))
}

/** Per-row optimal alignment over an array<string> trace. Output:
  * struct<cost, log_moves, model_moves, sync_moves: bigint>. Null
  * input propagates NULL.
  */
case class AlignExpr(child: Expression, spec: Array[String])
    extends UnaryExpression with CodegenFallback {

  // content equality for the Array param (the MatVecExpr lesson)
  override def equals(o: Any): Boolean = o match {
    case e: AlignExpr => child == e.child &&
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
    StructField("cost", LongType, nullable = false),
    StructField("log_moves", LongType, nullable = false),
    StructField("model_moves", LongType, nullable = false),
    StructField("sync_moves", LongType, nullable = false)))
  override def prettyName: String = "align"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val trace = Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString)
    val (c, lg, md, sc) = Alignment.align(net, trace)
    new GenericInternalRow(Array[Any](c, lg, md, sc))
  }

  override protected def withNewChildInternal(newChild: Expression): AlignExpr =
    copy(child = newChild)
}
