package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Token-level Aho–Corasick automaton: match EVERY dictionary phrase
  * (a sequence of whole tokens) against a token stream in ONE pass,
  * regardless of dictionary size — the classic multi-pattern
  * alternative to |dict| separate scans (Aho & Corasick 1975; the
  * FlashText shape for corpus taxonomy tagging).
  *
  * Matches are counted at every token position where a phrase ends,
  * so overlapping occurrences all count ("a a a" contains "a a"
  * twice) and a phrase that is a suffix of another is found through
  * the fail-link closure ("b c" inside "a b c" counts even when
  * "a b c" also matches there).
  *
  * The automaton is built once per executor from the phrase list
  * (transient lazy val in the expression) and walked with amortized
  * O(1) transitions per token: goto misses walk the fail chain, but
  * total fail-steps are bounded by total goto-steps — the textbook
  * argument.
  */
object AhoCorasick {

  /** goto maps are per-node token→state; out(s) is the PRECOMPUTED
    * fail-closure of phrase ids ending at s, so the walk never chases
    * fail links just to report matches.
    */
  final class Automaton(
      gotoMaps: Array[java.util.HashMap[String, Integer]],
      fail: Array[Int],
      val out: Array[Array[Int]]) extends Serializable {

    def step(state: Int, tok: String): Int = {
      var s = state
      while (true) {
        val nx = gotoMaps(s).get(tok)
        if (nx != null) return nx.intValue()
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }
  }

  def build(phrases: Array[Array[String]]): Automaton = {
    val gotoMaps = mutable.ArrayBuffer(new java.util.HashMap[String, Integer]())
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie insert
    for (pid <- phrases.indices) {
      var s = 0
      for (tok <- phrases(pid)) {
        val nx = gotoMaps(s).get(tok)
        if (nx == null) {
          gotoMaps += new java.util.HashMap[String, Integer]()
          ends += mutable.ArrayBuffer.empty[Int]
          gotoMaps(s).put(tok, Integer.valueOf(gotoMaps.length - 1))
          s = gotoMaps.length - 1
        } else s = nx.intValue()
      }
      ends(s) += pid
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ends(0).toArray
    // BFS fail links + output closure (parent processed before child,
    // so out(fail(child)) is final when the child is dequeued)
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).forEach { (_, child) =>
      fail(child) = 0
      queue += child.intValue()
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = (ends(s) ++ out(fail(s))).toArray
      gotoMaps(s).forEach { (tok, child) =>
        // fail(child) = deepest proper-suffix state accepting tok
        var f = fail(s)
        var resolved = -1
        while (resolved < 0) {
          val nx = gotoMaps(f).get(tok)
          if (nx != null) resolved = nx.intValue()
          else if (f == 0) resolved = 0
          else f = fail(f)
        }
        fail(child) = resolved
        queue += child.intValue()
      }
    }
    new Automaton(gotoMaps.toArray, fail, out)
  }

  /** counts[i] = occurrences of phrase i (token-sequence match, every
    * end position) in the array<string> token column.
    */
  def dictTagCounts(tokens: Column, phrases: Array[String]): Column =
    GraftBridge.column(DictTagExpr(GraftBridge.expression(tokens), phrases))
}

/** Per-row phrase-occurrence counter over a token array. Input:
  * array<string> (no null elements — `split` output); output:
  * array<bigint> of length |phrases|, index-aligned with the phrase
  * list. Null input propagates NULL.
  */
case class DictTagExpr(child: Expression, phrases: Array[String])
    extends UnaryExpression with CodegenFallback {

  // Array params fall back to reference equality in case-class
  // equals, defeating Catalyst canonicalization (the MatVecExpr
  // lesson) — compare contents.
  override def equals(o: Any): Boolean = o match {
    case e: DictTagExpr => child == e.child &&
      java.util.Arrays.equals(
        phrases.asInstanceOf[Array[AnyRef]], e.phrases.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(java.util.Arrays.hashCode(
      phrases.asInstanceOf[Array[AnyRef]])))

  @transient private lazy val automaton =
    AhoCorasick.build(phrases.map(_.split(" ")))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if phrases.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> tokens and a non-empty dictionary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dict_tag_counts"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](phrases.length)
    var state = 0
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      state = automaton.step(state, toks.getUTF8String(i).toString)
      val hits = automaton.out(state)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): DictTagExpr =
    copy(child = newChild)
}
