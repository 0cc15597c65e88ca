package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled URL kernels for the crawl tier.
  *
  * The RFC 3986 percent-decode started life as a pure-Catalyst
  * higher-order-function chain (split on `%`, indexed transform,
  * array_join) — correct, oracle-replayable, but Spark HOFs are
  * CodegenFallback: every %-bearing row paid interpreted lambda
  * dispatch and the measured band tripled. A URL decode is a
  * one-pass byte-local scan — exactly the Sketches/StringFunctions
  * compiled-kernel case — so the hot path is now ONE static method
  * behind a `doGenCode` expression (a real codegen call site, not a
  * fallback), and the DuckDB oracle keeps replaying the identical
  * semantics in SQL. Cite: reference `app.py:76-103` builds its SQL
  * from request URLs but performs no normalization — this tier is
  * part of the commissioned crawl surface, not reference parity.
  */
object UrlFunctions {

  /** RFC 3986 §6.2.2 percent-normalization as a Column: decode `%XX`
    * only for the unreserved set (ALPHA / DIGIT / `-` `.` `_` `~`),
    * uppercase the hex of any other `%XX`, keep a `%` not followed by
    * two hex digits verbatim. NULL-propagating. Semantics are pinned
    * IDENTICAL to the split-on-`%` SQL form the DuckDB oracle runs —
    * `TextOpsSpec` executes the equivalence on the 400-case generator.
    */
  def pctNormalize(c: Column): Column =
    GraftBridge.column(PctNormalizeExpr(GraftBridge.expression(c)))

  /** The kernel, shared by the expression and the spec's reference
    * path so the two cannot drift. One left-to-right pass: at each
    * `%`, if the next two chars are hex and their value is in the
    * unreserved set, emit the character; if hex but reserved, emit
    * `%` + the pair uppercased; otherwise emit `%` alone and continue
    * scanning at the next char (the piece-verbatim rule — a later
    * `%` in the same run is examined on its own). `%`-free input
    * returns the SAME instance (zero-allocation fast path — the
    * overwhelming majority of a real frontier). All triplet
    * characters are ASCII, so the UTF-16 scan can never split a
    * surrogate pair; non-ASCII passes through untouched.
    */
  def pctNormalizeStr(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch != '%') {
        sb.append(ch)
        i += 1
      } else if (i + 2 < n &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if ((v >= 65 && v <= 90) || (v >= 97 && v <= 122) ||
            (v >= 48 && v <= 57) || v == 45 || v == 46 || v == 95 ||
            v == 126) {
          sb.append(v.toChar)
        } else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append('%')
        i += 1
      }
    }
    sb.toString
  }

  /** Hex digit value, -1 for a non-hex char. */
  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** JVM entry point for the generated code (UTF8String in/out). */
  def pctNormalizeU8(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = pctNormalizeStr(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
}

/** String → String percent-normalization with a REAL `doGenCode`
  * (not CodegenFallback): the generated code is one static call into
  * the kernel, so the expression rides whole-stage codegen with no
  * interpreted lambda dispatch — the reason this exists (see the
  * object scaladoc for the measured HOF cost).
  */
case class PctNormalizeExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override protected def nullSafeEval(v: Any): Any =
    UrlFunctions.pctNormalizeU8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UrlFunctions.pctNormalizeU8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PctNormalizeExpr = copy(child = newChild)
}
