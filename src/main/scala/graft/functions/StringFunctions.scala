package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Compiled fuzzy-string kernels for record linkage.
  *
  * The dedup family's string tiers are SET-shaped (n-gram Jaccard,
  * MinHash) or EDIT-shaped (banded Levenshtein); entity resolution
  * over short NAME-shaped strings wants Jaro-Winkler — positional
  * match window + transposition count + common-prefix boost — the
  * census-linkage classic (Jaro 1989, Winkler 1990). One compiled
  * loop per pair (the Sketches.scala rationale); EXACT INTEGER
  * micro-units out, so thresholds are deterministic and the spec's
  * law gates are exact equalities, never float tolerances.
  */
object StringFunctions {

  /** Jaro-Winkler similarity in exact micro-units [0, 1e6].
    * NULL-propagating on either side (an unnamed record matches
    * nothing — the quarantine tier owns it).
    */
  def jaroWinklerMicro(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** The kernel, shared by the expression and the spec's reference
    * path so the two cannot drift. PINNED VARIANT (the
    * commons-text/Wikipedia convention): match window
    * ⌊max(|a|,|b|)/2⌋ − 1 (floored at 0), transpositions =
    * half the mismatched matched-char positions, prefix boost
    * ℓ ≤ 4 at p = 0.1 applied ONLY when jaro > 0.7 (cross-multiplied
    * exactly: 10·num > 21·den — no float enters the gate). Two empty
    * strings are identical (1e6); empty-vs-nonempty is 0. Inputs are
    * TRUNCATED to 1000 chars BY CONTRACT (names/titles — the cap
    * keeps every intermediate inside int64: num ≤ ~6·10⁹,
    * num·1e6 ≤ 6·10¹⁵).
    *
    * Exact rational: with m matches, t2 RAW transposition count
    * (t = t2/2 kept integer by doubling), jaro =
    * (m/la + m/lb + (2m−t2)/(2m))/3 = num/(3·den) with
    * den = la·lb·2m and num = 2m²·lb + 2m²·la + (2m−t2)·la·lb;
    * winkler = ((10−ℓ)·jaro + ℓ)/10 →
    * micro = (((10−ℓ)·num + 3ℓ·den)·1e6) / (30·den), one integer
    * floor-div at the very end.
    */
  private[graft] def jwMicro(sa: String, sb: String): Long = {
    val a = if (sa.length > 1000) sa.substring(0, 1000) else sa
    val b = if (sb.length > 1000) sb.substring(0, 1000) else sb
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1000000L
    if (la == 0 || lb == 0) return 0L
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var t2 = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val mL = m.toLong
    val laL = la.toLong
    val lbL = lb.toLong
    val num = 2L * mL * mL * lbL + 2L * mL * mL * laL +
      (2L * mL - t2) * laL * lbL
    val den = laL * lbL * 2L * mL
    var l = 0
    val lMax = math.min(math.min(la, lb), 4)
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
    // the 0.7 boost gate, cross-multiplied: jaro > 0.7 ⟺ 10·num > 21·den
    val boost = if (10L * num > 21L * den) l.toLong else 0L
    (((10L - boost) * num + 3L * boost * den) * 1000000L) / (30L * den)
  }
}

/** Jaro-Winkler similarity of two strings, exact integer micro-units.
  * See `StringFunctions.jwMicro` for the pinned variant and the
  * int64-safety argument.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_micro"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringFunctions.jwMicro(a.toString, b.toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
