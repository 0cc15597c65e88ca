package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Compiled sketch kernels as custom Catalyst expressions.
  *
  * Why not higher-order functions: `transform`/`aggregate` lambdas are
  * evaluated INTERPRETED, one boxed call per element — a MinHash
  * signature is numHashes × |shingles| lambda invocations per row
  * (~22M per 5k docs), which dominated the sketch queries' wall time.
  * These expressions run the same math as a tight compiled loop over
  * the unboxed ArrayData, one virtual call per ROW (CodegenFallback is
  * fine at that granularity; a doGenCode variant would only save the
  * per-row call).
  *
  * Both consume a pre-hashed array<bigint> column (xxhash64 of the
  * shingle/token), so string hashing still happens once, upstream, in
  * codegen.
  */
object Sketches {

  /** sig[i] = min over h in hashes of XXH64(h, seed = i). */
  def minhashSig(hashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(hashes), numHashes))

  /** 64-bit SimHash: bit b set iff Σ_h (±1 by bit b of h) >= 0. */
  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(hashes)))

  /** Exact integer dot product of two array<bigint> columns — the
    * quantized-cosine inner loop. Bit-identical to the
    * aggregate(zip_with(...)) formulation it replaces (plain long
    * multiply-add, no overflow at the quantization bounds), one
    * compiled loop per row instead of ~3·dims interpreted lambda calls.
    */
  def dotQ(a: Column, b: Column): Column =
    GraftBridge.column(DotQExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** All `tables` hyperplane-LSH signatures of an array<double> vector
    * in one compiled pass: signature t is the nbits sign bits of the
    * dots against planes[t·nbits … (t+1)·nbits). The planes arrive
    * flattened (tables × nbits × dims) from the driver — they are
    * Spark-internal constants, so precomputing them beats hashing
    * inside a lambda per (table, bit, dim, row).
    */
  def hyperplaneSigs(vec: Column, planes: Array[Double],
                     tables: Int, nbits: Int): Column =
    GraftBridge.column(HyperplaneSigsExpr(GraftBridge.expression(vec), planes, tables, nbits))

  /** Squared L2 distance of an array<double> vector to each of k
    * centroids (flattened k × dims from the driver) in one compiled
    * pass — the IVF assignment inner loop. Bit-identical to the
    * aggregate(zip_with(v, c, (x,y)->(x-y)*(x-y)), 0.0, +) HOF array
    * it replaces (same dim-order summation; FunctionsSpec gates it),
    * which evaluated ~3·k·dims interpreted lambda calls per row.
    */
  def centroidDists(vec: Column, centroids: Array[Double], k: Int): Column =
    GraftBridge.column(CentroidDistsExpr(GraftBridge.expression(vec), centroids, k))

  /** Affine map of an array<double> vector: out[c] = Σ_d m[c·dims+d]·x[d]
    * + bias[c], one compiled pass — the PCA/whitening projection inner
    * loop (the mean subtraction is folded into `bias` by the driver,
    * so the kernel is a single fused multiply-add sweep per row).
    */
  def matVec(vec: Column, m: Array[Double], bias: Array[Double]): Column =
    GraftBridge.column(MatVecExpr(GraftBridge.expression(vec), m, bias))

  /** Asymmetric-distance (ADC) score of a product-quantized vector:
    * Σ_j lut[j·kEff + code_j], where code_j is byte j of the packed
    * int64 code. The probe-side lookup table arrives as a per-probe
    * array<double> column (built once per probe by `matVec` against
    * the block-diagonal codebook matrix), so scoring a candidate is m
    * table lookups — never a d-element dot product. This is the whole
    * point of PQ: the corpus side of the scan reads 8 BYTES per
    * vector (one long) instead of d floats.
    */
  def pqAdc(lut: Column, code: Column, m: Int, kEff: Int): Column =
    GraftBridge.column(PqAdcExpr(GraftBridge.expression(lut),
      GraftBridge.expression(code), m, kEff))
}

/** score = Σ_{j<m} lut[j·kEff + byte_j(code)] — the PQ asymmetric-
  * distance kernel behind `Similarity.pqTopK`. NULL on a malformed
  * lut length or an out-of-range code byte (kEff < 256 leaves unused
  * byte values), so a corrupt code surfaces as an excluded candidate
  * rather than a wrong score.
  */
case class PqAdcExpr(left: Expression, right: Expression, m: Int, kEff: Int)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType)
        if m > 0 && m <= 8 && kEff > 0 && kEff <= 256 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<double>, bigint) and 1<=m<=8, 1<=kEff<=256, got $t")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(lutAny: Any, codeAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    if (lut.numElements() != m * kEff) return null
    val code = codeAny.asInstanceOf[Long]
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = ((code >>> (8 * j)) & 0xffL).toInt
      if (c >= kEff) return null
      if (lut.isNullAt(j * kEff + c)) return null
      s += lut.getDouble(j * kEff + c)
      j += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** out[c] = Σ_d m[c·dims+d] · x[d] + bias[c] for c < k — the affine
  * projection kernel behind `Similarity.pcaProject`. Same null/shape
  * discipline as `CentroidDistsExpr`: wrong length or a null element
  * propagates NULL so the caller can quarantine malformed vectors.
  */
case class MatVecExpr(child: Expression, m: Array[Double], bias: Array[Double])
    extends UnaryExpression with CodegenFallback {

  private val k = bias.length
  private val dims = if (k > 0) m.length / k else 0

  // Case-class equality on Array params is reference equality, which
  // defeats Catalyst canonicalization / subexpression elimination for
  // semantically identical kernels (r8 advisor) — compare contents.
  override def equals(o: Any): Boolean = o match {
    case e: MatVecExpr => child == e.child &&
      java.util.Arrays.equals(m, e.m) && java.util.Arrays.equals(bias, e.bias)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(java.util.Arrays.hashCode(m)),
    Integer.valueOf(java.util.Arrays.hashCode(bias)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k > 0 && dims > 0 &&
      m.length == k * dims => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double> and k·dims matrix, got $t / ${m.length}/${bias.length}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() != dims) return null
    var d0 = 0
    while (d0 < dims) { if (vec.isNullAt(d0)) return null; d0 += 1 }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dims
      var s = bias(c)
      var d = 0
      while (d < dims) { s += m(off + d) * vec.getDouble(d); d += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, containsNull = false) ||
        child.dataType == ArrayType(LongType, containsNull = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<bigint>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, containsNull = false) ||
        child.dataType == ArrayType(LongType, containsNull = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<bigint>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class DotQExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint>, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // match the HOF formulation it replaced: a length mismatch or a
    // null element propagates NULL (zip_with pads with null, null
    // arithmetic poisons the fold) — silently reading 0 for a null
    // slot would fabricate a finite wrong cosine instead
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQExpr =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneSigsExpr(child: Expression, planes: Array[Double],
                              tables: Int, nbits: Int)
    extends UnaryExpression with CodegenFallback {

  private val dims = planes.length / (tables * nbits)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if planes.length == tables * nbits * dims &&
      tables > 0 && nbits > 0 && dims > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double> and tables·nbits·dims planes, got $t / ${planes.length}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dims, vec.numElements())
    // a malformed vector (null element) gets a NULL signature — the
    // callers' coalesce maps that to a sentinel bucket no real vector
    // hashes to, quarantining it instead of polluting a live bucket
    var d0 = 0
    while (d0 < n) { if (vec.isNullAt(d0)) return null; d0 += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < nbits) {
        val off = (t * nbits + j) * dims
        var dot = 0.0
        var d = 0
        while (d < n) { dot += vec.getDouble(d) * planes(off + d); d += 1 }
        sig = (sig << 1) | (if (dot >= 0.0) 1L else 0L)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
}

case class CentroidDistsExpr(child: Expression, centroids: Array[Double], k: Int)
    extends UnaryExpression with CodegenFallback {

  private val dims = if (k > 0) centroids.length / k else 0

  // Content equality for the same reason as MatVecExpr (r8 advisor).
  override def equals(o: Any): Boolean = o match {
    case e: CentroidDistsExpr => child == e.child && k == e.k &&
      java.util.Arrays.equals(centroids, e.centroids)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(k),
    Integer.valueOf(java.util.Arrays.hashCode(centroids)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k > 0 && dims > 0 &&
      centroids.length == k * dims => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double> and k·dims centroids, got $t / ${centroids.length}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dists"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    // match the zip_with formulation it replaced: a length mismatch or
    // null element propagates NULL (zip_with pads with null and null
    // arithmetic poisons the fold) — the caller's coalesce maps that to
    // the -1 sentinel cluster, quarantining malformed vectors
    if (vec.numElements() != dims) return null
    var d0 = 0
    while (d0 < dims) { if (vec.isNullAt(d0)) return null; d0 += 1 }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dims
      var s = 0.0
      var d = 0
      while (d < dims) {
        val diff = vec.getDouble(d) - centroids(off + d)
        s += diff * diff
        d += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistsExpr =
    copy(child = newChild)
}
