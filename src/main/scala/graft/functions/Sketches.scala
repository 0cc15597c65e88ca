package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
