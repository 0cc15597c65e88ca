package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column entry point for the compiled BPE encoder (see
  * `graft.llm.Bpe` for the training side and the canonical encoder
  * the expression delegates to).
  */
object BpeFunctions {
  def bpeEncode(token: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncodeExpr(GraftBridge.expression(token), merges))
}

/** Applies a trained BPE merge table to one token: chars in, subword
  * array out. Same kernel rationale as the Sketches expressions — the
  * merge loop is per-element-heavy, and a higher-order-function
  * formulation would evaluate interpreted per symbol. The merge table
  * ships once per expression instance (driver-side literal, like the
  * hyperplane/centroid arrays); the rank map is materialized lazily on
  * first use per executor.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val token = input.asInstanceOf[UTF8String].toString
    val subs = graft.llm.Bpe.encodeToken(token, ranks)
    new GenericArrayData(subs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
