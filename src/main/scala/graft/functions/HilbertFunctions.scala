package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Column entry point for the compiled Hilbert xy→d kernel (see
  * `graft.operators.Hilbert` for the canonical loop and why a pure
  * Column formulation is off the table — the reflect/swap chain
  * doubles the expression tree per bit level).
  */
object HilbertFunctions {
  def hilbertIndex(x: Column, y: Column): Column =
    GraftBridge.column(HilbertIndexExpr(
      GraftBridge.expression(x), GraftBridge.expression(y)))
}

/** 32-bit Hilbert index of two 16-bit dimensions (inputs masked, same
  * contract as `Zorder.spreadBits16`). Pure integer arithmetic;
  * delegates to `Hilbert.xy2d` so kernel and canonical loop cannot
  * drift.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.operators.Hilbert.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}
