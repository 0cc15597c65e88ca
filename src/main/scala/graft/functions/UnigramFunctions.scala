package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column entry point for the compiled unigram-LM Viterbi encoder (see
  * `graft.llm.Unigram` for training and the canonical encoder the
  * expression delegates to).
  */
object UnigramFunctions {
  def unigramEncode(token: Column, pieces: Seq[(String, Long)],
                    maxPieceLen: Int): Column =
    GraftBridge.column(UnigramEncodeExpr(GraftBridge.expression(token),
      pieces, maxPieceLen))
}

/** Viterbi-segments one token under a trained unigram piece table:
  * chars in, minimal-cost piece array out. Same kernel rationale as
  * `BpeEncodeExpr` — the DP is per-element-heavy and a HOF
  * formulation would evaluate interpreted per cell. The piece table
  * ships once per expression instance (driver-side literal); the cost
  * map materializes lazily per executor.
  */
case class UnigramEncodeExpr(child: Expression, pieces: Seq[(String, Long)],
                             maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val costs: Map[String, Long] = pieces.toMap

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val token = input.asInstanceOf[UTF8String].toString
    val subs = graft.llm.Unigram.encodeToken(token, costs, maxPieceLen)
    new GenericArrayData(subs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}
