package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the custom sketch expressions, so
  * `spark.sql("SELECT minhash_sig(hashes, 64) ...")` works the same as
  * the Column API.
  *
  * Two entry points for the two deployment shapes:
  *  - `register(spark)` — imperative, for an existing session
  *    (notebooks, tests).
  *  - `GraftExtensions` — the `spark.sql.extensions=graft.functions.
  *    GraftExtensions` config path, the standard way to install a
  *    library's functions cluster-wide at session build time.
  * Both share the same builders, so behavior cannot drift.
  */
object GraftFunctions {

  private def minhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(hashes, Literal(n: Int, IntegerType)) => MinHashSigExpr(hashes, n)
    case Seq(hashes) => MinHashSigExpr(hashes, 64)
    case _ => throw new IllegalArgumentException(
      "minhash_sig(hashes array<bigint>, numHashes int literal)")
  }

  private def simhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(hashes) => SimHash64Expr(hashes)
    case _ => throw new IllegalArgumentException("simhash64(hashes array<bigint>)")
  }

  private def dotqBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => DotQExpr(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_dotq(a array<bigint>, b array<bigint>)")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> minhashBuilder,
    "simhash64" -> simhashBuilder,
    "graft_dotq" -> dotqBuilder)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[MinHashSigExpr].getName, name),
        builder))
    }
}
