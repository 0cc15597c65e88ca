package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql], so libraries that define
  * custom Catalyst expressions need one forwarding object inside the
  * org.apache.spark.sql namespace — the established pattern for
  * Spark-native extensions. Nothing else in this package reaches into
  * Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
