package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface — the established pattern for
  * Spark extension libraries that define native Catalyst expressions (the
  * Column ⇄ Expression converters live behind `private[sql]` in Spark 4).
  * Everything else in graft stays outside the Spark namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
