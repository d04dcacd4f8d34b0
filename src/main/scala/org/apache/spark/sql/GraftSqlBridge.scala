package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters —
  * the standard extension-library pattern for using a custom Catalyst
  * [[Expression]] from the public DataFrame API without going through a
  * registered SQL function.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
