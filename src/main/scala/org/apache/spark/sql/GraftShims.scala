package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private Column↔Expression converters that the
  * Spark 4 Connect refactor moved behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). Needed to expose custom
  * Catalyst Expressions as user-facing Columns.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
