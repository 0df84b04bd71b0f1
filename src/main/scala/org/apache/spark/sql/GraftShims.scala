package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column<->Expression conversions (Spark 4 moved
  * the old `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Only used to expose our
  * custom Catalyst expressions as user-facing Columns.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
