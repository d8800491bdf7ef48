package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4's
  * unified Column API, for registering custom Catalyst expressions as
  * Columns (SURVEY.md §7.3). Lives in the spark.sql package namespace on
  * purpose; the public surface stays in graft.*.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
