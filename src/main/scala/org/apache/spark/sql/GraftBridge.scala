package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge to `private[sql]` Column↔Expression converters — the
  * supported pattern for libraries that build native Catalyst expressions
  * against Spark 4's ColumnNode API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
