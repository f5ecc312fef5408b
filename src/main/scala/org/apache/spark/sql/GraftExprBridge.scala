package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column <-> Expression converters —
  * the standard pattern for extension libraries that define custom
  * Catalyst expressions against Spark 4's ColumnNode-based Column.
  */
object GraftExprBridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
