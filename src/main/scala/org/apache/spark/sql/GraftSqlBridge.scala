package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions for graft's
  * custom Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor; `classic.ExpressionUtils` is the
  * supported internal path). Lives in the org.apache.spark.sql package
  * solely for access — no Spark internals are modified. */
object GraftSqlBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
