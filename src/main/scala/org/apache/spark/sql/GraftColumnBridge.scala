package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose custom
  * Catalyst expressions as user-facing `Column`s on Spark 4.x where
  * `Column.expr` / `new Column(expr)` are no longer public.
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column     = classic.ExpressionUtils.column(e)
}
