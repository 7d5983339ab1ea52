package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for Expression ↔ Column conversion — `classic.ExpressionUtils`
  * is private[sql] in Spark 4, so graft's custom Catalyst expressions
  * go through this package-local shim (the standard pattern for Spark
  * extension libraries). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
