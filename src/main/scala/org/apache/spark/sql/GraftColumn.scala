package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions into user-facing Columns:
  * `Column(expr)` / `ExpressionUtils` are private[sql] in Spark 4, so the one
  * line that needs that access lives in this package. No Spark internals are
  * modified — this is the sanctioned extension seam used by Spark connector
  * libraries.
  */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
