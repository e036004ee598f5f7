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

/** Same seam for logical plans: build a DataFrame from a custom (already
  * resolved) LogicalPlan — `Dataset.ofRows` is private[sql].
  */
object GraftPlans {
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logical(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
