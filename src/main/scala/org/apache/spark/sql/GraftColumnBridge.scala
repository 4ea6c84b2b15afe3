package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters — the
  * supported seam for libraries that define native Catalyst expressions
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * conversion point).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame over an explicitly-constructed LogicalPlan (the
    * private[sql] Dataset.ofRows seam). Used to run a plan REWRITE as a
    * first-class gated query — e.g. the ScaleModeRewrite global-rank
    * construction — without flipping session-wide optimizer state that
    * would leak into every other query in a sweep.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
