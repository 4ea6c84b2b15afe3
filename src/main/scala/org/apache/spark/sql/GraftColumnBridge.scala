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
}
