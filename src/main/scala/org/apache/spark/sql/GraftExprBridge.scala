package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column<->Expression converters
  * (Spark 4.x moved Column onto ColumnNode; classic.ExpressionUtils is
  * the sanctioned adapter but is package-private). Standard extension
  * pattern for libraries shipping custom Catalyst expressions.
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
