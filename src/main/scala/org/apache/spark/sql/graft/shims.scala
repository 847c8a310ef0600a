package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for Spark 4.x, where the classic helpers are
  * `private[sql]`. This is the only file that lives inside the Spark
  * namespace; everything else is plain public API. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def aggColumn(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression())
  def aggColumnDistinct(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression(isDistinct = true))
}
