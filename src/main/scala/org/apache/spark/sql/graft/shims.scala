package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  /** Drop the origin statistics (and constraints) carried by every
    * LogicalRDD in `df`'s plan while KEEPING the captured
    * outputPartitioning/outputOrdering — the stats-reset every iterative
    * loop needs (`Barriers.statSafe` semantics: with no origin stats the
    * leaf reports `spark.sql.defaultSizeInBytes`, so only AQE's exact
    * runtime sizes can elect a broadcast), without the public
    * `createDataFrame(rdd, schema)` re-wrap that discards the layout.
    * Needs this namespace for `Dataset.ofRows` (private[sql]). */
  def dropOriginStats(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // NOT a `transform`: a LogicalRDD differing only in its second
    // (curried) parameter list is case-EQUAL to the original, so
    // TreeNode's fastEquals change detection would silently keep the old
    // node. Rebuild the expected shapes (the leaf, optionally under
    // projections) by explicit construction; unexpected shapes pass
    // through unchanged (keeping their stats) rather than failing.
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        new org.apache.spark.sql.execution.LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(session, None, None)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        pr.copy(child = strip(pr.child))
      case other => other
    }
    org.apache.spark.sql.classic.Dataset.ofRows(session, strip(df.queryExecution.analyzed))
  }
}
