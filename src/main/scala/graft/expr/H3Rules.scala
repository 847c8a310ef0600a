package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Two-stage spatial filter ordering (SURVEY.md §4, custom inventory item 4):
 * Catalyst does not cost-order conjuncts, and `And` evaluates left to right
 * with short-circuit — so a filter written as `exact AND coarse` would run
 * the expensive exact-geometry predicate on every row. This rule moves the
 * expensive H3 geometry predicates (polygon intersection, boundary-derived
 * tests, point containment) to the END of each Filter's conjunct chain,
 * making the cheap envelope/bit predicates gate them, mirroring the
 * reference's coarse-then-refine spatial query
 * (h3ron-polars/src/spatial_index/mod.rs:113-129).
 *
 * Stable partition => idempotent => safe under repeated optimizer passes.
 */
object H3ConjunctOrdering extends Rule[LogicalPlan] with PredicateHelper {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: H3CellIntersectsPolygon => true
    case _: H3CellContainsPoint => true
    case _: H3CellToBoundaryWkt => true
    case _: H3PolygonToCells | _: H3PolygonToCellsIntersecting => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.length < 2) f
      else {
        val (expensive, cheap) = conjuncts.partition(isExpensive)
        if (expensive.isEmpty || cheap.isEmpty) f
        else {
          val reordered = (cheap ++ expensive).reduceLeft(And)
          if (reordered == cond) f else Filter(reordered, child)
        }
      }
  }
}

object H3Optimizations {
  /** attach the rule set to a live session (extensions path is
    * [[H3SparkExtensions]]). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(H3ConjunctOrdering))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ H3ConjunctOrdering
  }
}
