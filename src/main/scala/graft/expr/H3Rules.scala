package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual,
  LessThanOrEqual, Literal, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

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

/**
 * Cell-range derivation (SURVEY.md §4, custom inventory item 4, the "v1"
 * entry): `h3_cell_to_parent(cell, r) = <parent literal>` is opaque to
 * data-source filter pushdown, so a 100 TB scan reads every row group even
 * though the H3 bit layout makes the descendant set a tiny, *computable*
 * id range per resolution. This rule ANDs an implied range disjunction
 * onto the filter:
 *
 *   OR_{R=r..15} cell BETWEEN minChild(p, R) AND maxChild(p, R)
 *
 * where minChild/maxChild fix the res field to R and fill digits r+1..R
 * with 0s/6s (digits above R stay 7). The ranges are a strict superset of
 * the descendants (unused-digit patterns inside the range are not valid
 * cells), so the original equality is kept — but the ranges are plain
 * comparisons on a Long column, which reach parquet as PushedFilters and
 * prune row groups by min/max stats when data is clustered by cell id
 * (the Hilbert-layout analogue, SURVEY §4).
 */
object H3ParentRangeDerivation extends Rule[LogicalPlan] with PredicateHelper {

  private[graft] def childRange(p: Long, r: Int, bigR: Int): (Long, Long) = {
    val base = (p & ~(0xFL << 52)) | (bigR.toLong << 52)
    var lo = base
    var hi = base
    var d = r + 1
    while (d <= bigR) {
      val off = 3 * (15 - d)
      lo &= ~(7L << off)
      hi = (hi & ~(7L << off)) | (6L << off)
      d += 1
    }
    (lo, hi)
  }

  private def derived(cell: Expression, r: Int, p: Long): Expression =
    (r to 15).map { bigR =>
      val (lo, hi) = childRange(p, r, bigR)
      And(GreaterThanOrEqual(cell, Literal(lo, LongType)),
        LessThanOrEqual(cell, Literal(hi, LongType)))
    }.reduceLeft(Or)

  private def parentEquality(e: Expression): Option[(Expression, Int, Long)] = e match {
    case EqualTo(H3CellToParent(cell, Literal(r: Int, IntegerType)), Literal(p: Long, LongType)) =>
      Some((cell, r, p))
    case EqualTo(Literal(p: Long, LongType), H3CellToParent(cell, Literal(r: Int, IntegerType))) =>
      Some((cell, r, p))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(parentEquality).collect {
        case (cell, r, p) if r >= 0 && r <= 15 &&
            graft.h3.H3Core.isValidCell(p) && graft.h3.H3Core.getResolution(p) == r =>
          derived(cell, r, p)
      }.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (additions.isEmpty) f
      else Filter((conjuncts ++ additions).reduceLeft(And), child)
  }
}

object H3Optimizations {
  private val rules: Seq[Rule[LogicalPlan]] = Seq(H3ConjunctOrdering, H3ParentRangeDerivation)

  /** attach the rule set to a live session (extensions path is
    * [[H3SparkExtensions]]). */
  def register(spark: SparkSession): Unit = {
    rules.foreach { rule =>
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    }
  }
}
