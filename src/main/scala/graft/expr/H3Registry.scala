package graft.expr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL registration for the H3 function catalog, so `spark.sql("SELECT
 * h3_cell_to_parent(cell, 5) ...")` works alongside the Scala DSL
 * ([[graft.functions]]).
 *
 * Two paths: [[H3Registry.register]] for an existing session, and
 * [[H3SparkExtensions]] for `spark.sql.extensions=graft.expr.H3SparkExtensions`.
 */
object H3Registry {

  val expressions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "h3_is_valid_cell" -> (a => H3IsValidCell(a.head)),
    "h3_is_valid_edge" -> (a => H3IsValidEdge(a.head)),
    "h3_is_pentagon" -> (a => H3IsPentagon(a.head)),
    "h3_get_resolution" -> (a => H3Resolution(a.head)),
    "h3_get_base_cell" -> (a => H3BaseCell(a.head)),
    "h3_cell_to_parent" -> (a => H3CellToParent(a(0), a(1))),
    "h3_cell_to_center_child" -> (a => H3CellToCenterChild(a(0), a(1))),
    "h3_cell_to_children" -> (a => H3CellToChildren(a(0), a(1))),
    "h3_cell_to_children_size" -> (a => H3CellToChildrenSize(a(0), a(1))),
    "h3_uncompact_cell" -> (a => H3UncompactCell(a(0), a(1))),
    "h3_cell_to_string" -> (a => H3CellToString(a.head)),
    "h3_string_to_cell" -> (a => H3StringToCell(a.head)),
    "h3_direction" -> (a => H3Direction(a.head)),
    "h3_direction_to_parent" -> (a => H3DirectionToParentResolution(a(0), a(1))),
    "h3_edge_origin" -> (a => H3EdgeOrigin(a.head)),
    "h3_origin_to_directed_edges" -> (a => H3OriginToDirectedEdges(a.head)),
    "h3_max_grid_disk_size" -> (a => H3MaxGridDiskSize(a.head)),
    "h3_res0_cells" -> (_ => H3Res0Cells()),
    "h3_compact_agg" -> (a => H3CompactAgg(a.head).toAggregateExpression())
  )

  def register(spark: SparkSession): Unit = expressions.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }

  private[expr] def injectAll(ext: SparkSessionExtensions): Unit =
    expressions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

/** `--conf spark.sql.extensions=graft.expr.H3SparkExtensions` */
class H3SparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = H3Registry.injectAll(ext)
}
