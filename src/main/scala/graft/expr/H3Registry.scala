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
    "h3_compact_agg" -> (a => H3CompactAgg(a.head).toAggregateExpression()),
    // k must be a foldable integer literal (evaluated at registration time)
    "collect_min_k" -> (a =>
      CollectMinK(a(0), a(1).eval().asInstanceOf[Number].intValue).toAggregateExpression()),
    "freq_sketch_k" -> (a =>
      FreqSketchK(a(0), a(1).eval().asInstanceOf[Number].intValue).toAggregateExpression()),
    // geometry / traversal layer
    "h3_latlng_to_cell" -> (a => H3LatLngToCell(a(0), a(1), a(2))),
    "h3_cell_to_latlng" -> (a => H3CellToLatLng(a.head)),
    "h3_cell_to_boundary_wkt" -> (a => H3CellToBoundaryWkt(a.head)),
    "h3_cell_to_boundary" -> (a => H3CellToBoundary(a.head)),
    "h3_cell_bbox" -> (a => H3CellBBox(a.head)),
    "h3_edge_bbox" -> (a => H3EdgeBBox(a.head)),
    "h3_cell_area_rads2" -> (a => H3CellAreaRads2(a.head)),
    "h3_cell_area_km2" -> (a => H3CellAreaKm2(a.head)),
    "h3_cell_area_m2" -> (a => H3CellAreaM2(a.head)),
    "h3_hexagon_area_avg_km2" -> (a => H3HexagonAreaAvgKm2(a.head)),
    "h3_hexagon_area_avg_m2" -> (a => H3HexagonAreaAvgM2(a.head)),
    "h3_edge_length_avg_km" -> (a => H3EdgeLengthAvgKm(a.head)),
    "h3_edge_length_avg_m" -> (a => H3EdgeLengthAvgM(a.head)),
    "h3_cell_centroid_distance_avg_m" -> (a => H3CellCentroidDistanceAvgM(a.head)),
    "h3_grid_disk" -> (a => H3GridDisk(a(0), a(1))),
    "h3_grid_ring" -> (a => H3GridRing(a(0), a(1))),
    "h3_grid_disk_distances" -> (a => H3GridDiskDistances(a(0), a(1))),
    "h3_grid_disk_spiral" -> (a => H3GridDiskSpiral(a(0), a(1))),
    "h3_grid_disk_spiral_distances" -> (a => H3GridDiskSpiralDistances(a(0), a(1))),
    "h3_grid_distance" -> (a => H3GridDistance(a(0), a(1))),
    "h3_grid_path" -> (a => H3GridPath(a(0), a(1))),
    "h3_are_neighbor_cells" -> (a => H3AreNeighborCells(a(0), a(1))),
    "h3_cell_to_local_ij" -> (a => H3CellToLocalIj(a(0), a(1))),
    "h3_local_ij_to_cell" -> (a => H3LocalIjToCell(a(0), a(1), a(2))),
    "h3_cells_to_directed_edge" -> (a => H3CellsToDirectedEdge(a(0), a(1))),
    "h3_edge_destination" -> (a => H3EdgeDestination(a.head)),
    "h3_edge_cells" -> (a => H3EdgeCells(a.head)),
    "h3_edge_reverse" -> (a => H3EdgeReverse(a.head)),
    "h3_edge_boundary_wkt" -> (a => H3EdgeBoundaryWkt(a.head)),
    "h3_edge_length_km" -> (a => H3EdgeLengthKm(a.head)),
    "h3_edge_length_m" -> (a => H3EdgeLengthM(a.head)),
    "h3_polygon_to_cells" -> (a => H3PolygonToCells(a(0), a(1))),
    "h3_polygon_to_cells_intersecting" -> (a => H3PolygonToCellsIntersecting(a(0), a(1))),
    "h3_linestring_to_cells" -> (a => H3LineStringToCells(a(0), a(1))),
    "h3_points_to_cells" -> (a => H3PointsToCells(a(0), a(1), a(2))),
    "h3_geometry_to_cells" -> (a => H3GeometryToCells(a(0), a(1))),
    "h3_cell_intersects_polygon" -> (a => H3CellIntersectsPolygon(a(0), a(1))),
    "h3_cell_contains_point" -> (a => H3CellContainsPoint(a(0), a(1), a(2))),
    "h3_cells_to_multipolygon_wkt" -> (a => H3CellsToMultiPolygonWkt(a(0), a(1))),
    "h3_compact_cells" -> (a => H3CompactCellsArray(a.head))
  )

  def register(spark: SparkSession): Unit = {
    expressions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    H3Optimizations.register(spark)
  }

  private[expr] def injectAll(ext: SparkSessionExtensions): Unit = {
    expressions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectOptimizerRule(_ => H3ConjunctOrdering)
    ext.injectOptimizerRule(_ => H3ParentRangeDerivation)
  }
}

/** `--conf spark.sql.extensions=graft.expr.H3SparkExtensions` */
class H3SparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = H3Registry.injectAll(ext)
}
