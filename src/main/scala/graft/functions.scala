package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.shims
import graft.expr._

/**
 * Public Scala DSL for the H3 function catalog — the Spark equivalent of the
 * reference's typed H3 API (h3ron/src/cell.rs, directed_edge.rs) and its
 * columnar kernels (h3ron-polars/src/algorithm/chunkedarray/).
 *
 * All functions accept `LongType` H3 columns and return NULL for
 * invalid/NULL inputs (reference invalid->null convention,
 * h3ron-polars/src/from.rs:4-33).
 */
object functions {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = shims.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression = shims.expression(col)

  /** S5: cell validity — false (not NULL) for well-typed non-cell values. */
  def h3_is_valid_cell(cell: Column): Column = c(H3IsValidCell(e(cell)))
  /** E2: directed-edge validity. */
  def h3_is_valid_edge(edge: Column): Column = c(H3IsValidEdge(e(edge)))
  /** S15: pentagon test. */
  def h3_is_pentagon(cell: Column): Column = c(H3IsPentagon(e(cell)))
  /** S4/C1: resolution 0-15, NULL when invalid. */
  def h3_get_resolution(cell: Column): Column = c(H3Resolution(e(cell)))
  /** S15: base cell number 0-121. */
  def h3_get_base_cell(cell: Column): Column = c(H3BaseCell(e(cell)))
  /** S6: parent at coarser resolution (pure bit op). */
  def h3_cell_to_parent(cell: Column, res: Column): Column = c(H3CellToParent(e(cell), e(res)))
  /** S8: center child at finer resolution (pure bit op). */
  def h3_cell_to_center_child(cell: Column, res: Column): Column = c(H3CellToCenterChild(e(cell), e(res)))
  /** S7: all children at finer resolution, canonical digit order. */
  def h3_cell_to_children(cell: Column, res: Column): Column = c(H3CellToChildren(e(cell), e(res)))
  /** S7 sizing: 7^n for hexagons, fewer for pentagons. */
  def h3_cell_to_children_size(cell: Column, res: Column): Column = c(H3CellToChildrenSize(e(cell), e(res)))
  /** C2/F2 kernel: identity at target res, children when coarser, NULL when finer. */
  def h3_uncompact_cell(cell: Column, res: Column): Column = c(H3UncompactCell(e(cell), e(res)))
  /** S19: lowercase hex representation. */
  def h3_cell_to_string(cell: Column): Column = c(H3CellToString(e(cell)))
  /** S19: parse hex representation, NULL when not a valid cell/edge. */
  def h3_string_to_cell(s: Column): Column = c(H3StringToCell(e(s)))
  /** S21: digit distinguishing the cell within its direct parent. */
  def h3_direction(cell: Column): Column = c(H3Direction(e(cell)))
  /** S21: digit at an ancestor resolution (1..res). */
  def h3_direction_to_parent(cell: Column, res: Column): Column =
    c(H3DirectionToParentResolution(e(cell), e(res)))
  /** E3: origin cell of a directed edge (pure bit op). */
  def h3_edge_origin(edge: Column): Column = c(H3EdgeOrigin(e(edge)))
  /** S17: the up-to-6 directed edges leaving a cell. */
  def h3_origin_to_directed_edges(cell: Column): Column = c(H3OriginToDirectedEdges(e(cell)))
  /** S23: 3k(k+1)+1 closed form. */
  def h3_max_grid_disk_size(k: Column): Column = c(H3MaxGridDiskSize(e(k)))
  /** S22: the 122 res-0 cells as an array literal. */
  def h3_res0_cells(): Column = c(H3Res0Cells())
  /** C3/F1: distributed compact aggregation. */
  def h3_compact_agg(cell: Column): Column = shims.aggColumn(H3CompactAgg(e(cell)))
}
