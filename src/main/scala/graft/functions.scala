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

  /** Bounded order-statistic collect: the k smallest distinct values per
    * group, sorted ascending — `slice(sort_array(collect_set(x)), 1, k)`
    * with an O(k) aggregation buffer (the dedup hot-band cap kernel). */
  def collect_min_k(col: Column, k: Int): Column = shims.aggColumn(CollectMinK(e(col), k))

  /** Bounded frequent-items sketch (Misra-Gries): at most k (item,
    * count_lb) counters per group — every item with true frequency
    * > N/(k+1) guaranteed present, counts are lower bounds. Candidate
    * generator for [[graft.pipeline.Sketches.heavyHitters]]'s exact
    * two-pass; O(k) state under map-side combine like collect_min_k. */
  def freq_sketch_k(col: Column, k: Int): Column = shims.aggColumn(FreqSketchK(e(col), k))

  // ---- geometry layer (S1-S3, S10-S14, S18, S20, E3-E8, G1-G7, X4-X6) ----

  /** S1: (lat, lng) degrees -> cell at res. */
  def h3_latlng_to_cell(lat: Column, lng: Column, res: Column): Column =
    c(H3LatLngToCell(e(lat), e(lng), e(res.cast("int"))))
  /** S2: centroid as struct(lat, lng) degrees. */
  def h3_cell_to_latlng(cell: Column): Column = c(H3CellToLatLng(e(cell)))
  /** S3: boundary polygon as WKT (lng lat order, closed ring). */
  def h3_cell_to_boundary_wkt(cell: Column): Column = c(H3CellToBoundaryWkt(e(cell)))
  /** S3: boundary vertices as array<struct(lat, lng)>, ring order. */
  def h3_cell_to_boundary(cell: Column): Column = c(H3CellToBoundary(e(cell)))
  /** C8 kernel: boundary envelope struct(min_lat, min_lng, max_lat, max_lng). */
  def h3_cell_bbox(cell: Column): Column = c(H3CellBBox(e(cell)))
  /** C8 kernel for edge columns: envelope of the edge boundary segment. */
  def h3_edge_bbox(edge: Column): Column = c(H3EdgeBBox(e(edge)))
  /** S18: exact spherical cell area. */
  def h3_cell_area_rads2(cell: Column): Column = c(H3CellAreaRads2(e(cell)))
  def h3_cell_area_km2(cell: Column): Column = c(H3CellAreaKm2(e(cell)))
  def h3_cell_area_m2(cell: Column): Column = c(H3CellAreaM2(e(cell)))
  /** S18 static: exact average hexagon area at a res. */
  def h3_hexagon_area_avg_km2(res: Column): Column = c(H3HexagonAreaAvgKm2(e(res.cast("int"))))
  def h3_hexagon_area_avg_m2(res: Column): Column = c(H3HexagonAreaAvgM2(e(res.cast("int"))))
  /** E7 static: average directed-edge length at a res (table-backed,
    * directed_edge.rs:53-70). */
  def h3_edge_length_avg_km(res: Column): Column = c(H3EdgeLengthAvgKm(e(res.cast("int"))))
  def h3_edge_length_avg_m(res: Column): Column = c(H3EdgeLengthAvgM(e(res.cast("int"))))
  /** E7 static: approximate neighbor-centroid distance at a res, m
    * (directed_edge.rs:71-78). */
  def h3_cell_centroid_distance_avg_m(res: Column): Column =
    c(H3CellCentroidDistanceAvgM(e(res.cast("int"))))

  /** S11: all cells within k grid steps (sorted array). */
  def h3_grid_disk(cell: Column, k: Column): Column = c(H3GridDisk(e(cell), e(k.cast("int"))))
  /** S12: cells at exactly k grid steps. */
  def h3_grid_ring(cell: Column, k: Column): Column = c(H3GridRing(e(cell), e(k.cast("int"))))
  /** S13: array of struct(cell, k) within k steps. */
  def h3_grid_disk_distances(cell: Column, k: Column): Column =
    c(H3GridDiskDistances(e(cell), e(k.cast("int"))))
  /** S13 window variant (reference grid_disk_distances(k_min, k_max),
    * cell.rs:186): entries with kmin <= k <= kmax. */
  def h3_grid_disk_distances_window(cell: Column, kmin: Column, kmax: Column): Column = {
    import org.apache.spark.sql.functions.filter
    filter(h3_grid_disk_distances(cell, kmax), s => s.getField("k") >= kmin)
  }
  /** S11 in libh3 SPIRAL traversal order (gridDiskDistancesUnsafe, the
    * order h3ron's GridDiskBuilder iterates — grid_disk.rs:60-77):
    * center, then ring by ring counter-clockwise. Pentagon-distorted
    * disks fall back to (k asc, cell asc) — documented deviation. */
  def h3_grid_disk_spiral(cell: Column, k: Column): Column =
    c(H3GridDiskSpiral(e(cell), e(k.cast("int"))))
  /** [[h3_grid_disk_spiral]] with struct(cell, k) entries. */
  def h3_grid_disk_spiral_distances(cell: Column, k: Column): Column =
    c(H3GridDiskSpiralDistances(e(cell), e(k.cast("int"))))
  /** S12 in spiral walk order: ring k exactly, in the order the libh3
    * spiral traverses it (composition of [[h3_grid_disk_spiral_distances]]
    * — a filter, no second walk). */
  def h3_grid_ring_spiral(cell: Column, k: Column): Column = {
    import org.apache.spark.sql.functions.{filter, transform}
    transform(
      filter(h3_grid_disk_spiral_distances(cell, k), s => s.getField("k") === k),
      s => s.getField("cell"))
  }
  /** S14: grid distance in steps (NULL when not computable). */
  def h3_grid_distance(a: Column, b: Column): Column = c(H3GridDistance(e(a), e(b)))
  /** G7: line of cells between two cells. */
  def h3_grid_path(a: Column, b: Column): Column = c(H3GridPath(e(a), e(b)))
  /** S10: neighbor test. */
  def h3_are_neighbor_cells(a: Column, b: Column): Column = c(H3AreNeighborCells(e(a), e(b)))
  /** S20: local (i, j) coordinates of cell anchored at origin. */
  def h3_cell_to_local_ij(origin: Column, cell: Column): Column =
    c(H3CellToLocalIj(e(origin), e(cell)))
  /** S20 inverse. */
  def h3_local_ij_to_cell(origin: Column, i: Column, j: Column): Column =
    c(H3LocalIjToCell(e(origin), e(i.cast("int")), e(j.cast("int"))))

  /** S16/E1: the directed edge from origin to a neighboring destination. */
  def h3_cells_to_directed_edge(origin: Column, dest: Column): Column =
    c(H3CellsToDirectedEdge(e(origin), e(dest)))
  /** E3: destination cell of a directed edge. */
  def h3_edge_destination(edge: Column): Column = c(H3EdgeDestination(e(edge)))
  /** E3: struct(origin, destination). */
  def h3_edge_cells(edge: Column): Column = c(H3EdgeCells(e(edge)))
  /** E4: reversed edge. */
  def h3_edge_reverse(edge: Column): Column = c(H3EdgeReverse(e(edge)))
  /** E5: edge boundary as WKT LINESTRING. */
  def h3_edge_boundary_wkt(edge: Column): Column = c(H3EdgeBoundaryWkt(e(edge)))
  /** E6: exact edge length. */
  def h3_edge_length_km(edge: Column): Column = c(H3EdgeLengthKm(e(edge)))
  def h3_edge_length_m(edge: Column): Column = c(H3EdgeLengthM(e(edge)))

  /** All direction digits leading to this cell (or edge origin), coarse to
    * fine — digit at each resolution 1..res (reference
    * `H3Direction::iter_directions_over_resolutions`,
    * direction.rs:100-139). Composed: sequence + per-res digit extract. */
  def h3_directions_over_resolutions(cell: Column): Column = {
    import org.apache.spark.sql.functions.{transform, sequence, lit, when, array}
    val res = h3_get_resolution(cell)
    // res-0 guard: sequence(1, 0) is Spark's DESCENDING [1, 0], which would
    // turn a valid res-0 cell into [null, null]; the iterator contract is
    // the empty digit path. Invalid/NULL input keeps NULL (res is NULL).
    when(res > 0,
      transform(sequence(lit(1), res), r => h3_direction_to_parent(cell, r)))
      .when(res === 0, array().cast("array<int>"))
  }

  /** The 5 edges leading away from this edge's destination, excluding the
    * reverse of the input (reference
    * `following_edges_leading_from_destination`, iter/edge.rs:47-58).
    * Composed from codegen'd primitives; 5-element arrays. */
  def h3_edges_leading_from_destination(edge: Column): Column = {
    import org.apache.spark.sql.functions.array_remove
    // array_remove is null-propagating on a NULL array, matching the
    // invalid->NULL convention of the primitives it composes
    array_remove(h3_origin_to_directed_edges(h3_edge_destination(edge)),
      h3_edge_reverse(edge))
  }

  /** The 5 edges leading INTO this edge's origin, excluding the input
    * (reference `previous_edges_leading_to_origin`, iter/edge.rs:35-45):
    * each edge away from the origin except the input itself, reversed. */
  def h3_edges_leading_to_origin(edge: Column): Column = {
    import org.apache.spark.sql.functions.{filter, transform}
    transform(
      filter(h3_origin_to_directed_edges(h3_edge_origin(edge)),
        x => !(x <=> edge)),
      x => h3_edge_reverse(x))
  }

  /** Edges connecting consecutive DISTINCT cells of a path array
    * (reference `continuous_cells_to_edges`, iter/edge.rs:89-141):
    * consecutive duplicate cells are skipped (the iterator's rule), then
    * each adjacent pair becomes a directed edge — a non-neighbor pair
    * yields a NULL element (the reference errors there; NULL is this
    * engine's loud-but-columnar equivalent). Use on `h3_grid_path` /
    * `h3_linestring_to_cells` output. */
  def h3_continuous_cells_to_edges(cells: Column): Column = {
    import org.apache.spark.sql.functions.{filter, zip_with, slice, size, lit, greatest, element_at}
    val dedup = filter(cells, (x, i) => (i === 0) || !(x <=> element_at(cells, i)))
    val n = greatest(size(dedup) - 1, lit(0))
    zip_with(slice(dedup, lit(1), n), slice(dedup, lit(2), n),
      (a, b) => h3_cells_to_directed_edge(a, b))
  }

  /** G1: polyfill — cells at res whose centroid is inside the WKT
    * (MULTI)POLYGON. */
  def h3_polygon_to_cells(wkt: Column, res: Column): Column =
    c(H3PolygonToCells(e(wkt), e(res.cast("int"))))
  /** G5: polyfill including boundary-intersecting cells. */
  def h3_polygon_to_cells_intersecting(wkt: Column, res: Column): Column =
    c(H3PolygonToCellsIntersecting(e(wkt), e(res.cast("int"))))
  /** G3: trace a WKT LINESTRING into cells (traversal order, deduped). */
  def h3_linestring_to_cells(wkt: Column, res: Column): Column =
    c(H3LineStringToCells(e(wkt), e(res.cast("int"))))
  /** G3 over parallel (lons, lats) coordinate arrays — same trace kernel,
    * no WKT formatting round-trip (OSM ingestion path). */
  def h3_points_to_cells(lons: Column, lats: Column, res: Column): Column =
    c(H3PointsToCells(e(lons), e(lats), e(res.cast("int"))))
  /** G2/G4: generic WKT geometry -> sorted distinct cells — full ToH3Cells
    * dispatch incl. POINT/MULTIPOINT/MULTILINESTRING/GEOMETRYCOLLECTION
    * (to_h3.rs:112-127). */
  def h3_geometry_to_cells(wkt: Column, res: Column): Column =
    c(H3GeometryToCells(e(wkt), e(res.cast("int"))))

  /** X6 exact stage: does the cell polygon intersect the WKT polygon? */
  def h3_cell_intersects_polygon(cell: Column, wkt: Column): Column =
    c(H3CellIntersectsPolygon(e(cell), e(wkt)))
  /** exact point-in-cell test (containment by index equality). */
  def h3_cell_contains_point(cell: Column, lat: Column, lng: Column): Column =
    c(H3CellContainsPoint(e(cell), e(lat), e(lng)))

  /** C3 projection form: compact an array column of cells. */
  def h3_compact_cells(cells: Column): Column = c(H3CompactCellsArray(e(cells)))

  /** G8/G10 dissolve: merge an array of cells into a WKT MULTIPOLYGON;
    * use after collect_set/h3_compact_agg for per-group dissolves (G9). */
  def h3_cells_to_multipolygon_wkt(cells: Column, smoothen: Column): Column =
    c(H3CellsToMultiPolygonWkt(e(cells), e(smoothen)))

  /** S9: is `a` an ancestor of `b` (parent at a's res equals a)? False —
    * not NULL — when resolutions make it impossible (res(a) > res(b) makes
    * the parent lookup NULL; the coalesce turns that into false so
    * projections/aggregations see a boolean, not a silent NULL). NULL/
    * invalid inputs still yield NULL (mask-alignment rule). Composed bit
    * ops, codegen'd. */
  def h3_is_parent_of(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{when, coalesce, lit}
    when(h3_is_valid_cell(a) && h3_is_valid_cell(b),
      coalesce(h3_cell_to_parent(b, h3_get_resolution(a)) === a, lit(false)))
  }
  /** S9 inverse. */
  def h3_is_child_of(a: Column, b: Column): Column = h3_is_parent_of(b, a)
  /** S9 `contains`: ancestor-or-self; same false-on-impossible, NULL-on-
    * invalid semantics as [[h3_is_parent_of]]. */
  def h3_cell_contains_cell(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{when, coalesce, lit}
    when(h3_is_valid_cell(a) && h3_is_valid_cell(b),
      (a === b) || coalesce(h3_cell_to_parent(b, h3_get_resolution(a)) === a, lit(false)))
  }

  /** great-circle (haversine) distance between two points in km, pure
    * Column arithmetic (stays in whole-stage codegen). */
  def h3_great_circle_distance_km(lat1: Column, lng1: Column,
      lat2: Column, lng2: Column): Column = {
    import org.apache.spark.sql.functions.{asin => fAsin, sqrt => fSqrt, sin => fSin, cos => fCos, radians, lit, pow}
    val dLat = radians(lat2 - lat1) / 2
    val dLng = radians(lng2 - lng1) / 2
    val h = pow(fSin(dLat), 2) + fCos(radians(lat1)) * fCos(radians(lat2)) * pow(fSin(dLng), 2)
    lit(2.0 * graft.h3.H3Geo.EarthRadiusKm) * fAsin(fSqrt(h))
  }

  /** E7: great-circle distance between the centroids of an edge's origin
    * and destination cells, km. */
  def h3_edge_centroid_distance_km(edge: Column): Column = {
    val cells = h3_edge_cells(edge)
    val o = h3_cell_to_latlng(cells.getField("origin"))
    val d = h3_cell_to_latlng(cells.getField("destination"))
    h3_great_circle_distance_km(o.getField("lat"), o.getField("lng"),
      d.getField("lat"), d.getField("lng"))
  }

  /** X4 coarse stage: does the cell envelope intersect a lat/lng bbox?
    * Composed from [[h3_cell_bbox]] so it stays in whole-stage codegen;
    * NULL cells yield NULL (mask-alignment rule, mod.rs:182-186). */
  def h3_cell_intersects_bbox(cell: Column, minLat: Column, minLng: Column,
      maxLat: Column, maxLng: Column): Column = {
    val b = h3_cell_bbox(cell)
    b.getField("min_lat") <= maxLat && b.getField("max_lat") >= minLat &&
      b.getField("min_lng") <= maxLng && b.getField("max_lng") >= minLng
  }

  /** X5: centroid within euclidean degree-space distance of a point (the
    * reference's kdtree query semantics, spatial_index/mod.rs:76). */
  def h3_cell_within_distance_deg(cell: Column, lat: Column, lng: Column, d: Column): Column = {
    val g = h3_cell_to_latlng(cell)
    val dlat = g.getField("lat") - lat
    val dlng = g.getField("lng") - lng
    (dlat * dlat + dlng * dlng) <= d * d
  }

  /** Intersection size of two sorted, duplicate-free long arrays as one
    * codegen'd merge walk (pipeline extension; see
    * [[graft.expr.SortedLongArrayIntersectSize]]). */
  def sorted_long_array_intersect_size(a: Column, b: Column): Column =
    c(SortedLongArrayIntersectSize(e(a), e(b)))

  /** Dot product of two double arrays as one codegen'd loop (pipeline
    * extension; see [[graft.expr.DoubleArrayDot]]). */
  def double_array_dot(a: Column, b: Column): Column =
    c(DoubleArrayDot(e(a), e(b)))

  /** Sorted distinct xxhash64 char-n-gram set in one codegen'd loop
    * (pipeline extension; see [[graft.expr.SortedDistinctNgramHashes]]). */
  def sorted_distinct_ngram_hashes(text: Column, n: Int): Column =
    c(SortedDistinctNgramHashes(e(text), n))

  /** Per-term occurrence counts over a token array in one codegen'd pass
    * (pipeline extension; see [[graft.expr.TermCounts]]). */
  def term_counts(tokens: Column, terms: Seq[String]): Column =
    c(TermCounts(e(tokens), terms))

  /** MinHash signature (k permutation minima over word-ngram shingles) in
    * one codegen'd pass (pipeline extension; see
    * [[graft.expr.MinHashSignature]]). */
  def minhash_signature(tokens: Column, ngram: Int, k: Int): Column =
    c(MinHashSignature(e(tokens), ngram, k))

  /** Positional 60-bit md5 word-n-gram hashes in one codegen'd pass
    * (pipeline extension; see [[graft.expr.WordNgramMd5Hashes]]). */
  def word_ngram_md5_hashes(tokens: Column, n: Int): Column =
    c(WordNgramMd5Hashes(e(tokens), n))

  /** 60-bit SimHash of a token array in one codegen'd pass (pipeline
    * extension; see [[graft.expr.SimHash60]]). */
  def simhash60(tokens: Column): Column = c(SimHash60(e(tokens)))
}
