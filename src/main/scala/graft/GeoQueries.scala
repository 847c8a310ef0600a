package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Driver-contract queries for the geometry/traversal layer (SURVEY.md §2.1
 * S1-S3/S10-S14/S18/S20, §2.2 E3-E8, §2.3 G1-G8, §2.6 X4-X6).
 *
 * DuckDB cannot evaluate H3 geometry, so these queries are *invariant
 * checks*: coordinates are synthesized with arithmetic that is portable
 * across both engines, the Spark side evaluates geometry laws (roundtrips,
 * disk counts, implication chains, tiling ratios against published
 * constants) into boolean columns, and the oracle pins every law to TRUE.
 * A violated law anywhere in the data hash-mismatches the driver compare.
 */
object GeoQueries {

  /** portable synthesized coordinates: identical IEEE doubles in Spark SQL
    * and DuckDB (integer modulo, then double division). */
  private val latSql = "CAST(event_id % 1600 AS DOUBLE) / 10.0 - 80.0 + 0.005"
  private val lngSql = "CAST((event_id * 7) % 3500 AS DOUBLE) / 10.0 - 175.0 + 0.005"

  private def ev(s: SparkSession, dir: String, maxId: Long): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") < maxId)
      .withColumn("lat", expr(latSql))
      .withColumn("lng", expr(lngSql))

  private val RectWkt =
    "POLYGON ((-122.5 37.6, -122.2 37.6, -122.2 37.9, -122.5 37.9, -122.5 37.6))"
  private val RectMinLat = 37.6
  private val RectMaxLat = 37.9
  private val RectMinLng = -122.5
  private val RectMaxLng = -122.2

  private def centroid(cell: Column) = h3_cell_to_latlng(cell)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/S2 + containment: construction and reverse projection agree
    "h3_12_latlng_cell" -> ((s, dir) => {
      ev(s, dir, 4000)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .select(
          col("event_id"),
          h3_is_valid_cell(col("cell")).as("valid_ok"),
          h3_cell_contains_point(col("cell"), col("lat"), col("lng")).as("contains_ok"),
          (h3_latlng_to_cell(centroid(col("cell")).getField("lat"),
            centroid(col("cell")).getField("lng"), lit(9)) === col("cell")).as("rt_ok"),
          (h3_get_resolution(col("cell")) === 9).as("res_ok"))
        .orderBy(col("event_id"))
    }),

    // S11/S12/S23: disk and ring counting laws
    "h3_13_grid_disk" -> ((s, dir) => {
      ev(s, dir, 1500)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .select(
          col("event_id"),
          (size(h3_grid_disk(col("cell"), lit(1))) === 7).as("disk1_ok"),
          (size(h3_grid_disk(col("cell"), lit(2))) === 19).as("disk2_ok"),
          (size(h3_grid_ring(col("cell"), lit(1))) === 6).as("ring1_ok"),
          array_contains(h3_grid_disk(col("cell"), lit(1)), col("cell")).as("self_ok"),
          (size(array_except(h3_grid_disk(col("cell"), lit(1)),
            h3_grid_disk(col("cell"), lit(2)))) === 0).as("nested_ok"),
          (size(h3_grid_disk(col("cell"), lit(2))).cast("long") <=
            h3_max_grid_disk_size(lit(2))).as("bound_ok"))
        .orderBy(col("event_id"))
    }),

    // spiral traversal order + named neighbor-window operator laws
    "h3_30_spiral_window" -> ((s, dir) => {
      import graft.df.H3DataFrameOps._
      val base = ev(s, dir, 1200)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
      val spiral = base.select(
        col("event_id"), col("cell"),
        h3_grid_disk_spiral(col("cell"), lit(2)).as("sp"),
        h3_grid_disk_spiral_distances(col("cell"), lit(2)).as("spd"))
        .select(
          col("event_id"), col("cell"),
          (array_sort(col("sp")) === h3_grid_disk(col("cell"), lit(2))).as("sp_set_ok"),
          (element_at(col("sp"), 1) === col("cell")).as("sp_center_ok"),
          (transform(col("spd"), x => x.getField("k")) ===
            array_sort(transform(col("spd"), x => x.getField("k")))).as("sp_order_ok"),
          (array_sort(transform(filter(col("spd"), x => x.getField("k") === 1),
            x => x.getField("cell"))) ===
            h3_grid_ring(col("cell"), lit(1))).as("sp_ring1_ok"),
          (array_sort(transform(filter(col("spd"), x => x.getField("k") === 2),
            x => x.getField("cell"))) ===
            h3_grid_ring(col("cell"), lit(2))).as("sp_ring2_ok"))
      // neighbor-window laws over the distinct-cell value map
      val cells = base.select(col("cell")).distinct()
        .withColumn("value", pmod(col("cell"), lit(1000L)))
      val winDefault = cells.h3NeighborsWithValues("cell", "value", 1, 1,
          defaultValue = Some(lit(-1L)))
      val winAgg = winDefault.groupBy(col("cell")).agg(
        (count(lit(1)) === 6).as("win_count_ok"),
        min(col("neighbor_value") === pmod(col("neighbor_cell"), lit(1000L)) ||
          col("neighbor_value") === -1L).as("win_val_ok"),
        min(h3_are_neighbor_cells(col("cell"), col("neighbor_cell")) &&
          col("k") === 1).as("win_nbr_ok"),
        sum(when(col("neighbor_value") =!= -1L, 1L).otherwise(0L)).as("__n_known"))
      // the no-default variant must emit exactly the known-neighbor rows
      val winNoDefault = cells.h3NeighborsWithValues("cell", "value", 1, 1)
        .groupBy(col("cell")).agg(count(lit(1)).as("__n_nodefault"))
      val winChecks = winAgg.join(winNoDefault, Seq("cell"), "left")
        .select(col("cell"), col("win_count_ok"), col("win_val_ok"), col("win_nbr_ok"),
          (coalesce(col("__n_nodefault"), lit(0L)) === col("__n_known")).as("win_twin_ok"))
      spiral.join(winChecks, Seq("cell"))
        .select(col("event_id"), col("sp_set_ok"), col("sp_center_ok"),
          col("sp_order_ok"), col("sp_ring1_ok"), col("sp_ring2_ok"),
          col("win_count_ok"), col("win_val_ok"), col("win_nbr_ok"), col("win_twin_ok"))
        .orderBy(col("event_id"))
    }),

    // S9/E7/G6/F5/S19-parse: the operators previously covered by specs
    // only, folded into one driver law query so the correctness gate
    // covers the full §2 inventory.
    "h3_31_misc_laws" -> ((s, dir) => {
      import graft.df.H3DataFrameOps._
      val base = ev(s, dir, 1000)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .withColumn("parent", h3_cell_to_parent(col("cell"), lit(5)))
        .withColumn("edge", element_at(h3_origin_to_directed_edges(col("cell")), 1))
      // S9 ancestry predicates (functions.scala h3_is_parent_of family)
      val perEvent = base.select(
        col("event_id"),
        h3_is_parent_of(col("parent"), col("cell")).as("s9_parent_ok"),
        h3_is_child_of(col("cell"), col("parent")).as("s9_child_ok"),
        h3_cell_contains_cell(col("parent"), col("cell")).as("s9_contains_ok"),
        h3_cell_contains_cell(col("cell"), col("cell")).as("s9_self_ok"),
        (!h3_is_parent_of(col("cell"), col("parent"))).as("s9_neg_ok"),
        // E7: origin/destination centroid distance vs the edge's own exact
        // length (regular-hexagon ratio is sqrt(3) ~ 1.73; H3 distortion
        // stays well inside [1.2, 2.3]) and vs the published res-9 average
        (h3_edge_centroid_distance_km(col("edge")) /
          h3_edge_length_km(col("edge"))).between(1.2, 2.3).as("e7_ratio_ok"),
        h3_edge_centroid_distance_km(col("edge"))
          .between(h3_edge_length_avg_km(lit(9)) * 0.3,
            h3_edge_length_avg_km(lit(9)) * 6.0).as("e7_avg_ok"),
        // S19 parse alternates (cell.rs:348-397 `parse` feature): decimal
        // integer strings and the "lng,lat,res" coordinate triple
        (h3_string_to_cell(col("cell").cast("string")) === col("cell")).as("s19_dec_ok"),
        (h3_string_to_cell(concat_ws(",", col("lng"), col("lat"), lit(9)))
          === col("cell")).as("s19_coord_ok"))
      // F5 partition-by-resolution: partitions are res-pure, cover the
      // frame exactly, and are keyed by the sorted distinct resolutions
      val mixed = base.select(col("cell"))
        .unionAll(base.select(col("parent").as("cell")))
      val parts = mixed.h3PartitionByResolution("cell")
      val partKeysOk = parts.map(_._1) == Seq(5, 9)
      val unionBack = parts.map(_._2).reduceLeft(_ unionAll _)
      // purity via the INDEPENDENT bit-layout derivation of resolution
      // (cell >> 52) & 15 — checking with h3_get_resolution would be a
      // tautology, since that is the very predicate the partitioner used
      val purity = parts.map { case (r, d) =>
        d.agg(coalesce(min(shiftright(col("cell"), 52).bitwiseAND(lit(15L)) === lit(r.toLong)),
          lit(false)).as("p"))
      }.reduceLeft(_ unionAll _).agg(min(col("p")).as("f5_pure_ok"))
      val counts = mixed.groupBy(h3_get_resolution(col("cell")).as("r"))
        .agg(count(lit(1)).as("n1"))
        .join(unionBack.groupBy(h3_get_resolution(col("cell")).as("r"))
          .agg(count(lit(1)).as("n2")), Seq("r"), "full")
        .agg((min(col("n1") <=> col("n2")) && lit(partKeysOk)).as("f5_count_ok"))
      // G6: the driver-side size bound dominates the actual polyfill
      val g6Bound = graft.h3.H3Polygon.maxPolygonToCellsSize(RectWkt, 7)
      val g6 = s.range(1).select(
        (lit(g6Bound) >= size(h3_polygon_to_cells(lit(RectWkt), lit(7))).cast("long"))
          .as("g6_bound_ok"))
      perEvent
        .crossJoin(broadcast(counts))
        .crossJoin(broadcast(purity))
        .crossJoin(broadcast(g6))
        .orderBy(col("event_id"))
    }),

    // S14/G7: distance laws and path connectivity
    "h3_14_distance_path" -> ((s, dir) => {
      val base = ev(s, dir, 1200)
        .withColumn("a", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .withColumn("b", h3_latlng_to_cell(col("lat") + lit(0.01), col("lng") + lit(0.013), lit(9)))
        .withColumn("d", h3_grid_distance(col("a"), col("b")))
        .withColumn("path", h3_grid_path(col("a"), col("b")))
      base.select(
        col("event_id"),
        (col("d").isNotNull && col("d").between(0, 60)).as("d_ok"),
        (h3_grid_distance(col("b"), col("a")) === col("d")).as("sym_ok"),
        (size(col("path")).cast("long") === col("d") + 1).as("pathlen_ok"),
        (element_at(col("path"), 1) === col("a") &&
          element_at(col("path"), -1) === col("b")).as("ends_ok"),
        ((col("d") === 1) === h3_are_neighbor_cells(col("a"), col("b"))).as("nbr_ok"))
        .orderBy(col("event_id"))
    }),

    // E1/E3-E6: edge topology and metrics
    "h3_15_edges_geo" -> ((s, dir) => {
      ev(s, dir, 400)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .select(col("event_id"), col("cell"),
          explode(h3_origin_to_directed_edges(col("cell"))).as("e"))
        .withColumn("dest", h3_edge_destination(col("e")))
        .select(
          col("event_id"),
          h3_are_neighbor_cells(col("cell"), col("dest")).as("nbr_ok"),
          (h3_edge_destination(h3_edge_reverse(col("e"))) === col("cell")).as("rev_ok"),
          (h3_cells_to_directed_edge(col("cell"), col("dest")) === col("e")).as("edge_rt_ok"),
          h3_edge_length_m(col("e")).between(50.0, 400.0).as("len_ok"),
          h3_edge_boundary_wkt(col("e")).startsWith("LINESTRING").as("wkt_ok"),
          (h3_edge_cells(col("e")).getField("origin") === col("cell")).as("cells_ok"))
        .orderBy(col("event_id"))
    }),

    // S18: exact areas against the published average + child tiling
    "h3_16_area" -> ((s, dir) => {
      ev(s, dir, 1200)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(8)))
        .withColumn("a", h3_cell_area_km2(col("cell")))
        .select(
          col("event_id"),
          (col("a") / h3_hexagon_area_avg_km2(lit(8))).between(0.3, 2.5).as("range_ok"),
          (abs(aggregate(
            transform(h3_cell_to_children(col("cell"), lit(9)), c => h3_cell_area_km2(c)),
            lit(0.0d), (acc, x) => acc + x) - col("a")) / col("a") < 0.02).as("children_sum_ok"),
          (h3_cell_area_m2(col("cell")) / (col("a") * lit(1e6))).between(0.999999, 1.000001)
            .as("units_ok"))
        .orderBy(col("event_id"))
    }),

    // G1: polyfill of a fixed rectangle — containment, uniqueness,
    // compact/uncompact roundtrip, count vs published avg cell area
    "h3_17_polyfill" -> ((s, dir) => {
      import s.implicits._
      // rect spherical area / published res-6 avg hex area bounds the count
      val rectAreaKm2 = {
        val r = graft.h3.H3Geo.EarthRadiusKm
        val dLng = math.toRadians(RectMaxLng - RectMinLng)
        (math.sin(math.toRadians(RectMaxLat)) - math.sin(math.toRadians(RectMinLat))) * dLng * r * r
      }
      val published6 = 36.1290521
      val lo = (rectAreaKm2 / published6 * 0.8).toLong
      val hi = (rectAreaKm2 / published6 * 1.2).toLong
      Seq(RectWkt).toDF("wkt")
        .withColumn("cells", h3_polygon_to_cells(col("wkt"), lit(6)))
        .select(
          size(col("cells")).between(lo, hi).as("count_ok"),
          (size(array_distinct(col("cells"))) === size(col("cells"))).as("uniq_ok"),
          forall(col("cells"), c => h3_get_resolution(c) === 6).as("res_ok"),
          forall(col("cells"), c =>
            centroid(c).getField("lat").between(RectMinLat, RectMaxLat) &&
              centroid(c).getField("lng").between(RectMinLng, RectMaxLng)).as("inside_ok"),
          (array_sort(flatten(transform(h3_compact_cells(col("cells")),
            c => h3_uncompact_cell(c, lit(6))))) === array_sort(col("cells"))).as("compact_rt_ok"),
          (size(h3_compact_cells(col("cells"))) < size(col("cells"))).as("compact_smaller_ok"),
          (size(array_except(h3_polygon_to_cells(col("wkt"), lit(6)),
            h3_polygon_to_cells_intersecting(col("wkt"), lit(6)))) === 0).as("subset_ok"))
    }),

    // G3: linestring trace is a connected, deduplicated chain
    "h3_18_linestring" -> ((s, dir) => {
      import s.implicits._
      val wkt = "LINESTRING (-122.45 37.70, -122.35 37.75, -122.30 37.72)"
      Seq(wkt).toDF("wkt")
        .withColumn("cells", h3_linestring_to_cells(col("wkt"), lit(9)))
        .select(
          (size(col("cells")) > 10).as("count_ok"),
          (size(array_distinct(col("cells"))) === size(col("cells"))).as("uniq_ok"),
          forall(zip_with(slice(col("cells"), lit(1), size(col("cells")) - 1),
            slice(col("cells"), lit(2), size(col("cells")) - 1),
            (a, b) => h3_are_neighbor_cells(a, b)), x => x).as("chain_ok"),
          (element_at(col("cells"), 1) ===
            h3_latlng_to_cell(lit(37.70), lit(-122.45), lit(9))).as("start_ok"),
          (element_at(col("cells"), -1) ===
            h3_latlng_to_cell(lit(37.72), lit(-122.30), lit(9))).as("end_ok"))
    }),

    // S20: local IJ roundtrip across disk-2 neighborhoods
    "h3_19_local_ij" -> ((s, dir) => {
      ev(s, dir, 1000)
        .withColumn("origin", h3_latlng_to_cell(col("lat"), col("lng"), lit(9)))
        .withColumn("member", element_at(h3_grid_disk(col("origin"), lit(2)),
          (col("event_id") % 19 + 1).cast("int")))
        .withColumn("ij", h3_cell_to_local_ij(col("origin"), col("member")))
        .select(
          col("event_id"),
          coalesce(h3_local_ij_to_cell(col("origin"),
            col("ij").getField("i"), col("ij").getField("j")) === col("member"), lit(true))
            .as("rt_ok"),
          coalesce(abs(col("ij").getField("i") -
            h3_cell_to_local_ij(col("origin"), col("origin")).getField("i")) <= 2, lit(true))
            .as("near_ok"))
        .orderBy(col("event_id"))
    }),

    // G8/G9/G10: dissolve a polyfilled rect — whole-set and per-parent
    "h3_20_dissolve" -> ((s, dir) => {
      import s.implicits._
      val cellsDf = Seq(RectWkt).toDF("wkt")
        .select(explode(h3_polygon_to_cells(col("wkt"), lit(6))).as("cell"))
      val whole = Seq(RectWkt).toDF("wkt")
        .withColumn("cells", h3_polygon_to_cells(col("wkt"), lit(6)))
        .select(
          h3_cells_to_multipolygon_wkt(col("cells"), lit(false)).as("wkt_all"),
          h3_cells_to_multipolygon_wkt(col("cells"), lit(true)).as("wkt_smooth"))
        .select(
          (size(split(col("wkt_all"), "\\(\\(")) === 2).as("one_outer_ok"),
          // Chaikin + Visvalingam-Whyatt (reference parity) REDUCES the
          // vertex count: the smoothed ring must be strictly simpler
          (length(col("wkt_smooth")) < length(col("wkt_all"))).as("smooth_simplifies_ok"),
          col("wkt_all").startsWith("MULTIPOLYGON").as("prefix_ok"))
      val grouped = cellsDf
        .groupBy(h3_cell_to_parent(col("cell"), lit(4)).as("parent"))
        .agg(collect_list(col("cell")).as("cells"))
        .select(h3_cells_to_multipolygon_wkt(col("cells"), lit(false)).as("w"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("w").startsWith("MULTIPOLYGON ((("), 1L).otherwise(0L)).as("n_good"))
        .select((col("n_groups") === col("n_good")).as("groups_ok"))
      whole.crossJoin(grouped)
    }),

    // C5/C8: connected-component clustering (label propagation) + bounds
    "h3_23_clusters" -> ((s, dir) => {
      import s.implicits._
      import graft.df.H3Clusters
      import graft.h3.{H3Geo, H3Traversal}
      // three well-separated disks + one singleton; disk 1 split into two
      // values along a lat half-plane (each half stays connected)
      val centers = Seq((37.7, -122.4), (48.85, 2.35), (-33.9, 151.2))
      val disks = centers.zipWithIndex.flatMap { case ((lat, lng), i) =>
        H3Traversal.gridDisk(H3Geo.latLngToCell(lat, lng, 7), 1).map(c => (c, i.toLong))
      }
      val single = Seq((H3Geo.latLngToCell(0.0, 0.0, 7), 3L))
      val df = (disks ++ single).toDF("cell", "disk_id")
      val lat1 = centers(1)._1
      val withVal = df.withColumn("value",
        when(col("disk_id") === 1 &&
          h3_cell_to_latlng(col("cell")).getField("lat") >= lat1, lit(10L))
          .otherwise(col("disk_id")))

      // component diameter: any two cells of a k=1 disk are <= 2 steps
      // apart (via the center), so 2 rounds provably converge for `plain`;
      // a value-split half without the center can be a ring arc of 4
      // (diameter 3), so the eq-value variant keeps 3 rounds
      val plain = H3Clusters.cellClusters(df, "cell", fixedRounds = Some(2))
      val byValue = H3Clusters.cellClusters(withVal, "cell", Some("value"), fixedRounds = Some(3))

      // all invariants as ONE declarative plan (single action): per-disk
      // label counts, global cluster counts for both variants, and the
      // bounding-rect containment check via crossJoin against the 1-row
      // aggregate — was 5 separate driver actions before round 3
      val perDisk = plain.groupBy(col("disk_id"))
        .agg(countDistinct(col("cluster")).as("nc"))
        .agg(bool_and(col("nc") === 1).as("one_label"), count(lit(1)).as("n_disks"))
      val nClusters = plain.agg(countDistinct(col("cluster")).as("ncl"))
      val nByValue = byValue.agg(countDistinct(col("cluster")).as("nclv"))
      val disk0 = df.filter(col("disk_id") === 0)
      val bounds = H3Clusters.boundingRect(disk0, "cell")
      val g = h3_cell_to_latlng(col("cell"))
      val violations = disk0.crossJoin(bounds)
        .agg(sum(when(
          !g.getField("lat").between(col("min_lat"), col("max_lat")) ||
          !g.getField("lng").between(col("min_lng"), col("max_lng")), 1L).otherwise(0L))
          .as("n_viol"))

      perDisk.crossJoin(nClusters).crossJoin(nByValue).crossJoin(violations)
        .select(
          (col("ncl") === 4L).as("n_clusters_ok"),
          (col("one_label") && col("n_disks") === 4L).as("one_label_per_disk_ok"),
          (col("nclv") === 5L).as("eq_value_ok"),
          (col("n_viol") === 0L).as("bounds_ok"))
    }),

    // G2/G4: generic geometry dispatch — set-algebra laws tie every WKT
    // type's output to its dedicated operator
    "h3_24_geometry_dispatch" -> ((s, dir) => {
      import s.implicits._
      val poly = RectWkt
      val ls = "LINESTRING (-122.45 37.70, -122.35 37.75, -122.30 37.72)"
      Seq(1).toDF("x")
        .select(
          h3_geometry_to_cells(lit("POINT (-122.42 37.77)"), lit(9)).as("pt"),
          h3_geometry_to_cells(lit("MULTIPOINT ((-122.42 37.77), (2.35 48.85))"), lit(9)).as("mpt"),
          h3_geometry_to_cells(lit(ls), lit(9)).as("gls"),
          array_sort(h3_linestring_to_cells(lit(ls), lit(9))).as("dls"),
          h3_geometry_to_cells(lit(poly), lit(6)).as("gpoly"),
          h3_polygon_to_cells(lit(poly), lit(6)).as("dpoly"),
          h3_geometry_to_cells(lit(s"GEOMETRYCOLLECTION (POINT (2.35 48.85), $poly)"), lit(6)).as("gc"),
          h3_geometry_to_cells(lit("POINT (2.35 48.85)"), lit(6)).as("pt2"))
        .select(
          (element_at(col("pt"), 1) ===
            h3_latlng_to_cell(lit(37.77), lit(-122.42), lit(9))).as("point_ok"),
          (size(col("mpt")) === 2 && array_contains(col("mpt"), element_at(col("pt"), 1)))
            .as("multipoint_ok"),
          (col("gls") === col("dls")).as("linestring_ok"),
          (col("gpoly") === array_sort(col("dpoly"))).as("polygon_ok"),
          (array_sort(array_union(col("dpoly"), col("pt2"))) === col("gc")).as("collection_ok"))
    }),

    // the reference's spatial-index benchmark shape, 1:1 (BASELINE.md:
    // spatialindex.rs:12-80): grid_disk(k=100) at res 8 around (12.3,
    // 45.4) = 30,301 cells; AOI rect (12.28, 45.35)-(12.35, 45.45);
    // coarse envelope hits vs coarse+exact two-stage hits
    "h3_25_spatial_bench" -> ((s, dir) => {
      import s.implicits._
      val center = graft.h3.H3Geo.latLngToCell(45.4, 12.3, 8)
      val aoi = "POLYGON ((12.28 45.35, 12.35 45.35, 12.35 45.45, 12.28 45.45, 12.28 45.35))"
      val cells = Seq(center).toDF("center")
        .select(explode(h3_grid_disk(col("center"), lit(100))).as("cell"))
      val flagged = cells.select(
        col("cell"),
        h3_cell_intersects_bbox(col("cell"), lit(45.35), lit(12.28), lit(45.45), lit(12.35))
          .as("coarse"),
        h3_cell_intersects_polygon(col("cell"), lit(aoi)).as("exact"))
      flagged.agg(
        count(lit(1)).as("n_cells"),
        sum(when(col("coarse"), 1L).otherwise(0L)).as("n_coarse"),
        sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("exact") && !col("coarse"), 1L).otherwise(0L)).as("n_bad"))
        .select(
          (col("n_cells") === 30301L).as("count_ok"),
          (col("n_exact") > 100L && col("n_exact") <= col("n_coarse")).as("stage_ok"),
          (col("n_bad") === 0L).as("implication_ok"),
          (col("n_coarse") < col("n_cells") / 4).as("selective_ok"))
    }),

    // the reference's routing benchmark shape (route_many_to_many,
    // route_germany.rs:27-96): one origin, two destinations, Dijkstra over
    // a metric neighbor-lattice graph (disk k=40 -> ~5k nodes, ~15k
    // bidirectional edges); asserts both paths found, like the reference
    "h3_26_routing_bench" -> ((s, dir) => {
      import s.implicits._
      import graft.graph.H3Graph
      val origin = graft.h3.H3Geo.latLngToCell(47.69, 9.84, 6)
      val disk = graft.h3.H3Traversal.gridDisk(origin, 40)
      val cellSet = disk.toSet
      val edges = disk.flatMap { c =>
        graft.h3.H3Traversal.neighbors(c).filter(n => cellSet.contains(n) && c < n)
          .map(n => (c, n))
      }
      val fwd = edges.toSeq.toDF("origin", "destination")
      val bi = fwd.unionByName(fwd.select(col("destination").as("origin"),
        col("origin").as("destination")))
        .withColumn("weight", h3_great_circle_distance_km(
          h3_cell_to_latlng(col("origin")).getField("lat"),
          h3_cell_to_latlng(col("origin")).getField("lng"),
          h3_cell_to_latlng(col("destination")).getField("lat"),
          h3_cell_to_latlng(col("destination")).getField("lng")))
      val lg = H3Graph.localGraph(bi)
      val dests = Seq(disk.head, disk.last).filter(_ != origin)
      val routes = H3Graph.shortestPathsLocal(s, lg, Seq(origin), dests).collect()
      val costsOk = routes.forall { r =>
        val d = r.getLong(1)
        val straight = graft.h3.H3Geo.greatCircleDistanceRads(
          graft.h3.H3Geo.cellToLatLngRads(origin),
          graft.h3.H3Geo.cellToLatLngRads(d)) * graft.h3.H3Geo.EarthRadiusKm
        r.getDouble(2) >= straight - 1e-9
      }
      Seq((routes.length == dests.length, costsOk))
        .toDF("paths_found_ok", "cost_lower_bound_ok")
    }),

    // G1 antimeridian: a Fiji rect spanning 179E..179W polyfills cells on
    // BOTH sides of the seam, equals the union of its +-180-split halves,
    // and the standalone intersect predicate agrees at the seam
    "h3_27_antimeridian" -> ((s, dir) => {
      import s.implicits._
      val crossing = "POLYGON ((179.0 -17.5, -179.0 -17.5, -179.0 -16.5, 179.0 -16.5, 179.0 -17.5))"
      val east = "POLYGON ((179.0 -17.5, 180.0 -17.5, 180.0 -16.5, 179.0 -16.5, 179.0 -17.5))"
      val west = "POLYGON ((-180.0 -17.5, -179.0 -17.5, -179.0 -16.5, -180.0 -16.5, -180.0 -17.5))"
      Seq(1).toDF("x")
        .select(
          h3_polygon_to_cells(lit(crossing), lit(6)).as("cells"),
          array_sort(array_union(h3_polygon_to_cells(lit(east), lit(6)),
            h3_polygon_to_cells(lit(west), lit(6)))).as("halves"),
          h3_polygon_to_cells_intersecting(lit(crossing), lit(6)).as("inter"))
        .select(
          exists(col("cells"), c => centroid(c).getField("lng") > 0).as("east_ok"),
          exists(col("cells"), c => centroid(c).getField("lng") < 0).as("west_ok"),
          (col("cells") === col("halves")).as("halves_union_ok"),
          forall(col("cells"), c =>
            centroid(c).getField("lat").between(-17.5, -16.5) &&
              (centroid(c).getField("lng") >= 179.0 || centroid(c).getField("lng") <= -179.0))
            .as("inside_ok"),
          (size(array_except(col("cells"), col("inter"))) === 0).as("subset_ok"),
          h3_cell_intersects_polygon(
            h3_latlng_to_cell(lit(-17.0), lit(179.998), lit(6)), lit(crossing)).as("seam_pred_ok"))
    }),

    // polar-cap polyfill (beyond the reference, like h3_27): a ±360°-
    // winding ring encloses a pole; containment is meridian-crossing
    // parity. Pins north/south caps, the band (cap shell + cap hole),
    // exact-lat-threshold equivalence, the intersecting superset law, and
    // the standalone predicate at the pole cell.
    "h3_28_polar" -> ((s, dir) => {
      import s.implicits._
      def ring(lat: Double, east: Boolean): String = {
        val lngs = if (east) -180 until 180 by 30 else 180 until -180 by -30
        (lngs.map(l => s"$l.0 $lat") :+ s"${lngs.head}.0 $lat").mkString(", ")
      }
      val north = s"POLYGON ((${ring(75.0, east = true)}))"
      val south = s"POLYGON ((${ring(-75.0, east = false)}))"
      val band = s"POLYGON ((${ring(60.0, east = true)}), (${ring(80.0, east = true)}))"
      val res = 2
      Seq(1).toDF("x")
        .select(
          h3_polygon_to_cells(lit(north), lit(res)).as("nc"),
          h3_polygon_to_cells(lit(south), lit(res)).as("sc"),
          h3_polygon_to_cells(lit(band), lit(res)).as("bc"),
          h3_polygon_to_cells_intersecting(lit(north), lit(res)).as("ni"))
        .select(
          array_contains(col("nc"),
            h3_latlng_to_cell(lit(89.9999), lit(0.0), lit(res))).as("npole_in"),
          array_contains(col("sc"),
            h3_latlng_to_cell(lit(-89.9999), lit(0.0), lit(res))).as("spole_in"),
          forall(col("nc"), c => centroid(c).getField("lat") > 75.0).as("north_lat_ok"),
          forall(col("sc"), c => centroid(c).getField("lat") < -75.0).as("south_lat_ok"),
          forall(col("bc"), c => centroid(c).getField("lat") > 60.0 &&
            centroid(c).getField("lat") < 80.0).as("band_ok"),
          (size(array_except(col("nc"), col("ni"))) === 0).as("subset_ok"),
          h3_cell_intersects_polygon(
            h3_latlng_to_cell(lit(89.9999), lit(0.0), lit(res)), lit(north)).as("pole_pred_ok"),
          (size(array_intersect(col("nc"), col("sc"))) === 0).as("disjoint_ok"))
    }),

    // Build-once cell index (h3ron-polars spatial_index equivalent):
    // sorted+cached frame, parent-range candidate predicates, exact
    // second stage — must equal the naive filters for BOTH index
    // semantics (rtree envelope-intersect, kdtree centroid-in) across
    // varied AOIs, and actually select (non-trivial hit sets)
    "h3_29_cell_index" -> ((s, dir) => {
      import graft.df.H3CellIndex
      val f = ev(s, dir, 4000)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(6)))
      val idx = H3CellIndex.build(f, "cell", indexRes = Some(6))
      try {
        // AOIs chosen to have non-empty hit sets at every SF (sf0.001's
        // event ids stop at 1000, bounding lat to [-80, 20))
        val aois = Seq((-55.0, 20.0, -45.0, 30.0), (0.0, 55.0, 10.0, 70.0),
          (-10.0, -30.0, 0.0, -10.0))
        val g = h3_cell_to_latlng(col("cell"))
        def tag(df: DataFrame, i: Int, sem: String) =
          df.select(lit(i).as("aoi"), lit(sem).as("sem"), col("event_id"))
        // ONE tagged frame per side (index path vs naive path): 3 driver
        // actions total instead of 6 per AOI
        val got = aois.zipWithIndex.map { case ((a, b, c, d), i) =>
          tag(idx.filterEnvelopeIntersecting(a, b, c, d), i, "env")
            .unionAll(tag(idx.filterCentroidsIn(a, b, c, d), i, "cen"))
        }.reduce(_ unionAll _)
        val ref = aois.zipWithIndex.map { case ((a, b, c, d), i) =>
          tag(f.filter(h3_cell_intersects_bbox(col("cell"),
              lit(a), lit(b), lit(c), lit(d))), i, "env")
            .unionAll(tag(f.filter(g.getField("lat").between(a, c) &&
              g.getField("lng").between(b, d)), i, "cen"))
        }.reduce(_ unionAll _)
        val matches = got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty
        val selective = ref.groupBy(col("aoi"), col("sem")).count()
          .collect().length == aois.length * 2
        import s.implicits._
        Seq((matches, selective)).toDF("index_matches_naive", "aois_selective")
      } finally idx.unpersist()
    }),

    // X4/X6: two-stage spatial predicate implication chain
    "h3_21_spatial_filter" -> ((s, dir) => {
      val rect = "POLYGON ((10.0 5.0, 40.0 5.0, 40.0 25.0, 10.0 25.0, 10.0 5.0))"
      ev(s, dir, 2500)
        .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(7)))
        .withColumn("coarse",
          h3_cell_intersects_bbox(col("cell"), lit(5.0), lit(10.0), lit(25.0), lit(40.0)))
        .withColumn("exact", h3_cell_intersects_polygon(col("cell"), lit(rect)))
        .withColumn("centroid_in",
          centroid(col("cell")).getField("lat").between(5.0, 25.0) &&
            centroid(col("cell")).getField("lng").between(10.0, 40.0))
        .select(
          col("event_id"),
          (!col("exact") || col("coarse")).as("exact_implies_coarse"),
          (!col("centroid_in") || col("exact")).as("centroid_implies_exact"))
        .orderBy(col("event_id"))
    })
  )

  // ---------------------------------------------------------------------

  private def allTrue(names: Seq[String], where: String = "", perEvent: Boolean = true,
      orderBy: String = "event_id"): String = {
    val cols = names.map(n => s"TRUE AS $n").mkString(", ")
    if (perEvent)
      s"SELECT event_id, $cols FROM events $where ORDER BY $orderBy"
    else s"SELECT $cols"
  }

  def oracleSql: Map[String, String] = Map(
    "h3_12_latlng_cell" ->
      allTrue(Seq("valid_ok", "contains_ok", "rt_ok", "res_ok"), "WHERE event_id < 4000"),
    "h3_13_grid_disk" ->
      allTrue(Seq("disk1_ok", "disk2_ok", "ring1_ok", "self_ok", "nested_ok", "bound_ok"),
        "WHERE event_id < 1500"),
    "h3_14_distance_path" ->
      allTrue(Seq("d_ok", "sym_ok", "pathlen_ok", "ends_ok", "nbr_ok"), "WHERE event_id < 1200"),
    "h3_31_misc_laws" ->
      allTrue(Seq("s9_parent_ok", "s9_child_ok", "s9_contains_ok", "s9_self_ok",
        "s9_neg_ok", "e7_ratio_ok", "e7_avg_ok", "s19_dec_ok", "s19_coord_ok",
        "f5_count_ok", "f5_pure_ok", "g6_bound_ok"), "WHERE event_id < 1000"),
    "h3_30_spiral_window" ->
      allTrue(Seq("sp_set_ok", "sp_center_ok", "sp_order_ok", "sp_ring1_ok", "sp_ring2_ok",
        "win_count_ok", "win_val_ok", "win_nbr_ok", "win_twin_ok"), "WHERE event_id < 1200"),
    "h3_15_edges_geo" ->
      s"""SELECT event_id, TRUE AS nbr_ok, TRUE AS rev_ok, TRUE AS edge_rt_ok,
         |  TRUE AS len_ok, TRUE AS wkt_ok, TRUE AS cells_ok
         |FROM events, range(6) t(d) WHERE event_id < 400
         |ORDER BY event_id""".stripMargin,
    "h3_16_area" ->
      allTrue(Seq("range_ok", "children_sum_ok", "units_ok"), "WHERE event_id < 1200"),
    "h3_17_polyfill" ->
      allTrue(Seq("count_ok", "uniq_ok", "res_ok", "inside_ok", "compact_rt_ok",
        "compact_smaller_ok", "subset_ok"), perEvent = false),
    "h3_18_linestring" ->
      allTrue(Seq("count_ok", "uniq_ok", "chain_ok", "start_ok", "end_ok"), perEvent = false),
    "h3_19_local_ij" ->
      allTrue(Seq("rt_ok", "near_ok"), "WHERE event_id < 1000"),
    "h3_20_dissolve" ->
      allTrue(Seq("one_outer_ok", "smooth_simplifies_ok", "prefix_ok", "groups_ok"), perEvent = false),
    "h3_21_spatial_filter" ->
      allTrue(Seq("exact_implies_coarse", "centroid_implies_exact"), "WHERE event_id < 2500"),
    "h3_24_geometry_dispatch" ->
      allTrue(Seq("point_ok", "multipoint_ok", "linestring_ok", "polygon_ok", "collection_ok"),
        perEvent = false),
    "h3_25_spatial_bench" ->
      allTrue(Seq("count_ok", "stage_ok", "implication_ok", "selective_ok"), perEvent = false),
    "h3_26_routing_bench" ->
      allTrue(Seq("paths_found_ok", "cost_lower_bound_ok"), perEvent = false),
    "h3_23_clusters" ->
      allTrue(Seq("n_clusters_ok", "one_label_per_disk_ok", "eq_value_ok", "bounds_ok"),
        perEvent = false),
    "h3_27_antimeridian" ->
      allTrue(Seq("east_ok", "west_ok", "halves_union_ok", "inside_ok", "subset_ok",
        "seam_pred_ok"), perEvent = false),

    "h3_28_polar" ->
      allTrue(Seq("npole_in", "spole_in", "north_lat_ok", "south_lat_ok", "band_ok",
        "subset_ok", "pole_pred_ok", "disjoint_ok"), perEvent = false),

    "h3_29_cell_index" ->
      allTrue(Seq("index_matches_naive", "aois_selective"), perEvent = false)
  )
}
