package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._
import graft.h3.{H3Core, H3Geo, H3Traversal}

class H3GeoExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = 0x89283080ddbffffL // res-9 cell in San Francisco

  test("latlng_to_cell golden through Spark") {
    val out = Seq((37.3615593, -122.0553238)).toDF("lat", "lng")
      .select(h3_latlng_to_cell($"lat", $"lng", lit(7)).as("cell"))
      .as[Long].head()
    assert(out == 0x87283472bffffffL)
  }

  test("cell_to_latlng roundtrips through latlng_to_cell") {
    val cells = Seq(sf, 0x85283473fffffffL).toDF("cell")
    val rt = cells.select(
      $"cell",
      h3_latlng_to_cell(
        h3_cell_to_latlng($"cell").getField("lat"),
        h3_cell_to_latlng($"cell").getField("lng"),
        h3_get_resolution($"cell")).as("rt"))
      .as[(Long, Long)].collect()
    rt.foreach { case (c, r) => assert(c == r) }
  }

  test("grid disk/ring/distance expressions agree with the kernel") {
    val row = Seq(sf).toDF("cell").select(
      size(h3_grid_disk($"cell", lit(2))).as("n2"),
      size(h3_grid_ring($"cell", lit(1))).as("r1"),
      array_contains(h3_grid_disk($"cell", lit(1)), $"cell").as("selfIn"),
      size(h3_grid_disk_distances($"cell", lit(2))).as("ndd"),
      // k=0 edge cases (reference test_grid_ring_unsafe_0): both are [self]
      h3_grid_ring($"cell", lit(0)).as("r0"),
      h3_grid_disk($"cell", lit(0)).as("d0")).head()
    assert(row.getInt(0) == 19 && row.getInt(1) == 6 && row.getBoolean(2) && row.getInt(3) == 19)
    assert(row.getSeq[Long](4) == Seq(sf) && row.getSeq[Long](5) == Seq(sf))

    val ring = H3Traversal.gridRing(sf, 3)
    val d = Seq((sf, ring.head)).toDF("a", "b")
      .select(h3_grid_distance($"a", $"b"), size(h3_grid_path($"a", $"b")),
        h3_are_neighbor_cells($"a", $"b")).head()
    assert(d.getLong(0) == 3 && d.getInt(1) == 4 && !d.getBoolean(2))
  }

  test("edge expressions: destination, reverse, length, boundary") {
    val out = Seq(sf).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("e"), $"cell")
      .select(
        h3_edge_destination($"e").as("dest"),
        h3_edge_cells($"e").getField("origin").as("o"),
        h3_are_neighbor_cells($"cell", h3_edge_destination($"e")).as("nb"),
        h3_edge_length_m($"e").as("len"),
        h3_edge_boundary_wkt($"e").as("wkt"),
        h3_edge_destination(h3_edge_reverse($"e")).as("back"),
        $"cell")
      .collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getLong(1) == sf && r.getBoolean(2) && r.getLong(6) == r.getLong(5))
      assert(r.getDouble(3) > 100 && r.getDouble(3) < 400) // res-9 edges ~174 m
      assert(r.getString(4).startsWith("LINESTRING"))
    }
  }

  test("cell area and avg-area expressions") {
    val r = Seq(sf).toDF("cell")
      .select(h3_cell_area_km2($"cell").as("a"), h3_hexagon_area_avg_km2(lit(9)).as("avg")).head()
    assert(r.getDouble(0) > 0.05 && r.getDouble(0) < 0.2) // res-9 hexagons ~0.105 km2
    assert(math.abs(r.getDouble(1) - 0.1053325) / 0.105 < 0.01) // published res-9 avg
  }

  test("polyfill expression: centroids inside, res right, compact roundtrip") {
    val wkt = "POLYGON ((-122.5 37.6, -122.2 37.6, -122.2 37.9, -122.5 37.9, -122.5 37.6))"
    val cellsDf = Seq(wkt).toDF("wkt")
      .select(explode(h3_polygon_to_cells($"wkt", lit(7))).as("cell"))
    val n = cellsDf.count()
    assert(n > 100 && n < 500, s"polyfill count $n")
    val bad = cellsDf.filter(
      !h3_cell_contains_point(
        h3_latlng_to_cell(h3_cell_to_latlng($"cell").getField("lat"),
          h3_cell_to_latlng($"cell").getField("lng"), lit(7)),
        h3_cell_to_latlng($"cell").getField("lat"),
        h3_cell_to_latlng($"cell").getField("lng"))).count()
    assert(bad == 0)
    // intersecting variant is a superset
    val nInter = Seq(wkt).toDF("wkt")
      .select(explode(h3_polygon_to_cells_intersecting($"wkt", lit(7))).as("cell")).count()
    assert(nInter > n)
  }

  test("linestring trace produces a connected chain") {
    val wkt = "LINESTRING (-122.45 37.7, -122.35 37.75, -122.3 37.72)"
    val cells = Seq(wkt).toDF("wkt")
      .select(explode(h3_linestring_to_cells($"wkt", lit(9))).as("cell"))
      .as[Long].collect()
    assert(cells.length > 10)
    assert(cells.distinct.length == cells.length)
  }

  test("two-stage spatial predicate: exact implies coarse") {
    val wkt = "POLYGON ((-122.5 37.6, -122.2 37.6, -122.2 37.9, -122.5 37.9, -122.5 37.6))"
    val cells = (0 until 300).map { i =>
      H3Geo.latLngToCell(37.4 + i * 0.003, -122.6 + i * 0.002, 7)
    }.toDF("cell")
    val checked = cells.select(
      h3_cell_intersects_bbox($"cell", lit(37.6), lit(-122.5), lit(37.9), lit(-122.2)).as("coarse"),
      h3_cell_intersects_polygon($"cell", lit(wkt)).as("exact"))
    assert(checked.filter($"exact" && !$"coarse").count() == 0)
    assert(checked.filter($"exact").count() > 0)
  }

  test("dissolve merges a disk into one outer ring") {
    val disk = H3Traversal.gridDisk(sf, 2)
    val wkt = Seq(1).toDF("x")
      .select(h3_cells_to_multipolygon_wkt(
        lit(disk), lit(false)).as("wkt")).as[String].head()
    assert(wkt.startsWith("MULTIPOLYGON"))
    // one outer ring, no holes: exactly one "((" opener after the prefix
    val nPolys = "\\(\\(".r.findAllIn(wkt).length
    assert(nPolys == 1, s"expected single outer ring, got $nPolys in ${wkt.take(120)}")
    // the dissolved ring of a k=2 disk has 6*(2k+1)=30 boundary vertices
    val nVerts = wkt.count(_ == ',') + 1
    assert(nVerts >= 30, s"outer ring only $nVerts verts")
  }

  test("local ij expressions roundtrip") {
    val disk = H3Traversal.gridDisk(sf, 2).toSeq.toDF("cell")
    val rt = disk.select(
      $"cell",
      h3_local_ij_to_cell(lit(sf),
        h3_cell_to_local_ij(lit(sf), $"cell").getField("i"),
        h3_cell_to_local_ij(lit(sf), $"cell").getField("j")).as("rt"))
      .as[(Long, Long)].collect()
    rt.foreach { case (c, r) => assert(c == r) }
  }

  test("parent/child predicates and centroid distance compositions") {
    val parent = graft.h3.H3Core.cellToParent(sf, 5)
    val other = 0x8a2a1072b59ffffL
    val r = Seq((parent, sf, other)).toDF("p", "c", "o").select(
      h3_is_parent_of($"p", $"c").as("a"),
      h3_is_child_of($"c", $"p").as("b"),
      h3_cell_contains_cell($"p", $"p").as("self"),
      h3_is_parent_of($"p", $"o").as("wrong"),
      h3_great_circle_distance_km(lit(37.0), lit(-122.0), lit(48.85), lit(2.35)).as("km")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
    assert(math.abs(r.getDouble(4) - 8980.0) < 150.0) // SF-ish to Paris

    val edges = Seq(sf).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("e"))
      .select(h3_edge_centroid_distance_km($"e").as("d")).as[Double].collect()
    // res-9 centroid spacing ~ 2x edge length ~ 350 m
    assert(edges.forall(d => d > 0.2 && d < 0.6))
  }

  test("is_parent_of is false (not NULL) on impossible resolutions, NULL on invalid") {
    val parent = graft.h3.H3Core.cellToParent(sf, 5)
    val rows = Seq((parent, sf)).toDF("p", "c").select(
      // res(c)=9 > res(p)=5 reversed: a finer cell can never be a parent
      h3_is_parent_of($"c", $"p").as("impossible"),
      h3_cell_contains_cell($"c", $"p").as("impossible_contains"),
      h3_is_parent_of(lit(null).cast("long"), $"c").as("null_a"),
      h3_is_parent_of(lit(12345L), $"c").as("invalid_a")).head()
    assert(!rows.isNullAt(0) && !rows.getBoolean(0),
      "res(a)>res(b) must yield false, not NULL")
    assert(!rows.isNullAt(1) && !rows.getBoolean(1))
    assert(rows.isNullAt(2), "NULL input must propagate NULL")
    assert(rows.isNullAt(3), "invalid cell input must yield NULL")
  }

  test("dissolve attaches a hole to its innermost parent ring") {
    // ring of cells with the center removed -> one outer ring with one hole
    val disk = H3Traversal.gridDisk(sf, 1).filterNot(_ == sf)
    val wkt = Seq(1).toDF("x")
      .select(h3_cells_to_multipolygon_wkt(lit(disk), lit(false)).as("wkt"))
      .as[String].head()
    assert(wkt.startsWith("MULTIPOLYGON"))
    // one polygon, two rings (outer + hole): "((" appears once, and the
    // polygon body has exactly one "), (" ring separator
    assert("\\(\\(".r.findAllIn(wkt).length == 1, wkt.take(120))
    assert(wkt.contains("), ("), s"expected a hole ring in ${wkt.take(120)}")
  }

  test("smoothing conformance: donut smooths to <10 verts/ring, topology kept (smoothen.rs:85-110)") {
    // port of the reference's smooth_donut_linked_polygon test: a k=4
    // grid ring at res 6 dissolves to one outer ring + one hole; the
    // Chaikin + Visvalingam-Whyatt smoothing must reduce each ring to
    // fewer than 10 vertices without changing the ring topology
    val center = H3Geo.latLngToCell(12.3, 23.3, 6)
    val ring4 = H3Traversal.gridRing(center, 4)
    def ringSizes(smooth: Boolean): Seq[Int] = {
      val wkt = Seq(1).toDF("x")
        .select(h3_cells_to_multipolygon_wkt(lit(ring4), lit(smooth)).as("w"))
        .as[String].head()
      assert(wkt.startsWith("MULTIPOLYGON"))
      assert("\\(\\(".r.findAllIn(wkt).length == 1, s"one polygon expected: ${wkt.take(100)}")
      "\\(([^()]+)\\)".r.findAllMatchIn(wkt).map(_.group(1).count(_ == ',') + 1).toSeq
    }
    val raw = ringSizes(smooth = false)
    val smoothed = ringSizes(smooth = true)
    assert(raw.length == 2 && smoothed.length == 2, "outer + hole on both sides")
    assert(smoothed.forall(_ < 10), s"smoothed ring sizes $smoothed")
    // vertex-count REDUCTION: the VW sweep must simplify, not inflate
    raw.zip(smoothed.sorted.reverse).foreach { case (r, _) => () }
    assert(smoothed.sum < raw.sum, s"expected reduction, got $raw -> $smoothed")
  }

  test("conjunct-ordering rule gates exact geometry behind cheap predicates") {
    H3Optimizations.register(spark)
    val wkt = "POLYGON ((-122.5 37.6, -122.2 37.6, -122.2 37.9, -122.5 37.9, -122.5 37.6))"
    // parquet-backed source (a local Seq would be folded away entirely);
    // written with the expensive predicate FIRST
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(($"doc_id" + 0x8528347fffffffL).as("cell"))
      .filter(h3_cell_intersects_polygon($"cell", lit(wkt)) && $"cell" % 2 === 1)
    val optimized = df.queryExecution.optimizedPlan
    val filterCond = optimized.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c
    }
    assert(filterCond.isDefined)
    // after reordering the top-level And's LEFT side must be the cheap one
    val top = filterCond.get.asInstanceOf[org.apache.spark.sql.catalyst.expressions.And]
    assert(!top.left.exists(_.isInstanceOf[H3CellIntersectsPolygon]),
      s"expensive predicate still first: $top")
    assert(top.right.exists(_.isInstanceOf[H3CellIntersectsPolygon]))
    // still executes fine after reordering
    assert(df.count() >= 0)
  }

  test("grid disk distances window slices by k (S13 kmin..kmax)") {
    val row = Seq(sf).toDF("cell").select(
      h3_grid_disk_distances_window($"cell", lit(2), lit(3)).as("w"),
      h3_grid_ring($"cell", lit(2)).as("r2"),
      h3_grid_ring($"cell", lit(3)).as("r3")).head()
    val w = row.getSeq[org.apache.spark.sql.Row](0)
    assert(w.map(_.getInt(1)).forall(k => k == 2 || k == 3))
    assert(w.map(_.getLong(0)).toSet ==
      (row.getSeq[Long](1) ++ row.getSeq[Long](2)).toSet)
  }

  test("aligned dissolve produces one multipolygon per alignment parent") {
    import graft.df.H3DataFrameOps._
    val disk = H3Traversal.gridDisk(sf, 3).toSeq.toDF("cell")
    val out = disk.h3AlignedDissolve("cell", alignRes = 7)
      .as[(Long, String)].collect()
    assert(out.length >= 2, "a k=3 res-9 disk spans multiple res-7 parents")
    assert(out.forall(_._2.startsWith("MULTIPOLYGON")))
    // every parent is a res-7 ancestor of some disk cell
    val parents = H3Traversal.gridDisk(sf, 3).map(graft.h3.H3Core.cellToParent(_, 7)).toSet
    assert(out.map(_._1).toSet == parents)
  }

  test("invalid cells survive clustering as singleton clusters") {
    import graft.df.H3Clusters
    // 0 and a corrupted long: h3_grid_ring is NULL for both; the rows must
    // come back labeled by themselves, not silently dropped
    val df = (H3Traversal.gridDisk(sf, 1) ++ Seq(0L, 12345L)).toSeq.toDF("cell")
    val out = H3Clusters.cellClusters(df, "cell", fixedRounds = Some(2))
    assert(out.count() == df.count())
    val labels = out.select($"cell", $"cluster").as[(Long, Long)].collect().toMap
    assert(labels(0L) == 0L && labels(12345L) == 12345L)
  }

  test("NULL cells survive clustering as NULL-labeled singletons") {
    import graft.df.H3Clusters
    // a plain USING join would drop the NULL-key row (NULL = NULL is not
    // true); the null-safe membership join must keep it, labeled NULL
    val df = (H3Traversal.gridDisk(sf, 1).map(Option(_)) ++ Seq(None))
      .toSeq.toDF("cell")
    val out = H3Clusters.cellClusters(df, "cell", fixedRounds = Some(2))
    assert(out.count() == df.count())
    val nullRows = out.filter($"cell".isNull).select($"cluster").collect()
    assert(nullRows.length == 1 && nullRows.head.isNullAt(0))
    // eq-value variant: NULL value keys survive too
    val vdf = Seq((sf, Option(1)), (sf + 1L, Option.empty[Int])).toDF("cell", "v")
    val vout = H3Clusters.cellClusters(vdf, "cell", valueCol = Some("v"), fixedRounds = Some(1))
    assert(vout.count() == 2)
  }

  test("cluster convergence loop handles a long path (diameter >> 1)") {
    import graft.df.H3Clusters
    // a grid path of ~20 cells: min-label needs ~path-length rounds under
    // naive flooding; the convergence loop must iterate until stable
    val a = sf
    val g = H3Geo.cellToLatLng(a)
    val b = H3Geo.latLngToCell(g.lat + 0.04, g.lng, 9)
    val path = H3Traversal.gridPathCells(a, b)
    assert(path.length >= 10, s"path only ${path.length} cells")
    val far = H3Geo.latLngToCell(48.85, 2.35, 9) // disconnected singleton
    val df = (path :+ far).toSeq.toDF("cell")
    val out = H3Clusters.cellClusters(df, "cell") // fixedRounds = None
    val clusters = out.select($"cell", $"cluster").as[(Long, Long)].collect()
    val pathLabels = clusters.filter(c => path.contains(c._1)).map(_._2).toSet
    assert(pathLabels == Set(path.min), s"path must converge to one min label, got $pathLabels")
    assert(clusters.find(_._1 == far).get._2 == far)
  }

  test("cellClusters: pointer halving converges a snake cluster longer than the iteration budget") {
    // a grid path is one long connected chain — the worst case for plain
    // one-hop min-label propagation (O(length) rounds, silently split at
    // maxIterations=64 before the compression step existed)
    val a = H3Geo.latLngToCell(37.75, -122.45, 8)
    val g = H3Geo.cellToLatLng(a)
    val b = H3Geo.latLngToCell(g.lat + 0.95, g.lng, 8)
    val path = H3Traversal.gridPathCells(a, b)
    assert(path.length > 100, s"snake only ${path.length} cells")
    val out = graft.df.H3Clusters.cellClusters(path.toSeq.toDF("cell"), "cell")
    val labels = out.select($"cluster").as[Long].collect().toSet
    assert(labels == Set(path.min),
      s"snake split into ${labels.size} clusters")
  }

  test("boundary struct array and edge bbox agree with cell geometry") {
    val row = Seq(sf).toDF("cell").select(
      h3_cell_to_boundary($"cell").as("b"),
      h3_cell_bbox($"cell").as("cb"),
      h3_cell_to_boundary_wkt($"cell").as("w")).head()
    val verts = row.getSeq[org.apache.spark.sql.Row](0)
    assert(verts.length >= 5 && verts.length <= 7) // hexagon, class III distortion
    val cb = row.getStruct(1)
    // struct-array boundary envelope == bbox struct
    assert(math.abs(verts.map(_.getDouble(0)).min - cb.getDouble(0)) < 1e-12)
    assert(math.abs(verts.map(_.getDouble(1)).min - cb.getDouble(1)) < 1e-12)
    // WKT has the same vertex count (+1 for ring closure)
    assert(row.getString(2).count(_ == ',') == verts.length)

    // edge bbox: contained in the union of origin+destination cell bboxes
    val er = Seq(sf).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("e"))
      .select(h3_edge_bbox($"e").as("eb"),
        h3_cell_bbox(h3_edge_origin($"e")).as("ob"),
        h3_cell_bbox(h3_edge_destination($"e")).as("db")).collect()
    er.foreach { r =>
      val (eb, ob, db) = (r.getStruct(0), r.getStruct(1), r.getStruct(2))
      assert(eb.getDouble(0) >= math.min(ob.getDouble(0), db.getDouble(0)) - 1e-9)
      assert(eb.getDouble(2) <= math.max(ob.getDouble(2), db.getDouble(2)) + 1e-9)
    }
    // aggregate C8 over the edge column
    import graft.df.H3Clusters
    val edf = Seq(sf).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("e"))
    val agg = H3Clusters.boundingRect(edf, "e", edges = true).head()
    assert(agg.getDouble(0) < agg.getDouble(2) && agg.getDouble(1) < agg.getDouble(3))
  }

  test("generic geometry dispatch covers the full ToH3Cells enum") {
    val res = 9
    def cellsOf(wkt: String): Seq[Long] =
      Seq(wkt).toDF("w").select(h3_geometry_to_cells($"w", lit(res)).as("c"))
        .as[Seq[Long]].head()
    val pt = cellsOf("POINT (-122.42 37.77)")
    assert(pt == Seq(H3Geo.latLngToCell(37.77, -122.42, res)))
    val mp = cellsOf("MULTIPOINT ((-122.42 37.77), (2.35 48.85))")
    assert(mp.toSet == Set(H3Geo.latLngToCell(37.77, -122.42, res),
      H3Geo.latLngToCell(48.85, 2.35, res)))
    // bare-coordinate MULTIPOINT form
    assert(cellsOf("MULTIPOINT (-122.42 37.77, 2.35 48.85)").toSet == mp.toSet)
    val ls = cellsOf("LINESTRING (-122.45 37.70, -122.35 37.75)")
    assert(ls.nonEmpty && ls == ls.sorted && ls.distinct == ls)
    val mls = cellsOf("MULTILINESTRING ((-122.45 37.70, -122.35 37.75), (2.30 48.80, 2.40 48.90))")
    assert(ls.toSet.subsetOf(mls.toSet) && mls.size > ls.size)
    val poly = "POLYGON ((-122.5 37.6, -122.2 37.6, -122.2 37.9, -122.5 37.9, -122.5 37.6))"
    val pc = cellsOf(poly)
    assert(pc.nonEmpty)
    val gc = cellsOf(s"GEOMETRYCOLLECTION (POINT (2.35 48.85), $poly)")
    assert(gc.toSet == pc.toSet + H3Geo.latLngToCell(48.85, 2.35, res))
    assert(cellsOf("TRIANGLEISH (1 2)") == Seq.empty)
  }

  test("parent-range derivation rule pushes prunable ranges to the scan") {
    H3Optimizations.register(spark)
    val res5 = graft.h3.H3Core.cellToParent(sf, 5)
    // parquet-backed source so pushdown is observable
    val dir = java.nio.file.Files.createTempDirectory("rangerule").toString
    val cells = graft.h3.H3Traversal.gridDisk(sf, 3).toSeq.toDF("cell")
    cells.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(h3_cell_to_parent($"cell", lit(5)) === res5)
    // 1. rule fires: optimized plan carries the derived range disjunction
    val optimized = df.queryExecution.optimizedPlan
    val hasRange = optimized.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _)
        if c.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual]) => c
    }
    assert(hasRange.isDefined, s"no derived range in $optimized")
    // 2. ranges reach the parquet scan as pushed filters
    val scanStr = df.queryExecution.executedPlan.toString
    assert(scanStr.contains("GreaterThanOrEqual(cell"), s"no pushed range in:\n$scanStr")
    // 3. results identical to the unoptimized semantics
    val expected = cells.collect().map(_.getLong(0))
      .filter(c => graft.h3.H3Core.cellToParent(c, 5) == res5).sorted
    assert(df.as[Long].collect().sorted.toSeq == expected.toSeq)
    // 4. derived bounds are correct: every descendant of res5 at res 9 is
    // inside its (r=5, R=9) range
    val (lo, hi) = H3ParentRangeDerivation.childRange(res5, 5, 9)
    assert(expected.forall(c => c >= lo && c <= hi))
  }

  test("SQL registration works for geometry functions") {
    H3Registry.register(spark)
    val n = spark.sql(
      s"SELECT size(h3_grid_disk(h3_latlng_to_cell(37.36d, -122.05d, 8), 1)) AS n").as[Int].head()
    assert(n == 7)
  }

  test("edge_length_avg and centroid_distance_avg: DSL, SQL, codegen, null paths (E7)") {
    // table values are libh3 4.1's published constants (H3TablesSpec pins
    // them against the exact derivation); here we guard the Spark surface
    val rows = Seq(0, 5, 15, -1, 16).toDF("res")
      .select($"res",
        h3_edge_length_avg_km($"res").as("km"),
        h3_edge_length_avg_m($"res").as("m"),
        h3_cell_centroid_distance_avg_m($"res").as("cd"))
      .collect()
    val byRes = rows.map(r => r.getInt(0) -> r).toMap
    assert(byRes(0).getDouble(1) == 1281.256011)
    assert(byRes(5).getDouble(1) == 9.854090990)
    assert(byRes(15).getDouble(1) == 0.000584169)
    // m = km * 1000, centroid distance = m * sqrt(3) (directed_edge.rs:71-78,299-301)
    for (res <- Seq(0, 5, 15)) {
      val r = byRes(res)
      assert(math.abs(r.getDouble(2) - r.getDouble(1) * 1000.0) < 1e-9 * r.getDouble(2))
      assert(math.abs(r.getDouble(3) - r.getDouble(2) * math.sqrt(3.0)) < 1e-9 * r.getDouble(3))
    }
    // out-of-range res -> NULL, not an exception (all three functions)
    for (res <- Seq(-1, 16); col <- 1 to 3) assert(byRes(res).isNullAt(col), s"res=$res col=$col")

    // SQL registry + interpreted path agree with codegen'd DSL path
    H3Registry.register(spark)
    val sql = spark.sql(
      "SELECT h3_edge_length_avg_km(5) AS km, h3_edge_length_avg_m(5) AS m, " +
        "h3_cell_centroid_distance_avg_m(5) AS cd, h3_edge_length_avg_km(99) AS oob").head()
    assert(sql.getDouble(0) == 9.854090990)
    assert(sql.getDouble(1) == 9.854090990 * 1000.0)
    assert(math.abs(sql.getDouble(2) - 9854.090990 * math.sqrt(3.0)) < 1e-6)
    assert(sql.isNullAt(3))
    // NULL input -> NULL out
    val nr = Seq[Option[Int]](None).toDF("res")
      .select(h3_edge_length_avg_km($"res")).head()
    assert(nr.isNullAt(0))
  }

  test("directions over resolutions (direction.rs:227-260 fixtures)") {
    // the reference's cell fixture: res-6 cell, digits coarse->fine are
    // [J, I, Ik, J, Jk, Ij] = [2, 4, 5, 2, 3, 6]
    val cell = 0x861ea54f7ffffffL
    val out = Seq(cell).toDF("cell")
      .select(h3_directions_over_resolutions($"cell").as("d")).head().getSeq[Int](0)
    assert(out == Seq(2, 4, 5, 2, 3, 6))
    // edge variant (the reference's _edge twin): an edge iterates its
    // origin's digit path
    val edges = Seq(cell).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("e"))
      .select(h3_directions_over_resolutions($"e").as("d")).collect()
    edges.foreach(r => assert(r.getSeq[Int](0) == Seq(2, 4, 5, 2, 3, 6)))
    // NULL/invalid in -> NULL out
    val n = Seq[Option[Long]](None).toDF("c")
      .select(h3_directions_over_resolutions($"c")).head()
    assert(n.isNullAt(0))
    // res-0 cell: the digit path is EMPTY, not [null, null] (sequence(1,0)
    // is Spark's descending [1,0] — the res-0 guard exists for this)
    val r0 = Seq(1).toDF("x")
      .select(explode(h3_res0_cells()).as("c")).limit(1)
      .select(h3_directions_over_resolutions($"c").as("d")).head()
    assert(!r0.isNullAt(0) && r0.getSeq[Int](0).isEmpty)
  }

  test("grid path across icosahedron faces signals not-computable (lib.rs:153-160 fixture)") {
    // the reference (and libh3's testH3Line.c) error for this pair; this
    // engine signals NULL — never a silently-wrong line. (Nearby
    // pentagon-involved pairs still get the bounded-BFS answer.)
    val start = 0x85285aa7fffffffL
    val end = 0x851d9b1bfffffffL
    val r = Seq((start, end)).toDF("a", "b")
      .select(h3_grid_distance($"a", $"b").as("d"), h3_grid_path($"a", $"b").as("p")).head()
    assert(r.isNullAt(0) || r.getLong(0) > 0) // distance: NULL (or a real count if computable)
    if (r.isNullAt(0)) assert(r.isNullAt(1) || r.getSeq[Long](1).isEmpty)
  }

  test("edges leading to origin / from destination (iter/edge.rs:150-200 fixtures)") {
    // the reference's own fixture: res-7 cell at (lat 30.5, lng 34.2) —
    // note its Coord is (x=lng, y=lat) = (34.2, 30.5)
    val cell = H3Geo.latLngToCell(30.5, 34.2, 7)
    val rows = Seq(cell).toDF("cell")
      .select(explode(h3_origin_to_directed_edges($"cell")).as("edge"))
      .select($"edge",
        h3_edges_leading_from_destination($"edge").as("fwd"),
        h3_edges_leading_to_origin($"edge").as("back"))
      .collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val edge = r.getLong(0)
      val fwd = r.getSeq[Long](1)
      val back = r.getSeq[Long](2)
      // following: 5 edges, input excluded, each origin == input's destination
      assert(fwd.length == 5 && !fwd.contains(edge))
      assert(fwd.forall(f => H3Core.edgeOrigin(f) == graft.h3.H3Traversal.edgeDestination(edge)))
      // previous: 5 edges, input excluded, each destination == input's origin
      assert(back.length == 5 && !back.contains(edge))
      assert(back.forall(b => graft.h3.H3Traversal.edgeDestination(b) == H3Core.edgeOrigin(edge)))
    }
    // NULL in -> NULL out
    val n = Seq[Option[Long]](None).toDF("edge")
      .select(h3_edges_leading_from_destination($"edge"),
        h3_edges_leading_to_origin($"edge")).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
    // pentagon edge case: a pentagon origin has 5 edges, so the walks
    // yield 4 siblings instead of 5 — the exclusion rules must not assume
    // hexagon arity
    val pent = Seq(1).toDF("x")
      .select(explode(h3_res0_cells()).as("c"))
      .filter(h3_is_pentagon($"c"))
      .select(h3_cell_to_center_child($"c", lit(9)).as("p")).limit(1)
    val pr = pent.select(
      size(h3_origin_to_directed_edges($"p")).as("n_edges"),
      explode(h3_origin_to_directed_edges($"p")).as("e"))
      .select($"n_edges", size(h3_edges_leading_to_origin($"e")).as("n_back")).head()
    assert(pr.getInt(0) == 5 && pr.getInt(1) == 4)
  }

  test("continuous cells to edges: dup-skip, path conformance, non-neighbor NULL") {
    val a = H3Geo.latLngToCell(30.5, 34.2, 7)
    // a grid path is continuous by construction: n cells -> n-1 edges whose
    // origins are the path prefix and destinations the path suffix
    val far = H3Geo.latLngToCell(30.55, 34.28, 7)
    val out = Seq((a, far)).toDF("a", "b")
      .select(h3_grid_path($"a", $"b").as("path"))
      .select($"path", h3_continuous_cells_to_edges($"path").as("edges"))
      .head()
    val path = out.getSeq[Long](0)
    val edges = out.getSeq[Long](1)
    assert(path.length >= 3 && edges.length == path.length - 1)
    edges.zipWithIndex.foreach { case (ed, i) =>
      assert(H3Core.edgeOrigin(ed) == path(i) && graft.h3.H3Traversal.edgeDestination(ed) == path(i + 1))
    }
    // consecutive duplicates are skipped (the reference iterator's rule)
    val b = path(1)
    val dup = Seq(Seq(a, a, b, b, b)).toDF("cells")
      .select(h3_continuous_cells_to_edges($"cells").as("e")).head().getSeq[Long](0)
    assert(dup.length == 1 && H3Core.edgeOrigin(dup.head) == a &&
      graft.h3.H3Traversal.edgeDestination(dup.head) == b)
    // a non-neighbor pair yields a NULL element (reference errors there)
    val gap = Seq(Seq(a, far)).toDF("cells")
      .select(h3_continuous_cells_to_edges($"cells").as("e")).head().getSeq[Any](0)
    assert(gap.length == 1 && gap.head == null)
    // degenerate inputs: empty and single-cell arrays -> empty edge arrays
    val deg = Seq((Seq.empty[Long], Seq(a))).toDF("e0", "e1")
      .select(h3_continuous_cells_to_edges($"e0"), h3_continuous_cells_to_edges($"e1")).head()
    assert(deg.getSeq[Long](0).isEmpty && deg.getSeq[Long](1).isEmpty)
  }
}
