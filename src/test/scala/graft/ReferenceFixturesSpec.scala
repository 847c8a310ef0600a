package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession
import graft.functions._
import graft.h3.{H3Core, H3Geo, H3Traversal}

/**
 * Ports of the reference's own test fixtures (FIXTURES.md §1-§6, sources
 * cited per test). These are the conformance cases the reference runs
 * against its operators; ours must satisfy the same expectations.
 */
class ReferenceFixturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.df.H3DataFrameOps._

  // FIXTURES §1 — make_cell_dataframe (h3ron-polars/src/algorithm/tests.rs:6-30)
  test("compact/uncompact roundtrip on the two-disk fixture (frame/compact.rs:309-355)") {
    val cells = (H3Traversal.gridDisk(H3Geo.latLngToCell(20.0, 10.0, 8), 10) ++
      H3Traversal.gridDisk(H3Geo.latLngToCell(45.0, 45.0, 8), 3)).distinct
    val df = cells.toSeq.toDF("cell").withColumn("value", lit(7))
    val compacted = df.h3CompactDataFrame("cell")
    val nCompact = compacted.count()
    assert(nCompact < cells.length, s"compact did not shrink: $nCompact vs ${cells.length}")
    // compacted resolutions <= 8 and more than one distinct res
    val resList = compacted.select(h3_get_resolution($"cell")).as[Int].collect()
    assert(resList.max == 8 && resList.distinct.length > 1)
    // uncompact restores the exact original cell set, all at res 8
    val restored = compacted.h3UncompactDataFrame("cell", 8)
    assert(restored.select($"cell").as[Long].collect().sorted.toSeq == cells.sorted.toSeq)
  }

  // FIXTURES §2 — spatial-index conformance battery (spatial_index/tests.rs:2-79)
  test("spatial predicate masks match the shared conformance battery") {
    val cells = Seq(
      H3Geo.latLngToCell(45.5, 45.5, 7),
      H3Geo.latLngToCell(-60.5, -60.5, 7),
      H3Geo.latLngToCell(70.5, 120.5, 7),
      55L) // invalid -> NULL row
    val df = cells.zipWithIndex.toDF("cell", "idx")

    // envelopes_within_distance((-60,-60), 2.0) -> [false, true, false, NULL]
    val m1 = df.orderBy($"idx")
      .select(h3_cell_within_distance_deg($"cell", lit(-60.0), lit(-60.0), lit(2.0)))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(m1.toSeq == Seq(false, true, false, null))

    // geometries_intersect(Rect (40,40)-(50,50)) -> [true, false, false, NULL]
    val rect = "POLYGON ((40 40, 50 40, 50 50, 40 50, 40 40))"
    val m2 = df.orderBy($"idx")
      .select(h3_cell_intersects_polygon($"cell", lit(rect)))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(m2.toSeq == Seq(true, false, false, null))

    // coarse envelope stage agrees with the mask-alignment rule
    val m3 = df.orderBy($"idx")
      .select(h3_cell_intersects_bbox($"cell", lit(40.0), lit(40.0), lit(50.0), lit(50.0)))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(m3(0) == true && m3(3) == null)
  }

  // FIXTURES §3 — mixed-resolution partitioning (frame/resolution.rs:117-153)
  test("partition-by-resolution on the mixed-res fixture") {
    val df = Seq(
      (H3Geo.latLngToCell(45.5, 45.5, 7), 0),
      (H3Geo.latLngToCell(45.5, 45.6, 8), 1),
      (H3Geo.latLngToCell(45.6, 45.5, 8), 2),
      (H3Geo.latLngToCell(45.5, 45.5, 5), 3)).toDF("cell", "value")
    val parts = df.h3PartitionByResolution("cell")
    assert(parts.map(_._1) == Seq(5, 7, 8))
    val counts = parts.map { case (r, d) => r -> d.count() }.toMap
    assert(counts == Map(5 -> 1L, 7 -> 1L, 8 -> 2L))
  }

  // FIXTURES §4 — uncompact subset (frame/compact.rs:367-416)
  test("uncompact-to-subset returns exactly the subset cells") {
    val origin = H3Geo.latLngToCell(12.0, 12.0, 5)
    val disk = H3Traversal.gridDisk(origin, 12)
    val subset = H3Traversal.gridDisk(H3Core.cellToCenterChild(origin, 7), 1)
    val df = disk.toSeq.toDF("cell")
    val out = df.h3UncompactDataFrameSubset("cell", 7, subset.toSeq)
      .select($"cell").as[Long].collect()
    assert(out.sorted.toSeq == subset.sorted.toSeq)
  }

  // FIXTURES §5 — cluster finding with value equality (cell_clusters.rs:91-117)
  test("eq-value clustering of the two-disk fixture finds exactly 2 clusters") {
    val a = H3Traversal.gridDisk(H3Geo.latLngToCell(14.5, 12.2, 6), 3).map((_, 1))
    val b = H3Traversal.gridDisk(H3Geo.latLngToCell(45.5, 42.2, 6), 2).map((_, 5))
    val df = (a ++ b).toSeq.toDF("cell", "value")
    val out = graft.df.H3Clusters.cellClusters(df, "cell", Some("value"), fixedRounds = Some(7))
    assert(out.select(countDistinct($"cluster")).as[Long].head() == 2)
    // cluster membership respects the disks
    val byDisk = out.groupBy($"value").agg(countDistinct($"cluster").as("nc"))
      .as[(Int, Long)].collect().toMap
    assert(byDisk == Map(1 -> 1L, 5 -> 1L))
  }

  // to_geo.rs:252-263 — the donut dissolve's EXACT ring vertex counts
  test("donut dissolve: exterior 19 closed vertices, one 7-vertex hole (to_geo.rs:253-263)") {
    val ring = H3Traversal.gridRing(H3Geo.latLngToCell(12.3, 23.3, 6), 1)
    val wkt = Seq(1).toDF("x")
      .select(h3_cells_to_multipolygon_wkt(lit(ring), lit(false)).as("wkt"))
      .as[String].head()
    // exactly ONE polygon: a regression that reclassifies the hole as a
    // second outer polygon would otherwise still split into two rings
    assert(!wkt.contains(")), ((") , s"expected a single polygon: ${wkt.take(120)}")
    // ...with exactly two rings
    val rings = wkt.stripPrefix("MULTIPOLYGON (").stripSuffix(")").split("\\), \\(")
      .map(_.replaceAll("[()]", "").trim)
    assert(rings.length == 2, s"expected outer + hole: ${wkt.take(120)}")
    // closed-ring vertex counts as the reference's LineString lengths
    // (first point repeated at the end, so 19 = 18 unique vertices)
    def closedLen(r: String): Int = {
      val pts = r.split(", ")
      assert(pts.head == pts.last, s"ring not closed: ${pts.head} vs ${pts.last}")
      pts.length
    }
    val lens = rings.map(closedLen).sorted
    assert(lens.toSeq == Seq(7, 19), s"ring vertex counts: ${lens.mkString(",")}")
  }

  // directed_edge.rs:382-400 — boundary linestring vs centroid linestring
  test("edge boundary linestring differs from the centroid linestring; centroid distance brackets (directed_edge.rs:383-400)") {
    val edge = 0x149283080ddbffffL
    val row = Seq(edge).toDF("edge").select(
      h3_edge_boundary_wkt($"edge").as("bwkt"),
      h3_edge_origin($"edge").as("o"),
      h3_edge_destination($"edge").as("d"),
      h3_edge_length_m($"edge").as("len_m"),
      h3_edge_centroid_distance_km($"edge").as("cdist_km")).head()
    // boundary LS: exactly 2 vertices (a hex-hex shared side)
    val bPts = row.getString(0).stripPrefix("LINESTRING (").stripSuffix(")").split(", ")
    assert(bPts.length == 2, s"boundary: ${row.getString(0)}")
    // centroid LS: origin/destination centroids — 2 points, NOT equal to
    // the boundary segment (assert_ne in the reference)
    val og = H3Geo.cellToLatLng(row.getLong(1))
    val dg = H3Geo.cellToLatLng(row.getLong(2))
    val cPts = Array(s"${og.lng} ${og.lat}", s"${dg.lng} ${dg.lat}")
    assert(bPts.toSet != cPts.toSet, "boundary segment must differ from the centroid segment")
    // length_m < cell_centroid_distance_m < 2 * length_m
    val lenM = row.getDouble(3)
    val cdistM = row.getDouble(4) * 1000.0
    assert(lenM < cdistM && cdistM < 2.0 * lenM, s"len=$lenM cdist=$cdistM")
  }

  // lib.rs:162-172 — the 5-point Mediterranean linestring at res 5
  test("linestring trace across the Mediterranean yields > 200 cells (lib.rs:163-172)") {
    val wkt = "LINESTRING (11.60 37.16, 3.86 39.63, -4.57 35.17, -20.74 34.88, -23.55 48.92)"
    val n = Seq(wkt).toDF("wkt")
      .select(explode(h3_linestring_to_cells($"wkt", lit(5))).as("cell"))
      .distinct().count()
    assert(n > 200, s"traced $n cells")
  }

  // FIXTURES §6 — line-graph routing (within_weight_threshold.rs:117-184)
  test("within-weight-threshold flood over the traced line graph") {
    val cells = graft.h3.H3Polygon.lineStringToCells(Array((10.0, 20.0), (20.0, 20.0)), 4)
    assert(cells.length > 4)
    val chain = cells.zipWithIndex.toSeq.toDF("cell", "ord")
    // uniform weight 10 per directed edge, one direction (the reference's
    // h3 edge graph from an ordered line)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"ord")
    val edges = chain.select($"cell".as("origin"), lead($"cell", 1).over(w).as("destination"))
      .filter($"destination".isNotNull).withColumn("weight", lit(10.0))
    val out = graph.H3Graph.withinWeightThreshold(spark, edges, Seq(cells.head), 30.0)
    val weights = out.select($"weight").as[Double].collect().sorted
    assert(weights.toSeq == Seq(0.0, 10.0, 20.0, 30.0))
  }
}
