package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession
import graft.h3.H3Geo
import graft.sources.bincode.PreparedGraphBincode

/**
 * Conformance against the reference's REAL prepared routing graph —
 * `data/graph-germany_r7_f64.bincode.lz`, the exact fixture behind its
 * `route_many_to_many` bench (h3ron-graph/benches/route_germany.rs:15-96).
 * Until now every routing test ran on synthetic chains; this drives the
 * same 75k-node OSM-derived street graph the reference routes, through the
 * same Wangen im Allgaeu -> {Emden, Stralsund} many-to-many query.
 */
class GermanyGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixturePath = "/root/reference/data/graph-germany_r7_f64.bincode.lz"
  private def fixture: String = {
    assume(new java.io.File(fixturePath).isFile, s"$fixturePath not present")
    fixturePath
  }

  // the bench's coordinates (route_germany.rs:28-45), res from the graph
  private val wangen = H3Geo.latLngToCell(47.68708804564653, 9.834909439086914, 7)
  private val emden = H3Geo.latLngToCell(53.3689915114596, 7.20600128173828, 7)
  private val stralsund = H3Geo.latLngToCell(54.3153216473314, 13.092269897460938, 7)

  test("bincode+lz4 record parses with pinned totals") {
    val g = PreparedGraphBincode.read(fixture)
    assert(g.resolution == 7)
    assert(g.edges.length == 312397)
    assert(g.longEdgeCount == 402)
    assert(g.nodes.length == 75043)
    // every edge id is a valid H3 directed edge at the graph's resolution
    assert(g.edges.forall { case (e, _) =>
      graft.h3.H3Core.isValidDirectedEdge(e) &&
        graft.h3.H3Core.getResolution(e) == 7 })
    // weights are positive travel costs
    assert(g.edges.forall(_._2 > 0.0))
    // node typing: overwhelmingly OriginAndDestination on a street graph
    val byType = g.nodes.groupBy(_._2).map { case (k, v) => k -> v.length }
    assert(byType(2) == 75038 && byType.getOrElse(0, 0) == 3 && byType.getOrElse(1, 0) == 2)
  }

  test("long-edge payloads decode: 402 shortcuts, continuous edge chains, cell lookups exact") {
    import graft.h3.{H3Core, H3Traversal}
    val g = PreparedGraphBincode.read(fixture)
    assert(g.longEdges.length == 402)
    val weightOf = g.edges.toMap
    g.longEdges.foreach { le =>
      // the shortcut hangs off the first edge of its own chain
      assert(le.edge == le.inEdge)
      assert(le.edgePath.head == le.inEdge && le.edgePath.last == le.outEdge)
      // prepared with PreparedH3EdgeGraph::try_from => min_longedge_length 4
      // (graph_from_osm.rs:97, prepared.rs:433-436)
      assert(le.edgePath.length >= 4)
      le.edgePath.foreach(e => assert(H3Core.isValidDirectedEdge(e)))
      // successive edges chain: each destination is the next origin
      le.edgePath.sliding(2).foreach { case Array(a, b) =>
        assert(H3Traversal.edgeDestination(a) == H3Core.edgeOrigin(b))
      }
      // every chain edge is a base edge, and the chain weight is their sum
      // in traversal order (f64-commutative per step => bit-exact)
      var sum = 0.0
      le.edgePath.foreach { e => assert(weightOf.contains(e)); sum += weightOf(e) }
      assert(java.lang.Double.doubleToLongBits(sum) ==
        java.lang.Double.doubleToLongBits(le.weight),
        s"chain weight $sum != serialized ${le.weight}")
      // cell_lookup treemap == exactly the cells the chain touches
      // (longedge.rs:14-29, 86: origin of the first edge + all destinations)
      val chainCells = (H3Core.edgeOrigin(le.edgePath.head) +:
        le.edgePath.map(H3Traversal.edgeDestination)).toSet
      assert(le.cellLookup.toSet == chainCells)
      // roaring decode emits sorted unique values
      assert(le.cellLookup.toSeq == le.cellLookup.toSeq.sorted)
      assert(le.cellLookup.length == chainCells.size)
    }
  }

  test("contractLongEdges reproduces the reference's 402 shortcuts exactly (P5 conformance)") {
    import graft.h3.{H3Core, H3Traversal}
    val g = PreparedGraphBincode.read(fixture)
    // adjacency from the fixture's own base edges, weights as serialized
    val adj = g.edges.toSeq
      .map { case (e, w) => (H3Core.edgeOrigin(e), H3Traversal.edgeDestination(e), w) }
      .groupBy(_._1)
      .map { case (o, ts) => o -> ts.map(t => (t._2, t._3)).toArray }
    val ours = H3Graph.contractLongEdges(adj, minEdges = 4)
    val oursFlat = ours.toSeq.flatMap { case (o, arr) =>
      arr.map(le => (o, le.firstHop) -> le)
    }.toMap
    val refByKey = g.longEdges.map { le =>
      (H3Core.edgeOrigin(le.inEdge), H3Traversal.edgeDestination(le.inEdge)) -> le
    }.toMap
    assert(refByKey.size == 402 && oursFlat.size == refByKey.size,
      s"ours=${oursFlat.size} ref=${refByKey.size}")
    assert(oursFlat.keySet == refByKey.keySet)
    refByKey.foreach { case (key, ref) =>
      val our = oursFlat(key)
      assert(our.dest == H3Traversal.edgeDestination(ref.outEdge), s"dest at $key")
      val refCellPath = H3Core.edgeOrigin(ref.edgePath.head) +:
        ref.edgePath.map(H3Traversal.edgeDestination)
      assert(our.cellPath.toSeq == refCellPath.toSeq, s"cell path at $key")
      // same chain, same per-step accumulation => bit-identical f64
      assert(java.lang.Double.doubleToLongBits(our.weight) ==
        java.lang.Double.doubleToLongBits(ref.weight), s"weight at $key")
    }
  }

  test("bincode writer round-trips: our serialization re-reads identical to the fixture's edges") {
    val g = PreparedGraphBincode.read(fixture)
    val src = PreparedGraphBincode.edgesDF(spark, fixture)
    val out = java.nio.file.Files.createTempDirectory("bincode_rt")
      .resolve("germany_rt.bincode.lz").toString
    PreparedGraphBincode.writeBincode(src, out)
    val rt = PreparedGraphBincode.read(out)
    assert(rt.resolution == g.resolution)
    // edge sets identical (ids + weights); longedges are intentionally
    // dropped (the reference re-derives them in from_h3edge_graph)
    assert(rt.edges.sortBy(_._1).toSeq == g.edges.sortBy(_._1).toSeq)
    assert(rt.longEdgeCount == 0)
    // node typing re-derived from edges matches the fixture's map
    assert(rt.nodes.sortBy(_._1).toSeq == g.nodes.sortBy(_._1).toSeq)
    // and the LZ4-frame + bincode bytes are a valid input to the full
    // DataFrame path too
    val rtDf = PreparedGraphBincode.edgesDF(spark, out)
    assert(rtDf.count() == src.count())
    // pin the written frame descriptor: interop with the reference's
    // lz4_flex FrameDecoder rests on lz4-java's DEFAULT frame settings
    // (v01 + block-independence FLG=0x60, 4 MB max block BD=0x70,
    // xxh32 header checksum 0x73) — a silent lz4-java default change
    // (e.g. enabling content checksums) must fail here, not in the
    // reference's reader
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)).take(7)
    assert(head.map(b => f"${b & 0xFF}%02x").mkString(" ") == "04 22 4d 18 60 70 73",
      s"LZ4 frame descriptor changed: ${head.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
  }

  test("bincode writer round-trips seeded random grid graphs (property, 3 seeds)") {
    for (seed <- Seq(5, 17, 91)) {
      val rnd = new scala.util.Random(seed)
      // random connected patch: a grid disk with random directed neighbor
      // edges and awkward weights (tiny, huge, fractional)
      val center = H3Geo.latLngToCell(30 + rnd.nextInt(30), rnd.nextInt(120) - 60, 7)
      val cells = graft.h3.H3Traversal.gridDisk(center, 2)
      val edges = cells.flatMap { c =>
        graft.h3.H3Traversal.gridRing(c, 1).filter(cells.contains).filter(_ => rnd.nextBoolean())
          .map(d => (c, d, rnd.nextInt(3) match {
            case 0 => rnd.nextDouble() * 1e-9
            case 1 => rnd.nextDouble() * 1e9
            case _ => rnd.nextDouble()
          }))
      }.distinct
      if (edges.nonEmpty) {
        val df = edges.toSeq.toDF("origin", "destination", "weight")
        val out = java.nio.file.Files.createTempDirectory(s"bc_prop$seed")
          .resolve("g.bincode.lz").toString
        PreparedGraphBincode.writeBincode(df, out)
        val rt = PreparedGraphBincode.edgesDF(spark, out)
          .as[(Long, Long, Double)].collect().toSet
        assert(rt == edges.toSet, s"seed $seed: ${edges.size} edges")
      }
    }
  }

  test("isochrone and covered-area laws hold on the real street graph (P8/P11)") {
    val edges = PreparedGraphBincode.edgesDF(spark, fixture)
    val graph = H3Graph.graphFromEdgeList(edges, "origin", "destination", "weight")
      .localCheckpoint(false)
    // P8 monotonicity: the 60-cost ball strictly contains the 30-cost ball
    def ball(threshold: Double): Map[Long, Double] =
      H3Graph.withinWeightThreshold(spark, graph, Seq(wangen), threshold)
        .select($"cell", $"weight").as[(Long, Double)].collect().toMap
    val b30 = ball(30.0)
    val b60 = ball(60.0)
    assert(b30.nonEmpty && b60.size > b30.size)
    assert(b30.keySet.subsetOf(b60.keySet))
    // shared cells carry the same accumulated cost in both floods
    b30.foreach { case (c, w) => assert(math.abs(b60(c) - w) < 1e-9) }
    assert(b60.values.forall(_ <= 60.0))
    // P11: the covered area of the 60-ball's subgraph is a valid,
    // non-empty multipolygon
    val sub = edges.filter($"origin".isInCollection(b60.keySet) &&
      $"destination".isInCollection(b60.keySet))
    val wkt = H3Graph.coveredAreaWkt(
      H3Graph.graphFromEdgeList(sub, "origin", "destination", "weight"), changeResBy = 2)
      .as[String].head()
    assert(wkt.startsWith("MULTIPOLYGON") && wkt.length > 50)
  }

  test("route across Germany: Wangen -> {Emden, Stralsund} finds both paths (bench parity)") {
    val edges = PreparedGraphBincode.edgesDF(spark, fixture)
    val graph = H3Graph.graphFromEdgeList(edges, "origin", "destination", "weight")
    val paths = H3Graph.shortestPaths(spark, graph, Seq(wangen), Seq(emden, stralsund))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getSeq[Long](3)))
      .sortBy(_._1)
    // the bench's own assertion: both destinations reached
    assert(paths.length == 2, s"expected 2 paths, got ${paths.length}")
    info(paths.map { case (d, c, p) => s"dest=$d cost=$c len=${p.length}" }.mkString("; "))
    paths.foreach { case (dest, cost, walk) =>
      assert(cost > 0.0)
      assert(walk.head == wangen && walk.last == dest)
      // the walk is a connected cell chain: every hop is a neighbor pair
      walk.sliding(2).foreach { case Seq(a, b) =>
        assert(graft.h3.H3Traversal.areNeighborCells(a, b), s"gap between $a and $b")
      }
    }
    // path-walk law: summing the normalized edge weights along the walk
    // reproduces the Dijkstra cost exactly
    val edgeW = edges.groupBy($"origin", $"destination").agg(min($"weight").as("w"))
      .as[(Long, Long, Double)].collect()
      .map { case (o, d, w) => (o, d) -> w }.toMap
    paths.foreach { case (_, cost, walk) =>
      val sum = walk.sliding(2).map { case Seq(a, b) => edgeW((a, b)) }.sum
      assert(math.abs(sum - cost) < 1e-6, s"walk sum $sum vs cost $cost")
    }
  }
}
