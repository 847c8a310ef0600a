package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession
import graft.h3.{H3Core, H3Geo, H3Traversal}

class H3GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // small H3-native chain: a res-8 grid path with unit-ish metric weights
  private lazy val chainCells: Array[Long] = {
    val a = H3Geo.latLngToCell(37.7, -122.45, 8)
    val g = H3Geo.cellToLatLng(a)
    val b = H3Geo.latLngToCell(g.lat + 0.05, g.lng, 8)
    H3Traversal.gridPathCells(a, b)
  }

  private def chainGraph = H3Graph.graphFromCellChain(
    chainCells.zipWithIndex.toSeq.toDF("cell", "ord"), "cell", "ord")

  test("edge-list build keeps minimum weight for duplicate edges (P1)") {
    val df = Seq((1L, 2L, 5.0), (1L, 2L, 3.0), (2L, 3L, 1.0)).toDF("o", "d", "w")
    val g = H3Graph.graphFromEdgeList(df, "o", "d", "w").as[(Long, Long, Double)].collect().toSet
    assert(g == Set((1L, 2L, 3.0), (2L, 3L, 1.0)))
  }

  test("node typing distinguishes origin/destination/both (P2)") {
    val g = H3Graph.graphFromEdgeList(
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("o", "d", "w"), "o", "d", "w")
    val nodes = H3Graph.nodes(g).as[(Long, String)].collect().toMap
    assert(nodes == Map(1L -> "Origin", 2L -> "OriginAndDestination", 3L -> "Destination"))
  }

  test("chain graph: bidirectional H3 edges with metric weights (P13)") {
    val g = chainGraph.collect()
    // each consecutive pair contributes 2 directed edges
    assert(g.length == 2 * (chainCells.length - 1))
    g.foreach { r =>
      val o = r.getLong(0); val d = r.getLong(1)
      assert(H3Traversal.areNeighborCells(o, d))
      val e = r.getLong(2)
      assert(H3Core.isValidDirectedEdge(e) && H3Core.edgeOrigin(e) == o)
      assert(r.getDouble(3) > 50 && r.getDouble(3) < 2000) // res-8 edge metres
    }
  }

  test("shortest path cost equals sum of chain weights; exclusion cuts it (P6/P9)") {
    val lg = H3Graph.localGraph(chainGraph)
    val first = chainCells.head; val last = chainCells.last
    val route = H3Graph.shortestPathsLocal(spark, lg, Seq(first), Seq(last)).collect()
    assert(route.length == 1)
    assert(math.abs(route.head.getDouble(2) - lg.totalUndirectedWeight) < 1e-6)
    assert(route.head.getSeq[Long](3) == chainCells.toSeq)
    // cutting the middle cell makes the end unreachable
    val mid = chainCells(chainCells.length / 2)
    val cut = H3Graph.shortestPathsLocal(spark, lg.excluding(Set(mid)), Seq(first), Seq(last))
    assert(cut.isEmpty)
  }

  test("isochrone flood covers exactly the threshold ball (P8)") {
    val lg = H3Graph.localGraph(chainGraph)
    val mid = chainCells(chainCells.length / 2)
    val all = H3Graph.withinWeightThresholdLocal(spark, lg, Seq(mid), 1e9).count()
    assert(all == chainCells.length)
    // a small threshold keeps a strict subset containing the origin
    val near = H3Graph.withinWeightThresholdLocal(spark, lg, Seq(mid), 600.0)
      .select($"cell").as[Long].collect().toSet
    assert(near.contains(mid) && near.size < chainCells.length)
  }

  test("off-graph origins snap within maxSnapK (P10)") {
    val lg = H3Graph.localGraph(chainGraph)
    val mid = chainCells(chainCells.length / 2)
    val off = H3Traversal.gridRing(mid, 1).filterNot(chainCells.contains).head
    assert(H3Graph.shortestPathsLocal(spark, lg, Seq(off), Seq(chainCells.last)).isEmpty)
    val snapped = H3Graph.shortestPathsLocal(spark, lg, Seq(off), Seq(chainCells.last), maxSnapK = 2)
    assert(snapped.count() == 1)
  }

  test("single-chain build is guarded by a declared size bound (VERDICT r03 #3)") {
    // the chainCol=None path runs a single-partition window by necessity;
    // a frame beyond the declared bound must fail fast, not silently
    // collapse onto one task at scale
    val df = chainCells.zipWithIndex.toSeq.toDF("cell", "ord")
    intercept[IllegalArgumentException] {
      H3Graph.graphFromCellChain(df, "cell", "ord", maxSingleChainRows = 2)
    }
    // within the bound, results are identical to the unguarded build
    val g = H3Graph.graphFromCellChain(df, "cell", "ord")
    assert(g.count() == 2 * (chainCells.length - 1))
  }

  test("multi-chain build partitions the window per chain (P13 scale path)") {
    // two disjoint chains under one frame; per-chain lag must not pair
    // cells across chains
    val c1 = chainCells.take(5)
    val a2 = H3Geo.latLngToCell(48.85, 2.35, 8)
    val g2 = H3Geo.cellToLatLng(a2)
    val c2 = H3Traversal.gridPathCells(a2, H3Geo.latLngToCell(g2.lat + 0.02, g2.lng, 8))
    val df = (c1.map((_, 1L)) ++ c2.map((_, 2L))).zipWithIndex
      .map { case ((cell, chain), i) => (cell, chain, i) }.toSeq
      .toDF("cell", "chain_id", "ord")
    val g = H3Graph.graphFromCellChain(df, "cell", "ord", chainCol = Some("chain_id"))
    assert(g.count() == 2 * ((c1.length - 1) + (c2.length - 1)))
    // no cross-chain edge: SF and Paris cells never pair
    val crossing = g.filter(
      (col("origin").isin(c1.toSeq: _*) && col("destination").isin(c2.toSeq: _*)) ||
      (col("origin").isin(c2.toSeq: _*) && col("destination").isin(c1.toSeq: _*))).count()
    assert(crossing == 0)
  }

  test("downsample re-anchors at parents, drops intra-cell edges (P4)") {
    val g = chainGraph
    val down = H3Graph.downsample(g, targetRes = 5, combine = "min").collect()
    down.foreach { r =>
      assert(H3Core.getResolution(r.getLong(0)) == 5)
      assert(r.getLong(0) != r.getLong(1))
    }
    // fewer (or equal) edges after coarsening
    assert(down.length <= g.count())
  }
}
