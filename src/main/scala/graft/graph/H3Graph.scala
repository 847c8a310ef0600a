package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._
import scala.collection.mutable

/**
 * Graph operators over H3 cells (SURVEY.md §2.8, reference h3ron-graph):
 * the graph is a plain DataFrame of weighted directed edges between cells —
 * `(origin, destination, weight [, edge])` — and every algorithm is either
 * a declarative plan (build/nodes/stats/downsample, P1-P4) or a broadcast
 * adjacency + `mapPartitions` local Dijkstra (P5-P10), mirroring the
 * reference's rayon-per-origin parallelism (shortest_path.rs:174-186) with
 * Spark tasks as the parallel unit.
 *
 * Scale notes: routing broadcasts the adjacency (the reference holds the
 * whole `PreparedH3EdgeGraph` in memory too, prepared.rs:74-79); origins
 * fan out over partitions so 1000 executors route 1000 origin batches
 * concurrently. Graphs beyond broadcast size would need an iterative
 * Pregel-style relaxation — out of scope, documented.
 */
object H3Graph {

  /** P1: normalize an edge list — duplicate edges keep the minimum weight
    * (h3edge.rs:96-109); union graphs by unioning inputs first. */
  def graphFromEdgeList(df: DataFrame, origin: String, dest: String, weight: String): DataFrame =
    df.select(col(origin).as("origin"), col(dest).as("destination"), col(weight).as("weight"))
      .groupBy(col("origin"), col("destination"))
      .agg(min(col("weight")).as("weight"))

  /** Bound for the single-chain (`chainCol=None`) convenience path: one
    * chain is inherently sequential (its global-order window runs as ONE
    * task), so that path is only valid for small, driver-adjacent chains —
    * a traced linestring, a fixture. Corpus-scale ingestion MUST pass
    * `chainCol`: per-chain windows run shuffle-parallel. */
  val MaxSingleChainRows: Long = 1000000L

  /** P13 (DataFrame part): consecutive cells of an ordered chain become
    * bidirectional edges carrying the H3 directed-edge ids
    * (iter/edge.rs:89-141 `continuous_cells_to_edges`). Pass `chainCol`
    * (e.g. the OSM way id) when the frame holds MANY chains: the window
    * then partitions per chain and the lag runs shuffle-parallel instead
    * of collapsing to a single partition — the scale path for ingesting
    * millions of ways. Without `chainCol` the frame is treated as ONE
    * declared chain, guarded by [[MaxSingleChainRows]]. */
  def graphFromCellChain(df: DataFrame, cellCol: String, orderCol: String,
      chainCol: Option[String] = None,
      maxSingleChainRows: Long = MaxSingleChainRows): DataFrame = {
    val (src, w) = chainCol match {
      case Some(c) =>
        (df, org.apache.spark.sql.expressions.Window.partitionBy(col(c)).orderBy(col(orderCol)))
      case None =>
        // guard: fail fast (limit-bounded count, early-exits the scan)
        // instead of silently collapsing an unbounded frame onto one task
        val n = df.limit((maxSingleChainRows + 1).toInt).count()
        require(n <= maxSingleChainRows,
          s"graphFromCellChain without chainCol is the single-chain path (one global-order " +
            s"window = ONE task); frame exceeds $maxSingleChainRows rows - pass chainCol " +
            "for parallel multi-chain ingestion")
        // declared single chain: a constant partition key keeps the same
        // one-task execution the global order requires, but explicitly —
        // not via the WindowExec "No Partition Defined" scale trap
        (df.withColumn("__chain", lit(0)),
          org.apache.spark.sql.expressions.Window.partitionBy(col("__chain")).orderBy(col(orderCol)))
    }
    val pairs = src.select(col(cellCol).as("a"), lead(col(cellCol), 1).over(w).as("b"))
      .filter(col("b").isNotNull && col("a") =!= col("b"))
    val fwd = pairs.select(col("a").as("origin"), col("b").as("destination"))
    val bwd = pairs.select(col("b").as("origin"), col("a").as("destination"))
    fwd.unionByName(bwd)
      .withColumn("edge", h3_cells_to_directed_edge(col("origin"), col("destination")))
      .withColumn("weight", h3_edge_length_m(col("edge")))
      .groupBy(col("origin"), col("destination"))
      .agg(min(col("edge")).as("edge"), min(col("weight")).as("weight"))
  }

  /** P2: nodes with Origin / Destination / OriginAndDestination typing
    * (h3edge.rs:128-157). */
  def nodes(graph: DataFrame): DataFrame = {
    val o = graph.select(col("origin").as("cell")).distinct().withColumn("is_o", lit(true))
    val d = graph.select(col("destination").as("cell")).distinct().withColumn("is_d", lit(true))
    o.join(d, Seq("cell"), "full_outer")
      .select(col("cell"),
        when(coalesce(col("is_o"), lit(false)) && coalesce(col("is_d"), lit(false)),
          "OriginAndDestination")
          .when(coalesce(col("is_o"), lit(false)), "Origin")
          .otherwise("Destination").as("node_type"))
  }

  /** P3: (num_nodes, num_edges). */
  def stats(graph: DataFrame): (Long, Long) =
    (nodes(graph).count(), graph.count())

  /** P4: re-anchor edges at parent cells, drop intra-cell edges, combine
    * parallel edges (h3edge.rs:215-260); `combine` is "min" or "max". */
  def downsample(graph: DataFrame, targetRes: Int, combine: String = "min"): DataFrame = {
    val aggFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (combine == "max") max(_) else min(_)
    graph.select(
      h3_cell_to_parent(col("origin"), lit(targetRes)).as("origin"),
      h3_cell_to_parent(col("destination"), lit(targetRes)).as("destination"),
      col("weight"))
      .filter(col("origin") =!= col("destination"))
      .groupBy(col("origin"), col("destination"))
      .agg(aggFn(col("weight")).as("weight"))
  }

  /** P5: adjacency for broadcast — (origin -> [(dest, weight)...]) with
    * deterministic neighbor order. */
  def collectAdjacency(graph: DataFrame): Map[Long, Array[(Long, Double)]] =
    graph.select(col("origin"), col("destination"), col("weight").cast("double"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (o, rows) =>
        o -> rows.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
      }

  /** P5: a collected graph — adjacency plus derived node set — reusable
    * across routing calls so one driver collect serves many queries
    * (mirrors the reference preparing `PreparedH3EdgeGraph` once,
    * prepared.rs:408-442). */
  final case class LocalGraph(adj: Map[Long, Array[(Long, Double)]], nodes: Set[Long]) {
    /** graph view with a cell set removed (ExcludeCells, modifiers.rs:11-93). */
    def excluding(cells: Set[Long]): LocalGraph = {
      val adj2 = (adj -- cells).map { case (o, arr) => o -> arr.filterNot(t => cells(t._1)) }
        .filter(_._2.nonEmpty)
      LocalGraph(adj2, adj2.keySet ++ adj2.valuesIterator.flatMap(_.map(_._1)))
    }
    /** total weight over undirected edges (each symmetric pair once). */
    def totalUndirectedWeight: Double =
      adj.iterator.flatMap { case (o, arr) => arr.collect { case (d, w) if o < d => w } }.sum
  }

  def localGraph(graph: DataFrame): LocalGraph = {
    val adj = collectAdjacency(graph)
    LocalGraph(adj, adj.keySet ++ adj.valuesIterator.flatMap(_.map(_._1)))
  }

  /** deterministic local Dijkstra; returns dest -> (cost, predecessor). */
  private def dijkstra(adj: Map[Long, Array[(Long, Double)]], source: Long,
      targets: Set[Long], maxCost: Double): mutable.LongMap[(Double, Long)] = {
    val settled = new mutable.LongMap[(Double, Long)]()
    val best = new mutable.LongMap[Double]()
    // (cost, node, pred) ordered by cost then node id for determinism
    implicit val ord: Ordering[(Double, Long, Long)] =
      Ordering.by[(Double, Long, Long), (Double, Long)](t => (-t._1, -t._2))
    val pq = mutable.PriorityQueue.empty[(Double, Long, Long)]
    pq.enqueue((0.0, source, source))
    best(source) = 0.0
    var remaining = if (targets.isEmpty) Int.MaxValue else targets.size
    while (pq.nonEmpty && remaining > 0) {
      val (cost, node, pred) = pq.dequeue()
      if (!settled.contains(node) && cost <= maxCost) {
        settled(node) = (cost, pred)
        if (targets.contains(node)) remaining -= 1
        for ((next, w) <- adj.getOrElse(node, Array.empty)) {
          val c2 = cost + w
          if (c2 <= maxCost && !settled.contains(next) &&
              best.get(next).forall(c2 < _)) {
            best(next) = c2
            pq.enqueue((c2, next, node))
          }
        }
      }
    }
    settled
  }

  /** P10: snap a cell to the nearest graph node within k grid-disk steps
    * (nearest_graph_nodes.rs:7-114); identity when already a node. */
  def snapToNode(cell: Long, nodeSet: Set[Long], maxK: Int): Option[Long] = {
    if (nodeSet.contains(cell)) return Some(cell)
    var k = 1
    while (k <= maxK) {
      val hits = graft.h3.H3Traversal.gridRing(cell, k).filter(nodeSet.contains)
      if (hits.nonEmpty) return Some(hits.min)
      k += 1
    }
    None
  }

  private val pathSchema = StructType(Seq(
    StructField("origin", LongType, nullable = false),
    StructField("destination", LongType, nullable = false),
    StructField("cost", DoubleType, nullable = false),
    StructField("path", ArrayType(LongType, containsNull = false), nullable = false)))

  /**
   * P6/P7: many-to-many shortest paths. Origins fan out over partitions;
   * each task runs local Dijkstra against the broadcast adjacency and emits
   * `(origin, destination, cost, path-cells)` rows (the reference's
   * `Path`, path.rs:13-266). Unreachable destinations emit nothing. Origins
   * and destinations not on the graph are snapped within `maxSnapK`.
   */
  def shortestPaths(spark: SparkSession, graph: DataFrame, origins: Seq[Long],
      destinations: Seq[Long], maxSnapK: Int = 0): DataFrame =
    shortestPathsLocal(spark, localGraph(graph), origins, destinations, maxSnapK)

  /** [[shortestPaths]] over a pre-collected [[LocalGraph]]. */
  def shortestPathsLocal(spark: SparkSession, lg: LocalGraph, origins: Seq[Long],
      destinations: Seq[Long], maxSnapK: Int = 0): DataFrame = {
    val adj = lg.adj
    val nodeSet = lg.nodes
    val bAdj = spark.sparkContext.broadcast(adj)
    val bNodes = spark.sparkContext.broadcast(nodeSet)
    val destSnapped: Map[Long, Long] = destinations.flatMap { d =>
      snapToNode(d, nodeSet, maxSnapK).map(d -> _)
    }.toMap
    val bDest = spark.sparkContext.broadcast(destSnapped)

    val originDf = originsToDF(spark, origins)
    implicit val enc = RowEncoder.encoderFor(pathSchema)
    originDf.mapPartitions { rows =>
      val adjL = bAdj.value
      val nodesL = bNodes.value
      val destL = bDest.value
      val targets = destL.values.toSet
      rows.flatMap { r =>
        val rawOrigin = r.getLong(0)
        snapToNode(rawOrigin, nodesL, maxSnapK).iterator.flatMap { source =>
          val settled = dijkstra(adjL, source, targets, Double.MaxValue)
          destL.iterator.flatMap { case (rawDest, snappedDest) =>
            settled.get(snappedDest).map { case (cost, _) =>
              // reconstruct path by predecessor chain
              val path = mutable.ArrayBuffer(snappedDest)
              var cur = snappedDest
              while (cur != source) { cur = settled(cur)._2; path += cur }
              Row(rawOrigin, rawDest, cost, path.reverse.toArray)
            }
          }
        }
      }
    }
  }

  /** P8: isochrone flood — all cells reachable within `threshold`
    * accumulated weight, per origin (within_weight_threshold.rs:16-101).
    * The merged variant is a plain `groupBy(cell).agg(min(weight))` on
    * this output. */
  def withinWeightThreshold(spark: SparkSession, graph: DataFrame, origins: Seq[Long],
      threshold: Double, maxSnapK: Int = 0): DataFrame =
    withinWeightThresholdLocal(spark, localGraph(graph), origins, threshold, maxSnapK)

  /** [[withinWeightThreshold]] over a pre-collected [[LocalGraph]]. */
  def withinWeightThresholdLocal(spark: SparkSession, lg: LocalGraph, origins: Seq[Long],
      threshold: Double, maxSnapK: Int = 0): DataFrame = {
    val adj = lg.adj
    val nodeSet = lg.nodes
    val bAdj = spark.sparkContext.broadcast(adj)
    val bNodes = spark.sparkContext.broadcast(nodeSet)
    val schema = StructType(Seq(
      StructField("origin", LongType, nullable = false),
      StructField("cell", LongType, nullable = false),
      StructField("weight", DoubleType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(schema)
    originsToDF(spark, origins).mapPartitions { rows =>
      val adjL = bAdj.value
      rows.flatMap { r =>
        val rawOrigin = r.getLong(0)
        snapToNode(rawOrigin, bNodes.value, maxSnapK).iterator.flatMap { source =>
          dijkstra(adjL, source, Set.empty, threshold).iterator.map {
            case (cell, (cost, _)) => Row(rawOrigin, cell, cost)
          }
        }
      }
    }
  }

  /** P9: differential routing — costs before and after excluding a cell
    * set (differential_shortest_path.rs:18-150 + the ExcludeCells view,
    * modifiers.rs:11-93). NULL cost_after = unreachable after exclusion. */
  def differentialShortestPaths(spark: SparkSession, graph: DataFrame, origins: Seq[Long],
      destinations: Seq[Long], excluded: Set[Long], maxSnapK: Int = 0): DataFrame = {
    val before = shortestPaths(spark, graph, origins, destinations, maxSnapK)
      .select(col("origin"), col("destination"), col("cost").as("cost_before"))
    val filtered = graph.filter(!col("origin").isInCollection(excluded) &&
      !col("destination").isInCollection(excluded))
    val after = shortestPaths(spark, filtered, origins, destinations, maxSnapK)
      .select(col("origin"), col("destination"), col("cost").as("cost_after"))
    before.join(after, Seq("origin", "destination"), "left_outer")
  }

  /** P11: covered area — nodes coarsened by `changeResBy`, deduped,
    * dissolved to a multipolygon (covered_area.rs:13-52 + G8). */
  def coveredAreaWkt(graph: DataFrame, changeResBy: Int): DataFrame = {
    nodes(graph)
      .select(col("cell"),
        h3_get_resolution(col("cell")).as("res"))
      .select(h3_cell_to_parent(col("cell"),
        greatest(col("res") - changeResBy, lit(0))).as("parent"))
      .distinct()
      .agg(collect_list(col("parent")).as("cells"))
      .select(h3_cells_to_multipolygon_wkt(col("cells"), lit(false)).as("wkt"))
  }

  private def originsToDF(spark: SparkSession, xs: Seq[Long]): DataFrame = {
    import spark.implicits._
    xs.toDF("origin").repartition(math.max(1, math.min(xs.size, 32)))
  }
}
