package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Barriers

/**
 * Bounded-round k-core peeling (Seidman 1983; the distributed peel of
 * Montresor et al. 2013) — the "dense-core" signal of link-graph
 * curation: a k-core surviving high k is a tightly-linked cluster
 * (forum, wiki farm, link ring) that mixing rules treat as one source.
 *
 * Each round removes every node whose CURRENT degree is below `k`
 * (synchronously — all of a round's degrees are measured before any
 * removal), then drops edges touching removed nodes. A fixed `rounds`
 * budget makes the operator a finite relational program: identical
 * results in any engine, SQL oracle unrolls rounds verbatim. (The true
 * k-core is the fixpoint; on real graphs peeling converges in a few
 * rounds — callers wanting the fixpoint run until the survivor count
 * stops changing, same contract as the CC loop.)
 *
 * Scale shape per round: one degree aggregate (map-side combinable)
 * and two semi-joins of the edge frame against the slim survivor set,
 * all hash-partitioned on node ids; the edge frame only ever SHRINKS.
 */
object Cores {

  /** Nodes of the `rounds`-round k-core: `(node, degree)` with the
    * degree measured in the surviving subgraph. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got $k/$rounds")
    var e = Barriers.statSafe(Triangles.canonicalEdges(edges, src, dst))
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val keep = Barriers.statSafe(
        deg.filter(col("deg") >= k).select(col("n")))
      e = Barriers.statSafe(
        e.join(keep.select(col("n").as("u")), Seq("u"), "leftsemi")
          .join(keep.select(col("n").as("v")), Seq("v"), "leftsemi")
          .select(col("u"), col("v")))
    }
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
      .select(col("n").as("node"), col("degree"))
  }
}
