package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextOps.md5Long
import graft.util.Barriers

/**
 * Deterministic random walks on a link graph — the corpus-generation
 * step of DeepWalk (Perozzi et al. KDD'14) / node2vec (Grover &
 * Leskovec KDD'16): emit one fixed-length walk per start node; the
 * walk sequences are the "sentences" a downstream embedding trainer
 * consumes.
 *
 * Determinism: step `t` from node `c` in walk `w` takes the
 * `md5(w|t|c) mod deg(c)`-th neighbor in neighbor-id order — a
 * hash-driven choice instead of an RNG, so walks are independent and
 * uniform per step yet EXACTLY replayable in any engine and invariant
 * under partitioning (the SQL oracle unrolls the steps verbatim).
 *
 * Scale shape per step: the walk frontier joins a slim `(node, deg)`
 * frame to compute the neighbor INDEX first, then equi-joins the
 * ranked adjacency on `(node, index)` — so a walk visiting a
 * 10⁸-degree hub touches exactly ONE adjacency row, never the
 * neighbor list (ranking the adjacency once up front is a
 * row_number window by source node, the only corpus-sized shuffle).
 * Walk count scales with nodes, steps are a fixed loop — at 100 TB
 * this is `steps` bounded self-equi-joins, nothing quadratic.
 */
object Walks {

  /**
   * One `steps`-step walk from every node of the undirected simple
   * graph of `edges`. Returns `(walk_id, s0..s{steps})` where
   * `walk_id = s0 =` the start node. Every node reached has degree
   * ≥ 1 by construction (it appears in an edge), so walks never
   * strand.
   */
  def walks(edges: DataFrame, src: Column, dst: Column, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = Triangles.canonicalEdges(edges, src, dst)
    val und = Barriers.statSafe(
      e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b"))))
    val adj = Barriers.statSafe(und.select(col("a"), col("b"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("a")).orderBy(col("b"))) - 1).cast("long").as("rn")))
    val deg = Barriers.statSafe(
      und.groupBy(col("a")).agg(count(lit(1)).as("deg")))

    var w = und.select(col("a").as("walk_id")).distinct()
      .select(col("walk_id"), col("walk_id").as("s0"))
    for (t <- 1 to steps) {
      val cur = col(s"s${t - 1}")
      val idx = pmod(md5Long(concat(col("walk_id").cast("string"),
        lit(s"|$t|"), cur.cast("string"))), col("deg"))
      w = w.join(deg, w(s"s${t - 1}") === deg("a"))
        .withColumn("__idx", idx)
        .drop("a", "deg")
        .join(adj, cur === adj("a") && col("__idx") === adj("rn"))
        .withColumn(s"s$t", col("b"))
        .drop("a", "b", "rn", "__idx")
    }
    w
  }
}
