package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Barriers

/**
 * Link-graph authority ranking — the URL/domain-ranking step of a crawl
 * curation pipeline (Common Crawl publishes exactly this artifact for
 * its host graph; curation recipes weight documents by it).
 *
 * PageRank on the e9 INTEGER lattice: ranks are int64 billionths, and
 * one iteration is
 * `r'(v) = tele + Σ_{u→v} (r(u) * dampNum) div (dampDen * outdeg(u))`
 * with `tele = ((dampDen-dampNum) * 1e9) div (dampDen * n)` — every term
 * integral division of longs, NO floating point anywhere, so the result
 * is bit-identical in any engine and under any partitioning/summation
 * order, and a SQL oracle replays iterations verbatim. (Classic PR
 * normalizes dangling mass; here dangling mass simply decays — fine for
 * RANKING, which only needs the order, and exactly replayable.)
 *
 * Scale shape per iteration: one equi-join of ranks onto the
 * (src-keyed, checkpointed-once) edge+outdeg frame, one map-side-combined
 * sum by dst, one left join back to the node set — all hash-partitioned
 * by node id, no broadcast of anything corpus-sized. Iteration frames
 * pass through [[Barriers.statSafe]] so Catalyst's size-only stats can
 * never elect a stale broadcast inside the loop (the round-9 CC lesson).
 */
object Ranks {

  /** Returns `(node, rank_e9)` for every node appearing as src or dst. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame =
    rankLoop(edges, src, dst, iters, dampNum, dampDen) { n =>
      (lit(1000000000L / n), lit(((dampDen - dampNum) * 1000000000L) / (dampDen * n)))
    }

  /** The shared iteration of [[pageRank]] / [[personalizedPageRank]]:
    * edge dedup + out-degree frame + node set, then per round one
    * equi-join, one map-side-combined sum by dst, one left join back —
    * statSafe barriers throughout so size-only stats can never elect a
    * stale broadcast inside the loop. `mkInitTele` receives the node
    * count and returns the (initial rank, per-node teleport)
    * expressions — the ONLY place the two ranks differ. */
  private def rankLoop(edges: DataFrame, src: Column, dst: Column, iters: Int,
      dampNum: Long, dampDen: Long)(
      mkInitTele: Long => (Column, Column)): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < dampNum < dampDen")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .distinct()
    val withDeg = Barriers.statSafe(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src")))
    val nodes = Barriers.statSafe(
      e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node")))
        .distinct())
    val (init, tele) = mkInitTele(nodes.count())
    var ranks = Barriers.statSafe(nodes.select(col("node"), init.as("r")))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"(r * $dampNum) div ($dampDen * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = Barriers.statSafe(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"), (tele + coalesce(col("s"), lit(0L))).as("r")))
    }
    ranks.select(col("node"), col("r").as("rank_e9"))
  }

  /**
   * Personalized PageRank (Jeh & Widom, WWW'03): teleport mass returns
   * only to the SEED set, so rank measures proximity to the seeds —
   * the crawl-frontier prioritization / trusted-seed propagation shape
   * (TrustRank, Gyöngyi et al. VLDB'04). Same e9 integer lattice and
   * iteration plan as [[pageRank]] (one join + one map-side-combined
   * sum + one left join per round, nothing corpus-sized broadcast);
   * the seed membership test is a tiny literal IN-list (seeds are a
   * handful of trusted hosts, never corpus-sized — a large seed frame
   * would become a broadcast join on node id, same plan shape).
   */
  def personalizedPageRank(edges: DataFrame, src: Column, dst: Column,
      seeds: Seq[Long], iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(seeds.nonEmpty, "need a non-empty seed set")
    val teleE9 = ((dampDen - dampNum) * 1000000000L) / (dampDen * seeds.length)
    def isSeed = col("node").isin(seeds: _*)
    rankLoop(edges, src, dst, iters, dampNum, dampDen) { _ =>
      (when(isSeed, lit(1000000000L / seeds.length)).otherwise(lit(0L)),
        when(isSeed, lit(teleE9)).otherwise(lit(0L)))
    }
  }
}
