package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Label-propagation specs: a brute-force synchronous reference on a
  * seeded random graph, a planted-partition recovery check, and the
  * synchronous-update semantics pinned on an oscillating bipartite
  * pair (the case where async and sync LPA differ). */
class CommunitiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val df = edges.toDF("src", "dst").repartition(5)
    Communities.labelPropagation(df, col("src"), col("dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def brute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = und.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      lab = adj.map { case (n, nb) =>
        val cnt = nb.toSeq.map(lab).groupBy(identity).view.mapValues(_.size).toMap
        val mx = cnt.values.max
        n -> cnt.filter(_._2 == mx).keys.min
      }
    }
    lab
  }

  test("seeded random graph matches the synchronous reference, rounds 1-3") {
    val rnd = new scala.util.Random(55)
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    (1 to 3).foreach { it =>
      assert(run(edges, it) == brute(edges, it), s"round $it")
    }
  }

  test("synchronous update: a lone edge swaps labels each round") {
    // async LPA would stabilize; the synchronous snapshot oscillates —
    // pinning this distinguishes the implemented semantics
    assert(run(Seq((7L, 9L)), 1) == Map(7L -> 9L, 9L -> 7L))
    assert(run(Seq((7L, 9L)), 2) == Map(7L -> 7L, 9L -> 9L))
  }

  test("planted two-block graph: blocks recover distinct labels") {
    // two 8-cliques joined by one bridge edge
    def clique(base: Long) =
      for { i <- 0L until 8L; j <- (i + 1) until 8L } yield (base + i, base + j)
    val edges = clique(0) ++ clique(100) ++ Seq((0L, 100L))
    val lab = run(edges, 3)
    val blockA = (0L until 8L).map(lab).toSet
    val blockB = (100L until 108L).map(lab).toSet
    assert(blockA.size == 1 && blockB.size == 1 && blockA != blockB)
  }

  test("communities roll-up counts members per final label") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val got = Communities.communities(edges.toDF("src", "dst"),
        col("src"), col("dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lab = brute(edges, 3)
    val want = lab.groupBy(_._2).map { case (l, m) =>
      (l, m.size.toLong, m.keys.min)
    }.toSet
    assert(got == want)
  }
}
