package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Integer-lattice PageRank: sequential-reference equality on a seeded
  * random graph (exact — the recurrence has no floats), partitioning
  * invariance, and ranking laws (authority concentrates on the
  * high-indegree hub; mass never exceeds the initial lattice total). */
class RanksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  // 40 nodes; node 7 is a hub (every 3rd edge points at it)
  private val edges: Seq[(Long, Long)] = (0 until 300).map { i =>
    val s = rnd.nextInt(40).toLong
    val d = if (i % 3 == 0) 7L else rnd.nextInt(40).toLong
    (s, d)
  }.distinct

  private def refPageRank(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val n = nodes.size.toLong
    val tele = (15L * 1000000000L) / (100L * n)
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      es.foreach { case (s, d) => in(d) += (r(s) * 85L) / (100L * deg(s)) }
      r = nodes.map(v => v -> (tele + in(v))).toMap
    }
    r
  }

  test("pageRank matches the sequential integer recurrence exactly") {
    val df = edges.toDF("s", "d").repartition(9)
    val got = Ranks.pageRank(df, $"s", $"d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(edges, 3)
    assert(got == want)
  }

  test("ranking laws: hub dominates; lattice mass bounded; partition-invariant") {
    val a = Ranks.pageRank(edges.toDF("s", "d").repartition(1), $"s", $"d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Ranks.pageRank(edges.toDF("s", "d").repartition(13), $"s", $"d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b) // integer arithmetic: no summation-order wiggle at all
    assert(a(7L) == a.values.max, "the hub carries the top rank")
    assert(a(7L) > 3L * (a.values.sum / a.size), "hub well above mean")
    // mass only decays (floor losses + dangling), never appears
    assert(a.values.sum <= 1000000000L)
  }

  private def refPpr(es: Seq[(Long, Long)], seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val tele = (15L * 1000000000L) / (100L * seeds.size)
    var r = nodes.map(v => v -> (if (seeds(v)) 1000000000L / seeds.size else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      es.foreach { case (s, d) => in(d) += (r(s) * 85L) / (100L * deg(s)) }
      r = nodes.map(v => v -> ((if (seeds(v)) tele else 0L) + in(v))).toMap
    }
    r
  }

  test("personalizedPageRank matches the sequential recurrence; mass localizes at seeds") {
    val seeds = Seq(3L, 11L)
    val df = edges.toDF("s", "d").repartition(9)
    val got = Ranks.personalizedPageRank(df, $"s", $"d", seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(edges, seeds.toSet, 3))
    // two components joined by NO path: mass never reaches the island
    val island = edges ++ Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val gotI = Ranks.personalizedPageRank(island.toDF("s", "d"), $"s", $"d", seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(100L, 101L, 102L).forall(n => gotI(n) == 0L))
    assert(gotI.filterKeys(_ < 100L).toMap == refPpr(island, seeds.toSet, 3).filterKeys(_ < 100L).toMap)
  }
}
