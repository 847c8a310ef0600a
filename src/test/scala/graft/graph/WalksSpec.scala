package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Deterministic-walk specs: full-sequence equality against a
  * sequential reference applying the same md5-mod-degree rule, plus
  * structural checks (every hop is a real edge; restart determinism). */
class WalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  private def refWalks(edges: Seq[(Long, Long)], steps: Int): Map[Long, Seq[Long]] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = und.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    adj.keys.map { start =>
      var cur = start
      val path = Seq.newBuilder[Long]
      path += cur
      (1 to steps).foreach { t =>
        val nb = adj(cur)
        cur = nb((md5Long60(s"$start|$t|$cur") % nb.size).toInt)
        path += cur
      }
      start -> path.result()
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)], steps: Int): Map[Long, Seq[Long]] = {
    val df = edges.toDF("src", "dst").repartition(5)
    Walks.walks(df, col("src"), col("dst"), steps)
      .collect()
      .map(r => r.getLong(0) -> (0 to steps).map(i => r.getAs[Long](s"s$i")))
      .toMap
  }

  test("walks match the sequential reference on a seeded random graph") {
    val rnd = new scala.util.Random(61)
    val edges = (1 to 250).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val want = refWalks(edges, 5)
    val got = run(edges, 5)
    assert(got == want)
    // walks actually move (some step leaves the start node)
    assert(want.values.exists(p => p.distinct.size > 2))
  }

  test("every hop follows a real edge") {
    val rnd = new scala.util.Random(8)
    val edges = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).toSet
    run(edges, 4).values.foreach { p =>
      p.zip(p.drop(1)).foreach { hop => assert(und.contains(hop), s"hop $hop") }
    }
  }

  test("single-edge graph oscillates deterministically") {
    val got = run(Seq((3L, 9L)), 3)
    assert(got == Map(3L -> Seq(3L, 9L, 3L, 9L), 9L -> Seq(9L, 3L, 9L, 3L)))
  }

  test("durable clustered walks (checkpointDir) are value-identical and write files") {
    // the cadence-parity contract: with checkpointDir set, the clustered
    // regime's static frames (adj/deg/w0) become reliable file
    // checkpoints; values must not move
    val dir = java.nio.file.Files.createTempDirectory("graft-walks-rel").toString
    val rnd = new scala.util.Random(77)
    val edges = (1 to 250).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val default = run(edges, 4)
    try {
      spark.conf.set("graft.layout.clusterMinRows", "0")
      val durable = Walks.walks(edges.toDF("src", "dst"), col("src"), col("dst"),
          steps = 4, checkpointDir = Some(dir))
        .collect()
        .map(r => r.getLong(0) -> (0 to 4).map(i => r.getAs[Long](s"s$i")))
        .toMap
      assert(durable == default)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "durable walks wrote no checkpoint files")
    } finally spark.conf.unset("graft.layout.clusterMinRows")
  }

  test("walkPmi matches the sequential count/PMI reference") {
    val rnd = new scala.util.Random(35)
    val edges = (1 to 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val steps = 4; val window = 2
    val walks = refWalks(edges, steps)

    // reference: pair counts, slot marginals, e4-quantized PMI
    val combos = for { i <- 0 to steps; j <- (i + 1) to math.min(i + window, steps) } yield (i, j)
    val pairs = walks.values.toSeq.flatMap { p =>
      combos.map { case (i, j) => (math.min(p(i), p(j)), math.max(p(i), p(j))) }
    }
    val pc = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = pc.values.sum
    val marg = pc.toSeq.flatMap { case ((u, v), c) => Seq(u -> c, v -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = pc.map { case ((u, v), c) =>
      (u, v) -> (c, math.floor(math.log(c.toDouble * total.toDouble /
        (marg(u).toDouble * marg(v).toDouble)) * 10000.0 + 0.5).toLong)
    }

    val wDf = Walks.walks(edges.toDF("src", "dst").repartition(5),
      col("src"), col("dst"), steps)
    val got = Walks.walkPmi(wDf, steps, window)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // fixture has repeated pairs (counts > 1) and self-pairs (backtracking)
    assert(want.values.exists(_._1 > 1))
    assert(want.keys.exists(p => p._1 == p._2))
  }
}
