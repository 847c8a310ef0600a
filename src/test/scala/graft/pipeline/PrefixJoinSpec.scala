package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Prefix-filtered exact Jaccard join: compared against a brute-force
  * all-pairs reference on seeded random near-duplicate corpora — the
  * completeness claim (no false negatives) is exactly what the
  * reference checks, since the filter only ever PRUNES candidates. */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 3 // gram size for specs

  private def gramSet(text: String): Set[String] = {
    val t = text.toLowerCase.trim
    (0 to t.length - N).map(i => t.substring(i, i + N)).toSet
  }

  private def brute(docs: Seq[(Long, String)], tNum: Int, tDen: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val gs = docs.map { case (i, t) => i -> gramSet(t) }.filter(_._2.nonEmpty)
    (for {
      (a, ga) <- gs; (b, gb) <- gs if a < b
      inter = (ga & gb).size.toLong
      uni = ga.size + gb.size - inter
      if inter * tDen >= uni * tNum
    } yield (a, b) -> (inter, uni.toLong, inter * 1000000L / uni)).toMap
  }

  private def run(docs: Seq[(Long, String)], tNum: Int, tDen: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val df = docs.toDF("id", "text").repartition(7)
    Dedup.prefixJaccardJoin(df, col("id"), col("text"), n = N, tNum = tNum, tDen = tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("matches the brute-force all-pairs join on near-duplicate corpora (3 seeds)") {
    for (seed <- Seq(29, 101, 7)) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 40L).map { i =>
        i -> (1 to 12).map(_ => "abcd" (rnd.nextInt(4))).mkString
      }
      // near-copies: append a short suffix; exact copies under new ids
      val docs = base ++
        base.filter(_._1 % 3 == 0).map { case (i, t) => (i + 100) -> (t + "xy") } ++
        base.filter(_._1 % 5 == 0).map { case (i, t) => (i + 200) -> t }
      val want = brute(docs, 6, 10)
      val got = run(docs, 6, 10)
      assert(got == want, s"seed $seed")
      // fixture exercises hits below 1.0 and exact 1.0 pairs
      assert(want.values.exists(_._3 == 1000000L), s"seed $seed")
      assert(want.values.exists(v => v._3 < 1000000L), s"seed $seed")
      assert(want.nonEmpty)
    }
  }

  test("high threshold keeps only exact copies; short docs drop out") {
    val docs = Seq(
      1L -> "hello world", 2L -> "hello world", // exact pair
      3L -> "hello worlds", // near 1-2
      4L -> "xy") // shorter than the gram size: no grams
    val got = run(docs, 10, 10) // t = 1.0
    val want = brute(docs, 10, 10)
    assert(got == want)
    assert(got.keySet == Set((1L, 2L)))
  }

  test("threshold arithmetic is integer-exact at the boundary") {
    // two docs engineered to land exactly ON a rational threshold:
    // J = inter/uni must pass t = inter/uni exactly
    val docs = Seq(10L -> "abcde", 11L -> "bcdef")
    // 3-grams: {abc,bcd,cde} vs {bcd,cde,def}: inter 2, uni 4, J = 1/2
    assert(run(docs, 1, 2).keySet == Set((10L, 11L)))
    assert(run(docs, 51, 100).isEmpty)
  }

  // ---- ngramJaccardPairs (prefix-filtered since round 14): the quantized
  // double-threshold op must keep EXACTLY the brute-force pair set under
  // its own float filter, for thresholds ON the e4 lattice, ABOVE it, and
  // the 576 lattice doubles whose t*1e4 renders as k + 1e-12 (the ceil()
  // overshoot class that used to drop boundary pairs)

  private def bruteQuantized(docs: Seq[(Long, String)],
      threshold: Double): Map[(Long, Long), Double] = {
    val gs = docs.map { case (i, t) => i -> gramSet(t) }.filter(_._2.nonEmpty)
    (for {
      (a, ga) <- gs; (b, gb) <- gs if a < b
      inter = (ga & gb).size
      uni = ga.size + gb.size - inter
      // the operator's exact float pipeline: floor(i/u*1e4+0.5)/1e4
      j = math.floor(inter.toDouble / uni.toDouble * 10000.0 + 0.5) / 10000.0
      if j >= threshold
    } yield (a, b) -> j).toMap
  }

  test("ngramJaccardPairs == brute force under the quantized filter (incl. overshoot thresholds)") {
    val rnd = new scala.util.Random(43)
    val base = (0L until 30L).map { i =>
      i -> (1 to 14).map(_ => "abcd" (rnd.nextInt(4))).mkString
    }
    val docs = base ++
      base.filter(_._1 % 2 == 0).map { case (i, t) => (i + 100) -> (t + "xz") } ++
      base.filter(_._1 % 7 == 0).map { case (i, t) => (i + 200) -> t }
    val df = docs.toDF("id", "text").repartition(5)
    // 0.5016/0.5026: ceil-overshoot class (t*1e4 = 5016.000000000001);
    // 0.50161: off-lattice; 1.0 and 0.0001: extremes
    for (threshold <- Seq(0.3, 0.5, 0.5016, 0.5026, 0.50161, 0.9999, 1.0, 0.0001)) {
      val got = Dedup.ngramJaccardPairs(df, col("id"), col("text"), n = N,
          threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = bruteQuantized(docs, threshold)
      assert(got == want, s"threshold $threshold: got ${got.size}, want ${want.size}")
    }
    // the corpus actually exercises sub-1.0 and exact-1.0 hits at mid thresholds
    assert(bruteQuantized(docs, 0.5).values.exists(_ < 1.0))
    assert(bruteQuantized(docs, 0.5).values.exists(_ == 1.0))
  }

  test("ngramJaccardPairs boundary pair survives an off-lattice threshold") {
    // deterministic boundary fixture: two 9-gram docs sharing exactly 6
    // grams -> J = 6/12 = 0.5. Threshold 0.4999999999 is OFF the e4
    // lattice just below 0.5: it rounds to lattice 5000 (candidate bound
    // 0.4999), and the quantized J (0.5) passes the float filter — the
    // pair MUST be returned. A ceil-style bound computed from a threshold
    // rendering as 5000.000...01 would have pruned exactly this shape.
    val a = "aabbccddeff" // 3-grams: aab,abb,bbc,bcc,ccd,cdd,dde,def,eff
    val b = "bccddeffxyz" // 3-grams: bcc,ccd,cdd,dde,def,eff,ffx,fxy,xyz
    val ga = gramSet(a); val gb = gramSet(b)
    assert(ga.size == 9 && gb.size == 9 && (ga & gb).size == 6) // J = 0.5 exactly
    val docs = Seq(20L -> a, 21L -> b)
    val got = Dedup.ngramJaccardPairs(docs.toDF("id", "text"), col("id"),
        col("text"), n = N, threshold = 0.4999999999)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    assert(got == Set(((20L, 21L), 0.5)))
  }
}
