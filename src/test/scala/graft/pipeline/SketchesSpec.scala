package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** KMV distinct-count sketch: sequential-reference equality, the
  * exact-below-k regime, partitioning invariance (exercises the min-k
  * merge), and the estimator's accuracy on a large distinct set. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  private def refKmv(values: Seq[String], k: Int): Long = {
    val hs = values.map(md5Long60).distinct.sorted
    if (hs.size < k) hs.size.toLong
    else math.floor((k - 1).toDouble * 1152921504606846976.0 / hs(k - 1).toDouble).toLong
  }

  test("approxDistinct matches the sequential KMV reference per group") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 30000).map { _ =>
      val g = rnd.nextInt(3)
      // group cardinalities straddle k=64: g0 ~30 distinct, g1 ~300, g2 ~30000
      val v = g match {
        case 0 => s"a${rnd.nextInt(30)}"
        case 1 => s"b${rnd.nextInt(300)}"
        case _ => s"c${rnd.nextInt(100000)}"
      }
      (g.toLong, v)
    }
    val df = rows.toDF("g", "v").repartition(11)
    val got = Sketches.approxDistinct(df, Seq(col("g")), col("v"), k = 64)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val (nRows, est) = got(g)
      assert(nRows == vs.size.toLong, s"group $g n_rows")
      assert(est == refKmv(vs.map(_._2), 64), s"group $g estimate")
    }
    // below-k group is exact
    assert(got(0L)._2 == rows.filter(_._1 == 0L).map(_._2).distinct.size.toLong)
    // the big group's estimate is within 25% of truth (k=64 -> ~12.5% sigma)
    val truth = rows.filter(_._1 == 2L).map(_._2).distinct.size.toDouble
    assert(math.abs(got(2L)._2 - truth) / truth < 0.25,
      s"est=${got(2L)._2} truth=$truth")
  }

  test("sketch is partitioning-invariant (min-k merge is exact)") {
    val df = (0 until 5000).map(i => (i % 4, s"v${i % 997}")).toDF("g", "v")
    val a = Sketches.approxDistinct(df.repartition(1), Seq(col("g")), col("v"), k = 128)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    val b = Sketches.approxDistinct(df.repartition(17), Seq(col("g")), col("v"), k = 128)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("nulls are dropped from the sketch but counted in n_rows") {
    val df = Seq((1, "x"), (1, null.asInstanceOf[String]), (1, "y"), (1, "x"))
      .toDF("g", "v")
    val r = Sketches.approxDistinct(df, Seq(col("g")), col("v"), k = 8).collect().head
    assert(r.getLong(1) == 4L) // n_rows counts every row
    assert(r.getLong(2) == 2L) // distinct_est over non-null values
  }

  test("bottomKSample selects exactly the k smallest (hash, id) rows") {
    val ids = (0L until 1000L)
    val df = ids.map(i => (i, s"payload$i")).toDF("id", "pl").repartition(13)
    val got = Sketches.bottomKSample(df, col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    val want = ids.sortBy(i => (md5Long60(s"${i}bk"), i)).take(50).toSet
    assert(got == want)
    // sample carries the original row payloads, and k > n returns all
    assert(Sketches.bottomKSample(df, col("id"), 5000).count() == 1000L)
  }

  test("weightedBottomKSample matches the sequential clock reference; weights honored") {
    val rows = (0L until 200L).map(i => (i, if (i < 100) 1L else 100L))
    val df = rows.toDF("id", "w").repartition(9)
    def refKey(i: Long, w: Long): Long = {
      val u = (md5Long60(s"${i}wk") + 1).toDouble / 1152921504606846976.0
      math.floor((-math.log(u) / w.toDouble) * 1000000.0 + 0.5).toLong
    }
    val want = rows.map { case (i, w) => (i, w, refKey(i, w)) }
      .sortBy { case (i, _, k) => (k, i) }.take(50)
      .map { case (i, w, k) => i -> ((w, k)) }.toMap
    val got = Sketches.weightedBottomKSample(df, col("id"), col("w"), 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // exponential clocks: the 100x-weighted half dominates the sample
    val heavy = got.keys.count(_ >= 100L)
    assert(heavy > 40, s"heavy=$heavy of 50")
  }

  test("sampledQuantiles matches the sequential sample-quantile reference") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 2000L).map(i => (i, rnd.nextInt(100000).toLong))
    val df = rows.toDF("id", "v").repartition(9)
    val got = Sketches.sampledQuantiles(df, col("id"), col("v"),
      k = 128, permille = Seq(250, 500, 900, 1000)).collect().head

    val sample = rows.sortBy { case (i, _) => (md5Long60(s"${i}bk"), i) }
      .take(128).map(_._2).sorted
    def qAt(p: Int) = sample(math.max((p * 128 + 999) / 1000, 1) - 1)
    assert(got.getLong(0) == 2000L && got.getLong(1) == 128L)
    assert((2 to 5).map(got.getLong) == Seq(qAt(250), qAt(500), qAt(900), qAt(1000)))
    // sanity: the p500 estimate lands near the true median
    val exact = rows.map(_._2).sorted.apply(1000)
    assert(math.abs(got.getLong(3) - exact).toDouble / exact < 0.2)
  }

  test("sampledQuantilesBy: each group carries its own sample; small groups are exact") {
    val rnd = new scala.util.Random(23)
    // group "a": 900 rows (sample pressure at k=64); "b": 40 rows (< k, so
    // its sample IS the group and quantiles are exact ranks); "c": 3 rows
    val rows = (0L until 900L).map(i => ("a", i, rnd.nextInt(10000).toLong)) ++
      (0L until 40L).map(i => ("b", 10000L + i, i * 13 % 700)) ++
      Seq(("c", 20001L, 5L), ("c", 20002L, 9L), ("c", 20003L, 1L))
    val df = rows.toDF("g", "id", "v").repartition(11)
    val got = Sketches.sampledQuantilesBy(df, Seq(col("g")), col("id"), col("v"),
        k = 64, permille = Seq(500, 900))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def ref(g: String): (Long, Long, Long, Long) = {
      val grp = rows.filter(_._1 == g)
      val sample = grp.sortBy { case (_, i, _) => (md5Long60(s"${i}bk"), i) }
        .take(64).map(_._3).sorted
      def qAt(p: Int) = sample(math.max((p * sample.size + 999) / 1000, 1) - 1)
      (grp.size.toLong, sample.size.toLong, qAt(500), qAt(900))
    }
    assert(got.keySet == Set("a", "b", "c"))
    Seq("a", "b", "c").foreach(g => assert(got(g) == ref(g), s"group $g"))
    // the sub-k groups are exact order statistics of their full data
    assert(got("c") == ((3L, 3L, 5L, 9L)))
  }

  test("bottom-k samplers: NULL-id rows cannot burn sample slots") {
    // pre-fix, each null id put a nulls-first (NULL hash, NULL id) entry
    // into the min-k buffer that the equi-join back could never return —
    // k null-id rows silently shrank the sample to zero
    val rows = (0L until 40L).map(i => (Option(i), 1.0 + i)) ++
      (0L until 40L).map(_ => (None: Option[Long], 5.0))
    val df = rows.toDF("id", "w").repartition(6)
    val uni = Sketches.bottomKSample(df.select(col("id")), col("id"), k = 16)
    assert(uni.count() == 16 && uni.filter(col("id").isNull).count() == 0)
    val wtd = Sketches.weightedBottomKSample(df, col("id"), col("w"), k = 16)
    assert(wtd.count() == 16 && wtd.filter(col("id").isNull).count() == 0)
  }

  test("sampledQuantiles: NULL ids are excluded from the sample, counted in n_rows") {
    // a null id yields a null HASH inside a non-null struct, which sorts
    // nulls-first — unguarded, >= k null-id rows would occupy every
    // sample slot and silently bias all estimates toward their values
    val rows = (0L until 64L).map(i => (Option(i), 100L + i)) ++
      (0L until 64L).map(i => (None: Option[Long], 900000L + i))
    val got = Sketches.sampledQuantiles(rows.toDF("id", "v"), col("id"), col("v"),
      k = 32, permille = Seq(500, 1000)).collect().head
    assert(got.getLong(0) == 128L && got.getLong(1) == 32L)
    // the sample is drawn ONLY from the identified rows (values < 900000)
    assert(got.getLong(2) < 900000L && got.getLong(3) < 900000L)
    val sample = (0L until 64L).map(i => (i, 100L + i))
      .sortBy { case (i, _) => (md5Long60(s"${i}bk"), i) }
      .take(32).map(_._2).sorted
    assert(got.getLong(2) == sample((500 * 32 + 999) / 1000 - 1))
    assert(got.getLong(3) == sample(31))
  }

  test("sampledQuantiles: null values are excluded from the sample, counted in n_rows") {
    // pre-fix, null-valued sampled rows inflated n_sample past the
    // collected array and the high-permille rank read past the end
    val rows = (0L until 500L).map(i =>
      (i, if (i % 3 == 0) None else Some(i * 7 % 1000)))
    val df = rows.toDF("id", "v").repartition(7)
    val got = Sketches.sampledQuantiles(df, col("id"), col("v"),
      k = 64, permille = Seq(500, 1000)).collect().head
    assert(got.getLong(0) == 500L && got.getLong(1) == 64L)
    val sample = rows.collect { case (i, Some(v)) => (i, v) }
      .sortBy { case (i, _) => (md5Long60(s"${i}bk"), i) }
      .take(64).map(_._2.toLong).sorted
    assert(got.getLong(2) == sample(31) && got.getLong(3) == sample(63))
    // an ALL-null value column: n_sample 0, null estimates, no error
    val allNull = Sketches.sampledQuantiles(
      (0L until 50L).map(i => (i, None: Option[Long])).toDF("id", "v"),
      col("id"), col("v"), k = 16, permille = Seq(500)).collect().head
    assert(allNull.getLong(0) == 50L && allNull.getLong(1) == 0L && allNull.isNullAt(2))
  }

  test("weightedBottomKSample: tiny positive weights clamp instead of overflowing") {
    // weight 1e-13 drives the raw clock past the e6 long range; the
    // clamp keeps the key finite and the row sampleable last
    val df = Seq((1L, 1.0), (2L, 1.0e-13), (3L, 2.0)).toDF("id", "w")
    val got = Sketches.weightedBottomKSample(df, col("id"), col("w"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == 9000000000000000000L) // MaxClock * 1e6
    assert(got(1L) < got(2L) && got(3L) < got(2L))
  }

  test("esClockKeyE6: NULL id/weight propagates a NULL key, not the max clamp") {
    // least() skips NULLs — without the explicit guard a NULL clock
    // clamps to MaxClock and the row flips from nulls-first (always
    // sampled under the struct ordering) to effectively never sampled
    val rows = Seq((Option(1L), Option(1.0)), (None: Option[Long], Option(1.0)),
      (Option(2L), None: Option[Double]))
    val got = rows.toDF("id", "w")
      .select(col("id"), Sketches.esClockKeyE6(col("id"), col("w"), "wk").as("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.isNullAt(1)).toMap
    assert(!got(1L), "real id+weight must key")
    assert(got(-1L), "NULL id must propagate a NULL key")
    assert(got(2L), "NULL weight must propagate a NULL key")
  }
}
