package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Specs for the event-analytics family (as-of join, funnel, cohort
  * retention, hopping windows): each operator is compared against an
  * independent brute-force sequential reference on seeded random
  * multi-partition data, plus edge cases (no-match rows, ts ties,
  * empty steps, window alignment at ts=0). */
class EventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // seeded random event log: ~60 keys x ~40 events, intentional ts ties
  private val rnd = new scala.util.Random(77)
  private val types = Seq("signup", "click", "purchase", "view")
  private case class Ev(seq: Long, k: Long, ts: Long, t: String, v: Long)
  private val evs: Seq[Ev] = (0L until 2400L).map { i =>
    Ev(i, rnd.nextInt(60).toLong, (rnd.nextInt(500) * 10).toLong,
      types(rnd.nextInt(types.size)), rnd.nextInt(1000).toLong)
  }
  private lazy val evDf = spark.createDataFrame(evs).repartition(7)

  test("asOfJoin matches the brute-force argmax range join, incl. ties and no-match") {
    val left = evDf.filter($"t" === "purchase").select($"seq", $"k", $"ts")
    val right = evDf.filter($"t" === "click").select($"seq", $"k", $"ts", $"v")
    val got = Events.asOfJoin(left, $"k", $"ts", $"seq", right, $"k", $"ts", $"seq")
      .select($"seq", $"asof.seq".as("mseq"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val clicks = evs.filter(_.t == "click")
    val want = evs.filter(_.t == "purchase").map { p =>
      val cands = clicks.filter(c => c.k == p.k && c.ts <= p.ts)
      val m = if (cands.isEmpty) -1L
        else cands.maxBy(c => (c.ts, c.seq)).seq
      p.seq -> m
    }.toMap
    assert(got == want)
    // the fixture must actually exercise both regimes
    assert(want.values.exists(_ == -1L) && want.values.exists(_ != -1L))
    // ties exist: some purchase shares a ts with a matching click
    assert(evs.filter(_.t == "purchase").exists(p =>
      clicks.exists(c => c.k == p.k && c.ts == p.ts)))
  }

  /** brute-force re-anchoring oracle: per key, the earliest completion ts
    * of each step over ALL valid chains — greedy-from-each-anchor is
    * optimal per anchor, so the min over anchors is exact. */
  private def bruteFunnel(es: Seq[Ev], steps: Seq[String],
      span: Long): Array[Option[Long]] = {
    val earliest = Array.fill[Option[Long]](steps.size)(None)
    def note(i: Int, ts: Long): Unit =
      if (earliest(i).forall(_ > ts)) earliest(i) = Some(ts)
    for (a <- es if a.t == steps.head) {
      note(0, a.ts)
      var prev = a.ts
      var i = 1
      var ok = true
      while (i < steps.size && ok) {
        val cand = es.filter(e => e.t == steps(i) && e.ts > prev &&
          e.ts <= a.ts + span)
        if (cand.nonEmpty) { prev = cand.map(_.ts).min; note(i, prev) }
        else ok = false
        i += 1
      }
    }
    earliest
  }

  test("funnel matches a per-anchor greedy scan (re-anchoring semantics)") {
    val steps = Seq("signup", "click", "purchase")
    val span = 800L
    val got = Events.funnel(evDf, $"k", $"ts", $"t", steps, span)
      .orderBy($"step_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    val perKey = evs.groupBy(_.k).values
      .map(es => bruteFunnel(es, steps, span)).toSeq
    val want = steps.indices.map(i =>
      (i, steps(i), perKey.count(_(i).isDefined).toLong))
    assert(got.toSeq == want)
    // counts are non-increasing and the last step still discriminates on
    // this fixture (re-anchoring lifts early-step conversions — with 60
    // active keys and dense events, nearly every signup eventually clicks)
    assert(want(0)._3 >= want(1)._3 && want(1)._3 > want(2)._3 && want(2)._3 > 0)
  }

  test("funnel matches the per-anchor scan across seeds, spans and densities") {
    // multi-seed hardening: sparse and dense event regimes, tight and
    // loose spans — tight spans force re-anchoring to matter (the first
    // anchor's window usually closes before later steps)
    val steps = Seq("signup", "click", "purchase")
    for (seed <- Seq(5, 23, 71); span <- Seq(40L, 400L, 5000L)) {
      val r = new scala.util.Random(seed)
      val es = (0L until 600L).map { i =>
        Ev(i, r.nextInt(30).toLong, (r.nextInt(800) * 5).toLong,
          types(r.nextInt(types.size)), 0L)
      }
      val got = Events.funnel(spark.createDataFrame(es).repartition(5),
          $"k", $"ts", $"t", steps, span)
        .orderBy($"step_idx").collect().map(r2 => (r2.getInt(0), r2.getLong(2)))
      val perKey = es.groupBy(_.k).values.map(g => bruteFunnel(g, steps, span)).toSeq
      val want = steps.indices.map(i => (i, perKey.count(_(i).isDefined).toLong))
      assert(got.toSeq == want, s"seed $seed span $span")
      // per-key completion timestamps too
      val comps = Events.funnelCompletions(spark.createDataFrame(es).repartition(5),
          $"k", $"ts", $"t", steps, span)
        .collect().map(r2 => (r2.getLong(0), r2.getInt(1), r2.getLong(3)))
      val wantComps = es.groupBy(_.k).toSeq.flatMap { case (k, g) =>
        bruteFunnel(g, steps, span).zipWithIndex.collect {
          case (Some(ts), i) => (k, i, ts)
        }.toSeq
      }.toSet
      assert(comps.toSet == wantComps, s"seed $seed span $span")
    }
  }

  test("funnel re-anchors on a fresh step-0 after the first anchor expires") {
    // A@0, A@100, B@105, span 10: the first anchor's window closes at 10,
    // but the A@100 anchor converts via B@105 — first-anchor-only
    // semantics would report zero conversions (the r9 ADVICE bug)
    val df = Seq((1L, 0L, "A"), (1L, 100L, "A"), (1L, 105L, "B"))
      .toDF("k", "ts", "t")
    val got = Events.funnel(df, $"k", $"ts", $"t", Seq("A", "B"), 10L)
      .orderBy($"step_idx").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((0, 1L), (1, 1L)))
    val comps = Events.funnelCompletions(df, $"k", $"ts", $"t", Seq("A", "B"), 10L)
      .orderBy($"step_idx").collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(comps.toSeq == Seq((0, 0L), (1, 105L)))
  }

  test("funnel: same-timestamp events never chain, repeated step types do") {
    // strict increase: A@5, B@5 is NOT a chain; A@5, A@7 completes both
    // steps of [A, A] at 5 and 7
    val df1 = Seq((1L, 5L, "A"), (1L, 5L, "B")).toDF("k", "ts", "t")
    val g1 = Events.funnel(df1, $"k", $"ts", $"t", Seq("A", "B"), 100L)
      .orderBy($"step_idx").collect().map(_.getLong(2))
    assert(g1.toSeq == Seq(1L, 0L))
    val df2 = Seq((1L, 5L, "A"), (1L, 7L, "A")).toDF("k", "ts", "t")
    val g2 = Events.funnelCompletions(df2, $"k", $"ts", $"t", Seq("A", "A"), 100L)
      .orderBy($"step_idx").collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(g2.toSeq == Seq((0, 5L), (1, 7L)))
  }

  test("funnelCompletions rolls up to funnel, and chains agree with the scan") {
    val steps = Seq("signup", "click", "purchase")
    val span = 800L
    val comps = Events.funnelCompletions(evDf, $"k", $"ts", $"t", steps, span)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // rollup equality
    val counts = comps.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val funnelCounts = Events.funnel(evDf, $"k", $"ts", $"t", steps, span)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    steps.indices.foreach { i =>
      assert(funnelCounts(i) == counts.getOrElse(i, 0L), s"step $i")
    }
    // per-key chain structure: idx set is a prefix, timestamps increase
    comps.groupBy(_._1).values.foreach { g =>
      val byIdx = g.sortBy(_._2)
      assert(byIdx.map(_._2).toSeq == (0 until byIdx.size).toSeq)
      assert(byIdx.map(_._4).toSeq == byIdx.map(_._4).sorted.toSeq)
    }
    // completion timestamps are the brute-force earliest over ALL anchors
    val byKey = evs.groupBy(_.k)
    comps.groupBy(_._1).foreach { case (k, g) =>
      val want = bruteFunnel(byKey(k), steps, span)
      g.foreach { case (_, i, _, ts) => assert(want(i).contains(ts), s"key $k step $i") }
      assert(g.size == want.count(_.isDefined), s"key $k")
    }
  }

  test("cohortRetention matches brute force") {
    val dayUnit = 700L
    val got = Events.cohortRetention(evDf, $"k", $"ts", dayUnit)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val first = evs.groupBy(_.k).map { case (k, es) => k -> es.map(_.ts / dayUnit).min }
    val want = evs.map(e => (e.k, first(e.k), e.ts / dayUnit - first(e.k)))
      .distinct.groupBy(e => (e._2, e._3)).map { case (kk, g) => kk -> g.size.toLong }
    assert(got == want)
  }

  test("rollingWindowStats matches the brute-force trailing scan, ties included") {
    val lookback = 300L
    val got = Events.rollingWindowStats(evDf, $"k", $"ts", $"seq", $"v", lookback)
      .collect().map(r => (r.getLong(2), (r.getLong(3), r.getLong(4)))).toMap
    evs.foreach { e =>
      val frame = evs.filter(o => o.k == e.k && o.ts > e.ts - lookback && o.ts <= e.ts)
      assert(got(e.seq) == (frame.size.toLong, frame.map(_.v * 100).sum),
        s"event ${e.seq}")
    }
    // ties exist and see identical closed windows
    val tied = evs.groupBy(e => (e.k, e.ts)).values.filter(_.size > 1)
    assert(tied.nonEmpty)
    tied.foreach(g => assert(g.map(e => got(e.seq)._1).toSet.size == 1))
  }

  test("hoppingWindowStats matches per-event window enumeration") {
    val len = 300L
    val slide = 100L
    val got = Events.hoppingWindowStats(evDf, $"ts", $"t", $"v", len, slide)
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val want = evs.flatMap { e =>
      (0L until len / slide).map(i => (e.ts - e.ts % slide - i * slide, e.t, e.v * 100))
    }.filter(_._1 >= 0)
      .groupBy(x => (x._1, x._2))
      .map { case (kk, g) => kk -> (g.size.toLong, g.map(_._3).sum) }
    assert(got == want)
    // ts=0 events are members of exactly ONE window (starts never negative)
    assert(evs.exists(_.ts == 0L))
  }

  test("hoppingWindowStats window starts agree with Spark's built-in window()") {
    // cross-check the epoch alignment contract against the engine's own
    // streaming window assignment on second-unit timestamps
    val df = evDf.select(($"ts" + 1).as("ts"), $"t", $"v") // avoid ts=0 edge: builtin keeps it too, just symmetric
    val ours = Events.hoppingWindowStats(df, $"ts", $"t", lit(0.0), 300L, 100L)
      .select($"window_start", $"n_events")
    val builtin = df
      .select(timestamp_seconds($"ts").as("tss"), $"t")
      .groupBy(window($"tss", "300 seconds", "100 seconds"), $"t")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp($"window.start").as("window_start"), $"n_events")
      .filter($"window_start" >= 0)
    val a = ours.groupBy($"window_start").agg(sum($"n_events").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = builtin.groupBy($"window_start").agg(sum($"n_events").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("rateAnomaly matches the sequential baseline reference, incl. gaps") {
    // group "a": steady 5/window then a 20-burst; group "b": events,
    // then a 2-window SILENT gap, then a burst (baseline must average
    // only windows that had events, not zero-fill the gap)
    val W = 100L
    val evs =
      (0 until 5).flatMap(w => (0 until 5).map(i => ("a", w * W + i))) ++
        (0 until 20).map(i => ("a", 5 * W + i)) ++
        (0 until 4).map(i => ("b", i.toLong)) ++
        (0 until 12).map(i => ("b", 3 * W + i))
    val df = evs.toDF("g", "ts").repartition(5)
    val got = Events.rateAnomaly(df, $"ts", $"g",
        windowLen = W, baseline = 3, threshNum = 3, threshDen = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val counts = evs.groupBy { case (g, ts) => (g, ts / W * W) }
      .view.mapValues(_.size.toLong).toMap
    val want = counts.map { case ((g, ws), n) =>
      val prev = counts.collect {
        case ((g2, ws2), n2) if g2 == g && ws2 >= ws - 3 * W && ws2 <= ws - W => n2
      }.toSeq
      val (psum, pcnt) = (prev.sum, prev.size.toLong)
      val flag = if (pcnt > 0 && n * pcnt * 2 > psum * 3) 1L else 0L
      (ws, g) -> ((n, psum, pcnt, flag))
    }
    assert(got == want)
    // the burst windows are flagged; the steady windows are not
    assert(got((5 * W, "a"))._4 == 1L)
    assert(got((2 * W, "a"))._4 == 0L)
    // after the gap, b's baseline is the single pre-gap window (the
    // two empty windows contribute nothing, not zeros)
    assert(got((3 * W, "b")) == ((12L, 4L, 1L, 1L)))
    // the very first window of each group is never flagged
    assert(got((0L, "a"))._4 == 0L && got((0L, "b"))._4 == 0L)

    // pre-epoch timestamps floor-align into their OWN negative window
    // (truncation would fold them into [0, W) and inflate its count)
    val neg = Events.rateAnomaly(
        Seq(("c", -50L), ("c", -20L), ("c", 10L)).toDF("g", "ts"),
        $"ts", $"g", windowLen = W, baseline = 3, threshNum = 3, threshDen = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(neg == Map(-100L -> 2L, 0L -> 1L))
  }

  test("asOfJoin plans one exchange on the key, no join node") {
    val left = evDf.filter($"t" === "purchase").select($"seq", $"k", $"ts")
    val right = evDf.filter($"t" === "click").select($"seq", $"k", $"ts", $"v")
    val plan = Events.asOfJoin(left, $"k", $"ts", $"seq", right, $"k", $"ts", $"seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
