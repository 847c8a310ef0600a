package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.freq_sketch_k
import graft.pipeline.Sketches

/**
 * The Misra-Gries frequent-items kernel and the exact two-pass
 * heavyHitters built on it. The sketch contract under test is the
 * mergeable-summaries guarantee: after ANY partitioning, every item with
 * true count > N/(k+1) keeps a counter, and each counter is a lower bound
 * short by at most N/(k+1).
 */
class FreqSketchKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Planted-heavy stream: `heavy` items each repeated `rep` times, plus a
    * distinct uniform tail. Deterministic ids. */
  private def planted(heavy: Int, rep: Int, tail: Int): Seq[Long] = {
    val h = for (i <- 0 until heavy; _ <- 0 until rep) yield i.toLong
    val t = (0 until tail).map(i => 1000000L + i)
    // interleave deterministically so heavy items aren't contiguous
    (h ++ t).zipWithIndex.sortBy { case (v, i) => (i * 2654435761L) % 1000003 }.map(_._1)
  }

  test("guarantee: items above N/(k+1) always present, counts are lower bounds within N/(k+1)") {
    val k = 16
    for (parts <- Seq(1, 7, 32)) {
      val xs = planted(heavy = 8, rep = 400, tail = 4000) // N = 7200
      val n = xs.length
      val trueCounts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = xs.toDF("v").repartition(parts)
        .agg(freq_sketch_k($"v", k)).collect().head
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      val bound = n.toDouble / (k + 1)
      trueCounts.foreach { case (v, c) =>
        if (c > bound) {
          assert(got.contains(v), s"parts=$parts: heavy item $v (count $c > $bound) missing")
        }
      }
      got.foreach { case (v, lb) =>
        val c = trueCounts(v)
        assert(lb <= c, s"parts=$parts: counter $lb exceeds true count $c for $v")
        assert(lb >= c - bound - 1, s"parts=$parts: counter $lb under-shoots $c by more than $bound")
      }
    }
  }

  test("distinct-light group: fewer than k distinct items means exact counts") {
    val xs = Seq(1L, 1L, 1L, 2L, 2L, 3L)
    val got = xs.toDF("v").repartition(4)
      .agg(freq_sketch_k($"v", 8)).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getLong(1))
    // no purge ever fires: exact, sorted (count desc, item asc)
    assert(got == Seq(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("string items, per-group sketches, null dropped") {
    val rows = Seq(
      ("a", "the"), ("a", "the"), ("a", "the"), ("a", "x"),
      ("b", "le"), ("b", "le"), ("b", null)).map { case (g, t) => (g, Option(t)) }
    val got = rows.toDF("g", "t").repartition(5)
      .groupBy($"g").agg(freq_sketch_k($"t", 4).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => x.getString(0) -> x.getLong(1))).toMap
    assert(got("a") == Seq("the" -> 3L, "x" -> 1L))
    assert(got("b") == Seq("le" -> 2L)) // null dropped like collect_set
  }

  test("SQL registration: freq_sketch_k(v, k) runs through spark.sql") {
    Seq(1L, 1L, 2L).toDF("v").createOrReplaceTempView("fsk_t")
    val got = spark.sql("SELECT freq_sketch_k(v, 4) FROM fsk_t").collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(r => r.getLong(0) -> r.getLong(1))
    assert(got == Seq(1L -> 2L, 2L -> 1L))
  }

  test("serialize round-trips; corrupt buffers reject loudly") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val agg = FreqSketchK(BoundReference(0, LongType, nullable = true), 4)
    val buf = agg.createAggregationBuffer()
    buf.update(7L: java.lang.Long, 3L)
    buf.update(9L: java.lang.Long, 1L)
    val bytes = agg.serialize(buf)
    assert(agg.deserialize(bytes).toMap == Map[Any, Long](7L -> 3L, 9L -> 1L))
    def reject(b: Array[Byte], what: String, a: FreqSketchK = agg): Unit = {
      val e = intercept[IllegalArgumentException] { a.deserialize(b) }
      assert(e.getMessage.contains("FreqSketchK"), s"$what: ${e.getMessage}")
    }
    reject(Array[Byte](0, 0), "truncated header")
    reject(bytes.dropRight(1), "short v0 payload")
    reject(bytes :+ 0.toByte, "long v0 payload")
    val badTag = bytes.clone(); badTag(0) = 9; reject(badTag, "unknown tag")
    // zero/negative counts are never serialized — a foreign buffer marker
    val zeroCount = bytes.clone()
    java.nio.ByteBuffer.wrap(zeroCount, 5 + 8, 8).putLong(0L)
    reject(zeroCount, "non-positive count")
    val strAgg = FreqSketchK(BoundReference(0, StringType, nullable = true), 4)
    val sbuf = strAgg.createAggregationBuffer()
    sbuf.update(org.apache.spark.unsafe.types.UTF8String.fromString("xy"), 2L)
    val v1 = strAgg.serialize(sbuf)
    assert(strAgg.deserialize(v1).values.toSeq == Seq(2L))
    reject(v1.patch(0, Array[Byte](0), 1), "v0 tag for non-long child", strAgg)
    val overLen = v1.clone(); overLen(5) = 0x7F
    reject(overLen, "element length past buffer", strAgg)
    // a length near Int.MaxValue must reject cleanly, not wrap an int
    // comparison and attempt a ~2 GB allocation
    val maxLen = v1.clone()
    java.nio.ByteBuffer.wrap(maxLen, 5, 4).putInt(Int.MaxValue)
    reject(maxLen, "Int.MaxValue length", strAgg)
  }

  test("float/double keys canonicalize: -0.0/0.0 and NaN payloads share one counter") {
    // -0.0 and 0.0 box to DISTINCT HashMap keys but are equal under
    // Catalyst grouping; split encodings must not split the counter
    // (a heavy value could otherwise drop below the purge bound twice)
    val zeros = Seq.fill(30)(0.0d) ++ Seq.fill(30)(-0.0d) ++
      (1 to 25).map(_.toDouble) // tail pressure, k=4 forces purges
    val got = zeros.toDF("v").repartition(8)
      .agg(freq_sketch_k($"v", 4)).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getDouble(0) -> r.getLong(1))
    assert(got.head._1 == 0.0d && got.head._2 >= 60 - (85.0 / 5) - 1,
      s"zero counter not merged: $got")
    assert(got.count(_._1 == 0.0d) == 1)
  }

  test("unsupported child type fails at analysis time") {
    val e = intercept[Exception] {
      Seq((1, (2L, 3L))).toDF("g", "s").agg(freq_sketch_k($"s", 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("atomic") ||
      e.getMessage.toLowerCase.contains("freq_sketch_k"))
  }

  test("heavyHitters equals exact GROUP BY/HAVING brute force across partitionings and thresholds") {
    // zipf-ish corpus: token i appears ~ N/i times
    val xs = (1 to 60).flatMap(i => Seq.fill(600 / i)(s"tok$i"))
    for (parts <- Seq(1, 13); permille <- Seq(10, 50)) {
      val df = xs.toDF("t").repartition(parts)
      val k = math.max(1000 / permille + 1, 8)
      val got = Sketches.heavyHitters(df, col("t"), permille, k)
        .orderBy(desc("n_occurrences"), col("item"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val n = xs.length.toLong
      val want = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .filter { case (_, c) => c * 1000 >= n * permille }
        .sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => (t, c, n) }
      assert(got.toSeq == want, s"parts=$parts permille=$permille")
    }
  }

  test("heavyHittersBy: per-group thresholds against each group's own total") {
    // group "a": token heavy only relative to a's small total; group "b":
    // same token diluted below threshold by b's volume
    val rows = Seq.fill(20)(("a", "hot")) ++ (1 to 80).map(i => ("a", s"ta$i")) ++
      Seq.fill(20)(("b", "hot")) ++ (1 to 980).map(i => ("b", s"tb$i"))
    val got = Sketches.heavyHittersBy(rows.toDF("g", "t").repartition(9),
        Seq(col("g")), col("t"), minPermille = 100, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "hot" is 20% of a (>=10%) but 2% of b (<10%)
    assert(got.toSeq == Seq(("a", "hot", 20L, 100L)))
  }

  test("heavyHittersBy: NULL group keys keep their heavy hitters (null-safe join-back)") {
    // groupBy treats NULL as a group; a plain USING join-back would
    // silently drop the NULL group's candidates (NULL != NULL)
    val rows = Seq.fill(5)((None: Option[String], "hot")) ++
      (1 to 5).map(i => (None: Option[String], s"t$i")) ++
      Seq.fill(4)((Option("en"), "the")) ++ (1 to 6).map(i => (Option("en"), s"e$i"))
    val got = Sketches.heavyHittersBy(rows.toDF("g", "t").repartition(4),
        Seq(col("g")), col("t"), minPermille = 300, k = 8)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set((None, "hot", 5L, 10L), (Some("en"), "the", 4L, 10L)))
  }

  test("grouped sketch operators reject reserved group aliases loudly") {
    val df = Seq(("a", 1L, 2L)).toDF("g", "id", "v")
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersBy(df, Seq(col("g").as("n_total")), col("v"),
        minPermille = 500, k = 8)
    }
    intercept[IllegalArgumentException] {
      Sketches.sampledQuantilesBy(df, Seq(col("g").as("n_rows")), col("id"),
        col("v"), k = 8, permille = Seq(500))
    }
  }

  test("heavyHitters rejects an under-provisioned k; empty input yields empty output") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("t"), col("t"), minPermille = 5, k = 100)
    }
    val empty = Sketches.heavyHitters(
      spark.emptyDataset[String].toDF("t"), col("t"), minPermille = 100, k = 16)
    assert(empty.count() == 0)
  }
}
