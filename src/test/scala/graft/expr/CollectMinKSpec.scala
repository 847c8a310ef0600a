package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.collect_min_k

/**
 * The bounded min-k collect kernel (the LSH / Hamming hot-band cap).
 * Every test compares against the reference semantics
 * `slice(sort_array(collect_set(x)), 1, k)` — the expression the kernel
 * replaces at [[graft.pipeline.Dedup.lshCandidatePairs]] and
 * [[graft.pipeline.Dedup.bandedHammingPairs]].
 */
class CollectMinKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Oracle: k smallest distinct, ascending. */
  private def oracle(xs: Seq[Long], k: Int): Seq[Long] = xs.distinct.sorted.take(k)

  test("multi-partition long ids match slice(sort_array(collect_set)) — the serialize round-trip") {
    // many partitions forces partial aggregation: serialize/deserialize/merge
    // all execute, which is exactly where a buffer-aliasing bug would show
    val rows = (0 until 10000).map(i => ((i % 7).toLong, ((i * 2654435761L) % 1000) - 500))
    val df = spark.createDataset(rows).toDF("g", "v").repartition(32)
    val got = df.groupBy($"g")
      .agg(collect_min_k($"v", 10).as("mk"),
        slice(sort_array(collect_set($"v")), 1, 10).as("ref"))
      .collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"group ${r.getLong(0)}")
      assert(r.getSeq[Long](1).size == 10)
    }
  }

  test("duplicate-heavy input still yields k distinct values (bounded-heap gap fixed)") {
    // k=3, inputs 1,1,2,3: a duplicate-blind bounded heap keeps [1,1,2] and
    // evals to [1,2]; the distinct-by-construction buffer must give [1,2,3]
    val df = Seq(1L, 1L, 2L, 3L).toDF("v").repartition(4)
    val got = df.agg(collect_min_k($"v", 3)).as[Seq[Long]].head()
    assert(got == Seq(1L, 2L, 3L))
    // a hot band: one value dominating millions of rows must not evict the tail
    val hot = spark.range(0, 200000).select(
      when($"id" % 100000 === 0, $"id" + 1000000).otherwise(lit(42L)).as("v"))
      .repartition(16)
    assert(hot.agg(collect_min_k($"v", 4)).as[Seq[Long]].head() ==
      Seq(42L, 1000000L, 1100000L))
  }

  test("k=1, group smaller than k, and all-null groups") {
    val df = Seq(
      (1L, Some(5L)), (1L, Some(3L)), (1L, Some(9L)),
      (2L, Some(7L)),
      (3L, None), (3L, None)).toDF("g", "v").repartition(8)
    val got = df.groupBy($"g").agg(collect_min_k($"v", 1).as("m1"), collect_min_k($"v", 5).as("m5"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(got(1L) == (Seq(3L), Seq(3L, 5L, 9L)))
    assert(got(2L) == (Seq(7L), Seq(7L)))
    assert(got(3L) == (Seq(), Seq())) // nulls dropped like collect_set
  }

  test("struct(id, hash) children order field-by-field like sort_array") {
    val rows = (0 until 5000).map { i =>
      (i % 5, (i * 48271L) % 50, (i * 16807L) % 1000)
    }
    val df = rows.toDF("g", "id", "h").repartition(24)
      .select($"g", struct($"id", $"h").as("m"))
    val got = df.groupBy($"g")
      .agg(collect_min_k($"m", 7).as("mk"),
        slice(sort_array(collect_set($"m")), 1, 7).as("ref"))
      .collect()
    assert(got.length == 5)
    got.foreach { r => assert(r.getSeq[Row](1) == r.getSeq[Row](2), s"group ${r.getInt(0)}") }
  }

  test("SQL registration: collect_min_k(v, k) runs through spark.sql") {
    H3Registry.register(spark)
    spark.range(0, 1000).select(($"id" % 13).as("g"), (($"id" * 7919) % 997).as("v"))
      .repartition(8).createOrReplaceTempView("cmk_in")
    val got = spark.sql(
      """SELECT g, collect_min_k(v, 5) AS mk,
        |       slice(sort_array(collect_set(v)), 1, 5) AS ref
        |FROM cmk_in GROUP BY g""".stripMargin).collect()
    assert(got.length == 13)
    got.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2)))
  }

  test("degenerate band: 1M identical values complete with an O(k) buffer") {
    // the 100-TB OOM scenario in miniature: every row lands in one group
    // with one value; collect_set would buffer 1M entries in one task,
    // collect_min_k buffers exactly 1
    val got = spark.range(0, 1000000).select(lit(0L).as("g"), lit(1234567L).as("v"))
      .repartition(32)
      .groupBy($"g").agg(collect_min_k($"v", 4096).as("mk"))
      .as[(Long, Seq[Long])].head()
    assert(got == (0L, Seq(1234567L)))
  }

  test("deserialize validates tags and payload lengths loudly") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val agg = CollectMinK(BoundReference(0, LongType, nullable = true), 4)
    // round-trip sanity
    val buf = agg.createAggregationBuffer()
    Seq(3L, 1L, 9L).foreach(v => buf.add(v: java.lang.Long))
    val bytes = agg.serialize(buf)
    assert(agg.deserialize(bytes).toArray.toSeq == Seq(1L, 3L, 9L))
    def expectReject(b: Array[Byte], what: String, a: CollectMinK = agg): Unit = {
      val e = intercept[IllegalArgumentException] { a.deserialize(b) }
      assert(e.getMessage.contains("CollectMinK"), s"$what: ${e.getMessage}")
    }
    // truncated header
    expectReject(Array[Byte](0, 0), "truncated header")
    // version-0 buffer whose length disagrees with its count — the
    // pre-change decoder parsed any count<2^24 prefix as raw longs
    expectReject(bytes.dropRight(1), "short v0 payload")
    expectReject(bytes :+ 0.toByte, "long v0 payload")
    // unknown version tag must never fall through to the UnsafeRow path
    val badTag = bytes.clone(); badTag(0) = 7
    expectReject(badTag, "unknown tag")
    // negative count
    val negCount = bytes.clone(); negCount(1) = 0xFF.toByte
    expectReject(negCount, "negative count")
    // version-0 tag on a non-long child is a foreign buffer
    val strAgg = CollectMinK(BoundReference(0, StringType, nullable = true), 4)
    expectReject(strAgg.serialize(strAgg.createAggregationBuffer())
      .patch(0, Array[Byte](0), 1), "v0 tag for non-long child", strAgg)
    // version-1 element length pointing past the buffer end
    val sbuf = strAgg.createAggregationBuffer()
    sbuf.add(org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    val v1 = strAgg.serialize(sbuf)
    val overLen = v1.clone(); overLen(5) = 0x7F // first element length -> huge
    val e = intercept[IllegalArgumentException] { strAgg.deserialize(overLen) }
    assert(e.getMessage.contains("CollectMinK"))
  }

  test("deserialize rejects corrupt nested struct images (zero/short size)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
    // the bottomKSample / sampledQuantiles child shape: all-long struct
    val st = StructType(Seq(StructField("h", LongType), StructField("i", LongType)))
    val agg = CollectMinK(BoundReference(0, st, nullable = true), 4)
    val proj = UnsafeProjection.create(Array[DataType](st))
    val buf = agg.createAggregationBuffer()
    buf.add(InternalRow.copyValue(proj(InternalRow(InternalRow(3L, 7L))).get(0, st)))
    val bytes = agg.serialize(buf)
    // round-trip sanity: one 40-byte element (16 root + 24 nested)
    assert(agg.deserialize(bytes).size() == 1)
    // corrupt the root (offset,size) slot — img starts at byte 9, slot at
    // img[8..16], native order exactly as UnsafeRow reads it. A (16, 0)
    // slot passed the pre-change window check and fed a 0-byte struct to
    // the TreeSet ordering (out-of-bounds Unsafe reads, garbage order).
    for (size <- Seq(0, 16)) { // zero and short-of-24
      val bad = bytes.clone()
      java.nio.ByteBuffer.wrap(bad, 9 + 8, 8)
        .order(java.nio.ByteOrder.nativeOrder()).putLong((16L << 32) | size.toLong)
      val e = intercept[IllegalArgumentException] { agg.deserialize(bad) }
      assert(e.getMessage.contains("nested value size"), s"size=$size: ${e.getMessage}")
    }
    // rewriting the true slot (16, 24) is a no-op sanity check
    val same = bytes.clone()
    java.nio.ByteBuffer.wrap(same, 9 + 8, 8)
      .order(java.nio.ByteOrder.nativeOrder()).putLong((16L << 32) | 24L)
    assert(agg.deserialize(same).size() == 1)
    // the OVERSIZE branch: an all-fixed-width struct's size is EXACT, so
    // size=32 must reject even when an inflated element length makes the
    // (off, size) window check pass. Build it: 48-byte element image =
    // the real 40 bytes + 8 zero-pad, slot patched to (16, 32); buffer =
    // tag, n=1, len=48, image.
    val img48 = new Array[Byte](48)
    System.arraycopy(bytes, 9, img48, 0, 40)
    java.nio.ByteBuffer.wrap(img48, 8, 8)
      .order(java.nio.ByteOrder.nativeOrder()).putLong((16L << 32) | 32L)
    val oversize = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 48)
      .put(1.toByte).putInt(1).putInt(48).put(img48).array()
    val e2 = intercept[IllegalArgumentException] { agg.deserialize(oversize) }
    assert(e2.getMessage.contains("expected 24"), e2.getMessage)
  }

  test("deserialize fuzz: random bytes always reject cleanly, never crash") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val longAgg = CollectMinK(BoundReference(0, LongType, nullable = true), 4)
    val strAgg = CollectMinK(BoundReference(0, StringType, nullable = true), 4)
    val rnd = new scala.util.Random(17)
    var rejected = 0
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      for (agg <- Seq(longAgg, strAgg)) {
        try { agg.deserialize(b); () }
        catch {
          case _: IllegalArgumentException => rejected += 1
          case e: Throwable => fail(s"non-IAE ${e.getClass} on ${b.toSeq}")
        }
      }
    }
    // nearly all random buffers must be rejected (a 0-tag buffer of
    // exactly matching length can legitimately parse)
    assert(rejected > 3500, s"only $rejected rejections")
  }

  test("unorderable child type fails at analysis time") {
    val df = Seq((1, Map("a" -> 1))).toDF("g", "m")
    val e = intercept[Exception] { df.groupBy($"g").agg(collect_min_k($"m", 3)).collect() }
    assert(e.getMessage.toLowerCase.contains("collect_min_k") ||
      e.getMessage.toLowerCase.contains("ordering") ||
      e.getMessage.toLowerCase.contains("map"))
  }
}
