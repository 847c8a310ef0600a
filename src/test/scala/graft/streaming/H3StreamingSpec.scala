package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession
import graft.h3.{H3Core, H3Geo}

class H3StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: Int): Timestamp = new Timestamp(1700000000000L + s * 1000L)

  test("stateless H3 enrichment + windowed parent rollup over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double, Double, Double)]
    val enriched = H3Streaming.withCells(
      input.toDF.toDF("ts", "lat", "lng", "value"), "lat", "lng", res = 9, parentRes = 5)
    val rollup = H3Streaming.windowedParentRollup(enriched, "ts", "value",
      watermark = "10 seconds", windowLen = "30 seconds")

    val query = rollup.writeStream
      .format("memory").queryName("rollup").outputMode("complete").start()
    try {
      input.addData(
        (ts(0), 37.77, -122.42, 1.0), (ts(1), 37.77, -122.42, 2.0),
        (ts(2), 48.85, 2.35, 5.0), (ts(40), 37.77, -122.42, 7.0))
      query.processAllAvailable()
      val rows = spark.table("rollup")
        .select($"parent", $"n", $"total_value").as[(Long, Long, Double)].collect()
      val sfParent = H3Core.cellToParent(H3Geo.latLngToCell(37.77, -122.42, 9), 5)
      val parisParent = H3Core.cellToParent(H3Geo.latLngToCell(48.85, 2.35, 9), 5)
      // two windows for SF (0-30s with 2 events, 30-60s with 1), one for Paris
      assert(rows.count(_._1 == sfParent) == 2)
      val sfTotals = rows.filter(_._1 == sfParent).map(r => (r._2, r._3)).toSet
      assert(sfTotals == Set((2L, 3.0), (1L, 7.0)))
      assert(rows.filter(_._1 == parisParent).map(r => (r._2, r._3)).toSeq == Seq((1L, 5.0)))
    } finally query.stop()
  }

  test("streaming exact dedup drops in-watermark duplicates, keeps distinct") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = H3Streaming.streamingExactDedup(
      input.toDF.toDF("ts", "doc_id", "text"), "ts", "text", watermark = "1 minute")
    val query = deduped.writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    try {
      input.addData(
        (ts(0), 1L, "alpha body"), (ts(1), 2L, "beta body"),
        (ts(2), 3L, "alpha body"), // duplicate of doc 1 within watermark
        (ts(3), 4L, "gamma body"))
      query.processAllAvailable()
      val ids = spark.table("deduped").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 4L), s"got $ids")
    } finally query.stop()
  }

  test("simHashColumn (per-row, stateless) matches batch simHash exactly") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val batch = Dedup.simHash(docs, $"doc_id", $"text")
      .withColumnRenamed("__id", "doc_id")
    val perRow = docs.select($"doc_id", Dedup.simHashColumn($"text").as("simhash"))
    assert(batch.except(perRow).isEmpty && perRow.except(batch).isEmpty)
  }

  test("streaming simhash near-dup candidates found across micro-batches") {
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    // heavy token repetition keeps most bit sums far from zero, so ONE
    // extra token flips only the few near-zero bits -> small hamming
    val base = Seq.fill(12)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val nearDup = base + " ok"
    val far = "completely unrelated content about spark physical plans and shuffles"
    // precondition: the planted pair really is within the threshold
    val Seq(h1, h2) = Seq(base, nearDup).map { t =>
      Seq((1L, t)).toDF("id", "text")
        .select(Dedup.simHashColumn($"text")).as[Long].head()
    }
    val ham = java.lang.Long.bitCount(h1 ^ h2)
    assume(ham <= 3, s"fixture drifted: hamming $ham")

    val input = MemoryStream[(Long, Timestamp, String)]
    val t0 = new Timestamp(1700000000000L)
    val cands = H3Streaming.streamingSimHashCandidates(
      input.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      watermark = "10 seconds", maxHamming = 3)
    val query = cands.writeStream
      .format("memory").queryName("cands").outputMode("append").start()
    try {
      input.addData((1L, t0, base), (2L, t0, far))
      query.processAllAvailable()
      assert(spark.table("cands").isEmpty) // no qualifying pair yet
      // the near-dup arrives in a LATER micro-batch: state must carry over
      input.addData((3L, new Timestamp(t0.getTime + 1000L), nearDup))
      query.processAllAvailable()
      val pairs = spark.table("cands").as[(Long, Long, Int)].collect().toSet
      assert(pairs == Set((1L, 3L, ham)), s"got $pairs")
    } finally query.stop()
  }

  test("streaming simhash state evicts past the event-time TTL") {
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.fill(12)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val nearDup = base + " ok"
    val far = "completely unrelated content about spark physical plans and shuffles"
    val input = MemoryStream[(Long, Timestamp, String)]
    val t0 = new Timestamp(1700000000000L)
    // TTL 5 s: the twin arriving 60 s later must NOT match (its partner
    // was pruned), while a fresh in-horizon pair still does
    val cands = H3Streaming.streamingSimHashCandidates(
      input.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      watermark = "0 seconds", maxHamming = 3, stateTtlUs = 5000000L)
    val query = cands.writeStream
      .format("memory").queryName("cands_ttl").outputMode("append").start()
    try {
      input.addData((1L, t0, base))
      query.processAllAvailable()
      // unrelated traffic advances the watermark far past t0 + TTL
      input.addData((2L, new Timestamp(t0.getTime + 60000L), far))
      query.processAllAvailable()
      // doc 1's bands are expired: whether by quiet-band timeout or by
      // arrival-time pruning, the old twin must not match
      input.addData((3L, new Timestamp(t0.getTime + 61000L), nearDup))
      query.processAllAvailable()
      assert(spark.table("cands_ttl").isEmpty,
        spark.table("cands_ttl").collect().mkString(","))
      // a fresh near-dup pair inside the horizon still matches
      input.addData((4L, new Timestamp(t0.getTime + 62000L), base))
      query.processAllAvailable()
      val pairs = spark.table("cands_ttl").as[(Long, Long, Int)].collect().toSet
      assert(pairs.nonEmpty && pairs.forall(p => Set(p._1, p._2).subsetOf(Set(3L, 4L))),
        s"got $pairs")
    } finally query.stop()
  }

  test("streaming simhash: late rows respect the event-time TTL symmetrically") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.fill(12)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val nearDup = base + " ok"
    val input = MemoryStream[(Long, Timestamp, String)]
    val t0 = 1700000000000L
    // generous watermark so late rows REACH the operator; TTL 60 s
    val cands = H3Streaming.streamingSimHashCandidates(
      input.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      watermark = "30 days", maxHamming = 3, stateTtlUs = 60000000L)
    val query = cands.writeStream
      .format("memory").queryName("cands_late").outputMode("append").start()
    try {
      input.addData((1L, new Timestamp(t0 + 100000L), base))
      query.processAllAvailable()
      // late arrival 70 s OLDER than the band's newest member: outside the
      // TTL horizon — must neither match nor enter state (pre-change code
      // emitted this pair with an event-time gap beyond the TTL)
      input.addData((2L, new Timestamp(t0 + 30000L), nearDup))
      query.processAllAvailable()
      assert(spark.table("cands_late").isEmpty,
        spark.table("cands_late").collect().mkString(","))
      // late but INSIDE the horizon (5 s gap): matches doc 1 only (doc 2
      // was never admitted)
      input.addData((3L, new Timestamp(t0 + 95000L), nearDup))
      query.processAllAvailable()
      val pairs = spark.table("cands_late").as[(Long, Long, Int)].collect().toSet
      assert(pairs.nonEmpty && pairs.forall(p => (p._1, p._2) == ((1L, 3L))),
        s"got $pairs")
    } finally query.stop()
  }

  test("windowed compaction emits compacted cell sets per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val stream = input.toDF.toDF("ts", "cell")
    val compacted = H3Streaming.windowedCompact(stream, "ts", "cell",
      watermark = "10 seconds", windowLen = "30 seconds")
    val query = compacted.writeStream
      .format("memory").queryName("compacted").outputMode("complete").start()
    try {
      // feed all 7 children of one parent -> window compacts to the parent
      val parent = H3Geo.latLngToCell(37.77, -122.42, 6)
      val children = H3Core.cellToChildren(parent, 7)
      input.addData(children.zipWithIndex.map { case (c, i) => (ts(i), c) }.toSeq: _*)
      query.processAllAvailable()
      val cells = spark.table("compacted").select($"cells").as[Seq[Long]].collect()
      assert(cells.length == 1 && cells.head == Seq(parent))
    } finally query.stop()
  }

  test("streaming incremental dedup vs static corpus; saturated bloom stays exact") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "seen one"), (2L, "seen two"), (3L, "seen three"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    // tiny bloom (high FP rate) deliberately: exactness must come from the
    // anti-join, not from bloom accuracy
    val out = H3Streaming.streamingIncrementalDedup(
      input.toDF.toDF("doc_id", "text"), "text", ref, "text",
      expectedRefItems = 2L, fpp = 0.4)
    val query = out.writeStream
      .format("memory").queryName("incdedup").outputMode("append").start()
    try {
      input.addData((10L, "seen one"), (11L, "fresh a"), (12L, "seen three"),
        (13L, "fresh b"))
      query.processAllAvailable()
      val kept = spark.table("incdedup").select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(11L, 13L))
    } finally query.stop()
  }

  test("streaming line dedup strips reference boilerplate, keeps novel prose") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      (1L, "some article text\nsubscribe to our newsletter today"),
      (2L, "other article\ncopyright example corporation"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingLineDedup(
      input.toDF.toDF("doc_id", "text"), "text",
      ref, "text", minLineChars = 5, expectedRefLines = 100L, fpp = 0.001)
    val query = out.writeStream
      .format("memory").queryName("linestrip").outputMode("append").start()
    try {
      input.addData(
        (10L, "fresh paragraph here\nsubscribe to our newsletter today\nmore fresh prose"),
        (11L, "copyright example corporation\nok\nnovel line entirely"),
        (12L, "all novel content"),
        (13L, null))
      query.processAllAvailable()
      val got = spark.table("linestrip")
        .select($"doc_id", $"text", $"n_lines", $"n_kept")
        .collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) null else r.getString(1)), r.isNullAt(2),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(got(10L) == (("fresh paragraph here\nmore fresh prose", false, 3L, 2L)))
      // "ok" is under minLineChars: bypasses even though short
      assert(got(11L) == (("ok\nnovel line entirely", false, 3L, 2L)))
      assert(got(12L) == (("all novel content", false, 1L, 1L)))
      // null text: null stays null, accounting ZEROED (batch lineDedup's
      // null-doc contract) — not null counts
      assert(got(13L) == ((null, false, 0L, 0L)))
    } finally query.stop()
  }

  test("streaming line/substring strip survive an EMPTY reference (guarded bloom)") {
    implicit val sqlCtx = spark.sqlContext
    // an empty ref previously NPE'd in stat.bloomFilter's null-buffer
    // decode (the guard the incremental dedups already had); with the
    // shared Dedup.keyBloom everything passes through untouched
    val emptyRef = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val inLine = MemoryStream[(Long, String)]
    val line = H3Streaming.streamingLineDedup(
      inLine.toDF.toDF("doc_id", "text"), "text", emptyRef, "text",
      minLineChars = 5, expectedRefLines = 100L, fpp = 0.001)
    val q1 = line.writeStream.format("memory").queryName("linestrip_empty")
      .outputMode("append").start()
    try {
      inLine.addData((1L, "keep this line\nand this one"))
      q1.processAllAvailable()
      val r = spark.table("linestrip_empty")
        .select($"text", $"n_kept").collect()
      assert(r.length == 1 && r(0).getString(0) == "keep this line\nand this one"
        && r(0).getLong(1) == 2L)
    } finally q1.stop()
    val inSub = MemoryStream[(Long, String)]
    val sub = H3Streaming.streamingSubstringDedup(
      inSub.toDF.toDF("doc_id", "text"), "text", emptyRef, "text", n = 2,
      expectedRefGrams = 100L)
    val q2 = sub.writeStream.format("memory").queryName("substrip_empty")
      .outputMode("append").start()
    try {
      inSub.addData((1L, "alpha beta gamma"))
      q2.processAllAvailable()
      val r = spark.table("substrip_empty")
        .select($"text", $"n_removed").collect()
      assert(r.length == 1 && r(0).getString(0) == "alpha beta gamma"
        && r(0).getLong(1) == 0L)
    } finally q2.stop()
  }

  test("streaming source cap admits first-cap per source across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val out = H3Streaming.streamingSourceCap(
      input.toDF.toDF("doc_id", "src", "text"), "src", cap = 2)
    val query = out.writeStream
      .format("memory").queryName("srccap").outputMode("append").start()
    try {
      input.addData((1L, "a", "t1"), (2L, "a", "t2"), (3L, "a", "t3"), (4L, "b", "t4"))
      query.processAllAvailable()
      // batch 1: 'a' admits 2 of 3, 'b' admits 1
      val b1 = spark.table("srccap").select($"doc_id").as[Long].collect().toSet
      assert(b1.size == 3 && b1.contains(4L) && (b1 - 4L).subsetOf(Set(1L, 2L, 3L)))
      // batch 2: 'a' is exhausted (state persisted), 'b' admits 1 more then drops
      input.addData((5L, "a", "t5"), (6L, "b", "t6"), (7L, "b", "t7"), (8L, "c", "t8"))
      query.processAllAvailable()
      val all = spark.table("srccap")
        .select($"doc_id", $"src", $"text").as[(Long, String, String)].collect()
      assert(!all.map(_._1).contains(5L), "source 'a' must stay exhausted across batches")
      assert(all.count(_._2 == "a") == 2 && all.count(_._2 == "b") == 2 &&
        all.count(_._2 == "c") == 1)
      // caller columns pass through untouched
      all.foreach { case (id, _, t) => assert(t == s"t$id") }
    } finally query.stop()
  }

  test("multimodal decode is stateless: real audio decode runs unchanged in a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val out = graft.pipeline.Multimodal.withDecodedMeta(
      input.toDF.toDF("doc_id", "wav"), "wav", "meta",
      graft.pipeline.Multimodal.decodeAudio, graft.pipeline.Multimodal.AudioMetaSchema)
    val query = out.select($"doc_id", $"meta.n_samples", $"meta.peak")
      .writeStream.format("memory").queryName("streamwav").outputMode("append").start()
    try {
      input.addData((1L, graft.pipeline.Multimodal.syntheticWav(1L, 40)),
        (2L, "junk".getBytes("UTF-8")))
      query.processAllAvailable()
      val got = spark.table("streamwav").collect().map(r => r.getLong(0) -> r).toMap
      assert(got(1L).getLong(1) == 40L && !got(1L).isNullAt(2))
      assert(got(2L).isNullAt(1), "undecodable stream payload -> NULL meta")
    } finally query.stop()
  }

  test("streaming perceptual dedup drops stream images near a static reference, batch-identical") {
    import graft.pipeline.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val ref = Multimodal.withPHash(
        (0L until 10L).map(i => (i, Multimodal.syntheticPatternBmp(i, 16, 16, false)))
          .toDF("rid", "img"), "img", "rh")
      .select($"rh").localCheckpoint(false)
    val rows = Seq(
      (100L, Multimodal.syntheticPatternBmp(3L, 16, 16, false)), // exact ref copy
      (101L, Multimodal.syntheticPatternBmp(5L, 16, 16, true)),  // retouched ref copy
      (102L, Multimodal.syntheticPatternBmp(987654L, 16, 16, false)), // fresh texture
      (103L, "junk".getBytes("UTF-8")))                          // undecodable
    // batch truth: anti-join on raw hamming (recall-complete banding twin)
    val expected = Multimodal.withPHash(rows.toDF("id", "img"), "img", "h")
      .join(ref, bit_count($"h".bitwiseXOR($"rh")) <= 2, "left_anti")
      .select($"id").as[Long].collect().toSet
    assert(!expected.contains(100L), "exact copy must be a duplicate")
    assert(expected.contains(103L), "undecodable payload is not a duplicate")

    val input = MemoryStream[(Long, Array[Byte])]
    val survivors = scala.collection.mutable.Set.empty[Long]
    val query = graft.streaming.H3Streaming.streamingPerceptualDedup(
      input.toDF.toDF("id", "img"), "id",
      df => Multimodal.withPHash(df, "img", "h"), "h",
      ref, "rh", bits = 63, maxHamming = 2,
      (df, _) => survivors ++= df.select(col("id")).as[Long](implicitly).collect()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      assert(survivors.toSet == expected,
        s"stream/batch diverged: stream=$survivors batch=$expected")
    } finally query.stop()
  }

  test("streaming video clip detection against a static corpus, batch-identical on the p63 fixture") {
    import graft.pipeline.{Dedup, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    // static corpus: the p63 base videos (ids 0..9, 4 textured frames each)
    val refFrames = Multimodal.withVideoFramePHashes(
        (0L until 10L).map(i => (i, Multimodal.syntheticPatternAvi(i, 16, 16, 4, 0)))
          .toDF("vid", "avi"), "vid", "avi")
      .toDF("rvid", "rfi", "rh").localCheckpoint(false)
    // stream: a re-muxed exact copy of id 5, a 2-frame clip of id 7 cut at
    // frame 1, a fresh texture, an undecodable payload (p63's row recipe)
    val rows = Seq(
      (100L, Multimodal.syntheticPatternAvi(5L, 16, 16, 4, 0)),
      (101L, Multimodal.syntheticPatternAvi(7L, 16, 16, 2, 1)),
      (102L, Multimodal.syntheticPatternAvi(987654L, 16, 16, 4, 0)),
      (103L, "junk".getBytes("UTF-8")))

    val expected = Dedup.videoClipMatchesAgainst(
        Multimodal.withVideoFramePHashes(rows.toDF("id", "avi"), "id", "avi"),
        col("id"), col("frame_idx"), col("phash"),
        refFrames, col("rvid"), col("rfi"), col("rh"), maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    // closed-form truth: the copy shares all 4 frames with its source, the
    // clip both of its frames; fresh/undecodable match nothing
    assert(expected.contains((100L, 5L, 4L)), s"exact copy: $expected")
    assert(expected.contains((101L, 7L, 2L)), s"clip: $expected")
    assert(!expected.exists(m => m._1 == 102L || m._1 == 103L))

    val input = MemoryStream[(Long, Array[Byte])]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val query = graft.streaming.H3Streaming.streamingVideoClipMatches(
      input.toDF.toDF("id", "avi"), "id", "avi",
      refFrames, "rvid", "rfi", "rh", maxHamming = 2,
      sink = (df, _) => got ++= df.as[(Long, Long, Long)](implicitly).collect()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      assert(got.toSet == expected, s"stream/batch diverged: stream=$got batch=$expected")
    } finally query.stop()
  }

  test("multimodal decode is stateless: real AVI frame sampling runs unchanged in a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val out = graft.pipeline.Multimodal.sampleVideoFrames(
      input.toDF.toDF("vid", "avi"), "vid", "avi", every = 2)
    val query = out.writeStream
      .format("memory").queryName("streamavi").outputMode("append").start()
    try {
      input.addData((1L, graft.pipeline.Multimodal.syntheticAvi(1L, 7, 5, 4)),
        (2L, "junk".getBytes("UTF-8")))
      query.processAllAvailable()
      val got = spark.table("streamavi").collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
      // vid 1 samples frames 0 and 2; undecodable payload yields no rows
      assert(got.map(t => (t._1, t._2)).sorted.toSeq == Seq((1L, 0L), (1L, 2L)))
      def expect(f: Long): Long = {
        var s = 0L
        for (x <- 0 until 7; y <- 0 until 5)
          s += 3 * ((31 + f * 19 + x * 7 + y * 13) % 256)
        s
      }
      got.foreach { case (_, f, sum) => assert(sum == expect(f)) }
    } finally query.stop()
  }

  test("in-stream curation chain: strip -> quality gate -> source cap in ONE query") {
    // boilerplate strip (projection over a broadcast bloom), token-count
    // quality gate (projection), and per-source quota (the single legal
    // stateful op) compose into one streaming query — the ingest-time
    // analogue of the batch curation pipeline (p42)
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "article\nsubscribe to our newsletter today"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, String)]
    val stripped = H3Streaming.streamingLineDedup(
      input.toDF.toDF("doc_id", "src", "text"), "text",
      ref, "text", minLineChars = 5, expectedRefLines = 100L, fpp = 0.001)
    val gated = stripped.filter(graft.pipeline.TextOps.tokenCount($"text") >= 3)
    val out = H3Streaming.streamingSourceCap(gated, "src", cap = 1)
    val query = out.writeStream
      .format("memory").queryName("streamcurate").outputMode("append").start()
    try {
      input.addData(
        (1L, "a", "one fine paragraph right here\nsubscribe to our newsletter today"),
        (2L, "a", "another good paragraph of source a"),
        (3L, "b", "too short"),
        (4L, "b", "a worthy paragraph from source b"))
      query.processAllAvailable()
      val got = spark.table("streamcurate")
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      // doc 1: boilerplate stripped, survives the gate, takes source a's quota
      assert(got(1L) == "one fine paragraph right here")
      // doc 2: gated fine but source a's cap is spent
      assert(!got.contains(2L))
      // doc 3: below the token gate — never reaches (or spends) b's quota
      assert(!got.contains(3L))
      assert(got(4L) == "a worthy paragraph from source b")
    } finally query.stop()
  }

  test("deterministic mixing is stateless: runs unchanged in a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val mixed = graft.pipeline.Mixing.mixSample(
      input.toDF.toDF("doc_id", "stratum"), $"doc_id", $"stratum",
      rates = Map("a" -> 2.0, "b" -> 0.5), salt = "st")
    val query = mixed.writeStream
      .format("memory").queryName("mixed").outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "c"))
      query.processAllAvailable()
      val rows = spark.table("mixed").select($"doc_id", $"copy_idx")
        .as[(Long, Long)].collect().toSet
      // stratum a: exactly 2 copies; c: dropped; b: 0 or 1 copy, and the
      // SAME outcome as the batch op on identical input (determinism)
      val batch = graft.pipeline.Mixing.mixSample(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "stratum"),
        $"doc_id", $"stratum", Map("a" -> 2.0, "b" -> 0.5), salt = "st")
        .select($"doc_id", $"copy_idx").as[(Long, Long)].collect().toSet
      assert(rows == batch)
      assert(rows.count(_._1 == 1L) == 2 && !rows.exists(_._1 == 3L))
    } finally query.stop()
  }

  test("streaming substring strip cuts reference spans, keeps novel prose and partial overlaps") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "one two three four five"))
      .toDF("doc_id", "text") // ref 3-grams: one two three / two three four / three four five
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingSubstringDedup(
      input.toDF.toDF("doc_id", "text"), "text", ref, "text", n = 3,
      expectedRefGrams = 100L, fpp = 0.001)
    val query = out.writeStream
      .format("memory").queryName("substrip").outputMode("append").start()
    try {
      input.addData(
        (10L, "fresh start one two three four five fresh end"), // interior span cut
        (11L, "four five novel words here"),                    // 2-token overlap: no 3-gram hit
        (12L, "one two three"),                                 // exact ref gram: wiped
        (13L, "wholly novel prose"),
        (14L, "\tone two three"))                               // leading tab: batch-tokens parity
      query.processAllAvailable()
      val got = spark.table("substrip")
        .select($"doc_id", $"text", $"n_tokens", $"n_removed")
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(got(10L) == ((10L, "fresh start fresh end", 9L, 5L)))
      assert(got(11L) == ((11L, "four five novel words here", 5L, 0L)))
      assert(got(12L) == ((12L, "", 3L, 3L)))
      assert(got(13L) == ((13L, "wholly novel prose", 3L, 0L)))
      // leading tab: Spark's trim strips ONLY spaces, so batch tokens() sees
      // a leading empty token (4 tokens, not 3) — the streaming UDF must
      // tokenize identically, not via java.lang.String.trim
      val batchTokens = Seq("\tone two three").toDF("t")
        .select(graft.pipeline.TextOps.tokenCount($"t")).as[Long].head()
      assert(batchTokens == 4L, "batch convention itself")
      assert(got(14L) == ((14L, "", 4L, 3L)), "stream must match batch tokens() on tabs")
      // null text: null stays null, accounting zeroed (shared null-doc contract)
      input.addData((15L, null))
      query.processAllAvailable()
      val nullRow = spark.table("substrip").filter($"doc_id" === 15L)
        .select($"text", $"n_tokens", $"n_removed").collect().head
      assert(nullRow.isNullAt(0) && nullRow.getLong(1) == 0L && nullRow.getLong(2) == 0L)
    } finally query.stop()
  }

  test("streaming DSIR ingest scoring matches the batch operator; novel-vocab doc scores null") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "common common common"),
      (2L, "target target target"),
      (3L, "common target")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "target target target target")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingImportanceScore(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text",
      corpus, $"text", target, $"text")
    val query = out.writeStream
      .format("memory").queryName("dsir").outputMode("append").start()
    try {
      // the corpus docs re-arrive at ingest, plus one fully-novel doc
      input.addData((1L, "common common common"), (2L, "target target target"),
        (3L, "common target"), (9L, "wholly novel words"))
      query.processAllAvailable()
      val batch = graft.pipeline.TextOps.importanceWeights(
        corpus, $"doc_id", $"text", target, $"text")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      batch.foreach { case (id, (n, score)) =>
        val row = spark.table("dsir").filter($"doc_id" === id)
          .select($"n_tokens", $"dsir_score").as[(Long, Double)].head()
        assert(row == ((n, score)), s"doc $id stream/batch mismatch")
      }
      // out-of-vocabulary doc: 0 known tokens, null score — not a crash
      val novel = spark.table("dsir").filter($"doc_id" === 9L)
        .select($"n_tokens", $"dsir_score").collect().head
      assert(novel.getLong(0) == 0L && novel.isNullAt(1))
    } finally query.stop()
  }

  test("streaming triangles: per-epoch closures sum to the batch total, incl. re-arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    val all = (1 to 240).map(_ => (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
    val batches = all.grouped(80).toSeq

    def bruteTotal(edges: Seq[(Long, Long)]): Long = {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
      } yield 1).size.toLong
    }

    val perEpoch = scala.collection.mutable.Map.empty[Long, Long]
    val input = MemoryStream[(Long, Long)]
    val writer = H3Streaming.streamingTriangles(
      input.toDF.toDF("src", "dst"), "src", "dst",
      (out, epoch) => perEpoch(epoch) =
        out.agg(coalesce(sum($"n_closed"), lit(0L))).collect().head.getLong(0))
    val query = writer.start()
    try {
      var prevTotal = 0L
      batches.zipWithIndex.foreach { case (b, i) =>
        // re-send some earlier edges too: known edges must close nothing
        input.addData(b ++ (if (i > 0) batches(i - 1).take(10) else Nil): _*)
        query.processAllAvailable()
        val total = bruteTotal(batches.take(i + 1).flatten)
        val got = perEpoch.values.sum
        assert(got == total, s"after batch $i: got $got want $total")
        assert(total >= prevTotal)
        prevTotal = total
      }
      assert(prevTotal > 0, "fixture must actually form triangles")
      assert(perEpoch.size == batches.size)
    } finally query.stop()
  }

  test("streaming triangles restart: initialGraph bootstrap avoids double-counting") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(73)
    val all = (1 to 200).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val (run1, run2) = all.splitAt(120)

    def bruteTotal(edges: Seq[(Long, Long)]): Long = {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
      } yield 1).size.toLong
    }

    // first run: accumulate edges and remember what the sink stored
    var stored = Seq.empty[(Long, Long)]
    var total1 = 0L
    val in1 = MemoryStream[(Long, Long)]
    val q1 = H3Streaming.streamingTriangles(
      in1.toDF.toDF("src", "dst"), "src", "dst",
      (out, _) => {
        val rows = out.select($"u", $"v", $"n_closed").as[(Long, Long, Long)].collect()
        stored = stored ++ rows.map(r => (r._1, r._2))
        total1 += rows.map(_._3).sum
      }).start()
    try {
      in1.addData(run1: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(total1 == bruteTotal(run1))

    // "restart": a NEW writer bootstrapped from the sink's stored edges;
    // run2 re-sends some run1 edges, which must close nothing again
    var total2 = 0L
    val in2 = MemoryStream[(Long, Long)]
    val q2 = H3Streaming.streamingTriangles(
      in2.toDF.toDF("src", "dst"), "src", "dst",
      (out, _) => total2 +=
        out.agg(coalesce(sum($"n_closed"), lit(0L))).collect().head.getLong(0),
      initialGraph = Some(stored.toDF("u", "v"))).start()
    try {
      in2.addData(run2 ++ run1.take(30): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(total1 + total2 == bruteTotal(all),
      s"run1 $total1 + run2 $total2 != ${bruteTotal(all)}")
    // an un-bootstrapped restart would have re-counted run1 triangles
    assert(bruteTotal(run2 ++ run1.take(30)) != bruteTotal(all) - total1 ||
      total1 > 0)
  }

  test("streaming triangles: LAZY initialGraph reading the sink's own store is snapshotted before epoch 0") {
    // regression for the un-snapshotted bootstrap: initialGraph here is a
    // by-name view the sink REPLACES every epoch (the documented restart
    // pattern — bootstrap from your own stored output). Without the eager
    // epoch-0 snapshot, the nextGraph evaluation re-resolves the view
    // AFTER the sink wrote epoch 0, duplicating epoch-0 edges in the
    // accumulated graph and inflating n_closed in every later epoch.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(91)
    val all = (1 to 240).map(_ => (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    val (run1, rest) = all.splitAt(120)
    val (run2a, run2b) = rest.splitAt(60)

    def bruteTotal(edges: Seq[(Long, Long)]): Long = {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
      } yield 1).size.toLong
    }

    // first run, no bootstrap: accumulate the sink's stored edges
    var stored = Seq.empty[(Long, Long)]
    var total1 = 0L
    val in1 = MemoryStream[(Long, Long)]
    val q1 = H3Streaming.streamingTriangles(
      in1.toDF.toDF("src", "dst"), "src", "dst",
      (out, _) => {
        val rows = out.select($"u", $"v", $"n_closed").as[(Long, Long, Long)].collect()
        stored = stored ++ rows.map(r => (r._1, r._2))
        total1 += rows.map(_._3).sum
      }).start()
    try { in1.addData(run1: _*); q1.processAllAvailable() } finally q1.stop()
    assert(total1 == bruteTotal(run1))

    // restart with a LIVE bootstrap plan: an RDD closure over the sink's
    // mutable store — in local mode every recompute reads the store's
    // CURRENT content, the re-evaluation semantics of a JDBC/Delta-backed
    // edge store (a temp view or read.parquet would pin its snapshot at
    // Dataset-creation time and mask the bug)
    val liveStore = scala.collection.mutable.ArrayBuffer[(Long, Long)](stored: _*)
    val liveDf = spark.sparkContext.parallelize(Seq(0), 1)
      .flatMap(_ => liveStore.toList).toDF("u", "v")
    var total2 = 0L
    val in2 = MemoryStream[(Long, Long)]
    val q2 = H3Streaming.streamingTriangles(
      in2.toDF.toDF("src", "dst"), "src", "dst",
      (out, _) => {
        val rows = out.select($"u", $"v", $"n_closed").as[(Long, Long, Long)].collect()
        total2 += rows.map(_._3).sum
        liveStore ++= rows.map(r => (r._1, r._2))
      },
      initialGraph = Some(liveDf)).start()
    try {
      // two separate micro-batches: the duplicate-edge inflation (if any)
      // manifests in epoch 1's wedge counts
      in2.addData(run2a ++ run1.take(20): _*); q2.processAllAvailable()
      in2.addData(run2b: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(total1 + total2 == bruteTotal(all),
      s"run1 $total1 + run2 $total2 != ${bruteTotal(all)}")
  }

  test("streaming ANN top-k == batch store query; appends visible to later batches") {
    import graft.pipeline.{AnnStore, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .localCheckpoint(false)
    val cents = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 1)
      .localCheckpoint(false)
    val dir = java.nio.file.Files.createTempDirectory("ann-stream-q").toString + "/store"
    AnnStore.write(e.filter($"vec_id" < 400), $"vec_id", $"embedding", cents, dir)

    var epochs = Map.empty[Long, Set[Seq[Any]]]
    val input = MemoryStream[(Long, Seq[Double])]
    val writer = H3Streaming.streamingAnnTopK(input.toDF.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, cents, nprobe = 2, k = 3,
      (out, epoch) => epochs += epoch -> out.collect().map(_.toSeq).toSet)
    val query = writer.start()
    try {
      val q1 = e.filter($"vec_id" < 5).as[(Long, Seq[Double])].collect().toSeq
      input.addData(q1)
      query.processAllAvailable()
      // epoch 0 == the batch query path over the same store + quantizer
      val batch1 = AnnStore.query(spark, dir, cents, e.filter($"vec_id" < 5),
        $"vec_id", $"embedding", nprobe = 2, k = 3).collect().map(_.toSeq).toSet
      assert(epochs(epochs.keys.min) == batch1)

      // append vec 450 to the store; the NEXT micro-batch must see it:
      // querying with 450's own vector now self-matches at rank 1
      AnnStore.appendBatch(e.filter($"vec_id" === 450), $"vec_id", $"embedding", cents, dir)
      val q2 = e.filter($"vec_id" === 450).as[(Long, Seq[Double])].collect().toSeq
      input.addData(q2)
      query.processAllAvailable()
      val last = epochs(epochs.keys.max)
      val rank1 = last.find(r => r(3) == 1L).get
      assert(rank1(0) == 450L && rank1(1) == 450L && rank1(2) == 1.0)
    } finally query.stop()
  }

  test("streaming BPE encode == batch encodeCounts on in-vocab docs; OOV words counted") {
    import graft.pipeline.Bpe
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "abab aaa ab"), (2L, "ab abab"), (3L, "zz zz ba")).toDF("doc_id", "text")
    val model = Bpe.train(Bpe.wordCounts(corpus, $"text"), 3)
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingBpeEncode(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", model)
    val query = out.writeStream
      .format("memory").queryName("bpe_enc").outputMode("append").start()
    try {
      input.addData((1L, "abab aaa ab"), (2L, "ab abab"))
      query.processAllAvailable()
      input.addData((3L, "zz zz ba"), (9L, "abab novel ab")) // 'novel' is OOV
      query.processAllAvailable()
      val got = spark.table("bpe_enc")
        .select($"doc_id", $"n_words", $"n_bpe_tokens", $"n_oov")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val batch = Bpe.encodeCounts(corpus, $"doc_id", $"text", model)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      batch.foreach { case (id, (nw, nb)) =>
        assert(got(id) == ((nw, nb, 0L)), s"doc $id stream/batch mismatch")
      }
      // the OOV doc: 2 known words encoded, 1 miss reported, row kept
      val known = Bpe.encodeCounts(Seq((9L, "abab ab")).toDF("doc_id", "text"),
        $"doc_id", $"text", model).collect().head
      assert(got(9L) == ((known.getLong(1), known.getLong(2), 1L)))
    } finally query.stop()
  }

  test("streaming corpus diff == batch corpusDiff on the added/changed/unchanged subset") {
    import graft.pipeline.TextOps
    implicit val sqlCtx = spark.sqlContext
    val snapshot = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, null: String))
      .toDF("doc_id", "text").localCheckpoint(false)
    val arrivals = Seq((1L, "alpha"), (2L, "edited"), (4L, null: String),
      (9L, "fresh"), (3L, "gamma"))
    val input = MemoryStream[(Long, String)]
    val diffed = H3Streaming.streamingCorpusDiff(
      input.toDF.toDF("id", "text"), "id", "text",
      snapshot, col("doc_id"), col("text"))
    val query = diffed.writeStream
      .format("memory").queryName("sdiff").outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      query.processAllAvailable()
      val got = spark.table("sdiff").select($"id", $"status")
        .as[(Long, String)].collect().toMap
      // batch oracle over the same arrivals (removed rows excluded: absence
      // is not observable from a stream)
      val batch = TextOps.corpusDiff(snapshot, arrivals.toDF("doc_id", "text"),
          col("doc_id"), col("text"), col("doc_id"), col("text"))
        .filter($"status" =!= "removed")
        .as[(Long, String)].collect().toMap
      assert(got == batch)
      assert(got == Map(1L -> "unchanged", 2L -> "changed", 4L -> "unchanged",
        9L -> "added", 3L -> "unchanged"))
    } finally query.stop()
  }

  test("streaming classifier score == batch classifierScore") {
    import graft.pipeline.TextOps
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "the quick brown fox"), (2L, ""), (3L, null: String),
      (4L, "numbers 123 456 and words"))
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingClassifierScore(
      input.toDF.toDF("id", "text"), "id", "text")
    val query = out.writeStream
      .format("memory").queryName("clf").outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("clf")
        .as[(Long, Long, Double, String)].collect().toSet
      val batch = TextOps.classifierScore(rows.toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .as[(Long, Long, Double, String)].collect().toSet
      assert(got == batch)
    } finally query.stop()
  }

  test("streaming bigram LM score == batch bigramLmScoreAgainst, including OOV") {
    import graft.pipeline.TextOps
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"), (3L, "gamma alpha beta"))
      .toDF("doc_id", "text").localCheckpoint(false)
    // re-arrivals, a part-OOV doc, a fully-OOV doc, a single-token doc,
    // and an empty doc (excluded on both sides)
    val arrivals = Seq((1L, "alpha beta gamma"), (9L, "zeta alpha zeta"),
      (10L, "wholly novel words"), (11L, "alpha"), (12L, ""))
    val input = MemoryStream[(Long, String)]
    val out = H3Streaming.streamingBigramLmScore(
      input.toDF.toDF("id", "text"), "id", "text", corpus, col("text"))
    val query = out.writeStream
      .format("memory").queryName("blm").outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      query.processAllAvailable()
      val got = spark.table("blm")
        .as[(Long, Long, Double)].collect().toSet
      val batch = TextOps.bigramLmScoreAgainst(arrivals.toDF("doc_id", "text"),
          col("doc_id"), col("text"), corpus, col("text"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == batch)
      assert(!got.exists(_._1 == 12L) && got.exists(_._1 == 10L))
    } finally query.stop()
  }

  test("streaming hopping-window rollup == batch hoppingWindowStats") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    // micros-grained events over ~90 s, two groups, value lattice checks
    val base = 1700000000000000L // epoch micros
    val evs = Seq(
      (0L, "a", 1.25), (5000000L, "a", 2.5), (12000000L, "b", 0.07),
      (31000000L, "a", 4.0), (44000000L, "b", 1.111), (59999999L, "a", 3.3),
      (60000000L, "b", 9.99), (88000000L, "a", 0.005))
      .map { case (us, g, v) => (new Timestamp((base + us) / 1000L), g, v) }
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = H3Streaming.streamingHoppingStats(
      input.toDF.toDF("ts", "grp", "value"), "ts", "grp", "value",
      windowLen = "30 seconds", slide = "10 seconds", watermark = "10 seconds")
    val query = out.writeStream
      .format("memory").queryName("hop").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      val got = spark.table("hop")
        .as[(Long, String, Long, Long)].collect()
        .map(r => ((r._1, r._2), (r._3, r._4))).toMap
      val batch = Events.hoppingWindowStats(
          evs.map { case (t, g, v) => (t.getTime * 1000L, g, v) }.toDF("ts", "grp", "value"),
          col("ts"), col("grp"), col("value"),
          windowLen = 30000000L, slide = 10000000L)
        .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
      assert(got == batch)
      // each event lands in exactly len/slide = 3 windows
      assert(got.values.map(_._1).sum == evs.size * 3L)
    } finally query.stop()
  }

  test("PQ encoding is projection-only: runs unchanged in a stream, batch-identical") {
    import graft.pipeline.Similarity
    implicit val sqlCtx = spark.sqlContext
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Similarity.collectCodebooks(
      Similarity.pqCodebooks(embs, col("vec_id"), col("embedding"),
        dim = 64, m = 4, k = 8, iters = 1))
    val sample = embs.limit(40)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val input = MemoryStream[(Long, Seq[Double])]
    val out = Similarity.pqAssignProjection(
      input.toDF.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"), books)
    val query = out.writeStream
      .format("memory").queryName("pqcodes").outputMode("append").start()
    try {
      input.addData(sample: _*)
      query.processAllAvailable()
      val got = spark.table("pqcodes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
      val batch = Similarity.pqAssignProjection(sample.toDF("vec_id", "embedding"),
          col("vec_id"), col("embedding"), books)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
      assert(got == batch && got.size == 40)
    } finally query.stop()
  }

  test("HTML extraction is stateless: runs unchanged in-stream, batch-identical") {
    import graft.pipeline.TextOps
    implicit val sqlCtx = spark.sqlContext
    val pages = Seq(
      (1L, "<p>alpha</p><script>var x='<p>no</p>'</script>"),
      (2L, "<div>beta &amp; gamma</div><br>delta"),
      (3L, ""))
    val input = MemoryStream[(Long, String)]
    val out = input.toDF.toDF("id", "html")
      .select($"id", TextOps.htmlToText($"html").as("text"))
    val query = out.writeStream
      .format("memory").queryName("htmlx").outputMode("append").start()
    try {
      input.addData(pages: _*)
      query.processAllAvailable()
      val got = spark.table("htmlx").as[(Long, String)].collect().toSet
      val batch = pages.toDF("id", "html")
        .select($"id", TextOps.htmlToText($"html").as("text"))
        .as[(Long, String)].collect().toSet
      assert(got == batch)
      assert(got.contains((1L, "alpha")) && got.contains((2L, "beta & gamma\ndelta")))
    } finally query.stop()
  }

  test("streaming windowed KMV sketch == batch approxDistinct per window") {
    import graft.pipeline.Sketches
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    val base = 1700000000000000L
    // two 30s windows, two groups, cardinalities straddling k=16
    val evs = (0 until 2000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val v = if (g == "a") s"x${rnd.nextInt(8)}" else s"y${rnd.nextInt(500)}"
      (new Timestamp((base + (i % 50) * 1000000L) / 1000L), g, v)
    }
    val input = MemoryStream[(Timestamp, String, String)]
    val out = H3Streaming.streamingApproxDistinct(
      input.toDF.toDF("ts", "grp", "v"), "ts", "grp", "v",
      k = 16, watermark = "10 seconds", windowLen = "30 seconds")
    val query = out.writeStream
      .format("memory").queryName("kmv").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      val got = spark.table("kmv")
        .as[(Long, String, Long, Long)].collect()
        .map(r => ((r._1, r._2), (r._3, r._4))).toSet
      val winLen = 30000000L
      val batchDf = evs.map { case (t, g, v) => (t.getTime * 1000L, g, v) }
        .toDF("ts", "grp", "v")
        .withColumn("window_start", ($"ts" - $"ts" % winLen))
      val batch = Sketches.approxDistinct(batchDf,
          Seq(col("window_start"), col("grp")), col("v"), k = 16)
        .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toSet
      assert(got == batch)
      // group a sits in the exact (below-k) regime, group b estimates
      assert(got.exists { case ((_, g), (_, est)) => g == "a" && est <= 8 })
      assert(got.exists { case ((_, g), (_, est)) => g == "b" && est > 16 })
    } finally query.stop()
  }

  test("streaming CDC merge: final state == batch applyChanges; untouched ids silent") {
    import graft.pipeline.TextOps
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val b1 = Seq((1L, "upsert", "one-v2", 2L), (2L, "delete", null, 2L))
    val b2 = Seq((1L, "upsert", "one-v3", 3L), (9L, "upsert", "nine", 2L),
      (4L, "upsert", "four-v1-late", 0L)) // loses to base at same version? no:
    // v0 change vs v0 base: change side (pref=1) wins the tie — emitted
    val input = MemoryStream[(Long, String, String, Long)]
    val out = H3Streaming.streamingApplyChanges(
      input.toDF.toDF("id", "op", "text", "version"), "id", "op", "text", "version",
      base, $"doc_id", $"text")
    val query = out.writeStream
      .format("memory").queryName("cdc").outputMode("update").start()
    try {
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      val emitted = spark.table("cdc")
        .as[(Long, String, Long, String, Boolean)].collect()
      // final state per id = the max-(version,...) emission (state is monotone)
      val finalRows = emitted.groupBy(_._1).view
        .mapValues(_.maxBy(r => (r._3, r._4, Option(r._2)))).toMap
      val changes = (b1 ++ b2).toDF("doc_id", "op", "text", "version")
      val batch = TextOps.applyChanges(base, $"doc_id", $"text",
          changes, $"doc_id", $"op", $"text", $"version")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
      // live final rows match the batch snapshot exactly
      finalRows.filter(_._2._5).foreach { case (id, (_, text, v, op, _)) =>
        assert(batch(id) == ((text, v, op)), s"id $id")
      }
      // deleted id emitted with live=false and absent from batch
      assert(finalRows(2L)._5 == false && !batch.contains(2L))
      // untouched base id never emitted; batch carries it through
      assert(!finalRows.contains(3L) && batch(3L) == (("three", 0L, "base")))
      // every live batch row whose id was touched appears in the stream
      assert(Set(1L, 4L, 9L).subsetOf(finalRows.keySet))
      // the v3 race winner is the final text for id 1
      assert(finalRows(1L)._2 == "one-v3")
    } finally query.stop()
  }

  test("streaming rate anomaly == batch on finalized windows across micro-batches") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    // steady then burst for group a; b quiet-gap case — events arrive
    // over TWO batches, a final far-future event closes all windows
    val evs1 = (0 until 3).flatMap(w => (0 until 5).map(i => (ts(w * 30), "a"))) ++
      Seq.fill(4)((ts(0), "b"))
    val evs2 = (0 until 20).map(_ => (ts(90), "a")) ++
      (0 until 12).map(_ => (ts(60), "b"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Long)]
    val input = MemoryStream[(Timestamp, String)]
    val writer = H3Streaming.streamingRateAnomaly(
      input.toDF.toDF("ts", "g"), "ts", "g",
      windowLen = "30 seconds", watermark = "5 seconds", baseline = 3,
      threshNum = 3L, threshDen = 2L,
      (out, _) => got ++= out.as[(Long, String, Long, Long, Long, Long)].collect())
    val query = writer.start()
    try {
      input.addData(evs1: _*)
      query.processAllAvailable()
      input.addData(evs2: _*)
      query.processAllAvailable()
      input.addData((ts(1000), "a")) // advance watermark: close everything
      query.processAllAvailable()

      val batch = Events.rateAnomaly(
          (evs1 ++ evs2).map { case (t, g) => (t.getTime * 1000L, g) }.toDF("ts", "g"),
          $"ts", $"g", windowLen = 30000000L, baseline = 3,
          threshNum = 3L, threshDen = 2L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got.toSet == batch)
      // the alarm actually fired exactly for the burst windows
      assert(got.count(_._6 == 1L) == 2)
    } finally query.stop()
  }

  test("streaming windowed sample quantiles == batch sampledQuantilesBy per window") {
    import graft.pipeline.Sketches
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    // two 30s windows, two groups; values spread so ranks discriminate
    val evs = (0L until 400L).map { i =>
      (ts(rnd.nextInt(55)), if (i % 2 == 0) "x" else "y", i, rnd.nextInt(5000).toLong)
    }
    val input = MemoryStream[(Timestamp, String, Long, Long)]
    val out = H3Streaming.streamingSampledQuantiles(
      input.toDF.toDF("ts", "grp", "id", "v"), "ts", "grp", "id", "v",
      k = 32, permille = Seq(250, 500, 900),
      watermark = "10 seconds", windowLen = "30 seconds")
    val query = out.writeStream
      .format("memory").queryName("squant").outputMode("complete").start()
    try {
      // two micro-batches: the second re-reads min-k buffers from the
      // state store (production serialize/deserialize path)
      val (b1, b2) = evs.splitAt(evs.size / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("squant")
        .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
      // batch twin: sampledQuantilesBy per (window, group) — the shared
      // selection + rank definitions make this EXACT equality
      val winLen = 30000000L
      val batch = evs.groupBy { case (t, g, _, _) =>
        ((t.getTime * 1000L) - (t.getTime * 1000L) % winLen, g)
      }.toSeq.map { case ((ws, g), rows) =>
        val df = rows.map(r => (r._3, r._4)).toDF("id", "v")
        val r = Sketches.sampledQuantilesBy(df, Seq.empty, col("id"), col("v"),
          k = 32, permille = Seq(250, 500, 900)).collect().head
        (ws, g, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }.toSet
      assert(got == batch)
      assert(got.size >= 4)
    } finally query.stop()
  }

  test("streaming heavy-hitter candidates: per-window superset + lower-bound laws") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(59)
    val k = 6
    // two 30s windows, two groups; a few planted-hot tokens over a
    // uniform tail so the sketch purges (distinct per cell >> k)
    val evs = (0 until 800).map { i =>
      val hot = rnd.nextInt(10)
      val tok = if (hot < 6) s"hot${hot % 3}" else s"tail${rnd.nextInt(120)}"
      (ts(rnd.nextInt(55)), if (i % 2 == 0) "x" else "y", tok)
    }
    val input = MemoryStream[(Timestamp, String, String)]
    val out = H3Streaming.streamingHeavyHitterCandidates(
      input.toDF.toDF("ts", "grp", "item"), "ts", "grp", "item",
      k = k, watermark = "10 seconds", windowLen = "30 seconds")
    val query = out.writeStream
      .format("memory").queryName("hhcand").outputMode("complete").start()
    try {
      // two micro-batches: the second batch re-reads the first's sketch
      // buffers from the state store — serialize AND deserialize run on
      // the production path, not just in unit tests
      val (b1, b2) = evs.splitAt(evs.size / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("hhcand")
        .as[(Long, String, Long, String, Long)].collect()
        .groupBy(r => (r._1, r._2))
      val winLen = 30000000L
      val truth = evs.map { case (t, g, tok) =>
        ((t.getTime * 1000L) - (t.getTime * 1000L) % winLen, g, tok)
      }.groupBy(r => (r._1, r._2))
      assert(got.keySet == truth.keySet && got.size >= 4)
      truth.foreach { case (cell, rows) =>
        val counts = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
        val n = rows.size.toLong
        val bound = n.toDouble / (k + 1)
        val cands = got(cell).map(r => r._4 -> r._5).toMap
        assert(got(cell).forall(_._3 == n), s"$cell n_rows")
        assert(cands.size <= k)
        // superset law: every item above n/(k+1) emitted
        counts.foreach { case (tok, c) =>
          if (c > bound) assert(cands.contains(tok), s"$cell: $tok ($c > $bound) missing")
        }
        // lower-bound law: count_lb in [true - n/(k+1), true]
        cands.foreach { case (tok, lb) =>
          val c = counts(tok)
          assert(lb <= c && lb >= c - bound - 1, s"$cell: $tok lb=$lb true=$c")
        }
        // planted hot tokens are genuinely above the bound in this data
        assert(Seq("hot0", "hot1", "hot2").forall(cands.contains), s"$cell hot set")
      }
    } finally query.stop()
  }

  test("streaming windowed weighted sample == batch clocks per window") {
    import graft.pipeline.Sketches
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(83)
    // two 30s windows, two groups, weights spread over [1, 50]
    val evs = (0L until 300L).map { i =>
      (ts(rnd.nextInt(55)), if (i % 2 == 0) "x" else "y", i, 1L + rnd.nextInt(50))
    }
    val input = MemoryStream[(Timestamp, String, Long, Long)]
    val out = H3Streaming.streamingWeightedSample(
      input.toDF.toDF("ts", "grp", "id", "w"), "ts", "grp", "id", "w",
      k = 10, watermark = "10 seconds", windowLen = "30 seconds")
    val query = out.writeStream
      .format("memory").queryName("wsample").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      val got = spark.table("wsample")
        .as[(Long, String, Long, Long)].collect().toSet
      // batch reference: weightedBottomKSample per (window, group)
      val winLen = 30000000L
      val batch = evs.flatMap { case (t, g, i, w) =>
        val ws = (t.getTime * 1000L) - (t.getTime * 1000L) % winLen
        Seq((ws, g, i, w))
      }.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((ws, g), rows) =>
        val df = rows.map(r => (r._3, r._4)).toDF("id", "w")
        Sketches.weightedBottomKSample(df, col("id"), col("w"), 10)
          .collect().map(r => (ws, g, r.getLong(0), r.getLong(2))).toSeq
      }.toSet
      assert(got == batch)
      // every (window, group) cell carries exactly k samples
      val perCell = got.groupBy(r => (r._1, r._2)).view.mapValues(_.size)
      assert(perCell.values.forall(_ == 10) && perCell.size >= 4)
    } finally query.stop()
  }

  test("streaming funnel == batch funnelCompletions under in-order arrival") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "click", "purchase")
    val spanUs = 60000000L
    val rnd = new scala.util.Random(31)
    val types = Seq("signup", "click", "purchase", "view")
    // MICROS-grained, in-order per key; some events land in the same
    // millisecond with distinct micros (the batch twin compares micros)
    val evs = (0 until 600).map { i =>
      (rnd.nextInt(25).toLong, 1700000000000000L + i * 997300L + rnd.nextInt(3) * 400L,
        types(rnd.nextInt(types.size)))
    }.sortBy(_._2)
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val input = MemoryStream[(Long, Timestamp, String)]
    // watermark horizon longer than the fixture: state never times out
    // mid-test, so anchors and emitted-step flags survive the whole run
    // (batch semantics consider every anchor ever seen)
    val out = H3Streaming.streamingFunnel(
      input.toDF.toDF("key", "ts", "t"), "key", "ts", "t", steps, spanUs,
      watermark = "30 days")
    val query = out.writeStream
      .format("memory").queryName("funnel").outputMode("append").start()
    try {
      // two batches to exercise cross-batch state carry
      val (a, b) = evs.splitAt(300)
      input.addData(a.map { case (k, us, t) => (k, toTs(us), t) }: _*)
      query.processAllAvailable()
      input.addData(b.map { case (k, us, t) => (k, toTs(us), t) }: _*)
      query.processAllAvailable()
      val got = spark.table("funnel")
        .as[(Long, Int, String, Long)].collect().toSet
      val batch = Events.funnelCompletions(
          evs.toDF("key", "ts", "t"), col("key"), col("ts"), col("t"), steps, spanUs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == batch)
      assert(got.exists(_._2 == 2) && got.exists(_._2 == 0)) // fixture discriminates
    } finally query.stop()
  }

  test("streaming rolling stats == batch rollingWindowStats, ts ties included") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val base = 1700000000000000L
    // in-order, coarse ts lattice -> plenty of (key, ts) ties per batch
    val evs = (0 until 400).map { i =>
      (rnd.nextInt(8).toLong, base + (i / 4) * 500000L, i.toLong, rnd.nextInt(500).toDouble / 10.0)
    }
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val lookback = 3000000L
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = H3Streaming.streamingRollingStats(
      input.toDF.toDF("key", "ts", "seq", "value"), "key", "ts", "seq", "value",
      lookbackUs = lookback, watermark = "30 days")
    val query = out.writeStream
      .format("memory").queryName("rolling").outputMode("append").start()
    try {
      // batch boundary on a ts-group edge (i=200 starts a fresh ts) so
      // tie groups are never split across micro-batches
      val (a, b) = evs.splitAt(200)
      input.addData(a.map { case (k, us, q, v) => (k, toTs(us), q, v) }: _*)
      query.processAllAvailable()
      input.addData(b.map { case (k, us, q, v) => (k, toTs(us), q, v) }: _*)
      query.processAllAvailable()
      val got = spark.table("rolling")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = Events.rollingWindowStats(
          evs.toDF("key", "ts", "seq", "value"),
          col("key"), col("ts"), col("seq"), col("value"), lookback)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == batch)
      assert(got.exists(_._4 > 1)) // windows genuinely accumulate
    } finally query.stop()
  }

  test("streaming funnel re-anchors on a fresh step-0 across batches") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    // A@0, A@100s, B@105s with span 10s: the first anchor expires before
    // B, conversion rides the SECOND anchor — and the anchor refresh
    // crosses a micro-batch boundary
    val spanUs = 10000000L
    val evs = Seq((7L, base, "A"), (7L, base + 100000000L, "A"),
      (7L, base + 105000000L, "B"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = H3Streaming.streamingFunnel(
      input.toDF.toDF("key", "ts", "t"), "key", "ts", "t",
      Seq("A", "B"), spanUs, watermark = "30 days")
    val query = out.writeStream
      .format("memory").queryName("funnelra").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(2)
      input.addData(a.map { case (k, us, t) => (k, toTs(us), t) }: _*)
      query.processAllAvailable()
      input.addData(b.map { case (k, us, t) => (k, toTs(us), t) }: _*)
      query.processAllAvailable()
      val got = spark.table("funnelra")
        .as[(Long, Int, String, Long)].collect().toSet
      val batch = Events.funnelCompletions(evs.toDF("key", "ts", "t"),
          col("key"), col("ts"), col("t"), Seq("A", "B"), spanUs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == batch)
      assert(got == Set((7L, 0, "A", base), (7L, 1, "B", base + 105000000L)))
    } finally query.stop()
  }

  test("streaming funnel: chain steps inside ONE millisecond still advance") {
    import graft.pipeline.Events
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L // aligned to a whole ms
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    // signup, click, purchase at +0us, +200us, +700us — same millisecond
    val evs = Seq((5L, base, "signup"), (5L, base + 200L, "click"),
      (5L, base + 700L, "purchase"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = H3Streaming.streamingFunnel(
      input.toDF.toDF("key", "ts", "t"), "key", "ts", "t",
      Seq("signup", "click", "purchase"), maxSpanUs = 1000000L,
      watermark = "1 hour")
    val query = out.writeStream
      .format("memory").queryName("funnelus").outputMode("append").start()
    try {
      input.addData(evs.map { case (k, us, t) => (k, toTs(us), t) }: _*)
      query.processAllAvailable()
      val got = spark.table("funnelus")
        .as[(Long, Int, String, Long)].collect().toSet
      val batch = Events.funnelCompletions(evs.toDF("key", "ts", "t"),
          col("key"), col("ts"), col("t"), Seq("signup", "click", "purchase"), 1000000L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == batch)
      assert(got.map(_._2) == Set(0, 1, 2), s"all three steps complete: $got")
    } finally query.stop()
  }

  test("streaming raster tiles convert per micro-batch, stream == batch (twin #29)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.raster.H3Raster
    val t = H3Raster.Transform.northUp(-122.5, 37.9, 0.02, 0.02)
    val w = 16; val h = 16
    // half nodata, half position-coded values; nodata -1 prunes
    val values = Array.tabulate(w * h)(i => if (i % 3 == 0) -1.0 else (i % 7).toDouble)
    val tiles = H3Raster.tileRaster(spark, w, h, t, values, nodata = -1.0, tile = 8)
    val batch = H3Raster.rasterToCells(tiles, res = 8)
      .as[(Double, Long)].collect().toSet

    // the SAME tile rows arriving over two micro-batches
    val rows = tiles.as[(Long, Int, Int, Int, Int, Seq[Double], Seq[Double], Option[Double], Boolean)]
      .collect()
    val input = MemoryStream[(Long, Int, Int, Int, Int, Seq[Double], Seq[Double], Option[Double], Boolean)]
    val stream = H3Streaming.streamingRasterToCells(
      input.toDF.toDF("tile_id", "x0", "y0", "width", "height", "transform",
        "values", "nodata", "has_data"), res = 8)
    val query = stream.writeStream.format("memory").queryName("rcells")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq); query.processAllAvailable()
      input.addData(b.toSeq); query.processAllAvailable()
      val got = spark.table("rcells").as[(Double, Long)].collect().toSet
      assert(got == batch, "streamed conversion diverged from batch")
      assert(got.nonEmpty && !got.exists(_._1 == -1.0))
    } finally query.stop()
  }

  test("s01 driver query is re-invocable in one session and matches batch") {
    // the driver's bench runs every query at least twice in one session
    // (warm pass + timed pass): the memory-sink view must be replaced,
    // not collide, and the snapshot must be stable across invocations
    val dir = "/root/testdata/sf0.001"
    val fn = graft.StreamingQueries.queries("s01_stream_hopping")
    val first = fn(spark, dir).collect()
    val second = fn(spark, dir).collect()
    assert(first.nonEmpty)
    assert(first.toSeq == second.toSeq, "re-invocation changed the snapshot")
    // batch parity against the batch hopping operator on the same input
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val batchRows = graft.pipeline.Events.hoppingWindowStats(
        ev.withColumn("ts_us", tsUs), col("ts_us"), col("event_type"),
        col("value"), windowLen = 21600000000L, slide = 7200000000L)
      .orderBy(col("window_start"), col("group")).collect()
    assert(first.toSeq == batchRows.toSeq, "streaming snapshot != batch twin")
  }
}
