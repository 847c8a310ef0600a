package graft.sources

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.SparkTestSession
import graft.sources.warc.{WarcCodec, WarcWriter}

/** WARC DSv2 source: roundtrip fidelity (headers, binary payloads, decoy
  * magics inside payloads), split-range invariance with forced mid-record
  * boundaries, distributed writer determinism, empty/corrupt inputs. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeFile(dir: String, name: String)(recs: Seq[(String, Array[Byte])]): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = new DataOutputStream(fs.create(p, true))
    try recs.foreach { case (uri, payload) =>
      WarcCodec.writeRecord(out, "response", s"urn:test:$uri", "2026-01-01T00:00:00Z",
        Some(uri), Some("application/octet-stream"), payload)
    } finally out.close()
  }

  test("roundtrip: headers and payloads survive, incl. decoy magic and binary bytes") {
    val dir = tmpDir("warc-rt")
    val decoy = ("before WARC/1.0\r\nNot A Header Line\r\n\r\nafter"
      ).getBytes(StandardCharsets.UTF_8)
    val binary = Array.tabulate[Byte](512)(i => (i * 37 % 256 - 128).toByte)
    val recs = Seq(
      "http://a/1" -> "hello world".getBytes(StandardCharsets.UTF_8),
      "http://a/2" -> decoy,
      "http://a/3" -> binary,
      "http://a/4" -> Array.emptyByteArray)
    writeFile(dir, "f.warc")(recs)
    val rows = spark.read.format("warc").load(dir)
      .select($"target_uri", $"record_type", $"content_length", $"payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getAs[Array[Byte]](3)))
      .sortBy(_._1)
    assert(rows.length == 4)
    rows.zip(recs.sortBy(_._1)).foreach { case ((uri, tpe, len, payload), (wUri, wPayload)) =>
      assert(uri == wUri && tpe == "response")
      assert(len == wPayload.length)
      assert(payload.toSeq == wPayload.toSeq, uri)
    }
  }

  test("tiny split ranges force mid-record boundaries; rows identical to one range") {
    val dir = tmpDir("warc-split")
    val rnd = new scala.util.Random(3)
    val recs = (0 until 200).map { i =>
      val body = new Array[Byte](200 + rnd.nextInt(900))
      rnd.nextBytes(body)
      f"http://s/$i%03d" -> body
    }
    writeFile(dir, "f.warc")(recs)
    def read(mpb: Long) = spark.read.format("warc")
      .option("maxPartitionBytes", mpb).load(dir)
    val whole = read(1L << 30)
    val split = read(4096)
    assert(split.rdd.getNumPartitions > 10, s"${split.rdd.getNumPartitions} partitions")
    val a = whole.select($"target_uri", md5($"payload"), $"offset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = split.select($"target_uri", md5($"payload"), $"offset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b && a.size == 200)
  }

  test("distributed writer: every partition's member read back, count exact") {
    val dir = tmpDir("warc-w") + "/out"
    val df = spark.range(500).repartition(7)
      .select(concat(lit("http://w/"), $"id").as("uri"),
        lit("text/plain").as("ct"),
        concat(lit("payload-"), $"id").cast("binary").as("p"))
    val n = WarcWriter.writeResponses(df, dir, "2026-01-01T00:00:00Z")
    assert(n == 500L)
    val back = spark.read.format("warc").load(dir)
    assert(back.count() == 500L)
    assert(back.select($"record_id").distinct().count() == 500L)
    // ids are deterministic md5s of the uri
    val one = back.filter($"target_uri" === "http://w/7").select($"record_id").head.getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("http://w/7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one == s"urn:md5:$md")
  }

  test("empty members and trailing garbage do not break the scan") {
    val dir = tmpDir("warc-edge")
    writeFile(dir, "a.warc")(Seq("http://e/1" -> "x".getBytes))
    // empty member
    val p = new Path(dir, "b.warc")
    p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true).close()
    // member with trailing garbage after a valid record
    val g = new Path(dir, "c.warc")
    val out = new DataOutputStream(g.getFileSystem(spark.sessionState.newHadoopConf()).create(g, true))
    WarcCodec.writeRecord(out, "response", "urn:test:z", "2026-01-01T00:00:00Z",
      Some("http://e/2"), None, "y".getBytes)
    out.write("WARC/1.0\r\ntruncated nonsense".getBytes(StandardCharsets.US_ASCII))
    out.close()
    val rows = spark.read.format("warc").load(dir)
      .select($"target_uri").as[String].collect().sorted
    assert(rows.toSeq == Seq("http://e/1", "http://e/2"))
  }

  test("streaming ingest: files arriving between micro-batches are read once each") {
    val dir = tmpDir("warc-stream")
    writeFile(dir, "a.warc")(Seq("http://st/1" -> "one".getBytes, "http://st/2" -> "two".getBytes))
    val stream = spark.readStream.format("warc")
      .option("maxPartitionBytes", 4096).load(dir)
      .select($"target_uri", $"payload".cast("string").as("body"))
    val query = stream.writeStream
      .format("memory").queryName("warcstream").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("warcstream").count() == 2)
      writeFile(dir, "b.warc")(Seq("http://st/3" -> "three".getBytes))
      query.processAllAvailable()
      val rows = spark.table("warcstream")
        .as[(String, String)].collect().toSet
      assert(rows == Set(("http://st/1", "one"), ("http://st/2", "two"),
        ("http://st/3", "three")))
      // a re-trigger with no new files adds nothing (offset = files seen)
      query.processAllAvailable()
      assert(spark.table("warcstream").count() == 3)
    } finally query.stop()
  }

  test("streaming ingest tails .warc.gz members alongside plain ones") {
    val dir = tmpDir("warcgz-stream")
    writeGzFile(dir, "a.warc.gz")(Seq("http://gs/1" -> "one".getBytes))
    val stream = spark.readStream.format("warc")
      .option("maxPartitionBytes", 4096).load(dir)
      .select($"target_uri", $"payload".cast("string").as("body"))
    val query = stream.writeStream
      .format("memory").queryName("warcgzstream").outputMode("append").start()
    try {
      query.processAllAvailable()
      writeGzFile(dir, "b.warc.gz")(Seq("http://gs/2" -> "two".getBytes))
      writeFile(dir, "c.warc")(Seq("http://gs/3" -> "three".getBytes))
      query.processAllAvailable()
      val rows = spark.table("warcgzstream").as[(String, String)].collect().toSet
      assert(rows == Set(("http://gs/1", "one"), ("http://gs/2", "two"),
        ("http://gs/3", "three")))
    } finally query.stop()
  }

  test("in-stream crawl pipeline: warc tail -> extract -> gate -> exact dedup in ONE query") {
    import graft.pipeline.TextOps
    import graft.streaming.H3Streaming
    val dir = tmpDir("warc-pipe")
    val longBody = ("the quick brown fox jumps over the lazy dog and keeps " * 6).trim
    def page(body: String) =
      s"<html><script>x='<p>no</p>'</script><body><p>$body</p></body></html>"
    writeFile(dir, "a.warc")(Seq(
      "http://c/1" -> page(longBody).getBytes("UTF-8"),
      "http://c/2" -> page("too short").getBytes("UTF-8")))
    val stream = spark.readStream.format("warc").load(dir)
      .select($"target_uri",
        TextOps.htmlToText($"payload".cast("string")).as("text"),
        lit(new java.sql.Timestamp(1700000000000L)).as("ts"))
    val tk = TextOps.cleanTokens($"text")
    val gated = stream
      .withColumn("__nw", size(tk).cast("long"))
      .filter($"__nw" >= 30)
    val deduped = H3Streaming.streamingExactDedup(gated, "ts", "text",
      watermark = "1 hour")
    val query = deduped.writeStream
      .format("memory").queryName("crawlpipe").outputMode("append").start()
    try {
      query.processAllAvailable()
      // batch 2: a duplicate of doc 1's content under a new uri + a novel doc
      writeFile(dir, "b.warc")(Seq(
        "http://c/3" -> page(longBody).getBytes("UTF-8"),
        "http://c/4" -> page(longBody + " novel ending tokens here").getBytes("UTF-8")))
      query.processAllAvailable()
      val uris = spark.table("crawlpipe").select($"target_uri").as[String].collect().sorted
      // 2 gated out (short), 3 deduped against 1's content, 1 and 4 survive
      assert(uris.toSeq == Seq("http://c/1", "http://c/4"))
    } finally query.stop()
  }

  // ---- per-record-gzip (.warc.gz, the CommonCrawl wire format) ----

  private def writeGzFile(dir: String, name: String)(recs: Seq[(String, Array[Byte])]): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = new DataOutputStream(fs.create(p, true))
    try recs.foreach { case (uri, payload) =>
      val rec = new java.io.ByteArrayOutputStream()
      WarcCodec.writeRecord(new DataOutputStream(rec), "response", s"urn:test:$uri",
        "2026-01-01T00:00:00Z", Some(uri), Some("application/octet-stream"), payload)
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(rec.toByteArray)
      gz.finish()
    } finally out.close()
  }

  test("gz roundtrip: per-record members, binary payloads with embedded gzip magic") {
    val dir = tmpDir("warcgz-rt")
    // payload containing the gzip magic AND a plain WARC magic — the
    // member validator must not be fooled by either inside DEFLATE data
    val decoy = Array[Byte](0x1f, 0x8b.toByte, 0x08, 0, 0, 0, 0, 0, 0, 0) ++
      "WARC/1.0\r\nContent-Length: 0\r\nWARC-Type: response\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    val binary = Array.tabulate[Byte](700)(i => (i * 31 % 256 - 128).toByte)
    val recs = Seq(
      "http://g/1" -> "hello gzip world".getBytes(StandardCharsets.UTF_8),
      "http://g/2" -> decoy,
      "http://g/3" -> binary,
      "http://g/4" -> Array.emptyByteArray)
    writeGzFile(dir, "f.warc.gz")(recs)
    val rows = spark.read.format("warc").load(dir)
      .select($"target_uri", $"record_type", $"content_length", $"payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getAs[Array[Byte]](3)))
      .sortBy(_._1)
    assert(rows.length == 4)
    rows.zip(recs.sortBy(_._1)).foreach { case ((uri, tpe, len, payload), (wUri, wPayload)) =>
      assert(uri == wUri && tpe == "response")
      assert(len == wPayload.length)
      assert(payload.toSeq == wPayload.toSeq, uri)
    }
  }

  test("gz tiny split ranges force mid-member boundaries; rows identical to one range") {
    val dir = tmpDir("warcgz-split")
    val rnd = new scala.util.Random(7)
    val recs = (0 until 150).map { i =>
      val body = new Array[Byte](300 + rnd.nextInt(1200))
      rnd.nextBytes(body) // random bytes barely compress: members span ranges
      f"http://s/$i%03d" -> body
    }
    writeGzFile(dir, "f.warc.gz")(recs)
    def read(mpb: Long) = spark.read.format("warc")
      .option("maxPartitionBytes", mpb).load(dir)
    val whole = read(1L << 30).select($"target_uri", md5($"payload").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    for (mpb <- Seq(2048L, 4096L, 16384L)) {
      val split = read(mpb).select($"target_uri", md5($"payload").as("m"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(split.toSeq == whole.toSeq, s"mpb=$mpb")
    }
  }

  test("gz corrupt member is skipped by resync; valid neighbors survive") {
    val dir = tmpDir("warcgz-corrupt")
    val recs = (0 until 10).map(i => s"http://c/$i" -> s"payload $i".getBytes(StandardCharsets.UTF_8))
    writeGzFile(dir, "f.warc.gz")(recs)
    // flip a byte in the MIDDLE of the file (inside some member's deflate
    // data): that member fails CRC and is dropped, the rest survive
    val f = new java.io.File(dir, "f.warc.gz")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x55).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    // drop Hadoop's checksum sidecar — the corruption is the point
    new java.io.File(dir, ".f.warc.gz.crc").delete()
    val uris = spark.read.format("warc").load(dir)
      .select($"target_uri").collect().map(_.getString(0)).toSet
    assert(uris.size >= 8 && uris.size < 10, s"got ${uris.size}")
    assert(uris.subsetOf(recs.map(_._1).toSet))
  }

  test("gz distributed writer roundtrips through the gz reader; mixed dir reads both formats") {
    val dir = tmpDir("warcgz-writer")
    val df = (0 until 60).map(i => (s"http://w/$i", "text/plain",
      s"doc body $i".getBytes(StandardCharsets.UTF_8))).toDF("uri", "content_type", "payload")
      .repartition(4)
    val n = WarcWriter.writeResponsesGz(df, dir, "2026-01-01T00:00:00Z")
    assert(n == 60L)
    // plus one PLAIN member in the same directory: listing accepts both
    writeFile(dir, "extra.warc")(Seq("http://w/plain" -> "plain".getBytes(StandardCharsets.UTF_8)))
    val got = spark.read.format("warc").load(dir)
      .select($"target_uri").collect().map(_.getString(0)).toSet
    assert(got == ((0 until 60).map(i => s"http://w/$i").toSet + "http://w/plain"))
  }

  test("gz member larger than the tail margin is completed by buffer growth") {
    val dir = tmpDir("warcgz-big")
    val rnd = new scala.util.Random(11)
    val big = new Array[Byte]((1 << 21) + 12345) // 2 MiB: twice the margin
    rnd.nextBytes(big)
    val recs = Seq("http://b/small" -> "x".getBytes(StandardCharsets.UTF_8),
      "http://b/big" -> big, "http://b/tail" -> "y".getBytes(StandardCharsets.UTF_8))
    writeGzFile(dir, "f.warc.gz")(recs)
    val rows = spark.read.format("warc")
      .option("maxPartitionBytes", 4096L).load(dir)
      .select($"target_uri", $"content_length", md5($"payload").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == recs.map(r => (r._1, r._2.length.toLong)).sortBy(_._1))
  }

  test("column pruning reaches the reader: payload-free scan lists no payload column") {
    val dir = tmpDir("warc-prune")
    writeFile(dir, "f.warc")(Seq("http://p/1" -> "abc".getBytes))
    val plan = spark.read.format("warc").load(dir)
      .select($"target_uri", $"content_length")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), plan)
  }
}
