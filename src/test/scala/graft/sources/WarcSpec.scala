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

  test("column pruning reaches the reader: payload-free scan lists no payload column") {
    val dir = tmpDir("warc-prune")
    writeFile(dir, "f.warc")(Seq("http://p/1" -> "abc".getBytes))
    val plan = spark.read.format("warc").load(dir)
      .select($"target_uri", $"content_length")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), plan)
  }
}
