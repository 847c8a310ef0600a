package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession
import graft.pipeline.Sessions

class SessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch sessionize: known sessions on a crafted timeline") {
    // user 1: events at t=0,5,8 (one session), t=100 (second session)
    // user 2: single event; gap = 10 units
    val df = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 8L, 0.25), (1L, 100L, 4.0),
      (2L, 50L, 7.5)).toDF("u", "t", "v")
    val out = Sessions.sessionize(df, $"u", $"t", $"v", gap = 10L)
      .orderBy($"key", $"session_idx")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 8L, 3L, 325L),
      (1L, 1L, 100L, 100L, 1L, 400L),
      (2L, 0L, 50L, 50L, 1L, 750L)))
  }

  test("batch sessionize laws on the events table") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val gap = 86400L * 1000000L // 24 h in micros
    // ts physical type varies by testdata generation: nanos-as-long vs
    // TIMESTAMP(MICROS); micro ordinals either way (the p41 convention)
    val tsMicros = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros($"ts".cast("timestamp"))
    }
    val sess = Sessions.sessionize(ev, $"user_id", tsMicros, $"value", gap)
      .localCheckpoint(false)
    // conservation: every event in exactly one session
    val nEvents = ev.count()
    assert(sess.agg(sum($"n_events")).as[Long].head() == nEvents)
    // session_idx dense from 0 per key
    val dense = sess.groupBy($"key").agg(min($"session_idx").as("lo"),
      max($"session_idx").as("hi"), count(lit(1)).as("n"))
    assert(dense.filter($"lo" =!= 0 || $"hi" =!= $"n" - 1).count() == 0)
    // consecutive sessions of a key are separated by MORE than gap;
    // bounds are ordered within a session
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"session_idx")
    val sep = sess.withColumn("prev_end", lag($"end_ts", 1).over(w))
    assert(sep.filter($"prev_end".isNotNull && $"start_ts" - $"prev_end" <= gap).count() == 0)
    assert(sess.filter($"end_ts" < $"start_ts").count() == 0)
  }

  test("streaming incremental near-dedup: per-batch survivors match the batch op") {
    implicit val sqlCtx = spark.sqlContext
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").localCheckpoint(false)
    val novel = "completely unseen sentence with zebra quark mango piano velvet glacier words"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val writer = H3Streaming.streamingIncrementalNearDedup(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", ref, "doc_id", "text",
      (batch, _) => got.synchronized {
        got ++= batch.select($"doc_id").as[Long](implicitly).collect()
      })
    val query = writer.start()
    try {
      val copies = ref.filter($"doc_id" < 2).as[(Long, String)].collect()
        .map { case (i, t) => (i + 7000, t + " tail") }
      input.addData(copies.toSeq)          // batch 1: near-copies -> dropped
      query.processAllAvailable()
      input.addData((8001L, novel))        // batch 2: novel -> kept
      query.processAllAvailable()
    } finally query.stop()
    assert(got.toSet == Set(8001L), s"got $got")
  }

  test("streaming sessionize equals batch on replay; timeout closes quiet keys") {
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long): Timestamp = new Timestamp(1700000000000L + ms)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = H3Streaming.streamingSessionize(
      input.toDF.toDF("user", "ts", "value"),
      "user", "ts", "value", gapMillis = 10000L, watermark = "2 seconds")
    val query = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: burst (0s,4s,8s) then 30s (new session); user 2: one event
      input.addData((1L, ts(0), 1.0), (1L, ts(4000), 2.0), (2L, ts(1000), 5.0))
      query.processAllAvailable()
      input.addData((1L, ts(8000), 0.5), (1L, ts(30000), 4.0))
      query.processAllAvailable()
      // flush: far-future event on a dummy key pushes the watermark past
      // every open session's gap horizon; next batch fires the timeouts
      input.addData((99L, ts(500000), 0.0))
      query.processAllAvailable()
      input.addData((99L, ts(900000), 0.0))
      query.processAllAvailable()

      val got = spark.table("sessions")
        .filter($"key" < 99L)
        .select($"key", $"start_ns", $"end_ns", $"n_events", $"value_sum_e2")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      // batch reference on the same rows (ms ordinals scaled to ns)
      val batchRows = Seq((1L, 0L, 1.0), (1L, 4000L, 2.0), (2L, 1000L, 5.0),
        (1L, 8000L, 0.5), (1L, 30000L, 4.0))
        .map { case (u, ms, v) => (u, (1700000000000L + ms) * 1000000L, v) }
      val want = Sessions.sessionize(batchRows.toDF("u", "t", "v"),
          $"u", $"t", $"v", gap = 10000L * 1000000L)
        .select($"key", $"start_ts", $"end_ts", $"n_events", $"value_sum_e2")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"streaming $got vs batch $want")
      assert(got.size == 3) // (1: two sessions), (2: one)
    } finally query.stop()
  }
}
