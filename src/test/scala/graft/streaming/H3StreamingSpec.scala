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
}
