package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Pins the r16 streaming-gate optimization (StreamingQueries.streamSession:
  * input-size-derived state partitions + no-data micro-batches off for the
  * bounded replay-to-snapshot gates): the emitted snapshot must be
  * IDENTICAL to the pre-r16 shape (state partitions = session shuffle
  * partitions, no-data micro-batches on) — partition count and watermark
  * housekeeping batches may only move WHERE/WHEN state lives, never what
  * is emitted. Runs the two full query functions end-to-end (real
  * FileStreamSource, real state store, real memory sink) at sf0.001.
  * s05 exercises the deepest machinery (flatMapGroupsWithState +
  * event-time timeouts + the double-flush protocol); s01 covers the
  * complete-mode windowed aggregate path. */
class StreamSizingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String, parts: String, noData: String): Seq[String] = {
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val s2 = org.apache.spark.sql.graft.shims.cloneSessionWithConf(spark,
      "graft.stream.statePartitions" -> parts,
      "graft.stream.noDataBatches" -> noData,
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    StreamingQueries.queries(name)(s2, dir)
      .collect().map(_.toString).toSeq
  }

  test("s05 sessions: sized-clone snapshot == pre-r16-shape snapshot") {
    val sized = rows("s05_stream_sessions", "auto", "false")
    val legacy = rows("s05_stream_sessions", "session", "true")
    assert(sized.nonEmpty)
    assert(sized == legacy)
  }

  test("s01 hopping: sized-clone snapshot == pre-r16-shape snapshot") {
    val sized = rows("s01_stream_hopping", "auto", "false")
    val legacy = rows("s01_stream_hopping", "session", "true")
    assert(sized.nonEmpty)
    assert(sized == legacy)
  }
}
