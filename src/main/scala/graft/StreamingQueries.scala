package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.H3Streaming

/** Driver-gated correctness queries for the Structured Streaming surface
  * (SURVEY §2.10 — the declared net-new extension, previously the only
  * substantial surface with no CORRECTNESS row). Each query runs a REAL
  * micro-batch streaming job inside the query function — a file-stream
  * source over the same parquet table the batch oracle reads, a
  * watermarked stateful aggregation, a memory sink — and returns the
  * final deterministic snapshot. The oracle is the batch semantics of
  * the same operator: streaming/batch parity is the contract the
  * H3StreamingSpec laws pin, and the driver gate makes a parity
  * regression impossible to miss between rounds.
  */
object StreamingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked hopping-window rollup driven as a StreamingQuery — the
    // streaming twin of p76_hopping_stats with the identical output
    // contract (epoch-aligned int64-micros window starts, e2-lattice
    // exact sums, 6 h windows sliding every 2 h per event type).
    // COMPLETE output mode: the memory sink's final snapshot equals the
    // batch aggregation over the whole file deterministically, which is
    // what a hash-compared driver artifact needs (append mode's emission
    // set depends on watermark commit timing relative to the final
    // no-data micro-batch — closed-window semantics are spec territory,
    // H3StreamingSpec pins them with MemoryStream batch boundaries).
    "s01_stream_hopping" -> ((s, dir) => {
      val batch = s.read.parquet(s"$dir/events.parquet")
      // same physical-type branch as PipelineQueries.eventsUs: driver
      // generations have shifted between TIMESTAMP(NANOS)-as-long and
      // TIMESTAMP(MICROS); the streaming window needs a real timestamp
      val tsT = batch.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _ => col("ts").cast("timestamp")
      }
      // the table is a single parquet FILE; FileStreamSource force-sets
      // basePath to the (non-directory) path unless the path is a GLOB —
      // the {name} alternation makes it one while matching exactly that
      // file, and the explicit directory basePath then survives
      val stream = s.readStream.schema(batch.schema)
        .option("basePath", dir)
        .parquet(s"$dir/{events.parquet}")
        .withColumn("__ts", tsT)
      val out = H3Streaming.streamingHoppingStats(stream, "__ts",
        "event_type", "value", windowLen = "6 hours", slide = "2 hours",
        watermark = "1 hour")
      // the sink view may survive a previous invocation in this session
      // (bench warm pass, median-of-3 reruns)
      try s.catalog.dropTempView("s01_sink")
      catch { case scala.util.control.NonFatal(_) => () }
      val q = out.writeStream.format("memory").queryName("s01_sink")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("s01_sink").orderBy(col("window_start"), col("group"))
    }),

    // Watermarked windowed h3_compact_agg (F1's streaming form,
    // SURVEY §2.10) driven as a StreamingQuery. The h3_05 identity makes
    // it oracle-exact: each event contributes the FULL res-6 child set of
    // its res-5 cell, so every window's cell set is complete-by-parent
    // and the per-window compaction returns exactly the window's distinct
    // res-5 parents — computable in DuckDB with the synth-cell bit
    // arithmetic and no H3 library. Gates the stateful
    // TypedImperativeAggregate path through the state store (serialize/
    // deserialize of the compact buffer between micro-batches).
    "s02_stream_compact" -> ((s, dir) => {
      val batch = s.read.parquet(s"$dir/events.parquet")
      val tsT = batch.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _ => col("ts").cast("timestamp")
      }
      val stream = s.readStream.schema(batch.schema)
        .option("basePath", dir)
        .parquet(s"$dir/{events.parquet}")
        .withColumn("__ts", tsT)
        .withColumn("parent", expr(SparkEntry.Synth.cellSql("user_id", 5)))
        .withColumn("cell",
          explode(graft.functions.h3_uncompact_cell(col("parent"), lit(6))))
      val out = H3Streaming.windowedCompact(stream, "__ts", "cell",
        watermark = "1 hour", windowLen = "6 hours")
      try s.catalog.dropTempView("s02_sink")
      catch { case scala.util.control.NonFatal(_) => () }
      val q = out.writeStream.format("memory").queryName("s02_sink")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("s02_sink")
        .select(unix_micros(col("window.start")).as("window_start"),
          explode(col("cells")).as("cell"))
        .orderBy(col("window_start"), col("cell"))
    }),

    // Streaming exact dedup (dropDuplicatesWithinWatermark) — the THIRD
    // state-machinery type after windowed agg (s01) and the
    // TypedImperativeAggregate store (s02). Every document text is
    // exploded into two copies, so the dedup state must drop exactly one
    // of each. Determinism: dropDuplicatesWithinWatermark keeps an
    // ARBITRARY winner per key, so the stream is projected to
    // content-only rows first — duplicate keys are then byte-identical
    // rows and the winner is indistinguishable; the output is the
    // distinct text set regardless of arrival order.
    "s03_stream_dedup" -> ((s, dir) => {
      val batch = s.read.parquet(s"$dir/documents.parquet")
      val stream = s.readStream.schema(batch.schema)
        .option("basePath", dir)
        .parquet(s"$dir/{documents.parquet}")
        .select(explode(array(col("text"), col("text"))).as("text"))
        .withColumn("__ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      val out = H3Streaming.streamingExactDedup(stream, "__ts", "text",
        watermark = "1 hour")
      try s.catalog.dropTempView("s03_sink")
      catch { case scala.util.control.NonFatal(_) => () }
      val q = out.writeStream.format("memory").queryName("s03_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("s03_sink").select(col("text")).orderBy(col("text"))
    })
  )

  // Same oracle as p76_hopping_stats: the streaming job must land on the
  // batch answer exactly. A hopping event belongs to windowLen/slide = 3
  // epoch-aligned windows; the floor-mod handles pre-epoch starts.
  def oracleSql: Map[String, String] = Map(
    "s01_stream_hopping" ->
      """WITH e AS (SELECT epoch_us(ts) AS ts, event_type AS grp,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events),
        |x AS (SELECT (ts - ((ts % 7200000000 + 7200000000) % 7200000000)) - k.k * 7200000000 AS window_start, grp, v
        |  FROM e CROSS JOIN (SELECT unnest(range(3)) AS k) k)
        |SELECT window_start, grp AS "group", CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v) AS BIGINT) AS value_sum_e2
        |FROM x WHERE window_start >= 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the uncompact(5->6)-then-compact identity: per 6 h window, the
    // compacted set is exactly the window's distinct res-5 synth cells
    "s02_stream_compact" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS ts,
         |  ${SparkEntry.Synth.oracleCellSql("user_id", 5)} AS cell FROM events)
         |SELECT ts - ((ts % 21600000000 + 21600000000) % 21600000000) AS window_start, cell
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s03_stream_dedup" ->
      """SELECT DISTINCT text FROM documents ORDER BY text""".stripMargin
  )
}
