package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Structured Streaming wiring for the H3 catalog (SURVEY.md §2.10 — an
 * explicit *extension*: the reference is batch-only).
 *
 * Every scalar/array expression in the catalog is deterministic and
 * stateless, so it runs unchanged inside `readStream` pipelines. The
 * stateful reference ops map onto watermarked windowed aggregation:
 * compaction (C3/F1) becomes `h3_compact_agg` per (window, group), and
 * rollups become ordinary windowed groupBys. State lives in Spark's state
 * store — sized by (windows in flight) x (distinct groups), the right
 * shape for a 100 TB/day ingest feed.
 */
object H3Streaming {

  /** stateless enrichment: point stream -> cell + parent columns. */
  def withCells(stream: DataFrame, latCol: String, lngCol: String, res: Int,
      parentRes: Int): DataFrame =
    stream
      .withColumn("cell", h3_latlng_to_cell(col(latCol), col(lngCol), lit(res)))
      .withColumn("parent", h3_cell_to_parent(col("cell"), lit(parentRes)))

  /** watermarked per-window, per-parent rollup (count + value sum). */
  def windowedParentRollup(stream: DataFrame, tsCol: String, valueCol: String,
      watermark: String, windowLen: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("parent"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** watermarked per-window compaction: the streaming form of F1 — each
    * closed window emits the compacted cell set seen in it. */
  def windowedCompact(stream: DataFrame, tsCol: String, cellCol: String,
      watermark: String, windowLen: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(h3_compact_agg(col(cellCol)).as("cells"))

  /** Streaming exact dedup (the training-pipeline ingest shape): drop
    * documents whose content hash was already seen, with state bounded by
    * the watermark — a duplicate arriving later than `watermark` after the
    * original may be re-admitted, which is the standard state/recall
    * trade; state size = distinct hashes per watermark horizon, not the
    * corpus. The 64-bit content hash keeps state slim; a 2^-64 collision
    * drops a non-duplicate. */
  def streamingExactDedup(stream: DataFrame, tsCol: String, contentCol: String,
      watermark: String): DataFrame =
    stream
      .withColumn("__h", xxhash64(col(contentCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
}
