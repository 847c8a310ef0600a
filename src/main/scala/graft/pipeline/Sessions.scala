package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream (batch form): events of the
 * same key belong to one session while consecutive timestamps are within
 * `gap`; a larger gap opens a new session. The classic
 * gaps-and-islands shape: a per-key `lag` marks session starts, a per-key
 * running sum numbers them, one aggregate folds sessions.
 *
 * Scale design: every window is PARTITIONED BY the session key — fully
 * parallel, no global ordering anywhere; both windows share one
 * hash-partitioning on key (a single exchange), and the final aggregate
 * shuffles on (key, session_idx), whose cardinality is bounded by the
 * event count. Timestamps are int64 ordinals in ANY fixed
 * unit (nanos, micros, millis) — `gap` shares that unit; no lossy
 * double/timestamp conversions anywhere.
 */
object Sessions {

  /**
   * One row per (key, session): 0-based `session_idx` in time order,
   * `start_ts`/`end_ts` bounds (same unit as the input), `n_events`, and
   * `value_sum_e2` — the
   * per-event values floor-quantized to a 1e-2 integer lattice and
   * summed as longs (the cross-engine-exact aggregation convention).
   *
   * NULL-timestamp events are DROPPED: an unparseable timestamp cannot
   * be placed in any session, and under the nulls-first sort each such
   * row would otherwise open its own bogus null-bounded session and
   * shift every real session's index.
   */
  def sessionize(df: DataFrame, key: Column, ts: Column, value: Column,
      gap: Long): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val byKey = Window.partitionBy(col("__key")).orderBy(col("__ts"))
    val runs = Window.partitionBy(col("__key")).orderBy(col("__ts"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(key.as("__key"), ts.cast("long").as("__ts"),
        floor(value * 100.0 + 0.5).cast("long").as("__v"))
      .filter(col("__ts").isNotNull)
      .withColumn("__prev", lag(col("__ts"), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull || col("__ts") - col("__prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(runs) - 1L)
      .groupBy(col("__key").as("key"), col("session_idx"))
      .agg(
        min(col("__ts")).as("start_ts"),
        max(col("__ts")).as("end_ts"),
        count(lit(1)).as("n_events"),
        sum(col("__v")).as("value_sum_e2"))
  }
}
