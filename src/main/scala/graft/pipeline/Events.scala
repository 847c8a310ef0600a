package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over a keyed, timestamped event table: as-of
 * join, ordered funnel conversion, cohort retention, and hopping-window
 * rollups. Together with [[Sessions.sessionize]] these cover the standard
 * behavioral-analytics surface a training-data/metrics pipeline runs over
 * its interaction logs.
 *
 * Conventions shared with [[Sessions]]: timestamps are int64 ordinals in a
 * caller-fixed unit (micros in the driver queries — DuckDB `epoch_us`);
 * real-valued measures are floor-quantized to integer lattices before any
 * aggregation so every sum is exact integer arithmetic, reproducible
 * across engines and partition orders.
 *
 * Scale design: every operator shuffles ONCE on the event key (window
 * partitioned by key, or a key-grouped aggregate) and then only touches
 * frames whose cardinality is bounded by keys × a small factor — never a
 * self-join of events against events, never a global window over raw
 * events. All rollup aggregates are partial-aggregated map-side.
 */
object Events {

  /**
   * As-of join: for every left event, the LATEST right event of the same
   * key with `right.ts <= left.ts` (ties on ts: the right row with the
   * larger `rightSeq` wins; a right row at exactly the left timestamp
   * matches). Left rows with no prior right row get a NULL match struct.
   *
   * The classic implementation is a range join (`l.key = r.key AND r.ts <=
   * l.ts`) + argmax, which explodes to O(|L|·|R| per key) pairs before the
   * argmax prunes. This one is the union-scan form: tag both sides, sort
   * each key's merged timeline once, and carry the last-seen right row
   * forward with `last(_, ignoreNulls)` over an unbounded-preceding frame —
   * O(|L|+|R|) rows, ONE hash partitioning by key, no pair blow-up, and
   * whole rows never duplicate (left/right payloads ride as structs).
   * At 100 TB an as-of of a billion-row stream against a billion-row quote
   * table is one sort-merge-shaped pass instead of a quadratic range join.
   *
   * Returns the left columns (original names) plus `asofCol`: a struct of
   * the matched right row's columns, NULL when no match.
   */
  def asOfJoin(left: DataFrame, leftKey: Column, leftTs: Column, leftSeq: Column,
      right: DataFrame, rightKey: Column, rightTs: Column, rightSeq: Column,
      asofCol: String = "asof"): DataFrame = {
    // null literals carry the OTHER side's struct type so the union lines up.
    // NULL-ts right rows are dropped: `r.ts <= l.ts` is unknown for them,
    // but Spark's nulls-first ascending sort would place them BEFORE the
    // whole key and last(ignoreNulls) would carry one as a bogus match
    // (NULL-ts LEFT rows are harmless — they sort first and match nothing)
    val rPart = right.filter(rightTs.isNotNull)
      .select(rightKey.cast("long").as("__k"), rightTs.cast("long").as("__ts"),
      lit(0).as("__side"), rightSeq.cast("long").as("__seq"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    val lFixed = left.select(leftKey.cast("long").as("__k"), leftTs.cast("long").as("__ts"),
      lit(1).as("__side"), leftSeq.cast("long").as("__seq"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.schema.fields)).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lFixed.unionByName(rPart)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__m").as(asofCol)): _*)
  }

  /**
   * Ordered funnel: how many keys (users) reach each step of
   * `steps` in sequence — a key completes step i iff there EXISTS a chain
   * of events `e_0 < e_1 < ... < e_i` (strictly increasing timestamps)
   * whose types match `steps(0..i)` with the whole chain within `maxSpan`
   * of its own step-0 anchor. Every step-0 occurrence is a candidate
   * anchor (re-anchoring): a key with `A@0, A@100, B@105` and span 10
   * converts via the `A@100` anchor even though the first `A` expired.
   * Conversion counts are therefore exact over ALL chains, not just the
   * chain from the first anchor.
   *
   * Exactness comes from a max-anchor recursion: per event `e` of type
   * `steps(i)`, `a_i(e)` = the latest possible anchor over all chains to
   * step i ending at `e` — `a_0(e) = ts(e)`; `a_i(e) = max a_{i-1}(f)`
   * over earlier events `f` of type `steps(i-1)` (no span condition in
   * the recursion: intermediate chain elements precede `e`, so
   * `ts(e) <= anchor + maxSpan` bounds them too). A chain within span
   * exists at `e` iff `ts(e) <= a_i(e) + maxSpan` — maximizing the
   * anchor is optimal, so the test is exact.
   *
   * One hash partitioning by key + one per-partition sort by ts; each
   * step adds a running-max Window node over the SAME (partition, order),
   * so Spark plans one Exchange + one Sort + n_steps windows, then a
   * per-key collapse and a tiny (n_steps)-row rollup. Per-key window
   * state is a handful of longs regardless of event count.
   *
   * Returns (step_idx, step, n_keys) — n_keys monotonically non-increasing.
   */
  def funnel(events: DataFrame, key: Column, ts: Column, eventType: Column,
      steps: Seq[String], maxSpan: Long): DataFrame = {
    val perKey = funnelPerKey(events, key, ts, eventType, steps, maxSpan)
    // coalesce: a global agg over an EMPTY perKey frame yields one row of
    // NULL sums — every step must report 0, not NULL
    val stepCounts = steps.indices.map { i =>
      coalesce(sum(when(col(s"__s$i").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__n$i")
    }
    val totals = perKey.agg(stepCounts.head, stepCounts.tail: _*)
    val stepLit = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("step_idx"), lit(s).as("step"), col(s"__n$i").as("n_keys"))
    }: _*)
    totals.select(explode(stepLit).as("__e")).select(col("__e.*"))
  }

  /**
   * Per-key funnel completion rows: `(key, step_idx, step, ts)` — one row
   * per step each key completed, with the EARLIEST timestamp at which any
   * valid chain (see [[funnel]] — re-anchoring semantics) completes that
   * step. Per-key timestamps strictly increase with step_idx: the first
   * chain to complete step i passes through an event that completed step
   * i-1 strictly earlier. [[funnel]] is the rollup of this frame; the
   * streaming twin ([[graft.streaming.H3Streaming.streamingFunnel]])
   * emits the same rows incrementally. Same one-Exchange plan as
   * [[funnel]].
   */
  def funnelCompletions(events: DataFrame, key: Column, ts: Column,
      eventType: Column, steps: Seq[String], maxSpan: Long): DataFrame = {
    val perKey = funnelPerKey(events, key, ts, eventType, steps, maxSpan)
    val stepLit = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("step_idx"), lit(s).as("step"), col(s"__s$i").as("ts"))
    }: _*)
    perKey.select(col("__k").as("key"), explode(stepLit).as("__e"))
      .select(col("key"), col("__e.*"))
      .filter(col("ts").isNotNull)
  }

  /** Shared funnel builder: one row per key with `__s0..__sN` — the
    * EARLIEST timestamp at which the key completes each step under the
    * re-anchoring exists-a-chain semantics (NULL where no chain ever
    * completes the step). `__a$i` is the per-event max-anchor column of
    * the recursion documented on [[funnel]]; the strict-predecessor frame
    * (`rangeBetween(unboundedPreceding, -1)` over integer ts) excludes
    * same-timestamp events, enforcing strictly increasing chains. */
  private def funnelPerKey(events: DataFrame, key: Column, ts: Column,
      eventType: Column, steps: Seq[String], maxSpan: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxSpan > 0, s"maxSpan must be positive, got $maxSpan")
    val strictlyBefore = Window.partitionBy(col("__k")).orderBy(col("__ts"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val base = events.select(key.cast("long").as("__k"), ts.cast("long").as("__ts"),
      eventType.as("__t"))
    val withAnchors = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val anchor = if (i == 0) when(col("__t") === step, col("__ts"))
        else when(col("__t") === step,
          max(col(s"__a${i - 1}")).over(strictlyBefore))
      df.withColumn(s"__a$i", anchor)
    }
    val done = steps.indices.map { i =>
      min(when(col(s"__a$i").isNotNull &&
        col("__ts") <= col(s"__a$i") + maxSpan, col("__ts"))).as(s"__s$i")
    }
    withAnchors.groupBy(col("__k")).agg(done.head, done.tail: _*)
  }

  /**
   * Cohort retention: keys grouped by the day of their FIRST event
   * (cohort), crossed with the day offset of each later activity —
   * the standard retention triangle. Day = floor(ts / dayUnit) in the
   * caller's time unit (86400e6 for micros), exact integer arithmetic.
   *
   * Plan: one window min over (partition by key) piggybacks on the
   * key-partitioning Exchange, then the (cohort_day, day_offset, key)
   * distinct + rollup shuffles a frame bounded by keys × active-days —
   * already collapsed from raw events map-side by the distinct's partial
   * aggregation.
   *
   * Returns (cohort_day, day_offset, n_keys).
   */
  def cohortRetention(events: DataFrame, key: Column, ts: Column,
      dayUnit: Long): DataFrame = {
    require(dayUnit > 0, s"dayUnit must be positive, got $dayUnit")
    val byKey = Window.partitionBy(col("__k"))
    // exact integer day: long `/` in Spark is double division; subtracting
    // the mod first makes the double quotient exactly the integer day
    events.select(key.cast("long").as("__k"),
        ((ts.cast("long") - pmod(ts.cast("long"), lit(dayUnit))) / dayUnit)
          .cast("long").as("__day"))
      .withColumn("__cohort", min(col("__day")).over(byKey))
      .select(col("__k"), col("__cohort").as("cohort_day"),
        (col("__day") - col("__cohort")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /**
   * Per-event trailing-window aggregates: for every event, the count and
   * exact e2-lattice value sum of the SAME key's events in
   * `(ts - lookback, ts]` — the rolling-activity / velocity feature
   * (txn-count-last-24h style) every feature store derives from an event
   * log. A RANGE window frame, so simultaneous events (ts ties) all see
   * the same closed window — order within a tie does not matter.
   *
   * One hash partitioning by key + one per-partition sort; no
   * self-join (the naive `e JOIN e ON same key AND ts BETWEEN ...` is
   * O(rows × window-occupancy) pairs — this is O(rows log rows) with the
   * running frame maintained incrementally by the window operator).
   */
  def rollingWindowStats(events: DataFrame, key: Column, ts: Column,
      seq: Column, value: Column, lookback: Long): DataFrame = {
    require(lookback > 0, s"lookback must be positive, got $lookback")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"))
      .rangeBetween(-(lookback - 1), 0)
    events.select(key.cast("long").as("key"), ts.cast("long").as("ts"),
        seq.cast("long").as("seq"),
        floor(value * 100.0 + 0.5).cast("long").as("__v"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing_e2", sum(col("__v")).over(w))
      .drop("__v")
  }

  /**
   * Hopping-window rollup: per (window_start, group) event counts and
   * exact e2-lattice value sums, where windows have length `windowLen`
   * and slide `slide` (both in the ts unit; `windowLen` a multiple of
   * `slide`), aligned to ts=0 — the batch twin of Structured Streaming's
   * `window(ts, len, slide)`, with identical epoch-aligned window starts.
   *
   * Each event belongs to exactly windowLen/slide windows; membership is
   * a generated integer sequence (`explode(sequence(...))`) — pure
   * integer arithmetic, no timestamp-type round-trips — and the rollup is
   * a single hash aggregate with map-side partials. Amplification is the
   * fixed len/slide factor on SLIM (start, group, 1, v) rows, not whole
   * events.
   *
   * Returns (window_start, group, n_events, value_sum_e2).
   */
  def hoppingWindowStats(events: DataFrame, ts: Column, group: Column,
      value: Column, windowLen: Long, slide: Long): DataFrame = {
    require(slide > 0 && windowLen > 0, "windowLen and slide must be positive")
    require(windowLen % slide == 0,
      s"windowLen ($windowLen) must be a multiple of slide ($slide)")
    val nWin = windowLen / slide
    events.select(ts.cast("long").as("__ts"), group.as("__g"),
        floor(value * 100.0 + 0.5).cast("long").as("__v"))
      .withColumn("__k", explode(sequence(lit(0L), lit(nWin - 1))))
      // FLOOR alignment (pmod): a pre-epoch event must enumerate its own
      // negative windows (all dropped by the >= 0 filter, like the
      // built-in window()), not fold into [0, slide) and inflate it
      .select(((col("__ts") - pmod(col("__ts"), lit(slide))) - col("__k") * slide)
          .as("window_start"),
        col("__g").as("group"), col("__v"))
      .filter(col("window_start") >= 0)
      .groupBy(col("window_start"), col("group"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("value_sum_e2"))
  }

  /**
   * Rate-anomaly detection over tumbling windows: per (group, window),
   * flag windows whose event count exceeds `threshNum/threshDen` times
   * the mean of the `baseline` immediately-preceding windows — the
   * monitoring alarm of an ingest pipeline (traffic spike, scraper
   * burst, broken producer). The comparison is pure integer
   * cross-multiplication (`n · prev_cnt · threshDen > prev_sum ·
   * threshNum`), exactly replayable; windows with NO baseline yet are
   * never flagged (prev_cnt = 0). Empty windows produce no row, so the
   * baseline averages only preceding windows that HAD events — a quiet
   * gap shrinks the baseline rather than zero-filling it (flagging the
   * first burst after silence against a zero mean would alarm on every
   * resume).
   *
   * Scale shape: one tumbling-window count aggregate (map-side
   * partials), then a RANGE-frame window over the per-(group, window)
   * COUNT frame — rowCount = groups × windows, not events, so the
   * window sort is over the tiny aggregate, never the event log.
   *
   * Returns (window_start, group, n_events, prev_sum, prev_cnt,
   * anomaly).
   */
  def rateAnomaly(events: DataFrame, ts: Column, group: Column,
      windowLen: Long, baseline: Int,
      threshNum: Long, threshDen: Long): DataFrame = {
    require(windowLen > 0 && baseline >= 1 && threshNum > 0 && threshDen > 0)
    val counts = events
      .select(ts.cast("long").as("__ts"), group.as("group"))
      // FLOOR alignment (pmod, not %): pre-epoch timestamps must fall
      // in their own negative window, matching the streaming twin's
      // window() semantics — truncation would fold (-W, 0) into [0, W)
      .select((col("__ts") - pmod(col("__ts"), lit(windowLen))).as("window_start"),
        col("group"))
      .groupBy(col("window_start"), col("group"))
      .agg(count(lit(1)).as("n_events"))
    val frame = Window.partitionBy(col("group")).orderBy(col("window_start"))
      .rangeBetween(-baseline * windowLen, -windowLen)
    counts
      .withColumn("prev_sum", coalesce(sum(col("n_events")).over(frame), lit(0L)))
      .withColumn("prev_cnt", count(lit(1)).over(frame))
      .withColumn("anomaly",
        when(col("prev_cnt") > 0 &&
          col("n_events") * col("prev_cnt") * lit(threshDen) >
            col("prev_sum") * lit(threshNum), 1L).otherwise(0L))
  }
}
