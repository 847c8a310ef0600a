package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic data mixing for training-set assembly (engine extension):
 * re-weight corpus strata (domain/source/language buckets) to target
 * sampling rates — the "2× books, 0.3× web" knob every large-scale
 * pretraining pipeline needs.
 *
 * Scale design: pure per-row projection + explode. No RNG state, no
 * sampling pass, no shuffle: each row's copy count is a deterministic
 * function of (id, salt, stratum rate), so the mix is reproducible
 * run-to-run, stable under corpus growth (an existing id's fate never
 * changes when new rows arrive), and embarrassingly parallel at 100 TB.
 * Fractional rates use the same md5 10 000-lattice as
 * [[TextOps.deterministicSplit]], so expected proportions hold to 1e-4
 * and the oracle replicates the arithmetic exactly.
 */
object Mixing {

  /** Copy count for one row: `floor(rate)` guaranteed copies plus one
    * extra when the row's hash bucket falls below the fractional part
    * (bucket = md5(id||salt) mod 10000). Rows in strata absent from
    * `rates` get rate 0 (dropped). */
  def copyCount(id: Column, stratum: Column, rates: Map[String, Double],
      salt: String = ""): Column = {
    require(rates.values.forall(r => r >= 0 && r <= 1000),
      "rates must be in [0, 1000]")
    // integer 10000ths, resolved in Scala so both engines see literals
    val rate10k = rates.map { case (k, v) => k -> math.round(v * 10000.0) }
    val bucket = TextOps.hashBucket10k(id, salt)
    val r = rate10k.foldLeft(lit(0L)) { case (acc, (name, v)) =>
      when(stratum === name, lit(v)).otherwise(acc)
    }
    // Column `/` is double division; floor is exact here (r ≤ 1e7 ≪ 2^53)
    floor(r / 10000.0).cast("long") + when(bucket < r % 10000L, 1L).otherwise(0L)
  }

  /** Materialized mix: one output row per copy, tagged `copy_idx`
    * (0-based). Downstream shuffles treat copies as ordinary rows; a
    * training-data writer can salt sort keys with `copy_idx` to spread
    * repeated documents across shards. */
  def mixSample(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], salt: String = ""): DataFrame = {
    val n = copyCount(id, stratum, rates, salt)
    // No `filter(copies > 0)`: a filter on a computed column is pushed
    // upstream as a predicate carrying the whole copy-count expression
    // tree — observed as a per-row interpreted BroadcastNestedLoopJoin
    // condition embedding the caller's full stratum expression (the p49
    // domain argmax), 20× the query's cost. Zero-copy rows instead
    // produce a NULL sequence, which explode drops for free.
    df.withColumn("copy_idx",
      explode(when(n > 0, sequence(lit(0L), n - 1))))
  }

  /** Per-source quota cap: keep at most `cap` rows per source, selected
    * in deterministic md5-hash order (ties by id) — the anti-dominance
    * sampler that stops one crawl dump/domain from swamping a training
    * mix. Output = the input rows that survive, unmodified.
    *
    * Scale shape (the reason this is not one `row_number` window):
    * 1. A per-source COUNT aggregate (one row per source — tiny) is
    *    broadcast back.
    * 2. Under-cap sources pass through with NO sort: their rows never
    *    enter a window.
    * 3. Over-cap sources pre-filter to `hash <= tau`, where tau is a
    *    Chernoff-slack threshold (expected survivors ≈ 1.5·cap + 64) —
    *    a map-side filter, so a hot source (one domain = half a 100-TB
    *    corpus) drops almost all of its rows BEFORE the only sort, whose
    *    per-source input is now O(cap), not O(source size).
    * 4. A survivor recount guards the prefilter: any source whose
    *    survivor count fell below `cap` (vanishingly unlikely under the
    *    60-bit uniform hash, but possible on adversarial data) falls back
    *    to the unfiltered window. Both paths compute the identical
    *    top-cap-by-(hash, id) set, so the output is deterministic
    *    whichever path ran — and the oracle only ever sees the rank rule.
    *
    * NULL sources are grouped with the empty string (the streaming twin's
    * convention); pass a pre-coalesced column to choose otherwise. */
  def sourceCap(df: DataFrame, id: Column, source: Column, cap: Int,
      salt: String = ""): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val cols = df.columns
    // NULL sources group with empty string (matching the streaming twin's
    // Objects.toString(null, "")): a bare `source` key would silently DROP
    // null-source rows at the counts equi-join, since null never equals null
    val base = df.withColumn("__src", coalesce(source.cast("string"), lit("")))
      // NULL ids hash as empty string (same convention as null sources): a
      // bare concat would yield a NULL hash, which the tau prefilter DROPS
      // (null <= tau is null) while the fallback window ranks it FIRST
      // (nulls sort low) — the two paths must agree row-for-row. With
      // several null-id rows the (hash, id) tiebreak is degenerate; unique
      // ids remain the caller contract for full determinism.
      .withColumn("__h", TextOps.md5Long(concat(coalesce(id.cast("string"), lit("")), lit(salt))))
      .withColumn("__id", id)
    val counts = base.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val withN = base.join(broadcast(counts), "__src")
    val small = withN.filter(col("__n") <= cap)
    val big = withN.filter(col("__n") > cap)
    // tau: expected survivors = (1.5·cap + 64); 2^60 is the md5Long range.
    // Exactly representable doubles throughout (cap ≤ 2^31, 2^60 a power
    // of two), deterministic across runs.
    val tau = ((lit(cap) * 1.5 + 64.0) / col("__n") * lit(math.pow(2, 60))).cast("long")
    val pref = big.filter(col("__h") <= tau).localCheckpoint(false)
    val okSrc = pref.groupBy(col("__src")).agg(count(lit(1)).as("__m"))
      .filter(col("__m") >= cap).select(col("__src"))
    val w = Window.partitionBy(col("__src")).orderBy(col("__h"), col("__id"))
    def topCap(rows: DataFrame): DataFrame =
      rows.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= cap)
    val fromPref = topCap(pref.join(broadcast(okSrc), Seq("__src"), "left_semi"))
    val fallback = topCap(big.join(broadcast(okSrc), Seq("__src"), "left_anti"))
    small.unionByName(fromPref.drop("__rn"), allowMissingColumns = true)
      .unionByName(fallback.drop("__rn"), allowMissingColumns = true)
      .select(cols.map(col): _*)
  }

  /** Token-budget corpus selection: walk documents best-quality-first and
    * keep them until `budget` tokens are taken — the selection step after
    * corpus scoring (DSIR/CCNet-style pipelines pick "the best N-token
    * subset", a TOKEN budget, not a document count, because training cost
    * is measured in tokens). A document is selected iff the tokens BEFORE
    * it in (score DESC, doc_id ASC) order total under `budget`, so the
    * straddling document is included and the result is exactly the
    * shortest best-first prefix covering the budget. Output: every input
    * document with `doc_id`, `score`, `n_tokens`, `cum_before` (tokens
    * strictly before it in the walk) and the `selected` flag.
    *
    * Scale shape — the global running sum over (score, id) order is the
    * same "no global window" problem as [[Packing.packSequences]] and
    * reuses its two-level parallel prefix sum, with a COMPOUND level-1 key
    * `(score, floor(id / bucketWidth))`: within-cell exclusive cumsum is a
    * window partitioned by that key (parallel even when every document has
    * the same score — the id-range component keeps cells bounded, where a
    * plain per-score partition would collapse a constant-score corpus onto
    * one task); cell totals are derived from the windowed side (max of
    * local+cnt — no second corpus scan) and prefix-summed on the tiny
    * aggregated frame in the declared single-partition window; cell
    * prefixes broadcast back. Two corpus shuffles total (the cell-keyed
    * exchange + the broadcast-join side is shuffle-free), no corpus-wide
    * sort. Ids must be unique and non-negative (caller contract, as in
    * packSequences); score must be exactly comparable across engines —
    * ride the e4 lattice ([[TextOps.unigramLogProbScore]]). */
  def tokenBudgetSelect(df: DataFrame, id: Column, score: Column,
      tokenCount: Column, budget: Long, bucketWidth: Long = 100000L): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    tokenBudgetWalk(df, id, score, tokenCount, lit(""), bucketWidth)
      .withColumn("selected", col("cum_before") < budget)
      .drop("stratum")
  }

  /** Per-stratum token budgets: an independent best-first walk INSIDE each
    * stratum (language, domain, source tier), selecting until that
    * stratum's own budget is filled — the standard mixture-allocation step
    * ("X tokens of web, Y of code, Z of books"). Strata absent from
    * `budgets` get budget 0 (nothing selected, rows still emitted with
    * their walk positions). Output adds `stratum` and the per-stratum
    * `cum_before`/`selected`.
    *
    * Scale shape: identical to [[tokenBudgetSelect]] with the stratum
    * joining every key — and the cross-cell prefix window is partitioned
    * BY STRATUM, so what was the one single-partition window now
    * parallelizes across strata too (each over its own aggregated cell
    * frame). */
  def tokenBudgetSelectPerStratum(df: DataFrame, id: Column, score: Column,
      tokenCount: Column, stratum: Column, budgets: Map[String, Long],
      bucketWidth: Long = 100000L): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val b = budgets.foldLeft(lit(0L)) { case (acc, (name, v)) =>
      when(col("stratum") === name, lit(v)).otherwise(acc)
    }
    tokenBudgetWalk(df, id, score, tokenCount,
        coalesce(stratum.cast("string"), lit("")), bucketWidth)
      .withColumn("selected", col("cum_before") < b)
  }

  /** Shared walk: per-stratum exclusive running token sum in
    * (score DESC, doc_id ASC) order via the Packing-style two-level
    * prefix sum over compound (stratum, score, id-bucket) cells. The
    * single-stratum caller passes a constant stratum. */
  private def tokenBudgetWalk(df: DataFrame, id: Column, score: Column,
      tokenCount: Column, stratum: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(id.cast("long").as("doc_id"), score.as("score"),
        // clamp: a null/negative count (a null-text size() under legacy
        // sizeOfNull, an upstream bug) would break the max(__local +
        // n_tokens) cell-total identity and silently shift every later
        // cell's cum_before — packSequences filters these, the walk
        // zeroes them (the row still appears, consuming no budget)
        greatest(coalesce(tokenCount.cast("long"), lit(0L)), lit(0L)).as("n_tokens"),
        stratum.as("stratum"))
      // non-nullable bucket key, same plan-shape reasoning as packSequences
      .withColumn("__b", coalesce(floor(col("doc_id") / bucketWidth), lit(-1L)))
    val inCell = Window.partitionBy(col("stratum"), col("score"), col("__b"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("__local",
      coalesce(sum(col("n_tokens")).over(inCell), lit(0L)))
    // cell totals from the windowed side; exclusive prefix over the cells
    // in walk order (score DESC, then id-bucket ASC), partitioned by
    // stratum — the per-stratum window runs over that stratum's aggregated
    // cell frame only
    val cellPrefixW = Window.partitionBy(col("stratum"))
      .orderBy(col("score").desc, col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = local
      .groupBy(col("stratum"), col("score"), col("__b"))
      .agg(max(col("__local") + col("n_tokens")).as("__ctot"))
      .withColumn("__cprefix", coalesce(sum(col("__ctot")).over(cellPrefixW), lit(0L)))
      .select(col("stratum").as("__pt"), col("score").as("__ps"),
        col("__b").as("__pb"), col("__cprefix"))
    local
      .join(broadcast(prefixes),
        col("stratum") === col("__pt") && col("score") <=> col("__ps") &&
          col("__b") === col("__pb"))
      .select(col("doc_id"), col("stratum"), col("score"), col("n_tokens"),
        (col("__cprefix") + col("__local")).as("cum_before"))
  }
}
