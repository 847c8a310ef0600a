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
    val bucket = pmod(TextOps.md5Long(concat(id.cast("string"), lit(salt))), lit(10000L))
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
}
