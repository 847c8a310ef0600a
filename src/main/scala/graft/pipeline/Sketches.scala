package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.collect_min_k

/**
 * Mergeable sketches for corpus statistics. First resident: the KMV
 * (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002,
 * "Counting distinct elements in a data stream"; Beyer et al. 2007 (the
 * unbiased (k-1)/U_(k) estimator used here).
 *
 * Why not Spark's built-in `approx_count_distinct`: HLL++ registers are
 * not replayable in another engine, so it cannot be oracle-checked. KMV
 * is DETERMINISTIC given the hash: the sketch is literally "the k
 * smallest distinct 60-bit md5 values", so DuckDB reproduces the exact
 * same estimate from the same rows — approximate in accuracy, exact in
 * replay. Estimate error is ~1/sqrt(k-2) relative (6% at k=256).
 *
 * Scale design: the sketch rides [[graft.expr.CollectMinK]] — per-group
 * state is O(k) BY CONSTRUCTION and map-side partials shrink every
 * partition's contribution to k before the shuffle, so a group with a
 * billion distinct members shuffles partitions×k longs, never the
 * members. That is the whole point versus exact `count(DISTINCT x)`,
 * whose expand-shuffle is corpus-sized: vocabulary tracking over 100 TB
 * per (lang, domain) stratum becomes a few KB per stratum. Sketches of
 * disjoint scans merge by unioning min-k sets (the same aggregate), so
 * per-day sketches roll up to per-month without rescanning.
 */
object Sketches {

  /** 2^60 as a double — the KMV hash space size ([[TextOps.md5Long]] is
    * 60-bit). Exactly representable; both engines compute the same
    * double product/quotient bits from it. */
  private val HashSpace: Double = 1152921504606846976.0

  /** KMV estimate column from a sorted-ascending distinct min-k hash
    * array (the [[graft.functions.collect_min_k]] result): exact size
    * when the group held fewer than k distinct values, else
    * `floor((k-1) * 2^60 / kth_min)`. */
  def kmvEstimate(minK: Column, k: Int): Column =
    when(size(minK) < k, size(minK).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpace)
        / element_at(minK, k).cast("double")).cast("long"))

  /**
   * Approximate distinct `value`s per group: one row per group with
   * `n_rows` (exact row count) and `distinct_est` (KMV estimate).
   * One hash aggregate, O(k) state per group.
   */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        collect_min_k(TextOps.md5Long(value), k).as("__mk"))
      .withColumn("distinct_est", kmvEstimate(col("__mk"), k))
      .drop("__mk")
  }
}
