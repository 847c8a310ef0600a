package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining: lay documents end-to-end in a
 * deterministic order and cut the token stream into fixed-size training
 * sequences (the standard concat-then-split layout). Engine extension
 * beyond the reference (SURVEY.md §7.1 step 8 family).
 *
 * The core is a corpus-wide running token offset — a prefix sum over a
 * total order. A naive `Window.orderBy(id)` computes it on ONE partition
 * (the classic "No Partition Defined" scale-killer), so this implements
 * the textbook two-level parallel prefix sum instead:
 *
 *   1. bucket documents by id range (`floor(id / bucketWidth)`);
 *   2. within-bucket exclusive cumsum — a window PARTITIONED by bucket,
 *      fully parallel;
 *   3. per-bucket token totals — a map-side-partial aggregate producing
 *      one row per bucket; the exclusive prefix over THAT tiny frame is
 *      the only single-partition window, over ~corpus/bucketWidth rows;
 *   4. broadcast the bucket prefixes back and add.
 *
 * Correctness never depends on id density or bucket balance (empty or
 * uneven buckets only shift work, not results); ids must be unique,
 * non-negative and orderable, which the caller owns. At 100 TB the heavy
 * stages are one bucket-keyed shuffle and one broadcast join.
 */
object Packing {

  /**
   * Assign each document its segments of fixed-`budget` token sequences.
   *
   * Output: one row per (document, overlapped sequence):
   *   - `doc_id`      — the document
   *   - `seq_id`      — 0-based training-sequence index
   *   - `tok_start`   — first packed token, 0-based WITHIN the document
   *   - `tok_len`     — tokens of this document packed into `seq_id`
   *   - `seq_offset`  — 0-based position of that span WITHIN the sequence
   *
   * Every token of every non-empty document is packed exactly once
   * (documents longer than `budget` span several sequences); zero-token
   * documents yield no rows. Invariants pinned by PackingSpec.
   */
  def packSequences(df: DataFrame, id: Column, tokenCount: Column,
      budget: Long, bucketWidth: Long = 100000L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

    // __bucket is made NON-nullable (coalesce with a literal): otherwise
    // the broadcast join infers an isnotnull(__bucket) filter into the
    // windowed branch only, the two scan+exchange subtrees no longer
    // canonicalize equal, and AQE's exchange reuse cannot dedupe them —
    // the corpus would be scanned and shuffled twice (ids are non-null by
    // contract; a null id would land in bucket -1 rather than poison the
    // plan shape)
    val base = df
      .select(id.cast("long").as("doc_id"), tokenCount.cast("long").as("__cnt"))
      .filter(col("__cnt") > 0)
      .withColumn("__bucket", coalesce(floor(col("doc_id") / bucketWidth), lit(-1L)))

    // (2) within-bucket exclusive running sum — parallel across buckets
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("__local", coalesce(sum(col("__cnt")).over(inBucket), lit(0L)))

    // (3) bucket totals DERIVED from the windowed side — the bucket's last
    // row has the largest inclusive running sum (__local + __cnt), so a
    // max-aggregate over `local` equals the per-bucket token total without
    // a second corpus scan, and the groupBy key matches the window's hash
    // partitioning (no new exchange). The bucket-prefix window then runs
    // single-partition BY DESIGN over the ~corpus/bucketWidth aggregated
    // rows (16 bytes each); the constant-valued but non-foldable partition
    // key (bucket mod 1, which Catalyst keeps) declares that intent
    // instead of tripping WindowExec's no-partition warning.
    val bucketPrefixW = Window.partitionBy(pmod(col("__bucket"), lit(1)))
      .orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = local
      .groupBy(col("__bucket")).agg(max(col("__local") + col("__cnt")).as("__btot"))
      .withColumn("__bprefix", coalesce(sum(col("__btot")).over(bucketPrefixW), lit(0L)))
      .select(col("__bucket"), col("__bprefix"))

    // (4) broadcast prefixes back; cumBefore = global exclusive prefix sum
    val placed = local
      .join(broadcast(prefixes), "__bucket")
      .withColumn("__before", col("__bprefix") + col("__local"))

    // cut: doc occupies token span [__before, __before + __cnt) of the
    // stream; sequence k covers [k*budget, (k+1)*budget)
    placed
      .withColumn("seq_id",
        explode(sequence(
          floor(col("__before") / budget).cast("long"),
          floor((col("__before") + col("__cnt") - 1) / budget).cast("long"))))
      .select(
        col("doc_id"),
        col("seq_id"),
        greatest(col("seq_id") * budget - col("__before"), lit(0L)).as("tok_start"),
        (least((col("seq_id") + 1) * budget - col("__before"), col("__cnt")) -
          greatest(col("seq_id") * budget - col("__before"), lit(0L))).as("tok_len"),
        (greatest(col("seq_id") * budget, col("__before")) - col("seq_id") * budget)
          .as("seq_offset"))
  }

  /** Materialize a packing as training shards: parquet partitioned by
    * `shard_id = seq_id / seqsPerShard` — every shard holds the segment
    * rows of a contiguous sequence range, so a training job reads shard
    * directories in order and never shuffles. One projection over the
    * packed frame; the partitioned write is the only data movement. */
  def writeShards(packed: DataFrame, path: String, seqsPerShard: Long): Unit = {
    require(seqsPerShard > 0, s"seqsPerShard must be positive, got $seqsPerShard")
    packed
      .withColumn("shard_id", floor(col("seq_id") / seqsPerShard).cast("long"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(path)
  }
}
