package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage barriers for iterative DataFrame loops (distributed connected
  * components, label propagation, SSSP relaxation). Each round must cut
  * lineage or the plan doubles per iteration; `localCheckpoint` does that
  * but at executor-block durability only — an executor loss mid-iteration
  * invalidates its blocks AND the truncated lineage can no longer
  * recompute them, killing the job. On long 100-TB runs the loops
  * therefore accept an optional reliable-checkpoint directory (HDFS/S3):
  * every [[ReliableEvery]]-th round writes a reliable `checkpoint` that
  * survives executor death (Spark documents reliable checkpointing for
  * exactly this long-lineage iterative case); intermediate rounds stay on
  * the cheap local path, bounding re-computation after a failure to at
  * most [[ReliableEvery]] rounds. Without a directory every round uses
  * `localCheckpoint` — the fast single-box default. */
object Barriers {
  /** Cadence of reliable checkpoints within an iterative loop. */
  val ReliableEvery = 5

  /** Cut lineage for `df` at iteration `round` (0-based). An existing
    * session checkpoint dir is respected; otherwise `checkpointDir` is
    * installed on first reliable use.
    *
    * The checkpointed frame is re-wrapped from its RDD to RESET plan
    * statistics: `Dataset.checkpoint`/`localCheckpoint` rewrite the
    * origin plan's estimated stats onto the new `LogicalRDD` leaf, and
    * size-only estimation multiplies child sizes through every join — so
    * an iterative loop compounds sizeInBytes exponentially round over
    * round. The estimate is a BigInt: after ~20 rounds it carries
    * millions of bits and Catalyst burns MINUTES per round inside
    * BigInteger Toom-Cook multiplication (observed on a 120-cell snake
    * cluster). Rebuilding from the RDD gives the leaf the constant
    * `spark.sql.defaultSizeInBytes`, bounding planning cost for any
    * number of rounds; the blocks behind the RDD are untouched, and
    * these slim per-round label frames never want stats-driven broadcast
    * decisions anyway. */
  def roundBarrier(df: DataFrame, round: Int, checkpointDir: Option[String],
      eager: Boolean): DataFrame = {
    val cp = checkpointDir match {
      case Some(dir) if round % ReliableEvery == ReliableEvery - 1 =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
