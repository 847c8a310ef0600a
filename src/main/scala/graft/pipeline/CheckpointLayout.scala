package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Checkpoint a frame so that a `HashPartitioning(key)` + in-partition
  * sort survives into every downstream consumer — the layout a frame
  * needs when it is re-read many times clustered by the same key (an
  * iterative trainer's per-key window, a final per-key aggregate).
  *
  * Two Spark realities make this non-trivial:
  *
  *  1. Under AQE, `Dataset.localCheckpoint` captures the adaptive root's
  *     partitioning — `UnknownPartitioning` before the final plan exists —
  *     so the layout is lost. AQE is therefore suspended for just the
  *     checkpoint CAPTURE (planning), and restored immediately; the
  *     materialization and all downstream queries run with it.
  *  2. `LogicalRDD.fromDataset` copies the physical plan's
  *     outputPartitioning/outputOrdering VERBATIM — it rewrites origin
  *     statistics and constraints onto the new output attributes
  *     (`rewriteStatsAndConstraints`) but not the layout. When the
  *     optimizer collapses a redundant alias in the checkpointed subtree
  *     (`RemoveRedundantAliases`: e.g. `col("doc_id").cast("long")
  *     .as("doc_id")` over an already-long column — the cast dies to
  *     SimplifyCasts and the same-name alias dies with it), the physical
  *     output carries the ORIGINAL exprIds while the new LogicalRDD's
  *     output carries the analysis-time ones, so the captured
  *     partitioning references attributes that no longer exist and
  *     EnsureRequirements re-shuffles anyway — silently.
  *
  * The second failure is detected for free: `localCheckpoint(eager =
  * false)` plans (and captures) without executing, so the candidate's
  * `LogicalRDD` can be inspected before anything runs. If its layout
  * references its own output, use it. Otherwise abandon the candidate
  * (nothing was materialized) and rebuild through an exprId-stable
  * boundary: an inner lazy checkpoint of the unpartitioned frame, whose
  * `LogicalRDD` leaf gives the outer repartition+sort a plan with no
  * aliases for the optimizer to collapse. The stable path materializes
  * the frame twice (inner once, outer once) — acceptable for the slim
  * aggregated frames this is meant for; callers checkpointing a corpus
  * should restructure instead.
  */
object CheckpointLayout {

  /** `df` checkpointed with `HashPartitioning(key)` + in-partition sort
    * by `key` guaranteed visible downstream. Lazy (materializes on first
    * action), like `localCheckpoint(eager = false)`.
    *
    * The exprId-staleness trap is defused structurally: every column is
    * re-aliased to an internal name before the repartition — a
    * NAME-CHANGING alias is one RemoveRedundantAliases must keep, so the
    * physical output carries the analysis-time exprIds and the captured
    * layout references the checkpoint's own output — then renamed back
    * AFTER the checkpoint (ProjectExec is partitioning- and
    * order-preserving through aliases, so the layout flows to consumers).
    * The probe + double-checkpoint fallback stays for shapes the rename
    * shield cannot cover (e.g. a future optimization collapsing the tag
    * projection itself); it materializes twice and is expected never to
    * run.
    */
  def clusteredBy(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val names = df.columns.toSeq
    def tag(n: String) = "__ckl_" + n
    val tagged = df.select(names.map(n => col(n).as(tag(n))): _*)
    try {
      spark.conf.set(aqeKey, "false")
      val candidate = tagged.repartition(col(tag(key)))
        .sortWithinPartitions(col(tag(key)))
        .localCheckpoint(false)
      val ck =
        if (layoutIsUsable(candidate)) candidate
        // planning-only candidate abandoned; rebuild over a stable leaf
        else stableBoundaryCheckpoint(tagged, tag(key))
      ck.select(names.map(n => col(tag(n)).as(n)): _*)
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  /** The double-materialization fallback: an inner lazy checkpoint whose
    * LogicalRDD leaf gives the outer repartition+sort a subtree with no
    * aliases to collapse, so the capture is stable by construction. Must
    * run with AQE already suspended (has its own guard so a direct test
    * call is safe).
    */
  private[pipeline] def stableBoundaryCheckpoint(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    try {
      spark.conf.set(aqeKey, "false")
      df.localCheckpoint(false)
        .repartition(col(key)).sortWithinPartitions(col(key))
        .localCheckpoint(false)
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  /** The checkpoint's captured layout references its own output (and is
    * a real partitioning, not Unknown/single-partition degenerate).
    */
  private def layoutIsUsable(ck: DataFrame): Boolean =
    ck.queryExecution.analyzed.collectFirst { case l: LogicalRDD =>
      val out = AttributeSet(l.output)
      val partRefs = l.outputPartitioning match {
        // HashPartitioning is an Expression; Unknown/SinglePartition are not
        case e: org.apache.spark.sql.catalyst.expressions.Expression => e.references
        case _ => AttributeSet.empty
      }
      partRefs.nonEmpty && partRefs.subsetOf(out) &&
        l.outputOrdering.forall(_.references.subsetOf(out))
    }.getOrElse(false)
}
