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

  /** Node/frame rows above which an iterative loop's static frames are
    * worth clustering. Below it the loop's slim evolving side (labels,
    * ranks, frontier — one row per node) fits AQE's runtime broadcast, so
    * the big side already streams without exchanges and clustering would
    * only ADD a build shuffle and cost the rounds their adaptive plans
    * (measured: +40-70% on the sf0.1 graph-feature bench queries, whose
    * graphs are thousands of nodes). Above it the slim side no longer
    * broadcasts and every round starts re-shuffling the big frame — the
    * regime the layout exists for. 1M rows ≈ 16-24 MB of (id, value)
    * pairs, past the 10 MB default broadcast threshold with headroom;
    * same spirit as connectedComponents' driverEdgeLimit bound.
    */
  val ClusterLayoutMinRows = 1000000L

  /** [[ClusterLayoutMinRows]], overridable per session via the
    * `graft.layout.clusterMinRows` conf (0 forces the clustered regime —
    * used by plan-shape specs; a huge value disables it). */
  def clusterMinRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("graft.layout.clusterMinRows", ClusterLayoutMinRows.toString).toLong

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
  def clusteredBy(df: DataFrame, key: String, distinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val names = df.columns.toSeq
    def tag(n: String) = "__ckl_" + n
    val tagged = df.select(names.map(n => col(n).as(tag(n))): _*)
    // `distinct` rides the clustering shuffle for free: dropDuplicates
    // over an input already hash-partitioned by `key` needs no further
    // exchange (equal full rows share the key, hence the partition), so
    // a caller replacing `.distinct().<cluster>` saves the second
    // full-frame shuffle. Skew note: a hot key concentrates its rows in
    // one partition here — but any downstream per-key consumer has that
    // profile anyway; that is what the layout is for.
    def shape(base: DataFrame): DataFrame = {
      val clustered = base.repartition(col(tag(key)))
      val deduped = if (distinct) clustered.dropDuplicates() else clustered
      deduped.sortWithinPartitions(col(tag(key)))
    }
    try {
      spark.conf.set(aqeKey, "false")
      val candidate = shape(tagged).localCheckpoint(false)
      val ck =
        if (layoutIsUsable(candidate)) candidate
        // planning-only candidate abandoned; rebuild over a stable leaf
        else stableBoundaryCheckpoint(tagged, shape)
      ck.select(names.map(n => col(tag(n)).as(n)): _*)
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  /** [[clusteredBy]] for the STATIC frame of an iterative loop: the
    * layout-true checkpoint with its origin statistics DROPPED (the
    * `Barriers.statSafe` contract — an edges/pairs subtree routinely
    * estimates far smaller than it runs, and a tiny estimate makes the
    * static planner broadcast-build the big side of every round's join;
    * with no origin stats the LogicalRDD reports
    * `spark.sql.defaultSizeInBytes`, so only AQE's exact runtime sizes
    * can still elect a broadcast) — plus the unpersist thunk for the
    * checkpoint blocks.
    *
    * The payoff at scale: a loop that joins a static big frame against a
    * slim evolving frame every round (connected components, page rank,
    * SSSP relaxation) stops re-shuffling AND re-sorting the big side per
    * round in the non-broadcast regime — the captured
    * HashPartitioning(key)+ordering satisfies the join's requirement, so
    * each round exchanges only the slim side. One shuffle of the big
    * frame at build replaces O(rounds) of them.
    */
  def statSafeClusteredBy(df: DataFrame, key: String,
      distinct: Boolean = false): (DataFrame, () => Unit) = {
    val clustered = clusteredBy(df, key, distinct)
    val out = org.apache.spark.sql.graft.shims.dropOriginStats(clustered)
    (out, freeThunk(clustered))
  }

  /** Unpersist thunk for the checkpoint blocks under `ck` (which may be a
    * rename projection over the LogicalRDD). Same contract as
    * `Barriers.freeThunk`: call only after every consumer is
    * materialized; unexpected shapes leak rather than misfree.
    */
  private def freeThunk(ck: DataFrame): () => Unit =
    () => try {
      ck.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Stat-safe lazy barrier that KEEPS whatever partitioning/ordering the
    * frame already has — no repartition of its own. For frames whose
    * build is already exchange-free over clustered inputs (a window over
    * a [[statSafeClusteredBy]] frame, an iterative round's co-partitioned
    * join output): a plain `Barriers.statSafe` would discard the layout
    * through its RDD re-wrap, and [[statSafeClusteredBy]] would insert a
    * pointless same-key re-shuffle. Same tag/rename exprId shield and
    * AQE-suspended capture as [[clusteredBy]]; no usability probe — if
    * the child has no layout the capture is Unknown/RoundRobin and
    * downstream simply pays its usual exchanges (graceful degradation,
    * never a wrong plan: an unusable captured layout fails requirement
    * checks and gets an exchange, it is never trusted for co-location).
    *
    * CAVEAT the caller accepts: the frame's build plan is captured with
    * AQE suspended, so THAT query runs non-adaptive when materialized.
    * Meant for slim or already-clustered intermediates whose plans are
    * exchange-free or single-aggregate — not for plans that want AQE's
    * runtime broadcast/skew decisions.
    */
  def statSafeKeepingLayout(df: DataFrame): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val names = df.columns.toSeq
    def tag(n: String) = "__ckl_" + n
    val tagged = df.select(names.map(n => col(n).as(tag(n))): _*)
    val ck =
      try {
        spark.conf.set(aqeKey, "false")
        tagged.localCheckpoint(false)
      } finally spark.conf.set(aqeKey, aqeWas)
    val out = ck.select(names.map(n => col(tag(n)).as(n)): _*)
    (org.apache.spark.sql.graft.shims.dropOriginStats(out), freeThunk(ck))
  }

  /** EAGER layout-keeping round barrier for the clustered regime of an
    * iterative loop — [[statSafeKeepingLayout]] plus the
    * `Barriers.roundBarrier` durability contract: every
    * `Barriers.ReliableEvery`-th round writes a reliable checkpoint that
    * survives executor loss (a localCheckpoint-only chain cannot
    * recompute lost blocks — the CC lesson applied to rank/LPA), other
    * rounds stay on cheap local blocks. Eager so the PREVIOUS
    * generation's blocks can be freed as soon as this returns (a lazy
    * chain pins every generation for the session); returns the frame
    * plus that unpersist thunk (no-op effect on reliable rounds — their
    * data lives in files).
    */
  def roundBarrierKeepingLayout(df: DataFrame, round: Int,
      checkpointDir: Option[String]): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val names = df.columns.toSeq
    def tag(n: String) = "__ckl_" + n
    val tagged = df.select(names.map(n => col(n).as(tag(n))): _*)
    val ck =
      try {
        spark.conf.set(aqeKey, "false")
        checkpointDir match {
          case Some(dir) if round % graft.util.Barriers.ReliableEvery ==
              graft.util.Barriers.ReliableEvery - 1 =>
            graft.util.Barriers.ensureCheckpointDir(spark.sparkContext, dir)
            tagged.checkpoint(true)
          case _ => tagged.localCheckpoint(true)
        }
      } finally spark.conf.set(aqeKey, aqeWas)
    val out = ck.select(names.map(n => col(tag(n)).as(n)): _*)
    (org.apache.spark.sql.graft.shims.dropOriginStats(out), freeThunk(ck))
  }

  /** The double-materialization fallback: an inner lazy checkpoint whose
    * LogicalRDD leaf gives the outer clustering shape (`shape`: the
    * repartition+optional dedup+sort) a subtree with no aliases to
    * collapse, so the capture is stable by construction. Must run with
    * AQE already suspended (has its own guard so a direct test call is
    * safe).
    */
  private[pipeline] def stableBoundaryCheckpoint(df: DataFrame,
      shape: DataFrame => DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    try {
      spark.conf.set(aqeKey, "false")
      shape(df.localCheckpoint(false)).localCheckpoint(false)
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
