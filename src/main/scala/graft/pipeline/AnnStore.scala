package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persistent IVF-partitioned ANN store (engine extension): the corpus is
 * written as parquet PARTITIONED BY its nearest-centroid assignment, so a
 * probe query physically reads only its `nprobe` inverted lists.
 *
 * This is the storage half of the IVF design ([[Similarity.ivfAssign]]'s
 * scaladoc): at 100 TB the partition layout IS the index. Probing joins
 * the store on the partition column against a broadcast probe list —
 * Spark's dynamic partition pruning turns that into a physical skip of
 * every non-probed partition directory (visible in the plan as a
 * `dynamicpruning` PartitionFilter), so IO scales with nprobe/m of the
 * corpus, not the corpus.
 */
object AnnStore {

  /** Materialize the store: one partition directory per centroid. The
    * embedding rides as `array<double>`; `centroids` is the quantizer
    * (seed [[Similarity.ivfCentroids]] or trained
    * [[Similarity.kMeansCentroids]]). */
  def write(df: DataFrame, id: Column, vec: Column, centroids: DataFrame,
      path: String): Unit =
    Similarity.ivfAssign(df, id, vec, centroids, nprobe = 1)
      .write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** Incremental batch ingest: assign against the SAME quantizer the
    * store was written with (caller contract — a drifted quantizer would
    * split a list across directories) and append into the existing
    * partition layout. Plain parquet append: new files land inside the
    * matching `centroid_id=` directories, invisible to readers until the
    * write commits each file. */
  def appendBatch(df: DataFrame, id: Column, vec: Column, centroids: DataFrame,
      path: String): Unit =
    Similarity.ivfAssign(df, id, vec, centroids, nprobe = 1)
      .write.partitionBy("centroid_id").mode("append").parquet(path)

  /** Streaming ingest — the arrival path of the store: every micro-batch
    * is centroid-assigned by [[Similarity.ivfAssignProjection]] (a pure
    * per-row projection — bit-identical to the batch assignment, and
    * legal mid-stream where the aggregate form is not) and appended into
    * the partition layout via `foreachBatch`. Plain-parquet append keeps
    * the store readable by the same `spark.read.parquet` path as the
    * batch writer (a file-sink `_spark_metadata` log would hide
    * batch-written files); the trade is at-least-once on micro-batch
    * retry, the standard foreachBatch contract. Caller starts/stops the
    * returned writer. */
  def streamIngest(stream: DataFrame, id: Column, vec: Column,
      centroids: DataFrame, path: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val quantizer = Similarity.collectCentroids(centroids)
    stream.select(id.as("__id"), vec.as("__v"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfAssignProjection(batch, col("__id"), col("__v"), quantizer)
          .write.partitionBy("centroid_id").mode("append").parquet(path)
      }
      .outputMode("append")
  }

  /** Compaction — completes the at-least-once ingest contract: a retried
    * [[appendBatch]]/[[streamIngest]] micro-batch can leave duplicate
    * `vec_id` rows inside a partition directory forever. Rewrites the
    * store keeping ONE row per `vec_id` (min on the raw embedding bytes
    * as a deterministic tiebreak — retried rows are byte-identical, so
    * this is a no-op tiebreak in practice) and coalescing each partition's
    * accumulated small append files.
    *
    * Scale shape: dedup is a partition-local window — `centroid_id` is in
    * the grouping key, so rows never cross inverted lists and the shuffle
    * is bounded by the largest single list, not the store. The rewrite
    * goes to a temp path first, then swaps: readers never observe a
    * half-compacted store through the normal read path.
    *
    * SINGLE-WRITER CONTRACT: the swap is two renames (store→old,
    * tmp→store), not one atomic commit — filesystem rename atomicity only
    * covers each hop. Between the renames the store path briefly does not
    * exist: a reader listing at exactly that instant fails fast (no
    * torn/partial data is ever visible — each hop moves a complete tree),
    * and a concurrent writer could recreate the path and be clobbered.
    * Run compact from ONE coordinator with ingest quiesced — the same
    * discipline every rewrite-in-place table maintenance job (e.g.
    * filesystem-table compaction generally) requires. If the process dies
    * between the renames, recovery is mechanical and lossless: the
    * complete pre-compact store is at `<path>.compact-old` (rename it
    * back) and the complete compacted copy at `<path>.compact-tmp`;
    * a subsequent compact() also clears both staging paths up front. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    val store = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.delete(tmp, true); fs.delete(old, true)
    val w = Window.partitionBy(col("centroid_id"), col("vec_id"))
      .orderBy(col("embedding"))
    spark.read.parquet(path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .write.partitionBy("centroid_id").mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(store, old)) sys.error(s"compact: cannot stage $path aside")
    if (!fs.rename(tmp, store)) { // restore on failure, then fail loudly
      fs.rename(old, store)
      sys.error(s"compact: swap failed for $path; original restored")
    }
    fs.delete(old, true)
  }

  /** Approximate top-k against a written store: each query probes its
    * `nprobe` nearest centroids' partitions only; candidates are ranked
    * by exact cosine. Same output contract (query_id, neighbor_id, sim,
    * rank) and identical results to the in-memory
    * [[Similarity.ivfCosineTopKWith]] over the same quantizer. */
  def query(spark: SparkSession, path: String, centroids: DataFrame,
      queries: DataFrame, queryId: Column, queryVec: Column,
      nprobe: Int, k: Int): DataFrame = {
    val corpus = spark.read.parquet(path)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .withColumn("__cn", Similarity.l2Norm(col("__cv")))
    val probes = Similarity.ivfAssign(queries, queryId, queryVec, centroids, nprobe = nprobe)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("embedding", "__qv")
      .withColumn("__qn", Similarity.l2Norm(col("__qv")))
    val scored = corpus.join(broadcast(probes), "centroid_id")
      .withColumn("sim", Similarity.quantize4(
        Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("__rank").cast("long").as("rank"))
  }
}
