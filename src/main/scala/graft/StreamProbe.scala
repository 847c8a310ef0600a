package graft
import org.apache.spark.sql.SparkSession

/** Decomposition probe for the streaming gates (s01-s05): times each query
  * function end-to-end (the streaming run happens INSIDE the function — the
  * returned frame is just the memory-sink snapshot sort) and, with
  * `graft.stream.probe=true`, runToSnapshot prints every micro-batch's
  * ProgressReport so the wall splits into queryPlanning / getBatch /
  * addBatch / walCommit / stateOperators commit. Guide §1: decide whether
  * the cost is state machinery, per-batch planning, or the harness itself
  * before touching anything.
  * Usage: runMain graft.StreamProbe <sfDir> [query...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val picked = if (args.length > 1) args.drop(1).toSet
      else StreamingQueries.queries.keySet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.stream.probe", sys.env.getOrElse("GRAFT_STREAM_PROBE_JSON", "true"))
      .config("graft.stream.statePartitions",
        sys.env.getOrElse("GRAFT_STREAM_PARTS", "auto"))
      .config("graft.stream.noDataBatches",
        sys.env.getOrElse("GRAFT_STREAM_NODATA", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamingQueries.queries.toSeq.sortBy(_._1)
      .filter(q => picked.contains(q._1)).foreach { case (name, fn) =>
        (1 to 2).foreach { pass => // pass 1 pays codegen warm-up
          val t0 = System.nanoTime
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime
          val n = df.count()
          val t2 = System.nanoTime
          println(f"[streamprobe] $name pass=$pass build_s=${(t1 - t0) / 1e9}%.2f snapshot_s=${(t2 - t1) / 1e9}%.2f rows=$n")
        }
      }
    spark.stop()
  }
}
