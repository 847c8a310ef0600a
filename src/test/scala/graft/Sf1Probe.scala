package graft

import org.apache.spark.sql.SparkSession

/** Superlinear-ratio adjudication probe (round-15 verdict item): for each
  * query, noop-sink wall time AND output row count at sf0.1 and at the
  * make_sf1 rehearsal corpus (target/sf1.0, 10-member near-dup groups by
  * construction). The decomposition the count()-protocol rehearsal table
  * cannot give: a wall-time factor well above 10× is fine when the OUTPUT
  * grows that fast (make_sf1's dup groups grow true pair counts
  * quadratically in group size); it is a plan bug only when COMPUTE grows
  * superlinearly at ~constant output shape.
  *
  * Run: `Test/runMain graft.Sf1Probe [query...]` (defaults to the four
  * on-notice queries from VERDICT r14). Emits one JSON line per query.
  */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val picked = if (args.nonEmpty) args.toSeq
      else Seq("p06_lsh_pairs", "p53_audio_meta", "p62_audio_fingerprint_dedup",
        "p71_bigram_lm")
    val base = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeNoop(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.dropLeakedBlocks(spark)
      sec
    }
    def rows(name: String, dir: String): Long = {
      val n = SparkEntry.queries(name)(spark, dir).count()
      Bench.dropLeakedBlocks(spark)
      n
    }
    picked.foreach { n => timeNoop(n, "/root/testdata/sf0.001") } // codegen warm
    picked.foreach { n =>
      val t01 = timeNoop(n, base)
      val t1 = timeNoop(n, sf1)
      val r01 = rows(n, base)
      val r1 = rows(n, sf1)
      println(f"""{"query":"$n","sec_sf0.1":$t01%.2f,"sec_sf1.0":$t1%.2f,""" +
        f""""factor":${t1 / t01}%.2f,"rows_sf0.1":$r01,"rows_sf1.0":$r1,""" +
        f""""row_factor":${r1.toDouble / math.max(1L, r01)}%.2f}""")
    }
    spark.stop()
  }
}
