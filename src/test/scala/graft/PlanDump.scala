package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans for a representative
  * query set at sf0.01. Run: `Test/runMain graft.PlanDump`. */
object PlanDump {
  val Captured = Seq("q01_lineitem_agg", "h3_02_parent_rollup", "h3_12_latlng_cell",
    "p05_minhash_sigs", "p06_lsh_pairs", "p18_embed_neardup", "p26_chunks",
    "p29_ann_projected", "p33_bm25", "p34_mix_sample",
    "p37_pack_sequences", "p38_decontam", "p41_sessions",
    "p44_corpus_report", "p45_hybrid_search", "p46_lm_score", "p47_domain_tag")

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plan evidence (generated at sf0.01 by PlanDump)\n\n")
    sb.append("""What to look for: `PushedFilters` reaching the parquet scan, pruned
`ReadSchema`, `WholeStageCodegen` spans around H3 expressions, map-side
`partial_` aggregation before each exchange, broadcast joins for small
sides, and (p05) the cheap token-count filter BEFORE the md5 pipeline —
filtering on the hashed array itself re-evaluated the hashing once for
the predicate and once for the projection.

""")
    for (name <- Captured) {
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n```\n\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println(s"[plandump] wrote ${sb.length} chars for ${Captured.length} plans")
    spark.stop()
  }
}
