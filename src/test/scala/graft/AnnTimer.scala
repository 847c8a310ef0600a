package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B timer for the ANN query family (planning-cost experiments).
  * Run: `Test/runMain graft.AnnTimer`. */
object AnnTimer {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("p29_ann_projected", "p12_ann_lsh_bucketed", "p19_embed_neardup_lsh",
      "p20_ann_ivf", "p08_ann_cosine")
    // warm codegen on the small SF
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    (1 to 2).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"[annTimer] round$round $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
