package graft

import org.apache.spark.sql.SparkSession

/** Generic A/B timer for any `SparkEntry.queries` entry (local iteration
  * aid, not a gate artifact). Each named query is codegen-warmed at
  * sf0.001, then timed for two rounds at `SPARK_GRAFT_SF_DIR`
  * (default sf0.1).
  *
  * Run: `Test/runMain graft.QueryTimer p77_classifier_train [more...]`.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTimer <queryName> [more...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    names.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query: $n")
      SparkEntry.queries(n)(spark, warmDir).count()
    }
    (1 to 2).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, dir).count()
        println(f"[queryTimer] round$round $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
        // outside the timed window, like Bench: leaked localCheckpoint
        // blocks from a previous query otherwise squeeze the next one's
        // execution memory (measured: p07 at sf1.0 10 s clean vs 29 s
        // under three heavy queries' leaked generations)
        Bench.dropLeakedBlocks(spark)
      }
    }
    spark.stop()
  }
}
