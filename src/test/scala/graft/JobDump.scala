package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Throwaway diagnostic: run one query and print every Spark job with its
  * wall time and description — pins down where an iterative loop's job
  * count actually comes from (count barriers vs broadcast builds vs AQE
  * stage materializations). Local iteration aid, not a gate artifact.
  * Run: `Test/runMain graft.JobDump <sfDir> <query>`. */
object JobDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    SparkEntry.queries(name)(spark, sfDir).count()
    Bench.dropLeakedBlocks(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) { lines.add(f"[job] ${je.jobId}%4d ${je.time - s._1}%6d ms  ${s._2}"); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(l)
    lines.forEach(s => println(s))
    println(f"[jobdump] $name wall=$wall%.2f s rows=$n jobs=${lines.size}")
    spark.stop()
  }
}
