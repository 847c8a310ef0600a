package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Residual decomposition for p116_sssp_paths (round-16 verdict item): the
  * catalog's heaviest query. The fixture topology is SF-INDEPENDENT (a
  * 120-node express chain whose events scan prunes to event_id < 120), so
  * the residual is round-barrier scheduling + the walk-law joins, not
  * relaxation volume. The probe sweeps hopsPerRound {4, 8, 16} at a given
  * sf dir and splits each wall into:
  *   - sum_job_wall: time INSIDE Spark jobs (submission -> completion) —
  *     the actual compute + shuffle,
  *   - gap = wall - sum_job_wall: driver-side time BETWEEN jobs (plan
  *     analysis/optimization, barrier bookkeeping) — the per-round
  *     scheduling floor deep hops exist to amortize,
  *   - sum_task_s: total executor task time (the work a cluster would
  *     parallelize further — on 32 local cores it is the compute axis).
  *
  * Run: `Test/runMain graft.P116Probe [sfDir]` (default target/sf1.0).
  */
object P116Probe {
  private final class JobMeter extends SparkListener {
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]
    override def onJobStart(js: SparkListenerJobStart): Unit =
      starts.put(js.jobId, js.time)
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val s = starts.remove(je.jobId)
      if (s != null) { jobWallMs.addAndGet(je.time - s); nJobs.incrementAndGet(); () }
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null) taskMs.addAndGet(te.taskInfo.duration); ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = GraphQueries.p116WithHops _

    def timed(hops: Int): (Double, Int, Double, Double) = {
      Bench.dropLeakedBlocks(spark)
      val meter = new JobMeter
      spark.sparkContext.addSparkListener(meter)
      val t0 = System.nanoTime()
      val n = q(spark, sfDir, hops).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(meter)
      require(n > 0, "p116 returned no rows")
      (wall, meter.nJobs.get, meter.jobWallMs.get / 1e3, meter.taskMs.get / 1e3)
    }

    // codegen/JIT warm pass, then median-of-3 per hops setting
    timed(8)
    println(f"[p116Probe] sfDir=$sfDir  (wall = gap + sum_job_wall; gap = driver/barrier floor)")
    for (hops <- Seq(4, 8, 16)) {
      val runs = Seq.fill(3)(timed(hops))
      val (wall, jobs, jobWall, taskS) = runs.sortBy(_._1).apply(1)
      println(f"[p116Probe] hops=$hops%2d wall=$wall%6.2f s jobs=$jobs%3d " +
        f"sum_job_wall=$jobWall%6.2f s gap=${wall - jobWall}%6.2f s sum_task=$taskS%7.2f s")
    }
    spark.stop()
  }
}
