package graft
import org.apache.spark.sql.SparkSession
/** Plan-audit aid: for each named query, print planning-vs-execution wall
  * time and the formatted physical plan. Separating the two pins down
  * whether a slow query is Catalyst analysis/codegen of an oversized
  * expression tree or genuine executor work — the two need opposite fixes.
  * Usage: runMain graft.PlanProbe <sfDir> <query> [query...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args.drop(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_PLAN_CONF=k=v,k=v — session conf overrides, so a conf-gated
    // optimization's before/after plans can both be captured from one build
    sys.env.get("GRAFT_PLAN_CONF").foreach(_.split(",").map(_.trim)
      .filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"GRAFT_PLAN_CONF: bad conf pair (need k=v): $kv")
        }
      })
    names.foreach { name =>
      // build_ms matters: iterative graph queries (PageRank/LPA/k-core)
      // run their checkpointed rounds EAGERLY inside the constructor, so
      // plan_ms/exec_ms alone would claim a multi-second query is free
      val tb = System.nanoTime
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime
      df.queryExecution.executedPlan // forces analysis + optimization + physical planning
      val t1 = System.nanoTime
      val n = df.count()
      val t2 = System.nanoTime
      println(f"[planprobe] $name build_ms=${(t0 - tb) / 1e6}%.1f plan_ms=${(t1 - t0) / 1e6}%.1f exec_ms=${(t2 - t1) / 1e6}%.1f rows=$n")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
