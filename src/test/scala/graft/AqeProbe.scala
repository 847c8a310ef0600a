package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B probe: run selected catalog queries under the default
  * session (col A) vs a shims.cloneSessionWithConf clone with the
  * GRAFT_PROBE_CONF overrides applied (col B, "k=v,k=v"; default
  * spark.sql.adaptive.enabled=false), after a warm pass at sf0.001 under
  * both sessions. Runs INTERLEAVE (A,B,A,B,...) so host drift hits both
  * columns equally; medians of 3. First finding (kept for the record):
  * AQE-off is 2-5.6x SLOWER on the iterative tiny-regime loops — the
  * runtime broadcasts AQE provides beat the per-stage job overhead it
  * costs. Run: Test/runMain graft.AqeProbe <sfDir> [query...]
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("p114_sssp_iterative", "p116_sssp_paths", "p97_kcore",
        "p98_graph_features", "p93_lpa_communities", "p96_random_walks")
    val confB = sys.env.getOrElse("GRAFT_PROBE_CONF", "spark.sql.adaptive.enabled=false")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (k, v)
          case _ => sys.error(s"GRAFT_PROBE_CONF: bad conf pair (need k=v): $kv")
        }
      }.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val b = org.apache.spark.sql.graft.shims.cloneSessionWithConf(spark, confB: _*)

    def run(s: SparkSession, name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.dropLeakedBlocks(spark)
      sec
    }
    names.foreach { n =>
      try { run(spark, n, "/root/testdata/sf0.001"); run(b, n, "/root/testdata/sf0.001") }
      catch { case e: Throwable => println(s"[aqeprobe] warm $n FAILED: $e") }
    }
    println(s"[aqeprobe] B conf: ${confB.map(p => p._1 + "=" + p._2).mkString(",")}")
    names.foreach { n =>
      val runs = (1 to 3).map(_ => (run(spark, n, sfDir), run(b, n, sfDir)))
      val aT = runs.map(_._1).sorted.apply(1)
      val bT = runs.map(_._2).sorted.apply(1)
      println(f"[aqeprobe] $n%-24s A=$aT%6.2f s  B=$bT%6.2f s  B/A=${bT / aT}%5.2f" +
        s"  (A runs ${runs.map(r => f"${r._1}%.2f").mkString(",")}; B runs ${runs.map(r => f"${r._2}%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
