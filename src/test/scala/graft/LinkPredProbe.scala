package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the commonNeighborScores rewrite (r16): OLD shape
  * (degree agg + degree join + adjacency self-join) vs NEW shape (one
  * bounded collect_min_k groupBy + streamed two-level explode), alternated
  * 3x so host drift cannot masquerade as a win, plus a sub-stage
  * decomposition of the new shape. Run manually:
  *   sbt "Test/runMain graft.LinkPredProbe /root/testdata/sf0.1"
  */
object LinkPredProbe {
  def old(edges: DataFrame, src: Column, dst: Column,
      minCommon: Long, maxDegree: Long): DataFrame = {
    val e = graft.util.Barriers.statSafe(
      graft.graph.Triangles.canonicalEdges(edges, src, dst))
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val adj = graft.util.Barriers.statSafe(
      e.select(col("u").as("w"), col("v").as("nb"))
        .unionAll(e.select(col("v").as("w"), col("u").as("nb")))
        .join(deg.select(col("n").as("w"), col("deg")), Seq("w"))
        .filter(col("deg") <= maxDegree)
        .select(col("w"), col("nb"),
          when(col("deg") >= 2,
            floor(lit(1000000.0) / log(col("deg").cast("double")) + 0.5)
              .cast("long")).otherwise(lit(0L)).as("aa_e6")))
    val a = adj.select(col("w"), col("nb").as("u"), col("aa_e6"))
    val b = adj.select(col("w"), col("nb").as("v"))
    val wedges = a.join(b, Seq("w")).filter(col("u") < col("v"))
    wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("aa_e6")).as("adamic_adar_e6"))
      .filter(col("n_common") >= minCommon)
      .join(e, Seq("u", "v"), "left_anti")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // blockGraphEdges replicated (private in GraphQueries): the planted
    // 5-block community graph over events — p101's input
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val hm = pmod(graft.pipeline.TextOps.md5Long(col("event_id").cast("string")), lit(40L))
    val cross = pmod(graft.pipeline.TextOps.md5Long(
      concat(col("event_id").cast("string"), lit("x"))), lit(17L)) === 0
    val edges = ev.select((col("user_id") + 1000L).as("src"),
      (when(cross, ((col("user_id") + 1) % 5) * 40 + hm)
        .otherwise((col("user_id") % 5) * 40 + hm)).as("dst"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[lpprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    // decomposition of the new shape (warm-up pass first)
    val e = graft.util.Barriers.statSafe(
      graft.graph.Triangles.canonicalEdges(edges, col("src"), col("dst")))
    time("e.count")(e.count())
    val nbrs = e.select(col("u").as("w"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("w"), col("u").as("nb")))
    val grouped = nbrs.groupBy(col("w"))
      .agg(graft.functions.collect_min_k(col("nb"), 1001).as("nbs"))
      .filter(size(col("nbs")) >= 2 && size(col("nbs")) <= 1000)
      .select(col("nbs"),
        floor(lit(1000000.0) / log(size(col("nbs")).cast("double")) + 0.5)
          .cast("long").as("aa_e6"))
    time("grouped(min_k)")(grouped.count())
    val groupedCS = nbrs.groupBy(col("w"))
      .agg(sort_array(collect_set(col("nb"))).as("nbs"))
      .filter(size(col("nbs")) >= 2 && size(col("nbs")) <= 1000)
    time("grouped(collect_set)")(groupedCS.count())
    val wedges = grouped
      .select(col("nbs"), col("aa_e6"),
        posexplode(col("nbs")).as(Seq("__i", "u")))
      .select(col("u"),
        explode(slice(col("nbs"), col("__i") + lit(2), size(col("nbs"))))
          .as("v"), col("aa_e6"))
    time("wedges")(wedges.count())
    time("agg(u,v)")(wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common")).count())
    // alternated A/B, full operator
    (1 to 3).foreach { i =>
      time(s"OLD#$i")(old(edges, col("src"), col("dst"), 3L, 1000L).count())
      time(s"NEW#$i")(graft.graph.Triangles.commonNeighborScores(
        edges, col("src"), col("dst"), 3L, 1000L).count())
    }
    spark.stop()
  }
}
