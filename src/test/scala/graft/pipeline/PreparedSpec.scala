package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Plan-level proof of the bucketed co-location story: once two tables
  * are bucketed by the join key, repeated joins and aggregations run with
  * ZERO exchanges — the write-time shuffle is the only one ever paid. */
class PreparedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join and aggregate with zero exchanges, values exact") {
    // isolated session: broadcast off so the join would otherwise shuffle
    // both sides into a sort-merge; AQE left on (the default regime)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // pin the regime: this zero-Exchange proof runs WITH AQE enabled (the
    // production default) — AdaptiveSparkPlanExec must also plan no
    // exchange when clustering is satisfied off the bucketed scan
    assert(s2.conf.get("spark.sql.adaptive.enabled") == "true",
      "bucketing proof is meant to run under AQE (Spark default)")
    val docs = s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val scores = docs.select($"doc_id", length($"text").cast("long").as("score"))
    // a previous JVM's warehouse dir survives while the in-memory catalog
    // does not; saveAsTable's CREATE path then refuses the stale location
    Seq("graft_docs_b", "graft_scores_b").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) rm(loc)
    }
    Prepared.writeBucketed(docs, "graft_docs_b", "doc_id", buckets = 4)
    Prepared.writeBucketed(scores, "graft_scores_b", "doc_id", buckets = 4)

    val joined = s2.table("graft_docs_b")
      .join(s2.table("graft_scores_b"), "doc_id")
      .select($"doc_id", $"score")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSorted
    val want = docs.select($"doc_id", length($"text").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSorted
    assert(got == want)
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(joinPlan.contains("SortMergeJoin") || joinPlan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join operator:\n${joinPlan.take(1200)}")
    assert(!joinPlan.contains("Exchange"),
      s"bucketed join should satisfy clustering from the scan:\n${joinPlan.take(1200)}")

    // aggregation on the bucket key: clustering satisfied off the scan too
    val agg = s2.table("graft_docs_b").groupBy($"doc_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucketed aggregation should not shuffle:\n${aggPlan.take(1200)}")

    // the un-bucketed control DOES exchange under the same conf
    val control = docs.join(scores, "doc_id").select($"doc_id", $"score")
    control.collect()
    assert(control.queryExecution.executedPlan.toString.contains("Exchange"),
      "control join without bucketing was expected to shuffle")
  }

  private implicit class SortedOps(a: Array[(Long, Long)]) {
    def toSorted: Seq[(Long, Long)] = a.toSeq.sortBy(identity)
  }
}
