package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Spill evidence for the memory-bounded operators: with the session
  * spill thresholds forced to toy values, the window and sort-merge-join
  * buffers must go EXTERNAL (spill metrics > 0) and still produce
  * byte-identical results to the default in-memory path. This is the
  * 100-TB contract in miniature — a group/partition that outgrows its
  * task's memory is a slowdown, never an OOM. (Shuffle/sort spills
  * proper are governed by core memory-manager conf, not session conf;
  * the per-operator buffer thresholds below are the session-scoped
  * levers Spark provides, and they exercise the same
  * ExternalAppendOnlyUnsafeRowArray spill machinery.) */
class SpillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def spillBytes(plan: SparkPlan): Long = {
    val p = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect { case n => n }
      .flatMap(_.metrics.collect { case (name, m) if name.toLowerCase.contains("spill") => m.value })
      .sum
  }

  test("window and sort-merge join complete under forced buffer spill with exact results") {
    val dir = "/root/testdata/sf0.001"
    def queries(s: org.apache.spark.sql.SparkSession): Seq[DataFrame] = {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"))
      // window: per-source running rank — partitions are whole sources
      // (hundreds of rows), far over the forced 16-row buffer
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val windowed = docs.select(col("doc_id"), col("source"),
        row_number().over(w).as("rk"),
        sum(col("n_chars")).over(w).as("run_chars"))
      // many-to-many sort-merge join on the low-cardinality source key:
      // each buffered group is a whole source, again far over threshold
      val l = docs.select(col("doc_id").as("lid"), col("source"))
      val r = docs.select(col("doc_id").as("rid"), col("source"))
      val joined = l.join(r, "source")
        .groupBy(col("source")).agg(count(lit(1)).as("n_pairs"),
          sum(col("lid") + col("rid")).as("sum_ids"))
      Seq(windowed, joined)
    }

    // default path (in-memory buffers)
    val expect = queries(spark).map(_.collect().map(_.toSeq).toSet)

    // forced-spill path: isolated session, toy thresholds, AQE off so the
    // physical tree is directly walkable for metrics
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
    s2.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "16")
    s2.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "16")
    s2.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "16")
    val got = queries(s2).map { df =>
      val res = df.collect().map(_.toSeq).toSet
      (res, spillBytes(df.queryExecution.executedPlan))
    }

    assert(got(0)._1 == expect(0), "window results diverged under spill")
    assert(got(1)._1 == expect(1), "sort-merge join results diverged under spill")
    assert(got(0)._2 > 0, "window did not report any spill at threshold 16")
    assert(got(1)._2 > 0, "sort-merge join did not report any spill at threshold 16")
  }
}
