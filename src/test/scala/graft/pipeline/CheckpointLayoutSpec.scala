package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** [[CheckpointLayout.clusteredBy]] must yield a checkpoint whose
  * captured HashPartitioning+ordering reference its OWN output on both
  * build paths: the direct capture (no alias collapse in the subtree)
  * and the stable-boundary fallback that guards against Spark's
  * RemoveRedundantAliases exprId staleness (a bare already-long column
  * cast+aliased to its own name — the p77 shape). */
class CheckpointLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def capturedLayout(ck: DataFrame): (Boolean, Boolean) =
    ck.queryExecution.analyzed.collectFirst { case l: LogicalRDD =>
      val out = AttributeSet(l.output)
      val partOk = (l.outputPartitioning match {
        case e: Expression => e.references.nonEmpty && e.references.subsetOf(out)
        case _ => false
      })
      val sortOk = l.outputOrdering.nonEmpty &&
        l.outputOrdering.forall(_.references.subsetOf(out))
      (partOk, sortOk)
    }.getOrElse((false, false))

  private def shuffleFree(ck: DataFrame): Unit = {
    val agg = ck.groupBy(col("k")).agg(sum(col("v")).as("s"))
    agg.collect()
    val fin = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!fin.contains("Exchange hashpartitioning"),
      s"expected the captured layout to satisfy the groupBy in:\n$fin")
  }

  test("direct path: expression-derived key survives the checkpoint") {
    val df = spark.range(200).select((col("id") % 17).as("k"), col("id").as("v"))
    val ck = CheckpointLayout.clusteredBy(df, "k")
    val (partOk, sortOk) = capturedLayout(ck)
    assert(partOk && sortOk, s"layout not captured: part=$partOk sort=$sortOk")
    shuffleFree(ck)
    assert(ck.count() == 200)
  }

  test("stale-alias shape: bare same-name long column still lands the layout") {
    // cast("long") on an already-long column + same-name alias is exactly
    // what RemoveRedundantAliases collapses, leaving fromDataset's
    // verbatim-copied partitioning pointing at dead exprIds. The internal
    // rename shield must keep the capture stable (single materialization,
    // no fallback) and the result must still be layout-true downstream.
    val src = spark.range(300).select(col("id").as("k"), (col("id") * 2).as("v0"))
    val df = src.select(col("k").cast("long").as("k"), col("v0").as("v"))
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
      .select(col("k"), col("v"))
    val ck = CheckpointLayout.clusteredBy(df, "k")
    val (partOk, sortOk) = capturedLayout(ck)
    assert(partOk && sortOk, s"layout not captured: part=$partOk sort=$sortOk")
    shuffleFree(ck)
    assert(ck.count() == 300)
  }

  test("stable-boundary fallback itself is layout-true") {
    // The fallback is expected never to run behind the rename shield, but
    // it is the safety net — pin it directly: even on the alias-collapse
    // shape it must produce a usable captured layout (via its LogicalRDD
    // leaf boundary) and satisfy a downstream clustering for free.
    val df = spark.range(200)
      .select(col("id").cast("long").as("k"), (col("id") % 7).as("v"))
    val ck = CheckpointLayout.stableBoundaryCheckpoint(df, "k")
    val (partOk, sortOk) = capturedLayout(ck)
    assert(partOk && sortOk, s"layout not captured: part=$partOk sort=$sortOk")
    shuffleFree(ck)
    assert(ck.count() == 200)
  }

  test("restores spark.sql.adaptive.enabled and keeps rows intact") {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key, "true")
    val df = spark.range(50).select((col("id") % 5).as("k"), col("id").as("v"))
    val ck = CheckpointLayout.clusteredBy(df, "k")
    assert(spark.conf.get(key, "true") == before)
    assert(ck.agg(sum("v")).as[Long].head() == (0L until 50L).sum)
  }
}
