package graft.df

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.SparkTestSession
import graft.functions._

class H3CellIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic point cloud over a wide area, cells at res 5
  private def mkFrame(s: org.apache.spark.sql.SparkSession) =
    s.range(40000).select(
        col("id"),
        (pmod(col("id") * 37, lit(7000)) / 100.0 - 30.0).as("lat"),
        (pmod(col("id") * 101, lit(14000)) / 100.0 - 60.0).as("lng"))
      .withColumn("cell", h3_latlng_to_cell(col("lat"), col("lng"), lit(5)))
      .repartition(4, col("id")) // arbitrary layout, like a real ingest
  private lazy val frame = mkFrame(spark)

  private val aois = Seq( // (minLat, minLng, maxLat, maxLng), varied sizes
    (5.0, 10.0, 12.0, 20.0),
    (-25.0, -55.0, -20.0, -48.0),
    (30.0, 60.0, 39.9, 79.9),
    (0.1, 0.1, 1.1, 1.6),
    (-5.0, -5.0, 5.0, 5.0))

  test("index queries equal naive filters for both semantics over varied AOIs") {
    val idx = H3CellIndex.build(frame, "cell", indexRes = Some(5))
    try {
      for ((a, b, c, d) <- aois) {
        val gotEnv = idx.filterEnvelopeIntersecting(a, b, c, d)
          .select($"id").as[Long].collect().sorted.toSeq
        val refEnv = frame.filter(
            h3_cell_intersects_bbox($"cell", lit(a), lit(b), lit(c), lit(d)))
          .select($"id").as[Long].collect().sorted.toSeq
        assert(gotEnv == refEnv, s"envelope semantics diverged on AOI ($a,$b,$c,$d)")

        val g = h3_cell_to_latlng($"cell")
        val gotCen = idx.filterCentroidsIn(a, b, c, d)
          .select($"id").as[Long].collect().sorted.toSeq
        val refCen = frame.filter(
            g.getField("lat").between(a, c) && g.getField("lng").between(b, d))
          .select($"id").as[Long].collect().sorted.toSeq
        assert(gotCen == refCen, s"centroid semantics diverged on AOI ($a,$b,$c,$d)")
      }
    } finally idx.unpersist()
  }

  test("cached batch-stat pruning: a small AOI reads a fraction of the frame") {
    // small columnar batches -> tight per-batch min/max stats; the range
    // predicate must skip most batches of the cell-sorted cache
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "500")
    // AQE wraps the cache scan in a leaf QueryStage, hiding it from plan
    // collect; this probe has no joins, so run it non-adaptive
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val local = mkFrame(s2)
    val idx = H3CellIndex.build(local, "cell", indexRes = Some(5))
    try {
      val q = idx.filterCentroidsIn(0.1, 0.1, 1.1, 1.6)
      val hits = q.count()
      q.collect() // drive q's own QueryExecution for metric readout
      val scanned = q.queryExecution.executedPlan.collectLeaves().collect {
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          i.metrics("numOutputRows").value
      }.sum
      val total = local.count()
      assert(scanned > 0 && scanned >= hits)
      assert(scanned < total / 4,
        s"batch pruning ineffective: scanned $scanned of $total rows for $hits hits")
    } finally idx.unpersist()
  }
}
