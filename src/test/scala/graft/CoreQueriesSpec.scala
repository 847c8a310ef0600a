package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/**
 * Pins the decimal-aggregation contract of the q-family revenue sums:
 * a 2-dp price times a 2-dp discount complement is an exact 4-dp
 * decimal, the double product is within recovery distance of it, and
 * the decimal sum is independent of partitioning/addition order. The
 * double sum is NOT — at sf1.0 a ~4.5e10 group sum flipped its last
 * cent between engines (and would between runs), which is why
 * SparkEntry.discPrice casts to decimal(18,4) before aggregating.
 */
class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // adversarial 2-dp prices: values whose doubles sit just under/over the
  // decimal, plus magnitudes spanning 1e0..1e5 so the sum's low bits are
  // genuinely below double precision at the rounding boundary
  private def rows(n: Int): Seq[(Double, Double)] =
    (1 to n).map { i =>
      val price = math.floor((i * 9973 % 10000000) * 1.01) / 100.0 + 0.07
      val disc = (i * 7 % 11) / 100.0
      (price, disc)
    }

  test("decimal revenue sum is identical across partitionings") {
    val data = rows(20000)
    val sums = Seq(1, 3, 32, 200).map { parts =>
      val df = spark.createDataset(data).toDF("l_extendedprice", "l_discount")
        .repartition(parts)
      df.agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("s"))
        .head().getDecimal(0)
    }
    assert(sums.distinct.size === 1,
      s"decimal sum must be order-independent, got $sums")
  }

  test("single product cast equals operand-wise decimal multiply") {
    // the cheap form (one cast of the double product) must recover the
    // same exact 4-dp decimal as the fully-decimal multiply on every row
    val df = spark.createDataset(rows(20000)).toDF("l_extendedprice", "l_discount")
    val mismatches = df.select(
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)").as("cheap"),
        (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount")).cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("exact"))
      .filter(col("cheap") =!= col("exact"))
      .count()
    assert(mismatches === 0)
  }
}
