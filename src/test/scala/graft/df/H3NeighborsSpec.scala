package graft.df

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.SparkTestSession
import graft.functions._
import graft.h3.{H3Geo, H3Traversal}
import graft.df.H3DataFrameOps._

/** Specs for the named neighbor-window operator, mirroring the reference
  * iterator tests (h3ron/src/iter/neighbor.rs:154-231:
  * test_neighbors_within_distance_window and
  * ..._or_default). */
class H3NeighborsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the reference fixture: cell at (lng 12.3, lat 45.4) res 6
  private val center = H3Geo.latLngToCell(45.4, 12.3, 6)

  test("window 1..1 over a fully-valued disk yields the 6 direct neighbors") {
    // reference: values = grid_disk(2) all -> 6; expect 6 neighbor rows,
    // each anchored at the center, none the center itself, all in the map
    val disk2 = H3Traversal.gridDisk(center, 2)
    val df = disk2.toSeq.toDF("cell").withColumn("value", lit(6))
    val got = df.h3NeighborsWithValues("cell", "value", kMin = 1, kMax = 1)
      .filter(col("cell") === center)
      .collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getLong(0) == center && r.getInt(1) == 6)
      assert(r.getLong(2) != center && disk2.contains(r.getLong(2)))
      assert(r.getInt(3) == 6 && r.getInt(4) == 1)
    }
    assert(got.map(_.getLong(2)).sorted.toSeq ==
      H3Traversal.gridRing(center, 1).toSeq)
  }

  test("default value fills unknown neighbors; no default skips them") {
    // reference: map has ONLY the center (4); default 6 -> 6 rows valued 6
    val df = Seq((center, 4)).toDF("cell", "value")
    val withDefault = df.h3NeighborsWithValues("cell", "value", 1, 1,
        defaultValue = Some(lit(6)))
      .collect()
    assert(withDefault.length == 6)
    withDefault.foreach { r =>
      assert(r.getLong(0) == center && r.getInt(1) == 4 && r.getInt(3) == 6)
    }
    // the no-default wrapper (neighbors_within_distance_window) skips them
    assert(df.h3NeighborsWithValues("cell", "value", 1, 1).isEmpty)
    // reference ..._or_default_empty: an empty frame yields no rows even
    // with a default value configured
    val empty = Seq.empty[(Long, Int)].toDF("cell", "value")
    assert(empty.h3NeighborsWithValues("cell", "value", 1, 1, Some(lit(6))).isEmpty)
  }

  test("kMin = 0 includes the center itself; null-valued cells are not centers") {
    val ring1 = H3Traversal.gridRing(center, 1)
    val df = Seq((center, Some(4)), (ring1(0), Some(7)), (ring1(1), None))
      .toDF("cell", "value")
    val got = df.h3NeighborsWithValues("cell", "value", 0, 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getInt(4)))
    // centers: center and ring1(0) (ring1(1) has no value);
    // center's window: itself (k=0, 4) + ring1(0) (k=1, 7)
    val fromCenter = got.filter(_._1 == center).sortBy(_._4)
    assert(fromCenter.toSeq == Seq((center, center, 4, 0), (center, ring1(0), 7, 1)))
    // ring1(0)'s window: itself + center (mutual neighbors)
    val fromNbr = got.filter(_._1 == ring1(0))
    assert(fromNbr.toSet == Set((ring1(0), ring1(0), 7, 0), (ring1(0), center, 4, 1)))
    assert(!got.exists(_._1 == ring1(1)), "null-valued cell must not be a center")
  }

  test("h3_grid_ring_spiral is the spiral disk's ring-k segment") {
    val df = Seq(center).toDF("cell")
    val got = df.select(
        h3_grid_ring_spiral($"cell", lit(2)).as("ring"),
        h3_grid_disk_spiral_distances($"cell", lit(2)).as("spd"),
        h3_grid_ring($"cell", lit(2)).as("sorted_ring"))
      .collect().head
    val ring = got.getSeq[Long](0)
    val spd = got.getSeq[org.apache.spark.sql.Row](1)
      .filter(_.getInt(1) == 2).map(_.getLong(0))
    assert(ring == spd, "ring order must be the disk walk's k=2 segment")
    assert(ring.sorted == got.getSeq[Long](2).sorted)
    assert(ring.length == 12)
  }

  test("k window 1..2 emits the exact per-k ring membership") {
    val disk2 = H3Traversal.gridDisk(center, 2)
    val df = disk2.toSeq.toDF("cell").withColumn("value", col("cell") % 97)
    val got = df.h3NeighborsWithValues("cell", "value", 1, 2)
      .filter(col("cell") === center)
      .collect().map(r => (r.getLong(2), r.getInt(4)))
    assert(got.count(_._2 == 1) == 6 && got.count(_._2 == 2) == 12)
    assert(got.filter(_._2 == 2).map(_._1).sorted.toSeq ==
      H3Traversal.gridRing(center, 2).toSeq)
    // neighbor values come from the lookup, not the center
    got.foreach { case (n, _) =>
      val v = df.filter(col("cell") === n).select(col("value")).as[Long].head()
      assert(v == n % 97)
    }
  }
}
