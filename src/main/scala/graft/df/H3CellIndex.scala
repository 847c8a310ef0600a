package graft.df

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.H3ParentRangeDerivation
import graft.functions.{h3_cell_intersects_bbox, h3_cell_to_latlng}
import graft.h3.H3Polygon

/**
 * Build-once cell index for REPEATED spatial queries against one frame —
 * the Spark-native answer to the reference's per-frame
 * kdtree/rtree/packed-Hilbert-rtree (h3ron-polars/src/spatial_index/
 * kdtree.rs:62-103, rtree.rs:34-92, packed_hilbert_rtree.rs:42-92).
 * SURVEY §2.6 maps the index *semantics* to two-stage predicates (built
 * and oracle-tested); this artifact adds the build-once value for the
 * many-AOIs-one-frame workload the reference's indexes exist for.
 *
 * Design (no custom physical operator needed — Spark's cache already IS a
 * min/max index when the data is laid out for it):
 *  - build: `sortWithinPartitions(cell)` (no shuffle) + `persist`. H3's
 *    bit layout makes every parent's descendant set a computable id range
 *    (the packed-Hilbert-layout analogue), so sorting by raw cell id
 *    clusters space.
 *  - query: an AOI becomes a coarse polyfill cover (driver-side, a
 *    handful of cells) expanded to descendant id ranges
 *    ([[H3ParentRangeDerivation.childRange]] — the same derivation the
 *    parquet-pruning rule uses), ANDed with the exact predicate. The
 *    range comparisons are plain longs: whole-stage codegen'd, and the
 *    cached `InMemoryTableScan` skips every columnar batch whose cell
 *    min/max misses the ranges (batch-stat pruning) — each repeated query
 *    reads O(hit batches), not the frame.
 *
 * Two query semantics, matching the reference's two index kinds:
 * [[filterEnvelopeIntersecting]] (rtree: cell envelope vs query envelope)
 * and [[filterCentroidsIn]] (kdtree: centroid containment).
 */
final class H3CellIndex private (val indexed: DataFrame, cellCol: String,
    indexRes: Option[Int]) {

  private def cell: Column = col(cellCol)

  /** Descendant id ranges covering `wkt`'s intersecting cells at
    * `coverRes`, as a pushable long-range disjunction. With a known
    * single-resolution index the per-cover disjunction collapses to one
    * range per cover cell. */
  private def rangePredicate(wkt: String, coverRes: Int): Column = {
    require(indexRes.forall(_ >= coverRes),
      s"indexRes ${indexRes.get} is coarser than coverRes $coverRes — " +
        "cover cells could never contain the indexed cells")
    val cover = H3Polygon.polygonToCellsIntersecting(wkt, coverRes)
    require(cover.nonEmpty, "AOI cover is empty — lower coverRes")
    val resRange = indexRes.map(r => r to r).getOrElse(coverRes to 15)
    val ranges = cover.toSeq.flatMap { p =>
      resRange.filter(_ >= coverRes).map(bigR =>
        H3ParentRangeDerivation.childRange(p, coverRes, bigR))
    }
    ranges.map { case (lo, hi) => cell >= lo && cell <= hi }.reduce(_ || _)
  }

  private def envelopeWkt(minLat: Double, minLng: Double,
      maxLat: Double, maxLng: Double): String =
    s"POLYGON (($minLng $minLat, $maxLng $minLat, $maxLng $maxLat, " +
      s"$minLng $maxLat, $minLng $minLat))"

  /** Rtree semantics (X4): rows whose cell ENVELOPE intersects the query
    * envelope. `coverRes` sizes the coarse cover (coarser = fewer ranges,
    * looser pruning). The cover is grown by one ring via the intersecting
    * polyfill, which already includes boundary-overlapping cells — cells
    * whose envelope pokes into the AOI from a neighboring cover cell are
    * caught by the exact predicate running over the padded range set. */
  def filterEnvelopeIntersecting(minLat: Double, minLng: Double,
      maxLat: Double, maxLng: Double, coverRes: Int = 2,
      padDeg: Double = 2.0): DataFrame = {
    // pad the coarse cover so envelope-overlap from just outside the AOI
    // stays inside the candidate ranges (cell envelopes at the indexed
    // res are far smaller than a degree; padDeg bounds the slack)
    val w = envelopeWkt(math.max(-90, minLat - padDeg), math.max(-180, minLng - padDeg),
      math.min(90, maxLat + padDeg), math.min(180, maxLng + padDeg))
    indexed.filter(rangePredicate(w, coverRes) &&
      h3_cell_intersects_bbox(cell, lit(minLat), lit(minLng), lit(maxLat), lit(maxLng)))
  }

  /** Kdtree semantics (X5-adjacent): rows whose cell CENTROID lies in the
    * query envelope. The cover is padded like the rtree path: H3 children
    * drift outside their ancestors (cumulative child-overhang), so a fine
    * cell's centroid can sit in the AOI while its coarse ancestor only
    * grazes it — padding keeps the candidate ranges a superset and the
    * exact predicate decides. */
  def filterCentroidsIn(minLat: Double, minLng: Double,
      maxLat: Double, maxLng: Double, coverRes: Int = 2,
      padDeg: Double = 2.0): DataFrame = {
    val w = envelopeWkt(math.max(-90, minLat - padDeg), math.max(-180, minLng - padDeg),
      math.min(90, maxLat + padDeg), math.min(180, maxLng + padDeg))
    val g = h3_cell_to_latlng(cell)
    indexed.filter(rangePredicate(w, coverRes) &&
      g.getField("lat").between(minLat, maxLat) &&
      g.getField("lng").between(minLng, maxLng))
  }

  /** Drop the cached build. */
  def unpersist(): Unit = indexed.unpersist()
}

object H3CellIndex {
  /** Build the index: cluster rows by cell id within partitions (no
    * shuffle) and cache. Pass `indexRes` when every cell is at one known
    * resolution — query predicates then carry one range per cover cell
    * instead of a per-resolution disjunction. */
  def build(df: DataFrame, cellCol: String, indexRes: Option[Int] = None): H3CellIndex = {
    val indexed = df.sortWithinPartitions(col(cellCol)).persist()
    new H3CellIndex(indexed, cellCol, indexRes)
  }
}
