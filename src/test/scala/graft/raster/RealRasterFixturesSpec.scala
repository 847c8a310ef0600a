package graft.raster

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/**
 * Conformance against the reference's REAL GDAL-produced rasters
 * (the .tif/.tiff files under `/root/reference/data`) — files our writer
 * never produced, so
 * shared encode/decode bugs cannot hide (every other GeoTiffSpec case
 * round-trips this repo's own writer). Ground truth for every pinned
 * pixel number below was computed by an INDEPENDENT pure-Python TIFF+LZW
 * decoder over the same bytes, not by the reader under test.
 *
 * Reference usage of these files: the raster bench reads r.tiff band 1
 * with nodata Some(0) (h3ron-ndarray/benches/convert_dataset_r.rs:9-33);
 * the resolution test pins r.tiff's geotransform to MinDiff res 10 /
 * SmallerThanPixel res 11 (h3ron-ndarray/src/resolution.rs:95-123); the
 * documented `gdalinfo data/r.tiff` output pins size 2000x2000, origin
 * (8.11377, 49.40792), pixel size (0.001196505, -0.001215135)
 * (h3ron-ndarray/src/transform.rs:136-160).
 */
class RealRasterFixturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dataDir = "/root/reference/data"
  private def fixture(name: String): String = {
    val p = s"$dataDir/$name"
    assume(new java.io.File(p).isFile, s"reference fixture $p not present")
    p
  }

  /** (pixel count, integer value sum, distinct values) over a tile frame —
    * the invariants the independent decoder pinned. */
  private def pixelStats(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = df
      .select(explode(col("values")).as("v"))
      .agg(count(lit(1)), sum(col("v").cast("long")), countDistinct(col("v")))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("r.tiff: metadata matches the reference's documented gdalinfo output") {
    val path = fixture("r.tiff")
    val (t, nodata, w, h) = GeoTiff.readGeoTiffMeta(path)
    assert((w, h) == (2000, 2000))
    assert(nodata.contains(0.0))
    assert(GeoTiff.readGeoTiffBandCount(path) == 1)
    // exact coefficients from resolution.rs:98-105 (rasterio ordering)
    val expect = H3Raster.Transform.fromRasterio(Seq(
      0.0011965049999999992, 0.0, 8.11377, 0.0, -0.001215135, 49.40792))
    assert(t.toArray.toSeq == expect.toArray.toSeq)
    // the reference's own pinned expectations for this transform
    // (resolution.rs:106-122: MinDiff -> 10, SmallerThanPixel -> 11)
    assert(H3Raster.nearestH3Resolution(t, 2000, 2000, smallerThanPixel = false) == 10)
    assert(H3Raster.nearestH3Resolution(t, 2000, 2000, smallerThanPixel = true) == 11)
    // the shape-free heuristic agrees on this small mid-latitude raster
    assert(H3Raster.nearestH3Resolution(t) == 10)
    assert(H3Raster.nearestH3Resolution(t, smallerThanPixel = true) == 11)
  }

  test("r.tiff: LZW strip decode matches the independent decoder exactly") {
    val df = GeoTiff.readGeoTiff(spark, fixture("r.tiff"))
    // 500 strips of 4 rows (RowsPerStrip=4)
    assert(df.count() == 500)
    // binary urban-footprint mask: 3,637,056 zeros + 362,944 ones
    val (n, s, d) = pixelStats(df)
    assert(n == 2000L * 2000L)
    assert(s == 362944L)
    assert(d == 2L)
    // nodata=0 prunes all-zero strips before any per-pixel work
    val kept = df.filter(col("has_data")).count()
    assert(kept < 500 && kept > 0, s"has_data kept $kept of 500 strips")
  }

  test("r.tiff: rasterToCells at res 8 yields only the data value group (pinned)") {
    val cells = H3Raster.rasterToCells(
      GeoTiff.readGeoTiff(spark, fixture("r.tiff")), res = 8)
    val groups = cells.groupBy(col("value")).count().collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toMap
    // nodata 0 pruned -> only the value-1 group survives, as in the
    // reference bench's to_h3 over Some(0_u8) (convert_dataset_r.rs:24)
    assert(groups.keySet == Set(1.0), s"groups: $groups")
    assert(groups(1.0) == 6227L)
  }

  test("europe-and-north-africa.tif: 3-band uncompressed RGB decodes per band (pinned)") {
    val path = fixture("europe-and-north-africa.tif")
    val (t, nodata, w, h) = GeoTiff.readGeoTiffMeta(path)
    assert((w, h) == (327, 284))
    assert(nodata.isEmpty)
    assert(GeoTiff.readGeoTiffBandCount(path) == 3)
    // ModelTiepoint (-40.078125, 75.234375), ModelPixelScale 0.3515625
    val arr = t.toArray
    assert(arr(2) == -40.078125 && arr(5) == 75.234375)
    assert(arr(0) == 0.3515625 && arr(4) == -0.3515625)
    // per-band integer sums from the independent decoder
    val sums = (1 to 3).map { b =>
      val (n, s, _) = pixelStats(GeoTiff.readGeoTiff(spark, path, band = b))
      assert(n == 327L * 284L, s"band $b pixel count")
      s
    }
    assert(sums == Seq(6203756L, 6069589L, 5885773L))
    intercept[java.io.IOException] { GeoTiff.readGeoTiff(spark, path, band = 4) }
    intercept[java.io.IOException] { GeoTiff.readGeoTiff(spark, path, band = 0) }
  }

  test("land_shallow_topo_1024.tif: 3-band LZW RGB decodes per band (pinned)") {
    val path = fixture("land_shallow_topo_1024.tif")
    val (t, nodata, w, h) = GeoTiff.readGeoTiffMeta(path)
    assert((w, h) == (1024, 512))
    assert(nodata.isEmpty)
    assert(GeoTiff.readGeoTiffBandCount(path) == 3)
    // whole-globe raster: origin (-180, 90), 0.3515625 deg pixels
    val arr = t.toArray
    assert(arr(2) == -180.0 && arr(5) == 90.0)
    assert(arr(0) == 0.3515625 && arr(4) == -0.3515625)
    val sums = (1 to 3).map { b =>
      val (n, s, _) = pixelStats(GeoTiff.readGeoTiff(spark, path, band = b))
      assert(n == 1024L * 512L, s"band $b pixel count")
      s
    }
    assert(sums == Seq(26144177L, 26352174L, 34559102L))
  }

  test("land_shallow_topo_1024.tif: whole-globe band 1 converts to cells, poles included (pinned)") {
    val path = fixture("land_shallow_topo_1024.tif")
    val (t, _, _, _) = GeoTiff.readGeoTiffMeta(path)
    // a whole-globe raster must be judged by its full-bbox spherical
    // area, not one polar origin pixel (shape-aware reference algorithm)
    // MinDiff on the exact center-cell area (1315 km^2 at res 4) vs the
    // bbox-derived pixel area (974 km^2) -> res 4
    val res = H3Raster.nearestH3Resolution(t, 1024, 512, smallerThanPixel = false)
    assert(res == 4)
    val cells = H3Raster.rasterToCells(GeoTiff.readGeoTiff(spark, path, band = 1), res)
      .agg(count(lit(1)), countDistinct(col("cell")), countDistinct(col("value")))
      .head()
    info(s"land_shallow_topo res-$res cells=${cells.getLong(0)} distinctCells=${cells.getLong(1)} distinctValues=${cells.getLong(2)}")
    // every emitted cell is unique (each centroid samples one pixel once),
    // and the whole-globe raster covers the ENTIRE res-4 grid: 288,122 is
    // the total number of res-4 cells that exist — nothing dropped at the
    // poles or the antimeridian
    assert(cells.getLong(0) == cells.getLong(1))
    assert(cells.getLong(0) == 288122L)
    assert(cells.getLong(2) == 256L)
  }
}
