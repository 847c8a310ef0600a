package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.raster.{GeoTiff, H3Raster}

/**
 * Driver-contract query for the raster pipeline (SURVEY.md §2.7 R1-R4).
 * The raster is synthesized deterministically (value = (x*7 + y*13) % 5,
 * 0 = nodata) over a fixed geographic window; the oracle pins conversion
 * laws to TRUE: count bounded by window-area / published cell area, nodata
 * never emitted, one value per cell, centroids stay inside the window,
 * value-grouped compaction roundtrips, and R3 picks the expected
 * resolution for the pixel size.
 */
object RasterQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_raster_to_cells" -> ((s, dir) => {
      import s.implicits._
      val width = 64
      val height = 48
      val lngMin = -122.6; val lngMax = -121.8
      val latMin = 37.2; val latMax = 38.0
      val transform = H3Raster.Transform.northUp(
        lngMin, latMax, (lngMax - lngMin) / width, (latMax - latMin) / height)
      val values = Array.tabulate(width * height) { i =>
        val x = i % width; val y = i / width
        ((x * 7 + y * 13) % 5).toDouble
      }
      val tiles = H3Raster.tileRaster(s, width, height, transform, values, nodata = 0.0, tile = 16)
      val cells = H3Raster.rasterToCells(tiles, res = 7).cache()

      val n = cells.count()
      val published7 = 5.1612932
      val windowAreaKm2 = {
        val r = graft.h3.H3Geo.EarthRadiusKm
        val dLng = math.toRadians(lngMax - lngMin)
        (math.sin(math.toRadians(latMax)) - math.sin(math.toRadians(latMin))) * dLng * r * r
      }
      // nodata kills 1/5 of pixels; cells under those pixels are dropped
      val expect = windowAreaKm2 / published7 * 0.8
      val stats = cells.agg(
        bool_and(col("value").between(1.0, 4.0)).as("values_ok"),
        bool_and(h3_is_valid_cell(col("cell")) &&
          h3_get_resolution(col("cell")) === 7).as("cells_ok"),
        (count(lit(1)) === countDistinct(col("cell"))).as("one_value_per_cell_ok"),
        bool_and(h3_cell_to_latlng(col("cell")).getField("lat").between(latMin - 0.05, latMax + 0.05) &&
          h3_cell_to_latlng(col("cell")).getField("lng").between(lngMin - 0.05, lngMax + 0.05))
          .as("window_ok")).collect().head

      val compactOk = H3Raster.rasterToCompactedCells(tiles, res = 7)
        .select(explode(col("cells")).as("c"))
        .select(explode(h3_uncompact_cell(col("c"), lit(7))).as("u"))
        .count() == n

      val resPick = H3Raster.nearestH3Resolution(transform)
      val resPickSmaller = H3Raster.nearestH3Resolution(transform, smallerThanPixel = true)

      Seq((
        n > expect * 0.5 && n < expect * 1.8,
        stats.getBoolean(0), stats.getBoolean(1), stats.getBoolean(2), stats.getBoolean(3),
        compactOk,
        resPick == 8 && resPickSmaller == 8
      )).toDF("count_ok", "values_ok", "cells_ok", "one_value_per_cell_ok", "window_ok",
        "compact_ok", "res_pick_ok")
    }),

    // R1-R4 through REAL GeoTIFF bytes (SURVEY.md §2.7; reference shape
    // h3ron-ndarray/benches/convert_dataset_r.rs:9-33 reads a GeoTIFF band
    // and converts to cells): write a deflate+predictor strip-organized
    // fixture, read it back with the executor-side strip reader, and pin
    // the resulting cell frame EXACTLY (set-equal, value-for-value) to the
    // one built from the same grid in memory — plus the meta-only
    // resolution pick. Oracle is closed-form TRUE.
    "r02_geotiff_to_cells" -> ((s, dir) => {
      import s.implicits._
      val width = 64
      val height = 48
      val lngMin = -122.6; val lngMax = -121.8
      val latMin = 37.2; val latMax = 38.0
      val transform = H3Raster.Transform.northUp(
        lngMin, latMax, (lngMax - lngMin) / width, (latMax - latMin) / height)
      val values = Array.tabulate(width * height) { i =>
        val x = i % width; val y = i / width
        ((x * 7 + y * 13) % 5).toDouble
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft_r02")
      val path = tmp.resolve("r02.tif").toString
      GeoTiff.writeGeoTiff(path, width, height, transform, values, nodata = Some(0.0),
        dtype = "u8", compression = "deflate", predictor2 = true, rowsPerStrip = 16)
      // same raster as an LZW-compressed TILED file (the GDAL/COG default
      // organization) — both ingestion paths must agree exactly
      val pathTiled = tmp.resolve("r02_tiled.tif").toString
      GeoTiff.writeGeoTiff(pathTiled, width, height, transform, values, nodata = Some(0.0),
        dtype = "u8", compression = "lzw", predictor2 = true, tile = Some((32, 16)))
      // and the same raster again as a BigTIFF (magic 43) — the container
      // any >4 GiB production raster uses
      val pathBig = tmp.resolve("r02_big.tif").toString
      GeoTiff.writeGeoTiff(pathBig, width, height, transform, values, nodata = Some(0.0),
        dtype = "u8", compression = "deflate", tile = Some((32, 16)), bigTiff = true)

      val fromTiff = H3Raster.rasterToCells(GeoTiff.readGeoTiff(s, path), res = 7)
      val fromTiled = H3Raster.rasterToCells(GeoTiff.readGeoTiff(s, pathTiled), res = 7)
      val fromBig = H3Raster.rasterToCells(GeoTiff.readGeoTiff(s, pathBig), res = 7)
      val fromMem = H3Raster.rasterToCells(
        H3Raster.tileRaster(s, width, height, transform, values, nodata = 0.0, tile = 16), res = 7)
        .cache()

      val n = fromMem.count()
      val tiffMatchesMem =
        fromTiff.except(fromMem).isEmpty && fromMem.except(fromTiff).isEmpty &&
          fromTiff.count() == n &&
          fromTiled.except(fromMem).isEmpty && fromMem.except(fromTiled).isEmpty &&
          fromTiled.count() == n &&
          fromBig.except(fromMem).isEmpty && fromMem.except(fromBig).isEmpty &&
          fromBig.count() == n

      val (mt, nd, mw, mh) = GeoTiff.readGeoTiffMeta(path)
      val metaOk = mt.toArray.sameElements(transform.toArray) &&
        nd.contains(0.0) && mw == width && mh == height
      val resPickOk = H3Raster.nearestH3Resolution(mt) == 8

      Seq((n > 0 && tiffMatchesMem, metaOk, resPickOk))
        .toDF("cells_match_ok", "meta_ok", "res_pick_ok")
    }),

    // the reference's convert_dataset_r bench EXACTLY (h3ron-ndarray/
    // benches/convert_dataset_r.rs:9-33): data/r.tiff band 1 (u8, GDAL
    // nodata 0) -> value-grouped cells at res 11 (its hardcoded bench
    // res = SmallerThanPixel for this transform) -> compact. Output is
    // the per-value compacted size plus the uncompacted res-11 coverage
    // it expands back to — both pinned in the oracle. SF-independent:
    // the input is the reference's fixture, not the testdata tables.
    "r03_r_tiff_compact" -> ((s, dir) => {
      val tiles = GeoTiff.readGeoTiff(s, "/root/reference/data/r.tiff")
      val compacted = H3Raster.rasterToCompactedCells(tiles, res = 11)
      compacted.select(
        col("value").cast("long").as("value_q"), // mask values are 0/1
        size(col("cells")).cast("long").as("n_compacted"),
        expr("aggregate(cells, CAST(0 AS BIGINT), " +
          "(acc, c) -> acc + CAST(pow(7, 11 - ((c >> 52) & 15)) AS BIGINT))")
          .as("n_res11"))
        .orderBy(col("value_q"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "r03_r_tiff_compact" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(29628 AS BIGINT),
        |  CAST(2133762 AS BIGINT))) AS t(value_q, n_compacted, n_res11)
        |ORDER BY value_q""".stripMargin,
    "r01_raster_to_cells" ->
      """SELECT TRUE AS count_ok, TRUE AS values_ok, TRUE AS cells_ok,
        |  TRUE AS one_value_per_cell_ok, TRUE AS window_ok, TRUE AS compact_ok,
        |  TRUE AS res_pick_ok""".stripMargin,
    "r02_geotiff_to_cells" ->
      "SELECT TRUE AS cells_match_ok, TRUE AS meta_ok, TRUE AS res_pick_ok"
  )
}
