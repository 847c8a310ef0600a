package graft.raster

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/**
 * GeoTIFF reader: every variant round-trips through real TIFF bytes on
 * disk and must reproduce EXACTLY the tile frame [[H3Raster.tileRaster]]
 * builds from the same in-memory grid (values, geotransform, nodata,
 * has_data) — the oracle the r02 driver query also rides.
 */
class GeoTiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import H3Raster._

  private val dir = java.nio.file.Files.createTempDirectory("geotiff").toString

  private def grid(w: Int, h: Int): Array[Double] =
    Array.tabulate(w * h) { i => ((i % w) * 7 + (i / w) * 13) % 5.0 }

  /** Reassemble (pixel_x, pixel_y, value) from a tile frame. */
  private def pixels(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Double] =
    df.collect().flatMap { r =>
      val x0 = r.getInt(1); val y0 = r.getInt(2)
      val w = r.getInt(3); val h = r.getInt(4)
      val vals = r.getSeq[Double](6)
      for (y <- 0 until h; x <- 0 until w) yield ((x0 + x, y0 + y), vals(y * w + x))
    }.toMap

  test("u8 uncompressed multi-strip: pixels, transform, nodata all equal the in-memory frame") {
    val (w, h) = (40, 25)
    val t = Transform.northUp(-122.6, 38.0, 0.0125, 0.0167)
    val vals = grid(w, h)
    val path = s"$dir/u8.tif"
    GeoTiff.writeGeoTiff(path, w, h, t, vals, nodata = Some(0.0), dtype = "u8",
      rowsPerStrip = 7)
    val got = GeoTiff.readGeoTiff(spark, path)
    assert(got.count() == 4) // ceil(25/7) strips
    assert(pixels(got) == pixels(tileRaster(spark, w, h, t, vals, 0.0, tile = 16)))
    val row = got.orderBy($"tile_id").head()
    assert(row.getSeq[Double](5) == t.toArray.toSeq, "geotransform")
    assert(row.getDouble(7) == 0.0, "nodata")
    // meta-only read agrees without touching pixels
    val (mt, nd, mw, mh) = GeoTiff.readGeoTiffMeta(path)
    assert(mt.toArray.toSeq == t.toArray.toSeq && nd.contains(0.0) && mw == w && mh == h)
  }

  test("deflate + predictor 2 and big-endian recover identical pixels") {
    val (w, h) = (33, 19)
    val t = Transform.northUp(10.0, 50.0, 0.01, 0.01)
    val vals = grid(w, h)
    val expect = pixels(tileRaster(spark, w, h, t, vals, 0.0, tile = 16))
    for ((comp, pred, be, name) <- Seq(
        ("deflate", false, false, "dfl"), ("deflate", true, false, "pred"),
        ("none", false, true, "be"), ("deflate", true, true, "predbe"),
        ("lzw", false, false, "lzw"), ("lzw", true, false, "lzwpred"),
        ("lzw", true, true, "lzwpredbe"), ("packbits", false, false, "pb"),
        ("packbits", true, false, "pbpred"))) {
      val path = s"$dir/v_$name.tif"
      GeoTiff.writeGeoTiff(path, w, h, t, vals, Some(0.0), "u8",
        compression = comp, predictor2 = pred, rowsPerStrip = 5, bigEndian = be)
      assert(pixels(GeoTiff.readGeoTiff(spark, path)) == expect, name)
    }
  }

  test("f32 samples round-trip fractional values exactly") {
    val (w, h) = (12, 9)
    val t = Transform.northUp(0.0, 1.0, 0.1, 0.1)
    val vals = Array.tabulate(w * h)(i => (i % 17) * 0.25 - 1.5)
    val path = s"$dir/f32.tif"
    GeoTiff.writeGeoTiff(path, w, h, t, vals, None, dtype = "f32",
      compression = "deflate", rowsPerStrip = 4)
    val got = pixels(GeoTiff.readGeoTiff(spark, path))
    assert(got == pixels(tileRaster(spark, w, h, t, vals, Double.NaN, tile = 8)))
    // no nodata tag -> null nodata column, has_data always true
    val df = GeoTiff.readGeoTiff(spark, path)
    assert(df.filter($"nodata".isNotNull).count() == 0)
    assert(df.filter(!$"has_data").count() == 0)
  }

  test("has_data prunes nodata-only strips; rasterToCells equals the in-memory path end-to-end") {
    val (w, h) = (64, 48)
    val t = Transform.northUp(-122.6, 38.0, 0.8 / w, 0.8 / h)
    // bottom half all nodata: those strips must carry has_data = false
    val vals = Array.tabulate(w * h)(i => if (i / w < h / 2) grid(w, h)(i) else 0.0)
    val path = s"$dir/nd.tif"
    GeoTiff.writeGeoTiff(path, w, h, t, vals, Some(0.0), "u8",
      compression = "deflate", rowsPerStrip = 8)
    val tiff = GeoTiff.readGeoTiff(spark, path)
    assert(tiff.filter(!$"has_data").count() == 3) // strips 3,4,5 fully nodata
    val fromTiff = rasterToCells(tiff, res = 7)
      .as[(Double, Long)].collect().toSet
    val fromMem = rasterToCells(
        tileRaster(spark, w, h, t, vals, 0.0, tile = 16), res = 7)
      .as[(Double, Long)].collect().toSet
    assert(fromTiff == fromMem, "GeoTIFF path must equal the in-memory tile path")
    assert(fromTiff.nonEmpty)
  }

  test("tiled layout: edge tiles cropped, placements exact, equals the strip read") {
    val (w, h) = (70, 41) // not multiples of the tile size: right+bottom padding
    val t = Transform.northUp(-10.0, 45.0, 0.01, 0.01)
    val vals = grid(w, h)
    val expect = pixels(tileRaster(spark, w, h, t, vals, 0.0, tile = 16))
    for ((comp, pred, be, name) <- Seq(
        ("none", false, false, "plain"), ("deflate", true, false, "dfl"),
        ("lzw", true, false, "lzw"), ("packbits", false, true, "pb"))) {
      val path = s"$dir/t_$name.tif"
      GeoTiff.writeGeoTiff(path, w, h, t, vals, Some(0.0), "u8",
        compression = comp, predictor2 = pred, tile = Some((32, 16)), bigEndian = be)
      val df = GeoTiff.readGeoTiff(spark, path)
      assert(df.count() == 9, s"$name: ceil(70/32) x ceil(41/16) tiles") // 3x3
      assert(pixels(df) == expect, name)
      // edge tiles are cropped to the image, never padded into the frame
      val dims = df.select($"x0", $"y0", $"width", $"height").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(dims.contains((64, 32, 6, 9)), s"$name: bottom-right crop")
      assert(dims.contains((0, 0, 32, 16)), s"$name: interior tile full size")
    }
  }

  test("tiled f32 LZW round-trips fractional values; rasterToCells equals the in-memory path") {
    val (w, h) = (48, 32)
    val t = Transform.northUp(-122.6, 38.0, 0.8 / w, 0.8 / h)
    val vals = Array.tabulate(w * h)(i => if (i % 5 == 0) 0.0 else (i % 17) * 0.25 + 1.0)
    val path = s"$dir/t_f32.tif"
    GeoTiff.writeGeoTiff(path, w, h, t, vals, Some(0.0), dtype = "f32",
      compression = "lzw", tile = Some((16, 16)))
    val fromTiff = rasterToCells(GeoTiff.readGeoTiff(spark, path), res = 7)
      .as[(Double, Long)].collect().toSet
    val fromMem = rasterToCells(
        tileRaster(spark, w, h, t, vals, 0.0, tile = 16), res = 7)
      .as[(Double, Long)].collect().toSet
    assert(fromTiff == fromMem && fromTiff.nonEmpty)
  }

  test("TiffLzw codec: round-trips adversarial buffers, including table-reset sizes") {
    val rnd = new scala.util.Random(7)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte](42),
      Array.fill(7)(0.toByte),
      // KwKwK pattern: aaa aaa ... triggers the code==freeEnt branch
      Array.fill(64)('a'.toByte),
      // long constant run: exercises width growth on highly compressible data
      Array.fill(300000)(9.toByte),
      // random bytes: dictionary grows past 9->10->11->12 bits and resets (>4094 entries)
      Array.fill(200000)(rnd.nextInt(256).toByte),
      // structured repetition: long repeated phrases build deep chains
      Array.tabulate(100000)(i => ((i % 251) ^ (i / 997)).toByte))
    for ((c, i) <- cases.zipWithIndex) {
      val enc = TiffLzw.encode(c)
      val dec = TiffLzw.decode(enc, c.length)
      assert(java.util.Arrays.equals(dec, c), s"case $i (len ${c.length})")
    }
    // compressible input actually compresses
    val runs = Array.fill(65536)(1.toByte)
    assert(TiffLzw.encode(runs).length < runs.length / 8)
  }

  test("u16 predictor 2: carries cross byte lanes (0x00FF + 1 = 0x0100, not 0x0000)") {
    val (w, h) = (37, 11)
    val t = Transform.northUp(1.0, 2.0, 0.1, 0.1)
    // consecutive horizontal deltas of +257 force a carry out of the low
    // byte on most steps — the exact case per-byte-lane undifferencing
    // silently corrupts
    val vals = Array.tabulate(w * h)(i => ((i % w) * 257 + (i / w) * 13).toDouble)
    val expect = pixels(tileRaster(spark, w, h, t, vals, -1.0, tile = 16))
    for ((comp, be, name) <- Seq(
        ("deflate", false, "dfl"), ("lzw", false, "lzw"),
        ("deflate", true, "dflbe"), ("none", true, "nonebe"))) {
      val path = s"$dir/u16_$name.tif"
      GeoTiff.writeGeoTiff(path, w, h, t, vals, None, dtype = "u16",
        compression = comp, predictor2 = true, rowsPerStrip = 4, bigEndian = be)
      assert(pixels(GeoTiff.readGeoTiff(spark, path)) == expect, name)
    }
  }

  test("BigTIFF container: strips and lzw tiles round-trip in both byte orders") {
    val (w, h) = (52, 37)
    val t = Transform.northUp(3.0, 47.0, 0.01, 0.01)
    val vals = grid(w, h)
    val expect = pixels(tileRaster(spark, w, h, t, vals, 0.0, tile = 16))
    for ((comp, tiled, be, name) <- Seq(
        ("none", false, false, "plain"), ("deflate", false, true, "dflbe"),
        ("lzw", true, false, "lzwtile"), ("packbits", true, true, "pbtilebe"))) {
      val path = s"$dir/bt_$name.tif"
      GeoTiff.writeGeoTiff(path, w, h, t, vals, Some(0.0), "u8",
        compression = comp, tile = if (tiled) Some((16, 16)) else None,
        rowsPerStrip = 9, bigEndian = be, bigTiff = true)
      // really BigTIFF on disk: magic 43 at offset 2
      val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).take(4)
      val magic = if (be) ((head(2) & 0xFF) << 8) | (head(3) & 0xFF)
        else (head(2) & 0xFF) | ((head(3) & 0xFF) << 8)
      assert(magic == 43, name)
      assert(pixels(GeoTiff.readGeoTiff(spark, path)) == expect, name)
      val (mt, nd, mw, mh) = GeoTiff.readGeoTiffMeta(path)
      assert(mt.toArray.toSeq == t.toArray.toSeq && nd.contains(0.0) &&
        mw == w && mh == h, name)
    }
  }

  test("malformed inputs fail loudly, never misread") {
    val garbage = s"$dir/garbage.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(garbage),
      "not a tiff at all........".getBytes)
    intercept[java.io.IOException] { GeoTiff.readGeoTiff(spark, garbage) }
    // truncated BigTIFF: header promises an IFD that is not there
    val big = s"$dir/big.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(big),
      Array[Byte]('I', 'I', 43, 0, 8, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0))
    intercept[java.io.IOException] { GeoTiff.readGeoTiff(spark, big) }
    // BigTIFF with a non-8 offset size is malformed
    val badOff = s"$dir/badoff.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(badOff),
      Array[Byte]('I', 'I', 43, 0, 4, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0))
    val e = intercept[java.io.IOException] { GeoTiff.readGeoTiff(spark, badOff) }
    assert(e.getMessage.contains("BigTIFF"))
  }
}
