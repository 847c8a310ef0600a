package graft.raster

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.raster.H3Raster.Transform

/**
 * Baseline GeoTIFF ingestion → the [[H3Raster]] tile convention
 * (SURVEY.md §2.7; reference counterpart: the GDAL-read raster bench,
 * h3ron-ndarray/benches/convert_dataset_r.rs:9-33 — the reference leans on
 * GDAL, we parse the interchange baseline in pure JVM code, the same
 * discipline as the AVI/WAV/BMP walks).
 *
 * Supported: classic TIFF (magic 42) AND BigTIFF (magic 43, 8-byte
 * offsets — what any raster past the 4 GiB classic limit is, i.e. the
 * 100-TB deployment's normal case), II or MM byte order, single-band
 * images in BOTH segment organizations — strips (273/278/279) and tiles
 * (322/323/324/325, the GDAL/COG default) — 8/16/32-bit integer (signed or
 * unsigned) and 32/64-bit float samples, compression none (1), LZW (5,
 * TIFF 6.0 §13 with the standard early-change code widths), zlib/deflate
 * (8 and the legacy 32946 — JDK Inflater decodes both), PackBits (32773),
 * horizontal-differencing predictor (2) for integer samples, GeoTIFF
 * geotransform from ModelPixelScale+ModelTiepoint or ModelTransformation,
 * and GDAL's ASCII nodata tag. Multi-band chunky-interleaved images
 * (PlanarConfiguration=1, e.g. RGB) read ONE band per call — the same
 * one-band-at-a-time contract as the reference's
 * `dataset.rasterband(1).read_as_array` (convert_dataset_r.rs:13-16);
 * planar-separate multi-band and palette images are rejected with a clear
 * error — not silently misread.
 *
 * Scale shape: the driver reads only the KB-scale IFD; every strip/tile
 * becomes one task that POSITION-READS its own byte range through the
 * Hadoop filesystem (so an S3/HDFS-resident TIFF never funnels through the
 * driver), decompresses, decodes, and emits one tile row. Downstream
 * [[H3Raster.rasterToCells]] is already per-tile shuffle-free.
 */
object GeoTiff {

  /** One segment's (strip's or tile's) placement + byte range, computed on
    * the driver. `decW`/`decH` is the DECODED grid (tiles are padded to the
    * full tile size at the right/bottom edges per TIFF 6.0 §15); the
    * emitted crop is `cols` x `rows` from its top-left corner. For strips
    * the two coincide. */
  private final case class SegMeta(
      idx: Int, x0: Int, y0: Int, cols: Int, rows: Int, decW: Int, decH: Int,
      offset: Long, byteCount: Long)

  private final case class TiffMeta(
      width: Int, height: Int, bits: Int, sampleFormat: Int, compression: Int,
      predictor: Int, bigEndian: Boolean, transform: Transform,
      nodata: Option[Double], samplesPerPixel: Int, segments: Array[SegMeta])

  // ---- low-level readers -------------------------------------------------

  private class ByteReader(b: Array[Byte], bigEndian: Boolean) {
    def u16(o: Int): Int =
      if (bigEndian) ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
      else (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      if (bigEndian)
        ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
          ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
      else
        (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
          ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    def u64(o: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val by = if (bigEndian) b(o + i) else b(o + 7 - i)
        v = (v << 8) | (by & 0xFFL)
        i += 1
      }
      v
    }
    def f64(o: Int): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) {
        val by = if (bigEndian) b(o + i) else b(o + 7 - i)
        bits = (bits << 8) | (by & 0xFFL)
        i += 1
      }
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  /** The session's Hadoop conf when a session is active (spark.hadoop.*
    * credentials/endpoints for s3a/abfs/hdfs paths), else defaults. A bare
    * `new Configuration()` here would silently drop every spark.hadoop.*
    * setting and fail on any authenticated object store. */
  private def driverHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Serializable Hadoop-conf carrier for executor-side segment reads
    * (Configuration itself is not java-serializable; it IS Writable). */
  private class ConfCarrier(@transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** Unsigned sample read/write at a byte offset — the unit TIFF's
    * horizontal predictor differences over. */
  private def rdSample(b: Array[Byte], o: Int, bytesPer: Int, bigEndian: Boolean): Long = {
    var v = 0L
    var i = 0
    while (i < bytesPer) {
      val by = if (bigEndian) b(o + i) else b(o + bytesPer - 1 - i)
      v = (v << 8) | (by & 0xFFL)
      i += 1
    }
    v
  }

  private def wrSample(b: Array[Byte], o: Int, bytesPer: Int, bigEndian: Boolean, v: Long): Unit = {
    var i = 0
    while (i < bytesPer) {
      val shift = 8 * (bytesPer - 1 - i)
      val by = ((v >> shift) & 0xFF).toByte
      if (bigEndian) b(o + i) = by else b(o + bytesPer - 1 - i) = by
      i += 1
    }
  }

  private def readAt(path: String, offset: Long, len: Int,
      conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val buf = new Array[Byte](len)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  // ---- IFD parse (driver side) ------------------------------------------

  private val TypeSizes =
    Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 11 -> 4, 12 -> 8, 16 -> 8, 17 -> 8)

  /** One IFD entry's values as doubles (integer types widened); ASCII as
    * raw bytes for the nodata tag. */
  private final case class Entry(tag: Int, typ: Int, count: Long, raw: Array[Byte], bigEndian: Boolean) {
    private val r = new ByteReader(raw, bigEndian)
    def longs: Array[Long] = typ match {
      case 3 => Array.tabulate(count.toInt)(i => r.u16(i * 2).toLong)
      case 4 => Array.tabulate(count.toInt)(i => r.u32(i * 4))
      case 16 => Array.tabulate(count.toInt)(i => r.u64(i * 8)) // BigTIFF LONG8
      case 1 => Array.tabulate(count.toInt)(i => (raw(i) & 0xFF).toLong)
      case t => throw new java.io.IOException(s"tag $tag: unexpected TIFF type $t for integer read")
    }
    def doubles: Array[Double] = typ match {
      case 12 => Array.tabulate(count.toInt)(i => r.f64(i * 8))
      case _ => longs.map(_.toDouble)
    }
    def ascii: String = new String(raw.takeWhile(_ != 0), "US-ASCII")
  }

  private def parseMeta(path: String,
      conf: org.apache.hadoop.conf.Configuration): TiffMeta = {
    val head = readAt(path, 0, 16, conf)
    val bigEndian = head(0) == 'M' && head(1) == 'M'
    if (!bigEndian && !(head(0) == 'I' && head(1) == 'I'))
      throw new java.io.IOException("not a TIFF: bad byte-order mark")
    val hr = new ByteReader(head, bigEndian)
    // classic TIFF (magic 42, 4-byte offsets) and BigTIFF (magic 43,
    // 8-byte offsets, 20-byte IFD entries) — a 100-TB deployment's
    // rasters routinely exceed the 4 GiB classic limit and ARE BigTIFF
    val big = hr.u16(2) match {
      case 42 => false
      case 43 =>
        if (hr.u16(4) != 8 || hr.u16(6) != 0)
          throw new java.io.IOException("malformed BigTIFF header (offset size != 8)")
        true
      case m => throw new java.io.IOException(s"not a TIFF: magic $m")
    }
    val ifdOff = if (big) hr.u64(8) else hr.u32(4)
    val entrySize = if (big) 20 else 12
    val n =
      if (big) {
        val c = new ByteReader(readAt(path, ifdOff, 8, conf), bigEndian).u64(0)
        if (c < 0 || c > 65535) throw new java.io.IOException(s"implausible IFD entry count $c")
        c.toInt
      } else new ByteReader(readAt(path, ifdOff, 2, conf), bigEndian).u16(0)
    val entB = readAt(path, ifdOff + (if (big) 8 else 2), n * entrySize, conf)
    val er = new ByteReader(entB, bigEndian)
    val inlineLimit = if (big) 8 else 4
    val entries = (0 until n).map { i =>
      val o = i * entrySize
      val tag = er.u16(o)
      val typ = er.u16(o + 2)
      val count = if (big) er.u64(o + 4) else er.u32(o + 4)
      val valOff = if (big) o + 12 else o + 8
      val size = TypeSizes.getOrElse(typ, 1).toLong * count
      if (count < 0 || size > Int.MaxValue - 8)
        throw new java.io.IOException(
          s"tag $tag: implausible value size $size bytes (count $count)")
      val raw =
        if (size <= inlineLimit)
          java.util.Arrays.copyOfRange(entB, valOff, valOff + math.max(size, 1L).toInt)
        else {
          val ext = if (big) er.u64(valOff) else er.u32(valOff)
          readAt(path, ext, size.toInt, conf)
        }
      Entry(tag, typ, count, raw, bigEndian)
    }.map(e => e.tag -> e).toMap

    def req(tag: Int, what: String): Entry =
      entries.getOrElse(tag, throw new java.io.IOException(s"TIFF missing $what (tag $tag)"))
    def optLong(tag: Int, dflt: Long): Long =
      entries.get(tag).map(_.longs.head).getOrElse(dflt)

    val width = req(256, "ImageWidth").longs.head.toInt
    val height = req(257, "ImageLength").longs.head.toInt
    if (width <= 0 || height <= 0)
      throw new java.io.IOException(s"bad dimensions ${width}x$height")
    val samplesPerPixel = optLong(277, 1L).toInt
    if (samplesPerPixel < 1 || samplesPerPixel > 256)
      throw new java.io.IOException(s"implausible SamplesPerPixel $samplesPerPixel")
    if (samplesPerPixel > 1) {
      // chunky interleave only: each pixel's samples are adjacent, so a
      // segment read can slice out one band. PlanarConfiguration=2 stores
      // whole per-band planes whose segment bookkeeping differs — reject
      // rather than misread.
      if (optLong(284, 1L) != 1L)
        throw new java.io.IOException(
          "multi-band TIFF with PlanarConfiguration=2 (separate planes) not supported")
      val bps = req(258, "BitsPerSample").longs
      if (bps.distinct.length != 1)
        throw new java.io.IOException(
          s"heterogeneous BitsPerSample ${bps.mkString(",")} not supported")
    }
    val bits = optLong(258, 1L).toInt
    val sampleFormat = optLong(339, 1L).toInt
    (bits, sampleFormat) match {
      case (8 | 16 | 32, 1 | 2) | (32 | 64, 3) => ()
      case _ => throw new java.io.IOException(
        s"unsupported sample layout: $bits bits, format $sampleFormat")
    }
    val compression = optLong(259, 1L).toInt
    if (!Set(1, 5, 8, 32773, 32946).contains(compression))
      throw new java.io.IOException(
        s"unsupported compression $compression (none/lzw/deflate/packbits only)")
    val predictor = optLong(317, 1L).toInt
    if (predictor != 1 && !(predictor == 2 && sampleFormat != 3))
      throw new java.io.IOException(s"unsupported predictor $predictor for format $sampleFormat")

    val tiled = entries.contains(322) || entries.contains(324)
    val segments: Array[SegMeta] = if (tiled) {
      val tw = req(322, "TileWidth").longs.head.toInt
      val th = req(323, "TileLength").longs.head.toInt
      if (tw <= 0 || th <= 0)
        throw new java.io.IOException(s"bad tile size ${tw}x$th")
      val offsets = req(324, "TileOffsets").longs
      val counts = req(325, "TileByteCounts").longs
      if (offsets.length != counts.length)
        throw new java.io.IOException("TileOffsets/TileByteCounts length mismatch")
      val across = (width + tw - 1) / tw
      val down = (height + th - 1) / th
      if (offsets.length != across * down)
        throw new java.io.IOException(
          s"tile count ${offsets.length} != expected ${across * down} for ${tw}x$th tiles")
      Array.tabulate(offsets.length) { i =>
        val x0 = (i % across) * tw
        val y0 = (i / across) * th
        SegMeta(i, x0, y0, math.min(tw, width - x0), math.min(th, height - y0),
          tw, th, offsets(i), counts(i))
      }
    } else {
      val offsets = req(273, "StripOffsets").longs
      val counts = req(279, "StripByteCounts").longs
      if (offsets.length != counts.length)
        throw new java.io.IOException("StripOffsets/StripByteCounts length mismatch")
      // RowsPerStrip=2^32-1 is the spec's "all rows in one strip"
      // convention; any value >= height (or an unset tag) means one strip
      val rpsRaw = optLong(278, height.toLong)
      val rowsPerStrip =
        if (rpsRaw <= 0 || rpsRaw >= height.toLong) height else rpsRaw.toInt
      val expectStrips = (height + rowsPerStrip - 1) / rowsPerStrip
      if (offsets.length != expectStrips)
        throw new java.io.IOException(
          s"strip count ${offsets.length} != expected $expectStrips for RowsPerStrip=$rowsPerStrip")
      Array.tabulate(offsets.length) { i =>
        val y0 = i * rowsPerStrip
        val rows = math.min(rowsPerStrip, height - y0)
        SegMeta(i, 0, y0, width, rows, width, rows, offsets(i), counts(i))
      }
    }

    // geotransform: ModelTransformation (16 doubles, row-major 4x4) wins;
    // else ModelPixelScale + ModelTiepoint (transform.rs:27-110 semantics)
    val transform = entries.get(34264).map { e =>
      // row-major 4x4 ModelTransformation: its upper-left 2x3 IS the
      // rasterio/affine ordering, so route through the named constructor
      val m = e.doubles
      Transform.fromRasterio(Seq(m(0), m(1), m(3), m(4), m(5), m(7)))
    }.orElse {
      for (sc <- entries.get(33550); tp <- entries.get(33922)) yield {
        val s = sc.doubles; val t = tp.doubles
        // tiepoint: raster (i, j, 0) -> model (x, y, 0); GDAL north-up: -scaleY
        Transform.fromRasterio(Seq(
          s(0), 0.0, t(3) - t(0) * s(0), 0.0, -s(1), t(4) + t(1) * s(1)))
      }
    }.getOrElse(throw new java.io.IOException(
      "no geotransform (need ModelTransformation or ModelPixelScale+ModelTiepoint)"))

    val nodata = entries.get(42113).flatMap(e => e.ascii.trim.toDoubleOption)
    TiffMeta(width, height, bits, sampleFormat, compression, predictor, bigEndian,
      transform, nodata, samplesPerPixel, segments)
  }

  // ---- strip decode (executor side) -------------------------------------

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val k = inf.inflate(out, off, expected - off)
      // needsDictionary: an FDICT stream makes inflate return 0 with
      // neither finished nor needsInput set — without this check the
      // loop would spin forever instead of failing the task
      if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new java.io.IOException("truncated or preset-dictionary deflate segment")
      off += k
    }
    inf.end()
    if (off != expected)
      throw new java.io.IOException(s"deflate strip decoded $off of $expected bytes")
    out
  }

  /** Decode one strip/tile to its CROPPED `cols x rows` sample grid of the
    * 0-based `bandIdx`. The decompressed buffer is `decW x decH x spp`
    * chunky-interleaved samples (tiles are edge-padded); predictor rows run
    * at the decoded stride. */
  private def decodeSegment(m: TiffMeta, s: SegMeta, raw0: Array[Byte],
      bandIdx: Int): Array[Double] = {
    val bytesPer = m.bits / 8
    val spp = m.samplesPerPixel
    val expectL = s.decW.toLong * s.decH * spp * bytesPer
    if (expectL > Int.MaxValue - 8)
      throw new java.io.IOException(
        s"segment decodes to $expectL bytes — beyond the 2 GiB per-segment limit " +
          "(re-tile the raster; per-segment reads are the parallelism unit)")
    val expect = expectL.toInt
    val raw = m.compression match {
      case 1 =>
        if (raw0.length < expect) throw new java.io.IOException("short uncompressed segment")
        raw0
      case 5 => TiffLzw.decode(raw0, expect)
      case 32773 => packBitsDecode(raw0, expect)
      case _ => inflate(raw0, expect)
    }
    if (m.predictor == 2) {
      // horizontal differencing on FULL SAMPLE VALUES (TIFF 6.0 §14):
      // per-byte-lane addition would lose the carry between the bytes of a
      // multi-byte sample (0x00FF + 0x0001 must give 0x0100, not 0x0000).
      // With spp > 1 each sample is predicted from the SAME channel of the
      // previous pixel (stride spp samples), not the adjacent sample.
      val mask = (1L << (8 * bytesPer)) - 1
      val rowSamples = s.decW * spp
      var r = 0
      while (r < s.decH) {
        val row = r * rowSamples * bytesPer
        var si = spp
        while (si < rowSamples) {
          val o = row + si * bytesPer
          val v = (rdSample(raw, o, bytesPer, m.bigEndian) +
            rdSample(raw, o - spp * bytesPer, bytesPer, m.bigEndian)) & mask
          wrSample(raw, o, bytesPer, m.bigEndian, v)
          si += 1
        }
        r += 1
      }
    }
    val rd = new ByteReader(raw, m.bigEndian)
    val out = new Array[Double](s.cols * s.rows)
    var y = 0
    while (y < s.rows) {
      var x = 0
      while (x < s.cols) {
        val o = ((y * s.decW + x) * spp + bandIdx) * bytesPer
        out(y * s.cols + x) = (m.bits, m.sampleFormat) match {
          case (8, 1) => (raw(o) & 0xFF).toDouble
          case (8, 2) => raw(o).toDouble
          case (16, 1) => rd.u16(o).toDouble
          case (16, 2) => rd.u16(o).toShort.toDouble
          case (32, 1) => rd.u32(o).toDouble
          case (32, 2) => rd.u32(o).toInt.toDouble
          case (32, 3) => java.lang.Float.intBitsToFloat(rd.u32(o).toInt).toDouble
          case (64, 3) => rd.f64(o)
          case other => throw new java.io.IOException(s"unsupported layout $other")
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** TIFF PackBits (32773, Apple RLE): n in 0..127 copies n+1 literals,
    * n in -127..-1 repeats the next byte 1-n times, -128 is a no-op. */
  private def packBitsDecode(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = 0
    var o = 0
    while (o < expected) {
      if (i >= in.length) throw new java.io.IOException("truncated PackBits segment")
      val n = in(i); i += 1
      if (n >= 0) {
        val len = n + 1
        if (i + len > in.length || o + len > expected)
          throw new java.io.IOException("PackBits literal overruns segment")
        System.arraycopy(in, i, out, o, len)
        i += len; o += len
      } else if (n != -128) {
        val len = 1 - n
        if (i >= in.length || o + len > expected)
          throw new java.io.IOException("PackBits run overruns segment")
        java.util.Arrays.fill(out, o, o + len, in(i))
        i += 1; o += len
      }
    }
    out
  }

  /** PackBits encoder (fixture writer): runs of >= 3 identical bytes become
    * replicate packets, everything else literal packets (both capped at
    * 128). */
  private def packBitsEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length + in.length / 128 + 4)
    var i = 0
    while (i < in.length) {
      var j = i
      while (j + 1 < in.length && in(j + 1) == in(i) && j - i < 127) j += 1
      val run = j - i + 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(in(i))
        i = j + 1
      } else {
        var k = i
        while (k < in.length && k - i < 128 &&
            !(k + 2 < in.length && in(k) == in(k + 1) && in(k) == in(k + 2))) k += 1
        out.write(k - i - 1)
        out.write(in, i, k - i)
        i = k
      }
    }
    out.toByteArray
  }

  // ---- public API --------------------------------------------------------

  /** Read a strip- or tile-organized GeoTIFF into the
    * [[H3Raster.tileSchema]] tile frame: one frame row per TIFF segment
    * (full-width bands for strips, `TileWidth x TileLength` blocks for
    * tiles — [[H3Raster.rasterToCells]] is tile-shape-agnostic). The driver
    * touches only the IFD; segment payloads are position-read and decoded
    * by the executors. */
  def readGeoTiff(spark: SparkSession, path: String): DataFrame =
    readGeoTiff(spark, path, band = 1)

  /** As [[readGeoTiff]], selecting one band of a chunky multi-band image.
    * `band` is 1-based, GDAL-style (`rasterband(1)` is the first band —
    * what the reference's raster bench reads, convert_dataset_r.rs:13). */
  def readGeoTiff(spark: SparkSession, path: String, band: Int): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val meta = parseMeta(path, hconf)
    if (band < 1 || band > meta.samplesPerPixel)
      throw new java.io.IOException(
        s"band $band out of range 1..${meta.samplesPerPixel}")
    val bandIdx = band - 1
    val carrier = new ConfCarrier(hconf)
    val tArr = meta.transform.toArray.toSeq
    val nodataV: java.lang.Double = meta.nodata.map(Double.box).orNull
    val rdd = spark.sparkContext
      .parallelize(meta.segments.toSeq, math.min(meta.segments.length, 32))
      .map { s =>
        if (s.byteCount > Int.MaxValue - 8)
          throw new java.io.IOException(
            s"segment ${s.idx} is ${s.byteCount} bytes — beyond the 2 GiB per-segment " +
              "read limit (re-tile the raster; per-segment reads are the parallelism unit)")
        val vals = decodeSegment(meta, s,
          readAt(path, s.offset, s.byteCount.toInt, carrier.conf), bandIdx)
        val hasData = meta.nodata match {
          // NaN-nodata: v != NaN is always true, so test isNaN explicitly
          case Some(nd) => vals.exists(v => v != nd && !(nd.isNaN && v.isNaN))
          case None => vals.nonEmpty
        }
        Row(s.idx.toLong, s.x0, s.y0, s.cols, s.rows, tArr, vals.toSeq, nodataV, hasData)
      }
    spark.createDataFrame(rdd, H3Raster.tileSchema)
  }

  /** The parsed geotransform + nodata of a GeoTIFF (driver-side IFD read
    * only) — feeds [[H3Raster.nearestH3Resolution]] without touching pixel
    * data. */
  def readGeoTiffMeta(path: String): (Transform, Option[Double], Int, Int) = {
    val m = parseMeta(path, driverHadoopConf())
    (m.transform, m.nodata, m.width, m.height)
  }

  /** Band count of a GeoTIFF (driver-side IFD read only). */
  def readGeoTiffBandCount(path: String): Int =
    parseMeta(path, driverHadoopConf()).samplesPerPixel

  // ---- fixture writer (tests / local oracles) ----------------------------

  /** Write a real single-band GeoTIFF: u8 / u16 / f32 samples,
    * compression "none" | "deflate" | "lzw" | "packbits", (for integer
    * dtypes) the horizontal-differencing predictor, either byte order, and either
    * segment organization — strips of `rowsPerStrip` rows (default) or,
    * with `tile = Some((tw, th))`, a tiled layout (tags 322-325, edge
    * tiles zero-padded to the full tile size per TIFF 6.0 §15; tile dims
    * must be multiples of 16 as the spec requires). `bigTiff` emits the
    * BigTIFF container (magic 43, 8-byte offsets, 20-byte IFD entries,
    * LONG8 offset/count arrays). Values are row-major doubles (u8 values
    * must be 0..255 integers). Produces the standard tag set: dimensions,
    * layout, ModelPixelScale+ModelTiepoint, GDAL nodata ASCII. */
  def writeGeoTiff(path: String, width: Int, height: Int, transform: Transform,
      values: Array[Double], nodata: Option[Double], dtype: String = "u8",
      compression: String = "none", predictor2: Boolean = false,
      rowsPerStrip: Int = 16, tile: Option[(Int, Int)] = None,
      bigEndian: Boolean = false, bigTiff: Boolean = false): Unit = {
    require(values.length == width * height, "values must be width*height row-major")
    require(Set("u8", "u16", "f32").contains(dtype), s"dtype u8|u16|f32, got $dtype")
    require(!predictor2 || dtype != "f32", "predictor 2 only for integer samples")
    require(Set("none", "deflate", "lzw", "packbits").contains(compression),
      s"compression none|deflate|lzw|packbits, got $compression")
    tile.foreach { case (tw, th) =>
      require(tw > 0 && th > 0 && tw % 16 == 0 && th % 16 == 0,
        s"tile dims must be positive multiples of 16, got ${tw}x$th")
    }
    require(transform.b == 0.0 && transform.d == 0.0,
      "fixture writer emits PixelScale+Tiepoint: north-up transforms only")
    val bytesPer = dtype match { case "u8" => 1; case "u16" => 2; case _ => 4 }
    val bits = bytesPer * 8
    val sampleFormat = if (dtype == "f32") 3 else 1
    val compressionTag = compression match {
      case "none" => 1L
      case "lzw" => 5L
      case "deflate" => 8L
      case "packbits" => 32773L
    }

    def w16(v: Int): Array[Byte] =
      if (bigEndian) Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      else Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def w32(v: Long): Array[Byte] = {
      val le = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      if (bigEndian) le.reverse else le
    }
    def w64(v: Long): Array[Byte] = {
      val le = Array.tabulate(8)(i => ((v >> (8 * i)) & 0xFF).toByte)
      if (bigEndian) le.reverse else le
    }
    // layout knobs that differ between classic TIFF and BigTIFF
    val headerSize = if (bigTiff) 16 else 8
    val entrySize = if (bigTiff) 20 else 12
    val inlineCap = if (bigTiff) 8 else 4
    val arrType = if (bigTiff) 16 else 4 // LONG8 vs LONG for offset/count arrays
    val arrElem = if (bigTiff) 8 else 4
    def wOff(v: Long): Array[Byte] = if (bigTiff) w64(v) else w32(v)
    def wf64(d: Double): Array[Byte] = {
      val bitsL = java.lang.Double.doubleToLongBits(d)
      val be = Array.tabulate(8)(i => ((bitsL >> (56 - 8 * i)) & 0xFF).toByte)
      if (bigEndian) be else be.reverse
    }

    // segment plan: (x0, y0, decoded width, decoded height); strips decode
    // at their true size, tiles always at the full (padded) tile size
    val segPlan: Array[(Int, Int, Int, Int)] = tile match {
      case Some((tw, th)) =>
        val across = (width + tw - 1) / tw
        val down = (height + th - 1) / th
        Array.tabulate(across * down) { i =>
          ((i % across) * tw, (i / across) * th, tw, th)
        }
      case None =>
        val n = (height + rowsPerStrip - 1) / rowsPerStrip
        Array.tabulate(n) { si =>
          val y0 = si * rowsPerStrip
          (0, y0, width, math.min(rowsPerStrip, height - y0))
        }
    }
    val segBytes: Array[Array[Byte]] = segPlan.map { case (x0, y0, decW, decH) =>
      val plain = new Array[Byte](decW * decH * bytesPer)
      var r = 0
      while (r < decH) {
        var x = 0
        while (x < decW) {
          // zero-pad outside the image (tiled edge segments)
          if (y0 + r < height && x0 + x < width) {
            val v = values((y0 + r) * width + (x0 + x))
            val o = (r * decW + x) * bytesPer
            dtype match {
              case "u8" => plain(o) = v.toInt.toByte
              case "u16" => wrSample(plain, o, 2, bigEndian, v.toLong & 0xFFFFL)
              case _ =>
                val fb = java.lang.Float.floatToIntBits(v.toFloat)
                val be = Array.tabulate(4)(i => ((fb >> (24 - 8 * i)) & 0xFF).toByte)
                val enc = if (bigEndian) be else be.reverse
                System.arraycopy(enc, 0, plain, o, 4)
            }
          }
          x += 1
        }
        r += 1
      }
      if (predictor2) {
        // differencing on FULL SAMPLE VALUES, right-to-left (TIFF 6.0 §14)
        val mask = (1L << (8 * bytesPer)) - 1
        var r = 0
        while (r < decH) {
          val row = r * decW * bytesPer
          var x = decW - 1
          while (x >= 1) {
            val o = row + x * bytesPer
            val v = (rdSample(plain, o, bytesPer, bigEndian) -
              rdSample(plain, o - bytesPer, bytesPer, bigEndian)) & mask
            wrSample(plain, o, bytesPer, bigEndian, v)
            x -= 1
          }
          r += 1
        }
      }
      compression match {
        case "none" => plain
        case "lzw" => TiffLzw.encode(plain)
        case "packbits" => packBitsEncode(plain)
        case "deflate" =>
          val d = new java.util.zip.Deflater()
          d.setInput(plain); d.finish()
          val buf = new Array[Byte](plain.length + 64)
          val n = d.deflate(buf)
          d.end()
          java.util.Arrays.copyOf(buf, n)
      }
    }

    // layout: header(8) | IFD | tag arrays | nodata ascii | segments
    final case class Tag(tag: Int, typ: Int, count: Long, inline: Option[Long], ext: Array[Byte])
    val ndAscii = nodata.map(nd => (nd.toString + "\u0000").getBytes("US-ASCII"))
    val scale = wf64(transform.a) ++ wf64(-transform.e) ++ wf64(0.0)
    val tie = wf64(0.0) ++ wf64(0.0) ++ wf64(0.0) ++
      wf64(transform.c) ++ wf64(transform.f) ++ wf64(0.0)

    // segment offsets depend on layout size; compute sizes first
    val tagsPre = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Either[Long, Array[Byte]])](
      (256, 4, 1L, Left(width.toLong)),
      (257, 4, 1L, Left(height.toLong)),
      (258, 3, 1L, Left(bits.toLong)),
      (259, 4, 1L, Left(compressionTag)),
      (262, 3, 1L, Left(1L)), // BlackIsZero
      (277, 3, 1L, Left(1L)),
      (339, 3, 1L, Left(sampleFormat.toLong)),
      (33550, 12, 3L, Right(scale)),
      (33922, 12, 6L, Right(tie)))
    tile match {
      case Some((tw, th)) =>
        tagsPre += ((322, 3, 1L, Left(tw.toLong)))
        tagsPre += ((323, 3, 1L, Left(th.toLong)))
      case None =>
        tagsPre += ((278, 4, 1L, Left(rowsPerStrip.toLong)))
    }
    if (predictor2) tagsPre += ((317, 3, 1L, Left(2L)))
    ndAscii.foreach(a => tagsPre += ((42113, 2, a.length.toLong, Right(a))))
    // segment offset/count arrays: LONG (LONG8 in BigTIFF) each, nSegs
    // entries (external when > 1)
    val nSegs = segBytes.length
    val (offTag, cntTag) = if (tile.isDefined) (324, 325) else (273, 279)
    val nTags = tagsPre.length + 2
    val ifdSize =
      if (bigTiff) 8 + nTags * entrySize + 8
      else 2 + nTags * entrySize + 4
    var extOff = headerSize.toLong + ifdSize
    // assign external offsets for pre tags
    val resolved = tagsPre.map {
      case (t, ty, c, Left(v)) => Tag(t, ty, c, Some(v), Array.emptyByteArray)
      case (t, ty, c, Right(a)) =>
        if (a.length <= inlineCap) Tag(t, ty, c, None, a)
        else { val tg = Tag(t, ty, c, Some(extOff), a); extOff += a.length + (a.length & 1); tg }
    }
    val segOffArrOff = if (nSegs > 1) { val o = extOff; extOff += arrElem.toLong * nSegs; o } else 0L
    val segCntArrOff = if (nSegs > 1) { val o = extOff; extOff += arrElem.toLong * nSegs; o } else 0L
    val segDataStart = extOff
    val segOffsets = new Array[Long](nSegs)
    var so = segDataStart
    for (i <- 0 until nSegs) { segOffsets(i) = so; so += segBytes(i).length + (segBytes(i).length & 1) }

    val out = new java.io.ByteArrayOutputStream()
    out.write(if (bigEndian) Array[Byte]('M', 'M') else Array[Byte]('I', 'I'))
    if (bigTiff) {
      out.write(w16(43)); out.write(w16(8)); out.write(w16(0))
      out.write(w64(headerSize.toLong)) // first IFD directly after header
    } else {
      out.write(w16(42)); out.write(w32(headerSize.toLong))
    }
    // IFD: tags must be ascending by tag id
    val allTags = (resolved.toSeq ++ Seq(
      Tag(offTag, arrType, nSegs.toLong,
        if (nSegs > 1) Some(segOffArrOff) else Some(segOffsets(0)), Array.emptyByteArray),
      Tag(cntTag, arrType, nSegs.toLong,
        if (nSegs > 1) Some(segCntArrOff) else Some(segBytes(0).length.toLong), Array.emptyByteArray)
    )).sortBy(_.tag)
    if (bigTiff) out.write(w64(allTags.length.toLong)) else out.write(w16(allTags.length))
    allTags.foreach { t =>
      out.write(w16(t.tag)); out.write(w16(t.typ))
      if (bigTiff) out.write(w64(t.count)) else out.write(w32(t.count))
      t.inline match {
        // external pointer (array data lives elsewhere): offset-sized
        case Some(v) if t.ext.nonEmpty => out.write(wOff(v))
        // inline scalar: LEFT-justified at the TYPE's width (TIFF 6.0 —
        // a big-endian u64 write would land a 4-byte value in the wrong
        // half of the 8-byte BigTIFF slot)
        case Some(v) => t.typ match {
          case 3 =>
            out.write(w16(v.toInt)); out.write(new Array[Byte](inlineCap - 2))
          case 4 =>
            out.write(w32(v)); out.write(new Array[Byte](inlineCap - 4))
          case _ => out.write(wOff(v))
        }
        case None =>
          val padded = java.util.Arrays.copyOf(t.ext, inlineCap)
          out.write(padded)
      }
    }
    out.write(wOff(0L)) // next-IFD pointer
    // external tag arrays, in assignment order
    resolved.filter(t => t.inline.isDefined && t.ext.nonEmpty).foreach { t =>
      out.write(t.ext)
      if ((t.ext.length & 1) == 1) out.write(0)
    }
    if (nSegs > 1) {
      segOffsets.foreach(o => out.write(wOff(o)))
      segBytes.foreach(s => out.write(wOff(s.length.toLong)))
    }
    segBytes.foreach { s => out.write(s); if ((s.length & 1) == 1) out.write(0) }

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(driverHadoopConf())
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }
}

/**
 * TIFF 6.0 §13 LZW codec (compression 5): MSB-first bit packing, 9-bit
 * initial codes, ClearCode 256 / EOI 257, table entries from 258, and the
 * standard "early change" width schedule (libtiff-compatible: the encoder
 * widens when its next free entry exceeds 2^n-1, the decoder — running one
 * table entry behind — when it exceeds 2^n-2, which keeps both on the same
 * per-code width sequence; the encoder counts the flushed final code as an
 * entry so even the EOI width agrees). The encoder emits a ClearCode before
 * the table reaches the 12-bit ceiling.
 */
private[raster] object TiffLzw {
  private val Clear = 256
  private val Eoi = 257
  private val First = 258
  private val TableCeiling = 4094 // encoder resets here; decoder table caps at 4096

  def encode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    var acc = 0L
    var accBits = 0
    var nbits = 9
    var maxcode = (1 << 9) - 1
    def put(code: Int): Unit = {
      acc = (acc << nbits) | code
      accBits += nbits
      while (accBits >= 8) {
        out.write(((acc >>> (accBits - 8)) & 0xFF).toInt)
        accBits -= 8
      }
    }
    // (prefixCode, byte) -> code; key packs prefix (< 4096) over the byte
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var freeEnt = First
    def reset(): Unit = { dict.clear(); freeEnt = First; nbits = 9; maxcode = (1 << 9) - 1 }
    def grew(): Unit = if (freeEnt > maxcode && nbits < 12) { nbits += 1; maxcode = (1 << nbits) - 1 }

    put(Clear)
    var prefix = -1
    var i = 0
    while (i < in.length) {
      val b = in(i) & 0xFF
      if (prefix < 0) prefix = b
      else {
        val key = (prefix << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          dict.put(key, freeEnt)
          freeEnt += 1
          grew()
          if (freeEnt >= TableCeiling) { put(Clear); reset() }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      put(prefix)
      // count the flushed code as an entry so the EOI width matches the
      // decoder, which adds a table entry after every non-first code
      freeEnt += 1
      grew()
    }
    put(Eoi)
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xFF).toInt)
    out.toByteArray
  }

  def decode(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var o = 0
    var acc = 0L
    var accBits = 0
    var pos = 0
    var nbits = 9
    var maxcode = (1 << 9) - 2
    def read(): Int = {
      while (accBits < nbits) {
        if (pos >= in.length) return Eoi // truncated stream: treat as end
        acc = (acc << 8) | (in(pos) & 0xFF)
        pos += 1
        accBits += 8
      }
      accBits -= nbits
      ((acc >>> accBits) & ((1 << nbits) - 1)).toInt
    }
    // table(c) = decoded byte string for code c
    val table = new Array[Array[Byte]](4096)
    var c = 0
    while (c < 256) { table(c) = Array(c.toByte); c += 1 }
    var freeEnt = First
    var old = -1
    var done = false
    while (!done && o < expected) {
      val code = read()
      if (code == Eoi) done = true
      else if (code == Clear) {
        freeEnt = First; nbits = 9; maxcode = (1 << 9) - 2; old = -1
      } else if (old < 0) {
        if (code > 255) throw new java.io.IOException(s"LZW: first code $code after clear not a literal")
        out(o) = code.toByte; o += 1
        old = code
      } else {
        val entry: Array[Byte] =
          if (code < freeEnt && table(code) != null) table(code)
          else if (code == freeEnt) { // KwKwK
            val p = table(old)
            val e = java.util.Arrays.copyOf(p, p.length + 1)
            e(p.length) = p(0)
            e
          } else throw new java.io.IOException(s"LZW: code $code beyond table ($freeEnt)")
        if (o + entry.length > expected)
          throw new java.io.IOException("LZW: output overruns expected segment size")
        System.arraycopy(entry, 0, out, o, entry.length)
        o += entry.length
        if (freeEnt < 4096) {
          val p = table(old)
          val e = java.util.Arrays.copyOf(p, p.length + 1)
          e(p.length) = entry(0)
          table(freeEnt) = e
          freeEnt += 1
          if (freeEnt > maxcode && nbits < 12) {
            nbits += 1
            maxcode = if (nbits == 12) 4095 else (1 << nbits) - 2
          }
        }
        old = code
      }
    }
    if (o != expected)
      throw new java.io.IOException(s"LZW: decoded $o of $expected bytes")
    out
  }
}
