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
 * Supported: classic TIFF (magic 42, II or MM byte order), single-band
 * strip-organized images, 8/16/32-bit integer (signed or unsigned) and
 * 32/64-bit float samples, compression none (1) or zlib/deflate (8 and the
 * legacy 32946 — JDK Inflater decodes both), horizontal-differencing
 * predictor (2) for integer samples, GeoTIFF geotransform from
 * ModelPixelScale+ModelTiepoint or ModelTransformation, and GDAL's ASCII
 * nodata tag. Tiled layouts, BigTIFF, multi-band and palette images are
 * rejected with a clear error — not silently misread.
 *
 * Scale shape: the driver reads only the KB-scale IFD; every strip becomes
 * one task that POSITION-READS its own byte range through the Hadoop
 * filesystem (so an S3/HDFS-resident TIFF never funnels through the
 * driver), inflates, decodes, and emits one tile row. Downstream
 * [[H3Raster.rasterToCells]] is already per-tile shuffle-free.
 */
object GeoTiff {

  /** One strip's placement + byte range, computed on the driver. */
  private final case class StripMeta(
      idx: Int, y0: Int, rows: Int, offset: Long, byteCount: Long)

  private final case class TiffMeta(
      width: Int, height: Int, bits: Int, sampleFormat: Int, compression: Int,
      predictor: Int, bigEndian: Boolean, transform: Transform,
      nodata: Option[Double], strips: Array[StripMeta])

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

  private def open(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.open(p)
  }

  private def readAt(path: String, offset: Long, len: Int): Array[Byte] = {
    val in = open(path)
    try {
      val buf = new Array[Byte](len)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  // ---- IFD parse (driver side) ------------------------------------------

  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 11 -> 4, 12 -> 8)

  /** One IFD entry's values as doubles (integer types widened); ASCII as
    * raw bytes for the nodata tag. */
  private final case class Entry(tag: Int, typ: Int, count: Long, raw: Array[Byte], bigEndian: Boolean) {
    private val r = new ByteReader(raw, bigEndian)
    def longs: Array[Long] = typ match {
      case 3 => Array.tabulate(count.toInt)(i => r.u16(i * 2).toLong)
      case 4 => Array.tabulate(count.toInt)(i => r.u32(i * 4))
      case 1 => Array.tabulate(count.toInt)(i => (raw(i) & 0xFF).toLong)
      case t => throw new java.io.IOException(s"tag $tag: unexpected TIFF type $t for integer read")
    }
    def doubles: Array[Double] = typ match {
      case 12 => Array.tabulate(count.toInt)(i => r.f64(i * 8))
      case _ => longs.map(_.toDouble)
    }
    def ascii: String = new String(raw.takeWhile(_ != 0), "US-ASCII")
  }

  private def parseMeta(path: String): TiffMeta = {
    val head = readAt(path, 0, 8)
    val bigEndian = head(0) == 'M' && head(1) == 'M'
    if (!bigEndian && !(head(0) == 'I' && head(1) == 'I'))
      throw new java.io.IOException("not a TIFF: bad byte-order mark")
    val hr = new ByteReader(head, bigEndian)
    hr.u16(2) match {
      case 42 => ()
      case 43 => throw new java.io.IOException("BigTIFF (magic 43) not supported")
      case m => throw new java.io.IOException(s"not a TIFF: magic $m")
    }
    val ifdOff = hr.u32(4)
    val cntB = readAt(path, ifdOff, 2)
    val n = new ByteReader(cntB, bigEndian).u16(0)
    val entB = readAt(path, ifdOff + 2, n * 12)
    val er = new ByteReader(entB, bigEndian)
    val entries = (0 until n).map { i =>
      val o = i * 12
      val tag = er.u16(o)
      val typ = er.u16(o + 2)
      val count = er.u32(o + 4)
      val size = TypeSizes.getOrElse(typ, 1).toLong * count
      val raw =
        if (size <= 4) java.util.Arrays.copyOfRange(entB, o + 8, o + 8 + math.max(size, 1L).toInt)
        else readAt(path, er.u32(o + 8), size.toInt)
      Entry(tag, typ, count, raw, bigEndian)
    }.map(e => e.tag -> e).toMap

    def req(tag: Int, what: String): Entry =
      entries.getOrElse(tag, throw new java.io.IOException(s"TIFF missing $what (tag $tag)"))
    def optLong(tag: Int, dflt: Long): Long =
      entries.get(tag).map(_.longs.head).getOrElse(dflt)

    if (entries.contains(322) || entries.contains(324))
      throw new java.io.IOException("tiled TIFF layout not supported (strips only)")
    val width = req(256, "ImageWidth").longs.head.toInt
    val height = req(257, "ImageLength").longs.head.toInt
    if (width <= 0 || height <= 0)
      throw new java.io.IOException(s"bad dimensions ${width}x$height")
    val samplesPerPixel = optLong(277, 1L).toInt
    if (samplesPerPixel != 1)
      throw new java.io.IOException(s"multi-band TIFF ($samplesPerPixel samples/px) not supported")
    val bits = optLong(258, 1L).toInt
    val sampleFormat = optLong(339, 1L).toInt
    (bits, sampleFormat) match {
      case (8 | 16 | 32, 1 | 2) | (32 | 64, 3) => ()
      case _ => throw new java.io.IOException(
        s"unsupported sample layout: $bits bits, format $sampleFormat")
    }
    val compression = optLong(259, 1L).toInt
    if (compression != 1 && compression != 8 && compression != 32946)
      throw new java.io.IOException(s"unsupported compression $compression (none/deflate only)")
    val predictor = optLong(317, 1L).toInt
    if (predictor != 1 && !(predictor == 2 && sampleFormat != 3))
      throw new java.io.IOException(s"unsupported predictor $predictor for format $sampleFormat")

    val offsets = req(273, "StripOffsets").longs
    val counts = req(279, "StripByteCounts").longs
    if (offsets.length != counts.length)
      throw new java.io.IOException("StripOffsets/StripByteCounts length mismatch")
    val rowsPerStrip = optLong(278, height.toLong).toInt
    val expectStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    if (offsets.length != expectStrips)
      throw new java.io.IOException(
        s"strip count ${offsets.length} != expected $expectStrips for RowsPerStrip=$rowsPerStrip")
    val strips = Array.tabulate(offsets.length) { i =>
      val y0 = i * rowsPerStrip
      StripMeta(i, y0, math.min(rowsPerStrip, height - y0), offsets(i), counts(i))
    }

    // geotransform: ModelTransformation (16 doubles, row-major 4x4) wins;
    // else ModelPixelScale + ModelTiepoint (transform.rs:27-110 semantics)
    val transform = entries.get(34264).map { e =>
      val m = e.doubles
      Transform(m(0), m(1), m(3), m(4), m(5), m(7))
    }.orElse {
      for (sc <- entries.get(33550); tp <- entries.get(33922)) yield {
        val s = sc.doubles; val t = tp.doubles
        // tiepoint: raster (i, j, 0) -> model (x, y, 0); GDAL north-up: -scaleY
        Transform(s(0), 0.0, t(3) - t(0) * s(0), 0.0, -s(1), t(4) + t(1) * s(1))
      }
    }.getOrElse(throw new java.io.IOException(
      "no geotransform (need ModelTransformation or ModelPixelScale+ModelTiepoint)"))

    val nodata = entries.get(42113).flatMap(e => e.ascii.trim.toDoubleOption)
    TiffMeta(width, height, bits, sampleFormat, compression, predictor, bigEndian,
      transform, nodata, strips)
  }

  // ---- strip decode (executor side) -------------------------------------

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val k = inf.inflate(out, off, expected - off)
      if (k == 0 && inf.needsInput())
        throw new java.io.IOException("truncated deflate strip")
      off += k
    }
    inf.end()
    if (off != expected)
      throw new java.io.IOException(s"deflate strip decoded $off of $expected bytes")
    out
  }

  private def decodeStrip(m: TiffMeta, s: StripMeta, raw0: Array[Byte]): Array[Double] = {
    val bytesPer = m.bits / 8
    val expect = m.width * s.rows * bytesPer
    val raw = if (m.compression == 1) {
      if (raw0.length < expect) throw new java.io.IOException("short uncompressed strip")
      raw0
    } else inflate(raw0, expect)
    if (m.predictor == 2) {
      // horizontal differencing: cumulative add per row, per byte lane of
      // the sample (lanes delta independently in TIFF predictor 2)
      var r = 0
      while (r < s.rows) {
        val row = r * m.width * bytesPer
        var x = 1
        while (x < m.width) {
          var l = 0
          while (l < bytesPer) {
            val o = row + x * bytesPer + l
            raw(o) = (raw(o) + raw(o - bytesPer)).toByte
            l += 1
          }
          x += 1
        }
        r += 1
      }
    }
    val rd = new ByteReader(raw, m.bigEndian)
    val out = new Array[Double](m.width * s.rows)
    var i = 0
    while (i < out.length) {
      val o = i * bytesPer
      out(i) = (m.bits, m.sampleFormat) match {
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
      i += 1
    }
    out
  }

  // ---- public API --------------------------------------------------------

  /** Read a strip-organized GeoTIFF into the [[H3Raster.tileSchema]] tile
    * frame: one tile per strip (full-width bands — the natural TIFF
    * decomposition; [[H3Raster.rasterToCells]] is tile-shape-agnostic).
    * The driver touches only the IFD; strip payloads are position-read and
    * decoded by the executors. */
  def readGeoTiff(spark: SparkSession, path: String): DataFrame = {
    val meta = parseMeta(path)
    val tArr = meta.transform.toArray.toSeq
    val nodataV: java.lang.Double = meta.nodata.map(Double.box).orNull
    val rdd = spark.sparkContext
      .parallelize(meta.strips.toSeq, math.min(meta.strips.length, 32))
      .map { s =>
        val vals = decodeStrip(meta, s, readAt(path, s.offset, s.byteCount.toInt))
        val hasData = meta.nodata match {
          case Some(nd) => vals.exists(_ != nd)
          case None => vals.nonEmpty
        }
        Row(s.idx.toLong, 0, s.y0, meta.width, s.rows, tArr, vals.toSeq, nodataV, hasData)
      }
    spark.createDataFrame(rdd, H3Raster.tileSchema)
  }

  /** The parsed geotransform + nodata of a GeoTIFF (driver-side IFD read
    * only) — feeds [[H3Raster.nearestH3Resolution]] without touching pixel
    * data. */
  def readGeoTiffMeta(path: String): (Transform, Option[Double], Int, Int) = {
    val m = parseMeta(path)
    (m.transform, m.nodata, m.width, m.height)
  }

  // ---- fixture writer (tests / local oracles) ----------------------------

  /** Write a real single-band strip-organized GeoTIFF: u8 ("u8") or f32
    * ("f32") samples, optional deflate compression and (for u8) the
    * horizontal-differencing predictor, either byte order. Values are
    * row-major doubles (u8 values must be 0..255 integers). Produces the
    * standard tag set: dimensions, layout, ModelPixelScale+ModelTiepoint,
    * GDAL nodata ASCII. */
  def writeGeoTiff(path: String, width: Int, height: Int, transform: Transform,
      values: Array[Double], nodata: Option[Double], dtype: String = "u8",
      deflate: Boolean = false, predictor2: Boolean = false,
      rowsPerStrip: Int = 16, bigEndian: Boolean = false): Unit = {
    require(values.length == width * height, "values must be width*height row-major")
    require(dtype == "u8" || dtype == "f32", s"dtype u8|f32, got $dtype")
    require(!predictor2 || dtype == "u8", "predictor 2 only for integer samples")
    require(transform.b == 0.0 && transform.d == 0.0,
      "fixture writer emits PixelScale+Tiepoint: north-up transforms only")
    val bytesPer = if (dtype == "u8") 1 else 4
    val bits = bytesPer * 8
    val sampleFormat = if (dtype == "u8") 1 else 3

    def w16(v: Int): Array[Byte] =
      if (bigEndian) Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      else Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def w32(v: Long): Array[Byte] = {
      val le = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      if (bigEndian) le.reverse else le
    }
    def wf64(d: Double): Array[Byte] = {
      val bitsL = java.lang.Double.doubleToLongBits(d)
      val be = Array.tabulate(8)(i => ((bitsL >> (56 - 8 * i)) & 0xFF).toByte)
      if (bigEndian) be else be.reverse
    }

    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val stripBytes: Array[Array[Byte]] = Array.tabulate(nStrips) { si =>
      val y0 = si * rowsPerStrip
      val rows = math.min(rowsPerStrip, height - y0)
      val plain = new Array[Byte](width * rows * bytesPer)
      var r = 0
      while (r < rows) {
        var x = 0
        while (x < width) {
          val v = values((y0 + r) * width + x)
          val o = (r * width + x) * bytesPer
          if (dtype == "u8") plain(o) = v.toInt.toByte
          else {
            val fb = java.lang.Float.floatToIntBits(v.toFloat)
            val be = Array.tabulate(4)(i => ((fb >> (24 - 8 * i)) & 0xFF).toByte)
            val enc = if (bigEndian) be else be.reverse
            System.arraycopy(enc, 0, plain, o, 4)
          }
          x += 1
        }
        r += 1
      }
      if (predictor2) {
        var r = 0
        while (r < rows) {
          val row = r * width
          var x = width - 1
          while (x >= 1) {
            plain(row + x) = (plain(row + x) - plain(row + x - 1)).toByte
            x -= 1
          }
          r += 1
        }
      }
      if (!deflate) plain
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(plain); d.finish()
        val buf = new Array[Byte](plain.length + 64)
        val n = d.deflate(buf)
        d.end()
        java.util.Arrays.copyOf(buf, n)
      }
    }

    // layout: header(8) | IFD | tag arrays | nodata ascii | strips
    final case class Tag(tag: Int, typ: Int, count: Long, inline: Option[Long], ext: Array[Byte])
    val ndAscii = nodata.map(nd => (nd.toString + "\u0000").getBytes("US-ASCII"))
    val scale = wf64(transform.a) ++ wf64(-transform.e) ++ wf64(0.0)
    val tie = wf64(0.0) ++ wf64(0.0) ++ wf64(0.0) ++
      wf64(transform.c) ++ wf64(transform.f) ++ wf64(0.0)

    // strip offsets depend on layout size; compute sizes first
    val tagsPre = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Either[Long, Array[Byte]])](
      (256, 4, 1L, Left(width.toLong)),
      (257, 4, 1L, Left(height.toLong)),
      (258, 3, 1L, Left(bits.toLong)),
      (259, 4, 1L, Left(if (deflate) 8L else 1L)),
      (262, 3, 1L, Left(1L)), // BlackIsZero
      (277, 3, 1L, Left(1L)),
      (278, 4, 1L, Left(rowsPerStrip.toLong)),
      (339, 3, 1L, Left(sampleFormat.toLong)),
      (33550, 12, 3L, Right(scale)),
      (33922, 12, 6L, Right(tie)))
    if (predictor2) tagsPre += ((317, 3, 1L, Left(2L)))
    ndAscii.foreach(a => tagsPre += ((42113, 2, a.length.toLong, Right(a))))
    // strip offset/count arrays: LONG each, nStrips entries (external when > 1)
    val nTags = tagsPre.length + 2
    val ifdSize = 2 + nTags * 12 + 4
    var extOff = 8L + ifdSize
    // assign external offsets for pre tags
    val resolved = tagsPre.map {
      case (t, ty, c, Left(v)) => Tag(t, ty, c, Some(v), Array.emptyByteArray)
      case (t, ty, c, Right(a)) =>
        if (a.length <= 4) Tag(t, ty, c, None, a)
        else { val tg = Tag(t, ty, c, Some(extOff), a); extOff += a.length + (a.length & 1); tg }
    }
    val stripOffArrOff = if (nStrips > 1) { val o = extOff; extOff += 4L * nStrips; o } else 0L
    val stripCntArrOff = if (nStrips > 1) { val o = extOff; extOff += 4L * nStrips; o } else 0L
    val stripDataStart = extOff
    val stripOffsets = new Array[Long](nStrips)
    var so = stripDataStart
    for (i <- 0 until nStrips) { stripOffsets(i) = so; so += stripBytes(i).length + (stripBytes(i).length & 1) }

    val out = new java.io.ByteArrayOutputStream()
    out.write(if (bigEndian) Array[Byte]('M', 'M') else Array[Byte]('I', 'I'))
    out.write(w16(42)); out.write(w32(8L))
    // IFD: tags must be ascending by tag id
    val allTags = (resolved.toSeq ++ Seq(
      Tag(273, 4, nStrips.toLong,
        if (nStrips > 1) Some(stripOffArrOff) else Some(stripOffsets(0)), Array.emptyByteArray),
      Tag(279, 4, nStrips.toLong,
        if (nStrips > 1) Some(stripCntArrOff) else Some(stripBytes(0).length.toLong), Array.emptyByteArray)
    )).sortBy(_.tag)
    out.write(w16(allTags.length))
    allTags.foreach { t =>
      out.write(w16(t.tag)); out.write(w16(t.typ)); out.write(w32(t.count))
      t.inline match {
        case Some(v) if t.typ == 3 && t.count == 1 =>
          out.write(w16(v.toInt)); out.write(w16(0))
        case Some(v) => out.write(w32(v))
        case None =>
          val padded = java.util.Arrays.copyOf(t.ext, 4)
          out.write(padded)
      }
    }
    out.write(w32(0L)) // next-IFD pointer
    // external tag arrays, in assignment order
    resolved.filter(t => t.inline.isDefined && t.ext.nonEmpty).foreach { t =>
      out.write(t.ext)
      if ((t.ext.length & 1) == 1) out.write(0)
    }
    if (nStrips > 1) {
      stripOffsets.foreach(o => out.write(w32(o)))
      stripBytes.foreach(s => out.write(w32(s.length.toLong)))
    }
    stripBytes.foreach { s => out.write(s); if ((s.length & 1) == 1) out.write(0) }

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }
}
