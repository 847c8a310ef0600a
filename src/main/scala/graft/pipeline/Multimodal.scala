package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `BinaryType` columns with typed metadata structs, processed per-partition
 * in batches (the Scala analogue of a vectorized pandas UDF).
 *
 * IMAGE decode is REAL: [[decodeImage]] parses JPEG/PNG/BMP/GIF payload
 * bytes with `javax.imageio` (part of the JDK, headless-safe) and extracts
 * dimensions, band count, and mean sample brightness. The *audio/video*
 * decode remains a clearly-marked deterministic stub ([[decodeStub]]) —
 * those codecs are not available in this container. Everything around both
 * is real and tested: schema convention, per-partition batch iteration,
 * null handling, and the declarative downstream plan; [[withDecodedMeta]]
 * takes the decoder as a parameter, so swapping in a real audio codec
 * changes no plumbing.
 *
 * Scale notes: `mapPartitions` keeps decode zero-shuffle (one pass over the
 * scan); binary payloads never enter a shuffle here — only extracted
 * metadata/features do. Partition sizing is inherited from the source
 * (`spark.sql.files.maxPartitionBytes`), which is the right knob for
 * multi-MB payload rows.
 */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /**
   * STUB decode — deterministic arithmetic standing in for a codec:
   *   width      = payload length mod 640
   *   height     = (payload length * 7) mod 480
   *   channels   = 3
   *   brightness = mean of the first 16 bytes (unsigned)
   *   n_frames   = ceil(length / 32)  ("video" frame sampling stand-in)
   */
  def decodeStub(bytes: Array[Byte]): Row = {
    val len = bytes.length.toLong
    val n = math.min(16, bytes.length)
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xFF; i += 1 }
    val brightness = if (n == 0) 0.0 else BigDecimal(sum.toDouble / n)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    Row(len % 640, (len * 7) % 480, 3L, brightness, (len + 31) / 32)
  }

  /** REAL image decode via `javax.imageio` (JDK built-in, headless-safe;
    * JPEG/PNG/BMP/GIF/WBMP readers ship with every JRE):
    *   width/height = pixel dimensions
    *   channels     = raster band count (3 for 24-bit BMP/JPEG, 4 RGBA…)
    *   brightness   = mean of ALL raster samples (every band of every
    *                  pixel, unsigned), quantized floor(x*100+0.5)/100 —
    *                  the engine-exact 2-decimal convention
    *   n_frames     = 1 (still image)
    * Returns null (→ NULL meta) when the bytes are not a decodable image,
    * so a mixed/corrupt payload column degrades to nulls, not a job kill. */
  def decodeImage(bytes: Array[Byte]): Row = {
    // some plugin readers throw unchecked exceptions (not just
    // IIOException) on adversarial bytes; any decode failure is NULL meta
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h * bands
    val brightness =
      if (n == 0) 0.0
      else math.floor(sum.toDouble / n * 100.0 + 0.5) / 100.0
    Row(w.toLong, h.toLong, bands.toLong, brightness, 1L)
  }

  /** Deterministic 24-bit gray BMP test payload: pixel (x, y) has value
    * `(id*31 + x*7 + y*13) mod 256` in all three channels. Real BMP bytes
    * (ImageIO's BMP writer), closed-form expected meta — the oracle for
    * the image-decode query computes brightness analytically. */
  def syntheticBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Append a `meta` struct decoded per-partition from `binaryCol`. NULL
    * payloads yield NULL meta; the decoder may also return null (e.g.
    * [[decodeImage]] on undecodable bytes). Decoder defaults to the
    * audio/video [[decodeStub]]; pass [[decodeImage]] for image columns. */
  def withDecodedMeta(df: DataFrame, binaryCol: String, metaCol: String = "meta",
      decode: Array[Byte] => Row = decodeStub): DataFrame = {
    val schema = df.schema.add(StructField(metaCol, MetaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = if (r.isNullAt(binIdx)) null else decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** "Frame sampling": one output row per sampled 32-byte block, carrying
    * (frame_idx, frame_hash). Runs as a Generator-style flatMap — fan-out
    * without materializing per-row arrays. */
  def sampleFrames(df: DataFrame, idCol: String, binaryCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_bytes", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(binIdx)) Iterator.empty
        else {
          val id = r.getLong(idIdx)
          val bytes = r.getAs[Array[Byte]](binIdx)
          (0 until (bytes.length + 31) / 32).iterator.map { f =>
            val start = f * 32
            val end = math.min(start + 32, bytes.length)
            var s = 0L
            var i = start
            while (i < end) { s += bytes(i) & 0xFF; i += 1 }
            Row(id, f.toLong, s)
          }
        }
      }
    }
  }
}
