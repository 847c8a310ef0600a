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
 * dimensions, band count, and mean sample brightness. AUDIO decode is
 * REAL: [[decodeAudio]] parses WAV/AU/AIFF containers with
 * `javax.sound.sampled` (also JDK built-in) and extracts sample rate,
 * channel count, frame count, peak, and RMS loudness from the PCM payload.
 * IMAGE resize is REAL too: [[resizeImage]] runs decode → nearest-neighbor
 * resample → BMP re-encode with an explicit floor mapping (no Graphics2D
 * filter kernels), so byte-identical inputs produce byte-identical
 * thumbnails — the dedup-stable property a content-addressed pipeline
 * needs. Only *video* decode remains a clearly-marked deterministic stub
 * ([[decodeStub]]) — no video codec ships with the JDK. Everything around
 * all three is real and tested: schema convention, per-partition batch
 * iteration, null handling, and the declarative downstream plan;
 * [[withDecodedMeta]] takes the decoder and meta schema as parameters, so
 * swapping in a real video codec changes no plumbing.
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

  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

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

  /** REAL audio decode via `javax.sound.sampled` (JDK built-in; the
    * WAV/AU/AIFF readers ship with every JRE). Parses the container
    * header, streams the PCM payload once, and extracts:
    *   sample_rate = frames per second from the format header
    *   channels    = channel count
    *   n_samples   = per-channel sample frames actually decoded
    *   peak        = max |sample| over all channels (16-bit signed range)
    *   rms         = sqrt(mean of sample²) over all interleaved samples,
    *                 quantized floor(x*10000+0.5)/10000 — sample² sums are
    *                 exact longs, so the value is engine-reproducible
    * Only 16-bit signed PCM is decoded (the WAV interchange baseline);
    * other encodings and undecodable bytes return null (→ NULL meta), so a
    * mixed/corrupt payload column degrades to nulls, not a job kill. */
  def decodeAudio(bytes: Array[Byte]): Row = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return null
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return null
      val data = ais.readAllBytes()
      val ch = fmt.getChannels
      val n = data.length / 2
      var sumSq = 0L
      var peak = 0L
      var i = 0
      while (i + 1 < data.length) {
        val s =
          if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
          else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
        sumSq += s.toLong * s
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        i += 2
      }
      val rms =
        if (n == 0) 0.0
        else math.floor(math.sqrt(sumSq.toDouble / n) * 10000.0 + 0.5) / 10000.0
      Row(fmt.getSampleRate.toLong, ch.toLong, (n / ch).toLong, peak, rms)
    } finally ais.close()
  }

  /** Deterministic 16-bit mono PCM WAV test payload: sample i has value
    * `((id*31 + i*17) mod 2003) - 1001` at 8 kHz. Real WAV bytes
    * (AudioSystem's WAVE writer), closed-form expected meta — the oracle
    * for the audio-decode query computes peak/RMS analytically. */
  def syntheticWav(id: Long, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((id * 31 + i * 17) % 2003 - 1001).toShort
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL image resize: decode via `javax.imageio`, NEAREST-NEIGHBOR
    * resample with the explicit floor mapping
    * `src_x = floor(x·srcW/outW)`, `src_y = floor(y·srcH/outH)` (own
    * loop, not Graphics2D, so the pixel-selection convention is exact and
    * oracle-replicable), re-encode as BMP with ImageIO's writer. Returns
    * null for undecodable input. The downsample keeps per-band values
    * bit-identical (selection, not interpolation) — the deterministic
    * choice for dedup-stable thumbnailing at 100 TB, where a float
    * filter kernel would make byte-identical inputs produce
    * platform-dependent outputs. */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, "resize dims must be positive")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val (srcW, srcH) = (img.getWidth, img.getHeight)
    val dst = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * srcH / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * srcW / outW).toInt
        dst.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "bmp", out)
    out.toByteArray
  }

  /** Append a resized copy of `binaryCol` (nearest-neighbor, re-encoded
    * BMP bytes) as `outCol`. Per-partition projection — payloads never
    * shuffle; NULL/undecodable payloads yield NULL output. */
  def withResized(df: DataFrame, binaryCol: String, outW: Int, outH: Int,
      outCol: String = "resized"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = if (r.isNullAt(binIdx)) null
          else resizeImage(r.getAs[Array[Byte]](binIdx), outW, outH)
        Row.fromSeq(r.toSeq :+ out)
      }
    }
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
    * video [[decodeStub]]; pass [[decodeImage]] for image columns or
    * [[decodeAudio]] (with `metaSchema = AudioMetaSchema`) for audio. */
  def withDecodedMeta(df: DataFrame, binaryCol: String, metaCol: String = "meta",
      decode: Array[Byte] => Row = decodeStub,
      metaSchema: StructType = MetaSchema): DataFrame = {
    val schema = df.schema.add(StructField(metaCol, metaSchema, nullable = true))
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
