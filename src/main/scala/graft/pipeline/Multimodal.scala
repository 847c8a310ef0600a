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
 * The *decode step is a clearly-marked deterministic stub* — the real
 * codecs (JPEG/PNG/audio) are not available in this container. Everything
 * around it is real and tested: schema convention, per-partition batch
 * iteration, null handling, and the declarative downstream plan. Swapping
 * [[decodeStub]] for a real codec changes no plumbing.
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

  /** Append a `meta` struct decoded per-partition from `binaryCol`. NULL
    * payloads yield NULL meta. */
  def withDecodedMeta(df: DataFrame, binaryCol: String, metaCol: String = "meta"): DataFrame = {
    val schema = df.schema.add(StructField(metaCol, MetaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = if (r.isNullAt(binIdx)) null else decodeStub(r.getAs[Array[Byte]](binIdx))
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
