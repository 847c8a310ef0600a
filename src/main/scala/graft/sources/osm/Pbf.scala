package graft.sources.osm

import java.io.ByteArrayOutputStream

/**
 * Minimal protobuf wire-format codec — just the subset the OSM PBF format
 * uses (varint/zigzag scalars, length-delimited fields, packed repeated
 * numerics). Hand-rolled from the public protobuf encoding spec so the
 * engine needs no protobuf dependency; the OSM message layouts themselves
 * live in [[OsmPbfCodec]].
 *
 * Wire types: 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
 * A field key is `(fieldNumber << 3) | wireType`.
 */
object Pbf {

  // ---------------------------------------------------------------- read

  /** Cursor-based reader over one message's bytes `[from, until)`. */
  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        require(pos < end && shift < 64, s"varint overruns buffer at $pos")
        b = buf(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }

    def readZigzag(): Long = {
      val v = readVarint()
      (v >>> 1) ^ -(v & 1)
    }

    /** Returns the field key; 0 when the message is exhausted. */
    def readKey(): Long = if (hasMore) readVarint() else 0L

    /** Sub-reader over a length-delimited field's payload; advances past it. */
    def readDelimited(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, s"delimited field overruns buffer ($len at $pos)")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readBytes(): Array[Byte] = {
      val r = readDelimited()
      java.util.Arrays.copyOfRange(buf, r.pos, r.end)
    }

    def readString(): String = {
      val r = readDelimited()
      new String(buf, r.pos, r.end - r.pos, java.nio.charset.StandardCharsets.UTF_8)
    }

    /** Skip one field's value given its key. */
    def skip(key: Long): Unit = (key & 7) match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => readDelimited(); ()
      case 5 => pos += 4
      case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
    }

    def packedVarints(): Array[Long] = {
      val r = readDelimited()
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      while (r.hasMore) out += r.readVarint()
      out.toArray
    }

    def packedZigzags(): Array[Long] = {
      val r = readDelimited()
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      while (r.hasMore) out += r.readZigzag()
      out.toArray
    }
  }

  def fieldNumber(key: Long): Int = (key >>> 3).toInt

  // --------------------------------------------------------------- write

  /** Append-only writer; `delimited` wraps a nested message with its
    * length prefix (two-pass via a scratch buffer — block sizes here are
    * bounded by the PBF spec's 32 MB blob limit, so the copy is cheap). */
  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    def writeZigzag(v: Long): Unit = writeVarint((v << 1) ^ (v >> 63))

    def key(field: Int, wireType: Int): Unit = writeVarint((field.toLong << 3) | wireType)

    def bytesField(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); writeVarint(b.length); out.write(b, 0, b.length)
    }

    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def varintField(field: Int, v: Long): Unit = { key(field, 0); writeVarint(v) }

    def packedVarintField(field: Int, vs: Iterable[Long]): Unit = {
      val w = new Writer
      vs.foreach(w.writeVarint)
      bytesField(field, w.toBytes)
    }

    def packedZigzagField(field: Int, vs: Iterable[Long]): Unit = {
      val w = new Writer
      vs.foreach(w.writeZigzag)
      bytesField(field, w.toBytes)
    }

    def messageField(field: Int, m: Writer): Unit = bytesField(field, m.toBytes)

    /** Append already-encoded fields verbatim (no key, no length). */
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)

    def toBytes: Array[Byte] = out.toByteArray
  }
}
