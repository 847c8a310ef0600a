package graft.sources.warc

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets

/**
 * WARC 1.0 (ISO 28500) record grammar — the CommonCrawl container a
 * training-data pipeline ingests raw crawls from. A record is:
 *
 * {{{
 * WARC/1.0\r\n
 * <Name>: <value>\r\n ...          (must include WARC-Type and
 * Content-Length: N\r\n             Content-Length)
 * \r\n
 * <N payload bytes>
 * \r\n\r\n
 * }}}
 *
 * Public format, implemented from the spec — no external deps.
 */
object WarcCodec {

  val Magic: Array[Byte] = "WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Max bytes a version line + header block may span. Anything larger is
    * not a record start (the resync validator's bound; the spec's named
    * fields fit in a fraction of this). */
  val MaxHeaderBlock: Int = 8192

  final case class WarcRecord(offset: Long, headers: Map[String, String],
      payloadStart: Int, contentLength: Long) {
    def header(name: String): Option[String] = headers.get(name.toLowerCase)
    /** absolute offset of the first byte past this record's trailing
      * CRLFCRLF. */
    def end: Long = offset + recordHeaderLen + contentLength + 4
    /** header segment length (version line + headers + blank line). */
    def recordHeaderLen: Long = payloadStart
  }

  /** Parse a record's header block at `pos` in `buf` (which holds file
    * bytes starting at absolute offset `bufBase`). Returns None when the
    * bytes at `pos` are not a well-formed record start — the resync
    * validator. `payloadStart` in the result is RELATIVE to the record
    * start. */
  def parseHeader(buf: Array[Byte], pos: Int, bufBase: Long): Option[WarcRecord] = {
    if (pos + Magic.length > buf.length) return None
    var i = 0
    while (i < Magic.length) {
      if (buf(pos + i) != Magic(i)) return None
      i += 1
    }
    var p = pos + Magic.length
    val limit = math.min(buf.length, pos + MaxHeaderBlock)
    val headers = Map.newBuilder[String, String]
    var contentLength = -1L
    var sawType = false
    while (p < limit) {
      // blank line terminates the header block
      if (p + 1 < buf.length && buf(p) == '\r' && buf(p + 1) == '\n') {
        if (contentLength < 0 || !sawType) return None
        return Some(WarcRecord(bufBase + pos, headers.result(),
          p + 2 - pos, contentLength))
      }
      // one header line: name ":" SP? value CRLF
      var eol = p
      while (eol + 1 < limit && !(buf(eol) == '\r' && buf(eol + 1) == '\n')) eol += 1
      if (eol + 1 >= limit) return None
      val line = new String(buf, p, eol - p, StandardCharsets.UTF_8)
      val colon = line.indexOf(':')
      if (colon <= 0) return None
      val name = line.substring(0, colon)
      if (!name.forall(c => c.isLetterOrDigit || c == '-')) return None
      val value = line.substring(colon + 1).trim
      val lower = name.toLowerCase
      headers += lower -> value
      if (lower == "content-length") {
        contentLength = try value.toLong catch { case _: NumberFormatException => return None }
        if (contentLength < 0) return None
      }
      if (lower == "warc-type") sawType = true
      p = eol + 2
    }
    None // no blank line inside the bound: not a record start
  }

  /** Find the next offset >= `from` (relative index into `buf`) where a
    * validated record starts; -1 when none. */
  def resync(buf: Array[Byte], from: Int, bufBase: Long): Int = {
    var p = from
    val last = buf.length - Magic.length
    while (p <= last) {
      if (buf(p) == 'W' && parseHeader(buf, p, bufBase).isDefined) return p
      p += 1
    }
    -1
  }

  // -------------------------------------------------------------------
  // Per-record gzip members (the CommonCrawl `.warc.gz` wire format:
  // RFC 1952 members back to back, one WARC record per member). JDK
  // zlib only — no external deps.
  // -------------------------------------------------------------------

  /** RFC 1952 member magic + CM=deflate. */
  val GzMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)

  /** Parse a gzip member header at `pos`; returns the offset of the
    * DEFLATE data relative to `pos`, `-1` when MALFORMED (bad magic,
    * method, or reserved flags), `-2` when the header is TRUNCATED
    * within `buf` (more file bytes could complete it). */
  def parseGzHeader(buf: Array[Byte], pos: Int): Int = {
    if (pos + 3 > buf.length) return -2
    if (buf(pos) != GzMagic(0) || buf(pos + 1) != GzMagic(1) ||
      buf(pos + 2) != GzMagic(2)) return -1
    if (pos + 10 > buf.length) return -2
    val flg = buf(pos + 3) & 0xff
    if ((flg & 0xe0) != 0) return -1 // reserved bits must be zero
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > buf.length) return -2
      p += 2 + ((buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (p < buf.length && buf(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= buf.length) -2 else p - pos
  }

  /** [[inflateGzMember]] outcome: the reader must treat truncation
    * (extend the buffer, retry) and corruption (resync past the
    * member) differently — a conflated signal made a corrupt member
    * near the front of a large file buffer to EOF before failing. */
  sealed trait GzInflate
  final case class GzOk(bytes: Array[Byte], compressedLen: Int) extends GzInflate
  case object GzTruncated extends GzInflate
  case object GzCorrupt extends GzInflate

  /** Inflate one complete gzip member at `pos`: [[GzOk]] with the
    * decompressed bytes and exact compressed length, [[GzTruncated]]
    * when more file bytes are needed, [[GzCorrupt]] on a malformed
    * header, DEFLATE error, or CRC32/ISIZE mismatch. */
  def inflateGzMember(buf: Array[Byte], pos: Int): GzInflate = {
    val dataOff = parseGzHeader(buf, pos)
    if (dataOff == -1) return GzCorrupt
    if (dataOff < 0) return GzTruncated
    val p = pos + dataOff
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(buf, p, buf.length - p)
    val out = new java.io.ByteArrayOutputStream(64 << 10)
    val tmp = new Array[Byte](64 << 10)
    val crc = new java.util.zip.CRC32()
    try {
      while (!inf.finished()) {
        val n =
          try inf.inflate(tmp)
          catch { case _: java.util.zip.DataFormatException => return GzCorrupt }
        if (n == 0 && !inf.finished()) {
          // all input consumed -> the DEFLATE stream continues past the
          // buffer; input left over -> the inflater is stuck (e.g.
          // needs-dictionary), which no gzip member ever is
          return if (inf.getRemaining == 0) GzTruncated else GzCorrupt
        }
        crc.update(tmp, 0, n)
        out.write(tmp, 0, n)
      }
      val trailer = p + (buf.length - p - inf.getRemaining)
      if (trailer + 8 > buf.length) return GzTruncated
      def le32(q: Int): Long = (buf(q) & 0xffL) | ((buf(q + 1) & 0xffL) << 8) |
        ((buf(q + 2) & 0xffL) << 16) | ((buf(q + 3) & 0xffL) << 24)
      if (le32(trailer) != crc.getValue) return GzCorrupt
      if (le32(trailer + 4) != (out.size.toLong & 0xffffffffL)) return GzCorrupt
      GzOk(out.toByteArray, trailer + 8 - pos)
    } finally inf.end()
  }

  /** Resync validator for `.warc.gz`: does a gzip member whose DEFLATE
    * stream decodes to a validated WARC record header start at `pos`?
    * Bounded work — inflates at most [[MaxHeaderBlock]] output bytes,
    * no CRC (the consuming read verifies it). MUCH stronger than the
    * plain-format validator: a decoy must be a well-formed gzip header
    * AND a decodable DEFLATE prefix AND decompress to a well-formed
    * record header. */
  def isGzMemberStart(buf: Array[Byte], pos: Int): Boolean = {
    val dataOff = parseGzHeader(buf, pos)
    if (dataOff < 0) return false
    val p = pos + dataOff
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(buf, p, math.min(buf.length - p, MaxHeaderBlock * 2))
    val head = new Array[Byte](MaxHeaderBlock)
    var got = 0
    try {
      while (got < head.length && !inf.finished()) {
        val n =
          try inf.inflate(head, got, head.length - got)
          catch { case _: java.util.zip.DataFormatException => return false }
        if (n == 0) { // needs more input than the probe window: accept
          // only if what we already have validates
          return got >= Magic.length && parseHeader(head, 0, 0L).isDefined
        }
        got += n
      }
      got >= Magic.length && parseHeader(head, 0, 0L).isDefined
    } finally inf.end()
  }

  /** Find the next offset >= `from` where a validated gzip WARC member
    * starts; -1 when none within `buf`. */
  def gzResync(buf: Array[Byte], from: Int): Int = {
    var p = math.max(from, 0)
    val last = buf.length - GzMagic.length
    while (p <= last) {
      if (buf(p) == GzMagic(0) && isGzMemberStart(buf, p)) return p
      p += 1
    }
    -1
  }

  /** Write one record; returns bytes written. Header order is fixed so
    * output is byte-deterministic. */
  def writeRecord(out: DataOutputStream, warcType: String, recordId: String,
      date: String, targetUri: Option[String], contentType: Option[String],
      payload: Array[Byte]): Long = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    contentType.foreach(c => sb.append("Content-Type: ").append(c).append("\r\n"))
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    out.write(head)
    out.write(payload)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    head.length.toLong + payload.length + 4
  }
}
