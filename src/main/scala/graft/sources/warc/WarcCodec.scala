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
