package graft.sources.warc

import java.io.DataOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders}

import graft.sources.osm.SerializableHadoopConf

/**
 * Distributed WARC writer: each partition writes its own
 * `part-NNNNN.warc` member into `dir` through the Hadoop FS API (object
 * stores included) — no driver collect, the write scales with the
 * cluster like any file sink. Record ids are deterministic
 * (`urn:md5:<md5(uri)>`), dates fixed by the caller, so output bytes are
 * reproducible given the same partitioning.
 */
object WarcWriter {

  final case class Rec(uri: String, contentType: String, payload: Array[Byte])

  /** df(uri STRING, content_type STRING, payload BINARY) → `dir`. Returns
    * the number of records written.
    *
    * Task-commit protocol: each attempt writes
    * `.part-NNNNN.warc.attempt-A.tmp` (invisible to the reader, which
    * only lists `*.warc`) and renames into place when its iterator is
    * exhausted. Rename is the atomic commit: under speculation or task
    * retry the FIRST attempt to rename wins and later attempts discard
    * their temp — readers (including a streaming tail of `dir`) can
    * never observe a half-written or interleaved member. A job that dies
    * mid-write leaves only `.tmp` litter, never a truncated `.warc`. */
  /** As [[writeResponses]] with `gzip = true`: per-RECORD gzip members
    * (`part-NNNNN.warc.gz`), the CommonCrawl wire format — each record
    * its own RFC 1952 member, so the output stays SPLITTABLE for the
    * gz reader and any member is independently decompressible. */
  def writeResponsesGz(df: DataFrame, dir: String, date: String): Long =
    writeResponses(df, dir, date, gzip = true)

  def writeResponses(df: DataFrame, dir: String, date: String,
      gzip: Boolean = false): Long = {
    val confW = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    val enc = Encoders.product[Rec]
    val suffix = if (gzip) ".warc.gz" else ".warc"
    val counts = df.toDF("uri", "contentType", "payload").as(enc)
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val finalFile = new Path(dir, f"part-${tc.partitionId()}%05d$suffix")
        val tmpFile = new Path(dir,
          f".part-${tc.partitionId()}%05d$suffix.attempt-${tc.taskAttemptId()}.tmp")
        val fs = finalFile.getFileSystem(confW.value)
        val out = new DataOutputStream(fs.create(tmpFile, true))
        val md = java.security.MessageDigest.getInstance("MD5")
        var n = 0L
        var committed = false
        try {
          it.foreach { r =>
            val id = "urn:md5:" +
              md.digest(r.uri.getBytes("UTF-8")).map("%02x".format(_)).mkString
            if (gzip) {
              // one gzip member per record: buffer the record bytes,
              // wrap them in their own member. close() through a
              // close-shield: it finishes THIS member and ends the
              // stream's native Deflater (finish() alone leaks zlib
              // state until GC — unbounded RSS on million-record
              // partitions) while the underlying stream stays open.
              val rec = new java.io.ByteArrayOutputStream()
              WarcCodec.writeRecord(new DataOutputStream(rec), "response", id,
                date, Some(r.uri), Some(r.contentType), r.payload)
              val shield = new java.io.FilterOutputStream(out) {
                // FilterOutputStream's default array write loops per
                // byte — delegate the bulk write
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  out.write(b, off, len)
                override def close(): Unit = flush() // keep `out` open
              }
              val gz = new java.util.zip.GZIPOutputStream(shield, 64 << 10)
              gz.write(rec.toByteArray)
              gz.close() // finish member + Deflater.end()
            } else {
              WarcCodec.writeRecord(out, "response", id, date, Some(r.uri),
                Some(r.contentType), r.payload)
            }
            n += 1
          }
          out.close()
          // commit: rename onto an existing destination fails, so the
          // FIRST attempt wins and later attempts discard their temp.
          // (Write into a fresh dir — the callers delete it first; a
          // stale same-name member would win over this job's output.)
          committed = fs.rename(tmpFile, finalFile)
          if (!committed) fs.delete(tmpFile, false)
        } finally {
          if (!committed) { // failure path: never leave a visible partial
            try out.close() catch { case _: Throwable => }
            fs.delete(tmpFile, false)
          }
        }
        Iterator.single(n)
      }(Encoders.scalaLong)
    counts.reduce(_ + _)
  }
}
