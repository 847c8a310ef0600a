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
    * the number of records written. */
  def writeResponses(df: DataFrame, dir: String, date: String): Long = {
    val confW = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    val enc = Encoders.product[Rec]
    val counts = df.toDF("uri", "contentType", "payload").as(enc)
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val file = new Path(dir, f"part-${tc.partitionId()}%05d.warc")
        val fs = file.getFileSystem(confW.value)
        val out = new DataOutputStream(fs.create(file, true))
        var n = 0L
        try {
          it.foreach { r =>
            val id = "urn:md5:" + java.security.MessageDigest.getInstance("MD5")
              .digest(r.uri.getBytes("UTF-8")).map("%02x".format(_)).mkString
            WarcCodec.writeRecord(out, "response", id, date, Some(r.uri),
              Some(r.contentType), r.payload)
            n += 1
          }
        } finally out.close()
        Iterator.single(n)
      }(Encoders.scalaLong)
    counts.reduce(_ + _)
  }
}
