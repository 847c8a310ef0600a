package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextOps}

object ProfDedup {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id") + 1000000, concat(col("text"), lit(" extra token tail"))))
    time("warmup count")(corpus.count())
    time("warmup2")(corpus.count())
    val sigs = Dedup.minHashSignatures(corpus, col("doc_id"), col("text"), 8, 2)
    time("minhash sigs")(sigs.count())
    val bands = Dedup.lshBands(Dedup.minHashSignatures(corpus, col("doc_id"), col("text"), 8, 2), 8, 2)
    time("bands")(bands.count())
    val pairs = Dedup.lshCandidatePairs(corpus, col("doc_id"), col("text"), 8, 2, 2)
    val nPairs = time("lsh pairs")(pairs.count())
    println(s"[prof] nPairs=$nPairs")
    val verified = Dedup.ngramJaccardVerify(corpus, col("doc_id"), col("text"), 8, 0.5, pairs)
    time("verify (incl pairs rerun)")(verified.count())
    val out = Dedup.nearDedup(corpus, col("doc_id"), col("text"))
    time("nearDedup end-to-end")(out.count())
    time("nearDedup again")(Dedup.nearDedup(corpus, col("doc_id"), col("text")).count())
    spark.stop()
  }
}
