package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object ProfDedup2 {
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
    time("warm")(corpus.count())
    val pairs = Dedup.lshCandidatePairs(corpus, col("doc_id"), col("text"), 8, 2, 2)
      .localCheckpoint(false)
    time("pairs")(pairs.count())
    // identical vs differing split
    val th = corpus.select(col("doc_id").as("__id"), xxhash64(col("text")).as("__th"))
    val pairsH = pairs
      .join(broadcast(th.select(col("__id").as("id_a"), col("__th").as("__ta"))), Seq("id_a"))
      .join(broadcast(th.select(col("__id").as("id_b"), col("__th").as("__tb"))), Seq("id_b"))
    val nSame = time("identical pairs")(pairsH.filter(col("__ta") === col("__tb")).count())
    println(s"[prof] identical=$nSame")
    val verified = Dedup.ngramJaccardVerify(corpus, col("doc_id"), col("text"), 8, 0.5, pairs)
    time("verify")(verified.count())
    val out = Dedup.nearDedup(corpus, col("doc_id"), col("text"))
    time("nearDedup warm1")(out.count())
    time("nearDedup warm2")(Dedup.nearDedup(corpus, col("doc_id"), col("text")).count())
    // text length distribution
    corpus.select(length(col("text")).as("l")).agg(min("l"), avg("l"), max("l")).show()
    spark.stop()
  }
}
