package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextOps}

/** Scratch phase timer for the near-dedup chain. Run:
  * `Test/runMain graft.DedupTimer`. */
object DedupTimer {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def corpus = {
      val d = docs
      d.unionAll(d.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id") + 1000000, concat(col("text"), lit(" extra token tail"))))
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedupTimer] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm
    Dedup.nearDedup(corpus, col("doc_id"), col("text")).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val dfc = time("corpus checkpoint")(corpus.localCheckpoint(false))
      time("corpus count")(dfc.count())
      val sigs = time("signatures")(
        { val s = Dedup.minHashSignatures(dfc, col("doc_id"), col("text"), 8, 2); s.count(); s })
      val pairs = time("lsh pairs")(
        { val p = Dedup.lshCandidatePairs(dfc, col("doc_id"), col("text"), 8, 2, 2); p.count(); p })
      val verified = time("verify")(
        { val v = Dedup.ngramJaccardVerify(dfc, col("doc_id"), col("text"), 8, 0.5, pairs); v.count(); v })
      time("anti-join")(
        dfc.join(verified.select(col("id_b").as("__drop")).distinct(),
          col("doc_id") === col("__drop"), "left_anti").count())
      time("end-to-end nearDedup")(
        Dedup.nearDedup(corpus, col("doc_id"), col("text")).count())

      // verify internals, mirrored from ngramJaccardVerify
      {
        val n = 8; val threshold = 0.5
        val id = col("doc_id"); val text = col("text")
        val pairsC = time("v: pairs ckpt")({ val p = pairs.localCheckpoint(false); p.count(); p })
        val candIds = pairsC.select(col("id_a").as("__id"))
          .unionByName(pairsC.select(col("id_b").as("__id"))).distinct()
        val textInfo = time("v: textInfo")({ val t = dfc.select(id.as("__id"), xxhash64(text).as("__th"),
          greatest(length(lower(trim(text))) - (n - 1), lit(0)).as("__gn"))
          .join(candIds, "__id").localCheckpoint(false); t.count(); t })
        val pairsH = time("v: pairsH")({ val p = pairsC
          .join(broadcast(textInfo.select(col("__id").as("id_a"), col("__th").as("__ta"),
            col("__gn").as("__gna"))), Seq("id_a"))
          .join(broadcast(textInfo.select(col("__id").as("id_b"), col("__th").as("__tb"))), Seq("id_b"))
          .localCheckpoint(false); p.count(); p })
        val differing = pairsH.filter(col("__ta") =!= col("__tb"))
          .select(col("id_a"), col("id_b"))
        val diffIds = differing.select(col("id_a").as("__id"))
          .unionByName(differing.select(col("id_b").as("__id"))).distinct()
        time("v: diffIds count")(diffIds.count())
        time("v: join only")(dfc.select(id.as("__id")).join(diffIds, "__id").count())
        time("v: gramSets old expr")(dfc.select(id.as("__id"), text.as("__text")).join(diffIds, "__id")
          .select(col("__id"),
            sort_array(transform(array_distinct(TextOps.charNgrams(col("__text"), n)),
              gg => xxhash64(gg))).as("__gs")).select(sum(size(col("__gs")))).count())
        val gramSets = time("v: gramSets new expr")({ val g = dfc.select(id.as("__id"), text.as("__text")).join(diffIds, "__id")
          .select(col("__id"),
            graft.functions.sorted_distinct_ngram_hashes(lower(trim(col("__text"))), n).as("__gs"))
          .select(col("__id"), col("__gs"), size(col("__gs")).cast("long").as("__n"))
          .localCheckpoint(false); g.count(); g })
        val interCol = graft.functions.sorted_long_array_intersect_size(col("__ga"), col("__gb"))
        val inter = time("v: intersect")({ val i = differing
          .join(broadcast(gramSets.select(col("__id").as("id_a"), col("__gs").as("__ga"),
            col("__n").as("__na"))), Seq("id_a"))
          .join(broadcast(gramSets.select(col("__id").as("id_b"), col("__gs").as("__gb"),
            col("__n").as("__nb"))), Seq("id_b"))
          .select(col("id_a"), col("id_b"), interCol.as("__inter"), col("__na"), col("__nb"))
          .localCheckpoint(false); i.count(); i })
        time("v: jaccard+union")(inter
          .withColumn("jaccard",
            floor(col("__inter").cast("double") /
              (col("__na") + col("__nb") - col("__inter")).cast("double") * 10000.0 + 0.5)
              .cast("double") / 10000.0)
          .filter(col("jaccard") >= threshold).count())
      }
    }
    spark.stop()
  }
}
