package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal}

/** Ad-hoc stage-level timing for a heavy query (local iteration aid, not a
  * gate artifact): breaks p62 into decode / banding / components to see
  * where the wall time goes. Run: `Test/runMain graft.StageProbe [sfDir]`. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    spark.read.parquet(s"$dir/documents.parquet").count()

    for (pass <- 1 to 2) {
      println(s"-- pass $pass --")
      val ids = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).as[Long]
      val wavs = ids.flatMap { id =>
          Seq((id, id, false)) ++
            (if (id % 5 == 0) Seq((id + 10000000L, id, false)) else Nil) ++
            (if (id % 7 == 0) Seq((id + 20000000L, id, true)) else Nil)
        }.map { case (d, src, p) =>
          (d, Multimodal.syntheticWav(src, (400 + src % 100).toInt, p))
        }.toDF("doc_id", "wav")
      val hashed = timed("synth+fingerprint") {
        val h = Multimodal.withAudioFingerprint(wavs, "wav")
          .select(col("doc_id"), col("fp"))
          .localCheckpoint(false)
        h.count(); h
      }
      // hashNearDupGroups internals, timed stage by stage
      val reps = timed("  rep collapse") {
        val r = graft.util.Barriers.statSafe(
          hashed.filter(col("fp").isNotNull)
            .groupBy(col("fp")).agg(min(col("doc_id")).as("__rep"))
            .withColumnRenamed("fp", "__rh"))
        r.count(); r
      }
      val repPairs = timed("  bandedHammingPairs") {
        val p = Dedup.bandedHammingPairs(reps, col("__rep"), col("__rh"),
          bits = 60, maxHamming = 3, maxBand = 1024).localCheckpoint(false)
        println(s"[stage]   (pairs: ${p.count()})"); p
      }
      val comps = timed("  connectedComponents") {
        val c = Dedup.connectedComponents(repPairs).localCheckpoint(false)
        c.count(); c
      }
      val groups = timed("hashNearDupGroups (whole)") {
        val g = Dedup.hashNearDupGroups(hashed, col("doc_id"), col("fp"),
          bits = 60, maxHamming = 3, maxBand = 1024).localCheckpoint(false)
        g.count(); g
      }
      timed("final join+order") {
        hashed.join(groups, Seq("doc_id"))
          .select(col("doc_id"), col("fp"), col("group_id"),
            (col("group_id") === col("doc_id")).as("canonical"))
          .orderBy(col("doc_id")).count()
      }

      // p13 internals (nearDedup chain over the dup-injected corpus)
      println("-- p13 --")
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = d.unionAll(d.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id") + 1000000, concat(col("text"), lit(" extra token tail"))))
      val dfc = timed("  corpus barrier") {
        val c = corpus.localCheckpoint(false); c.count(); c
      }
      val pairs13 = timed("  lshCandidatePairs") {
        val p = Dedup.lshCandidatePairs(dfc, col("doc_id"), col("text"))
          .localCheckpoint(false)
        println(s"[stage]   (cands: ${p.count()})"); p
      }
      val ver13 = timed("  ngramJaccardVerify") {
        val v = Dedup.ngramJaccardVerify(dfc, col("doc_id"), col("text"),
          8, 0.5, pairs13).localCheckpoint(false)
        println(s"[stage]   (verified: ${v.count()})"); v
      }
      timed("  dropVerified(anti-join)") {
        dfc.join(ver13.select(col("id_b").as("__drop")).distinct(),
          col("doc_id") === col("__drop"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
