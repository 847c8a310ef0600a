package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def counts = docs.select($"doc_id", TextOps.tokenCount($"text").as("cnt"))

  test("packing conservation: every token of every doc packed exactly once") {
    val packed = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 128, bucketWidth = 16)
    // per-doc: segment lengths sum to the doc's token count, segments are
    // contiguous from 0 (tok_start of the k-th segment = sum of prior lens)
    val perDoc = packed.groupBy($"doc_id")
      .agg(sum($"tok_len").as("packed"), min($"tok_start").as("first"),
        max($"tok_start" + $"tok_len").as("lastEnd"), count(lit(1)).as("nseg"))
      .join(counts, "doc_id")
    assert(perDoc.filter($"packed" =!= $"cnt" || $"first" =!= 0 || $"lastEnd" =!= $"cnt").count() == 0)
    assert(perDoc.count() == counts.filter($"cnt" > 0).count())
  }

  test("packing: every sequence except the last is exactly full, offsets tile") {
    val packed = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 128, bucketWidth = 16)
    val perSeq = packed.groupBy($"seq_id").agg(sum($"tok_len").as("fill"))
    val maxSeq = perSeq.agg(max($"seq_id")).as[Long].head()
    assert(perSeq.filter($"seq_id" < maxSeq && $"fill" =!= 128).count() == 0)
    assert(perSeq.filter($"fill" > 128).count() == 0)
    // within a sequence, spans tile [0, fill) without gaps or overlap:
    // sorting segments by seq_offset, each starts where the previous ended
    val tiled = packed.groupBy($"seq_id").agg(
      sort_array(collect_list(struct($"seq_offset", $"tok_len"))).as("segs"))
      .select($"seq_id", aggregate($"segs", lit(0L),
        (acc, s) => when(acc === s.getField("seq_offset"), acc + s.getField("tok_len"))
          .otherwise(lit(-1000000L))).as("cover"),
        aggregate($"segs", lit(0L), (a, s) => a + s.getField("tok_len")).as("fill"))
    assert(tiled.filter($"cover" =!= $"fill").count() == 0)
  }

  test("packing is bucketWidth-invariant (two-level prefix sum is exact)") {
    val a = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 200, bucketWidth = 7)
      .orderBy($"doc_id", $"seq_id").collect()
    val b = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 200, bucketWidth = 1000000)
      .orderBy($"doc_id", $"seq_id").collect()
    assert(a.sameElements(b))
  }

  test("packing scans and shuffles the corpus ONCE (AQE exchange reuse)") {
    // the bucket-prefix branch must read the windowed branch's shuffle
    // output, not re-scan: __bucket is built non-nullable so both
    // subtrees canonicalize equal (see Packing scaladoc)
    val packed = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 128, bucketWidth = 16)
    packed.collect()
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), s"expected ReusedExchange in:\n$plan")
  }

  test("writeShards: contiguous sequence ranges per shard directory") {
    val packed = Packing.packSequences(counts, $"doc_id", $"cnt", budget = 128, bucketWidth = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Packing.writeShards(packed, dir, seqsPerShard = 10)
    val back = spark.read.parquet(dir)
    assert(back.count() == packed.count())
    // every row sits in the shard its seq_id maps to; shards partition the range
    assert(back.filter(floor($"seq_id" / 10) =!= $"shard_id").count() == 0)
    val dirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("shard_id="))
    val maxSeq = packed.agg(max($"seq_id")).as[Long].head()
    assert(dirs == (maxSeq / 10 + 1))
  }

  test("packing: a doc longer than the budget spans multiple sequences") {
    val d = Seq((1L, 10L), (2L, 300L), (3L, 5L)).toDF("id", "cnt")
    val out = Packing.packSequences(d, $"id", $"cnt", budget = 100, bucketWidth = 10)
      .orderBy($"doc_id", $"seq_id").as[(Long, Long, Long, Long, Long)].collect()
    // doc 2 occupies tokens [10, 310): sequences 0..3
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(doc2.map(_._4).sum == 300L)
    assert(doc2.head._3 == 0L && doc2.head._5 == 10L) // starts at seq 0 offset 10
    assert(doc2.last._4 == 10L && doc2.last._5 == 0L) // tail: 10 tokens at seq-3 head
    // zero-token docs produce no rows
    val z = Packing.packSequences(Seq((9L, 0L)).toDF("id", "cnt"), $"id", $"cnt", 100)
    assert(z.count() == 0)
  }
}
