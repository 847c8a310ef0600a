package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** Planted-truth recall harness for the approximate ANN paths (the quality
  * twin of the dedup eval in p104): every query vector is a corpus vector
  * with one component nudged by 1e-3, so its true nearest neighbor is known
  * by construction. Recall@5 of the planted neighbor is measured for each
  * index path at 1x and at 30x (corpus replicated with deterministic angular
  * perturbations + disjoint ids — replicas are near the source but strictly
  * farther than the query's 1e-3 nudge, so the planted truth stays valid
  * while the index has to separate the source from 29 decoys). Floors are
  * set with margin below measured recall; the driver query p113_ann_recall
  * pins the 1x protocol hash-exact per round. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NQ = 20

  private lazy val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    .localCheckpoint(false)

  /** corpus replicated `mult`x: replica 0 is the original; replica r > 0
    * offsets ids by r*1e6 and adds a deterministic per-(replica, dim)
    * perturbation ((r*31 + j*7) % 13 - 6) * 0.02 — angularly distinct
    * decoys clustered around every source vector. */
  private def replicated(mult: Int): DataFrame = {
    val reps = spark.range(mult).select($"id".cast("int").as("rep"))
    base.crossJoin(reps).select(
      ($"vec_id" + $"rep".cast("long") * 1000000L).as("vec_id"),
      when($"rep" === 0, $"embedding").otherwise(
        zip_with($"embedding", sequence(lit(0), lit(63)),
          (x, j) => x + (pmod($"rep" * 31 + j * 7, lit(13)) - 6).cast("double") * 0.02))
        .as("embedding"))
      .localCheckpoint(false)
  }

  private def queries(corpus: DataFrame): DataFrame =
    corpus.filter($"vec_id" < NQ).select(
      $"vec_id".as("qid"),
      transform($"embedding",
        (x, i) => x + when(i === 0, lit(0.001)).otherwise(lit(0.0))).as("qvec"))
      .localCheckpoint(false)

  private def recallOf(topk: DataFrame): Double =
    topk.filter($"neighbor_id" === $"query_id").count().toDouble / NQ

  private def allRecalls(corpus: DataFrame): Map[String, Double] = {
    val q = queries(corpus)
    val brute = Similarity.cosineTopK(corpus, $"vec_id", $"embedding",
      q, $"qid", $"qvec", k = 5)
    val ivf = Similarity.ivfCosineTopK(corpus, $"vec_id", $"embedding",
      q, $"qid", $"qvec", m = 16, nprobe = 4, k = 5)
    val proj = Similarity.projectedCosineTopK(corpus, $"vec_id", $"embedding",
      q, $"qid", $"qvec", dimIn = 64, dimOut = 8, coarseK = 50, k = 5)
    val books = Similarity.collectCodebooks(Similarity.pqCodebooks(
      corpus, $"vec_id", $"embedding", dim = 64, m = 4, k = 8, iters = 2))
    val pq = Similarity.pqCosineTopK(corpus, $"vec_id", $"embedding",
      q, $"qid", $"qvec", books, k = 5)
    Map("brute" -> recallOf(brute), "ivf" -> recallOf(ivf),
      "projected" -> recallOf(proj), "pq" -> recallOf(pq))
  }

  test("planted-neighbor recall@5 at 1x: brute exact, approximate paths clear floors") {
    val r = allRecalls(base)
    info(s"1x recall@5: $r")
    assert(r("brute") == 1.0, s"brute recall ${r("brute")}")
    assert(r("ivf") >= 0.8, s"ivf recall ${r("ivf")}")
    assert(r("projected") >= 0.9, s"projected recall ${r("projected")}")
    assert(r("pq") >= 0.5, s"pq recall ${r("pq")}")
  }

  test("planted-neighbor recall@5 at 30x: floors hold against 29 decoys per source") {
    val r = allRecalls(replicated(30))
    info(s"30x recall@5: $r")
    assert(r("brute") == 1.0, s"brute recall ${r("brute")}")
    assert(r("ivf") >= 0.7, s"ivf recall ${r("ivf")}")
    assert(r("projected") >= 0.8, s"projected recall ${r("projected")}")
    assert(r("pq") >= 0.2, s"pq recall ${r("pq")}")
  }
}
