package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/** BPE tokenizer training specs: the distributed trainer is compared
  * against an independent sequential reference implementation (greedy
  * left-to-right merge on symbol lists — no shared code with the
  * double-space replace trick it verifies) on seeded random corpora,
  * plus targeted merge edge cases (self-pairs, interleaved pairs,
  * multi-char merges, early exhaustion). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- independent reference: greedy merge on symbol lists ----
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: t if a == l && b == r => out += (l + r); rest = t
        case a :: t => out += a; rest = t
        case Nil => ()
      }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], n: Int): (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    var vocab: Map[String, (List[String], Long)] =
      words.map { case (w, c) => w -> (w.map(_.toString).toList, c) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var t = 1
    var done = false
    while (t <= n && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) done = true
      else {
        val mx = pc.values.max
        val (l, r) = pc.filter(_._2 == mx).keys.min
        merges += ((t, l, r, mx))
        vocab = vocab.map { case (w, (syms, c)) => w -> (refMerge(syms, l, r), c) }
        t += 1
      }
    }
    (merges.result(), vocab.map { case (w, (syms, _)) => w -> syms })
  }

  private def trainOn(words: Map[String, Long], n: Int): Bpe.Model = {
    val wc = words.toSeq.toDF("w", "cnt").repartition(5)
    Bpe.train(wc, n)
  }

  private def gotVocab(m: Bpe.Model): Map[String, List[String]] =
    m.vocab.select($"w", $"s").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split(" ").toList).toMap

  test("train matches the sequential reference on seeded random corpora (3 seeds)") {
    for (seed <- Seq(41, 13, 97)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc" // small alphabet: later merges must involve learned symbols
      val words = (1 to 120).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.groupBy(identity).map { case (w, g) => w -> (g.size.toLong * (1 + rnd.nextInt(9))) }
      val (wantMerges, wantVocab) = refTrain(words, 12)
      assert(wantMerges.size == 12, s"seed $seed") // 12 rounds stay mergeable
      // the fixture must exercise a multi-char merge (a learned symbol
      // appearing as one side of a later merge)
      assert(wantMerges.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
        s"seed $seed")

      val model = trainOn(words, 12)
      assert(model.merges.map(m => (m.rank, m.l, m.r, m.pairCount)) == wantMerges,
        s"seed $seed")
      assert(gotVocab(model) == wantVocab, s"seed $seed")
    }
  }

  test("trainDistributed (over-bound regime) is byte-identical to the driver trainer") {
    for (seed <- Seq(41, 97)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc"
      val words = (1 to 120).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.groupBy(identity).map { case (w, g) => w -> (g.size.toLong * (1 + rnd.nextInt(9))) }
      val wc = words.toSeq.toDF("w", "cnt").repartition(5)
      val driver = Bpe.train(wc, 12)
      // mergesPerBarrier = 3 so the loop crosses barrier cuts mid-training
      val dist = Bpe.trainDistributed(wc, 12, mergesPerBarrier = 3)
      assert(dist.merges == driver.merges, s"seed $seed: merge lists diverged")
      assert(gotVocab(dist) == gotVocab(driver), s"seed $seed: vocabs diverged")
    }
    // early exhaustion: a fully-merged vocab stops in both regimes
    val tiny = Map("ab" -> 3L)
    val d1 = Bpe.train(tiny.toSeq.toDF("w", "cnt"), 5)
    val d2 = Bpe.trainDistributed(tiny.toSeq.toDF("w", "cnt"), 5)
    assert(d2.merges == d1.merges && d1.merges.length == 1)
    // single-symbol / empty words never produce pairs and never crash the
    // pair explode (size(__a) < 2 rows are filtered, not sliced)
    val edge = Map("a" -> 2L, "" -> 1L, "bb" -> 1L)
    val d3 = Bpe.trainDistributed(edge.toSeq.toDF("w", "cnt"), 3)
    assert(d3.merges.map(m => (m.l, m.r)) == Seq(("b", "b")))
  }

  test("self-pair and interleaved merges apply left-to-right non-overlapping") {
    // "aaa" merging (a,a) -> [aa, a]; "abab" merging (a,b) -> [ab, ab]
    val words = Map("aaa" -> 1L, "abab" -> 100L)
    val model = trainOn(words, 2)
    // round 1: (a,b) count 200; round 2: (ab,ab) count 100 beats (a,a) 2
    assert(model.merges.map(m => (m.l, m.r, m.pairCount)) ==
      Seq(("a", "b", 200L), ("ab", "ab", 100L)))
    assert(gotVocab(model) == Map("aaa" -> List("a", "a", "a"), "abab" -> List("abab")))

    val m2 = trainOn(Map("aaa" -> 5L, "aaaa" -> 1L), 1)
    assert(m2.merges.head.pairCount == 13) // overlaps counted: 2*5 + 3
    assert(gotVocab(m2) == Map("aaa" -> List("aa", "a"), "aaaa" -> List("aa", "aa")))
  }

  test("tie-break is (count desc, l asc, r asc)") {
    // "xy" and "xz" both count 1: (x,y) wins over (x,z)
    val model = trainOn(Map("xy" -> 1L, "xz" -> 1L), 1)
    assert(model.merges.head.l == "x" && model.merges.head.r == "y")
  }

  test("train stops early when the vocab is fully merged") {
    val model = trainOn(Map("ab" -> 3L), 10)
    assert(model.merges.map(m => (m.l, m.r)) == Seq(("a", "b")))
    assert(gotVocab(model) == Map("ab" -> List("ab")))
  }

  test("1000+ merges train in seconds and match the sequential reference") {
    // production-shape merge count: the driver-incremental loop must not
    // cost one Spark round per merge (the pre-rework form did — 1000
    // merges were 1000 scheduled jobs)
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    val words = (1 to 2000).map { _ =>
      (1 to (12 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.groupBy(identity).map { case (w, g) => w -> (g.size.toLong * (1 + rnd.nextInt(5))) }
    val wc = words.toSeq.toDF("w", "cnt").repartition(8)
    val t0 = System.nanoTime()
    val model = Bpe.train(wc, 1000)
    val trainSec = (System.nanoTime() - t0) / 1e9
    assert(model.merges.size == 1000, s"only ${model.merges.size} merges possible")
    assert(trainSec < 30.0, f"1000 merges took $trainSec%.1f s")
    val (wantMerges, wantVocab) = refTrain(words, 1000)
    assert(model.merges.map(m => (m.rank, m.l, m.r, m.pairCount)) == wantMerges)
    assert(gotVocab(model) == wantVocab)
  }

  test("train fails fast over the driver-vocab bound") {
    val wc = Seq(("aa", 1L), ("bb", 2L), ("cc", 3L)).toDF("w", "cnt")
    val e = intercept[IllegalArgumentException] { Bpe.train(wc, 2, maxDriverVocab = 2) }
    assert(e.getMessage.contains("driver-frame bound"))
  }

  test("encodeCounts sums merged symbol counts per document") {
    val docs = Seq((1L, "abab aaa ab"), (2L, "ab"), (3L, "zz zz")).toDF("doc_id", "text")
    val model = Bpe.train(Bpe.wordCounts(docs, col("text")), 2)
    val got = Bpe.encodeCounts(docs, col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: encode each word with the reference-trained merges
    val words = Map("abab" -> 1L, "aaa" -> 1L, "ab" -> 2L, "zz" -> 2L)
    val (refMerges, refVocab) = refTrain(words, 2)
    assert(model.merges.map(m => (m.rank, m.l, m.r, m.pairCount)) == refMerges)
    def nTok(w: String) = refVocab(w).size.toLong
    assert(got == Map(
      1L -> (3L, nTok("abab") + nTok("aaa") + nTok("ab")),
      2L -> (1L, nTok("ab")),
      3L -> (2L, 2 * nTok("zz"))))
  }
}
