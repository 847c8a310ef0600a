package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

/**
 * Property tests: packing and sessionization against straightforward
 * in-memory reference implementations on randomized inputs (sparse ids,
 * zero counts, duplicate timestamps, boundary-aligned documents).
 */
class PipelinePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = Gen.Parameters.default
  def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).get

  // in-memory reference: sort by id, running offset, cut at budget marks
  private def packRef(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var before = 0L
    rows.filter(_._2 > 0).sortBy(_._1).flatMap { case (id, cnt) =>
      val segs = (before / budget) to ((before + cnt - 1) / budget)
      val out = segs.map { s =>
        val tokStart = math.max(s * budget - before, 0L)
        val tokEnd = math.min((s + 1) * budget - before, cnt)
        (id, s, tokStart, tokEnd - tokStart, math.max(s * budget, before) - s * budget)
      }
      before += cnt
      out
    }
  }

  test("property: packSequences equals the sequential reference on random corpora") {
    val genRows = for {
      n <- Gen.chooseNum(1, 120)
      ids <- Gen.pick(n, 0L until 4000L)
      cnts <- Gen.listOfN(n, Gen.chooseNum(0L, 700L))
    } yield ids.toSeq.zip(cnts)
    for (i <- 0 until 8) {
      val rows = sample(genRows, i)
      val budget = sample(Gen.chooseNum(32L, 512L), 100 + i)
      val width = sample(Gen.chooseNum(1L, 500L), 200 + i)
      val got = Packing.packSequences(rows.toDF("id", "cnt"), $"id", $"cnt",
        budget, width).as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = packRef(rows, budget)
      assert(got == want, s"iter $i budget=$budget width=$width")
    }
  }

  // in-memory reference: per key, sort by ts, split on gap, fold sessions
  private def sessRef(rows: Seq[(Long, Long, Long)], gap: Long): Set[(Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sorted
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._1 - acc.head.head._1 > gap) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (k, i.toLong, s.head._1, s.last._1, s.length.toLong, s.map(_._2).sum)
      }
    }.toSet

  // in-memory reference for corpusReport's percentile convention: value at
  // 1-based rank ceil(q*n) of the ascending (tok_count, doc_id) list
  private def pctRef(lens: Seq[Long], q: Double): Long = {
    val sorted = lens.sorted
    sorted(math.ceil(q * sorted.length).toInt - 1)
  }

  test("property: corpusReport histogram ranks equal the sorted-list convention") {
    val genDocs = for {
      n <- Gen.chooseNum(1, 400)
      rows <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("aa", "bb", "cc")
        len <- Gen.chooseNum(1, 40) // heavy length collisions on purpose
      } yield (lang, len))
    } yield rows.zipWithIndex.map { case ((l, c), i) => (i.toLong, l, c) }
    for (i <- 0 until 8) {
      val rows = sample(genDocs, 700 + i)
      // text with exactly `len` single-char tokens
      val df = rows.map { case (id, l, c) => (id, l, Seq.fill(c)("x").mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      val got = TextOps.corpusReport(df, $"doc_id", $"text", $"lang")
        .select($"lang", $"n_docs", $"p50_tokens", $"p90_tokens", $"p99_tokens")
        .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      rows.groupBy(_._2).foreach { case (lang, docs) =>
        val lens = docs.map(_._3.toLong)
        val r = got(lang)
        assert(r._2 == lens.length)
        assert(r._3 == pctRef(lens, 0.5) && r._4 == pctRef(lens, 0.9) &&
          r._5 == pctRef(lens, 0.99), s"iter $i lang=$lang")
      }
    }
  }

  // in-memory reference for mixSample: floor(rate) copies + md5-lattice extra
  test("property: mixSample copy counts match the closed-form reference") {
    val genRows = for {
      n <- Gen.chooseNum(1, 200)
      ids <- Gen.pick(n, 0L until 5000L)
      strata <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield ids.toSeq.zip(strata)
    val rates = Map("a" -> 2.25, "b" -> 0.4, "c" -> 0.0) // d absent -> 0
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    for (i <- 0 until 6) {
      val rows = sample(genRows, 900 + i)
      val got = Mixing.mixSample(rows.toDF("id", "s"), $"id", $"s", rates, salt = s"s$i")
        .groupBy($"id").count().as[(Long, Long)].collect().toMap
      rows.foreach { case (id, st) =>
        val r10k = math.round(rates.getOrElse(st, 0.0) * 10000.0)
        val extra = if (md5Long(s"${id}s$i") % 10000L < r10k % 10000L) 1L else 0L
        val want = r10k / 10000L + extra
        assert(got.getOrElse(id, 0L) == want, s"iter $i id=$id stratum=$st")
      }
    }
  }

  test("property: sessionize equals the per-key reference on random event sets") {
    val genRows = for {
      n <- Gen.chooseNum(1, 300)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 6L)
        t <- Gen.chooseNum(0L, 5000L)
        v <- Gen.chooseNum(0L, 10000L)
      } yield (k, t, v))
    } yield rows.distinctBy(r => (r._1, r._2)) // unique (key, ts): ties make
    // per-session value sums order-dependent in BOTH impls — not a law
    for (i <- 0 until 8) {
      val rows = sample(genRows, 50 + i)
      val gap = sample(Gen.chooseNum(1L, 800L), 300 + i)
      // values are pre-scaled ints: pass value/100 so the e2 lattice is exact
      val got = Sessions.sessionize(rows.toDF("k", "t", "v"), $"k", $"t",
        $"v" / 100.0, gap).as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == sessRef(rows, gap), s"iter $i gap=$gap")
    }
  }

  // in-memory reference: every duplicated n-gram keeps only the minimal
  // (id, pos) occurrence; tokens under any other occurrence are cut
  private def substrRef(rows: Seq[(Long, String)], n: Int): Map[Long, (String, Long, Long)] = {
    val toks = rows.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, ts) <- toks.toSeq.sortBy(_._1); i <- 0 to ts.length - n) {
      val g = ts.slice(i, i + n).mkString(" ")
      occ(g) = (id, i + 1) :: occ.getOrElse(g, Nil)
    }
    val covered = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((_, os) <- occ if os.length > 1) {
      val first = os.min
      for ((id, p) <- os if (id, p) != first; k <- 0 until n) covered += ((id, p + k))
    }
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered((id, i + 1)) => t }
      val nRm = ts.indices.count(i => covered((id, i + 1)))
      id -> ((kept.mkString(" "), ts.length.toLong, nRm.toLong))
    }
  }

  test("property: freq_sketch_k guarantee holds on random multisets and partitionings") {
    import graft.functions.freq_sketch_k
    // skewed value domain so some items are genuinely heavy and the
    // 2k-buffer purge fires (domain ~40 >> 2k at k=6)
    val genRows = for {
      n <- Gen.chooseNum(50, 1500)
      rows <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.chooseNum(0L, 2L),     // planted-hot candidates
        2 -> Gen.chooseNum(3L, 9L),
        1 -> Gen.chooseNum(10L, 39L)))  // tail
    } yield rows
    for (i <- 0 until 10) {
      val rows = sample(genRows, 900 + i)
      val k = sample(Gen.chooseNum(2, 12), 700 + i)
      val parts = sample(Gen.oneOf(1, 3, 17), 500 + i)
      val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = rows.size
      val bound = n.toDouble / (k + 1)
      val got = rows.toDF("v").repartition(parts)
        .agg(freq_sketch_k(col("v"), k)).collect().head
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"i=$i k=$k: ${got.size} counters")
      trueCounts.foreach { case (v, c) =>
        if (c > bound) assert(got.contains(v),
          s"i=$i k=$k parts=$parts: heavy $v (count $c > $bound) missing")
      }
      got.foreach { case (v, lb) =>
        val c = trueCounts(v)
        assert(lb <= c && lb >= c - bound - 1,
          s"i=$i k=$k parts=$parts: counter $lb for $v out of [$c - $bound, $c]")
      }
    }
  }

  test("property: heavyHitters equals GROUP BY/HAVING brute force on random corpora") {
    val genRows = for {
      n <- Gen.chooseNum(30, 1200)
      rows <- Gen.listOfN(n, Gen.frequency(
        4 -> Gen.chooseNum(0L, 3L),
        1 -> Gen.chooseNum(4L, 99L)))
    } yield rows.map(v => s"tok$v")
    for (i <- 0 until 8) {
      val rows = sample(genRows, 1300 + i)
      val permille = sample(Gen.oneOf(20, 50, 120), 1400 + i)
      val parts = sample(Gen.oneOf(1, 9), 1500 + i)
      val k = 1000 / permille + 1
      val got = Sketches.heavyHitters(rows.toDF("t").repartition(parts),
          col("t"), permille, k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val n = rows.size.toLong
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 1000 >= n * permille }
        .map { case (t, c) => (t, c, n) }.toSet
      assert(got == want, s"i=$i permille=$permille parts=$parts k=$k")
    }
  }

  test("property: substringDedup equals the brute-force reference on random corpora") {
    // tiny vocabulary on purpose: random docs then share many 3-grams,
    // exercising cross-doc spans, within-doc repeats and full wipeouts
    val vocab = Vector("a", "b", "c", "d", "e")
    val genRows = for {
      nDocs <- Gen.chooseNum(1, 30)
      texts <- Gen.listOfN(nDocs, for {
        len <- Gen.chooseNum(0, 14)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (i <- 0 until 6) {
      val rows = sample(genRows, 400 + i)
      val got = Dedup.substringDedup(rows.toDF("doc_id", "text"), $"doc_id", $"text", n = 3)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == substrRef(rows, 3), s"iter $i")
    }
  }

  test("property: asOfJoin equals the brute-force argmax on random keyed timelines") {
    // small key/ts domains force heavy ties and no-match cases
    val genEvents = for {
      n <- Gen.chooseNum(0, 120)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 5)
        ts <- Gen.chooseNum(0, 25)
        side <- Gen.oneOf(0, 1)
      } yield (k.toLong, ts.toLong, side))
    } yield rows.zipWithIndex.map { case ((k, ts, side), i) => (i.toLong, k, ts, side) }
    for (i <- 0 until 6) {
      val rows = sample(genEvents, 900 + i)
      val left = rows.filter(_._4 == 1).map(r => (r._1, r._2, r._3))
      val right = rows.filter(_._4 == 0).map(r => (r._1, r._2, r._3))
      if (left.nonEmpty) {
        val got = Events.asOfJoin(
            left.toDF("seq", "k", "ts").repartition(5), $"k", $"ts", $"seq",
            right.toDF("seq", "k", "ts"), $"k", $"ts", $"seq")
          .collect().map { r =>
            val m = r.getAs[org.apache.spark.sql.Row]("asof")
            r.getLong(0) -> (if (m == null) -1L else m.getLong(0))
          }.toMap
        val want = left.map { case (seq, k, ts) =>
          val cands = right.filter(c => c._2 == k && c._3 <= ts)
          seq -> (if (cands.isEmpty) -1L else cands.maxBy(c => (c._3, c._1))._1)
        }.toMap
        assert(got == want, s"iter $i")
      }
    }
  }
}
