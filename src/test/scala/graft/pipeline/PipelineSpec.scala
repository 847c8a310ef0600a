package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.SparkTestSession

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup removes byte-identical copies, keeps min id") {
    val d = docs.select($"doc_id", $"text")
    val corpus = d.unionAll(d.select($"doc_id" + 1000000, $"text"))
    val out = Dedup.exactDedup(corpus, $"text", $"doc_id")
    assert(out.count() == d.count())
    assert(out.agg(max($"doc_id")).as[Long].head() < 1000000)
  }

  test("minhash signature is permutation-min and stable") {
    val sig = Dedup.minHashSignatures(docs.limit(20), $"doc_id", $"text", k = 4)
    assert(sig.count() == 20)
    val row = sig.orderBy($"__id").first()
    // recompute independently for doc 0
    val text = docs.filter($"doc_id" === row.getLong(0)).select($"text").as[String].head()
    val toks = text.trim.toLowerCase.split("\\s+")
    val shingles = toks.sliding(2).map(_.mkString(" ")).toSeq
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val hs = shingles.map(md5Long(_) % Dedup.MinHashPrime)
    val (a, b) = Dedup.minHashCoeffs(0)
    val expected = hs.map(h => (h * a + b) % Dedup.MinHashPrime).min
    assert(row.getLong(1) == expected)
  }

  test("lsh candidates contain planted near-duplicates") {
    val d = docs.select($"doc_id", $"text").limit(50)
    val corpus = d.unionAll(
      d.filter($"doc_id" % 5 === 0).select($"doc_id" + 1000000, concat($"text", lit(" tail"))))
    val pairs = Dedup.lshCandidatePairs(corpus, $"doc_id", $"text", k = 8)
      .as[(Long, Long)].collect().toSet
    val planted = d.filter($"doc_id" % 5 === 0).select($"doc_id").as[Long].collect()
    val found = planted.count(id => pairs.contains((id, id + 1000000)))
    assert(found >= planted.length * 8 / 10, s"found only $found of ${planted.length} planted pairs")
  }

  test("simhash: near-identical docs have small hamming distance") {
    val d = docs.select($"doc_id", $"text").limit(30)
    val corpus = d.unionAll(d.select($"doc_id" + 1000000, concat($"text", lit(" tail"))))
    val sh = Dedup.simHash(corpus, $"doc_id", $"text")
    val a = sh.filter($"__id" < 1000000).select($"__id".as("ida"), $"simhash".as("ha"))
    val b = sh.filter($"__id" >= 1000000).select(($"__id" - 1000000).as("ida"), $"simhash".as("hb"))
    val dists = a.join(b, "ida")
      .select(Dedup.hammingDistance($"ha", $"hb").as("d")).as[Int].collect()
    // one appended token flips a small fraction of bits; bound scales with
    // the hash width (was <= 8 at 31 bits)
    val bound = Dedup.SimHashBits / 4
    assert(dists.nonEmpty && dists.forall(_ <= bound), s"max hamming ${dists.max}")
  }

  test("simhash banding is scale-safe: wide bands, hot-band cap, degenerate-band guard") {
    // band width floor: at the default maxHamming=3 every pigeonhole band
    // must carry >= 12 bits (2^12+ distinct values) or the band self-join
    // degenerates toward all-pairs at corpus scale (VERDICT r03 #1)
    assert(Dedup.SimHashBits >= 60)
    assert(Dedup.simHashBandWidth(3) >= 12, s"band width ${Dedup.simHashBandWidth(3)}")
    // hot band: byte-identical docs share one simhash -> one band bucket;
    // a cap of 5 keeps C(5,2)=10 pairwise pairs among the 5 smallest ids
    // PLUS a linear star (0, x) for every other member — beyond-cap
    // members still collapse onto the canonical minimum, never quadratic
    val hot = (0 until 40).map(i => (i.toLong, "identical text body of the hot band spam"))
      .toDF("doc_id", "text")
    val capped = Dedup.simHashNearDupPairs(hot, $"doc_id", $"text", maxHamming = 3, maxBand = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(capped.length == 10 + 35, s"expected C(5,2)+35 star pairs, got ${capped.length}")
    assert(capped.filter(_._2 >= 5).forall(_._1 == 0L), "stars must anchor at the bucket min")
    assert(capped.map(_._2).toSet ++ Set(0L) == (0L until 40L).toSet,
      "every member must appear in some candidate pair")
    // uncapped finds the full C(40,2) set (hamming 0 everywhere)
    assert(Dedup.simHashNearDupPairs(hot, $"doc_id", $"text", maxHamming = 3,
      maxBand = Int.MaxValue).count() == 40L * 39 / 2)
    // a maxHamming that would force 0-bit bands is rejected, not silently
    // degenerated into an all-pairs join (ADVICE r03)
    intercept[IllegalArgumentException] {
      Dedup.simHashNearDupPairs(hot, $"doc_id", $"text", maxHamming = Dedup.SimHashBits)
    }
  }

  test("simhash banding recall is exactly 1.0 vs brute-force hamming") {
    val d = docs.select($"doc_id", $"text").limit(60)
    val corpus = d.unionAll(d.filter($"doc_id" % 5 === 0)
      .select($"doc_id" + 1000000, concat($"text", lit(" tail"))))
    val banded = Dedup.simHashNearDupPairs(corpus, $"doc_id", $"text", maxHamming = 3,
      maxBand = Int.MaxValue)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect().toSet
    val sh = Dedup.simHash(corpus, $"doc_id", $"text")
    val a = sh.select($"__id".as("id_a"), $"simhash".as("ha"))
    val b = sh.select($"__id".as("id_b"), $"simhash".as("hb"))
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", Dedup.hammingDistance($"ha", $"hb").cast("long").as("h"))
      .filter($"h" <= 3).as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, s"banding missed ${brute -- banded}, invented ${banded -- brute}")
  }

  test("double_array_dot matches aggregate(zip_with) including length mismatch -> NULL") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // equal length
      (Seq(1.0, 2.0), Seq(4.0, 5.0, 6.0)),        // left shorter
      (Seq(1.0, 2.0, 3.0), Seq(4.0))              // right shorter
    ).toDF("a", "b")
    val composed = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(Similarity.dot(col("a"), col("b")).as("d"), composed.as("c")).collect()
    assert(rows.head.getDouble(0) == 32.0 && rows.head.getDouble(1) == 32.0)
    rows.drop(1).foreach { r =>
      assert(r.isNullAt(0), "mismatched dims must yield NULL, not a truncated dot")
      assert(r.isNullAt(1))
    }
  }

  test("term_counts matches per-term size(filter) incl. dups, nulls, empty") {
    val terms = Seq("spark", "row", "spark", "merge") // duplicate term on purpose
    val df = Seq(
      Some(Seq("spark", "row", "spark", "x", "merge", "row")),
      Some(Seq[String]()),
      None
    ).toDF("toks")
    val composed = terms.map(t => size(filter(col("toks"), x => x === lit(t))).cast("long"))
    val rows = df.select(
      graft.functions.term_counts(col("toks"), terms).as("tc"),
      array(composed: _*).as("ref")).collect()
    rows.foreach { r =>
      // null input: term_counts yields NULL; the composed form yields an
      // array of per-term NULLs (size(filter(null,..)) is null per slot)
      if (r.isNullAt(0)) assert(r.getSeq[Any](1).forall(_ == null))
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    assert(rows(0).getSeq[Long](0) == Seq(2L, 2L, 2L, 1L)) // dup term gets full count
  }

  test("lineDedup: global first-occurrence-wins, within-doc dups drop, short lines bypass") {
    val d = Seq(
      (1L, "unique one\nshared boilerplate line\nok\nshared boilerplate line"),
      (2L, "shared boilerplate line\nunique two"),
      (3L, "ok\n\nunique three")
    ).toDF("doc_id", "text")
    val out = TextOps.lineDedup(d, $"doc_id", $"text", minLineChars = 5)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // doc 1 keeps the FIRST occurrence of the shared line, drops its own repeat
    assert(out(0) == ((1L, "unique one\nshared boilerplate line\nok", 4L, 1L)))
    // doc 2 loses the shared line (doc 1 idx 1 < doc 2 idx 0 lexicographically on (doc,idx))
    assert(out(1) == ((2L, "unique two", 2L, 1L)))
    // "ok" (4 chars) and "" bypass dedup everywhere
    assert(out(2) == ((3L, "ok\n\nunique three", 3L, 0L)))
  }

  test("lineDedup: null-text docs survive with zeroed accounting (one row per input doc)") {
    val d = Seq((1L, Some("keep this line\nand this one")), (2L, None), (3L, Some("third doc line")))
      .toDF("doc_id", "text")
    val out = TextOps.lineDedup(d, $"doc_id", $"text", minLineChars = 5)
      .orderBy($"doc_id").collect()
    assert(out.length == 3, "every input doc must appear exactly once")
    val nullRow = out(1)
    assert(nullRow.getLong(0) == 2L && nullRow.isNullAt(1))
    assert((nullRow.getLong(2), nullRow.getLong(3), nullRow.getLong(4)) == ((0L, 0L, 0L)))
    assert(out(0).getLong(2) == 2L && out(2).getLong(2) == 1L)
  }

  test("substringDedup: duplicated n-gram spans cut, global-first kept, self-repeats trimmed") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"), // holds the first "beta gamma delta"
      (2L, "x beta gamma delta y"),           // loses positions 2-4
      (3L, "beta gamma delta"),               // fully duplicated -> empty
      (4L, "p q r s p q r s"),                // within-doc repeat: second period cut
      (5L, "solo")                            // shorter than n: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, $"doc_id", $"text", n = 3)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "alpha beta gamma delta epsilon", 5L, 0L)))
    assert(out(1) == ((2L, "x y", 5L, 3L)))
    assert(out(2) == ((3L, "", 3L, 3L)))
    // "p q r"@5 and "q r s"@6 are marked (keepers at 1 and 2): tokens 5-8 go
    assert(out(3) == ((4L, "p q r s", 8L, 4L)))
    assert(out(4) == ((5L, "solo", 1L, 0L)))
    // null text -> null out, not a fabricated empty string
    val withNull = d.unionAll(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nullRow = Dedup.substringDedup(withNull, $"doc_id", $"text", n = 3)
      .filter($"doc_id" === 6L).collect().head
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3))
  }

  test("importanceResample: target-like docs outrank corpus-typical; lattice values exact") {
    val corpus = Seq(
      (1L, "common common common"),
      (2L, "target target target"),
      (3L, "common target")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "target target target target")).toDF("doc_id", "text")
    val out = TextOps.importanceResample(corpus, $"doc_id", $"text", target, $"text", k = 1)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    // corpus LM: common=4, target=4, denom=10 -> lp_e4 = floor(ln(.5)e4+.5) = -6931 both
    // target LM: target=4, denom=5 -> lp_e4(target)=0, lp_e4(common)=floor(ln(.2)e4+.5) = -16094
    // lr(common) = -16094+6931 = -9163; lr(target) = 0+6931 = 6931
    assert(out(0) == ((1L, -0.9163, false)))
    assert(out(1) == ((2L, 0.6931, true)))   // only doc 2 selected at k=1
    assert(out(2) == ((3L, -0.1116, false))) // floor((-9163+6931)/2 + .5) = -1116
  }

  test("mixSample drops zero-copy rows and is deterministic under growth") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "s")
    val rates = Map("a" -> 2.0, "b" -> 0.0) // c absent -> rate 0
    val out = Mixing.mixSample(d, $"id", $"s", rates, salt = "t")
      .select($"id", $"copy_idx").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
    // growth stability: adding rows never changes an existing id's copies
    val grown = Mixing.mixSample(d.unionAll(Seq((9L, "a")).toDF("id", "s")),
      $"id", $"s", rates, salt = "t")
      .filter($"id" < 9).select($"id", $"copy_idx").as[(Long, Long)].collect().toSet
    assert(grown == out)
  }

  test("unigramLogProbScore under Zipf skew: AQE splits the hot-token partition, values unchanged") {
    // the >broadcast-vocab regime (a 100-TB corpus's vocabulary does not
    // broadcast): force the token-keyed join to sort-merge and hand AQE
    // test-sized skew thresholds
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // test-sized thresholds: the hot partition is only ~1 MB raw and its
    // repeated token compresses to a few KB of shuffle bytes
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
    // coalescing would merge the small test partitions and mask the skew
    // decision this spec is about
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // Zipf fixture: every other token is 'the' (one token = 50% of all
    // instances), the rest spread over 5000 types
    def zipf(s: org.apache.spark.sql.SparkSession) = s.range(20000).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(99)), j =>
        when(j % 2 === 0, lit("the"))
          .otherwise(concat(lit("tok"), pmod(col("id") * 37 + j, lit(5000))))), " ")
        .as("text"))
    val skewed = TextOps.unigramLogProbScore(zipf(s2), col("doc_id"), col("text"))
    val got = skewed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val plan = skewed.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected the non-broadcast regime:\n${plan.take(1500)}")
    assert(plan.contains("skew=true"), s"AQE did not split the hot token:\n${plan.take(1500)}")
    // the skew-handled run is value-identical to the default session's
    val plain = TextOps.unigramLogProbScore(zipf(spark), col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == plain.toSet && got.length == 20000)
  }

  test("connectedComponents: pointer halving converges a 200-link chain inside 30 rounds") {
    // a path graph is the worst case for plain min-label propagation
    // (O(diameter) rounds — a 200-link chain needs ~199); pointer halving
    // must close it within the default maxRounds = 30 (O(log d))
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(labels.length == 201)
    assert(labels.forall(_._2 == 0L),
      s"chain under-merged: ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("hashNearDupGroups == pairwise nearDupGroups when the cap does not bind; null-hash singletons") {
    // mixed fixture: identical-hash classes (ids sharing v), near pairs
    // (hamming 1-2 across classes), isolated hashes, and null hashes
    val rows = Seq(
      (1L, java.lang.Long.valueOf(0x1234L)), (2L, java.lang.Long.valueOf(0x1234L)),
      (3L, java.lang.Long.valueOf(0x1234L)),                 // class A (identical)
      (4L, java.lang.Long.valueOf(0x1235L)),                 // hamming 1 from A -> same group
      (5L, java.lang.Long.valueOf(0x5000L)), (6L, java.lang.Long.valueOf(0x5000L)), // class B
      (7L, java.lang.Long.valueOf(0x7f0fL)),                 // isolated
      (8L, null.asInstanceOf[java.lang.Long]),               // null hash
      (9L, java.lang.Long.valueOf(0x5003L)))                 // hamming 2 from B -> same group
    val hashed = rows.toDF("doc_id", "h")
    val viaHash = Dedup.hashNearDupGroups(hashed, col("doc_id"), col("h"),
        bits = 63, maxHamming = 2).as[(Long, Long)].collect().toMap
    val pairs = Dedup.bandedHammingPairs(hashed, col("doc_id"), col("h"),
      bits = 63, maxHamming = 2)
    val viaPairs = Dedup.nearDupGroups(hashed, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaHash == viaPairs, s"collapse changed groups: $viaHash vs $viaPairs")
    assert(viaHash(1L) == 1L && viaHash(3L) == 1L && viaHash(4L) == 1L)
    assert(viaHash(5L) == 5L && viaHash(9L) == 5L)
    assert(viaHash(7L) == 7L && viaHash(8L) == 8L)
  }

  test("hashNearDupGroups: a 5k-member identical-hash clique groups in one pass, no pair explode") {
    // the 30x-probe pathology in miniature: one hash value with 5000
    // members saturates every band bucket of the pairwise path (C(1024,2)
    // pairs per band); the collapse must group it via ONE representative —
    // measured here only through exact output (all members -> min id)
    val n = 5000
    val hashed = spark.range(n).select(
      (col("id") + 100L).as("doc_id"),
      when(col("id") % 2 === 0, lit(0x0FF0L)).otherwise(lit(0x0FF1L)).as("h"))
    val groups = Dedup.hashNearDupGroups(hashed, col("doc_id"), col("h"),
        bits = 63, maxHamming = 2).as[(Long, Long)].collect()
    assert(groups.length == n)
    // the two hash classes are hamming-1 apart: everything is ONE group
    // anchored at the global min id
    assert(groups.forall(_._2 == 100L),
      s"clique under-merged: ${groups.filter(_._2 != 100L).take(5).toSeq}")
  }

  test("videoClipMatches collapse == direct per-frame pairwise counts (incl. repeated identical frames)") {
    // fixture exercises every contribution shape: identical frames
    // REPEATED within a video (v1 has hash A twice), shared across videos
    // (v2 has A once, v3 has A three times), near-hashes (B = A^1 in v4),
    // an isolated hash, and a null hash row
    val rows = Seq(
      (1L, 0L, java.lang.Long.valueOf(0xA0L)), (1L, 1L, java.lang.Long.valueOf(0xA0L)),
      (2L, 0L, java.lang.Long.valueOf(0xA0L)),
      (3L, 0L, java.lang.Long.valueOf(0xA0L)), (3L, 1L, java.lang.Long.valueOf(0xA0L)),
      (3L, 2L, java.lang.Long.valueOf(0xA0L)),
      (4L, 0L, java.lang.Long.valueOf(0xA1L)),            // hamming 1 from A
      (5L, 0L, java.lang.Long.valueOf(0x7000L)),          // isolated
      (6L, 0L, null.asInstanceOf[java.lang.Long]))        // undecodable frame
    val frames = rows.toDF("vid", "fi", "h")
    val got = Dedup.videoClipMatches(frames, col("vid"), col("fi"), col("h"),
        maxHamming = 2).as[(Long, Long, Long)].collect().toSet
    // direct reference: every unordered cross-video frame pair with
    // hamming <= 2, counted per video pair
    val fr = rows.filter(_._3 != null)
    val expect = (for {
      (va, fa, ha) <- fr; (vb, fb, hb) <- fr
      if va < vb || (va == vb && fa < fb)
      if va != vb
      if java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (math.min(va, vb), math.max(va, vb)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    assert(got == expect, s"collapse diverged:\n got=$got\n exp=$expect")
    // sanity anchors: v1(2xA) x v3(3xA) = 6 frame pairs; v4's near-hash B
    // matches every A occurrence
    assert(got.contains((1L, 3L, 6L)))
    assert(got.contains((1L, 4L, 2L)) && got.contains((3L, 4L, 3L)))
    assert(!got.exists(m => m._1 == 5L || m._2 == 5L || m._1 == 6L || m._2 == 6L))
  }

  test("audioFingerprint: closed-form energy lattice; retouch stays near; garbage -> null") {
    // fingerprint of real WAV bytes == fingerprint of the by-construction
    // energy grid (pins the decode + frame/stripe assignment)
    def expected(id: Long, n: Int, perturb: Boolean): Long = {
      val e = Array.ofDim[Long](16, 5)
      for (i <- 0 until n) {
        val s = (id * 31 + i * 17) % 2003 - 1001 +
          (if (perturb && i % 37 == 0) 1 else 0)
        e((i * 16 / n).toInt)(i % 5) += s * s
      }
      var h = 0L
      for (f <- 1 until 16; b <- 0 until 4)
        if ((e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1)) > 0)
          h |= 1L << ((f - 1) * 4 + b)
      h
    }
    for (id <- Seq(0L, 9L, 42L)) {
      val n = (400 + id % 100).toInt
      val got = Multimodal.audioFingerprint(Multimodal.syntheticWav(id, n))
      assert(got == expected(id, n, perturb = false), s"id=$id")
      assert(got >= 0L, "60-bit fingerprint stays in the positive Long range")
    }
    // identical bytes collide; the faint click track stays within a small
    // Hamming distance while different ids' signals are far
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = Seq(0L, 7L, 14L, 21L)
    val retouch = ids.map { id =>
      val n = (400 + id % 100).toInt
      ham(Multimodal.audioFingerprint(Multimodal.syntheticWav(id, n)),
        Multimodal.audioFingerprint(Multimodal.syntheticWav(id, n, perturb = true)))
    }
    assert(retouch.forall(_ <= 3), s"click-track copies drifted: $retouch")
    val unrelated = for (Seq(a, b) <- ids.combinations(2).toSeq) yield ham(
      Multimodal.audioFingerprint(Multimodal.syntheticWav(a, (400 + a % 100).toInt)),
      Multimodal.audioFingerprint(Multimodal.syntheticWav(b, (400 + b % 100).toInt)))
    assert(unrelated.max > 10, s"unrelated signals too close: $unrelated")

    assert(Multimodal.audioFingerprint("not audio".getBytes("UTF-8")) == null)
    val df = Seq((1L, null: Array[Byte]), (2L, Multimodal.syntheticWav(2L, 400)))
      .toDF("id", "wav")
    val hs = Multimodal.withAudioFingerprint(df, "wav").orderBy($"id")
      .select($"fp").collect()
    assert(hs(0).isNullAt(0) && !hs(1).isNullAt(0))
  }

  test("connectedComponents with reliable checkpointDir: same labels, files written") {
    // pointer halving converges in ~log2(diameter) rounds, so a chain
    // long enough to force at least one reliable-checkpoint round
    // (ReliableEvery = 5) needs diameter >> 2^5
    // driverEdgeLimit = 0 pins the DISTRIBUTED regime — reliable
    // checkpointing only exists there (the driver union-find path has no
    // lineage to protect)
    val pairs = (0L until 400L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val plain = Dedup.connectedComponents(pairs, driverEdgeLimit = 0)
      .as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ckpt = Dedup.connectedComponents(pairs, checkpointDir = Some(dir),
        driverEdgeLimit = 0)
      .as[(Long, Long)].collect().toSet
    assert(ckpt == plain)
    assert(plain.forall(_._2 == 0L), "one chain = one component labeled by min id")
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint rounds must write files")
  }

  test("imagePHash: decode+sampling pinned by the closed-form grid; retouch stays near; garbage -> null") {
    // identity sampling: 16x16 pattern BMP == phash of the by-construction grid
    def grid(id: Long, perturb: Boolean, scale: Int): Array[Array[Long]] = {
      val h = (id * 2654435761L) % 2147483648L
      Array.tabulate(16, 16) { (x, y) =>
        val (sx, sy) = (x * scale, y * scale) // floor map for W = H = 16*scale
        val base = ((h >> 24) % 255 + sx * (3 + h % 13) + sy * (5 + (h >> 8) % 11)
          + sx.toLong * sy * ((h >> 16) % 7)) % 255
        3 * (base + (if (perturb && (sx + sy) % 9 == 0) 1 else 0))
      }
    }
    val h9 = Multimodal.imagePHash(Multimodal.syntheticPatternBmp(9L, 16, 16, false))
    assert(h9 == Multimodal.phashOfGrid(grid(9L, false, 1)))
    assert(h9 >= 0L, "63-bit hash must stay in the positive Long range")

    // floor-sampling path: a 32x32 image hashes as its 16x16 floor-sample
    val h32 = Multimodal.imagePHash(Multimodal.syntheticPatternBmp(9L, 32, 32, false))
    assert(h32 == Multimodal.phashOfGrid(grid(9L, false, 2)))

    // byte-identical copies collide exactly; the sparse +1 retouch stays
    // within a small Hamming distance while typical unrelated images do not
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = Seq(0L, 7L, 14L, 21L, 28L, 35L)
    val retouch = ids.map { id =>
      val base = Multimodal.imagePHash(Multimodal.syntheticPatternBmp(id, 16, 16, false))
      assert(base == Multimodal.imagePHash(Multimodal.syntheticPatternBmp(id, 16, 16, false)))
      ham(base, Multimodal.imagePHash(Multimodal.syntheticPatternBmp(id, 16, 16, true)))
    }
    assert(retouch.forall(_ <= 3), s"retouched copies drifted: $retouch")
    val unrelated = for (Seq(a, b) <- ids.combinations(2).toSeq) yield ham(
      Multimodal.imagePHash(Multimodal.syntheticPatternBmp(a, 16, 16, false)),
      Multimodal.imagePHash(Multimodal.syntheticPatternBmp(b, 16, 16, false)))
    assert(unrelated.max > 10, s"unrelated textures too close: $unrelated")

    assert(Multimodal.imagePHash("not an image".getBytes("UTF-8")) == null)
    // NULL payloads flow through the plumbing as NULL hashes
    val df = Seq((1L, null: Array[Byte]),
      (2L, Multimodal.syntheticPatternBmp(2L, 16, 16, false))).toDF("id", "img")
    val hs = Multimodal.withPHash(df, "img").orderBy($"id").select($"phash").collect()
    assert(hs(0).isNullAt(0) && !hs(1).isNullAt(0))
  }

  test("videoFramePHashes: clip frames hash identical to source frames; matches found; garbage -> null") {
    import org.apache.spark.sql.functions.col
    // a clip cut at frameOffset=1 is pixel-identical to source frames 1..2,
    // so its per-frame pHashes must EQUAL the source's shifted hashes
    val full = Multimodal.videoFramePHashes(
      Multimodal.syntheticPatternAvi(11L, 16, 16, 4)).toMap
    val clip = Multimodal.videoFramePHashes(
      Multimodal.syntheticPatternAvi(11L, 16, 16, 2, frameOffset = 1)).toMap
    assert(full.size == 4 && clip.size == 2)
    assert(clip(0L) == full(1L) && clip(1L) == full(2L),
      "clip hashes must equal the source's shifted frame hashes")
    assert(Multimodal.videoFramePHashes("not avi".getBytes("UTF-8")) == null)

    // end-to-end: clipMatches finds the clip against its source
    val avis = Seq(
      (1L, Multimodal.syntheticPatternAvi(11L, 16, 16, 4)),
      (2L, Multimodal.syntheticPatternAvi(11L, 16, 16, 2, frameOffset = 1)),
      (3L, Multimodal.syntheticPatternAvi(999L, 16, 16, 4))).toDF("vid", "avi")
    val frames = Multimodal.withVideoFramePHashes(avis, "vid", "avi")
    val got = Dedup.videoClipMatches(frames, col("id"), col("frame_idx"), col("phash"))
      .as[(Long, Long, Long)].collect().map { case (a, b, n) => ((a, b), n) }.toMap
    assert(got.getOrElse((1L, 2L), 0L) >= 2L,
      s"clip must match its source on both frames, got $got")
  }

  test("bandedHammingPairs on 63-bit hashes: recall exactly 1.0 vs brute force") {
    // deterministic LCG hashes + planted <=2-bit-flip near pairs
    def lcg(s: Long) = s * 6364136223846793005L + 1442695040888963407L
    val base = Iterator.iterate(12345L)(lcg).drop(1).take(120)
      .map(_ & Long.MaxValue).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toSeq
    val planted = base.collect { case (i, h) if i % 4 == 0 =>
      (i + 1000L, h ^ (1L << (i % 63)) ^ (if (i % 8 == 0) 1L << ((i * 7 + 11) % 63) else 0L))
    }
    val all = (base ++ planted).toDF("id", "h")
    val got = Dedup.bandedHammingPairs(all, $"id", $"h", bits = 63,
      maxHamming = 2, maxBand = Int.MaxValue)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect().toSet
    val rows = (base ++ planted)
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(got == brute, s"missed ${brute -- got}, invented ${got -- brute}")
    assert(brute.nonEmpty, "planted near pairs must exist or the law is vacuous")
  }

  test("decodeImage: real PNG + BMP decode matches known pixels; garbage -> NULL meta") {
    // 3x2 PNG with hand-set per-channel values
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 10, 20, 30), (1, 0, 40, 50, 60), (2, 0, 70, 80, 90),
      (0, 1, 100, 110, 120), (1, 1, 130, 140, 150), (2, 1, 160, 170, 180))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val meta = Multimodal.decodeImage(out.toByteArray)
    assert(meta.getLong(0) == 3 && meta.getLong(1) == 2 && meta.getLong(2) == 3)
    val sum = px.map { case (_, _, r, g, b) => r + g + b }.sum
    assert(meta.getDouble(3) == math.floor(sum.toDouble / 18 * 100 + 0.5) / 100)
    assert(meta.getLong(4) == 1L)

    // syntheticBmp roundtrip: closed-form brightness
    val bmpMeta = Multimodal.decodeImage(Multimodal.syntheticBmp(42L, 8, 6))
    val s = (for (x <- 0 until 8; y <- 0 until 6) yield (42L * 31 + x * 7 + y * 13) % 256).sum
    assert(bmpMeta.getLong(0) == 8 && bmpMeta.getLong(1) == 6 && bmpMeta.getLong(2) == 3)
    assert(bmpMeta.getDouble(3) == math.floor(3 * s.toDouble / 144 * 100 + 0.5) / 100)

    // undecodable payload degrades to NULL meta through the plumbing
    val df = Seq((1L, "definitely not an image".getBytes("UTF-8")),
      (2L, Multimodal.syntheticBmp(7L, 8, 6))).toDF("id", "img")
    val metas = Multimodal.withDecodedMeta(df, "img", "meta", Multimodal.decodeImage)
      .orderBy($"id").select($"meta").collect()
    assert(metas(0).isNullAt(0) && !metas(1).isNullAt(0))
  }

  test("decodeAudio: real WAV/AIFF decode matches closed-form PCM; garbage/8-bit -> NULL meta") {
    // syntheticWav roundtrip: closed-form peak and rms
    val n = 64
    val samples = (0 until n).map(i => (9L * 31 + i * 17) % 2003 - 1001)
    val meta = Multimodal.decodeAudio(Multimodal.syntheticWav(9L, n))
    assert(meta.getLong(0) == 8000 && meta.getLong(1) == 1 && meta.getLong(2) == n)
    assert(meta.getLong(3) == samples.map(math.abs).max)
    val sumSq = samples.map(v => v * v).sum
    assert(meta.getDouble(4) ==
      math.floor(math.sqrt(sumSq.toDouble / n) * 10000 + 0.5) / 10000)

    // big-endian AIFF with the same samples decodes to identical meta
    // (exercises the endianness branch and a second JDK container reader)
    val fmtBE = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcmBE = new Array[Byte](n * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcmBE(i * 2) = ((v >> 8) & 0xFF).toByte
      pcmBE(i * 2 + 1) = (v & 0xFF).toByte
    }
    val outBE = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBE), fmtBE, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, outBE)
    assert(Multimodal.decodeAudio(outBE.toByteArray) == meta)

    // non-16-bit PCM is declared unsupported -> null, not garbage values
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val out8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](32)(7)), fmt8, 32L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out8)
    assert(Multimodal.decodeAudio(out8.toByteArray) == null)

    // undecodable payload degrades to NULL meta through the plumbing
    val df = Seq((1L, "definitely not audio".getBytes("UTF-8")),
      (2L, Multimodal.syntheticWav(3L, 50))).toDF("id", "wav")
    val metas = Multimodal.withDecodedMeta(df, "wav", "meta",
        Multimodal.decodeAudio, Multimodal.AudioMetaSchema)
      .orderBy($"id").select($"meta").collect()
    assert(metas(0).isNullAt(0) && !metas(1).isNullAt(0))
  }

  test("resizeImage: nearest-neighbor selection is exact; upscale repeats; garbage -> null") {
    // 4x2 source with distinct per-pixel values
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 4; y <- 0 until 2) {
      val v = 10 * (y * 4 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val src = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", src)
    // downsample 4x2 -> 2x1: dst (x, 0) selects src (2x, 0)
    val down = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.resizeImage(src.toByteArray, 2, 1)))
    assert(down.getWidth == 2 && down.getHeight == 1)
    assert((down.getRGB(0, 0) & 0xFF) == 0 && (down.getRGB(1, 0) & 0xFF) == 20)
    // upscale 4x2 -> 8x2: dst (x, y) selects src (x/2, y) — pixels repeat
    val up = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.resizeImage(src.toByteArray, 8, 2)))
    assert(up.getWidth == 8 && up.getHeight == 2)
    for (x <- 0 until 8)
      assert((up.getRGB(x, 0) & 0xFF) == 10 * (x / 2), s"x=$x")
    // undecodable payload -> null through the frame op
    val df = Seq((1L, "not an image".getBytes("UTF-8")), (2L, src.toByteArray))
      .toDF("id", "img")
    val out = Multimodal.withResized(df, "img", 2, 1, "thumb")
      .orderBy($"id").select($"thumb").collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("decodeVideo: real AVI container parse matches closed-form pixels; corrupt -> null") {
    val id = 42L; val (w, h, nf) = (7, 5, 3)
    val avi = Multimodal.syntheticAvi(id, w, h, nf)
    val meta = Multimodal.decodeVideo(avi)
    assert(meta != null)
    assert(meta.getLong(0) == w && meta.getLong(1) == h && meta.getLong(2) == 3L)
    assert(meta.getLong(4) == nf)
    // closed-form brightness: mean over all frames/pixels/bands
    var sum = 0L
    for (f <- 0 until nf; x <- 0 until w; y <- 0 until h)
      sum += 3 * ((id * 31 + f * 19 + x * 7 + y * 13) % 256)
    val n = w.toLong * h * 3 * nf
    assert(meta.getDouble(3) == math.floor(sum.toDouble / n * 100.0 + 0.5) / 100.0)
    // padding skip is load-bearing: width 7 rows carry 3 bytes of 0xFF
    // padding each; a padding-naive sum would be higher — recompute it
    // and prove it differs from the decoded brightness
    val stride = 24 // ((7*3+3)/4)*4
    val naive = sum + nf.toLong * h * (stride - w * 3) * 0xFF
    assert(math.floor(naive.toDouble / n * 100.0 + 0.5) / 100.0 != meta.getDouble(3))
    // corrupt inputs: wrong magic, truncated mid-chunk, compressed stream
    assert(Multimodal.decodeVideo("not a video".getBytes("UTF-8")) == null)
    assert(Multimodal.decodeVideo(avi.take(avi.length - 7)) == null)
    val compressed = avi.clone() // flip biCompression (strf + 16) to 1
    val strfOff = {
      def find(p: String): Int = {
        val pat = p.getBytes("US-ASCII")
        (0 to compressed.length - 4).find(i => pat.indices.forall(j => compressed(i + j) == pat(j))).get
      }
      find("strf")
    }
    compressed(strfOff + 8 + 16) = 1
    assert(Multimodal.decodeVideo(compressed) == null)
  }

  test("MJPEG AVI: container walk + per-frame JPEG decode; solid frames bucket-exact; corrupt -> null") {
    val (w, h, nf) = (16, 16, 3)
    val id = 9L
    val avi = Multimodal.syntheticMjpegAvi(id, w, h, nf, solid = true)
    val meta = Multimodal.decodeVideo(avi)
    assert(meta != null, "MJPEG container must decode")
    assert(meta.getLong(0) == w && meta.getLong(1) == h && meta.getLong(2) == 3L)
    assert(meta.getLong(4) == nf)
    // solid gray survives the JPEG round-trip within ±2 per sample, so the
    // mean lands within ±2 of the closed-form frame-value mean
    val expMean = (0 until nf).map(f => Multimodal.mjpegSolidValue(id, f)).sum.toDouble / nf
    assert(math.abs(meta.getDouble(3) - expMean) <= 2.0,
      s"brightness ${meta.getDouble(3)} vs closed-form $expMean")
    // per-frame sums: each frame's mean sample is bucket-exact
    val rows = Multimodal.sampleVideoFrames(
        Seq((1L, avi)).toDF("vid", "payload"), "vid", "payload")
      .orderBy($"frame_idx").collect()
    assert(rows.length == nf)
    rows.foreach { r =>
      val f = r.getLong(4).toInt
      val mean = r.getLong(5).toDouble / (w * h * 3)
      assert((mean / 10).toInt == Multimodal.mjpegSolidValue(id, f) / 10,
        s"frame $f mean $mean not in bucket of ${Multimodal.mjpegSolidValue(id, f)}")
    }
    // corrupt: a frame payload not starting with the JPEG SOI marker
    val bad = avi.clone()
    val fcc = "00dc".getBytes("US-ASCII")
    val frameOff = (0 to bad.length - 4).find(i => fcc.indices.forall(j => bad(i + j) == fcc(j))).get
    bad(frameOff + 8) = 0x00 // first payload byte: 0xFF -> 0x00
    assert(Multimodal.decodeVideo(bad) == null)
    assert(Multimodal.decodeVideo("not avi".getBytes("UTF-8")) == null)
  }

  test("MJPEG clip detection: re-cut shares byte-identical JPEG frames -> exact hash matches") {
    import org.apache.spark.sql.functions.col
    // textured MJPEG: clip frame f is pixel-identical to source frame
    // f+1, so the encoder emits byte-identical JPEGs and the hashes are
    // EQUAL — no assumption about JPEG loss anywhere
    val full = Multimodal.videoFramePHashes(
      Multimodal.syntheticMjpegAvi(11L, 16, 16, 4)).toMap
    val clip = Multimodal.videoFramePHashes(
      Multimodal.syntheticMjpegAvi(11L, 16, 16, 2, frameOffset = 1)).toMap
    assert(full.size == 4 && clip.size == 2)
    assert(clip(0L) == full(1L) && clip(1L) == full(2L),
      "MJPEG clip hashes must equal the source's shifted frame hashes")
    // e2e through the SAME banded pipeline the DIB path uses
    val avis = Seq(
      (1L, Multimodal.syntheticMjpegAvi(11L, 16, 16, 4)),
      (2L, Multimodal.syntheticMjpegAvi(11L, 16, 16, 2, frameOffset = 1)),
      (3L, Multimodal.syntheticMjpegAvi(999L, 16, 16, 4))).toDF("vid", "avi")
    val frames = Multimodal.withVideoFramePHashes(avis, "vid", "avi")
    val got = Dedup.videoClipMatches(frames, col("id"), col("frame_idx"), col("phash"))
      .as[(Long, Long, Long)].collect().map { case (a, b, n) => ((a, b), n) }.toMap
    assert(got.getOrElse((1L, 2L), 0L) >= 2L,
      s"MJPEG clip must match its source on both frames, got $got")
  }

  test("sampleVideoFrames: every-kth frame on real chunk boundaries, exact sums") {
    val df = Seq(
      (1L, Multimodal.syntheticAvi(1L, 7, 5, 4)),
      (2L, Multimodal.syntheticAvi(2L, 7, 5, 2)),
      (3L, "garbage".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("vid", "payload")
    val out = Multimodal.sampleVideoFrames(df, "vid", "payload", every = 2)
      .orderBy($"id", $"frame_idx").collect()
    // vid 1 (4 frames) samples frames 0, 2; vid 2 (2 frames) samples 0;
    // garbage and NULL payloads contribute no rows
    assert(out.map(r => (r.getLong(0), r.getLong(4))).toSeq ==
      Seq((1L, 0L), (1L, 2L), (2L, 0L)))
    def expect(id: Long, f: Long): Long = {
      var s = 0L
      for (x <- 0 until 7; y <- 0 until 5)
        s += 3 * ((id * 31 + f * 19 + x * 7 + y * 13) % 256)
      s
    }
    out.foreach { r =>
      assert(r.getLong(1) == 7L && r.getLong(2) == 5L)
      assert(r.getLong(5) == expect(r.getLong(0), r.getLong(4)),
        s"frame sum mismatch at ${(r.getLong(0), r.getLong(4))}")
    }
  }

  test("brute-force ANN: self is rank 1 with sim 1.0") {
    val out = Similarity.cosineTopK(embs, $"vec_id", $"embedding",
      embs.filter($"vec_id" < 5), $"vec_id", $"embedding", k = 3)
      .filter($"rank" === 1).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0))
  }

  test("bucketed ANN recall vs brute force is reasonable") {
    val q = embs.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(embs, $"vec_id", $"embedding", q, $"vec_id", $"embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.bucketedCosineTopK(embs, $"vec_id", $"embedding", q, $"vec_id", $"embedding",
      dim = 64, bits = 4, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // 4-bit buckets: coarse but useful
    // every query finds at least itself
    assert(approx.count { case (a, b) => a == b } == 20)
  }

  test("PQ-ADC ANN: codes well-formed, encoding partition-invariant, recall vs brute force") {
    val books = Similarity.collectCodebooks(
      Similarity.pqCodebooks(embs, $"vec_id", $"embedding", dim = 64, m = 4, k = 8, iters = 2))
    assert(books.length == 4 && books.forall(_.length == 8))
    assert(books.forall(_.forall(_._2.length == 16)))
    // codes: one id per subspace, each a valid centroid id of that book
    val coded = Similarity.pqAssignProjection(embs, $"vec_id", $"embedding", books)
    val rows = coded.collect()
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4)
      cs.zipWithIndex.foreach { case (c, s) => assert(books(s).exists(_._1 == c)) }
      assert(r.getDouble(2) > 0.0) // recon norm positive
    }
    // projection-only encoding is partitioning-invariant
    val again = Similarity.pqAssignProjection(embs.repartition(13), $"vec_id", $"embedding", books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Int](1)))

    val q = embs.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(embs, $"vec_id", $"embedding", q, $"vec_id", $"embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqCosineTopK(embs, $"vec_id", $"embedding",
        q, $"vec_id", $"embedding", books, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // 4x8 codes = 12 bits/vector (42x compression at dim 64): coarse but
    // far above the 3/N random-top-3 floor
    assert(recall >= 0.3, s"PQ recall $recall")
  }

  test("cluster-balanced mix moves cluster mass toward uniform") {
    val out = graft.PipelineQueries.queries("p81_cluster_mix")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val totalIn = out.map(_._1).sum.toDouble
    val totalOut = out.map(_._2).sum.toDouble
    val target = totalIn / 8.0
    val imbalanceIn = out.map(x => math.abs(x._1 - target)).sum / totalIn
    val imbalanceOut = out.map(x => math.abs(x._2 - totalOut / out.size)).sum / totalOut
    // the fixture's kmeans clusters are measurably uneven (5.8% mean
    // deviation at sf0.001), and the mix strictly reduces the imbalance
    assert(imbalanceIn > 0.02, s"fixture not uneven: $imbalanceIn")
    assert(imbalanceOut < imbalanceIn,
      s"imbalance in=$imbalanceIn out=$imbalanceOut")
    // every surviving cluster lands within sampling noise of its target
    out.foreach { case (_, nOut) =>
      assert(math.abs(nOut - totalOut / out.size) / (totalOut / out.size) < 0.35)
    }
  }

  test("IVF ANN: self found at rank 1; recall vs brute force scales with nprobe") {
    val q = embs.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(embs, $"vec_id", $"embedding", q, $"vec_id", $"embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): (Double, Set[(Long, Long)]) = {
      val approx = Similarity.ivfCosineTopK(embs, $"vec_id", $"embedding", q, $"vec_id", $"embedding",
        m = 16, nprobe = nprobe, k = 3)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (exact.count(approx.contains).toDouble / exact.size, approx)
    }
    val (r1, _) = recallAt(1)
    val (r4, a4) = recallAt(4)
    assert(r4 >= r1, s"recall must not shrink with more probes: $r1 -> $r4")
    assert(r4 >= 0.3, s"nprobe=4 recall $r4")
    // every query's own vector lives in the probed list (nearest centroid
    // is probed first), so self is always found
    assert(a4.count { case (a, b) => a == b } == 20)
  }

  test("embedding near-dup: exact finds planted scaled copies; LSH removes them") {
    val e = embs.filter($"vec_id" < 100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val corpus = e.unionAll(e.filter($"vec_id" % 5 === 0)
      .select($"vec_id" + 1000000, transform($"v", x => x * 1.5d)))
    val planted = e.filter($"vec_id" % 5 === 0).select($"vec_id").as[Long].collect().toSet
    // exact: every planted (v, 1.5v) pair scores cosine 1.0
    val pairs = Dedup.embeddingNearDupPairs(corpus, $"vec_id", $"v", 0.995)
      .as[(Long, Long, Double)].collect()
    val found = pairs.collect { case (a, b, s) if b == a + 1000000 && s == 1.0 => a }.toSet
    assert(found == planted, s"missing ${planted -- found}")
    // LSH path: scaling preserves hyperplane signs -> same bucket -> every
    // planted duplicate (the higher id) is removed
    val survivors = Dedup.embeddingNearDupLsh(corpus, $"vec_id", $"v",
      dim = 64, bits = 4, threshold = 0.995).select($"vec_id").as[Long].collect().toSet
    assert(planted.forall(a => !survivors.contains(a + 1000000)),
      "planted scaled copies must be deduplicated")
    assert(planted.forall(survivors.contains), "canonical representatives must survive")
  }

  test("semanticDedup: planted copies drop within their cluster; SemDeDup contract holds") {
    val e = embs.filter($"vec_id" < 100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val corpus = e.unionAll(e.filter($"vec_id" % 5 === 0)
      .select($"vec_id" + 1000000, transform($"v", x => x * 1.5d)))
    val planted = e.filter($"vec_id" % 5 === 0).select($"vec_id").as[Long].collect().toSet
    val out = Dedup.semanticDedup(corpus, $"vec_id", $"v",
      m = 4, iters = 1, threshold = 0.995)
    val rows = out.as[(Long, Long)].collect()
    val survivors = rows.map(_._1).toSet
    // a scaled copy has cosine exactly 1.0 with its original AND the same
    // centroid argmax (cosine is scale-invariant) -> same cluster -> dropped
    assert(planted.forall(a => !survivors.contains(a + 1000000)),
      "planted scaled copies must be deduplicated")
    assert(planted.forall(survivors.contains), "canonical representatives must survive")
    // cluster ids match the trained quantizer's assignment
    val cents = Similarity.kMeansCentroids(corpus, $"vec_id", $"v", 4, 1)
    val expect = Similarity.ivfAssign(
        corpus.select($"vec_id", $"v".as("embedding")), $"vec_id", $"embedding", cents)
      .select($"vec_id", $"centroid_id".cast("long")).as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cid) => assert(expect(id) == cid, s"cluster of $id") }
    // SemDeDup contract: no same-cluster survivor pair is >= threshold
    // (brute-force over the collected survivors)
    val vecs = corpus.select($"vec_id", $"v").as[(Long, Seq[Double])].collect().toMap
    def q4cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val sim = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.floor(sim * 10000 + 0.5) / 10000
    }
    for {
      Seq((ia, ca), (ib, cb)) <- rows.sortBy(_._1).toSeq.combinations(2)
      if ca == cb
    } assert(q4cos(vecs(ia), vecs(ib)) < 0.995, s"surviving pair ($ia,$ib)")
  }

  test("semanticDedup hot-cluster guard: planted copies still drop, survivors superset") {
    val e = embs.filter($"vec_id" < 100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val corpus = e.unionAll(e.filter($"vec_id" % 5 === 0)
      .select($"vec_id" + 1000000, transform($"v", x => x * 1.5d)))
    val planted = e.filter($"vec_id" % 5 === 0).select($"vec_id").as[Long].collect().toSet
    val full = Dedup.semanticDedup(corpus, $"vec_id", $"v",
      m = 4, iters = 1, threshold = 0.995)
      .select($"vec_id").as[Long].collect().toSet
    // refineMinSize=1 forces EVERY cluster through the sub-bucket path
    val refined = Dedup.semanticDedup(corpus, $"vec_id", $"v",
      m = 4, iters = 1, threshold = 0.995,
      dim = 64, refineBits = 4, refineMinSize = 1L)
      .select($"vec_id").as[Long].collect().toSet
    // sign invariance under positive scaling: a scaled copy shares its
    // original's bucket, so the guard never saves a planted duplicate
    assert(planted.forall(a => !refined.contains(a + 1000000)))
    assert(planted.forall(refined.contains))
    // bucketing can only MISS pairs -> can only drop fewer -> superset
    assert(full.subsetOf(refined),
      s"refined survivors must be a superset; lost ${full -- refined}")
  }

  test("multimodal stub: meta matches direct byte arithmetic") {
    val withPayload = docs.limit(10).select($"doc_id", $"text".cast("binary").as("payload"), $"text")
    val out = Multimodal.withDecodedMeta(withPayload, "payload")
      .select($"doc_id", $"text", $"meta.width", $"meta.brightness").collect()
    out.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      assert(r.getLong(2) == bytes.length % 640)
      val expected = BigDecimal(bytes.take(16).map(_ & 0xff).sum / 16.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expected)
    }
  }

  test("ngrams on short inputs are empty, not corrupt (ADVICE r01)") {
    // docs shorter than the gram size must yield empty arrays; before the
    // explicit sequence step, sequence(1,0) -> [1,0] crashed wordNgrams
    // (element_at index 0) and gave charNgrams two truncated grams
    val df = Seq((1L, "ab"), (2L, "one two"), (3L, ""), (4L, "exactly eight chars!")).toDF("id", "text")
    val out = df.select($"id",
      TextOps.charNgrams($"text", 8).as("cg"),
      TextOps.wordNgrams($"text", 3).as("wg")).collect().map(r =>
        r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2))).toMap
    assert(out(1L)._1.isEmpty && out(1L)._2.isEmpty)
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty) // 7 chars, 2 tokens
    assert(out(3L)._1.isEmpty && out(3L)._2.isEmpty)
    assert(out(4L)._1.length == 13 && out(4L)._2.length == 1)
    // minhash pipeline end-to-end survives short docs now
    val sig = Dedup.minHashSignatures(df, $"id", $"text", k = 4)
    assert(sig.count() == 2) // only docs with >= 1 shingle produce rows
  }

  test("hot LSH bucket is capped to pairwise-min-k plus linear stars (ADVICE r02 + r15 recall fix)") {
    // 40 byte-identical docs land in one bucket for every band; a cap of 5
    // keeps C(5,2)=10 pairwise pairs among the 5 smallest ids plus a
    // linear star (0, x) for each of the 35 beyond-cap members — so
    // nearDedup still collapses the mega-group to ONE representative
    // (pre-r15 truncation silently kept every beyond-cap member)
    val hot = (0 until 40).map(i => (i.toLong, "identical text body of the hot bucket spam"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(hot, $"doc_id", $"text", k = 8, maxBucket = 5)
      .as[(Long, Long)].collect()
    assert(pairs.length == 10 + 35, s"expected C(5,2)+35 star pairs, got ${pairs.length}")
    assert(pairs.filter(_._2 >= 5).forall(_._1 == 0L), "stars must anchor at the bucket min")
    // the mega-dup group fully collapses under the capped end-to-end dedup
    val kept = Dedup.nearDedup(hot, $"doc_id", $"text", maxBucket = 5)
      .select($"doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(0L), s"mega-dup group must keep only the min id, kept ${kept.length}")
    // and the uncapped default still produces the full C(40,2) set
    val full = Dedup.lshCandidatePairs(hot, $"doc_id", $"text", k = 8).count()
    assert(full == 40L * 39 / 2)
  }

  test("lshBands rejects band packing that would overflow int64") {
    val sig = Dedup.minHashSignatures(docs.limit(5), $"doc_id", $"text", k = 8)
    intercept[IllegalArgumentException] { Dedup.lshBands(sig, k = 8, rowsPerBand = 4) }
  }

  test("dedup laws: exactDedup idempotent; no verified pair survives nearDedup") {
    val d = docs.select($"doc_id", $"text")
    val corpus = d.unionAll(d.filter($"doc_id" % 4 === 0)
      .select($"doc_id" + 1000000, concat($"text", lit(" tail"))))
    // exactDedup is idempotent
    val once = Dedup.exactDedup(corpus, $"text", $"doc_id")
    val twice = Dedup.exactDedup(once, $"text", $"doc_id")
    assert(once.count() == twice.count())
    // nearDedup's guarantee: bands are deterministic per document, so any
    // candidate pair among survivors was a candidate in the original run;
    // every verified pair lost its higher member — re-running detection on
    // the survivors must verify ZERO pairs
    val survivors = Dedup.nearDedup(corpus, $"doc_id", $"text")
    val rePairs = Dedup.lshCandidatePairs(survivors, $"doc_id", $"text", k = 8)
    val reVerified = Dedup.ngramJaccardVerify(survivors, $"doc_id", $"text",
      n = 8, threshold = 0.5, rePairs)
    assert(reVerified.isEmpty, s"survivors still contain verified near-dups")
  }

  test("langId picks declared language on marker-rich text") {
    val df = Seq(
      (1L, "the cat and the dog of a house is in the garden"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "le chat et la maison est une du les"),
      (4L, "xyzzy qwerty asdf")).toDF("id", "text")
    val out = df.select($"id", TextOps.langId($"text").as("lang")).as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "fr" && out(4L) == "und")
  }

  test("connectedComponents labels min-reachable-id, converges on a chain") {
    // path 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // separate pair (10,11), edges given in both orders
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp.size == 7)
  }

  test("nearDupGroups: transitive closure groups; singletons group as self") {
    // docs 1..6; verified pairs chain 1-2, 2-3 and pair 5-6: groups
    // {1,2,3}, {4}, {5,6}. Pair-drop would also keep only 1,4,5 here, but
    // the GROUP ids must witness the transitive closure explicitly.
    val d = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val verified = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val g = Dedup.nearDupGroups(d, $"doc_id", verified).as[(Long, Long)].collect().toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("deterministicSplit: stable, salt-sensitive, proportional") {
    val ids = spark.range(0, 10000).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = ids.select($"id", TextOps.deterministicSplit($"id", w, "s1").as("split"))
    val counts = s1.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform: 10k draws stay within ~4 sigma of expectation
    assert(math.abs(counts("train") - 8000) < 200, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000) < 150 && math.abs(counts("test") - 1000) < 150)
    // deterministic across evaluations
    assert(s1.except(ids.select($"id",
      TextOps.deterministicSplit($"id", w, "s1").as("split"))).isEmpty)
    // a different salt draws a genuinely different assignment
    val s2 = ids.select($"id", TextOps.deterministicSplit($"id", w, "s2").as("split"))
    assert(s1.except(s2).count() > 1000)
  }

  test("chunkText covers every char; overlap and tail semantics hold") {
    val df = Seq(
      (1L, "a" * 100), (2L, "short"), (3L, ""), (4L, "b" * 64), (5L, "c" * 65))
      .toDF("doc_id", "text")
    val out = TextOps.chunkText(df, $"doc_id", $"text", size = 64, overlap = 16)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!out.contains(3L)) // empty text -> no chunks
    assert(out(2L).map(_._4).toSeq == Seq("short"))
    assert(out(4L).map(_._4).toSeq == Seq("b" * 64)) // exact fit -> 1 chunk
    // 65 chars, stride 48: chunks [0,64), [48,65) — trailing char covered
    assert(out(5L).map(c => (c._3, c._4.length)).toSeq == Seq((0L, 64), (48L, 17)))
    // reconstruction: dropping the 16-char overlap from every later chunk
    // re-concatenates to the original text
    val chunks1 = out(1L).map(_._4).toSeq
    val rebuilt = chunks1.head + chunks1.tail.map(_.drop(16)).mkString
    assert(rebuilt == "a" * 100)
  }

  test("keepBestPerGroup keeps the argmax-score doc of each group") {
    val d = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7), (5L, 0.7))
      .toDF("doc_id", "score")
    // groups {1,2,3} and {4,5}; 4 and 5 tie on score -> lowest id wins
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "group_id")
    val kept = Dedup.keepBestPerGroup(d, $"doc_id", $"score", groups)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("projected ANN: self at rank 1; recall vs brute force; coarseK=N is exact") {
    val e = embs.filter($"vec_id" < 200)
    val q = e.filter($"vec_id" < 10)
    val proj = Similarity.projectedCosineTopK(e, $"vec_id", $"embedding",
      q, $"vec_id", $"embedding", dimIn = 64, dimOut = 8, coarseK = 50, k = 5)
      .collect()
    assert(proj.filter(r => r.getLong(3) == 1L)
      .forall(r => r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0))
    val brute = Similarity.cosineTopK(e, $"vec_id", $"embedding",
      q, $"vec_id", $"embedding", k = 5).collect()
    def keySet(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = keySet(proj).intersect(keySet(brute)).size.toDouble / brute.length
    assert(recall >= 0.5, s"projected recall $recall too low")
    // with coarseK covering the whole corpus the result IS brute force
    val full = Similarity.projectedCosineTopK(e, $"vec_id", $"embedding",
      q, $"vec_id", $"embedding", dimIn = 64, dimOut = 8, coarseK = 200, k = 5)
    assert(keySet(full.collect()) == keySet(brute))
  }

  test("int8 quantization: codes in range, error bounded by scale/2, zero-vec safe") {
    val df = embs.filter($"vec_id" < 100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .unionByName(Seq((999999L, Seq.fill(64)(0.0))).toDF("vec_id", "v"))
    val q = df.withColumn("q", Similarity.quantizeInt8($"v"))
      .select($"vec_id", $"q.scale".as("scale"), $"q.codes".as("codes"),
        Similarity.dequantizeInt8($"q").as("r"), $"v")
      .collect()
    for (row <- q) {
      val scale = row.getDouble(1)
      val codes = row.getSeq[Int](2)
      val recon = row.getSeq[Double](3)
      val v = row.getSeq[Double](4)
      assert(codes.forall(c => c >= -128 && c <= 127))
      if (row.getLong(0) == 999999L) assert(scale == 0.0 && codes.forall(_ == 0))
      else {
        assert(scale > 0)
        v.zip(recon).foreach { case (x, r) =>
          assert(math.abs(x - r) <= scale / 2 + 1e-12, s"err ${math.abs(x - r)} > ${scale / 2}")
        }
      }
    }
  }

  test("topTerms ranks by frequency with deterministic ties") {
    val df = Seq((1L, "x x x y y z"), (2L, "y w w"), (3L, "x")).toDF("doc_id", "text")
    val out = TextOps.topTerms(df, $"doc_id", $"text", k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // x: tf 4 / df 2; y: tf 3 / df 2; w: tf 2 / df 1
    assert(out == Seq(("x", 4L, 2L), ("y", 3L, 2L), ("w", 2L, 1L)))
  }

  test("AnnStore: partition-pruned probe equals in-memory IVF; DPP engaged") {
    val e = embs.select($"vec_id", $"embedding")
    val cents = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 1)
      .localCheckpoint(false)
    val dir = java.nio.file.Files.createTempDirectory("graft-annstore").toString
    AnnStore.write(e, $"vec_id", $"embedding", cents, dir)
    // one directory per non-empty centroid partition
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("centroid_id="))
    assert(parts.nonEmpty && parts.length <= 8)

    val q = e.filter($"vec_id" < 5)
    val fromStore = AnnStore.query(spark, dir, cents, q, $"vec_id", $"embedding",
      nprobe = 2, k = 3)
    val inMem = Similarity.ivfCosineTopKWith(cents, e, $"vec_id", $"embedding",
      q, $"vec_id", $"embedding", nprobe = 2, k = 3)
    assert(fromStore.collect().map(_.toSeq).toSet == inMem.collect().map(_.toSeq).toSet)
    assert(fromStore.count() > 0)

    // dynamic partition pruning reaches the store scan: the broadcast
    // probe side gates which centroid directories are read
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n${plan.take(2000)}")
  }

  test("ivfAssignProjection is bit-identical to the aggregate ivfAssign") {
    val e = embs.select($"vec_id", $"embedding")
    val cents = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 1)
      .localCheckpoint(false)
    val agg = Similarity.ivfAssign(e, $"vec_id", $"embedding", cents, nprobe = 1)
      .select($"vec_id", $"centroid_id").as[(Long, Int)].collect().toMap
    val proj = Similarity.ivfAssignProjection(e, $"vec_id", $"embedding",
      Similarity.collectCentroids(cents))
      .select($"vec_id", $"centroid_id").as[(Long, Int)].collect().toMap
    assert(proj == agg)
    assert(proj.size == e.count())
  }

  test("AnnStore streaming + batch ingest land in the layout; probes see the union") {
    implicit val sqlCtx = spark.sqlContext
    val e = embs.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val cents = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 1)
      .localCheckpoint(false)
    val dir = java.nio.file.Files.createTempDirectory("graft-annstore-ing").toString

    val base = e.filter($"vec_id" < 300)
    AnnStore.write(base, $"vec_id", $"embedding", cents, dir)
    AnnStore.appendBatch(e.filter($"vec_id" >= 300 && $"vec_id" < 400),
      $"vec_id", $"embedding", cents, dir)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val writer = AnnStore.streamIngest(input.toDF.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding".cast("array<double>"), cents, dir)
    val query = writer.start()
    try {
      val tail = e.filter($"vec_id" >= 400)
        .as[(Long, Seq[Double])].collect()
      input.addData(tail.take(tail.length / 2).toSeq)
      input.addData(tail.drop(tail.length / 2).toSeq)
      query.processAllAvailable()
    } finally query.stop()

    // the store now holds the full corpus; probing it equals in-memory IVF
    // over the union
    val q = e.filter($"vec_id" < 5)
    val fromStore = AnnStore.query(spark, dir, cents, q, $"vec_id", $"embedding",
      nprobe = 2, k = 3)
    val inMem = Similarity.ivfCosineTopKWith(cents, e, $"vec_id", $"embedding",
      q, $"vec_id", $"embedding", nprobe = 2, k = 3)
    assert(fromStore.collect().map(_.toSeq).toSet == inMem.collect().map(_.toSeq).toSet)
    assert(spark.read.parquet(dir).count() == e.count())
  }

  test("AnnStore.compact dedups a replayed append and shrinks the file count") {
    val e = embs.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val cents = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 1)
      .localCheckpoint(false)
    val dir = java.nio.file.Files.createTempDirectory("graft-annstore-cpt").toString
    AnnStore.write(e.filter($"vec_id" < 300), $"vec_id", $"embedding", cents, dir)
    val batch = e.filter($"vec_id" >= 300 && $"vec_id" < 400)
    AnnStore.appendBatch(batch, $"vec_id", $"embedding", cents, dir)
    AnnStore.appendBatch(batch, $"vec_id", $"embedding", cents, dir) // replayed retry
    def files(): Long = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = files()
    assert(spark.read.parquet(dir).count() == 500, "replay duplicates visible pre-compact")

    AnnStore.compact(spark, dir)
    val rows = spark.read.parquet(dir)
      .select($"vec_id", $"embedding", $"centroid_id").collect().map(_.toSeq)
    assert(rows.length == 400, "one row per vec_id after compact")
    val expect = Similarity.ivfAssign(e.filter($"vec_id" < 400), $"vec_id", $"embedding",
      cents, nprobe = 1).select($"vec_id", $"embedding", $"centroid_id")
      .collect().map(_.toSeq)
    assert(rows.toSet == expect.toSet, "compact preserves the single-append row set")
    assert(files() < before, "compaction must coalesce append files")
  }

  test("sorted_distinct_ngram_hashes equals the composed distinct/hash/sort form") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa", // heavy duplicates
      "short", "x", "", "  padded with trim  ",
      "ünïcødé grams ünïcødé grams") // multi-byte chars
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = df.select($"id",
      graft.functions.sorted_distinct_ngram_hashes(lower(trim($"text")), 8).as("fast"),
      sort_array(transform(array_distinct(TextOps.charNgrams($"text", 8)),
        g => xxhash64(g))).as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"mismatch for id ${r.getLong(0)}")
    }
    // NULL text propagates NULL
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(graft.functions.sorted_distinct_ngram_hashes($"text", 8)).head()
    assert(n.isNullAt(0))
  }

  test("kMeansCentroids: zero rounds = seeds; means on the lattice; search contract") {
    val e = embs.select($"vec_id", $"embedding")
    // iters=0 degenerates to the seed quantizer
    val seeds = Similarity.ivfCentroids(e, $"vec_id", $"embedding", m = 4)
      .orderBy($"centroid_id").collect().map(_.toSeq).toSeq
    val zero = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 4, iters = 0)
      .orderBy($"centroid_id").collect().map(_.toSeq).toSeq
    assert(zero == seeds)

    // trained centroids are cluster means of their members (lattice math),
    // checked directly for one round
    val cents1 = Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 4, iters = 1)
    val assigned = Similarity.ivfAssign(e, $"vec_id", $"embedding",
      Similarity.ivfCentroids(e, $"vec_id", $"embedding", m = 4), nprobe = 1)
      .select($"centroid_id", $"embedding").collect()
      .groupBy(_.getInt(0)).map { case (cid, rows) =>
        val vs = rows.map(_.getSeq[Double](1))
        cid.toLong -> vs.head.indices.map { j =>
          val isum = vs.map(v => math.floor(v(j) * 10000.0 + 0.5).toLong).sum
          isum.toDouble / vs.length.toDouble / 10000.0
        }.toSeq
      }
    cents1.collect().foreach { r =>
      val cid = r.getInt(0).toLong
      assigned.get(cid).foreach(want => assert(r.getSeq[Double](1) == want))
    }

    // trained quantizer drops into the search contract; self still rank 1
    val out = Similarity.ivfCosineTopKWith(
      Similarity.kMeansCentroids(e, $"vec_id", $"embedding", m = 8, iters = 2),
      e, $"vec_id", $"embedding",
      e.filter($"vec_id" < 5), $"vec_id", $"embedding", nprobe = 2, k = 3)
    val self = out.filter($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
    assert(self.nonEmpty && self.forall { case (q, n) => q == n })
  }

  test("repetitionStats: hand-computed fractions; short docs yield 0 not NULL") {
    val df = Seq(
      (1L, "a a a b"),     // top word 3/4; 2-grams: [a a, a a, a b] dup 2/3; 3-grams: [a a a, a a b] dup 0
      (2L, "x y"),         // no repeats; 3-grams absent -> 0.0
      (3L, "w")            // single token: 2- and 3-gram fracs 0.0
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, $"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, Double, Double, Double)].collect().toSeq
    def q(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(out == Seq(
      (1L, q(3.0 / 4.0), q(2.0 / 3.0), 0.0),
      (2L, 0.5, 0.0, 0.0),
      (3L, 1.0, 0.0, 0.0)))
  }

  test("bm25: rarer term scores higher; absent query terms score 0; ordering sane") {
    val df = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common filler filler filler filler filler")).toDF("doc_id", "text")
    val out = Ranking.bm25(df, $"doc_id", $"text", Seq("rare", "common"))
      .orderBy($"doc_id").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L)) // doc 1 has the rare term
    assert(out(2L) == out(3L)) // identical docs tie exactly
    val none = Ranking.bm25(df, $"doc_id", $"text", Seq("absent"))
      .as[(Long, Double)].collect()
    assert(none.forall(_._2 == 0.0))
  }

  test("hybridTopK: zero-norm embeddings score cosine 0.0, not NaN") {
    val d = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val embs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Seq(1.0, 0.0))).toDF("embedding")
    val out = Ranking.hybridTopK(d, $"doc_id", $"text", embs, $"vec_id",
        $"embedding", Seq("alpha"), qv, alpha = 0.5, k = 3)
      .select($"doc_id", $"cos").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0 && out(3L) == 0.0)
    assert(out(2L) == 0.0 && !out(2L).isNaN) // 0/0 would be NaN pre-guard
  }

  test("sessionize drops null-timestamp events without shifting session indexes") {
    import graft.pipeline.Sessions
    val df = Seq(
      (1L, Some(100L), 1.0), (1L, None, 9.0), (1L, Some(150L), 1.0),
      (1L, None, 9.0), (1L, Some(5000L), 1.0)).toDF("k", "t", "v")
    val got = Sessions.sessionize(df, $"k", $"t", $"v", gap = 1000L)
      .orderBy($"session_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // two real sessions, 0-indexed from 0 — null-ts rows neither open
    // bogus null-bounded sessions nor shift the numbering
    assert(got.toSeq == Seq((0L, 100L, 150L, 2L), (1L, 5000L, 5000L, 1L)))
  }

  test("sourceCap: hot source capped, small sources pass whole, equals the rank rule") {
    import org.apache.spark.sql.expressions.Window
    // skew: half the docs in one hot source, the rest spread thin
    val d = docs.select($"doc_id",
      when($"doc_id" % 10 < 5, lit("hot")).otherwise($"source").as("src"), $"text")
    val cap = 7
    val out = Mixing.sourceCap(d, $"doc_id", $"src", cap)
    val got = out.select($"doc_id", $"src").as[(Long, String)].collect().toSet
    // reference: the pure rank rule, one global window
    val ref = d.withColumn("__h",
        TextOps.md5Long(concat($"doc_id".cast("string"), lit(""))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"src").orderBy($"__h", $"doc_id")))
      .filter($"__rn" <= cap)
      .select($"doc_id", $"src").as[(Long, String)].collect().toSet
    assert(got == ref)
    // per-source: min(n, cap), and under-cap sources keep EVERY row
    val inCounts = d.groupBy($"src").count().as[(String, Long)].collect().toMap
    val outCounts = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    inCounts.foreach { case (s, n) =>
      assert(outCounts.getOrElse(s, 0L) == math.min(n, cap.toLong), s"source $s") }
    // survivors carry their original columns untouched
    assert(out.columns.toSeq == Seq("doc_id", "src", "text"))
    // NULL sources are not dropped: they group with the empty string
    val withNull = docs.limit(20).select($"doc_id",
      when($"doc_id" % 2 === 0, lit(null).cast("string")).otherwise(lit("")).as("src"))
    val nOut = Mixing.sourceCap(withNull, $"doc_id", $"src", cap = 100).count()
    assert(nOut == 20, s"null-source rows must survive under-cap, got $nOut")
    // NULL ids must behave identically on the prefilter (over-cap) and
    // fallback paths: they hash as "" instead of yielding a NULL hash the
    // tau prefilter would drop but the fallback window would rank first
    val nullId = (1L to 50L).map(i => (Some(i), "hot")) :+ ((Option.empty[Long], "hot"))
    val nd = nullId.toDF("doc_id", "src")
    val nCap = 7
    val nGot = Mixing.sourceCap(nd, $"doc_id", $"src", nCap)
      .select($"doc_id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    val nRef = nd.withColumn("__h",
        TextOps.md5Long(concat(coalesce($"doc_id".cast("string"), lit("")), lit(""))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"src").orderBy($"__h", $"doc_id")))
      .filter($"__rn" <= nCap)
      .select($"doc_id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(nGot == nRef, "over-cap source with a null id: output must equal the rank rule")
    assert(nGot.size == nCap)
  }

  test("mixing: integer+fractional copies, absent stratum dropped, deterministic") {
    val df = (0L until 1000L).map(i => (i, if (i % 3 == 0) "keep2x" else if (i % 3 == 1) "half" else "drop"))
      .toDF("doc_id", "stratum")
    val rates = Map("keep2x" -> 2.0, "half" -> 0.5)
    val out = Mixing.mixSample(df, $"doc_id", $"stratum", rates, salt = "s")
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts("keep2x") == 2 * 334) // exact: integer rate
    assert(!counts.contains("drop"))
    val halfN = counts("half").toDouble / 333.0
    assert(halfN > 0.35 && halfN < 0.65) // hash-lattice fraction
    // determinism: same salt = same rows; different salt = different draw
    val again = Mixing.mixSample(df, $"doc_id", $"stratum", rates, salt = "s")
    assert(out.select("doc_id", "copy_idx").except(again.select("doc_id", "copy_idx")).isEmpty)
    val keptS = out.filter($"stratum" === "half").select("doc_id").as[Long].collect().toSet
    val keptT = Mixing.mixSample(df, $"doc_id", $"stratum", rates, salt = "t")
      .filter($"stratum" === "half").select("doc_id").as[Long].collect().toSet
    assert(keptS != keptT) // fresh independent draw per salt
  }

  test("incrementalDedup equals plain anti-join; bloom is only a prefilter") {
    val ref = docs.select($"doc_id", $"text")
    val newBatch = ref.select(($"doc_id" + 5000).as("doc_id"),
      when($"doc_id" % 2 === 0, $"text").otherwise(concat($"text", lit(" fresh"))).as("text"))
    val got = Dedup.incrementalDedup(newBatch, ref, $"text", $"text",
      expectedRefItems = 10000L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val want = newBatch.join(ref.select($"text"), Seq("text"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
    // a tiny/over-saturated bloom must still be exact (more FPs, same rows)
    val small = Dedup.incrementalDedup(newBatch, ref, $"text", $"text",
      expectedRefItems = 10L, fpp = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(small == want)
  }

  test("bloom probe is the codegen'd BloomFilterMightContain, not a Scala UDF") {
    val bf = docs.select(xxhash64($"text").as("__h")).stat.bloomFilter("__h", 1000L, 0.01)
    val probed = docs.withColumn("__maybe",
      org.apache.spark.sql.graft.shims.bloomMightContain(bf, xxhash64($"text")))
    // the probe must be the catalyst expression (prettyName might_contain)
    // inside the codegen span, not a ScalaUDF boundary
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(!plan.contains("UDF"), plan.take(800))
    // no false negatives: every inserted key probes true
    assert(probed.filter(!$"__maybe").count() == 0L)
    // executor-side expression agrees with the driver-side sketch on
    // uninserted keys too (FP or not, bit-identical decision)
    val fresh = docs
      .select(xxhash64(concat($"text", lit(" zzz"))).as("h"))
      .withColumn("__maybe", org.apache.spark.sql.graft.shims.bloomMightContain(
        bf, $"h"))
      .collect()
    fresh.foreach { r => assert(r.getBoolean(1) == bf.mightContainLong(r.getLong(0))) }
  }

  test("incrementalNearDedup: drops near/exact copies of ref, keeps novel and within-batch dups") {
    val ref = docs.select($"doc_id", $"text")
    val novel = "entirely fresh words that appear nowhere in the reference corpus " +
      "zebra quark mango piano velvet glacier trumpet hazel"
    val newBatch = ref.filter($"doc_id" < 3)
      .select(($"doc_id" + 5000).as("doc_id"), concat($"text", lit(" tail")).as("text")) // near-copies
      .unionAll(Seq((6001L, novel), (6002L, novel)).toDF("doc_id", "text")) // novel + within-batch dup
    val out = Dedup.incrementalNearDedup(newBatch, ref,
      $"doc_id", $"text", $"doc_id", $"text")
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(6001L, 6002L), s"got $out")
  }

  test("decontaminate flags exactly the docs sharing an eval n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "xx alpha beta gamma delta yy"),   // shares 4-gram with doc 1? only if eval
      (4L, "totally different words entirely here now")).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, $"doc_id", $"text", eval, $"text", n = 4)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && out(3L))       // both contain "alpha beta gamma delta"
    assert(!out(2L) && !out(4L))
    assert(out.size == 4)            // corpus rows preserved
    // eval docs checked against themselves are flagged (self-containment)
    val self = Dedup.decontaminate(eval, $"doc_id", $"text", eval, $"text", n = 4)
      .select($"contaminated").as[Boolean].head()
    assert(self)
    // n longer than every doc: nothing can be contaminated
    val none = Dedup.decontaminate(corpus, $"doc_id", $"text", eval, $"text", n = 20)
      .filter($"contaminated").count()
    assert(none == 0)
  }

  test("redactPii masks and counts emails, phones, card-shaped ids; idempotent") {
    val df = Seq(
      (1L, "mail me at john.doe+x@sub.example.org thanks"),
      (2L, "call 555-123-4567 or 555-000-1111 today"),
      (3L, "card 4111111111111111 exp soon"),
      (4L, "clean text with no pii at all"),
      (5L, "a@b.co and 123-456-7890 and 1234567890123456")).toDF("doc_id", "text")
    val out = TextOps.redactPii(df, $"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 1L, 0L, 0L, "mail me at <EMAIL> thanks")))
    assert(out(1) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE> today")))
    assert(out(2) == ((3L, 0L, 0L, 1L, "card <ID> exp soon")))
    assert(out(3) == ((4L, 0L, 0L, 0L, "clean text with no pii at all")))
    assert(out(4) == ((5L, 1L, 1L, 1L, "<EMAIL> and <PHONE> and <ID>")))
    // masking is idempotent: placeholders never re-match any pattern
    val again = TextOps.redactPii(
      TextOps.redactPii(df, $"doc_id", $"text").select($"doc_id", $"redacted".as("text")),
      $"doc_id", $"text")
    val counts = again.agg(sum($"n_emails" + $"n_phones" + $"n_ids")).as[Long].head()
    assert(counts == 0)
  }

  test("normalizeText: strips controls, collapses whitespace, idempotent") {
    val df = Seq(
      (1L, "a\tb\n\nc"), (2L, "  lots   of    space  "), (3L, "clean text"),
      (4L, "bell" + 7.toChar + "and" + 0.toChar + "nul"), (5L, "")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.normalizeText($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c" && out(2L) == "lots of space" && out(3L) == "clean text")
    assert(out(4L) == "bell and nul" && out(5L) == "")
    val again = df.select($"doc_id",
      TextOps.normalizeText(TextOps.normalizeText($"text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(again == out)
  }

  test("domainTag: argmax domain, declaration-order ties, 'und' when all zero") {
    val df = Seq(
      (1L, "alpha alpha beta noise"),   // hits domain A twice
      (2L, "gamma gamma alpha noise"),  // hits B harder
      (3L, "nothing relevant here"),    // no hits -> und
      (4L, "alpha gamma"))              // symmetric single hits -> tie
      .toDF("doc_id", "text")
    val out = graft.pipeline.Ranking.domainTag(df, $"doc_id", $"text",
      Seq("A" -> Seq("alpha", "beta"), "B" -> Seq("gamma")))
      .orderBy($"doc_id").collect()
    assert(out(0).getString(1) == "A")
    assert(out(1).getString(1) == "B")
    assert(out(2).getString(1) == "und" && out(2).getDouble(2) == 0.0)
    // doc 4: idf-dependent, but MUST be deterministic and one of A/B
    assert(Set("A", "B").contains(out(3).getString(1)))
  }

  test("unigramLogProbScore: common-token docs outscore rare-token docs; exact small case") {
    // corpus: 'a' x 6, 'b' x 2, 'z' x 1 across docs => T=9, V=3
    val df = Seq((1L, "a a a b"), (2L, "a a a b"), (3L, "z")).toDF("doc_id", "text")
    val out = TextOps.unigramLogProbScore(df, $"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    def lpE4(c: Long): Long = math.floor(math.log((c + 1.0) / 12.0) * 10000.0 + 0.5).toLong
    val doc1 = math.floor((3 * lpE4(6) + lpE4(2)).toDouble / 4.0 + 0.5) / 10000.0
    assert(out(0) == ((1L, 4L, doc1)) && out(1) == ((2L, 4L, doc1)))
    assert(out(2) == ((3L, 1L, math.floor(lpE4(1).toDouble + 0.5) / 10000.0)))
    assert(out(2)._3 < out(0)._3) // rare-token doc scores lower
  }

  test("gopherFilter: each rule discriminates on crafted violations") {
    val good = "the quick brown fox jumps over a lazy dog and then walks off to " +
      "the river bank where it sits for an hour watching boats drift past slowly " +
      "in the warm light of late afternoon with friends nearby"
    val df = Seq(
      (1L, good),                                    // passes everything
      (2L, "too short by far"),                      // words_ok fails
      (3L, Seq.fill(30)("ab").mkString(" ")),        // word_len + stopword + top_word fail
      (4L, good + " " + Seq.fill(15)("spam").mkString(" ")), // top-word/repetition fail
      (5L, (good + " ") * 2))                        // dup n-gram fail (whole text twice)
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(df, $"doc_id", $"text",
      minWords = 25, maxWords = 1000, minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
      minStopwordHits = 2, maxTopWordFrac = 0.20, maxDup2Frac = 0.30, maxDup3Frac = 0.25)
      .orderBy($"doc_id").collect()
    def f(i: Int, name: String): Boolean =
      out(i).getBoolean(out(i).fieldIndex(name))
    assert(f(0, "keep"))
    assert(!f(1, "words_ok") && !f(1, "keep"))
    assert(!f(2, "word_len_ok") && !f(2, "stopword_ok") && !f(2, "top_word_ok"))
    assert(!f(3, "top_word_ok") && !f(3, "keep"))
    assert(!f(4, "repetition_ok") && !f(4, "keep"))
  }

  test("videoClipMatches: hot-hash video cap bounds the count-product joins") {
    // 30 videos share one identical frame hash; with maxVideosPerHash = 5
    // only the 5 smallest video ids participate — C(5,2) pairs, not C(30,2)
    val frames = (0L until 30L).map(v => (v, 0L, 123456789L)).toDF("vid", "fi", "h")
    val out = Dedup.videoClipMatches(frames, $"vid", $"fi", $"h",
        maxHamming = 2, maxVideosPerHash = 5)
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for { a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b, 1L)).toSet
    assert(out == expected)
  }

  test("corpusDiff: added/removed/changed/unchanged; null texts compare null-safely") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null: String), (5L, null: String))
      .toDF("id", "t")
    val nw = Seq((1L, "a"), (2L, "B!"), (4L, null: String), (5L, "now"), (9L, "new"))
      .toDF("id", "t")
    val out = TextOps.corpusDiff(old, nw, $"id", $"t", $"id", $"t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 9L -> "added"))
  }

  test("connectedComponents: driver union-find equals the distributed loop on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      // random graph over a sparse id space: chains, cliques and isolates
      val n = 120 + trial * 40
      val ids = (0 until n).map(_ => rnd.nextLong().abs % 10000).distinct
      val pairs = (0 until n * 2).map { _ =>
        val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val df = pairs.toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      val slow = Dedup.connectedComponents(df, driverEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(fast == slow, s"trial $trial")
      // component labels are the component minimum
      assert(fast.values.toSet.subsetOf(fast.keySet))
      fast.foreach { case (id, c) => assert(c <= id) }
    }
  }

  test("perplexityPartition: class-level head/middle/tail cuts, per-language isolation") {
    // en: scores desc 10,10,9,8,7,7,7,1,1,1 (n=10; head cut ceil(3)=3,
    // middle cut ceil(6)=6). Class 7 starts at cumulative 4 < 6 -> the
    // WHOLE class is middle even though it runs past the cut.
    val en = Seq(10.0, 10.0, 9.0, 8.0, 7.0, 7.0, 7.0, 1.0, 1.0, 1.0)
      .zipWithIndex.map { case (s, i) => (i.toLong, "en", s) }
    // de: two classes only (n=4): class 5 (c=3) starts at 0 -> head;
    // class 2 starts at 3 >= ceil(0.6*4)=3 -> tail; nothing is middle
    val de = Seq(5.0, 5.0, 5.0, 2.0)
      .zipWithIndex.map { case (s, i) => ((100 + i).toLong, "de", s) }
    val df = (en ++ de).toDF("id", "language", "s")
    val out = TextOps.perplexityPartition(df, $"id", $"s", $"language",
        headFrac = 0.3, midFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val expectEn = Map(0L -> "head", 1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "middle", 6L -> "middle",
      7L -> "tail", 8L -> "tail", 9L -> "tail")
    val expectDe = Map(100L -> "head", 101L -> "head", 102L -> "head", 103L -> "tail")
    assert(out == expectEn ++ expectDe)
    // NULL lang / NULL score rows survive (null-safe join back), they are
    // not silently dropped
    val withNulls = (en ++ de ++ Seq((200L, null: String, 1.0), (201L, "en", Double.NaN)))
      .toDF("id", "language", "s")
    val outN = TextOps.perplexityPartition(withNulls, $"id", $"s", $"language")
      .collect().map(r => r.getLong(0)).toSet
    assert(outN.contains(200L) && outN.size == withNulls.count())
  }

  test("tokenBudgetSelect equals the brute-force walk; straddling doc included") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map(i =>
      (i, (rnd.nextInt(5) + 1).toDouble, (rnd.nextInt(50) + 1).toLong))
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, 1L, total / 3, total / 2, total, total + 100)) {
      val df = rows.toDF("id", "q", "cnt")
      val out = Mixing.tokenBudgetSelect(df, $"id", $"q", $"cnt", budget,
          bucketWidth = 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      // brute force: sort (score desc, id asc), exclusive running sum
      var cum = 0L
      val expect = rows.sortBy { case (id, s, _) => (-s, id) }.map { case (id, _, c) =>
        val e = (id, cum, cum < budget); cum += c; e
      }.map(e => e._1 -> (e._2, e._3)).toMap
      assert(out.size == 200)
      rows.foreach { case (id, _, _) =>
        assert(out(id) == ((expect(id)._1, expect(id)._2)), s"doc $id budget $budget")
      }
    }
  }

  test("tokenBudgetSelect: null/negative token counts zero out instead of corrupting the walk") {
    // a null count would break the max(__local + n_tokens) cell-total
    // identity and shift every later cell's cum_before
    val rows = Seq((0L, 2.0, Some(10L)), (1L, 2.0, None), (2L, 2.0, Some(-5L)),
      (3L, 2.0, Some(20L)), (4L, 1.0, Some(30L)))
    val df = rows.toDF("id", "q", "cnt")
    val out = Mixing.tokenBudgetSelect(df, $"id", $"q", $"cnt", budget = 25L,
        bucketWidth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    // walk order (score desc, id asc) with nulls/negatives as 0 tokens:
    // cum_before = 0,10,10,10,30
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq == Seq(
      (0L, 10L, 0L, true), (1L, 0L, 10L, true), (2L, 0L, 10L, true),
      (3L, 20L, 10L, true), (4L, 30L, 30L, false)))
  }

  test("tokenBudgetSelectPerStratum: independent walks per stratum; absent stratum gets 0") {
    val rnd = new scala.util.Random(31)
    val strata = Seq("web", "code", "books")
    val rows = (0L until 150L).map(i =>
      (i, (rnd.nextInt(4) + 1).toDouble, (rnd.nextInt(40) + 1).toLong,
        strata(rnd.nextInt(3))))
    val budgets = Map("web" -> 300L, "code" -> 150L) // books absent -> 0
    val out = Mixing.tokenBudgetSelectPerStratum(
        rows.toDF("id", "q", "cnt", "src"),
        $"id", $"q", $"cnt", $"src", budgets, bucketWidth = 16)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out.size == 150)
    for (st <- strata) {
      var cum = 0L
      val budget = budgets.getOrElse(st, 0L)
      rows.filter(_._4 == st).sortBy { case (id, s, _, _) => (-s, id) }
        .foreach { case (id, _, c, _) =>
          assert(out(id) == ((st, cum, cum < budget)), s"$st doc $id")
          cum += c
        }
    }
    assert(!rows.filter(_._4 == "books").exists(r => out(r._1)._3),
      "absent stratum selects nothing")
  }

  test("applyChanges: MERGE semantics — version race, delete, insert, passthrough") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (1L, "upsert", "one-v2", 2L),   // update
      (1L, "upsert", "one-v3", 3L),   // later version wins the race
      (2L, "delete", null, 2L),       // delete
      (9L, "upsert", "nine", 2L),     // insert
      (4L, "delete", null, 5L),       // delete at high version
      (4L, "upsert", "four-v2", 2L))  // loses to the higher-version delete
      .toDF("doc_id", "op", "text", "version")
    val got = TextOps.applyChanges(base, $"doc_id", $"text",
        changes, $"doc_id", $"op", $"text", $"version")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == Map(
      1L -> (("one-v3", 3L, "upsert")),
      3L -> (("three", 0L, "base")),
      9L -> (("nine", 2L, "upsert"))))
  }

  test("retrievalMetrics: recall@k and MRR discriminate on crafted docs") {
    // 20 LONG relevant docs (both terms, heavy length penalty), 2 short
    // high-tf alpha-only decoys that outrank them, 6 beta-carrying
    // fillers that depress beta's idf — the top-3 mixes decoys and
    // relevant, so recall and MRR land strictly inside (0, 1)
    val docs =
      (1L to 20L).map(i => (i, "alpha beta" + (" pad" * 100))) ++
        (100L to 101L).map(i => (i, "alpha alpha alpha alpha alpha")) ++
        (200L to 205L).map(i => (i, "beta gamma filler"))
    val df = docs.toDF("doc_id", "text").repartition(4)
    val out = Ranking.retrievalMetrics(df, $"doc_id", $"text",
        Seq("q" -> Seq("alpha", "beta")), k = 3)
      .collect().head
    // reference: score every doc with the same lattice bm25, take top-3
    val scored = Ranking.bm25(df, $"doc_id", $"text", Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
    val top3 = scored.take(3).map(_._1)
    val relevant = (1L to 20L).toSet
    val hits = top3.count(relevant)
    val firstRank = top3.indexWhere(relevant).toLong + 1
    assert(out.getLong(1) == 20L)
    assert(out.getLong(2) == hits.toLong)
    assert(out.getLong(3) == hits * 1000000L / 20L)
    assert(out.getLong(4) == (if (firstRank > 0) 1000000L / firstRank else 0L))
    // the fixture must exercise the MIXED regime: some but not all of
    // the top-3 relevant, so both metrics are strictly inside (0, 1)
    assert(out.getLong(2) > 0L && out.getLong(2) < 3L)
    assert(out.getLong(3) > 0L && out.getLong(3) < 1000000L)
    assert(out.getLong(4) > 0L && out.getLong(4) < 1000000L)

    // no relevant docs at all: both metrics zero, no division error
    val none = Ranking.retrievalMetrics(df, $"doc_id", $"text",
        Seq("z" -> Seq("zeta", "eta")), k = 3).collect().head
    assert(none.getLong(1) == 0L && none.getLong(3) == 0L && none.getLong(4) == 0L)
  }

  test("tokenBudgetSelect: constant-score corpus stays parallel and walks id order") {
    // every doc shares one score: the compound (score, id-bucket) cell key
    // must still give the id-ordered global walk
    val df = (0L until 100L).map(i => (i, 3.5, i + 1)).toDF("id", "q", "cnt")
    val out = Mixing.tokenBudgetSelect(df, $"id", $"q", $"cnt",
        budget = 1000L, bucketWidth = 10)
      .orderBy($"doc_id").collect()
    var cum = 0L
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == cum && r.getBoolean(4) == (cum < 1000L), s"doc $i")
      cum += i + 1
    }
  }

  test("nearDedupFreeable releases every checkpoint generation it pinned") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val d = docs.select($"doc_id", $"text").limit(60)
    val corpus = d.unionAll(d.select($"doc_id" + 1000000, $"text"))
    // tiny cap forces the capped band checkpoint AND the overflow-star path
    val (survivors, free) =
      Dedup.nearDedupFreeable(corpus, $"doc_id", $"text", maxBucket = 4)
    val got = survivors.select($"doc_id").as[Long].collect().toSet
    val pinned = sc.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty, "expected the composition to pin checkpoint blocks")
    free()
    val leaked = pinned.intersect(sc.getPersistentRDDs.keySet)
    assert(leaked.isEmpty, s"free() left RDDs pinned: $leaked")
    // identical survivor set to the thunk-less overload
    val expected = Dedup.nearDedup(corpus, $"doc_id", $"text", maxBucket = 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("every remaining Freeable variant releases its blocks and matches the plain overload") {
    val sc = spark.sparkContext
    def check(name: String)(build: => (org.apache.spark.sql.DataFrame, () => Unit))(
        plain: => org.apache.spark.sql.DataFrame): Unit = {
      val before = sc.getPersistentRDDs.keySet
      val (out, free) = build
      val got = out.collect().map(_.toString).sorted.toSeq
      val pinned = sc.getPersistentRDDs.keySet -- before
      assert(pinned.nonEmpty, s"$name: expected pinned checkpoint blocks")
      free()
      val leaked = pinned.intersect(sc.getPersistentRDDs.keySet)
      assert(leaked.isEmpty, s"$name: free() left RDDs pinned: $leaked")
      val want = plain.collect().map(_.toString).sorted.toSeq
      assert(got == want, s"$name: freeable variant diverged from plain overload")
    }
    val d = docs.select($"doc_id", $"text").limit(40)
    val textCorpus = d.unionAll(d.filter($"doc_id" % 5 === 0)
      .select($"doc_id" + 1000000, concat($"text", lit(" tail"))))
    check("ngramJaccardPairs")(
      Dedup.ngramJaccardPairsFreeable(textCorpus, $"doc_id", $"text", 2, 0.5))(
      Dedup.ngramJaccardPairs(textCorpus, $"doc_id", $"text", 2, 0.5))
    check("prefixJaccardJoin")(
      Dedup.prefixJaccardJoinFreeable(textCorpus, $"doc_id", $"text", 2, 1, 2))(
      Dedup.prefixJaccardJoin(textCorpus, $"doc_id", $"text", 2, 1, 2))
    val e = embs.filter($"vec_id" < 60)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val vecCorpus = e.unionAll(e.filter($"vec_id" % 5 === 0)
      .select($"vec_id" + 1000000, transform($"v", x => x * 1.5d)))
    check("embeddingNearDupPairs")(
      Dedup.embeddingNearDupPairsFreeable(vecCorpus, $"vec_id", $"v", 0.995))(
      Dedup.embeddingNearDupPairs(vecCorpus, $"vec_id", $"v", 0.995))
    check("embeddingNearDupLsh")(
      Dedup.embeddingNearDupLshFreeable(vecCorpus, $"vec_id", $"v", 64, 4, 0.995))(
      Dedup.embeddingNearDupLsh(vecCorpus, $"vec_id", $"v", 64, 4, 0.995))
    check("semanticDedup")(
      Dedup.semanticDedupFreeable(vecCorpus, $"vec_id", $"v", m = 4, iters = 1,
        threshold = 0.995))(
      Dedup.semanticDedup(vecCorpus, $"vec_id", $"v", m = 4, iters = 1,
        threshold = 0.995))
    val ref = docs.select($"doc_id", $"text")
    val newBatch = ref.filter($"doc_id" < 20).select(($"doc_id" + 5000).as("doc_id"),
      when($"doc_id" % 2 === 0, $"text").otherwise(concat($"text", lit(" fresh"))).as("text"))
    check("incrementalDedup")(
      Dedup.incrementalDedupFreeable(newBatch, ref, $"text", $"text",
        expectedRefItems = 10000L))(
      Dedup.incrementalDedup(newBatch, ref, $"text", $"text",
        expectedRefItems = 10000L))
    check("incrementalNearDedup")(
      Dedup.incrementalNearDedupFreeable(newBatch, ref, $"doc_id", $"text",
        $"doc_id", $"text"))(
      Dedup.incrementalNearDedup(newBatch, ref, $"doc_id", $"text",
        $"doc_id", $"text"))
  }

  test("bandedHammingPairsFreeable releases its hash + band checkpoints") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val d = docs.select($"doc_id", $"text").limit(40)
    val corpus = d.unionAll(d.select($"doc_id" + 1000000, $"text"))
    val hashed = Dedup.simHash(corpus, $"doc_id", $"text")
    val (pairs, free) = Dedup.bandedHammingPairsFreeable(hashed, $"__id",
      $"simhash", Dedup.SimHashBits, maxHamming = 3, maxBand = 4)
    val n = pairs.count()
    assert(n >= 40, s"expected every identical clone pair, got $n")
    val pinned = sc.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty)
    free()
    val leaked = pinned.intersect(sc.getPersistentRDDs.keySet)
    assert(leaked.isEmpty, s"free() left RDDs pinned: $leaked")
    // the uncapped path pins only the hash projection and frees it too
    val before2 = sc.getPersistentRDDs.keySet
    val (p2, free2) = Dedup.bandedHammingPairsFreeable(hashed, $"__id",
      $"simhash", Dedup.SimHashBits, maxHamming = 3, maxBand = Int.MaxValue)
    assert(p2.count() >= n)
    free2()
    val leaked2 = (sc.getPersistentRDDs.keySet -- before2)
    assert(leaked2.isEmpty, s"uncapped free() left RDDs pinned: $leaked2")
  }
}
