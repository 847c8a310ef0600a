package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Events, Mixing, Multimodal, Similarity, TextOps}

/**
 * Training-data pipeline operators as driver-contract queries with DuckDB
 * oracles. Hashes are md5-derived (engine-portable), arithmetic is explicit
 * double/bigint, and the LSH/IVF structures (hyperplane sign tests, IVF
 * argmax) are replicated with bit-exact left-assoc arithmetic, so EVERY
 * operator — including the approximate ANN paths — has an exact oracle.
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** events with an int64 `ts_us` micros ordinal, branching on the ts
    * physical type like p41 (driver generations have shifted between
    * TIMESTAMP(NANOS) read as raw longs and TIMESTAMP(MICROS)). */
  private def eventsUs(s: SparkSession, dir: String): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val tsMicros = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    ev.withColumn("ts_us", tsMicros)
  }

  /** documents ∪ shifted exact copies ∪ shifted near-copies — gives the
    * dedup operators real duplicates to find. */
  private def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id") + 1000000, concat(col("text"), lit(" extra token tail"))))
  }

  private val corpusSqlWithDups: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text || ' extra token tail' AS text
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin

  // portable md5-based 60-bit hash (Spark: conv(substr(md5(x),1,15),16,10))
  private def oH(x: String) = s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"
  private val oToks = "string_split(lower(trim(text)), ' ')"

  /** Shared unigram-LM CTE chain (p46/p65/p66): add-one smoothed log-probs
    * on the e4 integer lattice ([[TextOps.unigramLogProbScore]]), ending in
    * `sc(doc_id, n_tokens, score)` — per-doc token count and avg score. */
  private val lmScoreCtes: String =
    s"""toks AS (SELECT doc_id, unnest($oToks) AS t FROM documents),
       |tk AS (SELECT doc_id, t FROM toks WHERE t != ''),
       |vocab AS (SELECT t, count(*)::BIGINT AS c FROM tk GROUP BY t),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nvocab FROM vocab),
       |lp AS (SELECT t,
       |  CAST(floor(ln((c + 1)::DOUBLE / (ntok + nvocab)::DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS lp_e4
       |  FROM vocab, tot),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  floor(CAST(sum(lp_e4) AS DOUBLE) / count(*)::DOUBLE + 0.5) / 10000.0 AS score
       |  FROM tk JOIN lp USING (t) GROUP BY doc_id)""".stripMargin

  /** 13-token boilerplate injected by p58 (leading space: appended to text). */
  private val SubstrBoiler =
    " subscribe now for unlimited access to premium content from our partner network today"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_dedup_exact" -> ((s, dir) => {
      // exact byte-identical copies under fresh ids: dedup must remove all
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionAll(d.select(col("doc_id") + 1000000, col("text")))
      Dedup.exactDedup(corpus, col("text"), col("doc_id"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "p02_token_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        size(array_distinct(TextOps.charNgrams(col("text"), 8))).cast("long").as("n_grams8"),
        TextOps.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    "p03_quality" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "p04_langid" -> ((s, dir) => {
      val scores = TextOps.langScores(col("text"))
      docs(s, dir).select(
        (Seq(col("doc_id"), TextOps.langId(col("text")).as("pred_lang")) ++
          scores.map { case (l, c) => c.as(s"score_$l") }): _*)
        .orderBy(col("doc_id"))
    }),

    "p05_minhash_sigs" -> ((s, dir) => {
      Dedup.minHashSignatures(docs(s, dir), col("doc_id"), col("text"), k = 8)
        .withColumnRenamed("__id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    "p06_lsh_pairs" -> ((s, dir) => {
      // uncapped: the DuckDB oracle enumerates ALL bucket pairs, so the
      // declared query must match it at any scale; the MaxLshBucket
      // default protects library users, not the oracle contract
      Dedup.lshCandidatePairs(corpusWithDups(s, dir), col("doc_id"), col("text"), k = 8,
        maxBucket = Int.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "p07_jaccard_pairs" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(length(col("text")) < 150)
      Dedup.ngramJaccardPairs(c, col("doc_id"), col("text"), n = 8, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "p08_ann_cosine" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.cosineTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // cluster-balanced mixing (topic-balance shape): kmeans clusters on
    // embeddings, per-cluster rate = target/size (e4 lattice, capped),
    // deterministic hash-admission mix — small clusters upsample, big
    // ones downsample toward uniform cluster mass
    "p81_cluster_mix" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kMeansCentroids(e, col("vec_id"), col("embedding"),
        m = 8, iters = 2)
      val assigned = Similarity.ivfAssign(e, col("vec_id"), col("embedding"),
          cents, nprobe = 1)
        .select(col("vec_id"), col("centroid_id")).localCheckpoint(false)
      val sizes = assigned.groupBy(col("centroid_id")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val target = sizes.values.sum.toDouble / 8.0
      val rates = sizes.map { case (c, n) =>
        c.toString -> math.min(10000000.0,
          math.floor(target / n * 10000.0 + 0.5)) / 10000.0
      }
      val mixed = graft.pipeline.Mixing.mixSample(
        assigned.select(col("vec_id"), col("centroid_id").cast("string").as("stratum")),
        col("vec_id"), col("stratum"), rates, salt = "cb1")
      // n_in comes from the already-collected `sizes` (8 rows) — no second
      // aggregation over the corpus
      import s.implicits._
      val nIn = sizes.toSeq.map { case (c, n) => (c.toString, c.toLong, n) }
        .toDF("stratum", "centroid_id", "n_in")
      mixed.groupBy(col("stratum")).agg(count(lit(1)).as("n_out"))
        .join(broadcast(nIn), Seq("stratum"))
        .select(col("centroid_id"), col("n_in"), col("n_out"))
        .orderBy(col("centroid_id"))
    }),

    // PQ-ADC ANN: spherical per-subspace codebooks (4 x 16 dims, 8
    // codes, 2 Lloyd rounds), corpus compressed to codes, queries scan
    // codes with per-subspace dot tables
    "p80_ann_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      val books = Similarity.collectCodebooks(
        Similarity.pqCodebooks(e, col("vec_id"), col("embedding"),
          dim = 64, m = 4, k = 8, iters = 2))
      Similarity.pqCosineTopK(e, col("vec_id"), col("embedding"),
          e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
          books, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "p09_simhash" -> ((s, dir) => {
      Dedup.simHash(docs(s, dir), col("doc_id"), col("text"))
        .withColumnRenamed("__id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // SimHash near-dup pairs via pigeonhole banding (recall 1.0 by
    // construction); oracle = exact pairwise hamming on the same corpus.
    // Uncapped (see p06): the MaxSimHashBand default protects library
    // users; the oracle contract requires every qualifying pair.
    // Gopher-style repetition signals (top-word / duplicate n-gram
    // occurrence fractions) — the boilerplate/degenerate-text filter
    "p32_repetition" -> ((s, dir) => {
      TextOps.repetitionStats(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // Okapi BM25 against a fixed query-term set: domain-subset mining.
    // idf quantized on the integer (N, df) lattice -> engine-exact.
    "p33_bm25" -> ((s, dir) => {
      graft.pipeline.Ranking.bm25(docs(s, dir), col("doc_id"), col("text"),
        Seq("spark", "table", "window"))
        .orderBy(col("doc_id"))
    }),

    // deterministic stratified mixing: per-language target rates with
    // integer + fractional copies on the md5 10000-lattice
    "p34_mix_sample" -> ((s, dir) => {
      graft.pipeline.Mixing.mixSample(
        docs(s, dir).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        rates = Map("en" -> 0.25, "de" -> 2.0, "es" -> 1.5, "fr" -> 3.25),
        salt = "mix1")
        .select(col("doc_id"), col("lang"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // incremental dedup of a "new crawl" against the reference corpus:
    // bloom prefilter + exact anti-join verification (exact semantics)
    "p35_incremental_dedup" -> ((s, dir) => {
      val ref = docs(s, dir).select(col("doc_id"), col("text"))
      val newBatch = ref.select((col("doc_id") + 1000000).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" novel suffix"))).as("text"))
      Dedup.incrementalDedup(newBatch, ref, col("text"), col("text"),
        expectedRefItems = 100000L)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "p22_simhash_neardup" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(col("doc_id") % 2 === 0)
      Dedup.simHashNearDupPairs(c, col("doc_id"), col("text"), maxHamming = 3,
        maxBand = Int.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "p10_multimodal_meta" -> ((s, dir) => {
      val withPayload = docs(s, dir).select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.withDecodedMeta(withPayload, "payload")
        .select(col("doc_id"), col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"), col("meta.brightness").as("brightness"),
          col("meta.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))
    }),

    "p11_frame_sample" -> ((s, dir) => {
      val withPayload = docs(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(withPayload, "doc_id", "payload")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // end-to-end near-dedup: LSH candidates -> Jaccard verify -> removal
    "p13_near_dedup" -> ((s, dir) => {
      Dedup.nearDedup(corpusWithDups(s, dir), col("doc_id"), col("text"),
        maxBucket = Int.MaxValue) // uncapped: see p06
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // LSH-bucketed ANN: scale path; exact oracle (the deterministic
    // hyperplane signature is replicated in SQL) + recall spec vs brute force
    "p12_ann_lsh_bucketed" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bucketedCosineTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        dim = 64, bits = 4, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding-cosine near-dup: exact pairwise over a corpus with planted
    // positively-scaled copies (cosine exactly 1.0 — scale-invariant)
    "p18_embed_neardup" -> ((s, dir) => {
      Dedup.embeddingNearDupPairs(embCorpusWithDups(s, dir),
        col("vec_id"), col("v"), threshold = 0.995)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed embedding near-dedup: scale path; exact oracle
    // (replicated signature) + planted-duplicate/recall specs
    "p19_embed_neardup_lsh" -> ((s, dir) => {
      Dedup.embeddingNearDupLsh(embCorpusWithDups(s, dir),
        col("vec_id"), col("v"), dim = 64, bits = 4, threshold = 0.995)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // END-TO-END pipeline composition: near-dedup -> quality gate ->
    // per-bucket corpus stats, all ONE declarative chain — the shape of a
    // production training-data curation job
    "p21_pipeline_e2e" -> ((s, dir) => {
      // a 1/3 corpus slice: the composition is what the query checks; the
      // full-corpus near-dedup cost is already measured by p13
      val survivors = Dedup.nearDedup(corpusWithDups(s, dir).filter(col("doc_id") % 3 === 0),
        col("doc_id"), col("text"), maxBucket = Int.MaxValue) // uncapped: see p06
      survivors
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .filter(col("quality") >= 0.3)
        .withColumn("bucket", col("doc_id") % 10)
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("total_tokens"),
          // per-row re-quantization to integers keeps the sum
          // order-independent (fp-sum association differs across engines)
          sum(floor(col("quality") * 10000.0 + 0.5).cast("long")).as("quality_e4_sum"))
        .orderBy(col("bucket"))
    }),

    // IVF ANN: inverted-list scale path (coarse quantize -> probe nprobe
    // lists); exact oracle (bit-exact assignment argmax) + recall spec
    "p20_ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfCosineTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        m = 16, nprobe = 4, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // near-dup GROUP ids: transitive closure (connected components) of the
    // verified-pair graph; oracle = DuckDB recursive-CTE min-reachable-id.
    // 1/4 corpus slice: the full-corpus LSH+verify cost is already p13's
    "p24_neardup_groups" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(col("doc_id") % 4 === 1)
      val pairs = Dedup.lshCandidatePairs(c, col("doc_id"), col("text"), k = 8,
        maxBucket = Int.MaxValue) // uncapped: see p06
      val verified = Dedup.ngramJaccardVerify(c, col("doc_id"), col("text"),
        n = 8, threshold = 0.5, pairs)
      Dedup.nearDupGroups(c, col("doc_id"), verified)
        .orderBy(col("doc_id"))
    }),

    // deterministic hash split: content-independent, salt-keyed, portable
    "p25_split" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextOps.deterministicSplit(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // overlapping char chunks for context-window packing
    "p26_chunks" -> ((s, dir) => {
      TextOps.chunkText(docs(s, dir), col("doc_id"), col("text"),
        size = 64, overlap = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // corpus vocabulary: term/document frequency, top 100
    "p27_vocab" -> ((s, dir) => {
      TextOps.topTerms(docs(s, dir), col("doc_id"), col("text"), k = 100)
    }),

    // group-aware retention: keep the highest-quality doc per near-dup
    // group (what pair-based dropping can't express); same slice as p24
    "p28_dedup_keep_best" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(col("doc_id") % 4 === 1)
      val pairs = Dedup.lshCandidatePairs(c, col("doc_id"), col("text"), k = 8,
        maxBucket = Int.MaxValue) // uncapped: see p06
      val verified = Dedup.ngramJaccardVerify(c, col("doc_id"), col("text"),
        n = 8, threshold = 0.5, pairs)
      val groups = Dedup.nearDupGroups(c, col("doc_id"), verified)
      Dedup.keepBestPerGroup(c.withColumn("quality", TextOps.qualityScore(col("text"))),
        col("doc_id"), col("quality"), groups)
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // two-stage projected ANN: coarse rank in a random 8-dim projection,
    // exact re-rank of the top-50; exact oracle (replicated projection
    // arithmetic) + recall spec vs brute force
    "p29_ann_projected" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.projectedCosineTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        dimIn = 64, dimOut = 8, coarseK = 50, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Lloyd-trained IVF quantizer: 2 rounds of cosine-argmax assignment +
    // lattice-exact cluster means over the full corpus; output = the
    // trained centroids, exploded to scalar (centroid_id, pos, comp) rows
    // so the oracle value-checks every component
    "p36_ivf_kmeans" -> ((s, dir) => {
      val cents = Similarity.kMeansCentroids(embs(s, dir), col("vec_id"),
        col("embedding"), m = 8, iters = 2)
      cents.select(col("centroid_id").cast("long").as("centroid_id"),
        posexplode(col("centroid")).as(Seq("pos", "comp")))
        .select(col("centroid_id"), (col("pos") + 1).cast("long").as("pos"), col("comp"))
        .orderBy(col("centroid_id"), col("pos"))
    }),

    // int8 scalar quantization: codes, code sum, and the reconstruction
    // error bound scale/2 checked row by row
    "p30_quantize_int8" -> ((s, dir) => {
      val q = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
        .withColumn("q", Similarity.quantizeInt8(col("v")))
      q.select(col("vec_id"),
        Similarity.quantize4(col("q.scale")).as("scale_e4"),
        aggregate(col("q.codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        aggregate(zip_with(Similarity.dequantizeInt8(col("q")), col("v"),
          (r, x) => abs(r - x)), lit(0.0), (a, d) => greatest(a, d))
          .leq(col("q.scale") / 2.0 + lit(1e-12)).as("err_bounded"))
        .orderBy(col("vec_id"))
    }),

    // sequence packing: concat-then-split layout over doc_id order via the
    // two-level distributed prefix sum; every token packed exactly once.
    // bucketWidth=64 exercises the multi-bucket path even at sf0.001.
    "p37_pack_sequences" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("cnt"))
      graft.pipeline.Packing.packSequences(d, col("doc_id"), col("cnt"),
        budget = 256L, bucketWidth = 64L)
        .orderBy(col("doc_id"), col("seq_id"))
    }),

    // benchmark decontamination: word-5-gram overlap against the
    // doc_id % 7 == 3 eval slice; broadcast hashed eval grams
    "p38_decontam" -> ((s, dir) => {
      val corpus = docs(s, dir).select(col("doc_id"), col("text"))
      val eval = corpus.filter(col("doc_id") % 7 === 3)
      Dedup.decontaminate(corpus, col("doc_id"), col("text"),
        eval, col("text"), n = 5)
        .select(col("doc_id"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction over deterministically injected emails / phones /
    // card-shaped ids (the corpus itself is PII-free; the injection is the
    // same expression in both engines, so counts and redacted text are
    // oracle-exact)
    "p39_pii_redact" -> ((s, dir) => {
      val injected = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 1,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 2,
          concat(lit(" card "), lpad(col("doc_id").cast("string"), 16, "0")))
          .otherwise(lit(""))).as("text"))
      TextOps.redactPii(injected, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // the router feeding the mixer: BM25 domain tags become mixing
    // strata with per-domain target rates — the full "classify then
    // re-weight" assembly step, every stage engine-exact
    "p49_domain_mix" -> ((s, dir) => {
      val tagged = graft.pipeline.Ranking.domainTag(docs(s, dir),
        col("doc_id"), col("text"),
        Seq("compute" -> Seq("spark", "scan", "batch"),
          "storage" -> Seq("table", "row", "part"),
          "query" -> Seq("sort", "window", "hash", "merge")))
      val mixed = graft.pipeline.Mixing.mixSample(
        tagged.select(col("doc_id"), col("domain")),
        col("doc_id"), col("domain"),
        rates = Map("compute" -> 2.5, "storage" -> 0.5,
          "query" -> 1.25, "und" -> 0.1),
        salt = "dm1")
      mixed.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("domain"))
    }),

    // C4-style global line dedup: injected boilerplate lines (one on
    // every doc, one on every 5th) collapse to their first occurrence;
    // within-doc and cross-doc duplicate lines drop identically in both
    // engines, short lines bypass
    "p51_line_dedup" -> ((s, dir) => {
      val boiler = concat(col("text"),
        lit("\nsubscribe to our newsletter today"),
        when(col("doc_id") % 5 === 0,
          lit("\ncopyright example corporation all rights reserved"))
          .otherwise(lit("")))
      TextOps.lineDedup(
        docs(s, dir).select(col("doc_id"), boiler.as("text")),
        col("doc_id"), col("text"), minLineChars = 5)
        .orderBy(col("doc_id"))
    }),

    // REAL image decode: deterministic 24-bit BMP payloads built per
    // doc_id (real BMP bytes via ImageIO's writer), parsed back by
    // javax.imageio — width/height/bands/brightness from actual pixel
    // data; the oracle computes the closed-form per-pixel arithmetic
    "p50_image_meta" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val imgs = ids.mapPartitions(it =>
          it.map(id => (id, Multimodal.syntheticBmp(id, 8, 6))))
        .toDF("doc_id", "img")
      Multimodal.withDecodedMeta(imgs, "img", "meta", Multimodal.decodeImage)
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.channels").as("channels"),
          col("meta.brightness").as("brightness"), col("meta.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode: deterministic 16-bit mono PCM WAV payloads built
    // per doc_id (real WAV bytes via AudioSystem's WAVE writer), parsed
    // back by javax.sound.sampled — sample rate/channels/frames/peak/RMS
    // from the actual PCM payload; the oracle computes the closed-form
    // per-sample arithmetic (integer sum of squares → exact across engines)
    "p53_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val wavs = ids.mapPartitions(it =>
          it.map(id => (id, Multimodal.syntheticWav(id, (50 + id % 30).toInt))))
        .toDF("doc_id", "wav")
      Multimodal.withDecodedMeta(wavs, "wav", "meta",
          Multimodal.decodeAudio, Multimodal.AudioMetaSchema)
        .select(col("doc_id"), col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.n_samples").as("n_samples"),
          col("meta.peak").as("peak"), col("meta.rms").as("rms"))
        .orderBy(col("doc_id"))
    }),

    // SemDeDup semantic dedup: k-means clusters over the embedding space
    // (2 Lloyd rounds, lattice-exact centroids), within-cluster quantized
    // cosine >= 0.995 drops the higher id; scaled copies (cosine exactly
    // 1.0) injected for every 5th vector exercise the drop path
    "p52_semantic_dedup" -> ((s, dir) => {
      val base = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val corpus = base.unionAll(base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => x * 1.5).as("v")))
      Dedup.semanticDedup(corpus, col("vec_id"), col("v"),
          m = 8, iters = 2, threshold = 0.995)
        .orderBy(col("vec_id"))
    }),

    // REAL decode -> resize -> re-encode -> decode roundtrip: synthetic
    // 8x6 BMPs nearest-neighbor-downsampled to 4x3 (floor mapping picks
    // src pixel (2x, 2y)), re-encoded by ImageIO, decoded again for meta;
    // the oracle computes the sampled-pixel arithmetic in closed form
    "p56_image_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val imgs = ids.mapPartitions(it =>
          it.map(id => (id, Multimodal.syntheticBmp(id, 8, 6))))
        .toDF("doc_id", "img")
      val resized = Multimodal.withResized(imgs, "img", 4, 3, "thumb")
      Multimodal.withDecodedMeta(resized.drop("img"), "thumb", "meta",
          Multimodal.decodeImage)
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.channels").as("channels"),
          col("meta.brightness").as("brightness"))
        .orderBy(col("doc_id"))
    }),

    // REAL video container decode + frame sampling: deterministic
    // uncompressed AVIs built per doc_id (real RIFF bytes — hand-rolled
    // avih/strh/strf headers + raw 24-bit DIB frames with 0xFF row
    // padding), parsed back by the pure-JVM RIFF walk; one row per
    // sampled (every 2nd) frame with the frame's exact sample sum; the
    // oracle computes the closed-form per-pixel arithmetic, which only
    // matches if the parser walks real chunk boundaries and skips the
    // DIB row padding
    "p57_video_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val avis = ids.mapPartitions(it =>
          it.map(id => (id, Multimodal.syntheticAvi(id, 7, 5, (2 + id % 3).toInt))))
        .toDF("doc_id", "avi")
      Multimodal.sampleVideoFrames(avis, "doc_id", "avi", every = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // MJPEG AVI decode: same container walk as p57 but biCompression=
    // 'MJPG' with per-frame standalone JPEGs (encoded via ImageIO from
    // solid mid-bucket grays). JPEG loss forbids exact pixel oracles, but
    // solid gray survives the round-trip within ±2 per sample, so
    // floor(frame_mean / 10) is CLOSED FORM: (doc_id*7 + f*3) % 25. The
    // row only matches if the RIFF walk finds real 00dc chunk boundaries
    // AND each frame actually decodes through the JPEG path.
    "p64_mjpeg_video_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val avis = ids.mapPartitions(it =>
          it.map(id => (id,
            Multimodal.syntheticMjpegAvi(id, 16, 16, (1 + id % 3).toInt, solid = true))))
        .toDF("doc_id", "avi")
      Multimodal.sampleVideoFrames(avis, "doc_id", "avi")
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          col("frame_idx"),
          floor(col("frame_sum") / (16 * 16 * 3) / 10).cast("long").as("gray_bucket"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // hot-cluster-guarded SemDeDup: clusters above 100 vectors sub-bucket
    // by the 3-bit hyperplane signature, so pairs generate within
    // (cluster, bucket) — scaled copies always collide (sign invariance),
    // small clusters are untouched
    "p55_semantic_dedup_refined" -> ((s, dir) => {
      val base = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val corpus = base.unionAll(base.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => x * 1.5).as("v")))
      Dedup.semanticDedup(corpus, col("vec_id"), col("v"),
          m = 8, iters = 2, threshold = 0.995,
          dim = 64, refineBits = 3, refineMinSize = 100L)
        .orderBy(col("vec_id"))
    }),

    // per-source quota cap under skew: half the corpus is remapped to one
    // 'hot' source (capped via the hash-threshold prefilter path), the
    // rest stay in their small sources (pass through with no sort) — the
    // oracle only sees the deterministic top-cap-by-(hash, id) rank rule
    "p54_source_cap" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 < 5, lit("hot")).otherwise(col("source")).as("src"))
      Mixing.sourceCap(d, col("doc_id"), col("src"), cap = 40, salt = "cap")
        .orderBy(col("doc_id"))
    }),

    // curation chain v2: the round-7 ops composed as ONE declarative plan —
    // corpus-wide substring dedup feeds the gopher quality gate feeds DSIR
    // target-ratio selection; sd is checkpointed once (it feeds the gate,
    // the keep-join and both DSIR LM consumers)
    "p60_curation_v2" -> ((s, dir) => {
      val sd = Dedup.substringDedup(docs(s, dir), col("doc_id"), col("text"), n = 10)
        .select(col("doc_id"), col("text"))
        .localCheckpoint(false)
      val keep = TextOps.gopherFilter(sd, col("doc_id"), col("text"),
          minWords = 25, maxWords = 100000,
          minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
          minStopwordHits = 2,
          maxTopWordFrac = 0.125, maxDup2Frac = 0.10, maxDup3Frac = 0.05)
        .filter(col("keep")).select(col("doc_id"))
      val kept = sd.join(keep, "doc_id")
      TextOps.importanceResample(kept, col("doc_id"), col("text"),
          kept.filter(col("doc_id") % 7 === 3), col("text"), k = 100)
        .orderBy(col("doc_id"))
    }),

    // REAL perceptual image near-dup dedup: id-textured 16x16 BMPs (real
    // ImageIO bytes; spatial frequencies vary with id), an exact-byte copy
    // for every 5th doc and a retouched copy (+1 on a sparse diagonal
    // grid) for every 7th. decode -> integer-lattice DCT pHash ->
    // pigeonhole-banded Hamming pairs (the SimHash machinery, 63-bit) ->
    // transitive groups -> canonical = min id of the group. The hot-band
    // cap is LIVE here (smooth textures legitimately pile into shared
    // band values — the 10x scale probe measured the uncapped pair
    // explode going quadratic), and identical hashes collapse to a
    // representative before banding (the 30x probe measured 2.6k-member
    // hash classes saturating every bucket). The oracle replicates both:
    // rep = min(doc_id) per hash, rank REPS within (band, value), join
    // only rank <= cap, closure over reps, members inherit via their
    // hash. Hashes rebuilt from the closed-form pixels with the SAME e4
    // cosine table (interpolated literals).
    "p61_image_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val imgs = ids.flatMap { id =>
          Seq((id, id, false)) ++
            (if (id % 5 == 0) Seq((id + 10000000L, id, false)) else Nil) ++
            (if (id % 7 == 0) Seq((id + 20000000L, id, true)) else Nil)
        }.map { case (d, src, p) =>
          (d, Multimodal.syntheticPatternBmp(src, 16, 16, p))
        }.toDF("doc_id", "img")
      val hashed = Multimodal.withPHash(imgs, "img")
        .select(col("doc_id"), col("phash"))
        .localCheckpoint(false) // feeds groups and the final join
      // exact-duplicate hashes collapse to one representative BEFORE the
      // banded pairwise path (the 30x probe measured 2.6k-member identical-
      // hash classes turning the capped band join + CC into clique soup)
      val groups = Dedup.hashNearDupGroups(hashed, col("doc_id"), col("phash"),
        bits = 63, maxHamming = 2, maxBand = 1024)
      hashed.join(groups, Seq("doc_id"))
        .select(col("doc_id"), col("phash"), col("group_id"),
          (col("group_id") === col("doc_id")).as("canonical"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio near-dup dedup: Haitsma-Kalker sign-of-energy-difference
    // fingerprints (integer lattice, no FFT/fp drift) over real WAV bytes
    // decoded with javax.sound; exact copies for every 5th doc, faint
    // click-track retouches for every 7th. Same shared banding machinery
    // at SimHash's 60-bit/hamming<=3 config; uncapped like p22/p24, so
    // the oracle is the all-pairs Hamming filter over fingerprints
    // rebuilt from the closed-form PCM.
    "p62_audio_fingerprint_dedup" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val wavs = ids.flatMap { id =>
          Seq((id, id, false)) ++
            (if (id % 5 == 0) Seq((id + 10000000L, id, false)) else Nil) ++
            (if (id % 7 == 0) Seq((id + 20000000L, id, true)) else Nil)
        }.map { case (d, src, p) =>
          (d, Multimodal.syntheticWav(src, (400 + src % 100).toInt, p))
        }.toDF("doc_id", "wav")
      val hashed = Multimodal.withAudioFingerprint(wavs, "wav")
        .select(col("doc_id"), col("fp"))
        .localCheckpoint(false) // feeds groups and the final join
      // same identical-hash collapse as p61 — exact audio copies (every
      // 5th doc) share a fingerprint and never enter the pairwise path
      val groups = Dedup.hashNearDupGroups(hashed, col("doc_id"), col("fp"),
        bits = 60, maxHamming = 3, maxBand = 1024)
      hashed.join(groups, Seq("doc_id"))
        .select(col("doc_id"), col("fp"), col("group_id"),
          (col("group_id") === col("doc_id")).as("canonical"))
        .orderBy(col("doc_id"))
    }),

    // REAL video clip detection: textured 16x16x4-frame AVIs (real RIFF
    // container bytes; per-id hash-driven textures animated by a per-id
    // frame step), a re-muxed exact copy for every 5th doc and a 2-frame
    // CLIP cut from frame 1 for every 7th. Per-frame DCT pHashes straight
    // off the DIB payloads ride the shared banding on a composite
    // (video, frame) id; output is ordered video pairs with matching-
    // frame counts, with identical frame hashes collapsed to one
    // representative before the banded join (count products recover the
    // per-frame-pair counts exactly). The oracle rebuilds every frame
    // hash from the closed-form pixels with the same interpolated cosine
    // table and replicates the collapse + capped band join exactly.
    "p63_video_clip_matches" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).as[Long]
      val avis = ids.flatMap { id =>
          Seq((id, id, 4, 0)) ++
            (if (id % 5 == 0) Seq((id + 10000000L, id, 4, 0)) else Nil) ++
            (if (id % 7 == 0) Seq((id + 20000000L, id, 2, 1)) else Nil)
        }.map { case (d, src, nf, off) =>
          (d, Multimodal.syntheticPatternAvi(src, 16, 16, nf, off))
        }.toDF("doc_id", "avi")
      val frames = Multimodal.withVideoFramePHashes(avis, "doc_id", "avi")
      Dedup.videoClipMatches(frames, col("id"), col("frame_idx"), col("phash"),
          maxHamming = 2, maxBand = 1024)
        .orderBy(col("vid_a"), col("vid_b"))
    }),

    // EXACTSUBSTR dedup (Lee et al. 2021): a shared 13-token boilerplate
    // injected into every 3rd doc makes all of its interior 10-grams
    // corpus-duplicated, so every injected doc except the globally-first
    // occurrence loses exactly the boilerplate span — plus any natural
    // 10-gram repeats already in the corpus
    "p58_substring_dedup" -> ((s, dir) => {
      val inj = docs(s, dir).select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 3 === 0, lit(SubstrBoiler))
          .otherwise(lit(""))).as("text"))
      Dedup.substringDedup(inj, col("doc_id"), col("text"), n = 10)
        .orderBy(col("doc_id"))
    }),

    // DSIR importance resampling: target distribution = every 7th doc
    // (the p38 eval-set convention); rank the whole corpus by the
    // target-vs-corpus unigram log-ratio and keep the top 100
    "p59_importance_resample" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.importanceResample(d, col("doc_id"), col("text"),
          d.filter(col("doc_id") % 7 === 3), col("text"), k = 100)
        .orderBy(col("doc_id"))
    }),

    // ingest text normalization: control-char strip + whitespace collapse
    // over deterministically dirtied text (tabs/newlines/bell/double
    // spaces injected identically in both engines)
    "p48_normalize" -> ((s, dir) => {
      val dirty = docs(s, dir).select(col("doc_id"),
        concat(lit("  "), col("text"), expr("chr(9)"), lit("x"),
          expr("chr(10)"), expr("chr(10)"), lit("  y  "), expr("chr(7)")).as("text"))
      dirty.select(col("doc_id"),
        TextOps.normalizeText(col("text")).as("normalized"),
        (length(col("text")) - length(TextOps.normalizeText(col("text"))))
          .cast("long").as("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // BM25 domain routing: argmax over K term-set scores in one corpus
    // pass; declaration-order tiebreak, 'und' when all zero
    "p47_domain_tag" -> ((s, dir) => {
      graft.pipeline.Ranking.domainTag(docs(s, dir), col("doc_id"), col("text"),
        Seq("compute" -> Seq("spark", "scan", "batch"),
          "storage" -> Seq("table", "row", "part"),
          "query" -> Seq("sort", "window", "hash", "merge")))
        .orderBy(col("doc_id"))
    }),

    // unigram-LM quality scoring (the perplexity filter): add-one
    // smoothed log-probs on the (c, T, V) integer lattice, long-summed
    // per doc — engine-exact end to end
    "p46_lm_score" -> ((s, dir) => {
      TextOps.unigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // the composed CCNet shape as ONE declarative plan: LM-score -> per-
    // language head/middle/tail -> drop the tail -> per-(lang, bucket)
    // retention report (docs + token mass kept) — what the mixture
    // designer actually reads before setting sampling rates
    // fastText-style hashed linear classifier inference (the DCLM /
    // FineWeb-Edu quality gate): pure per-row projection — zero shuffle,
    // the weight is a formula of the md5 hash bucket
    "p70_classifier_score" -> ((s, dir) => {
      TextOps.classifierScore(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // interpolated bigram LM (the CCNet KenLM step at order 2): corpus
    // self-trained, add-one smoothed, e4 lattice scores
    "p71_bigram_lm" -> ((s, dir) => {
      TextOps.bigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // cross-corpus form (CCNet deployment shape): LM trained on the
    // English slice, every document scored against it with count-0
    // add-one backoff for unseen tokens/grams
    "p72_bigram_lm_cross" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.bigramLmScoreAgainst(d, col("doc_id"), col("text"),
          d.filter(col("lang") === "en"), col("text"))
        .orderBy(col("doc_id"))
    }),

    "p69_ccnet_pipeline" -> ((s, dir) => {
      val scored = TextOps.unigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
        .localCheckpoint(false) // slim (id, cnt, score, lang); feeds partition + report
      TextOps.perplexityPartition(scored, col("doc_id"), col("avg_logprob"),
          col("lang"), headFrac = 0.3, midFrac = 0.3)
        .filter(col("ppl_bucket") =!= "tail")
        .join(scored.select(col("doc_id"), col("n_tokens")), "doc_id")
        .groupBy(col("lang"), col("ppl_bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("lang"), col("ppl_bucket"))
    }),

    // corpus snapshot delta: tonight's crawl vs the stored corpus — every
    // 10th doc dropped, every 7th survivor edited, every 9th re-added
    // under a new id; statuses derive from a full outer join of two
    // (id, content-hash) frames, texts never shuffle
    "p68_corpus_diff" -> ((s, dir) => {
      val old = docs(s, dir).select(col("doc_id"), col("text"))
      val survived = old.filter(col("doc_id") % 10 =!= 0)
      val edited = survived.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      val added = old.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 5000000).as("doc_id"), col("text"))
      TextOps.corpusDiff(old, edited.unionByName(added),
          col("doc_id"), col("text"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // per-language token budgets: an independent best-first walk inside
    // each language, each selecting 30% of its own token mass — the
    // mixture-allocation step ("X tokens of web, Y of code"); budgets are
    // a driver-held per-stratum aggregate (5 longs), the walk is the same
    // two-level prefix sum with the cross-cell window partitioned by lang
    "p67_lang_token_budget" -> ((s, dir) => {
      val scored = TextOps.unigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
        .localCheckpoint(false) // slim; feeds the budget agg and the walk
      val budgets = scored.groupBy(col("lang")).agg(sum(col("n_tokens")).as("__t"))
        .collect()
        .map(r => r.getString(0) -> math.ceil(r.getLong(1).toDouble * 0.3).toLong)
        .toMap
      Mixing.tokenBudgetSelectPerStratum(scored, col("doc_id"), col("avg_logprob"),
          col("n_tokens"), col("lang"), budgets)
        .orderBy(col("doc_id"))
    }),

    // CCNet head/middle/tail stratification: LM-score every doc (p46's
    // exact lattice), then partition each language by score-class
    // percentile — class-level assignment (equal scores share a bucket),
    // cumulative counts over the tiny (lang, score) class frame only
    "p65_perplexity_buckets" -> ((s, dir) => {
      val scored = TextOps.unigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      TextOps.perplexityPartition(scored, col("doc_id"), col("avg_logprob"),
          col("lang"), headFrac = 0.3, midFrac = 0.3)
        .orderBy(col("doc_id"))
    }),

    // token-budget selection: walk docs best-LM-score-first and keep them
    // until 40% of the corpus token mass is taken (the straddling doc
    // included); global running sum via the Packing-style two-level
    // prefix sum over (score, id-bucket) cells — no corpus-wide window
    "p66_token_budget" -> ((s, dir) => {
      val scored = TextOps.unigramLogProbScore(docs(s, dir), col("doc_id"), col("text"))
        .localCheckpoint(false) // slim (id, cnt, score); feeds total + selection
      val total = scored.agg(sum(col("n_tokens"))).head().getLong(0)
      val budget = math.ceil(total.toDouble * 0.4).toLong
      Mixing.tokenBudgetSelect(scored, col("doc_id"), col("avg_logprob"),
          col("n_tokens"), budget)
        .orderBy(col("doc_id"))
    }),

    // hybrid retrieval: BM25 (lexical) fused with embedding cosine
    // (dense) — both lattice-quantized BEFORE fusion so the fused rank
    // order is engine-exact; top-k is a TakeOrdered
    "p45_hybrid_search" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.pipeline.Ranking.hybridTopK(
        docs(s, dir), col("doc_id"), col("text"),
        e, col("vec_id"), col("embedding"),
        terms = Seq("spark", "table", "window"),
        queryVec = e.filter(col("vec_id") === 7),
        alpha = 0.3, k = 20)
    }),

    // corpus data card: per-language doc/token counts, exact rank-based
    // length percentiles, exact-duplicate rate — one doc-level pass plus
    // one key-partitioned rank window, no global sort
    "p44_corpus_report" -> ((s, dir) => {
      TextOps.corpusReport(docs(s, dir), col("doc_id"), col("text"), col("lang"))
        .orderBy(col("lang"))
    }),

    // incremental NEAR-dedup: admit only new-batch docs that aren't
    // near-dups of the reference corpus (new bands broadcast; reference
    // never shuffles). Batch = near-copies (dropped), exact copies
    // (dropped), reversed texts (novel, admitted).
    "p43_incremental_neardedup" -> ((s, dir) => {
      val ref = docs(s, dir).select(col("doc_id"), col("text"))
      val newBatch = ref.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" tiny tail")).as("text"))
        .unionAll(ref.filter(col("doc_id") % 9 === 1)
          .select((col("doc_id") + 2100000).as("doc_id"), col("text")))
        .unionAll(ref.filter(col("doc_id") % 9 === 2)
          .select((col("doc_id") + 2200000).as("doc_id"),
            reverse(col("text")).as("text")))
      Dedup.incrementalNearDedup(newBatch, ref,
        col("doc_id"), col("text"), col("doc_id"), col("text"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // the complete curation pipeline as ONE declarative plan: rule filter
    // → eval-set decontamination → near-dedup → deterministic split →
    // sequence packing of the train split. Composes five round-6 ops with
    // the round-3 near-dedup machinery; the oracle replays every stage.
    // 1/3 slice (different from p21's) bounds the bench cost.
    "p42_curation_pipeline" -> ((s, dir) => {
      val base = corpusWithDups(s, dir).filter(col("doc_id") % 3 === 1)
      val kept = TextOps.gopherFilter(base, col("doc_id"), col("text"),
        minWords = 15, maxWords = 100000,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minStopwordHits = 1, maxTopWordFrac = 0.15,
        maxDup2Frac = 0.15, maxDup3Frac = 0.10)
        .filter(col("keep")).select(col("doc_id"))
      val kc = base.join(kept, "doc_id")
      val evalSet = docs(s, dir).filter(col("doc_id") % 11 === 5)
      val clean = Dedup.decontaminate(kc, col("doc_id"), col("text"),
        evalSet, col("text"), n = 6)
        .filter(!col("contaminated")).select(col("doc_id"), col("text"))
      val deduped = Dedup.nearDedup(clean, col("doc_id"), col("text"),
        maxBucket = Int.MaxValue) // uncapped: see p06
      val train = deduped.withColumn("split",
          TextOps.deterministicSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.1), salt = "cur"))
        .filter(col("split") === "train")
      graft.pipeline.Packing.packSequences(
        train.select(col("doc_id"), TextOps.tokenCount(col("text")).as("cnt")),
        col("doc_id"), col("cnt"), budget = 512L, bucketWidth = 64L)
        .orderBy(col("doc_id"), col("seq_id"))
    }),

    // gap-based sessionization of the event stream (24 h gap) on int64
    // MICROsecond ordinals, matching DuckDB's epoch_us(ts). The testdata's
    // ts physical type has shifted between driver generations — TIMESTAMP
    // (NANOS) (read as raw nanos under nanosAsLong; floor to micros) vs
    // TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ; unix_micros under the UTC
    // session == the naive micros) — so branch on the read dtype.
    "p41_sessions" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tsMicros = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => unix_micros(col("ts").cast("timestamp")).as("ts")
      }
      graft.pipeline.Sessions.sessionize(ev, col("user_id"),
        tsMicros, col("value"), gap = 86400L * 1000000L)
        .orderBy(col("key"), col("session_idx"))
    }),

    // as-of join: every purchase picks up the user's latest preceding
    // click (union-scan form — one key partitioning, no range-join pair
    // blow-up); ties at equal ts go to the larger click event_id
    "p73_asof_join" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("v_e2"))
      Events.asOfJoin(purchases, col("user_id"), col("ts_us"), col("event_id"),
          clicks, col("user_id"), col("ts_us"), col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof.event_id").as("click_event_id"),
          col("asof.ts_us").as("click_ts_us"),
          col("asof.v_e2").as("click_value_e2"),
          (col("ts_us") - col("asof.ts_us")).as("wait_us"))
        .orderBy(col("event_id"))
    }),

    // ordered funnel signup -> click -> purchase within 7 days —
    // re-anchoring exists-a-chain semantics (every signup is a candidate
    // anchor; see Events.funnel)
    "p74_funnel" -> ((s, dir) =>
      Events.funnel(eventsUs(s, dir), col("user_id"), col("ts_us"),
          col("event_type"), Seq("signup", "click", "purchase"),
          maxSpan = 7L * 86400L * 1000000L)
        .orderBy(col("step_idx"))),

    // per-key funnel completion rows (the frame p74 rolls up; the
    // streaming funnel twin emits these incrementally)
    "p78_funnel_steps" -> ((s, dir) =>
      Events.funnelCompletions(eventsUs(s, dir), col("user_id"), col("ts_us"),
          col("event_type"), Seq("signup", "click", "purchase"),
          maxSpan = 7L * 86400L * 1000000L)
        .orderBy(col("key"), col("step_idx"))),

    // retention triangle: first-event-day cohorts x day offsets
    "p75_cohort_retention" -> ((s, dir) =>
      Events.cohortRetention(eventsUs(s, dir), col("user_id"), col("ts_us"),
          dayUnit = 86400000000L)
        .orderBy(col("cohort_day"), col("day_offset"))),

    // semi-structured props extraction: per-row JSON field pull
    // (codegen'd get_json_object — no UDF, no shuffle) + rollup
    "p87_props_extract" -> ((s, dir) =>
      eventsUs(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("__k"))
        .groupBy(col("event_type"), (col("__k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("__k")).as("k_sum"))
        .orderBy(col("event_type"), col("k_mod"))),

    // per-event trailing 24 h activity (count + e2 sum for the same user)
    "p82_rolling_stats" -> ((s, dir) =>
      Events.rollingWindowStats(eventsUs(s, dir), col("user_id"), col("ts_us"),
          col("event_id"), col("value"), lookback = 86400000000L)
        .orderBy(col("seq"))),

    // crawl-to-corpus macro: HTML-wrapped docs (with injected duplicate
    // records) go to disk as WARC, come back through the splittable scan,
    // and run extract -> quality gate -> exact dedup as ONE declarative
    // plan — the CommonCrawl front-end stitched to the curation pipeline
    "p86_crawl_pipeline" -> ((s, dir) => {
      def htmlOf(id: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column) = concat(
        lit("<html><head><title>t</title><style>body{color:red}</style>" +
          "<script type=\"text/javascript\">var x = \"<p>decoy</p>\";</script></head>" +
          "<body><!-- comment --><h1>Doc "), id.cast("string"),
        lit("</h1><p>"), coalesce(text, lit("")),
        lit("</p><div>footer &amp; nav &lt;end&gt;</div></body></html>"))
      val base = docs(s, dir).select(col("doc_id"), col("source"),
        htmlOf(col("doc_id"), col("text")).cast("binary").as("payload"))
      val recs = base.select(
          concat(lit("http://corpus/"), col("source"), lit("/"), col("doc_id")).as("uri"),
          lit("text/html").as("ct"), col("payload"))
        .unionAll(base.filter(col("doc_id") % 7 === 0).select(
          concat(lit("http://corpus/"), col("source"), lit("/"), col("doc_id"),
            lit("-dup")).as("uri"),
          lit("text/html").as("ct"), col("payload")))
      val out = s"/tmp/graft-warc-pipe/${new java.io.File(dir).getName}"
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      graft.sources.warc.WarcWriter.writeResponses(recs, out, "2026-01-01T00:00:00Z")
      val ext = s.read.format("warc")
        .option("maxPartitionBytes", 64L << 10).load(out)
        .select(element_at(split(col("target_uri"), "/"), 4).as("source"),
          TextOps.htmlToText(col("payload").cast("string")).as("__t"))
      val tk = TextOps.cleanTokens(col("__t"))
      // ONE crawl scan: the gate is a flag, the rollup conditional —
      // a second scan of 100 TB of WARC just to count raw records would
      // double the whole job's IO
      val flagged = ext
        .select(col("source"), col("__t"),
          size(tk).cast("long").as("__nw"),
          aggregate(tk, lit(0L), (a, t) => a + length(t)).as("__sl"))
        .withColumn("__keep", col("__nw") >= 30 &&
          col("__sl") >= col("__nw") * 3 && col("__sl") <= col("__nw") * 10)
      flagged.groupBy(col("source"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          countDistinct(when(col("__keep"), md5(col("__t").cast("binary"))))
            .as("n_unique"))
        .orderBy(col("source"))
    }),

    // WET-style HTML -> text extraction: documents wrapped in noisy HTML
    // (script with tag decoys, style, comments, entities), recovered by
    // the regex-only extractor — pure projection, oracle-replayed
    "p85_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>t</title><style>body{color:red}</style>" +
          "<script type=\"text/javascript\">var x = \"<p>decoy</p>\";</script></head>" +
          "<body><!-- comment --><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p>"), coalesce(col("text"), lit("")),
        lit("</p><div>footer &amp; nav &lt;end&gt;</div></body></html>"))
      docs(s, dir).select(col("doc_id"), TextOps.htmlToText(html).as("__t"))
        .select(col("doc_id"), md5(col("__t").cast("binary")).as("clean_md5"),
          length(col("__t")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // WARC container roundtrip: documents become response records via the
    // distributed writer, read back through the format("warc") DSv2 scan
    // with 64 KB ranges (forces mid-record splits + resync at every SF)
    "p84_warc_roundtrip" -> ((s, dir) => {
      val d = docs(s, dir).select(
        concat(lit("http://corpus/"), col("source"), lit("/"), col("doc_id")).as("uri"),
        lit("text/plain").as("content_type"),
        coalesce(col("text"), lit("")).cast("binary").as("payload"))
      val out = s"/tmp/graft-warc/${new java.io.File(dir).getName}"
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(p, true)
      graft.sources.warc.WarcWriter.writeResponses(d, out, "2026-01-01T00:00:00Z")
      s.read.format("warc").option("maxPartitionBytes", 64L << 10).load(out)
        .select(
          element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
          col("content_length"),
          md5(col("payload")).as("payload_md5"),
          col("record_type"), col("record_id"))
        .orderBy(col("doc_id"))
    }),

    // weighted sampling without replacement (exponential clocks on the
    // bounded min-k kernel): inclusion follows token-count weights,
    // one pass, no global sort, exactly replayable
    "p106_weighted_sample" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(TextOps.cleanTokens(col("text"))).cast("long").as("ntok"))
        .filter(col("ntok") > 0)
      graft.pipeline.Sketches.weightedBottomKSample(d, col("doc_id"), col("ntok"), k = 200)
        .select(col("doc_id"), col("ntok"), col("sample_key_e6"))
        .orderBy(col("doc_id"))
    }),

    // dedup eval harness: the LSH->verify near-dup pipeline scored
    // against KNOWN planted duplicates (the +1e6 near-copies ARE the
    // ground truth) — precision/recall on the e6 lattice; the
    // eval-the-approximate-op pattern, exactly replayable
    "p104_dedup_eval" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(length(col("text")) < 150)
      val pairs = Dedup.lshCandidatePairs(c, col("doc_id"), col("text"), k = 8,
        maxBucket = Int.MaxValue)
      val predicted = Dedup.ngramJaccardVerify(c, col("doc_id"), col("text"),
        n = 8, threshold = 0.5, pairs)
        .select(col("id_a"), col("id_b"))
      // ground truth: each planted near-copy pairs with its source
      val truth = c.filter(col("doc_id") >= 1000000L)
        .select((col("doc_id") - 1000000L).as("id_a"), col("doc_id").as("id_b"))
      val tp = predicted.join(truth, Seq("id_a", "id_b"), "leftsemi")
        .agg(count(lit(1)).as("n_tp"))
      val np = predicted.agg(count(lit(1)).as("n_pred"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      tp.crossJoin(np).crossJoin(nt).select(
        col("n_tp"), col("n_pred"), col("n_truth"),
        when(col("n_pred") > 0, expr("(n_tp * 1000000) div n_pred"))
          .otherwise(lit(0L)).as("precision_e6"),
        when(col("n_truth") > 0, expr("(n_tp * 1000000) div n_truth"))
          .otherwise(lit(0L)).as("recall_e6"))
    }),

    // retrieval eval harness: per-query recall@10 and MRR@10 of the
    // BM25 ranker against conjunctive-match relevance, integer-lattice
    // metrics; top-k plans as TakeOrdered (no full sort)
    "p103_retrieval_metrics" -> ((s, dir) =>
      graft.pipeline.Ranking.retrievalMetrics(docs(s, dir), col("doc_id"), col("text"),
        Seq("q1" -> Seq("spark", "window"), "q2" -> Seq("merge", "sort", "fast"),
          "q3" -> Seq("customer", "line")), k = 10)
        .orderBy(col("query_id"))),

    // leakage-safe train/val/test split: assignment is keyed by the
    // near-dup GROUP representative, so every member of a duplicate
    // cluster lands in the SAME fold — the split that keeps eval sets
    // uncontaminated by training near-copies (doc-keyed p25 cannot
    // guarantee this)
    "p102_group_split" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(col("doc_id") % 4 === 1)
      val pairs = Dedup.lshCandidatePairs(c, col("doc_id"), col("text"), k = 8,
        maxBucket = Int.MaxValue)
      val verified = Dedup.ngramJaccardVerify(c, col("doc_id"), col("text"),
        n = 8, threshold = 0.5, pairs)
      val groups = Dedup.nearDupGroups(c, col("doc_id"), verified)
      val bucket = TextOps.hashBucket10k(col("group_id"), "gs")
      groups.withColumn("split",
          when(bucket < 8000, lit("train"))
            .when(bucket < 9000, lit("val")).otherwise(lit("test")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("group_id")).as("n_groups"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // CommonCrawl wire-format roundtrip: corpus -> per-record-GZIP warc
    // members -> splittable gz scan at 64 KB ranges (mid-member splits
    // at every SF; member boundaries re-found by deflate+header
    // validation) -> hash-exact against the documents oracle
    "p100_warc_gz_roundtrip" -> ((s, dir) => {
      val d = docs(s, dir).select(
        concat(lit("http://corpus/"), col("source"), lit("/"), col("doc_id")).as("uri"),
        lit("text/plain").as("content_type"),
        coalesce(col("text"), lit("")).cast("binary").as("payload"))
      val out = s"/tmp/graft-warcgz/${new java.io.File(dir).getName}"
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(p, true)
      graft.sources.warc.WarcWriter.writeResponsesGz(d, out, "2026-01-01T00:00:00Z")
      s.read.format("warc").option("maxPartitionBytes", 64L << 10).load(out)
        .select(
          element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
          col("content_length"),
          md5(col("payload")).as("payload_md5"),
          col("record_type"), col("record_id"))
        .orderBy(col("doc_id"))
    }),

    // feature-assembly macro: one declarative plan builds the per-purchase
    // feature row — latest preceding click (as-of), trailing 24 h activity
    // (rolling), funnel stage reached, cohort day — the feature-store
    // shape the whole events family composes into
    "p83_event_features" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val asof = Events.asOfJoin(purchases, col("user_id"), col("ts_us"), col("event_id"),
          clicks, col("user_id"), col("ts_us"), col("event_id"))
        .select(col("event_id"), col("asof.event_id").as("click_event_id"),
          (col("ts_us") - col("asof.ts_us")).as("wait_us"))
      val rolling = Events.rollingWindowStats(ev, col("user_id"), col("ts_us"),
          col("event_id"), col("value"), lookback = 86400000000L)
        .select(col("seq").as("event_id"), col("n_trailing"), col("sum_trailing_e2"))
      val stages = Events.funnelCompletions(ev, col("user_id"), col("ts_us"),
          col("event_type"), Seq("signup", "click", "purchase"),
          maxSpan = 7L * 86400L * 1000000L)
        .groupBy(col("key")).agg(max(col("step_idx")).as("__stage"))
      val cohort = ev.select(col("user_id"),
          ((col("ts_us") - pmod(col("ts_us"), lit(86400000000L))) / 86400000000L)
            .cast("long").as("__day"))
        .groupBy(col("user_id")).agg(min(col("__day")).as("cohort_day"))
      purchases
        .join(asof, Seq("event_id"))
        .join(rolling, Seq("event_id"))
        .join(stages.withColumnRenamed("key", "user_id"), Seq("user_id"), "left")
        .join(cohort, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("click_event_id"), col("wait_us"),
          col("n_trailing"), col("sum_trailing_e2"),
          coalesce(col("__stage"), lit(-1)).cast("long").as("funnel_stage"),
          col("cohort_day"))
        .orderBy(col("event_id"))
    }),

    // hopping-window rollup: 6 h windows sliding every 2 h, per event type
    "p76_hopping_stats" -> ((s, dir) =>
      Events.hoppingWindowStats(eventsUs(s, dir), col("ts_us"),
          col("event_type"), col("value"),
          windowLen = 21600000000L, slide = 7200000000L)
        .orderBy(col("window_start"), col("group"))),

    // guaranteed heavy hitters: every token in >= 4 permille of corpus
    // tokens, with its EXACT count — one Misra-Gries sketch scan (O(k)
    // counters per partition, never a vocabulary-sized hash aggregate)
    // generates a guaranteed-superset candidate list; a second scan
    // counts only the <= k broadcast candidates exactly
    "p109_heavy_hitters" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      graft.pipeline.Sketches.heavyHitters(toks, col("token"), minPermille = 4, k = 256)
        .withColumnRenamed("item", "token")
        .orderBy(desc("n_occurrences"), col("token"))
    }),

    // CDC/upsert snapshot merge (MERGE semantics, relationally): one
    // union + one per-id struct-max arg-max (no corpus window), delete
    // rows filtered after the version race
    "p108_apply_changes" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val changes = d.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit("upsert").as("op"),
          concat(col("text"), lit(" v2")).as("text"), lit(2L).as("version"))
        .unionAll(d.filter(col("doc_id") % 11 === 3 && col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), lit("delete").as("op"),
            lit(null).cast("string").as("text"), lit(2L).as("version")))
        .unionAll(d.filter(col("doc_id") % 13 === 1)
          .select((col("doc_id") + 10000000L).as("doc_id"), lit("upsert").as("op"),
            concat(lit("new "), col("text")).as("text"), lit(2L).as("version")))
      TextOps.applyChanges(d, col("doc_id"), col("text"),
          changes, col("doc_id"), col("op"), col("text"), col("version"))
        .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("text_md5"),
          col("version"), col("last_op"))
        .orderBy(col("doc_id"))
    }),

    // rate-anomaly alarm: tumbling 2h windows vs the mean of the 3
    // preceding windows, integer cross-multiplied 3/2 threshold — the
    // ingest monitoring shape (window sort over the aggregate frame,
    // never the event log)
    "p107_rate_anomaly" -> ((s, dir) =>
      Events.rateAnomaly(eventsUs(s, dir), col("ts_us"), col("event_type"),
          windowLen = 7200000000L, baseline = 3, threshNum = 3L, threshDen = 2L)
        .orderBy(col("window_start"), col("group"))),

    // hashed linear classifier TRAINING: 3 full-batch GD iterations on
    // logistic loss vs a seed-keyword weak label (the fastText-bootstrap
    // shape), then score the corpus with the learned weights
    "p77_classifier_train" -> ((s, dir) =>
      TextOps.classifierTrain(docs(s, dir), col("doc_id"), col("text"),
          when(col("text").contains("vector"), 1L).otherwise(0L))
        .orderBy(col("doc_id"))),

    // KMV distinct-count sketch: per-language vocabulary estimate
    // (O(k) state per group vs the corpus-sized expand of exact
    // count-distinct), exact distinct alongside for error inspection
    "p79_kmv_vocab" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("lang"),
        explode(TextOps.cleanTokens(col("text"))).as("t"))
      graft.pipeline.Sketches.approxDistinct(toks, Seq(col("lang")), col("t"), k = 256)
        .join(toks.groupBy(col("lang")).agg(countDistinct(col("t")).as("distinct_exact")),
          Seq("lang"))
        .orderBy(col("lang"))
    }),

    // BPE tokenizer TRAINING: one corpus scan -> (word, count), then a
    // greedy merge loop on the compact vocab frame only; exact
    // left-to-right merge semantics replayed verbatim by the oracle
    "p90_bpe_train" -> ((s, dir) => {
      val model = graft.pipeline.Bpe.train(
        graft.pipeline.Bpe.wordCounts(docs(s, dir), col("text")), nMerges = 8)
      graft.pipeline.Bpe.mergesFrame(docs(s, dir), model).orderBy(col("merge_rank"))
    }),

    // the OVER-BOUND BPE regime: merge rounds stay distributed (one
    // pair-aggregation + 1-row argmax job per merge, vocab never
    // collected) — byte-identical to p90's driver loop, and gated by the
    // SAME relational replay oracle
    "p117_bpe_train_distributed" -> ((s, dir) => {
      val model = graft.pipeline.Bpe.trainDistributed(
        graft.pipeline.Bpe.wordCounts(docs(s, dir), col("text")), nMerges = 8,
        mergesPerBarrier = 3)
      graft.pipeline.Bpe.mergesFrame(docs(s, dir), model).orderBy(col("merge_rank"))
    }),

    // BPE encoding with the trained model: the final vocab frame already
    // holds every word's merged form, so per-doc token counts are one
    // broadcast join against (word, n_symbols)
    "p91_bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = graft.pipeline.Bpe.train(
        graft.pipeline.Bpe.wordCounts(d, col("text")), nMerges = 8)
      graft.pipeline.Bpe.encodeCounts(d, col("doc_id"), col("text"), model)
        .orderBy(col("doc_id"))
    }),

    // EXACT similarity join by prefix filtering: candidates only on
    // each doc's rarest gram prefix (no false negatives, unlike LSH;
    // no hot-gram blowup, unlike the all-shared-gram join). Oracle is
    // the BRUTE-FORCE join — the gate proves the filter loses nothing.
    "p95_prefix_jaccard_join" -> ((s, dir) => {
      val c = corpusWithDups(s, dir).filter(length(col("text")) < 150)
      Dedup.prefixJaccardJoin(c, col("doc_id"), col("text"), n = 8, tNum = 6, tDen = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // bottom-k hash sampling: deterministic uniform 256-sample (one
    // pass, O(k) aggregate state, no global sort) -> quantile
    // estimates of per-doc token counts from the sample
    "p94_sampled_quantiles" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(TextOps.cleanTokens(col("text"))).cast("long").as("ntok"))
      graft.pipeline.Sketches.sampledQuantiles(d, col("doc_id"), col("ntok"),
        k = 256, permille = Seq(250, 500, 900))
    }),

    // character-entropy quality signal: Shannon entropy of each doc's
    // char distribution on the e4 ln-lattice (the compressibility proxy
    // — low = repetitive boilerplate, high = random junk); two hash
    // aggregates on the doc key, no joins, no compressor dependency
    "p112_char_entropy" -> ((s, dir) =>
      TextOps.charEntropyE4(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // ANN recall harness: planted-neighbor ground truth — each query is a
    // corpus vector with one component nudged, so its true nearest
    // neighbor IS the source vector — scored against every approximate
    // index path (IVF inverted lists, PQ-ADC codes, random-projection
    // rerank) plus the exact brute-force baseline. Laws: brute recall is
    // exactly 1.0; each approximate path clears its floor (set with
    // margin below measured recall at all three SFs). The quality twin of
    // p104's dedup eval: approximate-index quality is pinned per round.
    "p113_ann_recall" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val queries = e.filter(col("vec_id") < 20).select(
        col("vec_id").as("qid"),
        transform(col("embedding"),
          (x, i) => x + when(i === 0, lit(0.001)).otherwise(lit(0.0))).as("qvec"))
        .localCheckpoint(false)
      val nq = queries.count()
      val brute = Similarity.cosineTopK(e, col("vec_id"), col("embedding"),
        queries, col("qid"), col("qvec"), k = 5)
      val ivf = Similarity.ivfCosineTopK(e, col("vec_id"), col("embedding"),
        queries, col("qid"), col("qvec"), m = 16, nprobe = 4, k = 5)
      val proj = Similarity.projectedCosineTopK(e, col("vec_id"), col("embedding"),
        queries, col("qid"), col("qvec"), dimIn = 64, dimOut = 8, coarseK = 50, k = 5)
      val books = Similarity.collectCodebooks(Similarity.pqCodebooks(e, col("vec_id"),
        col("embedding"), dim = 64, m = 4, k = 8, iters = 2))
      val pq = Similarity.pqCosineTopK(e, col("vec_id"), col("embedding"),
        queries, col("qid"), col("qvec"), books, k = 5)
      def scored(name: String, topk: DataFrame, floorE6: Long): DataFrame =
        topk.agg(
          sum(when(col("neighbor_id") === col("query_id"), 1L).otherwise(0L)).as("__hit"),
          count(lit(1)).as("__rows"))
          .select(lit(name).as("method"), lit(nq).as("n_queries"),
            col("__rows").between(lit(nq), lit(nq * 5)).as("rows_ok"),
            (col("__hit") * 1000000L / lit(nq) >= floorE6).as("recall_ok"))
      scored("brute", brute, 1000000L)
        .unionAll(scored("ivf", ivf, 800000L))
        .unionAll(scored("pq", pq, 500000L))
        .unionAll(scored("projected", proj, 900000L))
        .orderBy(col("method"))
    }),

    // PER-GROUP heavy hitters: hot tokens per language against each
    // language's OWN total — grouped Misra-Gries sketch (O(k) counters
    // per group), groups x k candidate broadcast, exact per-group pass;
    // never a (lang x vocabulary) hash aggregate
    "p111_lang_heavy_tokens" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      graft.pipeline.Sketches.heavyHittersBy(toks, Seq(col("lang")),
          col("token"), minPermille = 5, k = 256)
        .withColumnRenamed("item", "token")
        .orderBy(col("lang"), desc("n_occurrences"), col("token"))
    }),

    // PER-GROUP sample quantiles: each language carries its own bounded
    // min-k sample inside ONE hash aggregate (O(k) state per group, no
    // corpus sort) — per-stratum token-length distributions, the corpus
    // profiling shape at 100 TB
    "p110_lang_quantiles" -> ((s, dir) => {
      val d = docs(s, dir).select(col("lang"), col("doc_id"),
        size(TextOps.cleanTokens(col("text"))).cast("long").as("ntok"))
      graft.pipeline.Sketches.sampledQuantilesBy(d, Seq(col("lang")),
          col("doc_id"), col("ntok"), k = 128, permille = Seq(250, 500, 900))
        .orderBy(col("lang"))
    }),

    // Gopher-style rule filter: per-rule flags + keep, thresholds placed
    // inside the corpus distributions so every rule discriminates
    "p40_gopher_filter" -> ((s, dir) => {
      TextOps.gopherFilter(docs(s, dir), col("doc_id"), col("text"),
        minWords = 25, maxWords = 100000,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minStopwordHits = 2,
        maxTopWordFrac = 0.125, maxDup2Frac = 0.10, maxDup3Frac = 0.05)
        .orderBy(col("doc_id"))
    })
  )

  /** embeddings (vec_id < 400) ∪ 1.5x-scaled copies of vec_id % 5 == 0
    * under shifted ids — gives the embedding dedup ops duplicates whose
    * cosine is exactly 1.0 (positive scaling is cosine-invariant). */
  private def embCorpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).filter(col("vec_id") < 400)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.unionAll(e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id") + 1000000, transform(col("v"), x => x * 1.5d)))
  }

  // ---------------------------------------------------------------------

  private def langIdOracle: String = {
    val counts = TextOps.LangMarkers.map { case (lang, markers) =>
      val in = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter($oToks, t -> t IN ($in)))::BIGINT AS score_$lang"
    }.mkString(",\n    ")
    // fold over languages in declaration order, strict > replaces
    val langs = TextOps.LangMarkers.map(_._1)
    val pred = langs.tail.foldLeft(s"'${langs.head}'" -> s"score_${langs.head}") {
      case ((pl, ps), l) =>
        (s"(CASE WHEN score_$l > $ps THEN '$l' ELSE $pl END)",
          s"greatest(score_$l, $ps)")
    }
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    $counts
       |  FROM documents)
       |SELECT doc_id,
       |  (CASE WHEN ${pred._2} > 0 THEN ${pred._1} ELSE 'und' END) AS pred_lang,
       |  ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  private def simhashBitSums: String = (0 until Dedup.SimHashBits)
    .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
    .mkString(",\n    ")
  private def simhashAssemble: String = (0 until Dedup.SimHashBits)
    .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
    .mkString(" + ")

  /** CTE chain `toks, h, s` computing per-doc simhash over `src` (the
    * 60-bit md5-derived hash is used whole — SimHashBits = 60). */
  private def simhashCtes(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, unnest($oToks) AS t FROM $src),
       |h AS (SELECT doc_id, ${oH("t")} AS h FROM toks),
       |s AS (SELECT doc_id, $simhashBitSums FROM h GROUP BY doc_id)""".stripMargin

  private def simhashOracle: String =
    s"""WITH ${simhashCtes("documents")}
       |SELECT doc_id, CAST($simhashAssemble AS BIGINT) AS simhash FROM s ORDER BY doc_id""".stripMargin

  /** The pHash e4-quantized cosine table as SQL literals — the SAME
    * [[Multimodal.DctCosE4]] array the Spark kernel multiplies with, so
    * both engines run identical integer arithmetic. */
  private def phashCosValues: String =
    (0 until Multimodal.PHashKeep).flatMap(u =>
      (0 until Multimodal.PHashGrid).map(x =>
        s"($u, $x, ${Multimodal.DctCosE4(u)(x)})")).mkString(", ")

  private def minhashAggSql: String = (0 until 8).map { i =>
    val (a, b) = Dedup.minHashCoeffs(i)
    s"min((h * $a + $b) % ${Dedup.MinHashPrime}) AS minhash_$i"
  }.mkString(",\n    ")

  private def shinglesSql(src: String): String =
    s"""toks AS (SELECT doc_id, $oToks AS tk FROM $src),
       |sh AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS sh FROM toks),
       |h AS (SELECT doc_id, (${oH("sh")} % ${Dedup.MinHashPrime}) AS h FROM sh)""".stripMargin

  /** the full near-dedup CTE chain ending in `verified` (id_a, id_b) —
    * shared by the p13 oracle and the p21 end-to-end composition. */
  private def nearDedupCtes: String = nearDedupCtesOver(corpusSqlWithDups)

  /** `pairCond` selects which band collisions become candidate pairs —
    * the default is the single-corpus ordered self-join; the incremental
    * op restricts to cross-side (reference, new-batch) pairs. */
  private def nearDedupCtesOver(corpusSql: String,
      pairCond: String = "a.doc_id < b.doc_id"): String =
    s"""corpus AS ($corpusSql),
       |${shinglesSql("corpus")},
       |sig AS (SELECT doc_id,
       |    $minhashAggSql
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band_idx, minhash_0 * ${Dedup.MinHashPrime} + minhash_1 AS band_val FROM sig
       |  UNION ALL SELECT doc_id, 1, minhash_2 * ${Dedup.MinHashPrime} + minhash_3 FROM sig
       |  UNION ALL SELECT doc_id, 2, minhash_4 * ${Dedup.MinHashPrime} + minhash_5 FROM sig
       |  UNION ALL SELECT doc_id, 3, minhash_6 * ${Dedup.MinHashPrime} + minhash_7 FROM sig),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND $pairCond),
       |cand_ids AS (SELECT id_a AS doc_id FROM pairs UNION SELECT id_b FROM pairs),
       |grams AS (
       |  SELECT DISTINCT c.doc_id, g
       |  FROM (SELECT doc_id, unnest([substr(lower(trim(text)), i, 8)
       |      FOR i IN range(1, greatest(len(lower(trim(text))) - 7, 0) + 1)]) AS g
       |    FROM corpus WHERE doc_id IN (SELECT doc_id FROM cand_ids)) c),
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       |inter AS (
       |  SELECT p.id_a, p.id_b, count(*) AS i
       |  FROM pairs p JOIN grams a ON a.doc_id = p.id_a
       |  JOIN grams b ON b.doc_id = p.id_b AND b.g = a.g
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE floor(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE * 10000.0 + 0.5) / 10000.0 >= 0.5)""".stripMargin

  /** BM25 domain-routing CTE chain ending in `tagged (doc_id, domain,
    * score)` — shared by the p47 oracle and the p49 domain-mix
    * composition. The strict-> left fold of the Spark argmax is replayed
    * as chained CASE CTEs. */
  private def domainTagCtes(): String = {
    val domains = Seq("compute" -> Seq("spark", "scan", "batch"),
      "storage" -> Seq("table", "row", "part"),
      "query" -> Seq("sort", "window", "hash", "merge"))
    val terms = domains.flatMap(_._2).distinct
    val idx = terms.zipWithIndex.toMap
    val tfDefs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t'))::BIGINT AS tf$i" }.mkString(",\n  ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n  ")
    def termSql(i: Int): String =
      s"(floor(ln((n::DOUBLE - df$i::DOUBLE + 0.5) / (df$i::DOUBLE + 0.5) + 1.0) * 10000.0 + 0.5) / 10000.0)" +
        s" * (tf$i::DOUBLE * 2.2) / (tf$i::DOUBLE + 1.2 * (0.25 + (0.75 * dl::DOUBLE) / (sumdl::DOUBLE / n::DOUBLE)))"
    val scoreDefs = domains.zipWithIndex.map { case ((_, ts), d) =>
      val sum = ts.map(t => termSql(idx(t))).mkString(" + ")
      s"floor(($sum) * 10000.0 + 0.5) / 10000.0 AS s$d"
    }.mkString(",\n  ")
    val foldCtes = domains.indices.tail.map { d =>
      val (prevB, prevN) = if (d == 1) ("s0", s"'${domains.head._1}'") else (s"b${d - 1}", s"n${d - 1}")
      s"""a$d AS (SELECT *,
         |  CASE WHEN s$d > $prevB THEN s$d ELSE $prevB END AS b$d,
         |  CASE WHEN s$d > $prevB THEN '${domains(d)._1}' ELSE $prevN END AS n$d
         |  FROM a${if (d == 1) "0" else (d - 1).toString})""".stripMargin
    }.mkString(",\n")
    val last = domains.length - 1
    s"""toks AS (SELECT doc_id, $oToks AS tk FROM documents),
       |tf AS (SELECT doc_id, len(tk)::BIGINT AS dl,
       |  $tfDefs
       |  FROM toks),
       |st AS (SELECT count(*)::BIGINT AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |  $dfDefs
       |  FROM tf),
       |a0 AS (SELECT doc_id,
       |  $scoreDefs
       |  FROM tf, st),
       |$foldCtes,
       |tagged AS (SELECT doc_id,
       |  CASE WHEN b$last > 0.0 THEN n$last ELSE 'und' END AS domain,
       |  b$last AS score
       |  FROM a$last)""".stripMargin
  }

  /** BM25 CTE chain ending in `lex` (doc_id, bm25) over `documents` —
    * shared by the p33 oracle and the p45 hybrid fusion. */
  private def bm25LexCtes(terms: Seq[String], pfx: String = ""): String = {
    val tfDefs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t'))::BIGINT AS tf$i" }.mkString(",\n  ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n  ")
    val termSql = terms.indices.map { i =>
      s"(floor(ln((n::DOUBLE - df$i::DOUBLE + 0.5) / (df$i::DOUBLE + 0.5) + 1.0) * 10000.0 + 0.5) / 10000.0)" +
        s" * (tf$i::DOUBLE * 2.2) / (tf$i::DOUBLE + 1.2 * (0.25 + (0.75 * dl::DOUBLE) / (sumdl::DOUBLE / n::DOUBLE)))"
    }.mkString(" + ")
    s"""toks$pfx AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tk FROM documents),
       |tf$pfx AS (SELECT doc_id, len(tk)::BIGINT AS dl,
       |  $tfDefs
       |  FROM toks$pfx),
       |st$pfx AS (SELECT count(*)::BIGINT AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |  $dfDefs
       |  FROM tf$pfx),
       |lex$pfx AS (SELECT doc_id, floor(($termSql) * 10000.0 + 0.5) / 10000.0 AS bm25
       |  FROM tf$pfx, st$pfx)""".stripMargin
  }

  private def brightnessSql: String =
    "round((" + (1 to 16).map(i => s"ascii(substr(text, $i, 1))").mkString(" + ") + ") / 16.0, 2)"

  /** Left-assoc dot product over 1-based DuckDB list columns — the same
    * accumulation order as DoubleArrayDot's codegen'd loop, so both engines
    * produce bit-identical doubles. Required wherever cosines feed
    * UNQUANTIZED comparisons (hyperplane sign tests, IVF argmax); the
    * quantized output sims can use list_cosine_similarity (p08-proven). */
  private def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(k => s"$a[$k]*$b[$k]").mkString("(", " + ", ")")

  /** dot of `a`'s elements starting at 1-based offset `off+1` against
    * `b[1..dim]` — the subspace-slice dot PQ's ADC tables need; same
    * left-assoc order as dotSql. */
  private def dotOffsetSql(a: String, off: Int, b: String, dim: Int): String =
    (1 to dim).map(k => s"$a[${off + k}]*$b[$k]").mkString("(", " + ", ")")

  /** Hyperplane signature over a DOUBLE[] column — mirrors
    * Similarity.hyperplaneSignature bit for bit: per plane i the sign of
    * the left-assoc sum of v[j] * (numerator/48.0); both engines evaluate
    * the identical integer-numerator IEEE division, products and sum order,
    * so the sign test (a HARD, unquantized threshold) agrees exactly. */
  private def sigSql(v: String, dim: Int, bits: Int): String =
    (0 until bits).map { i =>
      val d = (0 until dim).map { j =>
        s"$v[${j + 1}]*(${graft.pipeline.Similarity.planeNumerator(i, j)}/48.0)"
      }.mkString("(", " + ", ")")
      s"(CASE WHEN $d > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val qCos = "floor(list_cosine_similarity(qv, cv) * 10000.0 + 0.5) / 10000.0"

  /** One Lloyd round as CTEs `asgn$t, sums$t, cents$t` over `cents${t-1}`:
    * cosine-argmax assignment (row_number, ties by centroid id — the
    * max_by struct order of ivfAssign) and lattice-exact means
    * ((Σ floor(x·1e4+0.5)) / n / 1e4), empty clusters keeping the previous
    * centroid — mirrors Similarity.kMeansCentroids bit for bit. */
  private def kmeansRoundSql(t: Int, dim: Int, corpus: String = "corpus",
      sfx: String = ""): String = {
    val prev = s"cents${t - 1}$sfx"
    s"""asgn$t$sfx AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT s.vec_id, s.v, t.cid,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY (${dotSql("s.v", "t.c", dim)} /
       |          (sqrt(${dotSql("s.v", "s.v", dim)}) * sqrt(${dotSql("t.c", "t.c", dim)}))) DESC,
       |          t.cid) AS rnk
       |    FROM $corpus s CROSS JOIN $prev t) WHERE rnk = 1),
       |sums$t$sfx AS (
       |  SELECT cid, pos, CAST(sum(CAST(floor(v[pos] * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS isum,
       |    count(*) AS n
       |  FROM asgn$t$sfx CROSS JOIN (SELECT unnest(range(1, $dim + 1)) AS pos) p
       |  GROUP BY cid, pos),
       |cents$t$sfx AS (
       |  SELECT c0.cid, coalesce(nl.c, c0.c) AS c
       |  FROM $prev c0 LEFT JOIN (
       |    SELECT cid, list((isum::DOUBLE / n::DOUBLE) / 10000.0 ORDER BY pos) AS c
       |    FROM sums$t$sfx GROUP BY cid) nl ON nl.cid = c0.cid)""".stripMargin
  }

  /** Full PQ-side oracle chain for one subspace `s` (dsub dims, k
    * centroids, 2 Lloyd rounds): sliced sub-corpus, seeded + trained
    * codebook, per-vector code (cosine argmax, smaller-cid tiebreak),
    * per-centroid squared norm. */
  private def pqSubSql(s: Int, dsub: Int, k: Int): String = {
    val lo = s * dsub + 1
    val hi = (s + 1) * dsub
    // cb (the trained codebook) and corpus_s are each referenced by
    // several consumers: MATERIALIZED stops DuckDB inlining the whole
    // 2-round window-over-crossjoin chain once per consumer (OOM at
    // sf0.01 without it)
    s"""corpus_s$s AS MATERIALIZED (SELECT vec_id, v[$lo:$hi] AS v FROM base),
       |cents0_s$s AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
       |  FROM (SELECT vec_id, v FROM corpus_s$s ORDER BY vec_id LIMIT $k)),
       |${kmeansRoundSql(1, dsub, s"corpus_s$s", s"_s$s")},
       |${kmeansRoundSql(2, dsub, s"corpus_s$s", s"_s$s")},
       |cb_s$s AS MATERIALIZED (SELECT cid, c FROM cents2_s$s),
       |codes_s$s AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT c.vec_id, t.cid,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY (${dotSql("c.v", "t.c", dsub)} /
       |          (sqrt(${dotSql("c.v", "c.v", dsub)}) * sqrt(${dotSql("t.c", "t.c", dsub)}))) DESC,
       |          t.cid) AS rnk
       |    FROM corpus_s$s c CROSS JOIN cb_s$s t) WHERE rnk = 1),
       |n2_s$s AS MATERIALIZED (SELECT cid, ${dotSql("c", "c", dsub)} AS n2 FROM cb_s$s),
       |tq_s$s AS MATERIALIZED (SELECT q.query_id, t.cid,
       |    ${dotOffsetSql("q.qv", s * dsub, "t.c", dsub)} AS d
       |  FROM q CROSS JOIN cb_s$s t)""".stripMargin
  }

  /** Projection of a DuckDB list column onto the first `dimOut` integer-
    * lattice planes as a list literal — mirrors Similarity.projectVec's
    * left-assoc arithmetic bit for bit (same planes as sigSql). */
  private def projSqlList(v: String, dimIn: Int, dimOut: Int): String =
    (0 until dimOut).map { i =>
      (0 until dimIn).map { j =>
        s"$v[${j + 1}]*(${graft.pipeline.Similarity.planeNumerator(i, j)}/48.0)"
      }.mkString("(", " + ", ")")
    }.mkString("[", ", ", "]")

  /** p03's quality expression over a (doc_id, text) relation. */
  private def qualitySql: String =
    s"""floor((0.3 * least(len($oToks)::DOUBLE / 100.0, 1.0)
       |    + 0.4 * (len(list_filter($oToks, x -> x IN (${TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")})))::DOUBLE / len($oToks)::DOUBLE)
       |    + 0.3 * (1.0 - len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / greatest(len(text), 1)::DOUBLE))
       |    * 10000.0 + 0.5) / 10000.0""".stripMargin

  /** BPE training oracle CTE chain: `n` unrolled merge rounds, each
    * p{t} (pair counts) → b{t} (arg-max pair, same tie-break) →
    * v{t} (double-space literal replace — exact left-to-right merge).
    * Ends with v{n}: `(w, s, cnt)` after all merges. */
  private def bpeCtes(n: Int): String = {
    val rounds = (1 to n).map { t =>
      s"""p$t AS (SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |    SELECT unnest([{'l': a[i], 'r': a[i+1]} FOR i IN range(1, len(a))]) AS pr, cnt
         |    FROM (SELECT string_split(trim(s), ' ') AS a, cnt FROM v${t - 1})) GROUP BY 1, 2),
         |b$t AS (SELECT l, r, pc FROM p$t ORDER BY pc DESC, l, r LIMIT 1),
         |v$t AS (SELECT w, replace(replace(replace(s, ' ', '  '),
         |    ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' '), '  ', ' ') AS s, cnt
         |  FROM v${t - 1}, b$t b)""".stripMargin
    }.mkString(",\n")
    s"""tk AS (SELECT unnest(list_filter($oToks, t -> t != '')) AS w FROM documents),
       |wc AS (SELECT w, count(*)::BIGINT AS cnt FROM tk GROUP BY w),
       |v0 AS (SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, cnt FROM wc),
       |$rounds""".stripMargin
  }

  /** Shared by p90 (driver-loop training) and p117 (distributed
    * training): both regimes must land on the SAME merges, so they run
    * against one relational replay. */
  private lazy val bpeTrainOracle: String =
    s"""WITH ${bpeCtes(8)}
       |SELECT * FROM (${(1 to 8).map(t =>
            s"SELECT CAST($t AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, " +
              s"l||r AS merged, pc AS pair_count FROM b$t").mkString(" UNION ALL ")})
       |ORDER BY merge_rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "p90_bpe_train" -> bpeTrainOracle,
    "p117_bpe_train_distributed" -> bpeTrainOracle,

    "p95_prefix_jaccard_join" ->
      s"""WITH corpus AS (SELECT * FROM ($corpusSqlWithDups) WHERE len(text) < 150),
         |grams AS (
         |  SELECT DISTINCT doc_id, ${oH("g")} AS g
         |  FROM (SELECT doc_id, unnest([substr(lower(trim(text)), i, 8)
         |      FOR i IN range(1, greatest(len(lower(trim(text))) - 7, 0) + 1)]) AS g FROM corpus)),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, i AS inter, (sa.n + sb.n - i) AS uni,
         |  CAST((i * 1000000) // (sa.n + sb.n - i) AS BIGINT) AS jac_e6
         |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |WHERE i * 10 >= (sa.n + sb.n - i) * 6
         |ORDER BY id_a, id_b""".stripMargin,

    "p94_sampled_quantiles" ->
      s"""WITH v AS (SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'bk'), 1, 15))::BIGINT AS h,
         |    len(list_filter($oToks, t -> t != ''))::BIGINT AS n FROM documents),
         |r AS (SELECT n, row_number() OVER (ORDER BY h, doc_id) AS rn FROM v
         |  WHERE n IS NOT NULL AND doc_id IS NOT NULL),
         |s AS (SELECT n FROM r WHERE rn <= 256),
         |o AS (SELECT n, row_number() OVER (ORDER BY n) AS q FROM s),
         |m AS (SELECT count(*)::BIGINT AS n_sample FROM s)
         |SELECT (SELECT count(*) FROM v)::BIGINT AS n_rows, m.n_sample,
         |  (SELECT n FROM o WHERE q = greatest((250 * m.n_sample + 999) // 1000, 1)) AS q250_est,
         |  (SELECT n FROM o WHERE q = greatest((500 * m.n_sample + 999) // 1000, 1)) AS q500_est,
         |  (SELECT n FROM o WHERE q = greatest((900 * m.n_sample + 999) // 1000, 1)) AS q900_est
         |FROM m""".stripMargin,

    "p112_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cc AS (SELECT doc_id, c, count(*)::BIGINT AS cnt FROM ch WHERE c != ''
        |  GROUP BY doc_id, c),
        |d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
        |  CAST(sum(cnt * CAST(floor(ln(cnt::DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS clnc
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, n_chars,
        |  CAST(floor((n_chars * CAST(floor(ln(n_chars::DOUBLE) * 10000.0 + 0.5) AS BIGINT)
        |    - clnc)::DOUBLE / n_chars::DOUBLE + 0.5) AS BIGINT) AS entropy_e4
        |FROM d ORDER BY doc_id""".stripMargin,

    "p113_ann_recall" ->
      """SELECT method,
        |  (SELECT count(*)::BIGINT FROM embeddings WHERE vec_id < 20) AS n_queries,
        |  TRUE AS rows_ok, TRUE AS recall_ok
        |FROM (VALUES ('brute'), ('ivf'), ('pq'), ('projected')) t(method)
        |ORDER BY method""".stripMargin,

    "p111_lang_heavy_tokens" ->
      s"""WITH tk AS (SELECT lang, unnest($oToks) AS token FROM documents),
         |t AS (SELECT lang, token FROM tk WHERE token != ''),
         |n AS (SELECT lang, count(*)::BIGINT AS n_total FROM t GROUP BY lang)
         |SELECT t.lang, token, count(*)::BIGINT AS n_occurrences, n.n_total
         |FROM t JOIN n ON t.lang IS NOT DISTINCT FROM n.lang
         |GROUP BY t.lang, token, n.n_total
         |HAVING count(*) * 1000 >= n.n_total * 5
         |ORDER BY t.lang NULLS FIRST, n_occurrences DESC, token""".stripMargin,

    "p110_lang_quantiles" ->
      s"""WITH v AS (SELECT lang, doc_id,
         |    ${oH("CAST(doc_id AS VARCHAR) || 'bk'")} AS h,
         |    len(list_filter($oToks, t -> t != ''))::BIGINT AS n FROM documents),
         |t AS (SELECT lang, count(*)::BIGINT AS n_rows FROM v GROUP BY lang),
         |r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
         |  FROM v WHERE n IS NOT NULL AND doc_id IS NOT NULL),
         |s AS (SELECT lang, n FROM r WHERE rn <= 128),
         |o AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n) AS q FROM s),
         |m AS (SELECT lang, count(*)::BIGINT AS n_sample FROM s GROUP BY lang)
         |SELECT t.lang, t.n_rows, coalesce(m.n_sample, 0)::BIGINT AS n_sample,
         |  max(CASE WHEN o.q = greatest((250 * m.n_sample + 999) // 1000, 1) THEN o.n END) AS q250_est,
         |  max(CASE WHEN o.q = greatest((500 * m.n_sample + 999) // 1000, 1) THEN o.n END) AS q500_est,
         |  max(CASE WHEN o.q = greatest((900 * m.n_sample + 999) // 1000, 1) THEN o.n END) AS q900_est
         |FROM t LEFT JOIN m ON t.lang IS NOT DISTINCT FROM m.lang
         |  LEFT JOIN o ON t.lang IS NOT DISTINCT FROM o.lang
         |GROUP BY t.lang, t.n_rows, m.n_sample
         |ORDER BY t.lang NULLS FIRST""".stripMargin,

    "p91_bpe_encode" ->
      s"""WITH ${bpeCtes(8)},
         |enc AS (SELECT w, len(string_split(trim(s), ' '))::BIGINT AS n_sym FROM v8),
         |dw AS (SELECT doc_id, unnest(list_filter($oToks, t -> t != '')) AS w FROM documents)
         |SELECT doc_id, count(*)::BIGINT AS n_words, CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
         |FROM dw JOIN enc USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // min doc_id per distinct text: the source corpus itself may contain
    // byte-identical texts under different ids (it does at sf0.1)
    "p01_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",

    "p02_token_stats" ->
      s"""SELECT doc_id,
         |  len($oToks)::BIGINT AS n_tokens,
         |  len(regexp_extract_all(text, '${TextOps.BpeTokenPattern}'))::BIGINT AS n_bpe_tokens,
         |  len(list_distinct([substr(lower(trim(text)), i, 8)
         |      FOR i IN range(1, greatest(len(lower(trim(text))) - 7, 0) + 1)]))::BIGINT AS n_grams8,
         |  ${oH("array_to_string($oToks, ' ')").replace("$oToks", oToks)} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    "p03_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, $oToks AS tk, text FROM documents)
         |SELECT doc_id,
         |  floor((0.3 * least(len(tk)::DOUBLE / 100.0, 1.0)
         |    + 0.4 * (len(list_filter(tk, x -> x IN (${TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")})))::DOUBLE / len(tk)::DOUBLE)
         |    + 0.3 * (1.0 - len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / greatest(len(text), 1)::DOUBLE))
         |    * 10000.0 + 0.5) / 10000.0 AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "p04_langid" -> langIdOracle,

    "p05_minhash_sigs" ->
      s"""WITH ${shinglesSql("documents")}
         |SELECT doc_id,
         |    $minhashAggSql
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p06_lsh_pairs" ->
      s"""WITH corpus AS ($corpusSqlWithDups),
         |${shinglesSql("corpus")},
         |sig AS (SELECT doc_id,
         |    $minhashAggSql
         |  FROM h GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band_idx, minhash_0 * ${Dedup.MinHashPrime} + minhash_1 AS band_val FROM sig
         |  UNION ALL SELECT doc_id, 1, minhash_2 * ${Dedup.MinHashPrime} + minhash_3 FROM sig
         |  UNION ALL SELECT doc_id, 2, minhash_4 * ${Dedup.MinHashPrime} + minhash_5 FROM sig
         |  UNION ALL SELECT doc_id, 3, minhash_6 * ${Dedup.MinHashPrime} + minhash_7 FROM sig)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,

    "p07_jaccard_pairs" ->
      s"""WITH corpus AS (SELECT * FROM ($corpusSqlWithDups) WHERE len(text) < 150),
         |grams AS (
         |  SELECT DISTINCT doc_id,
         |    ${oH("g")} AS g
         |  FROM (SELECT doc_id, unnest([substr(lower(trim(text)), i, 8)
         |      FOR i IN range(1, greatest(len(lower(trim(text))) - 7, 0) + 1)]) AS g FROM corpus)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  floor(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = id_a
         |JOIN sizes sb ON sb.doc_id = id_b
         |WHERE floor(i::DOUBLE / (sa.n + sb.n - i)::DOUBLE * 10000.0 + 0.5) / 10000.0 >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "p08_ann_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    floor(list_cosine_similarity(qv, cv) * 10000.0 + 0.5) / 10000.0 AS sim
        |  FROM q CROSS JOIN c)
        |SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "p09_simhash" -> simhashOracle,

    // cluster-balanced mix: the p36/p52 kmeans chain, cosine-argmax
    // assignment, computed e4-lattice rates (floor(x*1e4+0.5), capped at
    // 1e7), and the copyCount hash-admission rule
    "p81_cluster_mix" ->
      s"""WITH corpus AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
         |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT 8)),
         |${kmeansRoundSql(1, 64)},
         |${kmeansRoundSql(2, 64)},
         |asgn AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT s.vec_id, t.cid,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY (${dotSql("s.v", "t.c", 64)} /
         |          (sqrt(${dotSql("s.v", "s.v", 64)}) * sqrt(${dotSql("t.c", "t.c", 64)}))) DESC,
         |          t.cid) AS rnk
         |    FROM corpus s CROSS JOIN cents2 t) WHERE rnk = 1),
         |sizes AS (SELECT cid, count(*)::BIGINT AS n_in FROM asgn GROUP BY cid),
         |tot AS (SELECT CAST(sum(n_in) AS BIGINT) AS n FROM sizes),
         |rates AS (SELECT cid, n_in,
         |    CAST(LEAST(10000000.0, floor(n::DOUBLE / 8.0 / n_in::DOUBLE * 10000.0 + 0.5)) AS BIGINT) AS r10k
         |  FROM sizes, tot),
         |cc AS (SELECT a.vec_id, a.cid, r.r10k,
         |    ('0x' || substr(md5(a.vec_id::VARCHAR || 'cb1'), 1, 15))::BIGINT % 10000 AS bucket
         |  FROM asgn a JOIN rates r USING (cid)),
         |copies AS (SELECT cid,
         |    (r10k // 10000) + CASE WHEN bucket < r10k % 10000 THEN 1 ELSE 0 END AS ncopy
         |  FROM cc)
         |SELECT r.cid AS centroid_id, r.n_in, CAST(sum(c.ncopy) AS BIGINT) AS n_out
         |FROM copies c JOIN rates r ON c.cid = r.cid
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // PQ: 4 independent subspace quantizer chains (each the p36 kmeans
    // oracle on a slice), codes by cosine argmax, ADC score =
    // left-assoc sum of per-subspace dot-table lookups over
    // ||q||*||recon||, same quantize4 + rank discipline as p08
    "p80_ann_pq" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv,
         |    sqrt(${dotSql("v", "v", 64)}) AS qn FROM base WHERE vec_id < 10),
         |${(0 until 4).map(s => pqSubSql(s, 16, 8)).mkString(",\n")},
         |codes AS (
         |  SELECT c0.vec_id, c0.cid AS k0, c1.cid AS k1, c2.cid AS k2, c3.cid AS k3
         |  FROM codes_s0 c0 JOIN codes_s1 c1 USING (vec_id)
         |    JOIN codes_s2 c2 USING (vec_id) JOIN codes_s3 c3 USING (vec_id)),
         |recon AS (
         |  SELECT codes.vec_id, k0, k1, k2, k3,
         |    sqrt(((a.n2 + b.n2) + c.n2) + d.n2) AS rn
         |  FROM codes JOIN n2_s0 a ON a.cid = k0 JOIN n2_s1 b ON b.cid = k1
         |    JOIN n2_s2 c ON c.cid = k2 JOIN n2_s3 d ON d.cid = k3),
         |scored AS (
         |  SELECT t0.query_id, r.vec_id AS neighbor_id,
         |    floor((((t0.d + t1.d) + t2.d) + t3.d) / (q.qn * r.rn) * 10000.0 + 0.5) / 10000.0 AS sim
         |  FROM recon r
         |  CROSS JOIN q
         |  JOIN tq_s0 t0 ON t0.query_id = q.query_id AND t0.cid = r.k0
         |  JOIN tq_s1 t1 ON t1.query_id = q.query_id AND t1.cid = r.k1
         |  JOIN tq_s2 t2 ON t2.query_id = q.query_id AND t2.cid = r.k2
         |  JOIN tq_s3 t3 ON t3.query_id = q.query_id AND t3.cid = r.k3)
         |SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |FROM scored
         |QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "p22_simhash_neardup" ->
      s"""WITH corpus AS (SELECT * FROM ($corpusSqlWithDups) WHERE doc_id % 2 = 0),
         |${simhashCtes("corpus")},
         |sh AS (SELECT doc_id, CAST($simhashAssemble AS BIGINT) AS simhash FROM s)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "p13_near_dedup" ->
      s"""WITH $nearDedupCtes
         |SELECT doc_id FROM corpus
         |WHERE doc_id NOT IN (SELECT id_b FROM verified)
         |ORDER BY doc_id""".stripMargin,

    "p21_pipeline_e2e" ->
      s"""WITH ${nearDedupCtesOver(s"SELECT * FROM ($corpusSqlWithDups) WHERE doc_id % 3 = 0")},
         |survivors AS (
         |  SELECT doc_id, text FROM corpus
         |  WHERE doc_id NOT IN (SELECT id_b FROM verified)),
         |q AS (
         |  SELECT doc_id, text, $oToks AS tk,
         |    floor((0.3 * least(len($oToks)::DOUBLE / 100.0, 1.0)
         |      + 0.4 * (len(list_filter($oToks, x -> x IN (${TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")})))::DOUBLE / len($oToks)::DOUBLE)
         |      + 0.3 * (1.0 - len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / greatest(len(text), 1)::DOUBLE))
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM survivors)
         |SELECT doc_id % 10 AS bucket,
         |  count(*) AS n_docs,
         |  CAST(SUM(len(tk)) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CAST(floor(quality * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS quality_e4_sum
         |FROM q WHERE quality >= 0.3
         |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "p10_multimodal_meta" ->
      s"""SELECT doc_id,
         |  octet_length(text::BLOB) % 640 AS width,
         |  (octet_length(text::BLOB) * 7) % 480 AS height,
         |  CAST(3 AS BIGINT) AS channels,
         |  $brightnessSql AS brightness,
         |  CAST(FLOOR((octet_length(text::BLOB) + 31) / 32.0) AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,

    "p51_line_dedup" ->
      """WITH inj AS (SELECT doc_id, text
        |    || chr(10) || 'subscribe to our newsletter today'
        |    || (CASE WHEN doc_id % 5 = 0
        |        THEN chr(10) || 'copyright example corporation all rights reserved'
        |        ELSE '' END) AS text
        |  FROM documents),
        |arr AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM inj),
        |l AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, a[i] AS ln
        |  FROM (SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr)),
        |w AS (SELECT ln, min(ROW(doc_id, idx)) AS w FROM l WHERE len(ln) >= 5 GROUP BY ln),
        |m AS (SELECT l.*, (w.w IS NULL OR w.w = ROW(l.doc_id, l.idx)) AS keep
        |  FROM l LEFT JOIN w USING (ln))
        |SELECT doc_id,
        |  coalesce(string_agg(ln, chr(10) ORDER BY idx) FILTER (keep), '') AS text,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
        |  CAST(count(*) - count(*) FILTER (keep) AS BIGINT) AS n_dropped
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // closed-form meta of the synthetic BMPs: pixel (x,y) = (id*31+x*7+
    // y*13)%256 in all 3 bands of an 8x6 image; brightness mirrors
    // Spark's floor((sum/n)*100+0.5)/100 with n = 8*6*3 = 144 samples
    "p50_image_meta" ->
      """WITH px AS (
        |  SELECT d.doc_id, (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS v
        |  FROM documents d, generate_series(0, 7) AS x(x), generate_series(0, 5) AS y(y))
        |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  floor(CAST(3 * sum(v) AS DOUBLE) / 144.0 * 100.0 + 0.5) / 100.0 AS brightness,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the cap's selection rule in closed form: rank within source by the
    // shared md5-derived 60-bit hash, ties by doc_id, keep rank <= cap —
    // the two-stage prefilter/pass-through machinery is output-invisible
    "p54_source_cap" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 5 THEN 'hot' ELSE source END AS src,
         |    ${oH("doc_id::VARCHAR || 'cap'")} AS hv
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, src,
         |    row_number() OVER (PARTITION BY src ORDER BY hv, doc_id) AS rn
         |  FROM h)
         |SELECT doc_id, src FROM r WHERE rn <= 40 ORDER BY doc_id""".stripMargin,

    // the full v2 chain as one shared-CTE oracle: p58's substring-dedup
    // arithmetic (no injection) -> p40's gopher rules over the CLEANED
    // text -> p59's DSIR lattice over the kept docs
    "p60_curation_v2" ->
      s"""WITH t0 AS MATERIALIZED (SELECT doc_id, $oToks AS ts FROM documents),
         |g0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    array_to_string(ts[i:i+9], ' ') AS gram
         |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 9)) AS i FROM t0)),
         |d0 AS (SELECT gram, min(ROW(doc_id, pos)) AS fst, count(*) AS c
         |  FROM g0 GROUP BY gram),
         |m0 AS (SELECT g0.doc_id, g0.pos FROM g0 JOIN d0 USING (gram)
         |  WHERE d0.c > 1 AND ROW(g0.doc_id, g0.pos) <> d0.fst),
         |cov0 AS (SELECT DISTINCT m0.doc_id, m0.pos + s.k AS cp
         |  FROM m0, generate_series(0, 9) AS s(k)),
         |tp0 AS (SELECT doc_id, CAST(i AS BIGINT) AS tpos, ts[i] AS tok
         |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM t0)),
         |sd AS MATERIALIZED (SELECT tp0.doc_id,
         |    coalesce(string_agg(tok, ' ' ORDER BY tpos)
         |      FILTER (cov0.cp IS NULL), '') AS text
         |  FROM tp0 LEFT JOIN cov0 ON cov0.doc_id = tp0.doc_id AND cov0.cp = tp0.tpos
         |  GROUP BY tp0.doc_id),
         |tk1 AS MATERIALIZED (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tk FROM sd),
         |flat AS (SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_words,
         |  floor(CAST(list_reduce(list_transform(tk, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
         |    / len(tk) * 10000.0 + 0.5) / 10000.0 AS mean_len,
         |  CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in',
         |    'is','on','for','with','as','by','at','or'))) AS BIGINT) AS stop_hits
         |  FROM tk1),
         |g1 AS (SELECT doc_id, 1 AS n, unnest(tk) AS g FROM tk1
         |  UNION ALL
         |  SELECT doc_id, 2, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) FROM tk1
         |  UNION ALL
         |  SELECT doc_id, 3, unnest([tk[i]||' '||tk[i+1]||' '||tk[i+2] FOR i IN range(1, len(tk) - 1)]) FROM tk1),
         |c1 AS (SELECT doc_id, n, g, count(*) AS c FROM g1 GROUP BY doc_id, n, g),
         |s1 AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot, max(c) AS top,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
         |  FROM c1 GROUP BY doc_id, n),
         |rep AS (SELECT doc_id,
         |  coalesce(max(CASE WHEN n = 1 THEN floor(top::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS topf,
         |  coalesce(max(CASE WHEN n = 2 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup2,
         |  coalesce(max(CASE WHEN n = 3 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup3
         |  FROM s1 GROUP BY doc_id),
         |kept AS (SELECT sd.doc_id, sd.text FROM sd
         |  JOIN flat f ON f.doc_id = sd.doc_id
         |  JOIN rep r ON r.doc_id = sd.doc_id
         |  WHERE f.n_words >= 25 AND f.n_words <= 100000
         |    AND f.mean_len >= 3.0 AND f.mean_len <= 10.0
         |    AND f.stop_hits >= 2 AND r.topf <= 0.125
         |    AND r.dup2 <= 0.10 AND r.dup3 <= 0.05),
         |tk AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS t FROM kept),
         |tkc AS MATERIALIZED (SELECT doc_id, t FROM tk WHERE t != ''),
         |vc AS (SELECT t, count(*)::BIGINT AS c FROM tkc GROUP BY t),
         |totc AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nv FROM vc),
         |vt AS (SELECT t, count(*)::BIGINT AS c FROM tkc WHERE doc_id % 7 = 3 GROUP BY t),
         |tott AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nv FROM vt),
         |lr AS (SELECT vc.t,
         |    CAST(floor(ln((coalesce(vt.c, 0) + 1)::DOUBLE / (tott.ntok + tott.nv)::DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT)
         |  - CAST(floor(ln((vc.c + 1)::DOUBLE / (totc.ntok + totc.nv)::DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT) AS lr_e4
         |  FROM vc LEFT JOIN vt ON vc.t = vt.t, totc, tott),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    floor(CAST(sum(lr_e4) AS DOUBLE) / count(*)::DOUBLE + 0.5) / 10000.0 AS dsir_score
         |  FROM tkc JOIN lr ON tkc.t = lr.t GROUP BY doc_id),
         |sel AS (SELECT doc_id FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 100)
         |SELECT sc.doc_id, n_tokens, dsir_score, (sel.doc_id IS NOT NULL) AS selected
         |FROM sc LEFT JOIN sel ON sel.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,

    // the pHash lattice in closed form: closed-form pixels -> separable
    // integer DCT with the interpolated e4 cosine table -> 63 AC sign
    // bits -> identical-hash collapse (rep = min doc_id per phash) ->
    // banded pairs over reps WITH the keep-smallest-reps hot-band cap
    // (rank within band by rep, join rank <= 1024 plus linear
    // overflow stars to the band min, Hamming <= 2)
    // -> recursive min-label components -> members inherit via hash
    "p61_image_phash_dedup" ->
      s"""WITH RECURSIVE ids AS (
         |  SELECT doc_id, doc_id AS src, 0 AS pert FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000, doc_id, 0 FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000000, doc_id, 1 FROM documents WHERE doc_id % 7 = 0),
         |cc AS (SELECT * FROM (VALUES $phashCosValues) t(u, x, cv)),
         |sd AS (SELECT doc_id, src, pert,
         |    (src * 2654435761) % 2147483648 AS h FROM ids),
         |px AS MATERIALIZED (
         |  SELECT i.doc_id, x.x, y.y,
         |    3 * ((((i.h >> 24) % 255 + x.x * (3 + i.h % 13)
         |           + y.y * (5 + (i.h >> 8) % 11)
         |           + x.x * y.y * ((i.h >> 16) % 7)) % 255)
         |      + CASE WHEN i.pert = 1 AND (x.x + y.y) % 9 = 0 THEN 1 ELSE 0 END) AS g
         |  FROM sd i, generate_series(0, 15) AS x(x), generate_series(0, 15) AS y(y)),
         |rp AS MATERIALIZED (
         |  SELECT p.doc_id, c.u, p.y, CAST(sum(p.g * c.cv) AS BIGINT) AS rv
         |  FROM px p JOIN cc c ON c.x = p.x GROUP BY p.doc_id, c.u, p.y),
         |fp AS MATERIALIZED (
         |  SELECT r.doc_id, r.u, c.u AS v, CAST(sum(r.rv * c.cv) AS BIGINT) AS fv
         |  FROM rp r JOIN cc c ON c.x = r.y GROUP BY r.doc_id, r.u, c.u),
         |st AS (SELECT doc_id, CAST(sum(fv) AS BIGINT) AS acsum
         |  FROM fp WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
         |h AS MATERIALIZED (
         |  SELECT f.doc_id,
         |    CAST(coalesce(sum(CASE WHEN f.fv * 63 > st.acsum
         |      THEN (CAST(1 AS BIGINT) << CAST(f.u * 8 + f.v - 1 AS INTEGER)) END), 0) AS BIGINT) AS phash
         |  FROM fp f JOIN st ON st.doc_id = f.doc_id
         |  WHERE NOT (f.u = 0 AND f.v = 0)
         |  GROUP BY f.doc_id),
         |reps AS MATERIALIZED (
         |  SELECT phash, min(doc_id) AS rep FROM h GROUP BY phash),
         |bc AS MATERIALIZED (
         |  SELECT rep, phash, bi, bv,
         |    row_number() OVER (PARTITION BY bi, bv ORDER BY rep) AS rn,
         |    count(*) OVER (PARTITION BY bi, bv) AS bn,
         |    min(rep) OVER (PARTITION BY bi, bv) AS minrep,
         |    arg_min(phash, rep) OVER (PARTITION BY bi, bv) AS minhash
         |  FROM (SELECT rep, phash, b.b AS bi,
         |      (phash >> CAST(21 * b.b AS INTEGER)) & 2097151 AS bv
         |    FROM reps, generate_series(0, 2) AS b(b))),
         |pr AS (SELECT DISTINCT a.rep AS id_a, b.rep AS id_b
         |  FROM bc a JOIN bc b ON a.bi = b.bi AND a.bv = b.bv AND a.rep < b.rep
         |  WHERE a.rn <= 1024 AND b.rn <= 1024
         |    AND bit_count(xor(a.phash, b.phash)) <= 2
         |  UNION
         |  SELECT minrep, rep FROM bc
         |  WHERE bn > 1024 AND rep <> minrep
         |    AND bit_count(xor(minhash, phash)) <= 2),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION SELECT id_b, id_a FROM pr),
         |reach AS (SELECT src AS id, src AS label FROM edges
         |  UNION SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id)
         |SELECT h.doc_id, h.phash, coalesce(comp.group_id, r.rep) AS group_id,
         |  (coalesce(comp.group_id, r.rep) = h.doc_id) AS canonical
         |FROM h JOIN reps r ON r.phash = h.phash
         |LEFT JOIN comp ON comp.id = r.rep
         |ORDER BY h.doc_id""".stripMargin,

    // the H&K lattice in closed form: closed-form PCM -> per-(frame,
    // stripe) integer energies (every cell occupied: n >= 400 samples
    // over 16x5 cells) -> double-difference sign bits -> identical-
    // fingerprint collapse (rep = min doc_id) -> banded pairs over reps
    // with the keep-smallest-reps hot-band cap (15-bit bands, rank <=
    // 1024 plus linear overflow stars to the band min, Hamming <= 3) -> recursive min-label components -> members
    // inherit their hash's rep component
    "p62_audio_fingerprint_dedup" ->
      s"""WITH RECURSIVE ids AS (
         |  SELECT doc_id, doc_id AS src, 0 AS pert FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000, doc_id, 0 FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000000, doc_id, 1 FROM documents WHERE doc_id % 7 = 0),
         |sm AS MATERIALIZED (
         |  SELECT i.doc_id, g.i,
         |    ((i.src * 31 + g.i * 17) % 2003 - 1001
         |      + CASE WHEN i.pert = 1 AND g.i % 37 = 0 THEN 1 ELSE 0 END) AS s,
         |    400 + i.src % 100 AS n
         |  FROM ids i, generate_series(0, 498) AS g(i)
         |  WHERE g.i < 400 + i.src % 100),
         |en AS MATERIALIZED (
         |  SELECT doc_id, (i * 16) // n AS f, i % 5 AS b,
         |    CAST(sum(s * s) AS BIGINT) AS e
         |  FROM sm GROUP BY doc_id, (i * 16) // n, i % 5),
         |h AS MATERIALIZED (
         |  SELECT a.doc_id, CAST(coalesce(sum(
         |      CASE WHEN (a.e - c.e) - (p.e - q.e) > 0
         |        THEN (CAST(1 AS BIGINT) << CAST((a.f - 1) * 4 + a.b AS INTEGER)) END), 0) AS BIGINT) AS fp
         |  FROM en a
         |  JOIN en c ON c.doc_id = a.doc_id AND c.f = a.f AND c.b = a.b + 1
         |  JOIN en p ON p.doc_id = a.doc_id AND p.f = a.f - 1 AND p.b = a.b
         |  JOIN en q ON q.doc_id = a.doc_id AND q.f = a.f - 1 AND q.b = a.b + 1
         |  WHERE a.f >= 1 AND a.b <= 3
         |  GROUP BY a.doc_id),
         |reps AS MATERIALIZED (
         |  SELECT fp, min(doc_id) AS rep FROM h GROUP BY fp),
         |bc AS MATERIALIZED (
         |  SELECT rep, fp, bi, bv,
         |    row_number() OVER (PARTITION BY bi, bv ORDER BY rep) AS rn,
         |    count(*) OVER (PARTITION BY bi, bv) AS bn,
         |    min(rep) OVER (PARTITION BY bi, bv) AS minrep,
         |    arg_min(fp, rep) OVER (PARTITION BY bi, bv) AS minhash
         |  FROM (SELECT rep, fp, b.b AS bi,
         |      (fp >> CAST(15 * b.b AS INTEGER)) & 32767 AS bv
         |    FROM reps, generate_series(0, 3) AS b(b))),
         |pr AS (SELECT DISTINCT a.rep AS id_a, b.rep AS id_b
         |  FROM bc a JOIN bc b ON a.bi = b.bi AND a.bv = b.bv AND a.rep < b.rep
         |  WHERE a.rn <= 1024 AND b.rn <= 1024
         |    AND bit_count(xor(a.fp, b.fp)) <= 3
         |  UNION
         |  SELECT minrep, rep FROM bc
         |  WHERE bn > 1024 AND rep <> minrep
         |    AND bit_count(xor(minhash, fp)) <= 3),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION SELECT id_b, id_a FROM pr),
         |reach AS (SELECT src AS id, src AS label FROM edges
         |  UNION SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id)
         |SELECT h.doc_id, h.fp, coalesce(comp.group_id, r.rep) AS group_id,
         |  (coalesce(comp.group_id, r.rep) = h.doc_id) AS canonical
         |FROM h JOIN reps r ON r.fp = h.fp
         |LEFT JOIN comp ON comp.id = r.rep
         |ORDER BY h.doc_id""".stripMargin,

    // the per-frame pHash lattice in closed form: closed-form frame
    // pixels (effective frame = f + clip offset) -> per-frame separable
    // DCT with the same interpolated cosine table -> identical-hash
    // collapse (rep = min composite id per hash; per-(hash, video)
    // counts) -> capped band join over distinct hashes -> cross-video
    // count products (same-hash + near-hash), summed per video pair
    "p63_video_clip_matches" ->
      s"""WITH ids AS (
         |  SELECT doc_id, doc_id AS src, 4 AS nf, 0 AS off FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000, doc_id, 4, 0 FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000000, doc_id, 2, 1 FROM documents WHERE doc_id % 7 = 0),
         |sd AS (SELECT doc_id, (src * 2654435761) % 2147483648 AS h, nf, off FROM ids),
         |fr AS (SELECT doc_id, h, f.f, f.f + off AS e
         |  FROM sd, generate_series(0, 3) AS f(f) WHERE f.f < nf),
         |cc AS (SELECT * FROM (VALUES $phashCosValues) t(u, x, cv)),
         |px AS MATERIALIZED (
         |  SELECT i.doc_id, i.f, x.x, y.y,
         |    3 * (((i.h >> 24) % 255 + x.x * (3 + i.h % 13)
         |           + y.y * (5 + (i.h >> 8) % 11) + i.e * (7 + (i.h >> 12) % 5)
         |           + x.x * y.y * ((i.h >> 16) % 7)) % 255) AS g
         |  FROM fr i, generate_series(0, 15) AS x(x), generate_series(0, 15) AS y(y)),
         |rp AS MATERIALIZED (
         |  SELECT p.doc_id, p.f, c.u, p.y, CAST(sum(p.g * c.cv) AS BIGINT) AS rv
         |  FROM px p JOIN cc c ON c.x = p.x GROUP BY p.doc_id, p.f, c.u, p.y),
         |f2 AS MATERIALIZED (
         |  SELECT r.doc_id, r.f, r.u, c.u AS v, CAST(sum(r.rv * c.cv) AS BIGINT) AS fv
         |  FROM rp r JOIN cc c ON c.x = r.y GROUP BY r.doc_id, r.f, r.u, c.u),
         |st AS (SELECT doc_id, f, CAST(sum(fv) AS BIGINT) AS acsum
         |  FROM f2 WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id, f),
         |hh AS MATERIALIZED (
         |  SELECT q.doc_id * 1000000 + q.f AS cid,
         |    CAST(coalesce(sum(CASE WHEN q.fv * 63 > st.acsum
         |      THEN (CAST(1 AS BIGINT) << CAST(q.u * 8 + q.v - 1 AS INTEGER)) END), 0) AS BIGINT) AS ph
         |  FROM f2 q JOIN st ON st.doc_id = q.doc_id AND st.f = q.f
         |  WHERE NOT (q.u = 0 AND q.v = 0)
         |  GROUP BY q.doc_id, q.f),
         |reps AS MATERIALIZED (
         |  SELECT ph, min(cid) AS rep FROM hh GROUP BY ph),
         |vc0 AS MATERIALIZED (
         |  SELECT ph, cid // 1000000 AS vid, count(*) AS cnt
         |  FROM hh GROUP BY ph, cid // 1000000),
         |vc AS (SELECT ph, vid, cnt FROM (
         |    SELECT ph, vid, cnt, row_number() OVER (PARTITION BY ph ORDER BY vid) AS vr
         |    FROM vc0)
         |  WHERE vr <= 1024),
         |bc AS MATERIALIZED (
         |  SELECT rep, ph, bi, bv,
         |    row_number() OVER (PARTITION BY bi, bv ORDER BY rep) AS rn,
         |    count(*) OVER (PARTITION BY bi, bv) AS bn,
         |    min(rep) OVER (PARTITION BY bi, bv) AS minrep,
         |    arg_min(ph, rep) OVER (PARTITION BY bi, bv) AS minhash
         |  FROM (SELECT rep, ph, b.b AS bi,
         |      (ph >> CAST(21 * b.b AS INTEGER)) & 2097151 AS bv
         |    FROM reps, generate_series(0, 2) AS b(b))),
         |hp AS (SELECT DISTINCT a.ph AS ha, b.ph AS hb
         |  FROM bc a JOIN bc b ON a.bi = b.bi AND a.bv = b.bv AND a.rep < b.rep
         |  WHERE a.rn <= 1024 AND b.rn <= 1024
         |    AND bit_count(xor(a.ph, b.ph)) <= 2
         |  UNION
         |  SELECT minhash, ph FROM bc
         |  WHERE bn > 1024 AND rep <> minrep
         |    AND bit_count(xor(minhash, ph)) <= 2),
         |contrib AS (
         |  SELECT x.vid AS vid_a, y.vid AS vid_b, x.cnt * y.cnt AS n
         |  FROM vc x JOIN vc y ON x.ph = y.ph AND x.vid < y.vid
         |  UNION ALL
         |  SELECT least(x.vid, y.vid), greatest(x.vid, y.vid), x.cnt * y.cnt
         |  FROM hp JOIN vc x ON x.ph = hp.ha JOIN vc y ON y.ph = hp.hb
         |  WHERE x.vid <> y.vid)
         |SELECT vid_a, vid_b, CAST(sum(n) AS BIGINT) AS n_frame_matches
         |FROM contrib GROUP BY 1, 2 ORDER BY vid_a, vid_b""".stripMargin,

    // EXACTSUBSTR in closed relational form: duplicated 10-grams keep only
    // the min (doc_id, pos) occurrence; every token covered by any other
    // occurrence is cut; grams compare by string here (Spark shuffles the
    // 60-bit md5 of the same string — identical grouping, p38 precedent)
    "p58_substring_dedup" ->
      s"""WITH inj AS (SELECT doc_id, text
         |    || (CASE WHEN doc_id % 3 = 0 THEN '$SubstrBoiler' ELSE '' END) AS text
         |  FROM documents),
         |t AS (SELECT doc_id, ${oToks} AS ts FROM inj),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    array_to_string(ts[i:i+9], ' ') AS gram
         |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 9)) AS i FROM t)),
         |d AS (SELECT gram, min(ROW(doc_id, pos)) AS fst, count(*) AS c
         |  FROM g GROUP BY gram),
         |m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
         |  WHERE d.c > 1 AND ROW(g.doc_id, g.pos) <> d.fst),
         |cov AS (SELECT DISTINCT m.doc_id, m.pos + s.k AS cp
         |  FROM m, generate_series(0, 9) AS s(k)),
         |tp AS (SELECT doc_id, CAST(i AS BIGINT) AS tpos, ts[i] AS tok
         |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM t)),
         |j AS (SELECT tp.doc_id, tp.tpos, tp.tok, (cov.cp IS NOT NULL) AS rm
         |  FROM tp LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.cp = tp.tpos)
         |SELECT doc_id,
         |  coalesce(string_agg(tok, ' ' ORDER BY tpos) FILTER (NOT rm), '') AS text,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(*) FILTER (rm) AS BIGINT) AS n_removed
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the same add-one e4-quantized LM arithmetic as p46, applied twice
    // (target = every 7th doc), differenced on the integer lattice; the
    // top-100 rank is (score DESC, doc_id) — fully deterministic
    "p59_importance_resample" ->
      s"""WITH tk AS (SELECT doc_id, unnest($oToks) AS t FROM documents),
         |tkc AS (SELECT doc_id, t FROM tk WHERE t != ''),
         |vc AS (SELECT t, count(*)::BIGINT AS c FROM tkc GROUP BY t),
         |totc AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nv FROM vc),
         |vt AS (SELECT t, count(*)::BIGINT AS c FROM tkc WHERE doc_id % 7 = 3 GROUP BY t),
         |tott AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nv FROM vt),
         |lr AS (SELECT vc.t,
         |    CAST(floor(ln((coalesce(vt.c, 0) + 1)::DOUBLE / (tott.ntok + tott.nv)::DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT)
         |  - CAST(floor(ln((vc.c + 1)::DOUBLE / (totc.ntok + totc.nv)::DOUBLE)
         |      * 10000.0 + 0.5) AS BIGINT) AS lr_e4
         |  FROM vc LEFT JOIN vt ON vc.t = vt.t, totc, tott),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    floor(CAST(sum(lr_e4) AS DOUBLE) / count(*)::DOUBLE + 0.5) / 10000.0 AS dsir_score
         |  FROM tkc JOIN lr ON tkc.t = lr.t GROUP BY doc_id),
         |sel AS (SELECT doc_id FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 100)
         |SELECT sc.doc_id, n_tokens, dsir_score, (sel.doc_id IS NOT NULL) AS selected
         |FROM sc LEFT JOIN sel ON sel.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,

    // nearest-neighbor thumbnail meta in closed form: dst pixel (x, y) of
    // the 8x6 -> 4x3 downsample selects src (2x, 2y), so its value is
    // (id*31 + 2x*7 + 2y*13) % 256 in all 3 bands; 36 samples total
    "p56_image_resize" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |    (d.doc_id * 31 + (2 * x.x) * 7 + (2 * y.y) * 13) % 256 AS v
        |  FROM documents d, generate_series(0, 3) AS x(x), generate_series(0, 2) AS y(y))
        |SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  floor(CAST(3 * sum(v) AS DOUBLE) / 36.0 * 100.0 + 0.5) / 100.0 AS brightness
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // closed-form frame sums of the synthetic AVIs: frame f's pixel
    // (x, y) is (id*31 + f*19 + x*7 + y*13) % 256 in all 3 bands of a
    // 7x5 frame; doc d has 2 + d%3 frames, sampled every 2nd — padding
    // bytes (0xFF) are NOT in the sum, so a padding-naive parse mismatches
    "p57_video_frames" ->
      """WITH f AS (
        |  SELECT d.doc_id, fr.f AS frame_idx, 2 + d.doc_id % 3 AS nf
        |  FROM documents d, generate_series(0, 3) AS fr(f)
        |  WHERE fr.f <= 1 + d.doc_id % 3 AND fr.f % 2 = 0),
        |s AS (
        |  SELECT f.doc_id, f.nf, f.frame_idx,
        |    sum(3 * ((f.doc_id * 31 + f.frame_idx * 19 + x.x * 7 + y.y * 13) % 256)) AS fs
        |  FROM f, generate_series(0, 6) AS x(x), generate_series(0, 4) AS y(y)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(7 AS BIGINT) AS width, CAST(5 AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(fs AS BIGINT) AS frame_sum
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    "p64_mjpeg_video_frames" ->
      """WITH f AS (
        |  SELECT d.doc_id, fr.f AS frame_idx, 1 + d.doc_id % 3 AS nf
        |  FROM documents d, generate_series(0, 2) AS fr(f)
        |  WHERE fr.f <= d.doc_id % 3)
        |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST((doc_id * 7 + frame_idx * 3) % 25 AS BIGINT) AS gray_bucket
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form meta of the synthetic WAVs: sample i of doc d is
    // ((d*31 + i*17) % 2003) - 1001, n = 50 + d % 30 samples at 8 kHz
    // mono; peak is an exact integer max and rms mirrors Spark's
    // floor(sqrt(sumSq/n)*10000+0.5)/10000 with sumSq an exact long
    "p53_audio_meta" ->
      """WITH s AS (
        |  SELECT d.doc_id, i.i, (d.doc_id * 31 + i.i * 17) % 2003 - 1001 AS v
        |  FROM documents d, generate_series(0, 78) AS i(i)
        |  WHERE i.i <= 49 + d.doc_id % 30)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  floor(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS rms
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // SemDeDup: the 2-round Lloyd quantizer is replicated exactly
    // (kmeansRoundSql), assignment is the same cosine argmax with
    // smaller-centroid-id tiebreak, and the within-cluster verify uses the
    // identical left-assoc dot arithmetic quantized to the 1e-4 lattice
    "p52_semantic_dedup" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corpus AS MATERIALIZED (
         |  SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.5) AS v
         |  FROM base WHERE vec_id % 5 = 0),
         |cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
         |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT 8)),
         |${kmeansRoundSql(1, 64)},
         |${kmeansRoundSql(2, 64)},
         |asgn AS MATERIALIZED (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT s.vec_id, s.v, t.cid,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY (${dotSql("s.v", "t.c", 64)} /
         |          (sqrt(${dotSql("s.v", "s.v", 64)}) * sqrt(${dotSql("t.c", "t.c", 64)}))) DESC,
         |          t.cid) AS rnk
         |    FROM corpus s CROSS JOIN cents2 t) WHERE rnk = 1),
         |verified AS (
         |  SELECT b.vec_id AS id_b
         |  FROM asgn a JOIN asgn b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE floor((${dotSql("a.v", "b.v", 64)} /
         |      (sqrt(${dotSql("a.v", "a.v", 64)}) * sqrt(${dotSql("b.v", "b.v", 64)})))
         |      * 10000.0 + 0.5) / 10000.0 >= 0.995)
         |SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id FROM asgn
         |WHERE vec_id NOT IN (SELECT id_b FROM verified)
         |ORDER BY vec_id""".stripMargin,

    // p52's quantizer chain + a size-gated hyperplane sub-bucket: pairs
    // join on (cid, bucket); the sign test replicates bit-for-bit (sigSql)
    "p55_semantic_dedup_refined" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corpus AS MATERIALIZED (
         |  SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.5) AS v
         |  FROM base WHERE vec_id % 5 = 0),
         |cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
         |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT 8)),
         |${kmeansRoundSql(1, 64)},
         |${kmeansRoundSql(2, 64)},
         |asgn AS MATERIALIZED (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT s.vec_id, s.v, t.cid,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY (${dotSql("s.v", "t.c", 64)} /
         |          (sqrt(${dotSql("s.v", "s.v", 64)}) * sqrt(${dotSql("t.c", "t.c", 64)}))) DESC,
         |          t.cid) AS rnk
         |    FROM corpus s CROSS JOIN cents2 t) WHERE rnk = 1),
         |sizes AS (SELECT cid, count(*) AS cn FROM asgn GROUP BY cid),
         |bkt AS MATERIALIZED (
         |  SELECT a.vec_id, a.v, a.cid,
         |    CASE WHEN s.cn > 100 THEN ${sigSql("a.v", 64, 3)} ELSE 0 END AS b
         |  FROM asgn a JOIN sizes s ON s.cid = a.cid),
         |verified AS (
         |  SELECT b2.vec_id AS id_b
         |  FROM bkt a JOIN bkt b2 ON a.cid = b2.cid AND a.b = b2.b
         |    AND a.vec_id < b2.vec_id
         |  WHERE floor((${dotSql("a.v", "b2.v", 64)} /
         |      (sqrt(${dotSql("a.v", "a.v", 64)}) * sqrt(${dotSql("b2.v", "b2.v", 64)})))
         |      * 10000.0 + 0.5) / 10000.0 >= 0.995)
         |SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id FROM bkt
         |WHERE vec_id NOT IN (SELECT id_b FROM verified)
         |ORDER BY vec_id""".stripMargin,

    "p18_embed_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 400),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.5) AS v
        |  FROM base WHERE vec_id % 5 = 0),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5) / 10000.0 AS sim
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM scored
        |WHERE sim >= 0.995
        |ORDER BY id_a, id_b""".stripMargin,

    // LSH near-dedup: the bucket signature is replicated exactly (sigSql);
    // verification cosine is quantized (p18-proven agreement on this corpus)
    "p19_embed_neardup_lsh" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 400),
         |corpus AS (
         |  SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.5) AS v
         |  FROM base WHERE vec_id % 5 = 0),
         |bk AS (SELECT vec_id, v, ${sigSql("v", 64, 4)} AS bucket FROM corpus),
         |verified AS (
         |  SELECT b.vec_id AS id_b
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5) / 10000.0 >= 0.995)
         |SELECT vec_id FROM corpus
         |WHERE vec_id NOT IN (SELECT id_b FROM verified)
         |ORDER BY vec_id""".stripMargin,

    // LSH-bucketed ANN: same replicated signature; candidates restricted to
    // the query's bucket, ranked by quantized cosine
    "p12_ann_lsh_bucketed" ->
      s"""WITH cb AS (
         |  SELECT neighbor_id, cv, ${sigSql("cv", 64, 4)} AS bucket
         |  FROM (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings)),
         |qb AS (
         |  SELECT query_id, qv, ${sigSql("qv", 64, 4)} AS bucket
         |  FROM (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10)),
         |scored AS (
         |  SELECT query_id, neighbor_id, $qCos AS sim
         |  FROM cb JOIN qb USING (bucket))
         |SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |FROM scored
         |QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // IVF ANN: centroid seeding (first m by id), assignment argmax and
    // probe top-nprobe replicated with bit-exact left-assoc dot products
    // (unquantized comparisons); final candidate ranking by quantized cosine
    "p36_ivf_kmeans" ->
      s"""WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
         |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT 8)),
         |${kmeansRoundSql(1, 64)},
         |${kmeansRoundSql(2, 64)}
         |SELECT cid AS centroid_id, pos::BIGINT AS pos, c[pos] AS comp
         |FROM cents2 CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
         |ORDER BY centroid_id, pos""".stripMargin,

    "p20_ann_ivf" ->
      s"""WITH cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, v AS centroid,
         |    sqrt(${dotSql("v", "v", 64)}) AS tn
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings ORDER BY vec_id LIMIT 16)),
         |corpus AS (
         |  SELECT vec_id AS neighbor_id, cv, sqrt(${dotSql("cv", "cv", 64)}) AS cn
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)),
         |queries AS (
         |  SELECT vec_id AS query_id, qv, sqrt(${dotSql("qv", "qv", 64)}) AS qn
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10)),
         |lists AS (
         |  SELECT neighbor_id, cv, centroid_id FROM (
         |    SELECT c.neighbor_id, c.cv, t.centroid_id,
         |      row_number() OVER (PARTITION BY c.neighbor_id
         |        ORDER BY (${dotSql("c.cv", "t.centroid", 64)} / (c.cn * t.tn)) DESC,
         |          t.centroid_id) AS rnk
         |    FROM corpus c CROSS JOIN cents t) WHERE rnk = 1),
         |probes AS (
         |  SELECT query_id, qv, centroid_id FROM (
         |    SELECT q.query_id, q.qv, t.centroid_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY (${dotSql("q.qv", "t.centroid", 64)} / (q.qn * t.tn)) DESC,
         |          t.centroid_id) AS rnk
         |    FROM queries q CROSS JOIN cents t) WHERE rnk <= 4),
         |scored AS (
         |  SELECT query_id, neighbor_id, $qCos AS sim
         |  FROM lists JOIN probes USING (centroid_id))
         |SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |FROM scored
         |QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // connected components via recursive CTE: reach = every (node, label)
    // with label reachable from node over bidirected verified edges; the
    // component representative is min(label); unpaired docs group as
    // themselves
    "p24_neardup_groups" ->
      s"""WITH RECURSIVE ${nearDedupCtesOver(s"SELECT * FROM ($corpusSqlWithDups) WHERE doc_id % 4 = 1")},
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM verified
         |  UNION SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT src AS id, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id)
         |SELECT c.doc_id, coalesce(comp.group_id, c.doc_id) AS group_id
         |FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "p106_weighted_sample" ->
      s"""WITH v AS (SELECT doc_id, len(list_filter($oToks, t -> t != ''))::BIGINT AS ntok FROM documents),
         |w AS (SELECT doc_id, ntok,
         |  CAST(floor(least((-ln((${oH("doc_id::VARCHAR || 'wk'")} + 1)::DOUBLE / 1152921504606846976.0)
         |      / ntok::DOUBLE), 9000000000000.0) * 1000000.0 + 0.5) AS BIGINT) AS k
         |  FROM v WHERE ntok > 0),
         |r AS (SELECT doc_id, ntok, k, row_number() OVER (ORDER BY k, doc_id) AS rn FROM w)
         |SELECT doc_id, ntok, k AS sample_key_e6 FROM r WHERE rn <= 200 ORDER BY doc_id""".stripMargin,

    "p104_dedup_eval" ->
      s"""WITH ${nearDedupCtesOver(s"SELECT * FROM ($corpusSqlWithDups) WHERE len(text) < 150")},
         |truth AS (SELECT doc_id - 1000000 AS id_a, doc_id AS id_b
         |  FROM corpus WHERE doc_id >= 1000000),
         |tp AS (SELECT count(*)::BIGINT AS n_tp FROM verified v
         |  JOIN truth t ON v.id_a = t.id_a AND v.id_b = t.id_b),
         |np AS (SELECT count(*)::BIGINT AS n_pred FROM verified),
         |nt AS (SELECT count(*)::BIGINT AS n_truth FROM truth)
         |SELECT n_tp, n_pred, n_truth,
         |  CAST(CASE WHEN n_pred > 0 THEN (n_tp * 1000000) // n_pred ELSE 0 END AS BIGINT) AS precision_e6,
         |  CAST(CASE WHEN n_truth > 0 THEN (n_tp * 1000000) // n_truth ELSE 0 END AS BIGINT) AS recall_e6
         |FROM tp, np, nt""".stripMargin,

    "p103_retrieval_metrics" -> {
      val qs = Seq(("a", "q1", Seq("spark", "window")),
        ("b", "q2", Seq("merge", "sort", "fast")),
        ("c", "q3", Seq("customer", "line")))
      def block(pfx: String, qid: String, terms: Seq[String]) = {
        val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
        s"""r$pfx AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM lex$pfx),
           |rel$pfx AS (SELECT doc_id FROM toks$pfx WHERE list_has_all(tk, $termList)),
           |m$pfx AS (SELECT '$qid' AS query_id,
           |  (SELECT count(*)::BIGINT FROM rel$pfx) AS n_rel,
           |  (SELECT count(*)::BIGINT FROM r$pfx JOIN rel$pfx USING (doc_id) WHERE rk <= 10) AS rel_at_k,
           |  (SELECT 1000000 // min(rk) FROM r$pfx JOIN rel$pfx USING (doc_id) WHERE rk <= 10) AS mrr)""".stripMargin
      }
      s"""WITH ${qs.map(q => bm25LexCtes(q._3, q._1)).mkString(",\n")},
         |${qs.map(q => block(q._1, q._2, q._3)).mkString(",\n")},
         |uni AS (${qs.map(q => s"SELECT * FROM m${q._1}").mkString(" UNION ALL ")})
         |SELECT query_id, n_rel, rel_at_k,
         |  CAST(CASE WHEN n_rel > 0 THEN (rel_at_k * 1000000) // n_rel ELSE 0 END AS BIGINT) AS recall_e6,
         |  CAST(coalesce(mrr, 0) AS BIGINT) AS mrr_e6
         |FROM uni ORDER BY query_id""".stripMargin
    },

    "p102_group_split" ->
      s"""WITH RECURSIVE ${nearDedupCtesOver(s"SELECT * FROM ($corpusSqlWithDups) WHERE doc_id % 4 = 1")},
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM verified
         |  UNION SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT src AS id, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
         |g AS (SELECT c.doc_id, coalesce(comp.group_id, c.doc_id) AS group_id
         |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id),
         |b AS (SELECT doc_id, group_id,
         |    ${oH("group_id::VARCHAR || 'gs'")} % 10000 AS bucket FROM g)
         |SELECT (CASE WHEN bucket < 8000 THEN 'train'
         |             WHEN bucket < 9000 THEN 'val' ELSE 'test' END) AS split,
         |  count(*)::BIGINT AS n_docs,
         |  count(DISTINCT group_id)::BIGINT AS n_groups,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "p25_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${oH("doc_id::VARCHAR || 's1'")} % 10000 AS bucket
         |  FROM documents)
         |SELECT (CASE WHEN bucket < 8000 THEN 'train'
         |             WHEN bucket < 9000 THEN 'val' ELSE 'test' END) AS split,
         |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "p26_chunks" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    CAST(CEIL(GREATEST(len(text) - 16, 1)::DOUBLE / 48.0) AS BIGINT) AS nc
        |  FROM documents WHERE len(text) > 0),
        |c AS (SELECT doc_id, text, unnest(range(0, nc)) AS chunk_idx FROM n)
        |SELECT doc_id, chunk_idx, chunk_idx * 48 AS char_start,
        |  substr(text, CAST(chunk_idx * 48 + 1 AS INTEGER), 64) AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "p32_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, 1 AS n, unnest(tk) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, 2, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) FROM toks
        |  UNION ALL
        |  SELECT doc_id, 3, unnest([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, len(tk) - 1)]) FROM toks),
        |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY doc_id, n, g),
        |s AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot, max(c) AS top,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
        |  FROM c GROUP BY doc_id, n)
        |SELECT doc_id,
        |  coalesce(max(CASE WHEN n = 1 THEN floor(top::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS top_word_frac,
        |  coalesce(max(CASE WHEN n = 2 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup_2gram_frac,
        |  coalesce(max(CASE WHEN n = 3 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup_3gram_frac
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p33_bm25" ->
      s"""WITH ${bm25LexCtes(Seq("spark", "table", "window"))}
         |SELECT doc_id, bm25 FROM lex ORDER BY doc_id""".stripMargin,

    "p34_mix_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
         |  CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 20000
         |            WHEN 'es' THEN 15000 WHEN 'fr' THEN 32500 ELSE 0 END AS r10k,
         |  ${oH("doc_id::VARCHAR || 'mix1'")} % 10000 AS bucket
         |  FROM documents),
         |c AS (SELECT doc_id, lang,
         |  CAST(floor(r10k / 10000.0) AS BIGINT)
         |    + CASE WHEN bucket < r10k % 10000 THEN 1 ELSE 0 END AS copies FROM r)
         |SELECT doc_id, lang, unnest(range(0, copies)) AS copy_idx
         |FROM c WHERE copies > 0 ORDER BY doc_id, copy_idx""".stripMargin,

    "p35_incremental_dedup" ->
      """WITH newb AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text ELSE text || ' novel suffix' END AS text
        |  FROM documents)
        |SELECT n.doc_id FROM newb n
        |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = n.text)
        |ORDER BY doc_id""".stripMargin,

    "p27_vocab" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($oToks) AS term FROM documents)
         |SELECT term, count(*) AS term_count, count(DISTINCT doc_id) AS doc_count
         |FROM toks WHERE term <> ''
         |GROUP BY term ORDER BY term_count DESC, term LIMIT 100""".stripMargin,

    // p24's group chain + per-group argmax on quality (ties: lowest id)
    "p28_dedup_keep_best" ->
      s"""WITH RECURSIVE ${nearDedupCtesOver(s"SELECT * FROM ($corpusSqlWithDups) WHERE doc_id % 4 = 1")},
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM verified
         |  UNION SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT src AS id, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
         |g AS (
         |  SELECT c.doc_id, c.text, coalesce(comp.group_id, c.doc_id) AS group_id
         |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id),
         |q AS (SELECT doc_id, group_id, $qualitySql AS quality FROM g)
         |SELECT doc_id, quality FROM q
         |QUALIFY row_number() OVER (PARTITION BY group_id ORDER BY quality DESC, doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    // coarse rank in the replicated 8-dim projection, exact re-rank of the
    // top 50 by quantized full-dim cosine (p08-proven agreement)
    "p29_ann_projected" ->
      s"""WITH cb AS (
         |  SELECT neighbor_id, cv, ${projSqlList("cv", 64, 8)} AS cp
         |  FROM (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings)),
         |cbn AS (SELECT neighbor_id, cv, cp, sqrt(${dotSql("cp", "cp", 8)}) AS cpn FROM cb),
         |qb AS (
         |  SELECT query_id, qv, ${projSqlList("qv", 64, 8)} AS qp
         |  FROM (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10)),
         |qbn AS (SELECT query_id, qv, qp, sqrt(${dotSql("qp", "qp", 8)}) AS qpn FROM qb),
         |coarse AS (
         |  SELECT query_id, neighbor_id,
         |    floor((${dotSql("qp", "cp", 8)} / (qpn * cpn)) * 10000.0 + 0.5) / 10000.0 AS csim
         |  FROM cbn CROSS JOIN qbn),
         |cands AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, neighbor_id) AS rnk
         |    FROM coarse) WHERE rnk <= 50),
         |scored AS (
         |  SELECT cands.query_id, cands.neighbor_id, $qCos AS sim
         |  FROM cands
         |  JOIN (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings) c USING (neighbor_id)
         |  JOIN (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10) q USING (query_id))
         |SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |FROM scored
         |QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // scale/codes replicated with identical floor(x/scale + 0.5)
    // arithmetic; the error bound holds by construction -> pinned TRUE
    "p30_quantize_int8" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM v),
        |c AS (SELECT vec_id, scale,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS codes
        |  FROM s)
        |SELECT vec_id,
        |  floor(scale * 10000.0 + 0.5) / 10000.0 AS scale_e4,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  TRUE AS err_bounded
        |FROM c ORDER BY vec_id""".stripMargin,

    "p11_frame_sample" ->
      """WITH frames AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(CEIL(octet_length(text::BLOB) / 32.0) AS BIGINT))) AS f
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, f AS frame_idx,
        |  CAST(list_sum([ascii(substr(text, CAST(f * 32 + i AS INTEGER), 1))
        |    FOR i IN range(1, least(32, octet_length(text::BLOB) - f * 32) + 1)]) AS BIGINT) AS frame_bytes
        |FROM frames
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // direct single-window prefix sum: the oracle formulation the
    // distributed two-level version must agree with exactly
    "p37_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($oToks) AS BIGINT) AS cnt
         |  FROM documents),
         |w AS (SELECT doc_id, cnt,
         |  CAST(coalesce(sum(cnt) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef
         |  FROM t WHERE cnt > 0),
         |x AS (SELECT doc_id, cnt, bef,
         |  unnest(range(bef // 256, (bef + cnt - 1) // 256 + 1)) AS seq_id FROM w)
         |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(GREATEST(seq_id * 256 - bef, 0) AS BIGINT) AS tok_start,
         |  CAST(LEAST((seq_id + 1) * 256 - bef, cnt)
         |    - GREATEST(seq_id * 256 - bef, 0) AS BIGINT) AS tok_len,
         |  CAST(GREATEST(seq_id * 256, bef) - seq_id * 256 AS BIGINT) AS seq_offset
         |FROM x ORDER BY doc_id, seq_id""".stripMargin,

    "p38_decontam" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |g AS (SELECT doc_id,
         |  unnest([tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]
         |    FOR i IN range(1, len(tk) - 3)]) AS g
         |  FROM toks),
         |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 3),
         |hit AS (SELECT DISTINCT doc_id FROM g WHERE g IN (SELECT g FROM eg))
         |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
         |FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // same injection expression, RE2 'g' flag for replace-all parity
    "p39_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
      val longId = "\\b[0-9]{13,19}\\b"
      s"""WITH inj AS (SELECT doc_id, text
         |  || (CASE WHEN doc_id % 3 = 0
         |      THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END)
         |  || (CASE WHEN doc_id % 5 = 1
         |      THEN ' call 555-' || lpad((doc_id % 900 + 100)::VARCHAR, 3, '0')
         |        || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END)
         |  || (CASE WHEN doc_id % 7 = 2
         |      THEN ' card ' || lpad(doc_id::VARCHAR, 16, '0') ELSE '' END) AS text
         |  FROM documents)
         |, st AS (SELECT doc_id, text,
         |    regexp_replace(text, '$email', '<EMAIL>', 'g') AS after_email
         |  FROM inj)
         |, st2 AS (SELECT doc_id, text, after_email,
         |    regexp_replace(after_email, '$longId', '<ID>', 'g') AS after_id
         |  FROM st)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_id, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(after_email, '$longId')) AS BIGINT) AS n_ids,
         |  regexp_replace(after_id, '$phone', '<PHONE>', 'g') AS redacted
         |FROM st2 ORDER BY doc_id""".stripMargin
    },

    "p48_normalize" ->
      """WITH dirty AS (SELECT doc_id,
        |  '  ' || text || chr(9) || 'x' || chr(10) || chr(10) || '  y  ' || chr(7) AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
        |    '\s{2,}', ' ', 'g')) AS normalized
        |  FROM dirty)
        |SELECT doc_id, normalized,
        |  CAST(len(text) - len(normalized) AS BIGINT) AS n_removed
        |FROM n ORDER BY doc_id""".stripMargin,

    "p47_domain_tag" ->
      s"""WITH ${domainTagCtes()}
         |SELECT doc_id, domain, score FROM tagged ORDER BY doc_id""".stripMargin,

    "p49_domain_mix" ->
      s"""WITH ${domainTagCtes()},
         |r AS (SELECT doc_id, domain,
         |  CASE domain WHEN 'compute' THEN 25000 WHEN 'storage' THEN 5000
         |              WHEN 'query' THEN 12500 WHEN 'und' THEN 1000 ELSE 0 END AS r10k,
         |  ${oH("doc_id::VARCHAR || 'dm1'")} % 10000 AS bucket
         |  FROM tagged),
         |c AS (SELECT doc_id, domain,
         |  CAST(floor(r10k / 10000.0) AS BIGINT)
         |    + CASE WHEN bucket < r10k % 10000 THEN 1 ELSE 0 END AS copies FROM r),
         |x AS (SELECT doc_id, domain, unnest(range(0, copies)) AS copy_idx
         |  FROM c WHERE copies > 0)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_copies,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM x GROUP BY domain ORDER BY domain""".stripMargin,

    "p46_lm_score" ->
      s"""WITH $lmScoreCtes
         |SELECT doc_id, n_tokens, score AS avg_logprob
         |FROM sc ORDER BY doc_id""".stripMargin,

    "p70_classifier_score" ->
      s"""WITH tka AS (SELECT doc_id,
         |    list_filter($oToks, t -> t != '') AS tk FROM documents),
         |feats AS (SELECT doc_id, unnest(list_concat(tk,
         |    [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])) AS f FROM tka),
         |w AS (SELECT doc_id,
         |  ((((('0x' || substr(md5(f), 1, 15))::BIGINT % 1048576) * 2654435761)
         |    % 2000001) - 1000000)::BIGINT AS w_e6 FROM feats),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(w_e6) AS BIGINT) AS s_e6 FROM w GROUP BY doc_id),
         |q AS (SELECT d.doc_id, coalesce(sc.n, 0)::BIGINT AS n_features,
         |  CASE WHEN sc.doc_id IS NULL THEN 0.5
         |       ELSE floor(1.0 / (1.0 + exp(-((sc.s_e6::DOUBLE / sc.n::DOUBLE) / 1000000.0)))
         |         * 10000.0 + 0.5) / 10000.0 END AS score
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
         |SELECT doc_id, n_features, score,
         |  CASE WHEN score >= 0.5 THEN 'keep' ELSE 'drop' END AS label
         |FROM q ORDER BY doc_id""".stripMargin,

    "p71_bigram_lm" ->
      s"""WITH tka AS (SELECT doc_id,
         |    list_filter($oToks, t -> t != '') AS tk FROM documents),
         |tkn AS (SELECT doc_id, tk FROM tka WHERE len(tk) >= 1),
         |uni AS (SELECT doc_id, unnest(tk) AS t FROM tkn),
         |vocab AS (SELECT t, count(*)::BIGINT AS c FROM uni GROUP BY t),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nvocab FROM vocab),
         |bg AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1]
         |    FOR i IN range(1, len(tk))]) AS g FROM tkn),
         |c12 AS (SELECT g, count(*)::BIGINT AS c12 FROM bg GROUP BY g),
         |parts AS (SELECT g, c12, string_split(g, ' ')[1] AS w1,
         |    string_split(g, ' ')[2] AS w2 FROM c12),
         |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM parts GROUP BY w1),
         |lp2 AS (SELECT g, CAST(floor(ln(
         |    0.75 * ((p.c12 + 1)::DOUBLE / (ctx.c1 + tot.nvocab)::DOUBLE)
         |    + 0.25 * ((v.c + 1)::DOUBLE / (tot.ntok + tot.nvocab)::DOUBLE))
         |  * 10000.0 + 0.5) AS BIGINT) AS lp_e4
         |  FROM parts p JOIN ctx USING (w1) JOIN vocab v ON p.w2 = v.t, tot),
         |lp1 AS (SELECT t, CAST(floor(ln((c + 1)::DOUBLE / (ntok + nvocab)::DOUBLE)
         |  * 10000.0 + 0.5) AS BIGINT) AS lp_e4 FROM vocab, tot),
         |scored AS (
         |  SELECT doc_id, lp_e4 FROM bg JOIN lp2 USING (g)
         |  UNION ALL
         |  SELECT f.doc_id, lp1.lp_e4
         |  FROM (SELECT doc_id, tk[1] AS t FROM tkn) f JOIN lp1 USING (t))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  floor(CAST(sum(lp_e4) AS DOUBLE) / count(*)::DOUBLE + 0.5) / 10000.0 AS avg_logprob
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p72_bigram_lm_cross" ->
      s"""WITH ctka AS (SELECT list_filter($oToks, t -> t != '') AS tk
         |    FROM documents WHERE lang = 'en'),
         |ctkn AS (SELECT tk FROM ctka WHERE len(tk) >= 1),
         |vocab AS (SELECT t, count(*)::BIGINT AS c
         |  FROM (SELECT unnest(tk) AS t FROM ctkn) GROUP BY t),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*)::BIGINT AS nvocab FROM vocab),
         |c12 AS (SELECT g, count(*)::BIGINT AS c12
         |  FROM (SELECT unnest([tk[i] || ' ' || tk[i+1]
         |    FOR i IN range(1, len(tk))]) AS g FROM ctkn) GROUP BY g),
         |ctx AS (SELECT string_split(g, ' ')[1] AS w1, CAST(sum(c12) AS BIGINT) AS c1
         |  FROM c12 GROUP BY 1),
         |dtkn AS (SELECT doc_id, list_filter($oToks, t -> t != '') AS tk
         |  FROM documents WHERE len(list_filter($oToks, t -> t != '')) >= 1),
         |bg AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
         |  FROM (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1]
         |    FOR i IN range(1, len(tk))]) AS g FROM dtkn)),
         |sc2 AS (SELECT doc_id, CAST(floor(ln(
         |    0.75 * ((coalesce(c.c12, 0) + 1)::DOUBLE / (coalesce(x.c1, 0) + tot.nvocab)::DOUBLE)
         |    + 0.25 * ((coalesce(v.c, 0) + 1)::DOUBLE / (tot.ntok + tot.nvocab)::DOUBLE))
         |  * 10000.0 + 0.5) AS BIGINT) AS lp_e4
         |  FROM bg LEFT JOIN c12 c USING (g) LEFT JOIN ctx x USING (w1)
         |    LEFT JOIN vocab v ON bg.w2 = v.t, tot),
         |sc1 AS (SELECT f.doc_id, CAST(floor(ln(
         |    (coalesce(v.c, 0) + 1)::DOUBLE / (tot.ntok + tot.nvocab)::DOUBLE)
         |  * 10000.0 + 0.5) AS BIGINT) AS lp_e4
         |  FROM (SELECT doc_id, tk[1] AS t FROM dtkn) f
         |    LEFT JOIN vocab v ON f.t = v.t, tot),
         |scored AS (SELECT * FROM sc2 UNION ALL SELECT * FROM sc1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  floor(CAST(sum(lp_e4) AS DOUBLE) / count(*)::DOUBLE + 0.5) / 10000.0 AS avg_logprob
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p69_ccnet_pipeline" ->
      s"""WITH $lmScoreCtes,
         |sl AS (SELECT s.doc_id, d.lang, s.score, s.n_tokens
         |  FROM sc s JOIN documents d USING (doc_id)),
         |cls AS (SELECT lang, score, count(*)::BIGINT AS c FROM sl GROUP BY 1, 2),
         |cum AS (SELECT lang, score,
         |  CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef,
         |  CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n FROM cls),
         |b AS (SELECT lang, score,
         |  CASE WHEN bef < ceil(n * CAST(0.3 AS DOUBLE)) THEN 'head'
         |       WHEN bef < ceil(n * CAST(0.6 AS DOUBLE)) THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket FROM cum)
         |SELECT sl.lang, b.ppl_bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(sl.n_tokens) AS BIGINT) AS n_tokens
         |FROM sl JOIN b ON sl.lang IS NOT DISTINCT FROM b.lang
         |  AND sl.score IS NOT DISTINCT FROM b.score
         |WHERE b.ppl_bucket != 'tail'
         |GROUP BY sl.lang, b.ppl_bucket
         |ORDER BY sl.lang, b.ppl_bucket""".stripMargin,

    "p68_corpus_diff" ->
      s"""WITH o AS (SELECT doc_id AS oid, ${oH("text")} AS ohash FROM documents),
         |n1 AS (SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 10 != 0
         |  UNION ALL
         |  SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id % 9 = 0),
         |n AS (SELECT doc_id AS nid, ${oH("text")} AS nhash FROM n1)
         |SELECT coalesce(oid, nid) AS doc_id,
         |  CASE WHEN oid IS NULL THEN 'added'
         |       WHEN nid IS NULL THEN 'removed'
         |       WHEN ohash IS NOT DISTINCT FROM nhash THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM o FULL OUTER JOIN n ON oid = nid
         |ORDER BY doc_id""".stripMargin,

    "p67_lang_token_budget" ->
      s"""WITH $lmScoreCtes,
         |sl AS (SELECT s.doc_id, d.lang AS stratum, s.score, s.n_tokens
         |  FROM sc s JOIN documents d USING (doc_id)),
         |c AS (SELECT doc_id, stratum, score, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY stratum ORDER BY score DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         |  CAST(sum(n_tokens) OVER (PARTITION BY stratum) AS BIGINT) AS tot FROM sl)
         |SELECT doc_id, stratum, score, n_tokens, cum_before,
         |  cum_before < ceil(tot * CAST(0.3 AS DOUBLE)) AS selected
         |FROM c ORDER BY doc_id""".stripMargin,

    "p65_perplexity_buckets" ->
      s"""WITH $lmScoreCtes,
         |sl AS (SELECT s.doc_id, d.lang, s.score FROM sc s JOIN documents d USING (doc_id)),
         |cls AS (SELECT lang, score, count(*)::BIGINT AS c FROM sl GROUP BY 1, 2),
         |cum AS (SELECT lang, score,
         |  CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef,
         |  CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n FROM cls),
         |b AS (SELECT lang, score,
         |  CASE WHEN bef < ceil(n * CAST(0.3 AS DOUBLE)) THEN 'head'
         |       WHEN bef < ceil(n * CAST(0.6 AS DOUBLE)) THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket FROM cum)
         |SELECT sl.doc_id, sl.lang, sl.score, b.ppl_bucket
         |FROM sl JOIN b ON sl.lang IS NOT DISTINCT FROM b.lang
         |  AND sl.score IS NOT DISTINCT FROM b.score
         |ORDER BY sl.doc_id""".stripMargin,

    "p66_token_budget" ->
      s"""WITH $lmScoreCtes,
         |c AS (SELECT doc_id, score, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM sc),
         |b AS (SELECT CAST(ceil(CAST(sum(n_tokens) AS DOUBLE) * CAST(0.4 AS DOUBLE)) AS BIGINT)
         |  AS budget FROM sc)
         |SELECT doc_id, score, n_tokens, cum_before,
         |  cum_before < (SELECT budget FROM b) AS selected
         |FROM c ORDER BY doc_id""".stripMargin,

    "p45_hybrid_search" -> {
      val alpha = 0.3
      // interpolate the exact IEEE doubles (shortest-repr round-trip) so
      // DuckDB multiplies by bit-identical constants
      s"""WITH ${bm25LexCtes(Seq("spark", "table", "window"))},
         |qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 7),
         |den AS (SELECT vec_id AS doc_id,
         |  CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
         |            sqrt(list_dot_product(q, q)) = 0 THEN 0.0
         |       ELSE floor(list_cosine_similarity(embedding::DOUBLE[], q) * 10000.0 + 0.5) / 10000.0
         |  END AS cos
         |  FROM embeddings, qv),
         |f AS (SELECT l.doc_id, bm25, cos,
         |  floor((bm25 * $alpha + cos * ${1.0 - alpha}) * 10000.0 + 0.5) / 10000.0 AS fused
         |  FROM lex l JOIN den USING (doc_id))
         |SELECT doc_id, bm25, cos, fused FROM f
         |ORDER BY fused DESC, doc_id LIMIT 20""".stripMargin
    },

    "p44_corpus_report" ->
      s"""WITH b AS (SELECT doc_id, lang, CAST(len($oToks) AS BIGINT) AS toks,
         |  ${oH("array_to_string($oToks, ' ')").replace("$oToks", oToks)} AS fp
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rk,
         |  count(*) OVER (PARTITION BY lang) AS n FROM b)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN toks END) AS p50_tokens,
         |  max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT) THEN toks END) AS p90_tokens,
         |  max(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT) THEN toks END) AS p99_tokens,
         |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "p43_incremental_neardedup" ->
      s"""WITH refc AS (SELECT doc_id, text FROM documents),
         |newc AS (
         |  SELECT doc_id + 2000000 AS doc_id, text || ' tiny tail' AS text
         |  FROM documents WHERE doc_id % 9 = 0
         |  UNION ALL
         |  SELECT doc_id + 2100000, text FROM documents WHERE doc_id % 9 = 1
         |  UNION ALL
         |  SELECT doc_id + 2200000, reverse(text) FROM documents WHERE doc_id % 9 = 2),
         |${nearDedupCtesOver(
           "SELECT * FROM refc UNION ALL SELECT * FROM newc",
           "a.doc_id < 2000000 AND b.doc_id >= 2000000")}
         |SELECT doc_id FROM newc
         |WHERE doc_id NOT IN (SELECT id_b FROM verified)
         |ORDER BY doc_id""".stripMargin,

    "p42_curation_pipeline" -> {
      val gram6 = "tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]||' '||tk[i+5]"
      // MATERIALIZED on the multiply-referenced frames: base feeds
      // btoks+kc, btoks feeds flat + three gg arms — default inlining
      // re-tokenizes the corpus per reference (measured OOM under a
      // 3 GB DuckDB cap at sf0.01)
      s"""WITH base AS MATERIALIZED (
         |  SELECT doc_id, text FROM ($corpusSqlWithDups) WHERE doc_id % 3 = 1),
         |btoks AS MATERIALIZED (SELECT doc_id, $oToks AS tk FROM base),
         |flat AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,
         |  floor(CAST(list_reduce(list_transform(tk, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
         |    / len(tk) * 10000.0 + 0.5) / 10000.0 AS mean_len,
         |  CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in',
         |    'is','on','for','with','as','by','at','or'))) AS BIGINT) AS stop_hits
         |  FROM btoks),
         |gg AS (SELECT doc_id, 1 AS n, unnest(tk) AS g FROM btoks
         |  UNION ALL
         |  SELECT doc_id, 2, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) FROM btoks
         |  UNION ALL
         |  SELECT doc_id, 3, unnest([tk[i]||' '||tk[i+1]||' '||tk[i+2] FOR i IN range(1, len(tk) - 1)]) FROM btoks),
         |gc AS (SELECT doc_id, n, g, count(*) AS c FROM gg GROUP BY doc_id, n, g),
         |gs AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot, max(c) AS top,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
         |  FROM gc GROUP BY doc_id, n),
         |rep AS (SELECT doc_id,
         |  coalesce(max(CASE WHEN n = 1 THEN floor(top::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS topf,
         |  coalesce(max(CASE WHEN n = 2 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup2,
         |  coalesce(max(CASE WHEN n = 3 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup3
         |  FROM gs GROUP BY doc_id),
         |kept AS (SELECT f.doc_id FROM flat f JOIN rep r USING (doc_id)
         |  WHERE f.n_words >= 15 AND f.n_words <= 100000
         |    AND f.mean_len >= 3.0 AND f.mean_len <= 10.0 AND f.stop_hits >= 1
         |    AND r.topf <= 0.15 AND r.dup2 <= 0.15 AND r.dup3 <= 0.10),
         |kc AS MATERIALIZED (SELECT b.doc_id, b.text FROM base b JOIN kept USING (doc_id)),
         |etoks AS (SELECT $oToks AS tk FROM documents WHERE doc_id % 11 = 5),
         |eg AS (SELECT DISTINCT unnest([$gram6 FOR i IN range(1, len(tk) - 4)]) AS g FROM etoks),
         |cg AS (SELECT doc_id, unnest([$gram6 FOR i IN range(1, len(tk) - 4)]) AS g
         |  FROM (SELECT doc_id, $oToks AS tk FROM kc)),
         |cont AS (SELECT DISTINCT doc_id FROM cg WHERE g IN (SELECT g FROM eg)),
         |clean AS (SELECT doc_id, text FROM kc WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
         |${nearDedupCtesOver("SELECT doc_id, text FROM clean")},
         |survivors AS MATERIALIZED (
         |  SELECT doc_id, text FROM corpus
         |  WHERE doc_id NOT IN (SELECT id_b FROM verified)),
         |tr AS (SELECT doc_id, text FROM survivors
         |  WHERE ${oH("doc_id::VARCHAR || 'cur'")} % 10000 < 9000),
         |t AS (SELECT doc_id, CAST(len($oToks) AS BIGINT) AS cnt FROM tr),
         |w AS (SELECT doc_id, cnt,
         |  CAST(coalesce(sum(cnt) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef
         |  FROM t WHERE cnt > 0),
         |x AS (SELECT doc_id, cnt, bef,
         |  unnest(range(bef // 512, (bef + cnt - 1) // 512 + 1)) AS seq_id FROM w)
         |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(GREATEST(seq_id * 512 - bef, 0) AS BIGINT) AS tok_start,
         |  CAST(LEAST((seq_id + 1) * 512 - bef, cnt)
         |    - GREATEST(seq_id * 512 - bef, 0) AS BIGINT) AS tok_len,
         |  CAST(GREATEST(seq_id * 512, bef) - seq_id * 512 AS BIGINT) AS seq_offset
         |FROM x ORDER BY doc_id, seq_id""".stripMargin
    },

    // TIE-SAFE form (same fix as the s05 streaming oracle): collapse to
    // distinct (user, ts) BEFORE the windows — `lag` and the running
    // `sum` are two separate window sorts whose arbitrary tie orders can
    // split a duplicate-timestamp boundary group across sessions, while
    // Sessions.sessionize's two Spark windows share ONE window spec (one
    // sort, consistent tie order: the nw=1 row leads its tie group in the
    // same order the running sum consumes, so ties never split)
    "p41_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events
        |  WHERE ts IS NOT NULL),
        |d AS (SELECT user_id, ts, CAST(count(*) AS BIGINT) AS c,
        |  CAST(sum(v) AS BIGINT) AS sv FROM e GROUP BY 1, 2),
        |m AS (SELECT user_id, ts, c, sv,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w > 86400000000 THEN 1 ELSE 0 END AS nw
        |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, c, sv,
        |  sum(nw) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS sidx
        |  FROM m)
        |SELECT user_id AS key, CAST(sidx AS BIGINT) AS session_idx,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  CAST(sum(c) AS BIGINT) AS n_events, CAST(sum(sv) AS BIGINT) AS value_sum_e2
        |FROM s GROUP BY user_id, sidx ORDER BY key, session_idx""".stripMargin,

    "p73_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_e2, event_type FROM events),
        |u AS (
        |  SELECT user_id AS k, ts_us, 1 AS side, event_id AS seq,
        |    event_id, ts_us AS l_ts, NULL::BIGINT AS r_eid,
        |    NULL::BIGINT AS r_ts, NULL::BIGINT AS r_v
        |  FROM e WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts_us, 0, event_id,
        |    NULL::BIGINT, NULL::BIGINT, event_id, ts_us, v_e2
        |  FROM e WHERE event_type = 'click'),
        |m AS (SELECT *,
        |  last_value(r_eid IGNORE NULLS) OVER w AS click_event_id,
        |  last_value(r_ts IGNORE NULLS) OVER w AS click_ts_us,
        |  last_value(r_v IGNORE NULLS) OVER w AS click_value_e2
        |  FROM u WINDOW w AS (PARTITION BY k ORDER BY ts_us, side, seq
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, k AS user_id, l_ts AS ts_us, click_event_id,
        |  click_ts_us, click_value_e2, l_ts - click_ts_us AS wait_us
        |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin,

    // re-anchoring funnel semantics (exists-a-chain): a_i = latest
    // possible step-0 anchor of any chain to step i ending at each event
    // (max over STRICTLY earlier events — integer-ts RANGE 1 PRECEDING);
    // a step completes at the earliest event with ts <= a_i + span
    "p74_funnel" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS ts, event_type AS t FROM events),
        |w1 AS (SELECT k, ts, t, CASE WHEN t = 'signup' THEN ts END AS a0 FROM e),
        |w2 AS (SELECT k, ts, t, a0, CASE WHEN t = 'click' THEN
        |    max(a0) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a1 FROM w1),
        |w3 AS (SELECT k, ts, t, a0, a1, CASE WHEN t = 'purchase' THEN
        |    max(a1) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a2 FROM w2),
        |s AS (SELECT k,
        |  min(CASE WHEN a0 IS NOT NULL AND ts <= a0 + 604800000000 THEN ts END) AS t0,
        |  min(CASE WHEN a1 IS NOT NULL AND ts <= a1 + 604800000000 THEN ts END) AS t1,
        |  min(CASE WHEN a2 IS NOT NULL AND ts <= a2 + 604800000000 THEN ts END) AS t2
        |  FROM w3 GROUP BY k)
        |SELECT 0 AS step_idx, 'signup' AS step, count(t0)::BIGINT AS n_keys FROM s
        |UNION ALL SELECT 1, 'click', count(t1)::BIGINT FROM s
        |UNION ALL SELECT 2, 'purchase', count(t2)::BIGINT FROM s
        |ORDER BY step_idx""".stripMargin,

    "p78_funnel_steps" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS ts, event_type AS t FROM events),
        |w1 AS (SELECT k, ts, t, CASE WHEN t = 'signup' THEN ts END AS a0 FROM e),
        |w2 AS (SELECT k, ts, t, a0, CASE WHEN t = 'click' THEN
        |    max(a0) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a1 FROM w1),
        |w3 AS (SELECT k, ts, t, a0, a1, CASE WHEN t = 'purchase' THEN
        |    max(a1) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a2 FROM w2),
        |s AS (SELECT k,
        |  min(CASE WHEN a0 IS NOT NULL AND ts <= a0 + 604800000000 THEN ts END) AS t0,
        |  min(CASE WHEN a1 IS NOT NULL AND ts <= a1 + 604800000000 THEN ts END) AS t1,
        |  min(CASE WHEN a2 IS NOT NULL AND ts <= a2 + 604800000000 THEN ts END) AS t2
        |  FROM w3 GROUP BY k)
        |SELECT * FROM (
        |  SELECT k AS key, 0 AS step_idx, 'signup' AS step, t0 AS ts FROM s WHERE t0 IS NOT NULL
        |  UNION ALL
        |  SELECT k, 1, 'click', t1 FROM s WHERE t1 IS NOT NULL
        |  UNION ALL
        |  SELECT k, 2, 'purchase', t2 FROM s WHERE t2 IS NOT NULL)
        |ORDER BY key, step_idx""".stripMargin,

    "p75_cohort_retention" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT k, min(day) AS cohort_day FROM e GROUP BY k),
        |d AS (SELECT DISTINCT e.k, f.cohort_day, e.day - f.cohort_day AS day_offset
        |  FROM e JOIN f ON e.k = f.k)
        |SELECT cohort_day, day_offset, count(*)::BIGINT AS n_keys
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p87_props_extract" ->
      (SparkEntry.OracleMemGuard +
      """WITH e AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k FROM events)
        |SELECT event_type, k % 10 AS k_mod, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "p86_crawl_pipeline" ->
      (SparkEntry.OracleMemGuard +
      """WITH docs2 AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 = 0),
        |h AS (SELECT source,
        |  '<html><head><title>t</title><style>body{color:red}</style><script type="text/javascript">var x = "<p>decoy</p>";</script></head><body><!-- comment --><h1>Doc '
        |    || doc_id || '</h1><p>' || coalesce(text, '')
        |    || '</p><div>footer &amp; nav &lt;end&gt;</div></body></html>' AS s
        |  FROM docs2),
        |t1 AS (SELECT source, regexp_replace(s, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS s FROM h),
        |t2 AS (SELECT source, regexp_replace(s, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS s FROM t1),
        |t3 AS (SELECT source, regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g') AS s FROM t2),
        |t4 AS (SELECT source, regexp_replace(s,
        |  '(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br[^>]*>', chr(10), 'g') AS s FROM t3),
        |t5 AS (SELECT source, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s FROM t4),
        |e AS (SELECT source,
        |  replace(replace(replace(replace(replace(replace(s,
        |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&amp;', '&') AS s FROM t5),
        |w AS (SELECT source, regexp_replace(regexp_replace(
        |  regexp_replace(s, '[ \t\x0B\f\r]+', ' ', 'g'),
        |  '\s*\n\s*', chr(10), 'g'), '^\s+|\s+$', '', 'g') AS s FROM e),
        |tok AS (SELECT source, s,
        |  list_filter(string_split_regex(s, '\s+'), t -> t != '') AS tk FROM w),
        |st AS (SELECT source, s, CAST(len(tk) AS BIGINT) AS nw,
        |  CASE WHEN len(tk) = 0 THEN 0
        |       ELSE CAST(list_reduce(list_transform(tk, z -> len(z)), (a, b) -> a + b) AS BIGINT)
        |  END AS sl FROM tok),
        |k AS (SELECT source, s,
        |  (nw >= 30 AND sl >= nw * 3 AND sl <= nw * 10) AS keep FROM st)
        |SELECT source, count(*)::BIGINT AS n_records,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  count(DISTINCT CASE WHEN keep THEN md5(s) END)::BIGINT AS n_unique
        |FROM k GROUP BY source ORDER BY source""".stripMargin),

    "p85_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>t</title><style>body{color:red}</style><script type="text/javascript">var x = "<p>decoy</p>";</script></head><body><!-- comment --><h1>Doc '
        |    || doc_id || '</h1><p>' || coalesce(text, '')
        |    || '</p><div>footer &amp; nav &lt;end&gt;</div></body></html>' AS s
        |  FROM documents),
        |t1 AS (SELECT doc_id, regexp_replace(s, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS s FROM h),
        |t2 AS (SELECT doc_id, regexp_replace(s, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS s FROM t1),
        |t3 AS (SELECT doc_id, regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g') AS s FROM t2),
        |t4 AS (SELECT doc_id, regexp_replace(s,
        |  '(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br[^>]*>', chr(10), 'g') AS s FROM t3),
        |t5 AS (SELECT doc_id, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s FROM t4),
        |e AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(s,
        |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&amp;', '&') AS s FROM t5),
        |w AS (SELECT doc_id, regexp_replace(regexp_replace(
        |  regexp_replace(s, '[ \t\x0B\f\r]+', ' ', 'g'),
        |  '\s*\n\s*', chr(10), 'g'), '^\s+|\s+$', '', 'g') AS s FROM e)
        |SELECT doc_id, md5(s) AS clean_md5, CAST(length(s) AS BIGINT) AS n_chars
        |FROM w ORDER BY doc_id""".stripMargin,

    "p100_warc_gz_roundtrip" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS content_length,
        |  md5(coalesce(text, '')) AS payload_md5,
        |  'response' AS record_type,
        |  'urn:md5:' || md5('http://corpus/' || source || '/' || doc_id) AS record_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p84_warc_roundtrip" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS content_length,
        |  md5(coalesce(text, '')) AS payload_md5,
        |  'response' AS record_type,
        |  'urn:md5:' || md5('http://corpus/' || source || '/' || doc_id) AS record_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p83_event_features" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts, event_type AS t,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events),
        |u AS (
        |  SELECT user_id AS k, ts, 1 AS side, event_id AS seq,
        |    event_id, ts AS l_ts, NULL::BIGINT AS r_eid, NULL::BIGINT AS r_ts
        |  FROM e WHERE t = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, 0, event_id, NULL::BIGINT, NULL::BIGINT, event_id, ts
        |  FROM e WHERE t = 'click'),
        |m AS (SELECT *,
        |  last_value(r_eid IGNORE NULLS) OVER w AS click_event_id,
        |  last_value(r_ts IGNORE NULLS) OVER w AS click_ts
        |  FROM u WINDOW w AS (PARTITION BY k ORDER BY ts, side, seq
        |    ROWS UNBOUNDED PRECEDING)),
        |aj AS (SELECT event_id, click_event_id, l_ts - click_ts AS wait_us
        |  FROM m WHERE side = 1),
        |roll AS (SELECT event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_trailing,
        |  CAST(sum(v) OVER w AS BIGINT) AS sum_trailing_e2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)),
        |w1 AS (SELECT user_id AS k, ts, t, CASE WHEN t = 'signup' THEN ts END AS a0 FROM e),
        |w2 AS (SELECT k, ts, t, a0, CASE WHEN t = 'click' THEN
        |    max(a0) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a1 FROM w1),
        |w3 AS (SELECT k, ts, a0, a1, CASE WHEN t = 'purchase' THEN
        |    max(a1) OVER (PARTITION BY k ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS a2 FROM w2),
        |st AS (SELECT k, CAST(CASE
        |    WHEN count(CASE WHEN a2 IS NOT NULL AND ts <= a2 + 604800000000 THEN 1 END) > 0 THEN 2
        |    WHEN count(CASE WHEN a1 IS NOT NULL AND ts <= a1 + 604800000000 THEN 1 END) > 0 THEN 1
        |    WHEN count(a0) > 0 THEN 0 ELSE -1 END AS BIGINT) AS funnel_stage
        |  FROM w3 GROUP BY k),
        |f AS (SELECT user_id, min(ts // 86400000000) AS cohort_day FROM e GROUP BY 1)
        |SELECT p.event_id, p.user_id, p.ts AS ts_us, a.click_event_id, a.wait_us,
        |  r.n_trailing, r.sum_trailing_e2, st.funnel_stage, f.cohort_day
        |FROM e p
        |JOIN aj a ON a.event_id = p.event_id
        |JOIN roll r ON r.event_id = p.event_id
        |JOIN st ON st.k = p.user_id
        |JOIN f ON f.user_id = p.user_id
        |WHERE p.t = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    "p82_rolling_stats" ->
      """WITH e AS (SELECT user_id AS key, epoch_us(ts) AS ts, event_id AS seq,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events)
        |SELECT key, ts, seq,
        |  CAST(count(*) OVER w AS BIGINT) AS n_trailing,
        |  CAST(sum(v) OVER w AS BIGINT) AS sum_trailing_e2
        |FROM e WINDOW w AS (PARTITION BY key ORDER BY ts
        |  RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)
        |ORDER BY seq""".stripMargin,

    "p109_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($oToks) AS token FROM documents),
         |t AS (SELECT token FROM tk WHERE token != ''),
         |n AS (SELECT count(*)::BIGINT AS n_total FROM t)
         |SELECT token, count(*)::BIGINT AS n_occurrences, n_total
         |FROM t, n GROUP BY token, n_total
         |HAVING count(*) * 1000 >= n_total * 4
         |ORDER BY n_occurrences DESC, token""".stripMargin,

    "p108_apply_changes" ->
      """WITH ch AS (
        |  SELECT doc_id, 'upsert' AS op, text || ' v2' AS text, 2 AS v
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id, 'delete', NULL, 2
        |  FROM documents WHERE doc_id % 11 = 3 AND doc_id % 5 != 0
        |  UNION ALL SELECT doc_id + 10000000, 'upsert', 'new ' || text, 2
        |  FROM documents WHERE doc_id % 13 = 1),
        |u AS (SELECT doc_id, 0::BIGINT AS v, 'base' AS op, text, 0 AS pref FROM documents
        |  UNION ALL SELECT doc_id, v::BIGINT, op, text, 1 FROM ch),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, pref DESC, op DESC, text DESC) AS rn
        |  FROM u)
        |SELECT doc_id, md5(coalesce(text, '')) AS text_md5, v AS version, op AS last_op
        |FROM r WHERE rn = 1 AND op != 'delete' ORDER BY doc_id""".stripMargin,

    "p107_rate_anomaly" ->
      """WITH e AS (SELECT epoch_us(ts) AS ts, event_type AS grp FROM events),
        |c AS (SELECT (ts - ((ts % 7200000000 + 7200000000) % 7200000000)) AS window_start, grp,
        |    count(*)::BIGINT AS n_events
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT window_start, grp, n_events,
        |  CAST(coalesce(sum(n_events) OVER (PARTITION BY grp ORDER BY window_start
        |    RANGE BETWEEN 21600000000 PRECEDING AND 7200000000 PRECEDING), 0) AS BIGINT) AS prev_sum,
        |  CAST(count(*) OVER (PARTITION BY grp ORDER BY window_start
        |    RANGE BETWEEN 21600000000 PRECEDING AND 7200000000 PRECEDING) AS BIGINT) AS prev_cnt
        |  FROM c)
        |SELECT window_start, grp AS "group", n_events, prev_sum, prev_cnt,
        |  CAST(CASE WHEN prev_cnt > 0 AND n_events * prev_cnt * 2 > prev_sum * 3
        |       THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM w ORDER BY window_start, "group" """.stripMargin,

    "p76_hopping_stats" ->
      """WITH e AS (SELECT epoch_us(ts) AS ts, event_type AS grp,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events),
        |x AS (SELECT (ts - ((ts % 7200000000 + 7200000000) % 7200000000)) - k.k * 7200000000 AS window_start, grp, v
        |  FROM e CROSS JOIN (SELECT unnest(range(3)) AS k) k)
        |SELECT window_start, grp AS "group", CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v) AS BIGINT) AS value_sum_e2
        |FROM x WHERE window_start >= 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p79_kmv_vocab" ->
      s"""WITH tk AS (SELECT lang, unnest(list_filter($oToks, t -> t != '')) AS t FROM documents),
         |h AS (SELECT lang, t, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tk),
         |nr AS (SELECT lang, count(*)::BIGINT AS n_rows FROM tk GROUP BY lang),
         |dh AS (SELECT DISTINCT lang, h FROM h),
         |rk AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM dh),
         |agg AS (SELECT lang, count(*)::BIGINT AS nd,
         |    max(CASE WHEN rn = 256 THEN h END) AS kth FROM rk GROUP BY lang),
         |ex AS (SELECT lang, count(DISTINCT t)::BIGINT AS distinct_exact FROM tk GROUP BY lang)
         |SELECT nr.lang, nr.n_rows,
         |  CASE WHEN agg.nd < 256 THEN agg.nd
         |       ELSE CAST(floor(255.0 * 1152921504606846976.0 / kth::DOUBLE) AS BIGINT)
         |  END AS distinct_est,
         |  ex.distinct_exact
         |FROM nr JOIN agg USING (lang) JOIN ex USING (lang) ORDER BY lang""".stripMargin,

    "p77_classifier_train" ->
      s"""WITH tka AS (SELECT doc_id,
         |    list_filter($oToks, t -> t != '') AS tk FROM documents),
         |fts AS (SELECT doc_id, unnest(list_concat(tk,
         |    [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])) AS f FROM tka),
         |yy AS (SELECT doc_id, CASE WHEN text LIKE '%vector%' THEN 1 ELSE 0 END AS y FROM documents),
         |fc AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS b,
         |    count(*)::BIGINT AS c FROM fts GROUP BY 1, 2),
         |fn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM fc GROUP BY 1),
         |nd AS (SELECT count(*)::BIGINT AS nd FROM fn),
         |g1 AS (SELECT b, CAST(sum((500000 - yy.y * 1000000) * c) AS BIGINT) AS g
         |  FROM fc JOIN yy USING (doc_id) GROUP BY b),
         |w1 AS (SELECT b, CAST(-floor(g::DOUBLE / (2.0 * nd)) AS BIGINT) AS w FROM g1, nd),
         |s2 AS (SELECT fc.doc_id, CAST(sum(c * coalesce(w1.w, 0)) AS BIGINT) AS s
         |  FROM fc LEFT JOIN w1 USING (b) GROUP BY fc.doc_id),
         |p2 AS (SELECT doc_id, CAST(floor(1.0 / (1.0 + exp(-(s::DOUBLE
         |    / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT) AS p FROM s2),
         |g2 AS (SELECT b, CAST(sum((p - yy.y * 1000000) * c) AS BIGINT) AS g
         |  FROM fc JOIN p2 USING (doc_id) JOIN yy USING (doc_id) GROUP BY b),
         |w2 AS (SELECT b, CAST(coalesce(w1.w, 0) - floor(g2.g::DOUBLE / (2.0 * nd)) AS BIGINT) AS w
         |  FROM g2 LEFT JOIN w1 USING (b), nd),
         |s3 AS (SELECT fc.doc_id, CAST(sum(c * coalesce(w2.w, 0)) AS BIGINT) AS s
         |  FROM fc LEFT JOIN w2 USING (b) GROUP BY fc.doc_id),
         |p3 AS (SELECT doc_id, CAST(floor(1.0 / (1.0 + exp(-(s::DOUBLE
         |    / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT) AS p FROM s3),
         |g3 AS (SELECT b, CAST(sum((p - yy.y * 1000000) * c) AS BIGINT) AS g
         |  FROM fc JOIN p3 USING (doc_id) JOIN yy USING (doc_id) GROUP BY b),
         |w3 AS (SELECT b, CAST(coalesce(w2.w, 0) - floor(g3.g::DOUBLE / (2.0 * nd)) AS BIGINT) AS w
         |  FROM g3 LEFT JOIN w2 USING (b), nd),
         |sf AS (SELECT fc.doc_id, CAST(sum(c * coalesce(w3.w, 0)) AS BIGINT) AS s
         |  FROM fc LEFT JOIN w3 USING (b) GROUP BY fc.doc_id),
         |sc AS (SELECT doc_id, floor(1.0 / (1.0 + exp(-(s::DOUBLE
         |    / 1000000.0))) * 10000.0 + 0.5) / 10000.0 AS score FROM sf)
         |SELECT d.doc_id, yy.y::BIGINT AS y, coalesce(fn.n, 0)::BIGINT AS n_features,
         |  coalesce(sc.score, 0.5) AS score,
         |  CASE WHEN coalesce(sc.score, 0.5) >= 0.5 THEN 'keep' ELSE 'drop' END AS label
         |FROM documents d JOIN yy ON d.doc_id = yy.doc_id
         |LEFT JOIN fn ON d.doc_id = fn.doc_id
         |LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "p40_gopher_filter" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS tk FROM documents),
         |flat AS (SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_words,
         |  floor(CAST(list_reduce(list_transform(tk, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
         |    / len(tk) * 10000.0 + 0.5) / 10000.0 AS mean_len,
         |  CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','of','to','in',
         |    'is','on','for','with','as','by','at','or'))) AS BIGINT) AS stop_hits
         |  FROM toks),
         |g AS (SELECT doc_id, 1 AS n, unnest(tk) AS g FROM toks
         |  UNION ALL
         |  SELECT doc_id, 2, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) FROM toks
         |  UNION ALL
         |  SELECT doc_id, 3, unnest([tk[i]||' '||tk[i+1]||' '||tk[i+2] FOR i IN range(1, len(tk) - 1)]) FROM toks),
         |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY doc_id, n, g),
         |s AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot, max(c) AS top,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
         |  FROM c GROUP BY doc_id, n),
         |rep AS (SELECT doc_id,
         |  coalesce(max(CASE WHEN n = 1 THEN floor(top::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS topf,
         |  coalesce(max(CASE WHEN n = 2 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup2,
         |  coalesce(max(CASE WHEN n = 3 THEN floor(dup::DOUBLE / tot::DOUBLE * 10000.0 + 0.5) / 10000.0 END), 0.0) AS dup3
         |  FROM s GROUP BY doc_id)
         |SELECT f.doc_id,
         |  (f.n_words >= 25 AND f.n_words <= 100000) AS words_ok,
         |  (f.mean_len >= 3.0 AND f.mean_len <= 10.0) AS word_len_ok,
         |  (f.stop_hits >= 2) AS stopword_ok,
         |  (r.topf <= 0.125) AS top_word_ok,
         |  (r.dup2 <= 0.10 AND r.dup3 <= 0.05) AS repetition_ok,
         |  ((f.n_words >= 25 AND f.n_words <= 100000) AND (f.mean_len >= 3.0 AND f.mean_len <= 10.0)
         |    AND (f.stop_hits >= 2) AND (r.topf <= 0.125)
         |    AND (r.dup2 <= 0.10 AND r.dup3 <= 0.05)) AS keep
         |FROM flat f JOIN rep r ON r.doc_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin
  )
}
