package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus ranking for training-data curation (engine extension): BM25
 * relevance of every document against a fixed term set — the standard
 * retrieval score used to mine domain-relevant subsets out of a web-scale
 * corpus ("give me the docs that look like math/code/medical text").
 *
 * Scale design: one corpus-statistics aggregate (N, Σdl, per-term df —
 * map-side partials, a few-byte result) broadcast back over the corpus,
 * then a pure per-row projection. No per-term shuffle, no inverted index —
 * at 100 TB the corpus pass is the scan you were already paying.
 */
object Ranking {

  /** Okapi BM25 with the conventional k1/b defaults. Output: (doc_id,
    * bm25) — quantized to the 1e-4 lattice (see quantize4 note).
    *
    * Oracle-exactness: idf = ln((N - df + ½)/(df + ½) + 1) is the one
    * transcendental; libm `ln` may differ by 1 ulp between engines, so the
    * idf is floor-quantized to 1e-4 FIRST — on the integer (N, df) input
    * lattice the quantized value is engine-identical (verified
    * exhaustively for every df at N = 500 / 5 000 / 50 000). Everything
    * downstream is plain IEEE arithmetic in fixed evaluation order. */
  def bm25(df: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val (joined, termScore) = bm25Scaffold(df, id, text, terms, k1, b)
    val score = terms.indices.map(termScore).reduce(_ + _) // fixed left-assoc order
    joined.select(col("doc_id"), Similarity.quantize4(score).as("bm25"))
  }

  /** Shared BM25 scaffolding for [[bm25]]/[[domainTag]]/
    * [[retrievalMetrics]] — the one place the engine-exactness
    * conventions (quantized idf, fixed-order arithmetic) live:
    * ALL term frequencies in ONE codegen'd pass over the token array
    * (TermCounts — the composed per-term size(filter(..)) re-walks the
    * whole document K times with an interpreted lambda per element),
    * then ONE corpus aggregate (doc count, exact-long Σdl, per-term
    * df) broadcast back over the frame. Returns the scored-input frame
    * (doc_id, __dl, __tf*, stats columns) and the per-term-index BM25
    * score expression builder. */
  private def bm25Scaffold(df: DataFrame, id: Column, text: Column,
      terms: Seq[String], k1: Double, b: Double): (DataFrame, Int => Column) = {
    val base = df.select(id.as("doc_id"), TextOps.tokens(text).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
      .withColumn("__tc", graft.functions.term_counts(col("__toks"), terms))
    val tfCols = terms.indices.map(i => col("__tc").getItem(i).as(s"__tf$i"))
    val withTf = base.select((col("doc_id") +: col("__dl") +: tfCols): _*)
    val aggExprs = count(lit(1)).as("__N") +: sum(col("__dl")).as("__sumdl") +:
      terms.indices.map(i => sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(aggExprs.head, aggExprs.tail: _*)
    val joined = withTf.crossJoin(broadcast(stats))
    val nD = col("__N").cast("double")
    val avgdl = col("__sumdl").cast("double") / nD
    def termScore(i: Int): Column = {
      val dfD = col(s"__df$i").cast("double")
      val idfQ = floor(log((nD - dfD + 0.5) / (dfD + 0.5) + 1.0) * 10000.0 + 0.5) / 10000.0
      val tf = col(s"__tf$i").cast("double")
      val dl = col("__dl").cast("double")
      idfQ * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }
    (joined, termScore)
  }

  /** Domain tagging: BM25-score every document against K named term sets
    * in ONE corpus pass (all domains' term frequencies and document
    * frequencies ride the same aggregate) and assign the argmax domain —
    * declaration-order tiebreak, `und` when every domain scores 0. The
    * router feeding per-domain mixing/curation ("is this math, code, or
    * medical text?").
    *
    * Same engine-exactness as [[bm25]]: quantized idf on the integer
    * lattice, fixed-order arithmetic, quantized scores compared with a
    * strict `>` fold. */
  def domainTag(df: DataFrame, id: Column, text: Column,
      domains: Seq[(String, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(domains.nonEmpty && domains.forall(_._2.nonEmpty), "need non-empty domains")
    val terms = domains.flatMap(_._2).distinct
    // all domains' tf/df ride ONE scaffold pass and one aggregate
    val (joined, termScore) = bm25Scaffold(df, id, text, terms, k1, b)
    val idx = terms.zipWithIndex.toMap
    val domainScores = domains.map { case (name, ts) =>
      name -> Similarity.quantize4(ts.map(t => termScore(idx(t))).reduce(_ + _))
    }
    // materialize each domain score as a column BEFORE the argmax fold:
    // folding over the raw score expressions embeds every score tree
    // twice per level (2^K expression growth — Catalyst analysis, not
    // execution, becomes the cost); folding over attribute refs is linear
    val scored = joined.select(
      col("doc_id") +: domainScores.zipWithIndex.map { case ((_, sc), i) => sc.as(s"__s$i") }: _*)
    val (bestName, bestScore) = domains.map(_._1).zipWithIndex.tail.foldLeft(
      (lit(domains.head._1), col("__s0"))) {
      case ((bn, bs), (n, i)) =>
        val sc = col(s"__s$i")
        (when(sc > bs, lit(n)).otherwise(bn), when(sc > bs, sc).otherwise(bs))
    }
    scored.select(col("doc_id"),
      when(bestScore > 0.0, bestName).otherwise(lit("und")).as("domain"),
      bestScore.as("score"))
  }

  /** Hybrid retrieval: fuse lexical BM25 with embedding cosine —
    * `fused = quantize4(alpha * bm25 + (1 - alpha) * cosine)` — and rank
    * the top `k`. The modern IR shape (sparse + dense), here for corpus
    * mining: "docs that look like these terms AND sit near this vector".
    *
    * Scale shape: BM25 is the corpus-stats broadcast + projection above;
    * the cosine adds one broadcast of the single query vector; the join
    * with the embedding table is the only corpus-keyed exchange and the
    * top-k is a TakeOrdered, never a global sort. Both components are
    * lattice-quantized BEFORE fusion, so the fused score (plain IEEE
    * arithmetic on quantized inputs) stays engine-exact and the rank
    * order is reproducible anywhere.
    *
    * Contracts, stated: a zero-norm embedding (or query vector) scores
    * cosine 0.0 — the 0/0 NaN would otherwise quantize differently per
    * engine; and the fusion join is INNER on doc_id, so a document
    * missing from `embs` cannot rank — callers own the completeness of
    * the embedding table (an outer join defaulting cos would silently
    * rank half-scored docs, which is worse than absence). */
  def hybridTopK(docs: DataFrame, id: Column, text: Column,
      embs: DataFrame, vecId: Column, vec: Column,
      terms: Seq[String], queryVec: DataFrame, alpha: Double, k: Int): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    val lex = bm25(docs, id, text, terms)
    val qv = queryVec.select(vec.cast("array<double>").as("__qv"))
      .withColumn("__qn", Similarity.l2Norm(col("__qv")))
    val dense = embs.select(vecId.as("doc_id"), vec.cast("array<double>").as("__v"))
      .crossJoin(broadcast(qv))
      .withColumn("__den", Similarity.l2Norm(col("__v")) * col("__qn"))
      .select(col("doc_id"),
        when(col("__den") > 0.0, Similarity.quantize4(
          Similarity.dot(col("__v"), col("__qv")) / col("__den")))
          .otherwise(lit(0.0)).as("cos"))
    lex.join(dense, "doc_id")
      .withColumn("fused",
        Similarity.quantize4(col("bm25") * alpha + col("cos") * lit(1.0 - alpha)))
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(k)
  }

  /**
   * Retrieval evaluation: per query, recall@k and MRR@k of the BM25
   * ranker against conjunctive-match relevance (a document is relevant
   * iff it contains EVERY query term) — the eval harness of a
   * RAG/retrieval pipeline, with metrics on the e6 integer lattice
   * (`recall = hits·1e6 div n_rel`, `mrr = 1e6 div first_hit_rank`,
   * 0 when undefined) so they replay exactly in any engine.
   *
   * Scale shape per query: one BM25 pass (one corpus aggregate, see
   * [[bm25]]), a top-k via orderBy+limit — Spark plans
   * TakeOrderedAndProject, map-side partial top-k, NO full sort — and
   * three small aggregates on the k-row / relevant frames. Queries
   * union independent plans, so a 100-query eval fans out as 100
   * independent jobs over the same cached corpus.
   */
  def retrievalMetrics(df: DataFrame, id: Column, text: Column,
      queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty && k >= 1)
    import org.apache.spark.sql.expressions.Window
    queries.map { case (qid, terms) =>
      // ONE corpus pass serves both the score and the relevance
      // predicate (the __tf columns are the conjunctive-match test);
      // the barrier stops top-k and relevance re-deriving the scan
      val (joined, termScore) = bm25Scaffold(df, id, text, terms, 1.2, 0.75)
      val score = terms.indices.map(termScore).reduce(_ + _)
      val frame = graft.util.Barriers.statSafe(joined.select(col("doc_id"),
        Similarity.quantize4(score).as("bm25"),
        terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ && _).as("__rel")))
      val topk = frame.orderBy(col("bm25").desc, col("doc_id")).limit(k)
        .withColumn("rk",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
            .cast("long"))
      val rel = frame.filter(col("__rel")).select(col("doc_id"))
      val nRel = rel.agg(count(lit(1)).as("n_rel"))
      val hits = topk.join(rel, Seq("doc_id"))
        .agg(count(lit(1)).as("rel_at_k"), min(col("rk")).as("__first"))
      nRel.crossJoin(hits).select(
        lit(qid).as("query_id"), col("n_rel"),
        col("rel_at_k"),
        when(col("n_rel") > 0, expr("(rel_at_k * 1000000) div n_rel"))
          .otherwise(lit(0L)).as("recall_e6"),
        when(col("__first").isNotNull, expr("1000000 div __first"))
          .otherwise(lit(0L)).as("mrr_e6"))
    }.reduce(_ unionAll _)
  }
}
