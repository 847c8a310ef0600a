package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer TRAINING at corpus scale — the
 * "train a tokenizer on the crawl" step of an LLM data pipeline
 * (Sennrich et al. 2016, arXiv:1508.07909; the GPT-2/sentencepiece
 * pre-tokenized variant that trains on word frequencies).
 *
 * Scale shape: the corpus is scanned ONCE into a `(word, count)`
 * frame — Heaps'-law-bounded (a 100 TB crawl has ~10⁷ distinct words,
 * not 10¹² tokens) — and every merge iteration runs on that compact
 * vocab frame only: one pair-explode + map-side-combined count, one
 * `LIMIT 1` all-reduce for the arg-max pair, one literal-replace
 * projection to apply the merge. The corpus itself is never touched
 * again; nothing corpus-sized ever shuffles. (For production merge
 * counts — 30k-100k — batch each round's top-k symbol-disjoint pairs
 * into one pass; the per-round plan is identical, only the driver
 * loop shortens. The sequential form here is the exactly-replayable
 * reference semantics.)
 *
 * Exact-replay discipline: a merge of pair (l, r) must replace
 * adjacent occurrences LEFT-TO-RIGHT, NON-OVERLAPPING — the classic
 * BPE apply order. On a space-separated symbol string that is exactly
 * one literal `replace` — provided consecutive matches don't compete
 * for a shared separator, which the double-space trick guarantees:
 * double every separator, replace `␣l␣␣r␣` with `␣lr␣` (each match
 * owns a full space on each side), halve separators back. All three
 * steps are plain `replace`, identical semantics in Spark and DuckDB,
 * so the oracle replays training verbatim. Arg-max ties break on
 * (count desc, l asc, r asc) — binary string order in both engines.
 */
object Bpe {

  /** One learned merge: `rank`-th iteration chose (`l`,`r`) → `l+r`,
    * which occurred `pairCount` times (adjacent, pre-merge, overlaps
    * counted) across the weighted vocab. */
  final case class Merge(rank: Int, l: String, r: String, pairCount: Long)

  /** Result: the merge list (driver-held, it IS the tokenizer model)
    * and the final vocab frame `(w, s, cnt)` — each distinct corpus
    * word with its space-separated symbol string after all merges. */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** Corpus scan → `(w, cnt)` word-frequency frame (the only
    * corpus-sized job in training). */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextOps.cleanTokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Initial symbol string for a word: every char a symbol, padded —
    * `"ab"` → `" a b "`. Symbols never contain spaces, so the padded
    * string is an unambiguous symbol-sequence encoding. */
  private def charSplit(w: Column): Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1 "))

  /** Adjacent symbol pairs of a padded symbol string, as
    * `struct(l, r)` — one element per adjacency, overlaps included
    * (the pair-count convention of the reference BPE trainer). */
  private def adjacentPairs(s: Column): Column = {
    val a = split(trim(s), " ")
    transform(slice(a, lit(1), size(a) - 1),
      (x, i) => struct(x.as("l"), element_at(a, i + lit(2)).as("r")))
  }

  /** Apply merge (l, r) → lr to a padded symbol string, left-to-right
    * non-overlapping (see the class doc for why this is exact). */
  def applyMerge(s: Column, l: String, r: String): Column =
    replace(
      replace(
        replace(s, lit(" "), lit("  ")),
        lit(s" $l  $r "), lit(s" ${l}${r} ")),
      lit("  "), lit(" "))

  /**
   * Train `nMerges` BPE merges on a `(w, cnt)` word-frequency frame.
   * Driver loop: each iteration collects exactly ONE row (the arg-max
   * pair) and extends the vocab plan by one codegen'd projection; the
   * vocab is locally checkpointed each round to keep lineage flat.
   * Stops early if no adjacent pair remains (fully merged vocab).
   */
  def train(wordCounts: DataFrame, nMerges: Int): Model = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = wordCounts
      .select(col("w"), charSplit(col("w")).as("s"), col("cnt"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best: Array[Row] = vocab
        .select(explode(adjacentPairs(col("s"))).as("pr"), col("cnt"))
        .groupBy(col("pr.l"), col("pr.r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, pc)
        vocab = vocab
          .select(col("w"), applyMerge(col("s"), l, r).as("s"), col("cnt"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    Model(merges.result(), vocab)
  }

  /** The merge list as a frame: `(merge_rank, lhs, rhs, merged,
    * pair_count)`. */
  def mergesFrame(df: DataFrame, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    model.merges
      .map(m => (m.rank.toLong, m.l, m.r, m.l + m.r, m.pairCount))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /**
   * Encode documents with a trained model: per-document word and
   * BPE-token counts. The vocab frame already holds every distinct
   * corpus word's merged form, so encoding is a broadcast join of the
   * exploded word stream against `(w, n_symbols)` — tokenizing 100 TB
   * with a trained model is one map-side join, no re-derivation.
   */
  def encodeCounts(df: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val nSym = model.vocab
      .select(col("w"), size(split(trim(col("s")), " ")).cast("long").as("n_sym"))
    df.select(id.cast("long").as("doc_id"), explode(TextOps.cleanTokens(text)).as("w"))
      .join(broadcast(nSym), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }
}
