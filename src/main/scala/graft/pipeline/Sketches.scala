package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{collect_min_k, freq_sketch_k}

/**
 * Mergeable sketches for corpus statistics. First resident: the KMV
 * (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002,
 * "Counting distinct elements in a data stream"; Beyer et al. 2007 (the
 * unbiased (k-1)/U_(k) estimator used here).
 *
 * Why not Spark's built-in `approx_count_distinct`: HLL++ registers are
 * not replayable in another engine, so it cannot be oracle-checked. KMV
 * is DETERMINISTIC given the hash: the sketch is literally "the k
 * smallest distinct 60-bit md5 values", so DuckDB reproduces the exact
 * same estimate from the same rows — approximate in accuracy, exact in
 * replay. Estimate error is ~1/sqrt(k-2) relative (6% at k=256).
 *
 * Scale design: the sketch rides [[graft.expr.CollectMinK]] — per-group
 * state is O(k) BY CONSTRUCTION and map-side partials shrink every
 * partition's contribution to k before the shuffle, so a group with a
 * billion distinct members shuffles partitions×k longs, never the
 * members. That is the whole point versus exact `count(DISTINCT x)`,
 * whose expand-shuffle is corpus-sized: vocabulary tracking over 100 TB
 * per (lang, domain) stratum becomes a few KB per stratum. Sketches of
 * disjoint scans merge by unioning min-k sets (the same aggregate), so
 * per-day sketches roll up to per-month without rescanning.
 */
object Sketches {

  /** 2^60 as a double — the KMV hash space size ([[TextOps.md5Long]] is
    * 60-bit). Exactly representable; both engines compute the same
    * double product/quotient bits from it. */
  private val HashSpace: Double = 1152921504606846976.0

  /** KMV estimate column from a sorted-ascending distinct min-k hash
    * array (the [[graft.functions.collect_min_k]] result): exact size
    * when the group held fewer than k distinct values, else
    * `floor((k-1) * 2^60 / kth_min)`. */
  def kmvEstimate(minK: Column, k: Int): Column =
    when(size(minK) < k, size(minK).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpace)
        / element_at(minK, k).cast("double")).cast("long"))

  /**
   * Approximate distinct `value`s per group: one row per group with
   * `n_rows` (exact row count) and `distinct_est` (KMV estimate).
   * One hash aggregate, O(k) state per group.
   */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        collect_min_k(TextOps.md5Long(value), k).as("__mk"))
      .withColumn("distinct_est", kmvEstimate(col("__mk"), k))
      .drop("__mk")
  }

  /**
   * Deterministic uniform k-sample by bottom-k hashing: the k rows
   * whose salted id hash ranks smallest under (hash, id) — a uniform
   * random sample GIVEN the hash, so the selection is exactly
   * replayable in any engine (and stable across reruns: the sample of
   * yesterday's corpus is a subset-rule, not a seed).
   *
   * Why not `ORDER BY rand() LIMIT k`: that is a global sort of the
   * corpus (and not replayable). Here the ids ride
   * [[graft.expr.CollectMinK]] — ONE pass with O(k) state per
   * partition, partials bound the shuffle at partitions×k — and the
   * sampled rows come back via a k-row broadcast semi-join. Total
   * cost at 100 TB: one scan plus a 256-id broadcast.
   *
   * `id` must be unique per row (the (hash, id) rank makes collisions
   * harmless but duplicate ids would double-select). NULL-id rows are
   * DROPPED: the id is the replay key, and a null one would produce a
   * null hash that sorts nulls-FIRST into the min-k buffer yet can
   * never equi-join back — each such row would silently burn a sample
   * slot, shrinking the returned sample below k.
   */
  def bottomKSample(df: DataFrame, id: Column, k: Int,
      salt: String = "bk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val withH = df.withColumn("__bkid", id.cast("long"))
      .filter(col("__bkid").isNotNull)
      .withColumn("__bkh",
        TextOps.md5Long(concat(col("__bkid").cast("string"), lit(salt))))
    val ids = withH
      .agg(collect_min_k(struct(col("__bkh"), col("__bkid")), k).as("mk"))
      .select(explode(col("mk")).as("m"))
      .select(col("m.__bkid").as("__sel"))
    withH.join(broadcast(ids), col("__bkid") === col("__sel"))
      .drop("__bkid", "__bkh", "__sel")
  }

  /**
   * Weighted k-sample WITHOUT replacement by exponential clocks
   * (Efraimidis & Spirakis 2006): row i gets clock
   * `key_i = -ln(u_i)/w_i` from its salted id hash
   * `u_i = (h+1)/2^60 ∈ (0,1]`, and the k smallest clocks are the
   * sample — inclusion probability follows the weights, replayable
   * given the hash (importance-weighted corpus subsampling: longer /
   * higher-quality documents proportionally more likely).
   *
   * Engine-exactness: the one transcendental is quantized to the e6
   * lattice immediately (clock range is [0, ~41.5/w_min] — a 1e-6
   * quantum is ~10⁷ ulps wide there, so a 1-ulp libm difference flips
   * a key only when the clock lands within 1 ulp of a quantum
   * boundary, ~1e-8 per row; a flip matters only at the k-th rank
   * boundary — vanishingly unlikely, not impossible); rank ties break
   * on (key, id). Same O(k)-state CollectMinK shape as
   * [[bottomKSample]]: one pass, partials bound the shuffle, k-row
   * broadcast join-back.
   *
   * Rows with non-positive weight are DROPPED (a zero weight is an
   * infinite clock — never sampled — and the Inf would trip the ANSI
   * long cast); `id` unique per row. NULL-id rows are DROPPED for the
   * same reason as [[bottomKSample]]: a null clock key sorts
   * nulls-first into the buffer but can never equi-join back — a
   * silently burned sample slot.
   */
  def weightedBottomKSample(df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = "wk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val withK = df.withColumn("__wkid", id.cast("long"))
      .filter(col("__wkid").isNotNull && weight.cast("double") > 0.0)
      .withColumn("__wkey", esClockKeyE6(col("__wkid"), weight, salt))
    val ids = withK
      .agg(collect_min_k(struct(col("__wkey"), col("__wkid")), k).as("mk"))
      .select(explode(col("mk")).as("m"))
      .select(col("m.__wkid").as("__sel"))
    withK.join(broadcast(ids), col("__wkid") === col("__sel"))
      .drop("__wkid", "__sel")
      .withColumnRenamed("__wkey", "sample_key_e6")
  }

  /** Clock values above this clamp all map to the same max key: the e6
    * quantization must survive the ANSI long cast (9e12 * 1e6 < 2^63),
    * and a clock this large means weight < ~5e-12 — rows that can never
    * win a realistic sample anyway; among clamped rows the (key, id)
    * tiebreak decides, documented. */
  private val MaxClock: Double = 9.0e12

  /** The exponential-clock key, e6-quantized — the ONE definition both
    * the batch sample and its streaming twin hash from (a long-cast
    * id; hashing a raw non-bigint id column would silently break
    * batch/stream parity). Caller guarantees `weight > 0`; tiny
    * positive weights clamp at [[MaxClock]] instead of overflowing the
    * long cast. A NULL id or weight propagates a NULL key (struct keys
    * then sort nulls-first, the pre-clamp behavior) — `least` skips
    * NULLs, so without the explicit guard a NULL clock would silently
    * clamp to the MAX key and flip the row from first to last. */
  def esClockKeyE6(idLong: Column, weight: Column, salt: String): Column = {
    // guard on the POST-cast weight: a non-null value whose double cast
    // yields NULL (non-ANSI string weights) must also propagate NULL,
    // not slip through least()'s null-skip into the max clamp
    val w = weight.cast("double")
    val clock = -log(
      (TextOps.md5Long(concat(idLong.cast("string"), lit(salt))) + 1)
        .cast("double") / lit(HashSpace)) / w
    when(idLong.isNull || w.isNull, lit(null).cast("long"))
      .otherwise(floor(least(clock, lit(MaxClock)) * 1000000.0 + 0.5).cast("long"))
  }

  /**
   * Sample-estimated quantiles of `value` (long-valued) at the given
   * per-mille points, from a [[bottomKSample]]-keyed sample of size
   * `k` (same salted (hash, id) selection rule, restricted to rows
   * whose value is NON-NULL — a null value cannot rank, and counting
   * it while dropping it from the sorted array would push the rank
   * index past the array end): one row with `n_rows` (exact corpus
   * count, null-valued rows included), `n_sample`, and a
   * `q{permille}_est` column per requested point — the
   * `ceil(p·n_sample)`-th smallest sampled value. Error is the
   * standard sampling bound (~1/√k on the rank), with NO global sort
   * of the corpus at any point — and ONE corpus scan: the exact count
   * and the bounded min-k sample ride the same aggregate (the
   * join-back of [[bottomKSample]] is unnecessary when only the
   * sampled VALUES are wanted).
   */
  def sampledQuantiles(df: DataFrame, id: Column, value: Column, k: Int,
      permille: Seq[Int]): DataFrame =
    sampledQuantilesBy(df, Seq.empty, id, value, k, permille)

  /**
   * [[sampledQuantiles]] PER GROUP: one row per group (aliased group
   * columns pass through, the [[approxDistinct]] convention) with that
   * group's exact `n_rows`, its `n_sample`, and a `q{permille}_est`
   * column per requested point — each group carries its OWN bounded
   * min-k sample, so per-stratum distributions (token-length quantiles
   * per language, latency quantiles per source) cost one hash aggregate
   * with O(k) state per group and zero sorts of the corpus. The empty
   * group list degrades to the global one-row form.
   */
  def sampledQuantilesBy(df: DataFrame, groups: Seq[Column], id: Column,
      value: Column, k: Int, permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000))
    val idL = id.cast("long")
    val vL = value.cast("long")
    val reserved = Set("n_rows", "n_sample", "__mk", "__arr") ++
      permille.map(p => s"q${p}_est")
    // resolve group names BEFORE the aggregate: a group aliased to a
    // reserved name (e.g. "n_rows") would silently corrupt the output
    val gNames = if (groups.isEmpty) Seq.empty[String]
      else df.select(groups: _*).columns.toSeq
    require(gNames.forall(!reserved(_)),
      s"group aliases ${gNames.mkString(", ")} must avoid the reserved output names " +
        reserved.mkString(", "))
    val agg = df.groupBy(groups: _*).agg(
      count(lit(1)).as("n_rows"),
      quantileSampleAgg(idL, vL, k).as("__mk"))
    val gCols = gNames.map(col)
    agg
      .withColumn("n_sample", size(col("__mk")).cast("long"))
      .withColumn("__arr",
        sort_array(transform(col("__mk"), m => m.getField("__v"))))
      .select(gCols ++ (col("n_rows") +: col("n_sample") +: quantileEstCols(permille)): _*)
  }

  /** The quantile sample aggregate — ONE definition of the salted
    * (hash, id, value) bottom-k selection shared by the batch forms and
    * the streaming twin, so their samples are bit-identical on the same
    * rows. NULL values are excluded (a null cannot rank), and so are
    * NULL ids: the id IS the deterministic sampling key, and a null id
    * would yield a null HASH inside a non-null struct — which sorts
    * nulls-FIRST and would preferentially occupy every sample slot
    * instead of dropping. Both guards sit on the struct's `when`, so
    * such rows still count in `n_rows`. */
  private[graft] def quantileSampleAgg(idL: Column, vL: Column, k: Int): Column =
    collect_min_k(when(idL.isNotNull && vL.isNotNull,
      struct(
        TextOps.md5Long(concat(idL.cast("string"), lit("bk"))).as("__h"),
        idL.as("__i"), vL.as("__v"))), k)

  /** `q{permille}_est` columns over the `n_sample`/`__arr` columns — the
    * ONE rank-arithmetic definition (ceil(p·n/1000) as pure integers,
    * NULL on an empty sample) shared by batch and streaming. */
  private[graft] def quantileEstCols(permille: Seq[Int]): Seq[Column] =
    permille.map { p =>
      // the n_sample=0 guard keeps a sample-less group a NULL estimate
      // instead of an ANSI element_at(…, 1) error on the empty array
      when(col("n_sample") > 0,
        element_at(col("__arr"),
          greatest(expr(s"($p * n_sample + 999) div 1000"), lit(1L)).cast("int")))
        .as(s"q${p}_est")
    }

  /**
   * EXACT heavy hitters with a bounded plan: every item occurring in at
   * least `minPermille`/1000 of the non-null rows, with its EXACT
   * occurrence count — `GROUP BY item HAVING 1000*count >= permille*N`
   * semantics without ever hash-aggregating the full item domain.
   *
   * Two passes, both O(k)-state:
   *  1. One scan aggregates N and a [[graft.functions.freq_sketch_k]]
   *     Misra-Gries sketch. The sketch's guarantee — every item with
   *     frequency > N/(k+1) keeps a counter under ANY merge order — plus
   *     the static requirement `(k+1) * minPermille > 1000` make the
   *     sketch items a SUPERSET of the true heavy hitters.
   *  2. A second scan counts ONLY the ≤ k candidate items exactly (a
   *     broadcast join admits candidate rows; everything else never
   *     reaches the aggregate) and applies the threshold in pure integer
   *     arithmetic.
   * False candidates are filtered by their exact counts, so the output is
   * deterministic and engine-exact even though sketch counters are not.
   *
   * At 100 TB: a naive `GROUP BY item` over a token column shuffles the
   * full vocabulary (billions of keys); here the only aggregate over the
   * corpus carries 2k counters per partition, the candidate join is a
   * ≤ k-row broadcast, and the exact pass aggregates ≤ k keys. Finding
   * boilerplate tokens, hot domains, or over-represented URLs in a crawl
   * is exactly this shape.
   *
   * Output: `item` (the column's values), `n_occurrences` (exact), plus
   * `n_total` = N for rate computation downstream. Unordered — callers
   * own the final sort.
   */
  def heavyHitters(df: DataFrame, item: Column, minPermille: Int, k: Int): DataFrame =
    heavyHittersBy(df, Seq.empty, item, minPermille, k)

  /**
   * [[heavyHitters]] PER GROUP: every item at or above
   * `minPermille`/1000 of ITS group's non-null rows, with exact counts
   * against the group's own total. Aliased group columns pass through
   * (the [[approxDistinct]] convention); the empty group list degrades
   * to the global form. Same two-pass plan: one grouped sketch
   * aggregate (O(k) counters per group), a `groups × k`-row broadcast
   * of candidates, one exact count pass over admitted rows — hot tokens
   * per language / hot URLs per crawl snapshot without ever
   * hash-aggregating a (group × vocabulary) key space.
   *
   * Regime bound: the candidate frame is `groups × k` rows, which the
   * explicit broadcast assumes fits the broadcast limits — right for
   * stratum-style groups (languages, domain classes, snapshots; up to
   * ~10⁵ groups at k=256). For id-like group keys (millions+), each
   * group is small enough that the sketch buys nothing — aggregate per
   * (group, item) directly instead.
   */
  def heavyHittersBy(df: DataFrame, groups: Seq[Column], item: Column,
      minPermille: Int, k: Int): DataFrame = {
    require(minPermille >= 1 && minPermille <= 1000,
      s"minPermille must be in [1, 1000], got $minPermille")
    require((k + 1).toLong * minPermille > 1000,
      s"k=$k cannot guarantee completeness at $minPermille permille: " +
        s"need (k+1)*minPermille > 1000 (Misra-Gries retains items above N/(k+1))")
    val base = df.select(groups :+ item.as("item"): _*).filter(col("item").isNotNull)
    val gNames = base.columns.dropRight(1).toSeq
    val reserved = Set("item", "n_total", "n_occurrences", "__sk", "__c")
    require(gNames.forall(!reserved(_)),
      s"group aliases ${gNames.mkString(", ")} must avoid the reserved output names " +
        reserved.mkString(", "))
    val gCols = gNames.map(col)
    val candidates = base
      .groupBy(gCols: _*)
      .agg(count(lit(1)).as("n_total"), freq_sketch_k(col("item"), k).as("__sk"))
      .select(gCols :+ col("n_total") :+ explode(col("__sk")).as("__c"): _*)
      .select(gCols :+ col("n_total") :+ col("__c.item").as("item"): _*)
      // prefixed names for an explicit NULL-SAFE join below — a plain
      // USING join is EqualTo and would silently drop every heavy hitter
      // of a NULL-keyed group (groupBy treats NULL as a group; the
      // join-back must too)
      .toDF(gNames.map("__cg_" + _) :+ "n_total" :+ "__c_item": _*)
    val joinCond = gNames
      .map(n => col(n) <=> col("__cg_" + n)) // null-safe per group key
      .foldLeft(col("item") === col("__c_item"))(_ && _) // item is non-null
    base.join(broadcast(candidates), joinCond)
      .groupBy(gCols :+ col("item") :+ col("n_total"): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      // count >= ceil(N*p/1000)  ⇔  1000*count >= N*p  (integer counts)
      .filter(col("n_occurrences") * 1000L >= col("n_total") * minPermille.toLong)
      .select(gCols :+ col("item") :+ col("n_occurrences") :+ col("n_total"): _*)
  }
}
