package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Bounded frequent-items sketch (Misra-Gries): per group, at most `k`
 * (item, count_lb) counters summarizing the full value stream, with the
 * classic guarantee that EVERY item whose true frequency exceeds
 * `N / (k+1)` (N = non-null rows in the group) retains a counter, and each
 * retained counter is a LOWER BOUND underestimating the true count by at
 * most `N / (k+1)`. The guarantee survives arbitrary partial aggregation
 * and merge orders (Agarwal et al., "Mergeable Summaries", PODS 2012:
 * MG summaries merge by adding counters and re-reducing to k), so it holds
 * under map-side combine + shuffle exactly like a sum would.
 *
 * Why not Spark's built-ins: `df.stat.freqItems` is a whole-DataFrame
 * driver helper — not an aggregate function, so it cannot run per GROUP,
 * per window, or inside a streaming state store, and it returns items
 * without counts. There is no Catalyst frequent-items aggregate. This is
 * the [[CollectMinK]] pattern applied to frequency instead of order: O(k)
 * state BY CONSTRUCTION, so a 100 TB column with billions of distinct
 * values shuffles `num_partitions × k` counters, never a per-value
 * hash aggregate.
 *
 * The sketch output itself is NOT deterministic across partitionings
 * (counter values depend on merge order; the guarantee is). Deterministic
 * results come from the two-pass pattern in
 * [[graft.pipeline.Sketches.heavyHitters]]: sketch → candidate superset →
 * exact count of candidates only → threshold filter. Use the raw sketch
 * alone only where lower-bound estimates suffice (monitoring, candidate
 * generation).
 *
 * Buffer mechanics: the map is allowed to grow to `2k` entries between
 * purges; a purge subtracts the (k+1)-th largest count from every counter
 * and drops the non-positive ones, retaining at most k. Each purge removes
 * at least `(k+1) × dec` total mass, so the summed decrement — the
 * underestimation bound — is at most `N / (k+1)`, and the amortized purge
 * cost is O(1) per row. Eval re-reduces to k, then emits counters sorted
 * (count desc, item asc). NULLs are dropped like `collect_set` drops them.
 */
case class FreqSketchK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "freq_sketch_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", child.dataType, nullable = false),
      StructField("count_lb", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // atomic values have stable equals/hashCode across Catalyst
    // representations — the property the HashMap buffer keys on (floats
    // need canonical() for the ±0.0/NaN encodings Catalyst grouping
    // already treats equal). Struct keys would compare Generic vs
    // Unsafe rows by reference; hash the fields into an atomic value
    // upstream instead.
    // no BinaryType: Array[Byte] hashes by reference — md5Long it upstream
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType =>
      TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic item type, got ${other.simpleString}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    new mutable.HashMap[Any, Long]()

  /** Subtract the (k+1)-th largest count from everything and drop the
    * non-positive remainder: at most k survivors (an entry equal to the
    * pivot cannot outlive its own subtraction). No-op at or under k. */
  private def reduceToK(buf: mutable.HashMap[Any, Long]): Unit = {
    if (buf.size <= k) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val dec = counts(counts.length - (k + 1))
    buf.mapValuesInPlace((_, c) => c - dec)
    buf.filterInPlace((_, c) => c > 0)
  }

  /** Canonicalize float/double keys: -0.0 and 0.0 (and NaN payloads) are
    * DISTINCT boxed HashMap keys but EQUAL under Catalyst grouping — a
    * heavy value split across encodings would hold two sub-threshold
    * counters and could lose its retention guarantee. Catalyst's
    * NormalizeFloatingNumbers fixes group/join keys only, never
    * aggregate inputs, so the buffer must do it. */
  private def canonical(v: Any): Any = v match {
    case d: java.lang.Double =>
      if (d.doubleValue() == 0.0d) (0.0d: java.lang.Double)
      else if (d.isNaN) (java.lang.Double.NaN: java.lang.Double)
      else d
    case f: java.lang.Float =>
      if (f.floatValue() == 0.0f) (0.0f: java.lang.Float)
      else if (f.isNaN) (java.lang.Float.NaN: java.lang.Float)
      else f
    case other => other
  }

  /** `owned`: merge/deserialize keys are already owned copies — skip the
    * per-key re-copy that the eval-path (buffer-reused) values need. */
  private def add(buf: mutable.HashMap[Any, Long], v0: Any, inc: Long,
      owned: Boolean): Unit = {
    val v = canonical(v0)
    buf.get(v) match {
      case Some(c) => buf.update(v, c + inc) // existing key object retained
      case None => buf.update(if (owned) v else InternalRow.copyValue(v), inc)
    }
    if (buf.size > 2 * k) reduceToK(buf)
  }

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v, 1L, owned = false)
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (v, c) => add(b1, v, c, owned = true) }
    b1
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    reduceToK(buf)
    val entries = buf.toArray
    // (count desc, item asc): heaviest first, total order for a stable
    // array given the buffer contents
    java.util.Arrays.sort(entries, { (a: (Any, Long), b: (Any, Long)) =>
      if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
      else ordering.compare(a._1, b._1)
    })
    new GenericArrayData(entries.map { case (v, c) =>
      InternalRow(v, c): Any
    })
  }

  // Serialized form, tagged by a leading version byte (the CollectMinK
  // discipline — these buffers cross the shuffle and could sit under
  // checkpointed streaming state):
  //   0 — LongType fast path: n, then n × (raw long item, long count).
  //   1 — generic: n, then n × (len-prefixed 1-field UnsafeRow image,
  //       long count).
  private def isLong: Boolean = child.dataType == LongType
  // shared element codec: ALL length/offset hardening lives in
  // ValueImageCodec so it cannot diverge from CollectMinK's
  @transient private lazy val codec = new ValueImageCodec(child.dataType, "FreqSketchK", "entry")

  private def validCount(c: Long): Unit =
    require(c > 0, s"FreqSketchK buffer corrupt: non-positive count $c")

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    if (isLong) {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 16 * buf.size)
      bb.put(0.toByte)
      bb.putInt(buf.size)
      buf.foreach { case (v, c) => bb.putLong(v.asInstanceOf[Long]); bb.putLong(c) }
      return bb.array()
    }
    val rows = new Array[(Array[Byte], Long)](buf.size)
    var total = 1 + 4
    var i = 0
    buf.foreach { case (v, c) =>
      rows(i) = (codec.imageOf(v), c)
      total += 4 + rows(i)._1.length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.put(1.toByte)
    bb.putInt(rows.length)
    rows.foreach { case (r, c) => bb.putInt(r.length); bb.put(r); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    require(bytes.length >= 5, s"FreqSketchK buffer truncated: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.get()
    val n = bb.getInt
    require(n >= 0, s"FreqSketchK buffer corrupt: negative entry count $n")
    val buf = createAggregationBuffer()
    if (version == 0) {
      require(isLong,
        s"FreqSketchK version-0 (raw long) buffer for non-long child ${child.dataType}")
      require(bytes.length == 5 + 16L * n,
        s"FreqSketchK version-0 buffer length ${bytes.length} != ${5 + 16L * n} for count $n")
      var i = 0
      while (i < n) {
        val v = bb.getLong; val c = bb.getLong
        validCount(c)
        buf.update(v: java.lang.Long, buf.getOrElse(v: java.lang.Long, 0L) + c)
        i += 1
      }
      return buf
    }
    require(version == 1,
      s"FreqSketchK buffer has unknown version tag $version (known: 0, 1)")
    var i = 0
    while (i < n) {
      val v = codec.readImage(bb, i, n) // validated, owned copy
      require(bb.remaining >= 8, s"FreqSketchK version-1 entry $i missing its count")
      val c = bb.getLong
      validCount(c)
      // canonical(): a pre-canonicalization buffer may carry -0.0/NaN
      // encodings that now collide — combine their counts instead of
      // letting a later entry overwrite an earlier one
      val key = canonical(v)
      buf.update(key, buf.getOrElse(key, 0L) + c)
      i += 1
    }
    require(bb.remaining == 0,
      s"FreqSketchK version-1 buffer has ${bb.remaining} trailing bytes")
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
