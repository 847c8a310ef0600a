package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Bounded order-statistic collect: the `k` SMALLEST distinct input values
 * per group, returned as a sorted ascending array — the exact semantics of
 * `slice(sort_array(collect_set(x)), 1, k)` (for ANY input multiset, not
 * just distinct inputs) but with an aggregation buffer bounded at O(k) BY
 * CONSTRUCTION instead of O(group).
 *
 * This is the hot-band cap of the LSH / pigeonhole-Hamming dedup paths
 * ([[graft.pipeline.Dedup.lshCandidatePairs]],
 * [[graft.pipeline.Dedup.bandedHammingPairs]]): a degenerate band — billions
 * of near-black thumbnails hashing to pHash 0, a boilerplate corpus
 * collapsing onto one MinHash band — previously materialized its ENTIRE
 * membership in one task's `collect_set` buffer before the cap truncated
 * it; at 100 TB that is an OOM, not a slowdown. A bounded min-k buffer never
 * holds more than k elements no matter how hot the band, and partial
 * (map-side) aggregation shrinks each partition's contribution to k before
 * the shuffle, so the shuffled state for a band of a billion members is
 * `num_partitions × k` values, not a billion.
 *
 * Smallest-k-distinct is an order statistic, so it is algebraically closed
 * under partial aggregation: each partial buffer keeps its k smallest
 * distinct values, and the k smallest distinct of a union of such sets equal
 * the true k smallest distinct. The buffer is a `java.util.TreeSet` over
 * Catalyst's interpreted ordering for the child type (structs compare
 * field-by-field — the same ordering `sort_array` uses), which makes the
 * buffer distinct BY CONSTRUCTION (duplicate inputs cannot displace a
 * distinct value, fixing the duplicate-eviction gap of a plain bounded
 * heap) and already ascending at eval time. NULLs are dropped like
 * `collect_set` drops them.
 */
case class CollectMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Any]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "collect_min_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): java.util.TreeSet[Any] =
    new java.util.TreeSet[Any](ordering)

  // TreeSet equality is comparator-based (compare == 0), so distinctness is
  // consistent across value representations (Generic vs Unsafe rows).
  private def insert(buf: java.util.TreeSet[Any], v: Any): Unit = {
    if (buf.size < k) {
      buf.add(InternalRow.copyValue(v))
    } else if (ordering.lt(v, buf.last())) {
      // strictly smaller than the current max: admit (no-op if duplicate of
      // a kept value), then restore the k bound
      if (buf.add(InternalRow.copyValue(v))) buf.pollLast()
    }
    // v >= max of a full buffer: cannot be among the k smallest distinct
  }

  override def update(buf: java.util.TreeSet[Any], input: InternalRow): java.util.TreeSet[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(b1: java.util.TreeSet[Any], b2: java.util.TreeSet[Any]): java.util.TreeSet[Any] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next()) // already copied at insert time
    b1
  }

  override def eval(buf: java.util.TreeSet[Any]): Any = {
    // TreeSet iterates in ascending comparator order: already sorted+distinct
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  // Two formats, tagged by a leading version byte:
  //   0 — raw big-endian longs, for LongType children. VERSION-STABLE:
  //       depends on nothing but the tag.
  //   1 — single-field UnsafeRow images, for every other child type.
  //       Checkpoint durability: Spark's streaming state stores persist
  //       state rows AS UnsafeRow bytes themselves, so these images
  //       share exactly the state store's own layout-stability
  //       envelope — a hypothetical UnsafeRow layout change would break
  //       every checkpoint, not just these buffers, and the strict
  //       deserialize validation below turns that into a LOUD failure
  //       instead of a misparse. Streaming consumers with struct
  //       children (windowed weighted sample, windowed quantiles) ride
  //       this path.
  private def isLong: Boolean = child.dataType == LongType
  // shared element codec: ALL length/offset hardening lives in
  // ValueImageCodec so it cannot diverge from FreqSketchK's
  @transient private lazy val codec = new ValueImageCodec(child.dataType, "CollectMinK", "element")

  override def serialize(buf: java.util.TreeSet[Any]): Array[Byte] = {
    if (isLong) {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * buf.size)
      bb.put(0.toByte)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().asInstanceOf[Long])
      return bb.array()
    }
    val rows = new Array[Array[Byte]](buf.size)
    var total = 1 + 4
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) {
      rows(i) = codec.imageOf(it.next())
      total += 4 + rows(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.put(1.toByte)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Any] = {
    // This buffer sits under checkpointed streaming state (windowed KMV):
    // validate the tag and the payload length against it LOUDLY. A
    // foreign/corrupt buffer whose first byte happens to be 0 or 1 must
    // fail here, not silently parse into garbage elements — and an
    // unknown tag (a future encoding) must never fall through to an
    // older decoder.
    require(bytes.length >= 5, s"CollectMinK buffer truncated: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.get()
    val n = bb.getInt
    require(n >= 0, s"CollectMinK buffer corrupt: negative count $n")
    val buf = createAggregationBuffer()
    if (version == 0) {
      require(isLong,
        s"CollectMinK version-0 (raw long) buffer for non-long child ${child.dataType}")
      require(bytes.length == 5 + 8L * n,
        s"CollectMinK version-0 buffer length ${bytes.length} != ${5 + 8L * n} for count $n")
      var i = 0
      while (i < n) { buf.add(bb.getLong: java.lang.Long); i += 1 }
      return buf
    }
    require(version == 1,
      s"CollectMinK buffer has unknown version tag $version (known: 0, 1)")
    var i = 0
    while (i < n) {
      buf.add(codec.readImage(bb, i, n)) // validated, owned copy
      i += 1
    }
    require(bb.remaining == 0,
      s"CollectMinK version-1 buffer has ${bb.remaining} trailing bytes")
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
