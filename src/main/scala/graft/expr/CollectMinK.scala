package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Bounded order-statistic collect: the `k` SMALLEST distinct input values
 * per group, returned as a sorted ascending array — the exact semantics of
 * `slice(sort_array(collect_set(x)), 1, k)` under the caller contract that
 * input values are distinct within a group, but with an aggregation buffer
 * bounded at O(k) BY CONSTRUCTION instead of O(group).
 *
 * This is the hot-band cap of the LSH / pigeonhole-Hamming dedup paths
 * ([[graft.pipeline.Dedup.lshCandidatePairs]],
 * [[graft.pipeline.Dedup.bandedHammingPairs]]): a degenerate band — billions
 * of near-black thumbnails hashing to pHash 0, a boilerplate corpus
 * collapsing onto one MinHash band — previously materialized its ENTIRE
 * membership in one task's `collect_set` buffer before the cap truncated
 * it; at 100 TB that is an OOM, not a slowdown. A bounded min-k heap never
 * holds more than k elements no matter how hot the band, and partial
 * (map-side) aggregation shrinks each partition's contribution to k before
 * the shuffle, so the shuffled state for a band of a billion members is
 * `num_partitions × k` structs, not a billion.
 *
 * Smallest-k is an order statistic, so it is algebraically closed under
 * partial aggregation: each partial buffer keeps its k smallest, and the
 * merged k smallest of unions of k-smallest sets equal the true k smallest.
 * Elements are compared with Catalyst's interpreted ordering for the child
 * type (structs compare field-by-field — the same ordering `sort_array`
 * uses), NULLs are dropped like `collect_set` drops them, and `eval`
 * deduplicates adjacent equal values so duplicated inputs cannot inflate
 * the output (with distinct inputs this is a no-op).
 */
case class CollectMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "collect_min_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  // max-heap: peek() is the LARGEST of the kept k — the eviction candidate
  @transient private lazy val reverseOrdering: java.util.Comparator[Any] =
    ordering.reverse

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](math.min(k, 64) + 1, reverseOrdering)

  private def insert(buf: java.util.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) {
      buf.add(InternalRow.copyValue(v))
    } else if (ordering.lt(v, buf.peek())) {
      // equal-to-max values are skipped: evicting the max for an equal
      // element leaves the kept multiset unchanged
      buf.poll()
      buf.add(InternalRow.copyValue(v))
    }
  }

  override def update(buf: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(b1: java.util.PriorityQueue[Any], b2: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next()) // already copied at insert time
    b1
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, ordering.asInstanceOf[java.util.Comparator[Any]])
    // adjacent dedup mirrors collect_set (no-op for distinct-input callers)
    val out = new Array[Any](arr.length)
    var n = 0
    var i = 0
    while (i < arr.length) {
      if (n == 0 || !ordering.equiv(out(n - 1), arr(i))) { out(n) = arr(i); n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == arr.length) out else java.util.Arrays.copyOf(out, n))
  }

  // elements serialize as single-field UnsafeRow images — type-agnostic
  // (long ids, (id, hash) structs) and partition-local, so the format only
  // has to round-trip within one executor generation
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) {
      holder.update(0, it.next())
      rows(i) = proj.apply(holder).getBytes
      total += 4 + rows(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val img = new Array[Byte](len)
      bb.get(img)
      row.pointTo(img, len)
      // deserialized buffers only ever merge (insert copies), so hand the
      // heap an owned copy of the field value
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
