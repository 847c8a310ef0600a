package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
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
  //       streaming consumers (windowed KMV sketches) persist these
  //       buffers into checkpointed state stores, which must survive a
  //       Spark upgrade — the long path depends on nothing but the tag.
  //   1 — single-field UnsafeRow images, for every other child type.
  //       Partition-local batch exchange format; a checkpoint-durable
  //       consumer of a non-long child would need a stable encoding here
  //       first (none exists today — the streaming twin hashes to longs).
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
  private def isLong: Boolean = child.dataType == LongType

  /** Minimum byte size a version-1 nested (non-root-fixed-width) value
    * image can legally have: a struct is its null bitset plus one 8-byte
    * slot per field; an array is at least its 8-byte element-count
    * header; strings/binary may be empty. One level deep is exact for
    * every catalog child type (the struct children are all fixed-width
    * longs). */
  @transient private lazy val minNestedPayload: Int = child.dataType match {
    case s: StructType => 8 * ((s.length + 63) / 64) + 8 * s.length
    case _: ArrayType => 8
    case _ => 0
  }

  /** True when the nested value's size is fully determined by its type
    * (a struct of only fixed-width fields), so deserialize can demand
    * size == [[minNestedPayload]] instead of >=. */
  @transient private lazy val nestedExact: Boolean = child.dataType match {
    case s: StructType => s.fields.forall(f => UnsafeRow.isFixedLength(f.dataType))
    case _ => false
  }

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
      holder.update(0, it.next())
      // copy(): for fixed-width children the projection's UnsafeRow reuses
      // one backing array across applies — getBytes on it would alias every
      // serialized element to the last value written
      rows(i) = proj.apply(holder).copy().getBytes
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
    val row = new UnsafeRow(1)
    val fixedLen = UnsafeRow.isFixedLength(child.dataType)
    var i = 0
    while (i < n) {
      require(bb.remaining >= 4, s"CollectMinK version-1 buffer truncated at element $i/$n")
      val len = bb.getInt
      require(len >= 0 && bb.remaining >= len,
        s"CollectMinK version-1 element $i length $len exceeds remaining ${bb.remaining}")
      // a 1-field UnsafeRow is 8 null-bitset bytes + an 8-byte slot, plus
      // variable-length payload; shorter images would make the row read
      // past the array
      require(len >= 16, s"CollectMinK version-1 element $i image too short: $len")
      if (fixedLen) require(len == 16,
        s"CollectMinK version-1 fixed-width element $i has length $len, expected 16")
      val img = new Array[Byte](len)
      bb.get(img)
      // serialize never writes null elements, so the 1-field null bitset
      // must be empty — a set bit would surface a null into the TreeSet
      // and NPE its ordering later
      var nb = 0
      while (nb < 8) {
        require(img(nb) == 0,
          s"CollectMinK version-1 element $i has a non-empty null bitset")
        nb += 1
      }
      if (!fixedLen) {
        // validate the field's (offset, size) word BEFORE the row
        // dereferences it — a corrupt word would otherwise drive an
        // Unsafe copy from a wild offset (the slot uses native byte
        // order, exactly as UnsafeRow reads it)
        val slot = java.nio.ByteBuffer.wrap(img, 8, 8)
          .order(java.nio.ByteOrder.nativeOrder()).getLong
        val off = (slot >> 32).toInt
        val size = slot.toInt
        require(off >= 16 && size >= 0 && off.toLong + size <= len,
          s"CollectMinK version-1 element $i has corrupt offset/size ($off, $size) for length $len")
        // the nested value itself must be big enough for its type — a
        // zero-size struct image would pass the window check above and
        // then feed out-of-bounds Unsafe reads to the TreeSet ordering
        // (garbage, not an exception). All catalog struct children are
        // fully fixed-width, so their size is checked EXACTLY.
        require(size >= minNestedPayload,
          s"CollectMinK version-1 element $i nested value size $size < minimum " +
            s"$minNestedPayload for ${child.dataType.simpleString}")
        if (nestedExact) require(size == minNestedPayload,
          s"CollectMinK version-1 element $i fixed-width ${child.dataType.simpleString} " +
            s"has size $size, expected $minNestedPayload")
      }
      row.pointTo(img, len)
      // hand the set an owned copy of the field value
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)))
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
