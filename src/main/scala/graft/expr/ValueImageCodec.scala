package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types._

/**
 * Shared codec for the version-1 "len-prefixed 1-field UnsafeRow image"
 * element encoding used by the bounded-state aggregates ([[CollectMinK]],
 * [[FreqSketchK]]). One implementation so the deserialize-side hardening
 * (these buffers can sit under checkpointed streaming state, so every
 * length/offset is validated LOUDLY before an Unsafe read) exists in
 * exactly one place — the two aggregates' validation suites had already
 * diverged once before this was extracted.
 *
 * `owner`/`noun` parameterize error messages ("CollectMinK version-1
 * element 3 …" vs "FreqSketchK version-1 entry 3 …") so the
 * diagnostics keep their per-aggregate identity and the specs pinning
 * their key phrases keep passing.
 */
private[expr] final class ValueImageCodec(
    dataType: DataType, owner: String, noun: String) extends Serializable {

  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))
  @transient private lazy val holder = new GenericInternalRow(1)
  @transient private lazy val row = new UnsafeRow(1)
  private val fixedLen = UnsafeRow.isFixedLength(dataType)

  /** Minimum byte size a nested (non-root-fixed-width) value image can
    * legally have: a struct is its null bitset plus one 8-byte slot per
    * field; an array is at least its 8-byte element-count header;
    * strings/binary may be empty. One level deep is exact for every
    * catalog child type (the struct children are all fixed-width
    * longs). */
  private val minNestedPayload: Int = dataType match {
    case s: StructType => 8 * ((s.length + 63) / 64) + 8 * s.length
    case _: ArrayType => 8
    case _ => 0
  }

  /** True when the nested value's size is fully determined by its type
    * (a struct of only fixed-width fields), so decode can demand
    * size == [[minNestedPayload]] instead of >=. */
  private val nestedExact: Boolean = dataType match {
    case s: StructType => s.fields.forall(f => UnsafeRow.isFixedLength(f.dataType))
    case _ => false
  }

  /** Encode one non-null value as a standalone UnsafeRow image.
    * copy(): for fixed-width children the projection's UnsafeRow reuses
    * one backing array across applies — getBytes on it would alias every
    * serialized element to the last value written. */
  def imageOf(v: Any): Array[Byte] = {
    holder.update(0, v)
    proj.apply(holder).copy().getBytes
  }

  /** Decode ONE len-prefixed image from `bb`, validating every length
    * and offset before any Unsafe read, and return an OWNED copy of the
    * value. `i`/`of` are the element index and expected total for
    * diagnostics (an "$i/$of" report distinguishes short-by-one from
    * short-by-most when triaging a corrupt state-store image). */
  def readImage(bb: java.nio.ByteBuffer, i: Int, of: Int): Any = {
    require(bb.remaining >= 4, s"$owner version-1 buffer truncated at $noun $i/$of")
    val len = bb.getInt
    require(len >= 0 && bb.remaining >= len,
      s"$owner version-1 $noun $i length $len exceeds remaining ${bb.remaining}")
    // a 1-field UnsafeRow is 8 null-bitset bytes + an 8-byte slot, plus
    // variable-length payload; shorter images would make the row read
    // past the array
    require(len >= 16, s"$owner version-1 $noun $i image too short: $len")
    if (fixedLen) require(len == 16,
      s"$owner version-1 fixed-width $noun $i has length $len, expected 16")
    val img = new Array[Byte](len)
    bb.get(img)
    // serialize never writes null elements, so the 1-field null bitset
    // must be empty — a set bit would surface a null into the buffer
    // and NPE its ordering/hashing later
    var nb = 0
    while (nb < 8) {
      require(img(nb) == 0,
        s"$owner version-1 $noun $i has a non-empty null bitset")
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
        s"$owner version-1 $noun $i has corrupt offset/size ($off, $size) for length $len")
      // the nested value itself must be big enough for its type — a
      // zero-size struct image would pass the window check above and
      // then feed out-of-bounds Unsafe reads downstream (garbage, not
      // an exception). All catalog struct children are fully
      // fixed-width, so their size is checked EXACTLY.
      require(size >= minNestedPayload,
        s"$owner version-1 $noun $i nested value size $size < minimum " +
          s"$minNestedPayload for ${dataType.simpleString}")
      if (nestedExact) require(size == minNestedPayload,
        s"$owner version-1 fixed-width ${dataType.simpleString} $noun $i " +
          s"has size $size, expected $minNestedPayload")
    }
    row.pointTo(img, len)
    // hand the caller an owned copy of the field value
    InternalRow.copyValue(row.get(0, dataType))
  }
}
