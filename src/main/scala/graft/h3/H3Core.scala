package graft.h3

import scala.collection.mutable

/**
 * Pure-Scala implementation of the H3 cell-index *bit layer*: every
 * operation here is integer bit arithmetic on the public 64-bit H3 index
 * layout (mode / resolution / base cell / 15 aperture-7 digits), no
 * geometry involved.
 *
 * Semantics follow the public H3 index spec as exercised by the reference
 * implementation:
 *   - index accessors / validity: /root/reference/h3ron/src/index.rs:189-233
 *   - parent/children/center child: /root/reference/h3ron/src/cell.rs:103-131,329
 *   - hex string conversion: /root/reference/h3ron/src/cell.rs:342-438
 *   - direction digits: /root/reference/h3ron/src/direction.rs:71-121
 *   - directed-edge bit ops: /root/reference/h3ron/src/directed_edge.rs
 *   - compact invariant: /root/reference/h3ron/src/collections/compactedcellvec.rs:134-165
 *
 * Error convention: methods returning a `Long` index return [[H3Null]] (0,
 * never a valid index) on invalid input; the Catalyst expression layer maps
 * that to SQL NULL, mirroring the reference's invalid->Arrow-null rule
 * (/root/reference/h3ron-polars/src/from.rs:4-33).
 */
object H3Core {

  final val MaxRes = 15
  final val NumBaseCells = 122
  final val ModeCell = 1
  final val ModeEdge = 2
  final val H3Null = 0L

  // Bit layout (public H3 spec): bit 63 reserved(0); bits 59-62 mode;
  // bits 56-58 reserved (edge direction for mode 2); bits 52-55 resolution;
  // bits 45-51 base cell; bits 0-44 fifteen 3-bit digits (res 1..15),
  // digit for res r at bits 3*(15-r) .. 3*(15-r)+2; unused digits = 7.
  private final val ModeOffset = 59
  private final val EdgeDirOffset = 56
  private final val ResOffset = 52
  private final val BaseCellOffset = 45

  @inline def mode(h: Long): Int = ((h >>> ModeOffset) & 0xFL).toInt
  @inline def edgeDirection(h: Long): Int = ((h >>> EdgeDirOffset) & 0x7L).toInt
  @inline def getResolution(h: Long): Int = ((h >>> ResOffset) & 0xFL).toInt
  @inline def getBaseCell(h: Long): Int = ((h >>> BaseCellOffset) & 0x7FL).toInt
  @inline def getDigit(h: Long, r: Int): Int = ((h >>> (3 * (MaxRes - r))) & 0x7L).toInt

  @inline private[h3] def withRes(h: Long, res: Int): Long =
    (h & ~(0xFL << ResOffset)) | (res.toLong << ResOffset)
  @inline private[h3] def withDigit(h: Long, r: Int, d: Int): Long = {
    val off = 3 * (MaxRes - r)
    (h & ~(0x7L << off)) | (d.toLong << off)
  }
  /** ones covering the digit bits of res+1 .. 15 (i.e. set them all to 7). */
  @inline private[h3] def lowerDigitsOnes(res: Int): Long = (1L << (3 * (MaxRes - res))) - 1L

  // The 12 pentagon base cells of the H3 grid (public spec constant).
  val pentagonBaseCells: Array[Int] = Array(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
  private val pentagonMask: Array[Boolean] = {
    val m = new Array[Boolean](NumBaseCells)
    pentagonBaseCells.foreach(m(_) = true)
    m
  }
  @inline def isPentagonBaseCell(bc: Int): Boolean =
    bc >= 0 && bc < NumBaseCells && pentagonMask(bc)

  /** Full cell validity per the H3 spec (matches index.rs:199 `is_valid`). */
  def isValidCell(h: Long): Boolean = {
    if (h < 0) return false // high bit must be 0
    if (mode(h) != ModeCell) return false
    if (edgeDirection(h) != 0) return false // reserved bits
    val bc = getBaseCell(h)
    if (bc >= NumBaseCells) return false
    val res = getResolution(h)
    val pent = pentagonMask(bc)
    var foundFirstNonZero = false
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d == 7) return false
      if (!foundFirstNonZero && d != 0) {
        foundFirstNonZero = true
        if (pent && d == 1) return false // K axis blocked off the pentagon
      }
      r += 1
    }
    while (r <= MaxRes) {
      if (getDigit(h, r) != 7) return false
      r += 1
    }
    true
  }

  /** A cell is a pentagon iff its base cell is a pentagon and all digits are 0. */
  def isPentagon(h: Long): Boolean = {
    if (!isValidCell(h)) return false
    val bc = getBaseCell(h)
    if (!pentagonMask(bc)) return false
    val res = getResolution(h)
    val digitsMask = lowerDigitsOnes(0) ^ lowerDigitsOnes(res)
    (h & digitsMask) == 0L
  }

  /** Resolution 0..15, or -1 for invalid input (expression layer -> NULL). */
  def resolutionChecked(h: Long): Int =
    if (isValidCell(h) || isValidDirectedEdge(h)) getResolution(h) else -1

  /** Parent of `h` at `parentRes`; H3Null if invalid / parentRes out of range. */
  def cellToParent(h: Long, parentRes: Int): Long = {
    if (!isValidCell(h)) return H3Null
    val res = getResolution(h)
    if (parentRes < 0 || parentRes > res) return H3Null
    withRes(h, parentRes) | lowerDigitsOnes(parentRes)
  }

  /** Center child at `childRes` (all new digits 0). */
  def cellToCenterChild(h: Long, childRes: Int): Long = {
    if (!isValidCell(h)) return H3Null
    val res = getResolution(h)
    if (childRes < res || childRes > MaxRes) return H3Null
    // zero the digits res+1..childRes, keep childRes+1..15 at 7
    val zeroed = h & ~lowerDigitsOnes(res)
    withRes(zeroed, childRes) | lowerDigitsOnes(childRes)
  }

  /** Direct child of `h` one resolution finer, with the given digit. Caller
    * must ensure digit validity (pentagon parents have no K(1) child). */
  @inline private[h3] def makeDirectChild(h: Long, d: Int): Long = {
    val r = getResolution(h) + 1
    withDigit(withRes(h, r), r, d)
  }

  /** Number of children of `h` at `childRes` (pentagons have 6-ary centers). */
  def cellToChildrenSize(h: Long, childRes: Int): Long = {
    if (!isValidCell(h)) return -1L
    val res = getResolution(h)
    if (childRes < res || childRes > MaxRes) return -1L
    val n = childRes - res
    if (isPentagon(h)) {
      // 1 + 5 * (7^n - 1) / 6
      var p = 1L; var i = 0
      while (i < n) { p *= 7; i += 1 }
      1L + 5L * (p - 1L) / 6L
    } else {
      var p = 1L; var i = 0
      while (i < n) { p *= 7; i += 1 }
      p
    }
  }

  /** All children of `h` at `childRes` in canonical (digit) order.
    * Empty array on invalid input. */
  def cellToChildren(h: Long, childRes: Int): Array[Long] = {
    if (!isValidCell(h)) return Array.emptyLongArray
    val res = getResolution(h)
    if (childRes < res || childRes > MaxRes) return Array.emptyLongArray
    val out = mutable.ArrayBuilder.make[Long]
    out.sizeHint(cellToChildrenSize(h, childRes).toInt)
    def rec(c: Long): Unit = {
      if (getResolution(c) == childRes) out += c
      else {
        // only the center (all-zero-digit) chain of a pentagon base cell is a
        // pentagon; those cells skip the K(1) child.
        val pent = pentagonMask(getBaseCell(c)) &&
          (c & (lowerDigitsOnes(0) ^ lowerDigitsOnes(getResolution(c)))) == 0L
        var d = 0
        while (d <= 6) {
          if (!(pent && d == 1)) rec(makeDirectChild(c, d))
          d += 1
        }
      }
    }
    rec(h)
    out.result()
  }

  /** Mixed-resolution compact: replace every complete child set by its
    * parent, cascading to coarser resolutions. Input is deduplicated;
    * invalid cells are dropped. Output sorted ascending (deterministic). */
  def compactCells(cells: Array[Long]): Array[Long] = {
    val byRes: Array[mutable.HashSet[Long]] = Array.fill(MaxRes + 1)(mutable.HashSet.empty[Long])
    var i = 0
    while (i < cells.length) {
      val c = cells(i)
      if (isValidCell(c)) byRes(getResolution(c)) += c
      i += 1
    }
    var r = MaxRes
    while (r > 0) {
      val cur = byRes(r)
      if (cur.nonEmpty) {
        val counts = mutable.HashMap.empty[Long, Int]
        cur.foreach { c =>
          val p = withRes(c, r - 1) | lowerDigitsOnes(r - 1)
          counts.update(p, counts.getOrElse(p, 0) + 1)
        }
        counts.foreach { case (p, n) =>
          val pent = isPentagon(p)
          val expected = if (pent) 6 else 7
          if (n == expected) {
            var d = 0
            while (d <= 6) {
              if (!(pent && d == 1)) cur -= makeDirectChild(p, d)
              d += 1
            }
            byRes(r - 1) += p
          }
        }
      }
      r -= 1
    }
    val out = byRes.iterator.flatMap(_.iterator).toArray
    java.util.Arrays.sort(out)
    out
  }

  /** Children of `h` at `res`; identity if already at `res`; cells finer
    * than `res` are dropped (empty result), mirroring the reference's
    * uncompact rule (frame/compact.rs:268-271). */
  def uncompactCell(h: Long, res: Int): Array[Long] = {
    if (!isValidCell(h) || res < 0 || res > MaxRes) return Array.emptyLongArray
    val cur = getResolution(h)
    if (cur > res) Array.emptyLongArray
    else if (cur == res) Array(h)
    else cellToChildren(h, res)
  }

  // ---- string conversion ------------------------------------------------

  /** Lowercase hex, no padding — same as H3's h3ToString / Rust Display
    * (cell.rs:485-490 golden: 0x89283080ddbffff -> "89283080ddbffff"). */
  def h3ToString(h: Long): String = java.lang.Long.toHexString(h)

  /** Parse hex string; H3Null when unparseable or not a valid cell. */
  def stringToH3(s: String): Long = {
    if (s == null) return H3Null
    try {
      val v = java.lang.Long.parseUnsignedLong(s.trim, 16)
      v
    } catch { case _: NumberFormatException => H3Null }
  }

  // ---- direction digits (reference direction.rs) ------------------------

  /** The digit distinguishing `h` within its own parent (digit at own res);
    * -1 on invalid / res 0. Matches reference `H3Direction::direction`
    * (direction.rs:82-84, which errors on res-0 cells). */
  def direction(h: Long): Int = {
    if (!(isValidCell(h) || isValidDirectedEdge(h))) return -1
    val res = getResolution(h)
    if (res == 0) -1 else getDigit(h, res)
  }

  /** Digit of `h` at resolution `targetRes` (1..res) — reference
    * `direction_to_parent_resolution` (direction.rs:89-97: digit at the
    * target res; errors when targetRes > res, and res-0 digits are 7). */
  def directionToParentResolution(h: Long, targetRes: Int): Int = {
    if (!(isValidCell(h) || isValidDirectedEdge(h))) return -1
    val res = getResolution(h)
    if (targetRes < 1 || targetRes > res) return -1
    getDigit(h, targetRes)
  }

  // ---- directed edges (bit ops only; destination needs grid math) -------

  /** Directed-edge validity: mode 2, direction 1..6, valid origin, and no
    * K(1) edge off a pentagon (directed_edge.rs:47). */
  def isValidDirectedEdge(e: Long): Boolean = {
    if (e < 0) return false
    if (mode(e) != ModeEdge) return false
    val d = edgeDirection(e)
    if (d < 1 || d > 6) return false
    val origin = edgeOriginRaw(e)
    if (!isValidCell(origin)) return false
    !(d == 1 && isPentagon(origin))
  }

  @inline private def edgeOriginRaw(e: Long): Long =
    (e & ~(0xFL << ModeOffset) & ~(0x7L << EdgeDirOffset)) | (ModeCell.toLong << ModeOffset)

  /** Origin cell of a directed edge (pure bit op). */
  def edgeOrigin(e: Long): Long =
    if (isValidDirectedEdge(e)) edgeOriginRaw(e) else H3Null

  /** Build the directed edge leaving `cell` in grid direction `d` (1..6). */
  def cellToDirectedEdge(cell: Long, d: Int): Long = {
    if (!isValidCell(cell) || d < 1 || d > 6) return H3Null
    if (d == 1 && isPentagon(cell)) return H3Null
    (cell & ~(0xFL << ModeOffset)) | (ModeEdge.toLong << ModeOffset) | (d.toLong << EdgeDirOffset)
  }

  /** The up-to-6 directed edges with origin `cell`, canonical direction
    * order (golden: cell.rs:636-656 -> 0x11..0x16 prefixes). */
  def originToDirectedEdges(cell: Long): Array[Long] = {
    if (!isValidCell(cell)) return Array.emptyLongArray
    val pent = isPentagon(cell)
    val out = mutable.ArrayBuilder.make[Long]
    var d = 1
    while (d <= 6) {
      if (!(pent && d == 1)) out += cellToDirectedEdge(cell, d)
      d += 1
    }
    out.result()
  }

  // ---- whole-index 60-degree rotations (shared by the geometry layer) ---

  /** First non-zero digit scanning res 1..res; 0 if all digits are 0. */
  def leadingNonZeroDigit(h: Long): Int = {
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  /** Rotate a single direction digit 60 degrees counterclockwise
    * (K->IK->I->IJ->J->JK->K). */
  @inline def digitRotate60ccw(d: Int): Int = d match {
    case 1 => 5; case 5 => 4; case 4 => 6; case 6 => 2; case 2 => 3; case 3 => 1
    case other => other
  }

  /** Rotate a single direction digit 60 degrees clockwise. */
  @inline def digitRotate60cw(d: Int): Int = d match {
    case 1 => 3; case 3 => 2; case 2 => 6; case 6 => 4; case 4 => 5; case 5 => 1
    case other => other
  }

  /** Rotate all digits of an index 60 degrees ccw. */
  def rotate60ccw(h: Long): Long = {
    var out = h
    val res = getResolution(h)
    var r = 1
    while (r <= res) { out = withDigit(out, r, digitRotate60ccw(getDigit(out, r))); r += 1 }
    out
  }

  /** Rotate all digits of an index 60 degrees cw. */
  def rotate60cw(h: Long): Long = {
    var out = h
    val res = getResolution(h)
    var r = 1
    while (r <= res) { out = withDigit(out, r, digitRotate60cw(getDigit(out, r))); r += 1 }
    out
  }

  /** Pentagonal ccw rotation: like [[rotate60ccw]] but skips the deleted
    * K subsequence by rotating once more when the leading digit lands on K. */
  def rotatePent60ccw(h: Long): Long = {
    var out = h
    val res = getResolution(h)
    var foundFirst = false
    var r = 1
    while (r <= res) {
      out = withDigit(out, r, digitRotate60ccw(getDigit(out, r)))
      if (!foundFirst && getDigit(out, r) != 0) {
        foundFirst = true
        if (leadingNonZeroDigit(out) == 1) out = rotate60ccw(out)
      }
      r += 1
    }
    out
  }

  /** Pentagonal cw rotation (mirror of [[rotatePent60ccw]]). */
  def rotatePent60cw(h: Long): Long = {
    var out = h
    val res = getResolution(h)
    var foundFirst = false
    var r = 1
    while (r <= res) {
      out = withDigit(out, r, digitRotate60cw(getDigit(out, r)))
      if (!foundFirst && getDigit(out, r) != 0) {
        foundFirst = true
        if (leadingNonZeroDigit(out) == 1) out = rotate60cw(out)
      }
      r += 1
    }
    out
  }

  // ---- misc spec constants ----------------------------------------------

  /** Maximum number of cells in a k-disk: 3k(k+1)+1 (closed form). */
  def maxGridDiskSize(k: Int): Long =
    if (k < 0) -1L else 3L * k * (k + 1L) + 1L

  /** The 122 resolution-0 cells. */
  def res0Cells(): Array[Long] = {
    val out = new Array[Long](NumBaseCells)
    var bc = 0
    while (bc < NumBaseCells) {
      out(bc) = (ModeCell.toLong << ModeOffset) | (bc.toLong << BaseCellOffset) | lowerDigitsOnes(0)
      bc += 1
    }
    out
  }

  def res0CellCount: Int = NumBaseCells
  def pentagonCount: Int = 12
}
