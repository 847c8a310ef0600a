package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/** Golden values ported from the reference test suites:
  * h3ron/src/cell.rs:480-714, direction.rs:155-235, lib.rs:146-183. */
class H3CoreSpec extends AnyFunSuite {
  import H3Core._

  val SfCell = 0x89283080ddbffffL // res-9 cell, San Francisco (reference canonical)
  val Res5Cell = 0x8518607bfffffffL // res-5 cell used by direction.rs tests

  test("validity (cell.rs:505-509)") {
    assert(isValidCell(SfCell))
    assert(!isValidCell(0L))
    assert(!isValidCell(-1L))
    assert(isValidCell(0x801ffffffffffffL)) // res-0 cell, bc 15
    assert(isValidCell(0x805ffffffffffffL)) // res-0 cell, bc 47
  }

  test("resolution extraction") {
    assert(getResolution(SfCell) == 9)
    assert(getResolution(Res5Cell) == 5)
    assert(getResolution(0x801ffffffffffffL) == 0)
  }

  test("hex string roundtrip (cell.rs:484-501)") {
    assert(h3ToString(SfCell) == "89283080ddbffff")
    assert(stringToH3("89283080ddbffff") == SfCell)
    assert(stringToH3("not a cell") == H3Null)
  }

  test("parent / children roundtrip") {
    val parent = cellToParent(SfCell, 8)
    assert(isValidCell(parent))
    assert(getResolution(parent) == 8)
    val children = cellToChildren(parent, 9)
    assert(children.length == 7)
    assert(children.contains(SfCell))
    assert(children.forall(isValidCell))
    assert(children.forall(c => cellToParent(c, 8) == parent))
    // parent at own res is identity
    assert(cellToParent(SfCell, 9) == SfCell)
    // res out of range -> null
    assert(cellToParent(SfCell, 10) == H3Null)
    assert(cellToParent(0L, 5) == H3Null)
  }

  test("children_directions (direction.rs:202-210)") {
    val children = cellToChildren(Res5Cell, 6)
    children.zipWithIndex.foreach { case (child, i) =>
      assert(direction(child) == i)
    }
  }

  test("center child") {
    val cc = cellToCenterChild(Res5Cell, 7)
    assert(isValidCell(cc))
    assert(getResolution(cc) == 7)
    assert(getDigit(cc, 6) == 0 && getDigit(cc, 7) == 0)
    assert(cellToParent(cc, 5) == Res5Cell)
  }

  test("direction goldens (direction.rs:164-193)") {
    assert(direction(Res5Cell) == 6) // IjAxesDigit
    assert(directionToParentResolution(Res5Cell, 4) == 3) // JkAxesDigit
    assert(directionToParentResolution(Res5Cell, 1) == 1) // KAxesDigit
    assert(directionToParentResolution(Res5Cell, 6) == -1) // ResMismatch
    assert(direction(0x801ffffffffffffL) == -1) // res-0 errors
    assert(direction(0x805ffffffffffffL) == -1)
  }

  test("directed edges from origin (cell.rs:636-656)") {
    val edges = originToDirectedEdges(SfCell)
    val expected = Array(
      "119283080ddbffff", "129283080ddbffff", "139283080ddbffff",
      "149283080ddbffff", "159283080ddbffff", "169283080ddbffff")
    assert(edges.map(h3ToString).toSeq == expected.toSeq)
    edges.foreach { e =>
      assert(isValidDirectedEdge(e))
      assert(getResolution(e) == 9)
      assert(edgeOrigin(e) == SfCell)
    }
    assert(!isValidDirectedEdge(SfCell))
    assert(!isValidCell(edges(0)))
  }

  test("pentagons") {
    val pentRes0 = res0Cells()(4)
    assert(isPentagon(pentRes0))
    assert(isValidCell(pentRes0))
    // pentagon has 6 children; K(1) direction blocked
    val ch = cellToChildren(pentRes0, 1)
    assert(ch.length == 6)
    assert(cellToChildrenSize(pentRes0, 1) == 6)
    assert(ch.forall(isValidCell))
    assert(isPentagon(ch.head)) // center child stays a pentagon
    assert(ch.tail.forall(!isPentagon(_)))
    // K-edge off a pentagon is invalid
    assert(cellToDirectedEdge(pentRes0, 1) == H3Null)
    assert(originToDirectedEdges(pentRes0).length == 5)
    // a K-digit descendant of a pentagon base cell is invalid
    assert(!isValidCell(makeChildForTest(pentRes0, 1)))
  }

  private def makeChildForTest(h: Long, d: Int): Long = {
    val r = getResolution(h) + 1
    val off = 3 * (MaxRes - r)
    val shifted = (h & ~(0xFL << 52)) | (r.toLong << 52)
    (shifted & ~(0x7L << off)) | (d.toLong << off)
  }

  test("children size 7^n for hexagons") {
    assert(cellToChildrenSize(SfCell, 9) == 1)
    assert(cellToChildrenSize(SfCell, 10) == 7)
    assert(cellToChildrenSize(SfCell, 12) == 343)
    assert(cellToChildren(SfCell, 12).length == 343)
  }

  test("compact/uncompact roundtrip (frame/compact.rs:309-355 analogue)") {
    // children of a cell compact back to the cell
    val children = cellToChildren(Res5Cell, 7)
    val compacted = compactCells(children)
    assert(compacted.toSeq == Seq(Res5Cell))
    // dropping one res-7 cell: the 6 untouched res-6 subtrees still compact,
    // the holed subtree's remaining 6 children stay -> 6 + 6 cells, no res-5
    val partial = compactCells(children.drop(1))
    assert(partial.length == 12)
    assert(!partial.contains(Res5Cell))
    assert(partial.count(getResolution(_) == 6) == 6)
    assert(partial.count(getResolution(_) == 7) == 6)
    // mixed-res cascade: children at res 7 of child A + sibling cells at 6
    val directChildren = cellToChildren(Res5Cell, 6)
    val mixed = cellToChildren(directChildren.head, 7) ++ directChildren.tail
    assert(compactCells(mixed).toSeq == Seq(Res5Cell))
    // duplicates are deduplicated
    assert(compactCells(children ++ children).toSeq == Seq(Res5Cell))
    // uncompact
    val un = children.flatMap(uncompactCell(_, 7))
    assert(un.toSeq.sorted == children.toSeq.sorted)
    assert(uncompactCell(Res5Cell, 7).toSeq.sorted == children.toSeq.sorted)
    // finer-than-target dropped (reference frame/compact.rs:268-271)
    assert(uncompactCell(SfCell, 5).isEmpty)
  }

  test("pentagon compact roundtrip") {
    val pent = res0Cells()(14)
    val children = cellToChildren(pent, 2)
    assert(children.length == cellToChildrenSize(pent, 2))
    assert(compactCells(children).toSeq == Seq(pent))
  }

  test("res0 cells (lib.rs:176-183)") {
    val cells = res0Cells()
    assert(cells.length == 122)
    assert(res0CellCount == 122)
    assert(cells.forall(isValidCell))
    assert(cells.forall(getResolution(_) == 0))
    assert(cells.count(isPentagon) == 12)
    assert(cells(0) == 0x8001fffffffffffL)
  }

  test("max grid disk size closed form (lib.rs:79)") {
    assert(maxGridDiskSize(0) == 1)
    assert(maxGridDiskSize(1) == 7)
    assert(maxGridDiskSize(100) == 30301)
  }
}
