package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/**
 * Conformance battery for [[H3Traversal.canonicalNeighbor]] — the
 * FaceIJK-space direction->destination semantics used for directed edges
 * and traversal inside pentagon base cells (ADVICE r02: pentagon edge
 * indexes previously used an ad-hoc ascending-id convention).
 *
 * Two independent ground truths:
 *  1. table stepping (h3NeighborRotations) outside pentagon base cells —
 *     exact fold-isometry-derived direction semantics;
 *  2. geometric neighbor sets (boundary-sharing via the table-free
 *     conversion layer) inside pentagon base cells.
 */
class H3CanonicalNeighborSpec extends AnyFunSuite {

  private def sweep(res: Int): Unit = {
    val cells = H3Core.res0Cells().flatMap(c => H3Core.cellToChildren(c, res))
    var nonPent = 0
    var pent = 0
    for (c <- cells) {
      if (!H3Core.isPentagonBaseCell(H3Core.getBaseCell(c))) {
        var d = 1
        while (d <= 6) {
          val t = H3Traversal.h3NeighborRotations(c, d, 0)._1
          val g = H3Traversal.canonicalNeighbor(c, d)
          assert(t == g, f"res=$res c=$c%x dir=$d table=$t%x canonical=$g%x")
          d += 1
        }
        nonPent += 1
      } else {
        val perDir = (1 to 6).map(d => d -> H3Traversal.canonicalNeighbor(c, d))
        val nonNull = perDir.filter(_._2 != H3Core.H3Null)
        assert(nonNull.map(_._2).distinct.length == nonNull.length,
          f"res=$res c=$c%x duplicate destinations: $perDir")
        if (H3Core.isPentagon(c))
          assert(perDir.toMap.apply(1) == H3Core.H3Null,
            f"res=$res pentagon $c%x: K direction must be deleted")
        val canon = nonNull.map(_._2).toSet
        val geo = H3Traversal.neighborsGeo(c).toSet
        assert(canon == geo,
          f"res=$res c=$c%x canonical set $canon != geometric set $geo")
        pent += 1
      }
    }
    assert(nonPent > 0 && pent > 0)
  }

  test("canonical == table stepping off-pentagon; == geometry in pentagon bases (res 2)") {
    sweep(2) // Class II
  }

  test("canonical == table stepping off-pentagon; == geometry in pentagon bases (res 3)") {
    sweep(3) // Class III
  }

  test("deep pentagon descendants: neighbor sets, injectivity, deleted K (res 7)") {
    val seeds = H3Core.pentagonBaseCells.map(bc =>
      (1L << 59) | (bc.toLong << 45) | H3Core.lowerDigitsOnes(0))
    val cells = seeds.flatMap { p =>
      H3Core.cellToChildren(p, 2).flatMap { c =>
        var spine = c
        (3 to 7).foreach(r => spine = H3Core.cellToCenterChild(spine, r))
        var off = c
        (3 to 7).foreach { r =>
          off = H3Core.withDigit(H3Core.withRes(H3Core.cellToCenterChild(off, r), r), r, (r % 6) + 1)
        }
        Seq(spine, off).filter(H3Core.isValidCell)
      }
    }
    for (c <- cells if H3Core.isPentagonBaseCell(H3Core.getBaseCell(c))) {
      val perDir = (1 to 6).map(d => d -> H3Traversal.canonicalNeighbor(c, d))
      val nonNull = perDir.filter(_._2 != H3Core.H3Null)
      assert(nonNull.map(_._2).distinct.length == nonNull.length, f"c=$c%x: $perDir")
      if (H3Core.isPentagon(c)) assert(perDir.toMap.apply(1) == H3Core.H3Null)
      assert(nonNull.map(_._2).toSet == H3Traversal.neighborsGeo(c).toSet, f"c=$c%x")
    }
  }

  test("edge roundtrips through canonical destinations in pentagon regions") {
    val pent = (1L << 59) | (4L << 45) | H3Core.lowerDigitsOnes(0) // res-0 pentagon bc 4
    val cells = H3Core.cellToChildren(pent, 3)
    for (c <- cells) {
      val edges = H3Core.originToDirectedEdges(c)
      for (e <- edges) {
        val dest = H3Traversal.edgeDestination(e)
        assert(dest != H3Core.H3Null, f"edge $e%x of $c%x has no destination")
        // destination is a true neighbor and the edge probes back
        assert(H3Traversal.areNeighborCells(c, dest))
        assert(H3Traversal.cellsToDirectedEdge(c, dest) == e, f"edge $e%x not re-derivable")
        val rev = H3Traversal.edgeReverse(e)
        assert(H3Core.edgeOrigin(rev) == dest && H3Traversal.edgeDestination(rev) == c)
      }
      // a pentagon has 5 edges, hexagons 6
      assert(edges.length == (if (H3Core.isPentagon(c)) 5 else 6))
    }
  }
}
