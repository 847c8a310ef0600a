package graft.h3

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based laws over the full H3 stack (FIXTURES.md plan): random
 * coordinates and random cells at random resolutions, exercising the
 * geometry port, hierarchy bit ops and traversal together.
 */
class H3LawsSpec extends AnyFunSuite {
  private val params = Gen.Parameters.default
  /** deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache). */
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i => g.apply(params, Seed(i.toLong)).foreach(f) }
  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (0 until 200).foreach { i =>
      for {
        a <- ga.apply(params, Seed(i.toLong))
        b <- gb.apply(params, Seed(i.toLong + 1000))
        c <- gc.apply(params, Seed(i.toLong + 2000))
      } f(a, b, c)
    }
  import H3Geo._
  import H3Core._

  val genLat: Gen[Double] = Gen.chooseNum(-89.9, 89.9)
  val genLng: Gen[Double] = Gen.chooseNum(-179.9, 179.9)
  val genRes: Gen[Int] = Gen.chooseNum(0, 12)

  val genCell: Gen[Long] = for {
    lat <- genLat; lng <- genLng; res <- genRes
  } yield latLngToCell(lat, lng, res)

  test("law: latLngToCell always yields a valid cell at the requested res") {
    forAll(genLat, genLng, genRes) { (lat: Double, lng: Double, res: Int) =>
      val c = latLngToCell(lat, lng, res)
      assert(isValidCell(c) && getResolution(c) == res)
    }
  }

  test("law: centroid roundtrip is the identity") {
    forAll(genCell) { (c: Long) =>
      val g = cellToLatLng(c)
      assert(latLngToCell(g.lat, g.lng, getResolution(c)) == c)
    }
  }

  test("law: the constructing point is inside its cell") {
    forAll(genLat, genLng, genRes) { (lat: Double, lng: Double, res: Int) =>
      val c = latLngToCell(lat, lng, res)
      assert(latLngToCell(lat, lng, res) == c) // determinism
      // point within circumradius of centroid
      val ctr = cellToLatLngRads(c)
      val p = LatLng(math.toRadians(lat), math.toRadians(lng))
      val maxR = cellToBoundaryRads(c).map(v => greatCircleDistanceRads(ctr, v)).max
      assert(greatCircleDistanceRads(ctr, p) <= maxR * 1.0000001)
    }
  }

  test("law: parent contains all children; children partition areas ~1") {
    forAll(genCell.suchThat(c => getResolution(c) < 12)) { (c: Long) =>
      val res = getResolution(c)
      val kids = cellToChildren(c, res + 1)
      assert(kids.length == (if (isPentagon(c)) 6 else 7))
      kids.foreach(k => assert(cellToParent(k, res) == c))
      // every child's centroid maps back into the parent
      kids.foreach { k =>
        val g = cellToLatLng(k)
        assert(latLngToCell(g.lat, g.lng, res) == c)
      }
    }
  }

  test("law: compact(uncompact(cells)) is the identity on distinct sets") {
    forAll(Gen.listOfN(5, genCell.suchThat(c => getResolution(c) <= 6)), 100) { (cells: List[Long]) =>
      val distinct = cells.distinct.toArray
      // drop cells that are ancestors/descendants of each other (compact
      // semantics only roundtrip on antichains)
      val anti = distinct.filter { c =>
        !distinct.exists(o => o != c && getResolution(o) < getResolution(c) &&
          cellToParent(c, getResolution(o)) == o)
      }
      val maxRes = anti.map(getResolution).max
      val un = anti.flatMap(uncompactCell(_, maxRes))
      val back = compactCells(un)
      assert(back.sorted.toSeq == compactCells(anti).sorted.toSeq)
    }
  }

  test("law: neighbors are mutual and at grid distance 1") {
    forAll(genCell.suchThat(c => getResolution(c) >= 1)) { (c: Long) =>
      H3Traversal.neighbors(c).foreach { n =>
        assert(H3Traversal.neighbors(n).contains(c))
        assert(H3Traversal.gridDistance(c, n) == 1)
      }
    }
  }

  test("law: spiral disk partitions into the grid rings, in ring order") {
    forAll(genCell, n = 300) { (c: Long) =>
      for (k <- 1 to 3) {
        val spiral = H3Traversal.gridDiskDistancesSpiral(c, k)
        // same (cell, k) SET as the safe disk
        assert(spiral.toSet == H3Traversal.gridDiskDistances(c, k).toSet, s"cell $c k $k")
        // center first, distances non-decreasing ring blocks
        assert(spiral.head == ((c, 0)))
        assert(spiral.map(_._2).toSeq == spiral.map(_._2).sorted.toSeq)
        // ring-by-ring partition equals gridRing's sets (h3_13's law)
        for (r <- 0 to k) {
          val ringCells = spiral.collect { case (cc, d) if d == r => cc }
          assert(ringCells.sorted.toSeq == H3Traversal.gridRing(c, r).toSeq,
            s"cell $c k $k ring $r")
        }
      }
    }
  }

  test("law: pentagon-free spirals walk each ring by single neighbor steps") {
    forAll(genCell, n = 300) { (c: Long) =>
      H3Traversal.gridDiskDistancesSpiralUnsafe(c, 3).foreach { spiral =>
        for (r <- 1 to 3) {
          val ring = spiral.collect { case (cc, d) if d == r => cc }
          // consecutive ring cells are grid neighbors and the ring closes
          // (the libh3 spiral walks the hexagon ring edge by edge)
          ring.sliding(2).foreach { case Array(a, b) =>
            assert(H3Traversal.areNeighborCells(a, b), s"cell $c ring $r")
          }
          assert(H3Traversal.areNeighborCells(ring.last, ring.head), s"cell $c ring $r")
        }
      }
    }
  }

  test("spiral walk equals the tracked-rotations walk away from pentagon base cells") {
    // the tracked h3NeighborRotations port is validated against libh3
    // semantics outside pentagon base cells — there, the geometric
    // (canonicalNeighbor + back-direction) walk must reproduce it
    // cell-for-cell, pinning the spiral to libh3's exact order
    def inPentBC(cell: Long): Boolean =
      H3Core.isPentagon(H3Core.cellToParent(cell, 0))
    var checked = 0
    forAll(genCell.suchThat(c => getResolution(c) >= 1), n = 300) { (c: Long) =>
      val k = 2
      if (!H3Traversal.gridDisk(c, k).exists(inPentBC)) {
        checked += 1
        val spiral = H3Traversal.gridDiskDistancesSpiralUnsafe(c, k)
        assert(spiral.isDefined, s"cell $c")
        // replicate libh3's loop with the tracked port
        val out = scala.collection.mutable.ArrayBuffer((c, 0))
        var ring = 1; var direction = 0; var i = 0; var rot = 0; var cur = c
        while (ring <= k) {
          if (direction == 0 && i == 0) {
            val (n, r) = H3Traversal.h3NeighborRotations(cur, H3Traversal.NextRingDirection, rot)
            cur = n; rot = r
          }
          val (n, r) = H3Traversal.h3NeighborRotations(cur, H3Traversal.Directions(direction), rot)
          cur = n; rot = r
          out += ((cur, ring))
          i += 1
          if (i == ring) { i = 0; direction += 1; if (direction == 6) { ring += 1; direction = 0 } }
        }
        assert(spiral.get.toSeq == out.toSeq, s"cell $c")
      }
    }
    assert(checked > 100, s"fixture covered only $checked clean disks")
  }

  test("law: coarse-resolution spirals survive repeated base-cell crossings") {
    // res 0-3 disks at k=4 cross several base-cell boundaries per ring —
    // the regime where rotation-frame bookkeeping errors surface
    val genCoarse: Gen[Long] = for {
      lat <- genLat; lng <- genLng; res <- Gen.chooseNum(0, 3)
    } yield latLngToCell(lat, lng, res)
    forAll(genCoarse, n = 200) { (c: Long) =>
      val k = 4
      val spiral = H3Traversal.gridDiskDistancesSpiral(c, k)
      assert(spiral.toSet == H3Traversal.gridDiskDistances(c, k).toSet, s"cell $c")
      for (r <- 0 to k) {
        val ringCells = spiral.collect { case (cc, d) if d == r => cc }
        assert(ringCells.sorted.toSeq == H3Traversal.gridRing(c, r).toSeq, s"cell $c ring $r")
      }
      H3Traversal.gridDiskDistancesSpiralUnsafe(c, k).foreach { sp =>
        for (r <- 1 to k) {
          val ring = sp.collect { case (cc, d) if d == r => cc }
          ring.sliding(2).foreach { case Array(a, b) =>
            assert(H3Traversal.areNeighborCells(a, b), s"cell $c ring $r")
          }
          assert(H3Traversal.areNeighborCells(ring.last, ring.head), s"cell $c ring $r")
        }
      }
    }
  }

  test("spiral fallback near pentagons still yields the exact disk set") {
    // every res-1 cell around each of the 12 pentagons: unsafe walk fails
    // (libh3 E_PENTAGON), the fallback must still return the full set
    val pentagons = H3Core.res0Cells().filter(H3Core.isPentagon)
      .flatMap(p => H3Core.cellToChildren(p, 1))
    assert(pentagons.nonEmpty)
    var sawFallback = false
    for (c <- pentagons; k <- 1 to 2) {
      val unsafe = H3Traversal.gridDiskDistancesSpiralUnsafe(c, k)
      if (unsafe.isEmpty) sawFallback = true
      val spiral = H3Traversal.gridDiskDistancesSpiral(c, k)
      assert(spiral.toSet == H3Traversal.gridDiskDistances(c, k).toSet, s"cell $c k $k")
      assert(spiral.head == ((c, 0)))
    }
    assert(sawFallback, "fixture must exercise the pentagon fallback")
  }

  test("law: edge destinations partition the ring-1 set") {
    forAll(genCell.suchThat(c => getResolution(c) >= 1)) { (c: Long) =>
      val dests = H3Core.originToDirectedEdges(c).map(H3Traversal.edgeDestination)
      val ring = H3Traversal.gridRing(c, 1)
      assert(dests.sorted.toSeq == ring.sorted.toSeq)
    }
  }

  test("law: canonical direction stepping is injective, mutual, and matches tables") {
    forAll(genCell.suchThat(c => getResolution(c) >= 1)) { (c: Long) =>
      val perDir = (1 to 6).map(d => d -> H3Traversal.canonicalNeighbor(c, d))
      val nonNull = perDir.filter(_._2 != H3Core.H3Null)
      // injective direction assignment
      assert(nonNull.map(_._2).distinct.length == nonNull.length, f"dup dests for $c%x")
      nonNull.foreach { case (_, n) =>
        // mutual: some direction of n leads back to c
        assert((1 to 6).exists(d2 => H3Traversal.canonicalNeighbor(n, d2) == c), f"$c%x <-> $n%x")
      }
      // off pentagon base cells the table stepping must agree bit-for-bit
      if (!H3Core.isPentagonBaseCell(H3Core.getBaseCell(c))) {
        perDir.foreach { case (d, n) =>
          assert(H3Traversal.h3NeighborRotations(c, d, 0)._1 == n, f"$c%x dir $d")
        }
      }
    }
  }
}
