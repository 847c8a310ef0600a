package graft.h3

import H3Geo._
import scala.collection.mutable

/**
 * Grid traversal over the H3 lattice: neighbor stepping, k-disks/rings,
 * local IJ coordinates, grid distance and grid paths, and the directed-edge
 * topology ops that need neighbor math. Mirrors the reference surface at
 * /root/reference/h3ron/src/cell.rs:133-243 (neighbors, disks, distance),
 * localij.rs (local IJ), directed_edge.rs:93-134 (destination/reverse).
 *
 * The two combinatorial kernels — the aperture-7 digit stepping tables and
 * the base-cell neighbor/rotation tables — are *derived* at init from exact
 * integer hex-grid arithmetic and the face fold transforms (no memorized
 * 7x7 or 122x7 tables), then exercised by the self-check invariants.
 */
object H3Traversal {

  final val Center = 0
  final val KAxes = 1
  final val JAxes = 2
  final val JKAxes = 3
  final val IAxes = 4
  final val IKAxes = 5
  final val IJAxes = 6
  final val InvalidDigit = 7

  /** iteration order of directions used by disk algorithms (H3 convention) */
  val Directions: Array[Int] = Array(JAxes, JKAxes, KAxes, IKAxes, IAxes, IJAxes)

  // ---------------------------------------------------------------------
  // derived: aperture-7 digit stepping
  //
  // stepDigit(classIII)(oldDigit)(moveDir) = the digit the cell has after
  // moving one cell in moveDir; stepAdj(classIII)(oldDigit)(moveDir) = the
  // direction the *parent* must move (Center when staying inside).
  // Derived from: child at unit(oldDigit) in the parent-centered res-r
  // grid; move to unit(oldDigit)+unit(moveDir); up-aperture locates the
  // new parent, the residual is the new digit.
  // ---------------------------------------------------------------------

  private def deriveStep(classIII: Boolean): (Array[Array[Int]], Array[Array[Int]]) = {
    val digit = Array.ofDim[Int](7, 7)
    val adj = Array.ofDim[Int](7, 7)
    for (d <- 0 to 6; m <- 0 to 6) {
      if (m == Center) { digit(d)(m) = d; adj(d)(m) = Center }
      else {
        val pos = new IJK(unitVecs(d)(0), unitVecs(d)(1), unitVecs(d)(2))
        ijkNeighbor(pos, m)
        val parent = pos.copy()
        if (classIII) upAp7(parent) else upAp7r(parent)
        adj(d)(m) = unitIjkToDigit(parent)
        val ctr = parent.copy()
        if (classIII) downAp7(ctr) else downAp7r(ctr)
        val diff = new IJK(pos.i - ctr.i, pos.j - ctr.j, pos.k - ctr.k)
        ijkNormalize(diff)
        digit(d)(m) = unitIjkToDigit(diff)
      }
    }
    (digit, adj)
  }

  private lazy val (stepDigitCIII, stepAdjCIII) = deriveStep(classIII = true)
  private lazy val (stepDigitCII, stepAdjCII) = deriveStep(classIII = false)

  // ---------------------------------------------------------------------
  // derived: base-cell neighbors and rotations
  // ---------------------------------------------------------------------

  /** (neighbors(122)(7), ccwRots(122)(7)); neighbor 127 = invalid (the
    * deleted K direction of pentagons).
    *
    * First guess by exact lattice folds from the home position; then a
    * constraint-repair pass: around pentagon vertices the 60-degree
    * lattice deficit makes fold-accumulated rotations path-dependent, so
    * entries are validated against an independent geometric ground truth —
    * two cells are neighbors iff their boundaries (computed through the
    * table-free h3ToFaceIjk path) share an edge — over a sweep of every
    * res-2 cell x direction, and failing entries get the unique rotation
    * that satisfies all their samples. */
  lazy val (baseCellNeighbors, baseCellNeighborRots, baseCellSubRots):
      (Array[Array[Int]], Array[Array[Int]], Array[Int]) = {
    val nbr = Array.fill(122, 7)(InvalidBaseCell)
    val rots = Array.fill(122, 7)(0)
    // digit rotations applied when substituting the deleted K direction
    // with IK (one ccw in the reference; repaired per pentagon below,
    // since only digit correctness — not the rotation counter — is load-
    // bearing for our disk/path algorithms)
    val subRots = Array.fill(122)(1)
    for (bc <- 0 until 122) {
      nbr(bc)(Center) = bc
      rots(bc)(Center) = 0
      val d = baseCellData(bc)
      val pent = isBaseCellPentagon(bc)
      for (dir <- 1 to 6) {
        if (pent && dir == KAxes) { nbr(bc)(dir) = InvalidBaseCell }
        else {
          val fijk = new FaceIJK(d(0), new IJK(d(1), d(2), d(3)))
          ijkNeighbor(fijk.coord, dir)
          var foldRots = 0
          var guard = 0
          var ov = adjustOverageAccum(fijk)
          while (ov._1 == NewFace && guard < 4) { foldRots += ov._2; ov = adjustOverageAccum(fijk); guard += 1 }
          foldRots += ov._2
          val nb = H3Geo.faceIjkToBaseCell(fijk)
          val tr = H3Geo.faceIjkToBaseCellCCWrot60(fijk)
          require(nb != InvalidBaseCell, s"baseCellNeighbors: bc $bc dir $dir unresolved at $fijk")
          nbr(bc)(dir) = nb
          rots(bc)(dir) = ((foldRots + tr) % 6 + 6) % 6
        }
      }
    }
    repairBaseCellTables(nbr, rots, subRots)
    (nbr, rots, subRots)
  }

  /** ground-truth-driven repair of the base-cell step tables (see above). */
  private def repairBaseCellTables(nbr: Array[Array[Int]], rots: Array[Array[Int]],
      subRots: Array[Int]): Unit = {
    def step(c: Long, d: Int) = neighborRotationsImpl(c, d, 0, nbr, rots, subRots)
    val res = 2
    // every res-2 cell + quantized boundary-vertex -> cells map
    val cells = H3Core.res0Cells().flatMap(c => H3Core.cellToChildren(c, res))
    val vertexOwners = new mutable.HashMap[(Long, Long), mutable.ArrayBuffer[Long]]()
    val boundaries = new mutable.LongMap[Array[(Long, Long)]](cells.length * 2)
    for (c <- cells) {
      val keys = H3Geo.cellToBoundaryRads(c).map(v =>
        (math.round(v.lat * 1e9), math.round(v.lng * 1e9)))
      boundaries(c) = keys
      keys.foreach(k => vertexOwners.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += c)
    }
    def trueNeighbors(c: Long): Set[Long] = {
      val counts = mutable.LongMap.empty[Int]
      for (k <- boundaries(c); o <- vertexOwners(k) if o != c)
        counts(o) = counts.getOrElse(o, 0) + 1
      counts.iterator.collect { case (o, n) if n >= 2 => o }.toSet
    }
    // sweep: group failing steps by the base-level table entry they used
    def sweep(): mutable.Map[(Int, Int), mutable.ArrayBuffer[(Long, Int, Long)]] = {
      val failures = mutable.Map.empty[(Int, Int), mutable.ArrayBuffer[(Long, Int, Long)]]
      for (c <- cells; di <- 0 until 6) {
        val dir = Directions(di)
        val (n, _, usedBc, usedDir) = step(c, dir)
        if (usedBc >= 0) { // crossed a base cell: exactly one entry used
          val ok = n != H3Core.H3Null && trueNeighbors(c).contains(n)
          if (!ok)
            failures.getOrElseUpdate((usedBc, usedDir), mutable.ArrayBuffer.empty) += ((c, dir, n))
        }
      }
      failures
    }
    var failures = sweep()
    var round = 0
    while (failures.nonEmpty && round < 8) {
      for (((bc, dir), samples) <- failures) {
        // try all rotations for this entry; keep the one fixing its samples.
        // dir == 7 is the pseudo-entry for the deleted-K substitution.
        def get(): Int = if (dir == 7) subRots(bc) else rots(bc)(dir)
        def set(v: Int): Unit = if (dir == 7) subRots(bc) = v else rots(bc)(dir) = v
        var best = get()
        var bestBad = Int.MaxValue
        for (r <- 0 until 6) {
          set(r)
          val bad = samples.count { case (c, d, _) =>
            val (n, _, _, _) = step(c, d)
            n == H3Core.H3Null || !trueNeighbors(c).contains(n)
          }
          if (bad < bestBad) { bestBad = bad; best = r }
        }
        set(best)
      }
      failures = sweep()
      round += 1
    }
    if (failures.nonEmpty && sys.props.get("graft.h3.debugRepair").isDefined) {
      for (((bc, dir), ss) <- failures; (c, d, n) <- ss.take(3))
        println(s"REPAIR-FAIL entry($bc,$dir): c=${c.toHexString} " +
          s"cbc=${H3Core.getBaseCell(c)} d12=${H3Core.getDigit(c, 1)}${H3Core.getDigit(c, 2)} " +
          s"dir=$d -> ${n.toHexString} nbc=${H3Core.getBaseCell(n)} " +
          s"nd12=${H3Core.getDigit(n, 1)}${H3Core.getDigit(n, 2)}")
    }
    // residual failures are tolerated ONLY for steps originating inside
    // pentagon base cells: those cells take the geometric neighbor path at
    // runtime (see neighbors/neighborsGeo), not the repaired tables.
    val hardFailures = failures.filter { case ((bc, _), samples) =>
      !(H3Core.isPentagonBaseCell(bc) &&
        samples.forall { case (c, _, _) => H3Core.isPentagonBaseCell(H3Core.getBaseCell(c)) })
    }
    require(hardFailures.isEmpty, {
      val detail = hardFailures.take(5).map { case ((bc, dir), ss) =>
        s"entry($bc,$dir): ${ss.length} bad, e.g. ${ss.head._1.toHexString}"
      }.mkString("; ")
      s"baseCellNeighbors repair failed to converge: $detail"
    })
  }

  /** one overage fold at res 0, returning (overage kind, rotations applied). */
  private def adjustOverageAccum(fijk: FaceIJK): (Int, Int) = {
    val ijk = fijk.coord
    if (ijk.i + ijk.j + ijk.k > MaxFaceCoord) {
      val quad = if (ijk.k > 0) { if (ijk.j > 0) JKQuad else KIQuad } else IJQuad
      val orient = faceNeighbors(fijk.face)(quad)
      fijk.face = orient(0)
      var i = 0
      while (i < orient(4)) { ijkRotate60ccw(ijk); i += 1 }
      ijk.i += orient(1); ijk.j += orient(2); ijk.k += orient(3)
      ijkNormalize(ijk)
      (NewFace, orient(4))
    } else (NoOverage, 0)
  }

  /** direction digit from one base cell to a neighboring one; -1 if not
    * neighbors. */
  def baseCellDirection(from: Int, to: Int): Int = {
    var dir = 0
    while (dir <= 6) {
      if (baseCellNeighbors(from)(dir) == to) return dir
      dir += 1
    }
    -1
  }

  @inline private def isPolarPentagon(bc: Int): Boolean = bc == 4 || bc == 117

  // ---------------------------------------------------------------------
  // neighbor stepping
  // ---------------------------------------------------------------------

  /** Returns (neighbor cell, updated rotation count); neighbor is H3Null
    * for the deleted K direction off a pentagon center. `rotations` is the
    * accumulated ccw rotation of the direction frame (used by ring walks).
    * Port of the public H3 h3NeighborRotations algorithm. */
  def h3NeighborRotations(origin: Long, dirIn: Int, rotationsIn: Int): (Long, Int) = {
    val (out, rot, _, _) = neighborRotationsTracked(origin, dirIn, rotationsIn)
    (out, rot)
  }

  /** as [[h3NeighborRotations]] but also reports which base-cell table
    * entry (bc, dir) the step consumed, or (-1, -1) when it stayed inside
    * one base cell. */
  private[h3] def neighborRotationsTracked(origin: Long, dirIn: Int,
      rotationsIn: Int): (Long, Int, Int, Int) =
    neighborRotationsImpl(origin, dirIn, rotationsIn, baseCellNeighbors,
      baseCellNeighborRots, baseCellSubRots)

  /** table-parameterized core so the repair pass can run while the lazy
    * tables are still being built (lazy-val re-entrancy would recurse). */
  private def neighborRotationsImpl(origin: Long, dirIn: Int, rotationsIn: Int,
      nbrTable: Array[Array[Int]], rotsTable: Array[Array[Int]],
      subRotsTable: Array[Int]): (Long, Int, Int, Int) = {
    var dir = dirIn
    var rotations = rotationsIn
    var out = origin
    var i = 0
    while (i < rotations) { dir = H3Core.digitRotate60ccw(dir); i += 1 }

    var newRotations = 0
    val oldBaseCell = H3Core.getBaseCell(out)
    val oldLeadingDigit = H3Core.leadingNonZeroDigit(out)
    var usedBc = -1
    var usedDir = -1

    var r = H3Core.getResolution(out) - 1
    var done = false
    while (!done) {
      if (r == -1) {
        val nb = nbrTable(oldBaseCell)(dir)
        newRotations = rotsTable(oldBaseCell)(dir)
        if (nb == InvalidBaseCell) {
          // deleted K direction: this edge actually borders the IK neighbor
          out = (out & ~(0x7FL << 45)) | (nbrTable(oldBaseCell)(IKAxes).toLong << 45)
          newRotations = rotsTable(oldBaseCell)(IKAxes)
          usedBc = oldBaseCell; usedDir = 7 // substitution pseudo-entry
          var sr = 0
          while (sr < subRotsTable(oldBaseCell)) { out = H3Core.rotate60ccw(out); sr += 1 }
          rotations += subRotsTable(oldBaseCell)
        } else {
          out = (out & ~(0x7FL << 45)) | (nb.toLong << 45)
          usedBc = oldBaseCell; usedDir = dir
        }
        done = true
      } else {
        val oldDigit = H3Core.getDigit(out, r + 1)
        if (oldDigit == InvalidDigit) return (H3Core.H3Null, rotationsIn, usedBc, usedDir)
        val (nextDigit, nextDir) =
          if (isResClassIII(r + 1))
            (stepDigitCIII(oldDigit)(dir), stepAdjCIII(oldDigit)(dir))
          else
            (stepDigitCII(oldDigit)(dir), stepAdjCII(oldDigit)(dir))
        out = H3Core.withDigit(out, r + 1, nextDigit)
        if (nextDir != Center) { dir = nextDir; r -= 1 }
        else done = true
      }
    }

    val newBaseCell = H3Core.getBaseCell(out)
    if (isBaseCellPentagon(newBaseCell)) {
      var alreadyAdjustedKSubsequence = false
      if (H3Core.leadingNonZeroDigit(out) == KAxes) {
        if (oldBaseCell != newBaseCell) {
          // traversed into the deleted K subsequence of a pentagon from
          // another base cell
          if (baseCellIsCwOffset(newBaseCell, baseCellData(oldBaseCell)(0)))
            out = H3Core.rotate60cw(out)
          else out = H3Core.rotate60ccw(out)
          alreadyAdjustedKSubsequence = true
        } else {
          // traversed into the deleted K subsequence from within the same
          // pentagon base cell
          if (oldLeadingDigit == Center) return (H3Core.H3Null, rotationsIn, usedBc, usedDir) // undefined
          else if (oldLeadingDigit == JKAxes) { out = H3Core.rotate60ccw(out); rotations += 1 }
          else if (oldLeadingDigit == IKAxes) { out = H3Core.rotate60cw(out); rotations += 5 }
          else return (H3Core.H3Null, rotationsIn, usedBc, usedDir)
        }
      }
      var i2 = 0
      while (i2 < newRotations) { out = H3Core.rotatePent60ccw(out); i2 += 1 }
      if (oldBaseCell != newBaseCell) {
        if (isPolarPentagon(newBaseCell)) {
          // 'polar' base cells behave differently: they have all i neighbors
          if (oldBaseCell != 118 && oldBaseCell != 8 &&
              H3Core.leadingNonZeroDigit(out) != JKAxes)
            rotations += 1
        } else if (H3Core.leadingNonZeroDigit(out) == IKAxes && !alreadyAdjustedKSubsequence) {
          // account for distortion introduced by the deleted k subsequence
          rotations += 1
        }
      }
    } else {
      var i2 = 0
      while (i2 < newRotations) { out = H3Core.rotate60ccw(out); i2 += 1 }
    }

    (out, (rotations + newRotations) % 6, usedBc, usedDir)
  }

  /** geometric neighbor construction: probe through each boundary-edge
    * midpoint with latLngToCell (exact by construction: the conversion
    * layer is canonical and independently validated). Used for cells in
    * pentagon base cells, where the table-stepping rotation bookkeeping is
    * not canonical (see [[repairBaseCellTables]]); boundary-edge order,
    * deduplicated. */
  def neighborsGeo(origin: Long): Array[Long] = {
    val res = H3Core.getResolution(origin)
    val ctr = geoToVec3dOf(cellToLatLngRads(origin))
    val verts = cellToBoundaryRads(origin)
    val out = mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i < verts.length) {
      val a = verts(i)
      val b = verts((i + 1) % verts.length)
      val va = geoToVec3dOf(a)
      val vb = geoToVec3dOf(b)
      // midpoint of the edge, pushed 30% past it away from the center
      val mx = (va(0) + vb(0)) / 2; val my = (va(1) + vb(1)) / 2; val mz = (va(2) + vb(2)) / 2
      val px = mx + (mx - ctr(0)) * 0.3
      val py = my + (my - ctr(1)) * 0.3
      val pz = mz + (mz - ctr(2)) * 0.3
      val norm = math.sqrt(px * px + py * py + pz * pz)
      val lat = math.toDegrees(math.asin(pz / norm))
      val lng = math.toDegrees(math.atan2(py, px))
      val n = H3Geo.latLngToCell(lat, lng, res)
      if (n != origin && n != H3Core.H3Null) out += n
      i += 1
    }
    out.toArray
  }

  @inline private def geoToVec3dOf(g: LatLng): Array[Double] = H3Geo.geoToVec3d(g)

  @inline private def inPentagonBaseCell(c: Long): Boolean =
    H3Core.isPentagonBaseCell(H3Core.getBaseCell(c))

  /** the (up to 6) immediate neighbors of a cell. Table stepping on the
    * fast path; geometric construction inside pentagon base cells. */
  def neighbors(origin: Long): Array[Long] = {
    if (inPentagonBaseCell(origin)) return neighborsGeo(origin)
    val out = mutable.ArrayBuilder.make[Long]
    var d = 0
    while (d < 6) {
      val (n, _) = h3NeighborRotations(origin, Directions(d), 0)
      if (n != H3Core.H3Null) out += n
      d += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------------
  // disks and rings
  // ---------------------------------------------------------------------

  /** map cell -> grid distance for all cells within k steps (BFS; safe at
    * and around pentagons). */
  def gridDiskDistancesMap(origin: Long, k: Int): mutable.LongMap[Int] = {
    val dist = new mutable.LongMap[Int](H3Core.maxGridDiskSize(k).toInt * 2)
    if (!H3Core.isValidCell(origin) || k < 0) return dist
    dist(origin) = 0
    var frontier = List(origin)
    var d = 0
    while (d < k && frontier.nonEmpty) {
      val next = mutable.ListBuffer.empty[Long]
      for (c <- frontier; n <- neighbors(c)) {
        if (!dist.contains(n)) { dist(n) = d + 1; next += n }
      }
      frontier = next.toList
      d += 1
    }
    dist
  }

  /** all cells within k steps, ascending cell id (deterministic). */
  def gridDisk(origin: Long, k: Int): Array[Long] = {
    val m = gridDiskDistancesMap(origin, k)
    val out = m.keys.toArray
    java.util.Arrays.sort(out)
    out
  }

  /** (cell, distance) pairs within k steps, ascending cell id. */
  def gridDiskDistances(origin: Long, k: Int): Array[(Long, Int)] = {
    val m = gridDiskDistancesMap(origin, k)
    m.toArray.map { case (c, d) => (c, d) }.sortBy(_._1)
  }

  /** cells at exactly distance k, ascending cell id. */
  def gridRing(origin: Long, k: Int): Array[Long] = {
    val m = gridDiskDistancesMap(origin, k)
    val out = m.iterator.collect { case (c, d) if d == k => c }.toArray
    java.util.Arrays.sort(out)
    out
  }

  def areNeighborCells(a: Long, b: Long): Boolean = {
    if (!H3Core.isValidCell(a) || !H3Core.isValidCell(b)) return false
    if (a == b) return false
    if (H3Core.getResolution(a) != H3Core.getResolution(b)) return false
    neighbors(a).contains(b)
  }

  // ---------------------------------------------------------------------
  // local IJK coordinates (non-pentagon paths; pentagon-involved pairs
  // return None, matching the reference's error behavior, localij.rs:93)
  // ---------------------------------------------------------------------

  /** coordinates of `h3` in the local ijk space anchored at `origin`. */
  def cellToLocalIjk(origin: Long, h3In: Long): Option[IJK] = {
    var h3 = h3In
    val res = H3Core.getResolution(origin)
    if (res != H3Core.getResolution(h3)) return None
    val originBaseCell = H3Core.getBaseCell(origin)
    val baseCell = H3Core.getBaseCell(h3)
    if (isBaseCellPentagon(originBaseCell) || isBaseCellPentagon(baseCell)) return None

    var dir = Center
    if (originBaseCell != baseCell) {
      dir = baseCellDirection(originBaseCell, baseCell)
      if (dir < 0) return None // not neighbors
    }

    if (dir != Center) {
      val baseCellRotations = baseCellNeighborRots(originBaseCell)(dir)
      var i = 0
      while (i < baseCellRotations) { h3 = H3Core.rotate60cw(h3); i += 1 }
    }

    // walk digits in base cell coordinate space
    val fijk = new FaceIJK(0, new IJK(0, 0, 0))
    h3ToFaceIjkWithInitializedFijk(h3, fijk)

    if (dir != Center) {
      val offset = new IJK(0, 0, 0)
      ijkNeighbor(offset, dir)
      var r = res - 1
      while (r >= 0) {
        if (isResClassIII(r + 1)) downAp7(offset) else downAp7r(offset)
        r -= 1
      }
      ijkAdd(fijk.coord, offset, fijk.coord)
      ijkNormalize(fijk.coord)
    }
    Some(fijk.coord)
  }

  /** inverse of [[cellToLocalIjk]]. */
  def localIjkToCell(origin: Long, ijkIn: IJK): Option[Long] = {
    val res = H3Core.getResolution(origin)
    val originBaseCell = H3Core.getBaseCell(origin)
    if (isBaseCellPentagon(originBaseCell)) return None

    var out = (1L << 59) | (res.toLong << 52) | H3Core.lowerDigitsOnes(res)
    val ijk = ijkIn.copy()
    if (res == 0) {
      if (ijk.i > 1 || ijk.j > 1 || ijk.k > 1) return None
      val dir = unitIjkToDigit(ijk)
      if (dir == InvalidDigit) return None
      val nb = baseCellNeighbors(originBaseCell)(dir)
      if (nb == InvalidBaseCell) return None
      return Some(out | (nb.toLong << 45))
    }

    var r = res - 1
    while (r >= 0) {
      val lastI = ijk.i; val lastJ = ijk.j; val lastK = ijk.k
      val lastCenter = new IJK(0, 0, 0)
      if (isResClassIII(r + 1)) {
        upAp7(ijk); lastCenter.set(ijk); downAp7(lastCenter)
      } else {
        upAp7r(ijk); lastCenter.set(ijk); downAp7r(lastCenter)
      }
      val diff = new IJK(lastI - lastCenter.i, lastJ - lastCenter.j, lastK - lastCenter.k)
      ijkNormalize(diff)
      val digit = unitIjkToDigit(diff)
      if (digit == InvalidDigit) return None
      out = H3Core.withDigit(out, r + 1, digit)
      r -= 1
    }

    if (ijk.i > 1 || ijk.j > 1 || ijk.k > 1) return None
    val dir = unitIjkToDigit(ijk)
    if (dir == InvalidDigit) return None
    val baseCell = if (dir == Center) originBaseCell else baseCellNeighbors(originBaseCell)(dir)
    if (baseCell == InvalidBaseCell || isBaseCellPentagon(baseCell)) return None
    out |= baseCell.toLong << 45
    if (dir != Center) {
      val rot = baseCellNeighborRots(originBaseCell)(dir)
      var i = 0
      while (i < rot) { out = H3Core.rotate60ccw(out); i += 1 }
    }
    Some(out)
  }

  /** local (i, j) coordinates of `h3` anchored at `origin` (k folded out). */
  def cellToLocalIj(origin: Long, h3: Long): Option[(Int, Int)] =
    cellToLocalIjk(origin, h3).map(c => (c.i - c.k, c.j - c.k))

  def localIjToCell(origin: Long, i: Int, j: Int): Option[Long] = {
    val c = new IJK(i, j, 0)
    ijkNormalize(c)
    localIjkToCell(origin, c)
  }

  // ---------------------------------------------------------------------
  // grid distance and paths
  // ---------------------------------------------------------------------

  @inline private def ijkDistance(a: IJK, b: IJK): Int = {
    val diff = new IJK(a.i - b.i, a.j - b.j, a.k - b.k)
    ijkNormalize(diff)
    math.max(diff.i, math.max(diff.j, diff.k))
  }

  /** BFS shortest path with parent reconstruction — the fallback for
    * pentagon-involved pairs where local IJK interpolation fails (the
    * reference/libh3 error out there; we go one step further and still
    * answer for nearby pairs). Deterministic: neighbors explored in the
    * canonical Directions order, first discoverer wins. */
  private def bfsShortestPath(a: Long, b: Long, maxK: Int = 64): Array[Long] = {
    if (a == b) return Array(a)
    val parent = new mutable.LongMap[Long]()
    parent(a) = a
    var frontier = List(a)
    var depth = 0
    var found = false
    while (!found && frontier.nonEmpty && depth < maxK) {
      val next = mutable.ListBuffer.empty[Long]
      for (c <- frontier if !found; n <- neighbors(c)) {
        if (!parent.contains(n)) {
          parent(n) = c
          if (n == b) found = true
          next += n
        }
      }
      frontier = next.toList
      depth += 1
    }
    if (!found) return Array.emptyLongArray
    val path = mutable.ArrayBuffer(b)
    var cur = b
    while (cur != a) { cur = parent(cur); path += cur }
    path.reverse.toArray
  }

  /** grid distance in steps; -1 when it cannot be computed (different res,
    * or farther than the BFS fallback bound on pentagon-involved pairs). */
  def gridDistance(a: Long, b: Long): Long = {
    (cellToLocalIjk(a, a), cellToLocalIjk(a, b)) match {
      case (Some(ca), Some(cb)) => ijkDistance(ca, cb).toLong
      case _ =>
        if (!H3Core.isValidCell(a) || !H3Core.isValidCell(b)) return -1L
        if (H3Core.getResolution(a) != H3Core.getResolution(b)) return -1L
        if (a == b) return 0L
        val p = bfsShortestPath(a, b)
        if (p.isEmpty) -1L else (p.length - 1).toLong
    }
  }

  private def ijkToCube(c: IJK): Unit = {
    c.i = -c.i + c.k
    c.j = c.j - c.k
    c.k = -c.i - c.j
  }

  private def cubeToIjk(c: IJK): Unit = {
    c.i = -c.i
    c.k = 0
    ijkNormalize(c)
  }

  /** line of cells from a to b (inclusive); empty when not computable. */
  def gridPathCells(a: Long, b: Long): Array[Long] = {
    if (!H3Core.isValidCell(a) || !H3Core.isValidCell(b)) return Array.emptyLongArray
    if (H3Core.getResolution(a) != H3Core.getResolution(b)) return Array.emptyLongArray
    val startOpt = cellToLocalIjk(a, a)
    val endOpt = cellToLocalIjk(a, b)
    if (startOpt.isEmpty || endOpt.isEmpty) return bfsShortestPath(a, b)
    val start = startOpt.get
    val end = endOpt.get
    val distance = ijkDistance(start, end)
    ijkToCube(start)
    ijkToCube(end)
    val n = distance.toDouble
    val iStep = if (distance > 0) (end.i - start.i) / n else 0.0
    val jStep = if (distance > 0) (end.j - start.j) / n else 0.0
    val kStep = if (distance > 0) (end.k - start.k) / n else 0.0
    val out = mutable.ArrayBuilder.make[Long]
    out.sizeHint(distance + 1)
    var s = 0
    while (s <= distance) {
      // cube round
      val ci = start.i + iStep * s
      val cj = start.j + jStep * s
      val ck = start.k + kStep * s
      var ri = math.round(ci).toInt
      var rj = math.round(cj).toInt
      var rk = math.round(ck).toInt
      val iDiff = math.abs(ri - ci)
      val jDiff = math.abs(rj - cj)
      val kDiff = math.abs(rk - ck)
      if (iDiff > jDiff && iDiff > kDiff) ri = -rj - rk
      else if (jDiff > kDiff) rj = -ri - rk
      else rk = -ri - rj
      val cur = new IJK(ri, rj, rk)
      cubeToIjk(cur)
      localIjkToCell(a, cur) match {
        case Some(cell) => out += cell
        case None => return bfsShortestPath(a, b)
      }
      s += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------------
  // directed edges (topology beyond the bit ops in H3Core)
  // ---------------------------------------------------------------------

  /** destination cell of a directed edge. For origins inside pentagon base
    * cells the direction -> neighbor assignment is our own deterministic
    * convention (ascending geometric neighbors), self-consistent with
    * [[cellsToDirectedEdge]]. */
  def edgeDestination(edge: Long): Long = {
    if (!H3Core.isValidDirectedEdge(edge)) return H3Core.H3Null
    val origin = H3Core.edgeOrigin(edge)
    val dir = H3Core.edgeDirection(edge)
    if (inPentagonBaseCell(origin)) {
      val ns = neighborsGeo(origin).sorted
      val pent = H3Core.isPentagon(origin)
      val idx = if (pent) dir - 2 else dir - 1
      if (idx < 0 || idx >= ns.length) return H3Core.H3Null
      return ns(idx)
    }
    val (dest, _) = h3NeighborRotations(origin, dir, 0)
    dest
  }

  /** the directed edge from origin to a neighboring destination; H3Null
    * when the cells are not neighbors. */
  def cellsToDirectedEdge(origin: Long, destination: Long): Long = {
    if (!H3Core.isValidCell(origin) || !H3Core.isValidCell(destination)) return H3Core.H3Null
    var d = 1
    while (d <= 6) {
      val e = H3Core.cellToDirectedEdge(origin, d)
      if (e != H3Core.H3Null && edgeDestination(e) == destination) return e
      d += 1
    }
    H3Core.H3Null
  }

  /** reversed directed edge. */
  def edgeReverse(edge: Long): Long = {
    val dest = edgeDestination(edge)
    if (dest == H3Core.H3Null) return H3Core.H3Null
    cellsToDirectedEdge(dest, H3Core.edgeOrigin(edge))
  }

  /** boundary of a directed edge: the shared vertices between origin and
    * destination boundaries (2 or 3 points with Class III distortion). */
  def edgeBoundaryRads(edge: Long): Array[LatLng] = {
    val origin = H3Core.edgeOrigin(edge)
    val dest = edgeDestination(edge)
    if (origin == H3Core.H3Null || dest == H3Core.H3Null) return Array.empty
    val bo = cellToBoundaryRads(origin)
    val bd = cellToBoundaryRads(dest)
    val eps = 1e-9
    // shared consecutive run of origin vertices that appear in dest's ring
    val shared = bo.zipWithIndex.filter { case (v, _) =>
      bd.exists(w => math.abs(w.lat - v.lat) < eps && math.abs(w.lng - v.lng) < eps)
    }
    if (shared.length < 2) return shared.map(_._1)
    // keep ring order, rotate so the run is consecutive
    val idxs = shared.map(_._2).toSet
    val n = bo.length
    var startIdx = shared.head._2
    // find a shared vertex whose predecessor is not shared -> run start
    shared.foreach { case (_, i) => if (!idxs.contains((i + n - 1) % n)) startIdx = i }
    val run = mutable.ArrayBuffer.empty[LatLng]
    var i = startIdx
    while (idxs.contains(i)) { run += bo(i); i = (i + 1) % n; if (run.length > bo.length) return run.toArray }
    run.toArray
  }

  /** exact edge length by summing great-circle spans of the edge boundary. */
  def edgeLengthRads(edge: Long): Double = {
    val b = edgeBoundaryRads(edge)
    if (b.length < 2) return 0.0
    var sum = 0.0
    var i = 0
    while (i < b.length - 1) { sum += greatCircleDistanceRads(b(i), b(i + 1)); i += 1 }
    sum
  }

  def edgeLengthKm(edge: Long): Double = edgeLengthRads(edge) * EarthRadiusKm
  def edgeLengthM(edge: Long): Double = edgeLengthKm(edge) * 1000.0
}
