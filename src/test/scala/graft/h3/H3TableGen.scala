package graft.h3

/**
 * Regenerates the serialized lattice tables in [[H3Tables]] from the exact
 * derivations. Run with `Test/runMain graft.h3.H3TableGen` and paste the
 * four printed strings into H3Tables.scala.
 *
 * Note: the derivation of the base-cell step tables consults
 * H3Geo.faceIjkBaseCells (the constant-backed one) for fold identities;
 * those entries are themselves diffed against their derivation first, so
 * the bootstrap is sound as long as both diffs pass (H3TablesSpec).
 */
object H3TableGen {
  def main(args: Array[String]): Unit = {
    val f = H3Geo.deriveFaceIjkBaseCells()
    val flat = for {
      face <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2
      v <- f(face)(i)(j)(k)
    } yield v
    println("FACE_IJK=" + flat.mkString(","))
    val (nbr, rot, sub) = H3Traversal.deriveBaseCellTables()
    println("NBR=" + nbr.flatten.mkString(","))
    println("ROT=" + rot.flatten.mkString(","))
    println("SUBROT=" + sub.mkString(","))
    // E7 table: CROSS-CHECK ONLY — the shipped EdgeLengthAvgKmData pins
    // libh3 4.1's published constants for reference parity (do NOT paste
    // this output over them). The derivation must agree with the shipped
    // table to <1e-9 relative on the exact prefix res 0..5; the libh3 tail
    // does not follow √7 self-similarity and diverges from any lattice
    // extrapolation by up to 0.4% (see H3Tables.edgeLengthAvgKm scaladoc).
    val t0 = System.nanoTime()
    val edgeAvg = H3Traversal.deriveEdgeLengthAvgKmTable(5)
    println("EDGE_LEN_AVG_KM_DERIVED_CROSSCHECK=" + edgeAvg.map(_.toString).mkString(","))
    (0 to 5).foreach { r =>
      val rel = math.abs(edgeAvg(r) - H3Tables.edgeLengthAvgKm(r)) / H3Tables.edgeLengthAvgKm(r)
      require(rel < 1e-9, f"derivation drifted from shipped libh3 constants at res $r: $rel%.2e")
    }
    println(f"(edge-length derivation took ${(System.nanoTime() - t0) / 1e9}%.1f s; exact prefix res 0..5 agrees <1e-9)")
  }
}
