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
    // E7 table: exact through res 5 (2,016,842 cells; a few seconds),
    // geometric tail above — see deriveEdgeLengthAvgKmTable scaladoc
    val t0 = System.nanoTime()
    val edgeAvg = H3Traversal.deriveEdgeLengthAvgKmTable(5)
    println("EDGE_LEN_AVG_KM=" + edgeAvg.map(_.toString).mkString(","))
    println(f"(edge-length derivation took ${(System.nanoTime() - t0) / 1e9}%.1f s)")
  }
}
