package graft.h3

/** One-off deep validation: full canonical-vs-table sweep at a given res
  * (default 5 — ~2M cells, 12M steps). Not part of CI (H3CanonicalNeighborSpec
  * covers res 2-3 exhaustively); run manually for release assurance. */
object DeepCanonSweep {
  def main(args: Array[String]): Unit = {
    val res = if (args.nonEmpty) args(0).toInt else 5
    var nonPent = 0L; var pentOk = 0L; var bad = 0L
    val t0 = System.nanoTime()
    for (r0 <- H3Core.res0Cells(); c <- H3Core.cellToChildren(r0, res)) {
      if (!H3Core.isPentagonBaseCell(H3Core.getBaseCell(c))) {
        var d = 1
        while (d <= 6) {
          val t = H3Traversal.h3NeighborRotations(c, d, 0)._1
          val g = H3Traversal.canonicalNeighbor(c, d)
          if (t != g) { bad += 1; if (bad < 5) println(f"BAD $c%x dir $d: $t%x vs $g%x") }
          d += 1
        }
        nonPent += 1
      } else {
        val perDir = (1 to 6).map(d => H3Traversal.canonicalNeighbor(c, d))
        val nonNull = perDir.filter(_ != H3Core.H3Null)
        val geo = H3Traversal.neighborsGeo(c).toSet
        if (nonNull.distinct.length != nonNull.length || nonNull.toSet != geo) {
          bad += 1; if (bad < 5) println(f"PENTBAD $c%x: $perDir vs $geo")
        } else pentOk += 1
      }
    }
    println(f"[deep] res=$res nonPent=$nonPent pentOk=$pentOk bad=$bad " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
