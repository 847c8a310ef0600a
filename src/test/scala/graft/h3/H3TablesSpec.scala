package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/**
 * Regenerates the serialized lattice tables from their exact derivations
 * and diffs against the shipped constants in [[H3Tables]] — drift between
 * generator and constants fails here, at build time, instead of surfacing
 * as wrong traversal results (or an ExceptionInInitializerError) in
 * executor tasks.
 */
class H3TablesSpec extends AnyFunSuite {

  test("faceIjkBaseCells constants match the derivation") {
    val derived = H3Geo.deriveFaceIjkBaseCells()
    val shipped = H3Tables.faceIjkBaseCells
    for (f <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      assert(derived(f)(i)(j)(k).sameElements(shipped(f)(i)(j)(k)),
        s"entry ($f,$i,$j,$k): derived ${derived(f)(i)(j)(k).mkString("/")} " +
          s"!= shipped ${shipped(f)(i)(j)(k).mkString("/")}")
    }
  }

  test("base-cell neighbor/rotation constants match the derivation") {
    val (nbr, rot, sub) = H3Traversal.deriveBaseCellTables()
    val (snbr, srot, ssub) = H3Tables.baseCellTables
    for (bc <- 0 until 122) {
      assert(nbr(bc).sameElements(snbr(bc)), s"neighbors($bc)")
      assert(rot(bc).sameElements(srot(bc)), s"rots($bc)")
    }
    assert(sub.sameElements(ssub), "subRots")
  }

  test("constant tables decode fast (no derivation at first use)") {
    // decode path must be millisecond-scale: this is what executor JVMs pay
    val t0 = System.nanoTime()
    val t = H3Tables.faceIjkBaseCells
    val (n, _, _) = H3Tables.baseCellTables
    val ms = (System.nanoTime() - t0) / 1e6
    assert(t.length == 20 && n.length == 122)
    // generous bound; the derivation itself takes seconds
    assert(ms < 1000.0, s"table decode took ${ms}ms")
  }
}
