package graft.sources.bincode

import org.scalatest.funsuite.AnyFunSuite

/**
 * Wire-level conformance for the roaring-treemap and IndexBlock decoders
 * against hand-built byte vectors following the published formats (the
 * RoaringFormatSpec portable layout; h3ron's compressed.rs RLE). The
 * Germany fixture only exercises ARRAY containers (chain cell sets are
 * small), so the bitset, run, offsets-threshold and multi-key paths are
 * pinned here with vectors assembled independently of the decoder.
 */
class RoaringDecodeSpec extends AnyFunSuite {

  // ---- little-endian byte builders (independent of the reader's Cursor) --
  private class W {
    private val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): W = { b += v.toByte; this }
    def u16(v: Int): W = { b += (v & 0xFF).toByte += ((v >> 8) & 0xFF).toByte; this }
    def u32(v: Long): W = { (0 until 4).foreach(i => b += ((v >> (8 * i)) & 0xFF).toByte); this }
    def u64(v: Long): W = { (0 until 8).foreach(i => b += ((v >> (8 * i)) & 0xFF).toByte); this }
    def raw(xs: Array[Byte]): W = { b ++= xs; this }
    def bytes: Array[Byte] = b.toArray
  }

  private val SerialCookie = 12347L
  private val SerialCookieNoRun = 12346L

  /** Serialize one 32-bit roaring bitmap (portable format) from containers
    * described as (key16, values sorted, encodeAsRun). */
  private def bitmap32(containers: Seq[(Int, Seq[Int], Boolean)], forceNoRunCookie: Boolean = false): Array[Byte] = {
    val w = new W
    val size = containers.size
    val anyRun = containers.exists(_._3)
    require(!forceNoRunCookie || !anyRun)
    if (forceNoRunCookie) {
      w.u32(SerialCookieNoRun); w.u32(size.toLong)
    } else {
      w.u32(SerialCookie | ((size - 1).toLong << 16))
      val rb = new Array[Byte]((size + 7) / 8)
      containers.zipWithIndex.foreach { case ((_, _, isRun), i) =>
        if (isRun) rb(i >> 3) = (rb(i >> 3) | (1 << (i & 7))).toByte
      }
      w.raw(rb)
    }
    containers.foreach { case (key, vs, _) => w.u16(key); w.u16(vs.size - 1) }
    // offsets section: always for the no-run cookie, at size >= 4 otherwise.
    // Values are ignored by our reader (it parses sequentially) but must
    // occupy the right width for the stream to stay aligned.
    if (forceNoRunCookie || size >= 4) containers.foreach(_ => w.u32(0L))
    containers.foreach { case (_, vs, isRun) =>
      if (isRun) {
        // runs over consecutive values: (start, extraLen) pairs, run = [s, s+l]
        val runs = vs.foldLeft(List.empty[(Int, Int)]) {
          case ((s, l) :: tail, v) if v == s + l + 1 => (s, l + 1) :: tail
          case (acc, v) => (v, 0) :: acc
        }.reverse
        w.u16(runs.size)
        runs.foreach { case (s, l) => w.u16(s); w.u16(l) }
      } else if (vs.size <= 4096) vs.foreach(w.u16)
      else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >> 6) |= (1L << (v & 63)))
        words.foreach(w.u64)
      }
    }
    w.bytes
  }

  private def treemap(entries: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val w = new W
    w.u64(entries.size.toLong)
    entries.foreach { case (hi, bm) => w.u32(hi); w.raw(bm) }
    w.bytes
  }

  private def expect(hi: Long, key: Int, vs: Seq[Int]): Seq[Long] =
    vs.map(v => (hi << 32) | (key.toLong << 16) | v.toLong)

  test("array containers, multiple keys, no-run cookie (offsets always present)") {
    val bm = bitmap32(Seq((3, Seq(0, 7, 65535), false)), forceNoRunCookie = true)
    val bm2 = bitmap32(Seq((0, Seq(42), false)), forceNoRunCookie = true)
    val got = PreparedGraphBincode.decodeRoaringTreemap(
      treemap(Seq(5L -> bm, 0xFFFFFFFFL -> bm2))).toSeq
    assert(got == expect(5, 3, Seq(0, 7, 65535)) ++ expect(0xFFFFFFFFL, 0, Seq(42)))
  }

  test("run containers below the offsets threshold (size < 4, no offsets)") {
    val bm = bitmap32(Seq(
      (1, (100 to 149) ++ Seq(200), true), // two runs: [100,149], [200,200]
      (2, Seq(9, 10, 11), true)))
    val got = PreparedGraphBincode.decodeRoaringTreemap(treemap(Seq(7L -> bm))).toSeq
    assert(got == expect(7, 1, (100 to 149) ++ Seq(200)) ++ expect(7, 2, Seq(9, 10, 11)))
  }

  test("mixed containers at the offsets threshold (size = 4 with runs => offsets)") {
    val vsBit = (0 until 5000).map(_ * 13 % 65536).distinct.sorted
    assert(vsBit.size > 4096) // forces the bitset layout
    val bm = bitmap32(Seq(
      (0, Seq(1, 2, 3), false),
      (1, 500 to 800, true),
      (2, vsBit, false),
      (9, Seq(65535), false)))
    val got = PreparedGraphBincode.decodeRoaringTreemap(treemap(Seq(1L -> bm))).toSeq
    val want = expect(1, 0, Seq(1, 2, 3)) ++ expect(1, 1, 500 to 800) ++
      expect(1, 2, vsBit) ++ expect(1, 9, Seq(65535))
    assert(got == want)
  }

  test("bitset container alone under the no-run cookie") {
    val vs = (0 until 65536 by 13).toVector // 5042 values > 4096
    val bm = bitmap32(Seq((4, vs, false)), forceNoRunCookie = true)
    val got = PreparedGraphBincode.decodeRoaringTreemap(treemap(Seq(0L -> bm))).toSeq
    assert(got == expect(0, 4, vs))
  }

  test("decoded values are sorted unique (the assumption GermanyGraphSpec leans on)") {
    val bm = bitmap32(Seq((0, Seq(5, 6, 7), false), (1, Seq(0), false)),
      forceNoRunCookie = true)
    val got = PreparedGraphBincode.decodeRoaringTreemap(
      treemap(Seq(1L -> bm, 2L -> bm))).toSeq
    assert(got == got.sorted && got.distinct == got)
  }

  test("trailing garbage and bad cookies are rejected") {
    val bm = bitmap32(Seq((0, Seq(1), false)), forceNoRunCookie = true)
    val ok = treemap(Seq(0L -> bm))
    intercept[java.io.IOException] {
      PreparedGraphBincode.decodeRoaringTreemap(ok ++ Array[Byte](0))
    }
    val badCookie = new W().u64(1L).u32(0L).u32(999L).bytes
    intercept[java.io.IOException] {
      PreparedGraphBincode.decodeRoaringTreemap(badCookie)
    }
  }

  test("IndexBlock RLE round-trip against an independent encoder (h3ron's rle_encode)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 7, 63, 300)) {
      // spatially-close-style values: shared high bytes compress well
      val vals = Array.fill(n)(0x08A2000000000000L | rnd.nextInt(1 << 20).toLong)
      // transpose exactly as compressed.rs From<&[T]>: byte j of index i at i + j*n
      val buf = new Array[Byte](n * 8)
      for (i <- 0 until n; j <- 0 until 8)
        buf(i + j * n) = ((vals(i) >> (8 * j)) & 0xFF).toByte
      // h3ron rle_encode: emit first byte, then (count, byte) pairs, final count
      val rle = scala.collection.mutable.ArrayBuffer[Byte](buf(0))
      var occ = 1
      for (b <- buf.drop(1)) {
        if (b == rle.last && occ < 255) occ += 1
        else { rle += occ.toByte += b; occ = 1 }
      }
      rle += occ.toByte
      val got = PreparedGraphBincode.decodeIndexBlock(n, rle.toArray)
      assert(got.toSeq == vals.toSeq, s"n=$n")
    }
  }
}
