package graft.sources.bincode

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Reader for the reference's serialized routing graphs — the
 * `PreparedH3EdgeGraph<OrderedFloat<f64>>` bincode records its
 * `route_germany` bench loads (h3ron-graph/benches/route_germany.rs:15-25,
 * data/graph-germany_r7_f64.bincode.lz). Layout derived from the public
 * struct definitions, NOT from any serialized-format documentation:
 *
 *  - optional LZ4 FRAME compression (io/serde_util.rs:28-41 writes
 *    lz4_flex frames; `net.jpountz.lz4.LZ4FrameInputStream`, already on
 *    Spark's classpath, reads the same interchange format),
 *  - bincode 1.x defaults: little-endian, fixed-width ints, `usize`
 *    length prefixes as u64, `Option` as a 1-byte tag, unit enum
 *    variants as u32 ordinals,
 *  - record shape (graph/prepared.rs:74-79, 25-36; graph/longedge.rs:36-48;
 *    collections/compressed.rs:30-37; collections/treemap/serde.rs:9-20):
 *    {{{
 *    outgoing_edges: map<cell u64, vec<(edge u64, weight f64,
 *        longedge: Option<(in u64, out u64,
 *            IndexBlock{num u64, bytes: len-prefixed},
 *            treemap: len-prefixed roaring bytes, weight f64)>)>>
 *    h3_resolution: u8
 *    graph_nodes: map<cell u64, NodeType ordinal u32>
 *    }}}
 *
 * The long-edge payloads (shortcut adjuncts the reference derives during
 * `prepare`) are fully decoded — IndexBlock RLE + byte-transpose and the
 * roaring-treemap cell lookup — so the reference's own contraction output
 * is cross-validated against [[graft.graph.H3Graph.localGraph]]'s
 * re-derivation (GermanyGraphSpec). Parsing is driver-side by necessity — bincode is a sequential
 * format with no split points — and the parsed edge list immediately
 * becomes a distributed DataFrame; at 100 TB graphs live in parquet
 * (H3Graph P14), this reader exists for interchange with the reference's
 * fixtures.
 */
object PreparedGraphBincode {

  /** One decoded long-edge shortcut (graph/longedge.rs:36-48): the
    * reference's contraction output, attached to the simple edge that
    * starts the chain.
    *
    * @param edge      simple edge the shortcut is attached to (== inEdge)
    * @param inEdge    first directed edge of the chain
    * @param outEdge   last directed edge of the chain
    * @param edgePath  the full chain as successive directed edges
    *                  (IndexBlock, RLE over byte-transposed LE u64s,
    *                  collections/compressed.rs:126-158)
    * @param cellLookup cells touched by the chain (roaring treemap,
    *                  collections/treemap/serde.rs:9-20; portable 32-bit
    *                  roaring per RoaringFormatSpec)
    * @param weight    total chain weight */
  final case class RefLongEdge(
      edge: Long,
      inEdge: Long,
      outEdge: Long,
      edgePath: Array[Long],
      cellLookup: Array[Long],
      weight: Double)

  final case class ParsedGraph(
      resolution: Int,
      // (directed edge id, weight) of every simple edge
      edges: Array[(Long, Double)],
      // the reference's own contraction output, fully decoded
      longEdges: Array[RefLongEdge],
      // (cell, NodeType ordinal: 0=Origin 1=Destination 2=Both)
      nodes: Array[(Long, Int)]) {
    def longEdgeCount: Int = longEdges.length
  }

  private final class Cursor(b: Array[Byte]) {
    var pos = 0
    private def need(n: Int): Unit =
      if (pos + n > b.length)
        throw new java.io.IOException(
          s"truncated bincode record: need $n bytes at $pos of ${b.length}")
    def u8(): Int = { need(1); val v = b(pos) & 0xFF; pos += 1; v }
    def u32(): Long = {
      need(4)
      val v = (b(pos) & 0xFFL) | ((b(pos + 1) & 0xFFL) << 8) |
        ((b(pos + 2) & 0xFFL) << 16) | ((b(pos + 3) & 0xFFL) << 24)
      pos += 4; v
    }
    def u64(): Long = {
      need(8)
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xFFL); i -= 1 }
      pos += 8; v
    }
    def f64(): Double = java.lang.Double.longBitsToDouble(u64())
    def len(): Int = {
      val v = u64()
      if (v < 0 || v > Int.MaxValue)
        throw new java.io.IOException(s"implausible bincode length $v at ${pos - 8}")
      v.toInt
    }
    def u16(): Int = { need(2); val v = (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8); pos += 2; v }
    def skip(n: Int): Unit = { need(n); pos += n }
    def bytes(n: Int): Array[Byte] = {
      need(n); val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    def atEnd: Boolean = pos == b.length
  }

  /** Decode an `IndexBlock` payload: RLE pairs `(byte, repetitions)` expand
    * to `num * 8` bytes, byte-transposed — byte j of index i sits at
    * `i + j*num` (compressed.rs:256-271, 126-158). */
  private[bincode] def decodeIndexBlock(num: Int, rle: Array[Byte]): Array[Long] = {
    if (rle.length % 2 != 0)
      throw new java.io.IOException(s"odd IndexBlock RLE length ${rle.length}")
    val buf = new Array[Byte](num * 8)
    var bi = 0
    var i = 0
    while (i < rle.length) {
      val byte = rle(i)
      val rep = rle(i + 1) & 0xFF
      if (bi + rep > buf.length)
        throw new java.io.IOException(
          s"IndexBlock decompresses past ${buf.length} bytes")
      java.util.Arrays.fill(buf, bi, bi + rep, byte)
      bi += rep
      i += 2
    }
    if (bi != buf.length)
      throw new java.io.IOException(
        s"IndexBlock decompressed to $bi bytes, expected ${buf.length}")
    val out = new Array[Long](num)
    var p = 0
    while (p < num) {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (buf(p + j * num) & 0xFFL); j -= 1 }
      out(p) = v
      p += 1
    }
    out
  }

  /** Decode a serialized `RoaringTreemap` (roaring-rs `serialize_into`):
    * u64 LE map size, then per entry a u32 LE high-word key and a portable
    * 32-bit roaring bitmap (RoaringFormatSpec: cookie 12347 packs
    * `size-1` in the upper 16 bits and carries a run-container bitset;
    * cookie 12346 is the no-run layout with an explicit u32 size; offsets
    * present for 12346 always, for 12347 only at size >= 4; containers are
    * sorted u16 arrays at cardinality <= 4096, 1024-word bitsets above,
    * or `(start, len)` runs covering `[start, start+len]`). */
  private[bincode] def decodeRoaringTreemap(bytes: Array[Byte]): Array[Long] = {
    val c = new Cursor(bytes)
    val nMaps = c.len()
    val out = Array.newBuilder[Long]
    var m = 0
    while (m < nMaps) {
      val hi = c.u32() << 32
      val cookie = c.u32()
      val (size, runBits): (Int, Array[Byte]) =
        if ((cookie & 0xFFFFL) == 12347L) {
          val n = ((cookie >>> 16) + 1).toInt
          (n, c.bytes((n + 7) / 8))
        } else if (cookie == 12346L) (c.u32().toInt, null)
        else throw new java.io.IOException(s"bad roaring cookie $cookie")
      val keys = new Array[Long](size)
      val cards = new Array[Int](size)
      var ci = 0
      while (ci < size) {
        keys(ci) = c.u16().toLong << 16
        cards(ci) = c.u16() + 1
        ci += 1
      }
      if (runBits == null || size >= 4) c.skip(4 * size) // offsets section
      ci = 0
      while (ci < size) {
        val prefix = hi | keys(ci)
        val isRun = runBits != null && (runBits(ci >> 3) & (1 << (ci & 7))) != 0
        if (isRun) {
          val nRuns = c.u16()
          var r = 0
          while (r < nRuns) {
            val start = c.u16(); val len = c.u16()
            var v = start
            while (v <= start + len) { out += (prefix | v); v += 1 }
            r += 1
          }
        } else if (cards(ci) <= 4096) {
          var v = 0
          while (v < cards(ci)) { out += (prefix | c.u16()); v += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            val word = c.u64()
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0) out += (prefix | (w * 64 + bit))
              bit += 1
            }
            w += 1
          }
        }
        ci += 1
      }
      m += 1
    }
    if (!c.atEnd)
      throw new java.io.IOException(s"trailing roaring bytes at ${c.pos}")
    out.result()
  }

  /** Decompress (LZ4 frame, detected by magic) and fully read `path`. */
  private def readAllBytes(path: String): Array[Byte] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val isLz4Frame = raw.length >= 4 &&
      (raw(0) & 0xFF) == 0x04 && (raw(1) & 0xFF) == 0x22 &&
      (raw(2) & 0xFF) == 0x4D && (raw(3) & 0xFF) == 0x18
    if (!isLz4Frame) raw
    else {
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(raw))
      // long-checked sizing hint: Int arithmetic would overflow negative
      // for compressed inputs >= 512 MiB and crash the constructor
      val out = new java.io.ByteArrayOutputStream(
        math.min(raw.length.toLong * 4, Int.MaxValue - 8L).toInt)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
  }

  def read(path: String): ParsedGraph = {
    val c = new Cursor(readAllBytes(path))
    val mapLen = c.len()
    val edges = Array.newBuilder[(Long, Double)]
    val longEdges = Array.newBuilder[RefLongEdge]
    var i = 0
    while (i < mapLen) {
      c.u64() // origin cell key (redundant with the edge ids; skip)
      val vecLen = c.len()
      var j = 0
      while (j < vecLen) {
        val edge = c.u64()
        val weight = c.f64()
        edges += ((edge, weight))
        c.u8() match {
          case 0 => ()
          case 1 =>
            // LongEdge { in_edge, out_edge, edge_path: IndexBlock,
            //   cell_lookup: treemap bytes }, then the longedge weight
            val inEdge = c.u64()
            val outEdge = c.u64()
            val numIndexes = c.len() // IndexBlock.num_indexes
            val edgePath = decodeIndexBlock(numIndexes, c.bytes(c.len()))
            val cellLookup = decodeRoaringTreemap(c.bytes(c.len()))
            val w = c.f64()
            longEdges += RefLongEdge(edge, inEdge, outEdge, edgePath, cellLookup, w)
          case t => throw new java.io.IOException(s"bad Option tag $t at ${c.pos - 1}")
        }
        j += 1
      }
      i += 1
    }
    val resolution = c.u8()
    if (resolution < 0 || resolution > 15)
      throw new java.io.IOException(s"implausible graph resolution $resolution")
    val nodesLen = c.len()
    val nodes = new Array[(Long, Int)](nodesLen)
    var k = 0
    while (k < nodesLen) {
      val cell = c.u64()
      val t = c.u32()
      if (t < 0 || t > 2)
        throw new java.io.IOException(s"bad NodeType ordinal $t at ${c.pos - 4}")
      nodes(k) = (cell, t.toInt)
      k += 1
    }
    if (!c.atEnd)
      throw new java.io.IOException(s"trailing bytes after record at ${c.pos}")
    ParsedGraph(resolution, edges.result(), longEdges.result(), nodes)
  }

  val edgeSchema: StructType = StructType(Seq(
    StructField("origin", LongType, nullable = false),
    StructField("destination", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))

  /** The graph's simple edges as a distributed `(origin, destination,
    * weight)` frame — directed-edge ids resolved to their cell endpoints,
    * ready for [[graft.graph.H3Graph.graphFromEdgeList]]. */
  def edgesDF(spark: SparkSession, path: String): DataFrame = {
    val g = read(path)
    // edge-id -> endpoint resolution runs on the EXECUTORS: the driver
    // ships raw (edge, weight) pairs and never walks the H3 bit decode
    // itself
    val rdd = spark.sparkContext.parallelize(g.edges.toSeq, 32).map {
      case (edge, w) =>
        Row(graft.h3.H3Core.edgeOrigin(edge), graft.h3.H3Traversal.edgeDestination(edge), w)
    }
    spark.createDataFrame(rdd, edgeSchema)
  }

  /** [[edgesDF]] through a parquet cache keyed by the fixture's absolute
    * path, mtime and size: the first call parses the sequential bincode
    * record (driver-side, irreducible) and persists the edge frame; later
    * calls read splittable parquet. This mirrors the reference's bench
    * loading the graph ONCE outside the timed loop
    * (route_germany.rs:57-60) — a routing macro should measure routing,
    * not file parsing. Parse time is reported on stderr when the cache
    * populates, so it stays visible separately. */
  /** Bump when [[read]]/[[edgesDF]] semantics change: the cache key must
    * not serve a pre-fix parse after a parser fix (fixture mtime alone
    * cannot see code changes). Keys [[edgesDFCached]]'s directories. */
  private val CacheFormatVersion = 2

  /** [[edgesDF]] through a parquet cache keyed by (format version,
    * absolute path, mtime, size): the first call parses the sequential
    * bincode record (driver-side, irreducible) and persists the edge
    * frame; later calls read splittable parquet. This mirrors the
    * reference's bench loading the graph ONCE outside the timed loop
    * (route_germany.rs:57-60) — a routing macro should measure routing,
    * not file parsing. Parse time is reported on stderr when the cache
    * populates. Populate goes through a temp dir + atomic rename so a
    * concurrent reader never sees a half-written directory; a stale
    * rename target without _SUCCESS (killed mid-populate under a
    * committer that writes no marker) is deleted and rebuilt. */
  def edgesDFCached(spark: SparkSession, path: String,
      cacheRoot: String = "target/bincode-cache"): DataFrame = {
    val f = new java.io.File(path)
    val key =
      f"v$CacheFormatVersion-${f.getAbsolutePath.hashCode}%08x-${f.lastModified}-${f.length}"
    val dir = new java.io.File(cacheRoot, key)
    if (!new java.io.File(dir, "_SUCCESS").isFile) {
      val t0 = System.nanoTime()
      val tmp = new java.io.File(cacheRoot,
        s"$key.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        edgesDF(spark, path).write.mode("overwrite").parquet(tmp.getPath)
        if (!tmp.renameTo(dir)) {
          // target exists: either another JVM won the race (has _SUCCESS —
          // use theirs) or a previous populate died mid-write (no marker —
          // self-heal by replacing it with ours)
          if (!new java.io.File(dir, "_SUCCESS").isFile) {
            org.apache.commons.io.FileUtils.deleteQuietly(dir)
            require(tmp.renameTo(dir),
              s"bincode cache populate failed: cannot rename $tmp to $dir")
          }
        }
      } finally {
        // failed populates (or a lost race) must not leak tmp dirs
        if (tmp.exists()) org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
      System.err.println(
        f"[bincode] parsed $path in ${(System.nanoTime() - t0) / 1e9}%.2f s -> ${dir.getPath}")
    }
    spark.read.parquet(dir.getPath)
  }

  // ---- writer (interchange back to the reference) -------------------------

  private final class Out(capacityHint: Int) {
    private var b = new Array[Byte](math.max(64, capacityHint))
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > b.length) b = java.util.Arrays.copyOf(b, math.max(b.length * 2, pos + n))
    def u8(v: Int): Unit = { ensure(1); b(pos) = v.toByte; pos += 1 }
    def u32(v: Long): Unit = {
      ensure(4)
      var i = 0
      while (i < 4) { b(pos + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
      pos += 4
    }
    def u64(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { b(pos + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
      pos += 8
    }
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def bytes: Array[Byte] = java.util.Arrays.copyOf(b, pos)
  }

  /** Serialize an `(origin, destination, weight)` edge frame as a
    * reference-readable `PreparedH3EdgeGraph<f64>` record (LZ4 frame +
    * bincode layout as in [[read]]) — the interchange direction back to
    * the reference's P14 persistence (io/serde_util.rs serialize_into,
    * compress = true). Long-edge shortcuts are the reference's internal
    * derivation, so every `longedge` is written `None` (its own reader
    * accepts that; `PreparedH3EdgeGraph::from_h3edge_graph` re-derives
    * them). Node typing is derived from the edge list exactly as
    * [[graft.graph.H3Graph.nodes]] does. Driver-side by necessity —
    * bincode is sequential; this format IS a single-machine interchange
    * file, so the collect is bounded by `maxEdges` with the same fail-fast
    * discipline as [[graft.graph.H3Graph.collectAdjacency]] — a graph over
    * the bound belongs in parquet (P14), not in an interchange record. */
  def writeBincode(edges: DataFrame, path: String,
      maxEdges: Int = 10_000_000): Unit = {
    require(maxEdges >= 1 && maxEdges < Int.MaxValue, s"bad maxEdges $maxEdges")
    // bound enforced in the SAME execution as the collect (limit one past
    // the bound): a separate count() would both double the job and leave a
    // TOCTOU window on non-deterministic inputs — the second run could
    // materialize more rows than the one that was counted
    val rows = edges.select(col("origin"), col("destination"),
      col("weight").cast("double")).limit(maxEdges + 1).collect()
    require(rows.length <= maxEdges,
      s"writeBincode collects the edge list to the driver: more than " +
        s"$maxEdges edges — write parquet instead, or raise maxEdges " +
        "explicitly if the driver heap is sized for it")
    require(rows.nonEmpty, "refusing to write an empty graph")
    val res = graft.h3.H3Core.getResolution(rows.head.getLong(0))
    // group per origin (the reference's outgoing_edges map)
    val byOrigin = new java.util.TreeMap[Long, scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
    val nodes = new java.util.TreeMap[Long, Int]() // bit 0 = origin, bit 1 = destination
    rows.foreach { r =>
      val o = r.getLong(0); val d = r.getLong(1); val w = r.getDouble(2)
      require(graft.h3.H3Core.getResolution(o) == res &&
        graft.h3.H3Core.getResolution(d) == res,
        "mixed-resolution edge list cannot serialize as a prepared graph")
      var buf = byOrigin.get(o)
      if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty; byOrigin.put(o, buf) }
      buf += ((d, w))
      nodes.put(o, nodes.getOrDefault(o, 0) | 1)
      nodes.put(d, nodes.getOrDefault(d, 0) | 2)
    }
    val out = new Out(rows.length * 24 + nodes.size() * 12 + 64)
    out.u64(byOrigin.size().toLong)
    byOrigin.forEach { (o, buf) =>
      out.u64(o)
      out.u64(buf.length.toLong)
      buf.foreach { case (d, w) =>
        val e = graft.h3.H3Traversal.cellsToDirectedEdge(o, d)
        // cellsToDirectedEdge returns H3Null for non-neighbor pairs and
        // self-loops; writing that would produce a structurally valid but
        // CORRUPT record (all-zero edge ids) — fail fast instead
        require(e != 0L,
          s"cells $o -> $d are not H3 neighbors: only grid-adjacent edge " +
            "lists serialize as a prepared graph (contracted/synthetic " +
            "graphs belong in parquet)")
        out.u64(e)
        out.f64(w)
        out.u8(0) // longedge: None
      }
    }
    out.u8(res)
    out.u64(nodes.size().toLong)
    nodes.forEach { (cell, bits) =>
      out.u64(cell)
      // NodeType ordinals: 0 Origin, 1 Destination, 2 OriginAndDestination
      out.u32(bits match { case 1 => 0L; case 2 => 1L; case _ => 2L })
    }
    val fos = new java.io.FileOutputStream(path)
    // the LZ4 frame constructor itself performs I/O (frame header): keep
    // fos guarded so a failure there can't leak the descriptor
    try {
      val lz = new net.jpountz.lz4.LZ4FrameOutputStream(fos)
      try lz.write(out.bytes) finally lz.close()
    } catch { case e: Throwable =>
      try fos.close() catch { case _: Throwable => () }
      throw e
    }
  }
}
