package graft.sources.osm

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/**
 * OSM PBF block codec, implemented from the public format description
 * (wiki.openstreetmap.org/wiki/PBF_Format; message layouts from the
 * published fileformat.proto / osmformat.proto field numbers). This is the
 * binary half of P13 that the reference delegates to the `osmpbfreader`
 * crate (reference h3ron-graph/src/io/osm.rs:67-108 `read_pbf`); here it is
 * a standalone codec so the Spark source ([[OsmPbfTable]]) can split a file
 * at blob boundaries and decode blobs executor-side.
 *
 * Supported surface: DenseNodes + plain Nodes + Ways + Relations (with
 * tags). The reference's reader loop skips relations (osm.rs:104); they are
 * decoded here as extension surface — multipolygon relations are what feed
 * polyfill from real OSM extracts. Blobs may be `raw` or `zlib_data` (the
 * only compression the core format requires); encode always writes zlib.
 */
object OsmPbfCodec {

  /** Decoded OSM node. Coordinates are in nanodegree-derived doubles:
    * lat = 1e-9 * (latOffset + granularity * latUnits). */
  final case class OsmNode(id: Long, lat: Double, lon: Double, tags: Seq[(String, String)])

  /** Decoded OSM way: ordered node refs + tags. */
  final case class OsmWay(id: Long, refs: Array[Long], tags: Seq[(String, String)])

  /** One relation member: entity kind ("node"|"way"|"relation"), referenced
    * id, and the member's role string. */
  final case class OsmMember(mtype: String, ref: Long, role: String)

  /** Decoded OSM relation: ordered members + tags. */
  final case class OsmRelation(id: Long, members: Seq[OsmMember], tags: Seq[(String, String)])

  final case class Block(nodes: ArrayBuffer[OsmNode], ways: ArrayBuffer[OsmWay],
    relations: ArrayBuffer[OsmRelation])

  /** Member-type enum of osmformat.proto (0=NODE, 1=WAY, 2=RELATION). */
  val MemberTypes: Array[String] = Array("node", "way", "relation")

  /** One blob's location inside a .osm.pbf file (driver-side split unit). */
  final case class BlobRef(blobType: String, dataOffset: Long, dataSize: Int)

  val HeaderType = "OSMHeader"
  val DataType = "OSMData"

  /** Features this codec understands; a file *requiring* anything else must
    * be rejected per the format spec. */
  val SupportedFeatures: Set[String] = Set("OsmSchema-V0.6", "DenseNodes")

  // -------------------------------------------------------------- framing

  /** Scan the blob framing of a .osm.pbf stream WITHOUT decoding payloads:
    * each iteration reads the 4-byte big-endian BlobHeader length and the
    * BlobHeader message, then skips `datasize` bytes. This is the cheap
    * driver-side pass that turns one file into independently decodable
    * splits. */
  def scanBlobRefs(in: InputStream): Seq[BlobRef] = {
    val din = new DataInputStream(in)
    val refs = ArrayBuffer.empty[BlobRef]
    var offset = 0L
    var eof = false
    while (!eof) {
      // read the length prefix byte-wise: DataInputStream.readInt throws
      // the SAME EOFException for a clean end-of-stream and for 1-3
      // trailing bytes, which would silently drop a tail truncated inside
      // the prefix — only a -1 on the FIRST byte is a clean EOF
      val b0 = din.read()
      val headerLen = if (b0 < 0) { eof = true; -1 } else {
        val b1 = din.read(); val b2 = din.read(); val b3 = din.read()
        require(b1 >= 0 && b2 >= 0 && b3 >= 0,
          "truncated file: EOF inside a BlobHeader length prefix")
        (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
      }
      if (!eof) {
        require(headerLen > 0 && headerLen < (64 << 20), s"bad BlobHeader length $headerLen")
        val hb = new Array[Byte](headerLen)
        din.readFully(hb)
        var blobType = ""
        var dataSize = -1
        val r = new Pbf.Reader(hb)
        var key = r.readKey()
        while (key != 0L) {
          Pbf.fieldNumber(key) match {
            case 1 => blobType = r.readString()
            case 3 => dataSize = r.readVarint().toInt
            case _ => r.skip(key)
          }
          key = r.readKey()
        }
        require(dataSize >= 0, "BlobHeader missing datasize")
        val dataOffset = offset + 4L + headerLen
        refs += BlobRef(blobType, dataOffset, dataSize)
        var toSkip = dataSize.toLong
        while (toSkip > 0) {
          val n = din.skip(toSkip)
          require(n > 0, "unexpected EOF inside blob")
          toSkip -= n
        }
        offset = dataOffset + dataSize
      }
    }
    refs.toSeq
  }

  /** Decompress one Blob message's payload to the contained block bytes. */
  def decodeBlob(blob: Array[Byte]): Array[Byte] = {
    var raw: Array[Byte] = null
    var zlib: Array[Byte] = null
    var rawSize = -1
    val r = new Pbf.Reader(blob)
    var key = r.readKey()
    while (key != 0L) {
      Pbf.fieldNumber(key) match {
        case 1 => raw = r.readBytes()
        case 2 => rawSize = r.readVarint().toInt
        case 3 => zlib = r.readBytes()
        case n => throw new IllegalArgumentException(
          s"unsupported Blob compression (field $n) — only raw and zlib_data")
      }
      key = r.readKey()
    }
    if (raw != null) raw
    else {
      require(zlib != null, "Blob carries neither raw nor zlib_data")
      require(rawSize >= 0, "zlib Blob missing raw_size")
      val inflater = new Inflater()
      inflater.setInput(zlib)
      val out = new Array[Byte](rawSize)
      var off = 0
      while (off < rawSize && !inflater.finished()) {
        val n = inflater.inflate(out, off, rawSize - off)
        require(n > 0 || inflater.finished(), "truncated zlib data in Blob")
        off += n
      }
      inflater.end()
      require(off == rawSize, s"Blob raw_size $rawSize but inflated $off")
      out
    }
  }

  /** Validate an OSMHeader block: reject unknown required features. */
  def checkHeaderBlock(block: Array[Byte]): Unit = {
    val r = new Pbf.Reader(block)
    var key = r.readKey()
    while (key != 0L) {
      Pbf.fieldNumber(key) match {
        case 4 =>
          val f = r.readString()
          require(SupportedFeatures.contains(f), s"unsupported required_feature '$f'")
        case _ => r.skip(key)
      }
      key = r.readKey()
    }
  }

  // ------------------------------------------------------------- decode

  /** Decode one PrimitiveBlock. `decodeTags=false` skips the string-table
    * resolution work when the reader's pruned schema drops the tags column
    * (the string table itself must still be parsed — it is field 1 and the
    * groups reference it positionally, but per-entity lookups are skipped). */
  def decodePrimitiveBlock(block: Array[Byte], decodeTags: Boolean = true): Block = {
    val strings = ArrayBuffer.empty[String]
    val groups = ArrayBuffer.empty[Pbf.Reader]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    val r = new Pbf.Reader(block)
    var key = r.readKey()
    while (key != 0L) {
      Pbf.fieldNumber(key) match {
        case 1 =>
          val st = r.readDelimited()
          var k2 = st.readKey()
          while (k2 != 0L) {
            if (Pbf.fieldNumber(k2) == 1) strings += st.readString() else st.skip(k2)
            k2 = st.readKey()
          }
        case 2  => groups += r.readDelimited()
        case 17 => granularity = r.readVarint()
        case 19 => latOffset = r.readVarint()
        case 20 => lonOffset = r.readVarint()
        case _  => r.skip(key)
      }
      key = r.readKey()
    }
    val out = Block(ArrayBuffer.empty, ArrayBuffer.empty, ArrayBuffer.empty)
    def coord(offset: Long, units: Long): Double = 1e-9 * (offset + granularity * units)
    def tag(i: Int): String = strings(i)
    groups.foreach { g =>
      var k = g.readKey()
      while (k != 0L) {
        Pbf.fieldNumber(k) match {
          case 1 => // plain Node
            val n = g.readDelimited()
            var id = 0L; var lat = 0L; var lon = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            var k3 = n.readKey()
            while (k3 != 0L) {
              Pbf.fieldNumber(k3) match {
                case 1 => id = n.readZigzag()
                case 2 => keys = n.packedVarints()
                case 3 => vals = n.packedVarints()
                case 8 => lat = n.readZigzag()
                case 9 => lon = n.readZigzag()
                case _ => n.skip(k3)
              }
              k3 = n.readKey()
            }
            val tags = if (decodeTags)
              keys.zip(vals).toIndexedSeq.map { case (ki, vi) => (tag(ki.toInt), tag(vi.toInt)) }
            else Nil
            out.nodes += OsmNode(id, coord(latOffset, lat), coord(lonOffset, lon), tags)
          case 2 => // DenseNodes: delta-coded parallel arrays
            val d = g.readDelimited()
            var ids = Array.emptyLongArray
            var lats = Array.emptyLongArray
            var lons = Array.emptyLongArray
            var keysVals = Array.emptyLongArray
            var k3 = d.readKey()
            while (k3 != 0L) {
              Pbf.fieldNumber(k3) match {
                case 1  => ids = d.packedZigzags()
                case 8  => lats = d.packedZigzags()
                case 9  => lons = d.packedZigzags()
                case 10 => keysVals = d.packedVarints()
                case _  => d.skip(k3)
              }
              k3 = d.readKey()
            }
            var id = 0L; var la = 0L; var lo = 0L
            var kv = 0
            var i = 0
            while (i < ids.length) {
              id += ids(i); la += lats(i); lo += lons(i)
              var tags: List[(String, String)] = Nil
              if (keysVals.nonEmpty) {
                // interleaved k,v,k,v,...,0 per node; empty table = all-untagged
                while (kv < keysVals.length && keysVals(kv) != 0L) {
                  if (decodeTags) tags = (tag(keysVals(kv).toInt), tag(keysVals(kv + 1).toInt)) :: tags
                  kv += 2
                }
                kv += 1 // the 0 delimiter
              }
              out.nodes += OsmNode(id, coord(latOffset, la), coord(lonOffset, lo), tags.reverse)
              i += 1
            }
          case 3 => // Way
            val wmsg = g.readDelimited()
            var id = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            var refs = Array.emptyLongArray
            var k3 = wmsg.readKey()
            while (k3 != 0L) {
              Pbf.fieldNumber(k3) match {
                case 1 => id = wmsg.readVarint()
                case 2 => keys = wmsg.packedVarints()
                case 3 => vals = wmsg.packedVarints()
                case 8 => refs = wmsg.packedZigzags()
                case _ => wmsg.skip(k3)
              }
              k3 = wmsg.readKey()
            }
            // undo delta coding of refs in place
            var i = 1
            while (i < refs.length) { refs(i) += refs(i - 1); i += 1 }
            val tags = if (decodeTags)
              keys.zip(vals).toIndexedSeq.map { case (ki, vi) => (tag(ki.toInt), tag(vi.toInt)) }
            else Nil
            out.ways += OsmWay(id, refs, tags)
          case 4 => // Relation
            val rmsg = g.readDelimited()
            var id = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            var roles = Array.emptyLongArray
            var memids = Array.emptyLongArray
            var types = Array.emptyLongArray
            var k3 = rmsg.readKey()
            while (k3 != 0L) {
              Pbf.fieldNumber(k3) match {
                case 1  => id = rmsg.readVarint()
                case 2  => keys = rmsg.packedVarints()
                case 3  => vals = rmsg.packedVarints()
                case 8  => roles = rmsg.packedVarints()  // roles_sid
                case 9  => memids = rmsg.packedZigzags() // delta-coded
                case 10 => types = rmsg.packedVarints()
                case _  => rmsg.skip(k3)
              }
              k3 = rmsg.readKey()
            }
            require(roles.length == memids.length && types.length == memids.length,
              s"malformed Relation $id: parallel member arrays disagree " +
                s"(${memids.length} memids, ${roles.length} roles, ${types.length} types)")
            var i = 1
            while (i < memids.length) { memids(i) += memids(i - 1); i += 1 }
            // roles resolve unconditionally: they belong to the members
            // column, not tags, and the string table is parsed regardless
            val members = (0 until memids.length).map { j =>
              require(types(j) >= 0 && types(j) < MemberTypes.length,
                s"malformed Relation $id: member type ${types(j)}")
              OsmMember(MemberTypes(types(j).toInt), memids(j), tag(roles(j).toInt))
            }
            val tags = if (decodeTags)
              keys.zip(vals).toIndexedSeq.map { case (ki, vi) => (tag(ki.toInt), tag(vi.toInt)) }
            else Nil
            out.relations += OsmRelation(id, members, tags)
          case _ => g.skip(k) // anything newer than Relation
        }
        k = g.readKey()
      }
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Quantize a degree coordinate to the granularity-100 lattice the block
    * encodes (units of 100 nanodegrees), round-half-up — the exact
    * convention a SQL oracle can replicate as floor(x * 1e7 + 0.5). */
  def quantizeCoord(deg: Double): Long = math.floor(deg * 1e7 + 0.5).toLong

  /** Encode one PrimitiveBlock (DenseNodes + Ways + Relations, zlib'd into
    * a framed OSMData blob by [[writeFile]]; granularity 100, offsets 0).
    * Tag/role strings are interned into the block string table with index
    * 0 reserved as the DenseNodes delimiter, per the format. */
  def encodePrimitiveBlock(nodes: Seq[OsmNode], ways: Seq[OsmWay],
      relations: Seq[OsmRelation] = Nil): Array[Byte] = {
    val stringIndex = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def intern(s: String): Long = stringIndex.getOrElseUpdate(s, stringIndex.size).toLong

    val groups = new Pbf.Writer
    if (nodes.nonEmpty) {
      val dense = new Pbf.Writer
      var prevId = 0L; var prevLat = 0L; var prevLon = 0L
      val ids = ArrayBuffer.empty[Long]
      val lats = ArrayBuffer.empty[Long]
      val lons = ArrayBuffer.empty[Long]
      val keysVals = ArrayBuffer.empty[Long]
      nodes.foreach { n =>
        val la = quantizeCoord(n.lat)
        val lo = quantizeCoord(n.lon)
        ids += n.id - prevId; lats += la - prevLat; lons += lo - prevLon
        prevId = n.id; prevLat = la; prevLon = lo
        n.tags.foreach { case (k, v) => keysVals += intern(k); keysVals += intern(v) }
        keysVals += 0L
      }
      dense.packedZigzagField(1, ids)
      dense.packedZigzagField(8, lats)
      dense.packedZigzagField(9, lons)
      if (keysVals.exists(_ != 0L)) dense.packedVarintField(10, keysVals)
      val g = new Pbf.Writer
      g.messageField(2, dense)
      groups.messageField(2, g)
    }
    if (ways.nonEmpty) {
      val g = new Pbf.Writer
      ways.foreach { way =>
        val wm = new Pbf.Writer
        wm.varintField(1, way.id)
        if (way.tags.nonEmpty) {
          wm.packedVarintField(2, way.tags.map(t => intern(t._1)))
          wm.packedVarintField(3, way.tags.map(t => intern(t._2)))
        }
        val deltas = ArrayBuffer.empty[Long]
        var prev = 0L
        way.refs.foreach { ref => deltas += ref - prev; prev = ref }
        wm.packedZigzagField(8, deltas)
        g.messageField(3, wm)
      }
      groups.messageField(2, g)
    }
    if (relations.nonEmpty) {
      val g = new Pbf.Writer
      relations.foreach { rel =>
        val rm = new Pbf.Writer
        rm.varintField(1, rel.id)
        if (rel.tags.nonEmpty) {
          rm.packedVarintField(2, rel.tags.map(t => intern(t._1)))
          rm.packedVarintField(3, rel.tags.map(t => intern(t._2)))
        }
        if (rel.members.nonEmpty) {
          rm.packedVarintField(8, rel.members.map(m => intern(m.role)))
          val deltas = ArrayBuffer.empty[Long]
          var prev = 0L
          rel.members.foreach { m => deltas += m.ref - prev; prev = m.ref }
          rm.packedZigzagField(9, deltas)
          rm.packedVarintField(10, rel.members.map(m =>
            MemberTypes.indexOf(m.mtype).toLong))
        }
        g.messageField(4, rm)
      }
      groups.messageField(2, g)
    }

    val block = new Pbf.Writer
    val st = new Pbf.Writer
    stringIndex.keys.foreach(s => st.stringField(1, s))
    block.messageField(1, st)
    // groups' buffer already holds complete `repeated PrimitiveGroup`
    // fields, so its bytes append verbatim
    block.raw(groups.toBytes)
    block.varintField(17, 100L) // granularity
    block.toBytes
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw)
    d.finish()
    val out = new ByteArrayBuilder
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.append(buf, n)
    }
    d.end()
    out.result()
  }

  private final class ByteArrayBuilder {
    private val bos = new java.io.ByteArrayOutputStream()
    def append(buf: Array[Byte], n: Int): Unit = bos.write(buf, 0, n)
    def result(): Array[Byte] = bos.toByteArray
  }

  /** Wrap block bytes as a zlib Blob inside the 4-byte-BE-length +
    * BlobHeader framing and write it to `out`. */
  def writeFramedBlob(out: DataOutputStream, blobType: String, block: Array[Byte]): Unit = {
    val blob = new Pbf.Writer
    blob.varintField(2, block.length.toLong)
    blob.bytesField(3, deflate(block))
    val blobBytes = blob.toBytes
    val header = new Pbf.Writer
    header.stringField(1, blobType)
    header.varintField(3, blobBytes.length.toLong)
    val headerBytes = header.toBytes
    out.writeInt(headerBytes.length)
    out.write(headerBytes)
    out.write(blobBytes)
  }

  def encodeHeaderBlock(): Array[Byte] = {
    val w = new Pbf.Writer
    w.stringField(4, "OsmSchema-V0.6")
    w.stringField(4, "DenseNodes")
    w.stringField(16, "graft")
    w.toBytes
  }

  /** Write a complete .osm.pbf: OSMHeader + one OSMData blob per group of
    * `blockSize` entities (nodes, then ways, then relations — reference
    * readers make one pass, so referenced entities precede their
    * referencers, as in real extracts). Test/prep utility: production
    * ingestion READS pbf, it does not write it. */
  def writeFile(path: String, nodes: Seq[OsmNode], ways: Seq[OsmWay],
      relations: Seq[OsmRelation] = Nil, blockSize: Int = 8000): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      writeFramedBlob(out, HeaderType, encodeHeaderBlock())
      nodes.grouped(blockSize).foreach(g => writeFramedBlob(out, DataType, encodePrimitiveBlock(g, Nil)))
      ways.grouped(blockSize).foreach(g => writeFramedBlob(out, DataType, encodePrimitiveBlock(Nil, g)))
      relations.grouped(blockSize).foreach(g =>
        writeFramedBlob(out, DataType, encodePrimitiveBlock(Nil, Nil, g)))
    } finally out.close()
  }
}
