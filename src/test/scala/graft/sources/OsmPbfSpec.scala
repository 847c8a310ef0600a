package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.SparkTestSession
import graft.graph.H3Graph
import graft.sources.osm.{OsmPbfCodec, Pbf}
import graft.sources.osm.OsmPbfCodec.{OsmNode, OsmWay}

/** P13 binary half: protobuf wire codec, OSM PBF block codec, the
  * splittable `osmpbf` DataSourceV2, and the two-path ingestion
  * conformance (PBF → graphFromOsm vs WKT → graphFromWays must produce
  * the identical edge set). */
class OsmPbfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("protobuf wire roundtrip: varint/zigzag edge values, packed fields") {
    val vals = Seq(0L, 1L, -1L, 127L, 128L, 300L, -300L, Int.MaxValue.toLong,
      Long.MaxValue, Long.MinValue, -987654321012345L)
    val w = new Pbf.Writer
    vals.foreach(w.writeVarint)
    val r = new Pbf.Reader(w.toBytes)
    vals.foreach(v => assert(r.readVarint() == v))
    assert(!r.hasMore)

    val zw = new Pbf.Writer
    zw.packedZigzagField(8, vals)
    val zr = new Pbf.Reader(zw.toBytes)
    val key = zr.readKey()
    assert(Pbf.fieldNumber(key) == 8 && (key & 7) == 2)
    assert(zr.packedZigzags().toSeq == vals)
  }

  // deterministic synthetic road network around (49.0, 8.4): a grid of
  // lattice-aligned nodes, ways with highway tags, one-way streets, a
  // rejected (untagged) way, and a way referencing a missing node
  private def roadNet: (Seq[OsmNode], Seq[OsmWay]) = {
    val nodes = for (i <- 0 until 6; j <- 0 until 6) yield
      OsmNode(id = (i * 6 + j + 1).toLong, lat = 49.0 + i * 0.01, lon = 8.4 + j * 0.01,
        tags = if ((i + j) % 5 == 0) Seq("crossing" -> "yes") else Nil)
    val ways = Seq(
      OsmWay(101L, Array(1L, 2L, 3L, 4L, 5L, 6L), Seq("highway" -> "residential")),
      OsmWay(102L, Array(1L, 7L, 13L, 19L, 25L, 31L), Seq("highway" -> "primary")),
      OsmWay(103L, Array(6L, 12L, 18L, 24L, 30L, 36L),
        Seq("highway" -> "secondary", "oneway" -> "yes")),
      OsmWay(104L, Array(31L, 32L, 33L, 34L, 35L, 36L), Seq("highway" -> "motorway")),
      OsmWay(105L, Array(3L, 9L, 15L), Seq("building" -> "yes")), // analyzer rejects
      OsmWay(106L, Array(15L, 999L, 21L), Seq("highway" -> "tertiary")), // missing ref
      OsmWay(107L, Array(21L, 22L), Nil)) // untagged: rejected
    (nodes, ways)
  }

  private def writeTempPbf(nodes: Seq[OsmNode], ways: Seq[OsmWay], blockSize: Int = 8000): String = {
    val f = Files.createTempFile("graft-osm", ".osm.pbf")
    OsmPbfCodec.writeFile(f.toString, nodes, ways, blockSize = blockSize)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("PBF file roundtrip: framing scan, zlib blobs, dense-node delta coding, tags") {
    val (nodes, ways) = roadNet
    val path = writeTempPbf(nodes, ways)
    val refs = OsmPbfCodec.scanBlobRefs(new java.io.FileInputStream(path))
    assert(refs.head.blobType == OsmPbfCodec.HeaderType)
    assert(refs.count(_.blobType == OsmPbfCodec.DataType) >= 1)

    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val decoded = refs.filter(_.blobType == OsmPbfCodec.DataType).map { b =>
      OsmPbfCodec.decodePrimitiveBlock(OsmPbfCodec.decodeBlob(
        java.util.Arrays.copyOfRange(bytes, b.dataOffset.toInt, b.dataOffset.toInt + b.dataSize)))
    }
    val gotNodes = decoded.flatMap(_.nodes)
    val gotWays = decoded.flatMap(_.ways)
    // coordinates roundtrip on the 100-nanodegree lattice (granularity 100):
    // compare quantized units, not raw doubles
    val q = OsmPbfCodec.quantizeCoord _
    assert(gotNodes.map(n => (n.id, q(n.lat), q(n.lon), n.tags.toMap)) ==
      nodes.map(n => (n.id, q(n.lat), q(n.lon), n.tags.toMap)))
    assert(gotWays.map(w => (w.id, w.refs.toSeq, w.tags.toMap)) ==
      ways.map(w => (w.id, w.refs.toSeq, w.tags.toMap)))
  }

  test("plain (non-dense) Node messages decode: zigzag id, coords, tags") {
    // hand-assemble a PrimitiveGroup with two `repeated Node` (field 1)
    // entries — the encoder always writes DenseNodes, so this exercises
    // the other decode branch real extracts may contain
    val st = new Pbf.Writer
    Seq("", "amenity", "cafe").foreach(s => st.stringField(1, s))
    def node(id: Long, lat: Double, lon: Double, tagged: Boolean): Pbf.Writer = {
      val n = new Pbf.Writer
      n.key(1, 0); n.writeZigzag(id)
      if (tagged) { n.packedVarintField(2, Seq(1L)); n.packedVarintField(3, Seq(2L)) }
      n.key(8, 0); n.writeZigzag(OsmPbfCodec.quantizeCoord(lat))
      n.key(9, 0); n.writeZigzag(OsmPbfCodec.quantizeCoord(lon))
      n
    }
    val g = new Pbf.Writer
    g.messageField(1, node(-7L, -33.45, -70.66, tagged = true))
    g.messageField(1, node(42L, 51.5, -0.12, tagged = false))
    val block = new Pbf.Writer
    block.messageField(1, st)
    block.messageField(2, g)
    block.varintField(17, 100L)
    val out = OsmPbfCodec.decodePrimitiveBlock(block.toBytes)
    val q = OsmPbfCodec.quantizeCoord _
    assert(out.nodes.map(n => (n.id, q(n.lat), q(n.lon), n.tags)) == Seq(
      (-7L, q(-33.45), q(-70.66), Seq("amenity" -> "cafe")),
      (42L, q(51.5), q(-0.12), Nil)))
  }

  test("header block with unsupported required feature is rejected") {
    val w = new Pbf.Writer
    w.stringField(4, "HistoricalInformation")
    intercept[IllegalArgumentException](OsmPbfCodec.checkHeaderBlock(w.toBytes))
    OsmPbfCodec.checkHeaderBlock(OsmPbfCodec.encodeHeaderBlock()) // ours passes
  }

  test("osmpbf source: nodes and ways scans, tag maps, multi-blob splits") {
    val (nodes, ways) = roadNet
    // blockSize=10 → many blobs; maxPartitionBytes tiny → many partitions
    val path = writeTempPbf(nodes, ways, blockSize = 10)
    val nodesDf = spark.read.format("osmpbf").option("entity", "nodes")
      .option("maxPartitionBytes", 256).load(path)
    val waysDf = spark.read.format("osmpbf").option("entity", "ways").load(path)

    assert(nodesDf.rdd.getNumPartitions > 1) // blob-level splitting engaged
    assert(nodesDf.count() == nodes.length)
    assert(waysDf.count() == ways.length)

    val n13 = nodesDf.filter(col("id") === 13L).select("lat", "lon", "tags").head()
    assert(OsmPbfCodec.quantizeCoord(n13.getDouble(0)) == 490200000L &&
      OsmPbfCodec.quantizeCoord(n13.getDouble(1)) == 84000000L)
    val tagged = nodesDf.filter(element_at(col("tags"), "crossing") === "yes").count()
    assert(tagged == nodes.count(_.tags.nonEmpty))

    val w103 = waysDf.filter(col("id") === 103L).head()
    assert(w103.getSeq[Long](w103.fieldIndex("refs")) == Seq(6L, 12L, 18L, 24L, 30L, 36L))
    assert(w103.getMap[String, String](w103.fieldIndex("tags")).toMap ==
      Map("highway" -> "secondary", "oneway" -> "yes"))

    // column pruning reaches the scan: tag-free projection still correct
    assert(nodesDf.select("id").as[Long].collect().sorted.toSeq ==
      nodes.map(_.id).sorted.toSeq)
  }

  test("two-path ingestion conformance: PBF → graphFromOsm == WKT → graphFromWays (P13)") {
    val (nodes, ways) = roadNet
    val path = writeTempPbf(nodes, ways)
    val res = 10

    val fromPbf = H3Graph.graphFromOsmPbf(spark, path, res)
      .select("origin", "destination", "edge", "weight")
      .as[(Long, Long, Long, Double)].collect().toSet

    // independent path: way WKT linestrings built driver-side from the same
    // road net (skipping the missing ref like the reference's filter_map)
    val coord = nodes.map(n => n.id -> (n.lon, n.lat)).toMap
    val wayRows = ways.map { w =>
      val pts = w.refs.toSeq.flatMap(coord.get)
      val wkt = "LINESTRING (" + pts.map { case (x, y) => s"$x $y" }.mkString(", ") + ")"
      (w.id, wkt, w.tags.toMap)
    }
    val waysWkt = wayRows.toDF("way_id", "wkt", "tags")
    val fromWkt = H3Graph.graphFromWays(waysWkt, col("way_id"), col("wkt"), res,
      H3Graph.highwayClassWeight(col("tags")), H3Graph.highwayBidirectional(col("tags")))
      .select("origin", "destination", "edge", "weight")
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(fromPbf.nonEmpty)
    assert(fromPbf == fromWkt)

    // analyzer semantics: building=yes and untagged ways contribute nothing;
    // oneway=yes has no reverse edges
    val oneWayCells = H3Graph.graphFromOsmPbf(spark, path, res)
    val g = oneWayCells.select("origin", "destination").as[(Long, Long)].collect().toSet
    val w103cells = graft.h3.H3Polygon.lineStringToCells(
      Array(6L, 12L, 18L, 24L, 30L, 36L).flatMap(coord.get), res)
    w103cells.sliding(2).foreach { case Array(a, b) =>
      if (a != b) assert(g.contains((a, b)) != g.contains((b, a)) || !g.contains((a, b)))
    }
  }

  test("malformed PBF inputs fail fast with clear errors, never hang or return garbage") {
    import graft.sources.osm.OsmPbfCodec
    def scan(bytes: Array[Byte]) =
      OsmPbfCodec.scanBlobRefs(new java.io.ByteArrayInputStream(bytes))

    // (1) absurd BlobHeader length (not a PBF file at all)
    val junk = Array.fill[Byte](64)(0x7F.toByte)
    intercept[IllegalArgumentException] { scan(junk) }

    // (2) header declares more payload than the file carries
    val (nodes, ways) = roadNet
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(writeTempPbf(nodes, ways)))
    intercept[IllegalArgumentException] { scan(good.dropRight(8)) }

    // (3) truncated mid-BlobHeader: EOF surfaces as an exception, not a loop
    intercept[Exception] { scan(good.take(6)) }

    // (4) corrupt zlib payload inside a Blob
    val refs = scan(good)
    val dataRef = refs.find(_.blobType == OsmPbfCodec.DataType).get
    val blob = java.util.Arrays.copyOfRange(good,
      dataRef.dataOffset.toInt, dataRef.dataOffset.toInt + dataRef.dataSize)
    blob(blob.length / 2) = (blob(blob.length / 2) ^ 0x55).toByte
    intercept[Exception] { OsmPbfCodec.decodeBlob(blob) }

    // (5) Blob advertising an unsupported compression field
    val w = new graft.sources.osm.Pbf.Writer()
    w.bytesField(4, Array[Byte](1, 2, 3)) // field 4 = lzma_data
    intercept[IllegalArgumentException] { OsmPbfCodec.decodeBlob(w.toBytes) }

    // (6) truncated INSIDE the 4-byte length prefix of the next blob:
    // must be an error, not a silently dropped tail (ADVICE r06)
    val full = scan(good)
    intercept[IllegalArgumentException] { scan(good ++ Array[Byte](0, 0)) }
    // whereas a clean end at a blob boundary parses fully
    assert(scan(good).length == full.length)
  }

  test("SerializableHadoopConf ships custom spark.hadoop.* settings to executors") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.custom.credential", "sekrit-value")
    val w = new graft.sources.osm.SerializableHadoopConf(conf)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(w); oos.close()
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[graft.sources.osm.SerializableHadoopConf]
    assert(back.value.get("fs.custom.credential") == "sekrit-value")
  }

  test("relations entity: codec roundtrip and source scan (members, roles, tags)") {
    val (nodes, ways) = roadNet
    val rels = Seq(
      OsmPbfCodec.OsmRelation(501L,
        Seq(OsmPbfCodec.OsmMember("way", 101L, "outer"),
          OsmPbfCodec.OsmMember("way", 104L, "inner"),
          OsmPbfCodec.OsmMember("node", 13L, "admin_centre")),
        Seq("type" -> "multipolygon", "name" -> "test-area")),
      OsmPbfCodec.OsmRelation(502L,
        Seq(OsmPbfCodec.OsmMember("relation", 501L, "")),
        Nil))
    val f = Files.createTempFile("graft-osm-rel", ".osm.pbf")
    OsmPbfCodec.writeFile(f.toString, nodes, ways, rels)
    f.toFile.deleteOnExit()

    // codec roundtrip
    val bytes = Files.readAllBytes(f)
    val decoded = OsmPbfCodec.scanBlobRefs(new java.io.ByteArrayInputStream(bytes))
      .filter(_.blobType == OsmPbfCodec.DataType).map { b =>
        OsmPbfCodec.decodePrimitiveBlock(OsmPbfCodec.decodeBlob(
          java.util.Arrays.copyOfRange(bytes, b.dataOffset.toInt, b.dataOffset.toInt + b.dataSize)))
      }
    assert(decoded.flatMap(_.relations) == rels)

    // source scan with the typed members column
    val relDf = spark.read.format("osmpbf").option("entity", "relations").load(f.toString)
    assert(relDf.count() == 2)
    val r501 = relDf.filter(col("id") === 501L).head()
    val members = r501.getSeq[org.apache.spark.sql.Row](r501.fieldIndex("members"))
    assert(members.map(m => (m.getString(0), m.getLong(1), m.getString(2))) ==
      Seq(("way", 101L, "outer"), ("way", 104L, "inner"), ("node", 13L, "admin_centre")))
    assert(r501.getMap[String, String](r501.fieldIndex("tags")).toMap ==
      Map("type" -> "multipolygon", "name" -> "test-area"))
    // column pruning without tags still resolves member roles
    val roles = relDf.select(col("id"), col("members")).filter(col("id") === 501L).head()
      .getSeq[org.apache.spark.sql.Row](1).map(_.getString(2))
    assert(roles == Seq("outer", "inner", "admin_centre"))
  }

  test("routing works end-to-end on a PBF-ingested graph") {
    val (nodes, ways) = roadNet
    val path = writeTempPbf(nodes, ways)
    val g = H3Graph.graphFromOsmPbf(spark, path, 9)
    val cells = g.select("origin").as[Long].collect()
    val routed = H3Graph.shortestPaths(spark, g, Seq(cells.min), Seq(cells.max))
    assert(routed.count() >= 0) // reachable or not, the plan must execute
  }
}
