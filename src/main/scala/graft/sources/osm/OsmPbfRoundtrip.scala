package graft.sources.osm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders}

/**
 * In-plan PBF encode→decode roundtrips for the driver correctness query
 * (p31): each partition's rows are encoded into framed zlib'd OSMData
 * blobs (the complete on-disk path: PrimitiveBlock → Blob → BlobHeader
 * framing) and immediately decoded back. Values that survive are exactly
 * the values the format can carry — coordinates land on the granularity-100
 * lattice (`floor(deg * 1e7 + 0.5)`), which a SQL oracle replicates
 * bit-for-bit. Distributed by construction: one codec pass per partition,
 * no shuffle, no driver state.
 */
object OsmPbfRoundtrip {

  final case class NodeRow(id: Long, lat: Double, lon: Double, tagv: String)
  final case class WayRow(id: Long, refs: Seq[Long])

  /** One full-framing roundtrip of a block's bytes. */
  private def throughBlob(block: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    OsmPbfCodec.writeFramedBlob(dos, OsmPbfCodec.DataType, block)
    dos.flush()
    val bytes = bos.toByteArray
    val ref = OsmPbfCodec.scanBlobRefs(new ByteArrayInputStream(bytes)).head
    OsmPbfCodec.decodeBlob(java.util.Arrays.copyOfRange(
      bytes, ref.dataOffset.toInt, ref.dataOffset.toInt + ref.dataSize))
  }

  /** df(id, lat, lon, tagv) → same schema after a per-partition PBF
    * roundtrip (node tag key fixed to "t"). */
  def nodes(df: DataFrame): DataFrame = {
    val enc = Encoders.product[NodeRow]
    df.as(enc).mapPartitions { it =>
      it.grouped(8000).flatMap { g =>
        val block = OsmPbfCodec.encodePrimitiveBlock(
          g.map(r => OsmPbfCodec.OsmNode(r.id, r.lat, r.lon, Seq("t" -> r.tagv))), Nil)
        OsmPbfCodec.decodePrimitiveBlock(throughBlob(block)).nodes
          .map(n => NodeRow(n.id, n.lat, n.lon, n.tags.head._2)).iterator
      }
    }(enc).toDF()
  }

  /** df(id, refs) → same schema after a per-partition PBF roundtrip
    * (exercises the delta-zigzag ref coding). */
  def ways(df: DataFrame): DataFrame = {
    val enc = Encoders.product[WayRow]
    df.as(enc).mapPartitions { it =>
      it.grouped(8000).flatMap { g =>
        val block = OsmPbfCodec.encodePrimitiveBlock(Nil,
          g.map(r => OsmPbfCodec.OsmWay(r.id, r.refs.toArray, Nil)))
        OsmPbfCodec.decodePrimitiveBlock(throughBlob(block)).ways
          .map(w => WayRow(w.id, w.refs.toSeq)).iterator
      }
    }(enc).toDF()
  }
}
