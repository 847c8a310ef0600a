package graft.sources.osm

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Spark DataSourceV2 for `.osm.pbf` files: `spark.read.format("osmpbf")
 * .option("entity", "nodes"|"ways").load(path)`. This completes P13: the
 * reference consumes PBF through the `osmpbfreader` crate on one machine
 * (h3ron-graph/src/io/osm.rs:67-108); here the SAME file format becomes a
 * distributed scan.
 *
 * Scale design: a PBF file is a sequence of independently decodable
 * compressed blobs (OSMHeader + OSMData, each ≤32 MB by spec). Planning
 * does ONE cheap framing pass per file (BlobHeader reads + seeks — no
 * payload decompression on the driver), then packs consecutive blobs into
 * input partitions of ~`maxPartitionBytes`. Executors seek straight to
 * their blob ranges, so a planet-scale file fans out across the cluster
 * with no preprocessing step. Column pruning reaches the decoder: when the
 * query drops `tags`, per-entity string-table resolution is skipped.
 *
 * Entities: `nodes` (id, lat, lon, tags), `ways` (id, refs, tags).
 * Relations are skipped, like the reference's reader loop (osm.rs:104).
 */
class OsmPbfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfSource.schemaFor(OsmPbfSource.entityOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(new CaseInsensitiveStringMap(properties))
}

object OsmPbfSource {
  val TagsType: MapType = MapType(StringType, StringType, valueContainsNull = false)

  def entityOf(options: CaseInsensitiveStringMap): String = {
    val e = options.getOrDefault("entity", "nodes").toLowerCase
    require(e == "nodes" || e == "ways", s"entity must be nodes|ways, got '$e'")
    e
  }

  def schemaFor(entity: String): StructType = entity match {
    case "nodes" => StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", DoubleType, nullable = false),
      StructField("tags", TagsType, nullable = false)))
    case "ways" => StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("refs", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("tags", TagsType, nullable = false)))
  }

  /** Resolve `path` (file or directory of *.osm.pbf) to concrete files. */
  def resolveFiles(path: String, conf: Configuration): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".osm.pbf"))
        .map(_.getPath).sortBy(_.toString)
    else Seq(p)
  }
}

final class OsmPbfTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val entity = OsmPbfSource.entityOf(options)
  override def name(): String = s"osmpbf(${options.get("path")}:$entity)"
  override def schema(): StructType = OsmPbfSource.schemaFor(entity)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(entity, opts)
}

final class OsmPbfScanBuilder(entity: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = OsmPbfSource.schemaFor(entity)
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new OsmPbfScan(entity, required,
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("osmpbf requires a path")),
    options.getLong("maxPartitionBytes", 128L << 20))
}

/** One partition = one file's consecutive OSMData blob ranges. Offsets and
  * sizes refer to the Blob message payloads (after each BlobHeader). */
final case class OsmPbfPartition(file: String, offsets: Array[Long], sizes: Array[Int])
  extends InputPartition

final class OsmPbfScan(entity: String, required: StructType, path: String,
    maxPartitionBytes: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"osmpbf $path entity=$entity"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val parts = ArrayBuffer.empty[InputPartition]
    OsmPbfSource.resolveFiles(path, conf).foreach { file =>
      val fs = file.getFileSystem(conf)
      val in = fs.open(file)
      val refs = try OsmPbfCodec.scanBlobRefs(in) finally in.close()
      // validate the header blob once at planning time (cheap, catches a
      // file requiring unsupported features before executors fan out)
      refs.find(_.blobType == OsmPbfCodec.HeaderType).foreach { h =>
        val hin = fs.open(file)
        try {
          hin.seek(h.dataOffset)
          val buf = new Array[Byte](h.dataSize)
          hin.readFully(buf)
          OsmPbfCodec.checkHeaderBlock(OsmPbfCodec.decodeBlob(buf))
        } finally hin.close()
      }
      val data = refs.filter(_.blobType == OsmPbfCodec.DataType)
      val offs = ArrayBuffer.empty[Long]
      val szs = ArrayBuffer.empty[Int]
      var acc = 0L
      data.foreach { b =>
        if (acc + b.dataSize > maxPartitionBytes && offs.nonEmpty) {
          parts += OsmPbfPartition(file.toString, offs.toArray, szs.toArray)
          offs.clear(); szs.clear(); acc = 0L
        }
        offs += b.dataOffset; szs += b.dataSize; acc += b.dataSize
      }
      if (offs.nonEmpty) parts += OsmPbfPartition(file.toString, offs.toArray, szs.toArray)
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfReaderFactory(entity, required.fieldNames)
}

final class OsmPbfReaderFactory(entity: String, columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OsmPbfPartitionReader(partition.asInstanceOf[OsmPbfPartition], entity, columns)
}

final class OsmPbfPartitionReader(part: OsmPbfPartition, entity: String,
    columns: Array[String]) extends PartitionReader[InternalRow] {
  private val decodeTags = columns.contains("tags")
  private val conf = new Configuration()
  private val fsPath = new Path(part.file)
  private val in = fsPath.getFileSystem(conf).open(fsPath)
  private var blobIdx = 0
  private var rows: Iterator[InternalRow] = Iterator.empty

  private def tagsData(tags: Seq[(String, String)]): ArrayBasedMapData =
    new ArrayBasedMapData(
      new GenericArrayData(tags.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      new GenericArrayData(tags.map(t => UTF8String.fromString(t._2)).toArray[Any]))

  private def nodeRow(n: OsmPbfCodec.OsmNode): InternalRow =
    new GenericInternalRow(columns.map[Any] {
      case "id" => n.id
      case "lat" => n.lat
      case "lon" => n.lon
      case "tags" => tagsData(n.tags)
    })

  private def wayRow(w: OsmPbfCodec.OsmWay): InternalRow =
    new GenericInternalRow(columns.map[Any] {
      case "id" => w.id
      case "refs" => new GenericArrayData(w.refs)
      case "tags" => tagsData(w.tags)
    })

  private def loadNextBlob(): Boolean = {
    if (blobIdx >= part.offsets.length) return false
    val buf = new Array[Byte](part.sizes(blobIdx))
    in.seek(part.offsets(blobIdx))
    in.readFully(buf)
    blobIdx += 1
    val block = OsmPbfCodec.decodePrimitiveBlock(OsmPbfCodec.decodeBlob(buf), decodeTags)
    rows =
      if (entity == "nodes") block.nodes.iterator.map(nodeRow)
      else block.ways.iterator.map(wayRow)
    true
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!rows.hasNext) if (!loadNextBlob()) return false
    current = rows.next()
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}
