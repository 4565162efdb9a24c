package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Grid, Meta}
import graft.volume.ChunkStore

/** DataSource V2 connector for the neuroglancer-"precomputed" chunk layout:
  * the store appears as a chunk table
  * `(mip, cx, cy, cz, x0, x1, y0, y1, z0, z1, key, blob)`.
  *
  * This is the engine's equivalent of the reference's backend dictionaries +
  * key iteration (reference: src/backends/, src/ChunkIterators.jl), done the
  * Spark way:
  *  - **filter pushdown** on cx/cy/cz (and the box columns) prunes chunks
  *    before any object is touched — the reference's "only enumerate
  *    intersecting chunks" planning (src/ChunkIterators.jl:20-24) expressed
  *    as `SupportsPushDownFilters`;
  *  - **column pruning**: a scan that doesn't need `blob` never fetches an
  *    object — `count(*)`/key listings are metadata-only
  *    (`SupportsPushDownRequiredColumns`);
  *  - **write support**: each row becomes one store object under its
  *    canonical chunk key.
  *
  * Usage: `spark.read.format("precomputed").option("mip", "1").load(root)`
  * or SQL `SELECT ... FROM precomputed.`/path/to/layer``.
  */
class PrecomputedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "precomputed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PrecomputedTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("precomputed: 'path' is required"))
    // no "mip" option → the table spans the whole pyramid (all scales)
    new PrecomputedTable(path, Option(properties.get("mip")).map(_.toInt))
  }
}

object PrecomputedTable {
  val Schema: StructType = StructType(Seq(
    StructField("mip", IntegerType, nullable = false),
    StructField("cx", IntegerType, nullable = false),
    StructField("cy", IntegerType, nullable = false),
    StructField("cz", IntegerType, nullable = false),
    StructField("x0", IntegerType, nullable = false),
    StructField("x1", IntegerType, nullable = false),
    StructField("y0", IntegerType, nullable = false),
    StructField("y1", IntegerType, nullable = false),
    StructField("z0", IntegerType, nullable = false),
    StructField("z1", IntegerType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))
}

class PrecomputedTable(root: String, mipOpt: Option[Int]) extends Table
    with SupportsRead with SupportsWrite {

  private lazy val meta: Meta.VolumeMeta = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = ChunkStore.fs(root, conf)
    val raw = ChunkStore.read(fs, root, "info")
    Meta.parse(new String(graft.core.Codec.GzipCodec.decode(raw), "UTF-8"))
  }

  /** (mip, scale) pairs this table exposes. */
  private def mips: Seq[(Int, Meta.ScaleMeta)] = mipOpt match {
    case Some(m) => Seq(m -> meta.scale(m))
    case None => meta.scales.indices.map(i => (i + 1) -> meta.scales(i))
  }

  override def name(): String = s"precomputed.`$root`"
  override def schema(): StructType = PrecomputedTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PrecomputedScanBuilder(root, mips)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PrecomputedWriteBuilder(root, mips, info.schema())
}

/** Chunk-id (and mip) bounds pushed down from Catalyst filters. */
final case class IdBounds(
    var cxLo: Int = Int.MinValue, var cxHi: Int = Int.MaxValue,
    var cyLo: Int = Int.MinValue, var cyHi: Int = Int.MaxValue,
    var czLo: Int = Int.MinValue, var czHi: Int = Int.MaxValue,
    var mipLo: Int = Int.MinValue, var mipHi: Int = Int.MaxValue) extends Serializable {
  def accepts(cx: Int, cy: Int, cz: Int): Boolean =
    cx >= cxLo && cx <= cxHi && cy >= cyLo && cy <= cyHi && cz >= czLo && cz <= czHi
  def acceptsMip(m: Int): Boolean = m >= mipLo && m <= mipHi
}

class PrecomputedScanBuilder(root: String, mips: Seq[(Int, Meta.ScaleMeta)])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val bounds = IdBounds()
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PrecomputedTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(tryPush)
    pushed = accepted
    // pushed filters are exact (we fully enforce the bound), so they need
    // not be re-evaluated — but returning them is also fine; we return only
    // the rejected ones as post-scan filters.
    rejected
  }

  private def tryPush(f: Filter): Boolean = f match {
    case EqualTo(a, v: Int) if isId(a) => setLo(a, v); setHi(a, v); true
    case GreaterThan(a, v: Int) if isId(a) => setLo(a, v + 1); true
    case GreaterThanOrEqual(a, v: Int) if isId(a) => setLo(a, v); true
    case LessThan(a, v: Int) if isId(a) => setHi(a, v - 1); true
    case LessThanOrEqual(a, v: Int) if isId(a) => setHi(a, v); true
    case And(l, r) => val a = tryPush(l); val b = tryPush(r); a && b
    case _ => false
  }

  private def isId(a: String): Boolean =
    a == "cx" || a == "cy" || a == "cz" || a == "mip"

  private def setLo(a: String, v: Int): Unit = a match {
    case "cx" => bounds.cxLo = math.max(bounds.cxLo, v)
    case "cy" => bounds.cyLo = math.max(bounds.cyLo, v)
    case "cz" => bounds.czLo = math.max(bounds.czLo, v)
    case "mip" => bounds.mipLo = math.max(bounds.mipLo, v)
  }
  private def setHi(a: String, v: Int): Unit = a match {
    case "cx" => bounds.cxHi = math.min(bounds.cxHi, v)
    case "cy" => bounds.cyHi = math.min(bounds.cyHi, v)
    case "cz" => bounds.czHi = math.min(bounds.czHi, v)
    case "mip" => bounds.mipHi = math.min(bounds.mipHi, v)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PrecomputedScan(root, mips, bounds, required)
}

class PrecomputedScan(root: String, mips: Seq[(Int, Meta.ScaleMeta)],
    bounds: IdBounds, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PrecomputedScan(root=$root, mips=${mips.map(_._1).mkString(",")}, bounds=$bounds, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // Chunk-id (and mip) pruning happens here, before any object read: keys
    // are parsed from each scale's listing and dropped unless inside the
    // pushed bounds.
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = ChunkStore.fs(root, conf)
    val keys = mips.filter { case (m, _) => bounds.acceptsMip(m) }.flatMap { case (m, scale) =>
      val (csx, csy, csz) = scale.chunkSize
      val ox = Grid.gridOffset(scale.voxelOffset._1, csx)
      val oy = Grid.gridOffset(scale.voxelOffset._2, csy)
      val oz = Grid.gridOffset(scale.voxelOffset._3, csz)
      ChunkStore.list(fs, root, scale.key).flatMap { k =>
        Grid.parseKey(k).flatMap { box =>
          val cx = Grid.chunkIdOf(box.x.lo, csx, ox)
          val cy = Grid.chunkIdOf(box.y.lo, csy, oy)
          val cz = Grid.chunkIdOf(box.z.lo, csz, oz)
          if (bounds.accepts(cx, cy, cz)) Some(PrecomputedChunk(m, scale.key, k, cx, cy, cz,
            box.x.lo, box.x.hi, box.y.lo, box.y.hi, box.z.lo, box.z.hi))
          else None
        }
      }
    }
    val slices = math.max(1, math.min(keys.length,
      SparkSession.active.sparkContext.defaultParallelism * 2))
    keys.grouped(math.max(1, (keys.length + slices - 1) / slices))
      .map(g => PrecomputedPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PrecomputedReaderFactory(root,
      new ChunkStore.SerializableConf(SparkSession.active.sessionState.newHadoopConf()),
      required)
}

final case class PrecomputedChunk(mip: Int, scaleKey: String, key: String,
    cx: Int, cy: Int, cz: Int,
    x0: Int, x1: Int, y0: Int, y1: Int, z0: Int, z1: Int)

final case class PrecomputedPartition(chunks: Array[PrecomputedChunk]) extends InputPartition

class PrecomputedReaderFactory(root: String,
    conf: ChunkStore.SerializableConf, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val chunks = partition.asInstanceOf[PrecomputedPartition].chunks
    new PartitionReader[InternalRow] {
      private lazy val fs = ChunkStore.fs(root, conf.conf)
      private var i = -1
      override def next(): Boolean = { i += 1; i < chunks.length }
      override def get(): InternalRow = {
        val c = chunks(i)
        val values = required.fieldNames.map {
          case "mip" => c.mip
          case "cx" => c.cx case "cy" => c.cy case "cz" => c.cz
          case "x0" => c.x0 case "x1" => c.x1
          case "y0" => c.y0 case "y1" => c.y1
          case "z0" => c.z0 case "z1" => c.z1
          case "key" => UTF8String.fromString(c.key)
          case "blob" => ChunkStore.read(fs, root, s"${c.scaleKey}/${c.key}")
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}

// ---------------- write path ----------------

class PrecomputedWriteBuilder(root: String, mips: Seq[(Int, Meta.ScaleMeta)],
    schema: StructType) extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder = this // overwrite-by-key semantics

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new PrecomputedBatchWrite(root, mips.toMap, schema)
  }
}

/** Each input row `(mip, cx, cy, cz, blob)` becomes one object under its
  * canonical chunk key in the row's mip level, clamped to that level's
  * volume box like the reference writer (src/type.jl:165-205). Commit is
  * per-object (last-writer-wins), matching the reference's object-store
  * semantics. */
class PrecomputedBatchWrite(root: String, scales: Map[Int, Meta.ScaleMeta], schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new ChunkStore.SerializableConf(
      SparkSession.active.sessionState.newHadoopConf())
    val idx = Map("mip" -> schema.fieldIndex("mip"),
      "cx" -> schema.fieldIndex("cx"), "cy" -> schema.fieldIndex("cy"),
      "cz" -> schema.fieldIndex("cz"), "blob" -> schema.fieldIndex("blob"))
    val scalesB = scales
    val rootB = root
    (partitionId: Int, taskId: Long) => new DataWriter[InternalRow] {
      private lazy val fs = ChunkStore.fs(rootB, conf.conf)
      private var written = 0L
      override def write(row: InternalRow): Unit = {
        val m = row.getInt(idx("mip"))
        val scaleB = scalesB.getOrElse(m,
          throw new IllegalArgumentException(s"row mip $m not in this table's scales"))
        val (csx, csy, csz) = scaleB.chunkSize
        val ox = Grid.gridOffset(scaleB.voxelOffset._1, csx)
        val oy = Grid.gridOffset(scaleB.voxelOffset._2, csy)
        val oz = Grid.gridOffset(scaleB.voxelOffset._3, csz)
        val cx = row.getInt(idx("cx")); val cy = row.getInt(idx("cy")); val cz = row.getInt(idx("cz"))
        val chunkBox = Grid.Box(Grid.chunkIval(cx, csx, ox), Grid.chunkIval(cy, csy, oy),
          Grid.chunkIval(cz, csz, oz))
        val clamped = Grid.clampHiTo(chunkBox, scaleB.volumeBox)
        val key = s"${scaleB.key}/${Grid.boxKey(clamped)}"
        ChunkStore.write(fs, rootB, key, row.getBinary(idx("blob")))
        written += 1
      }
      override def commit(): WriterCommitMessage = new WriterCommitMessage {}
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
