package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Meta
import graft.volume.{ChunkStore, Volume}

/** SQL DDL surface for the precomputed store — a `TableCatalog`-lite that
  * maps `CREATE TABLE graft.vol USING precomputed OPTIONS (...)` onto the
  * reference's create-new-dataset path (reference: src/type.jl:85-99) and
  * hands every `loadTable` back to the DSv2 [[PrecomputedTable]], so
  * `INSERT INTO` / `SELECT` — and `CREATE TABLE … AS SELECT`, which Spark
  * plans as this catalog's createTable followed by an append through the
  * same WriteBuilder — ride the existing write/scan paths (pushdown,
  * pruning, canonical chunk keys) unchanged.
  *
  * Registered as `spark.sql.catalog.graft = graft.sources.PrecomputedCatalog`
  * ([[graft.plans.GraftExtensions.install]] sets it when unset). The
  * identifier → store-root mapping is SESSION-SCOPED in-memory state — the
  * metastore role at its smallest; a production deployment backs the same
  * catalog class with a shared metastore. DDL never deletes voxel data:
  * `DROP TABLE` deregisters the identifier and leaves the store intact
  * (object-store last-writer-wins semantics, exactly the reference's
  * posture — datasets outlive any one session's catalog).
  *
  * `CREATE TABLE` on a path that already carries an `info` ATTACHES the
  * existing dataset (its stored metadata wins; creation options other than
  * `path`/`mip` are rejected to surface intent mismatches loudly). On a
  * fresh path it writes the `info` from the options:
  *
  * {{{
  * CREATE TABLE graft.vol USING precomputed OPTIONS (
  *   path '/data/layer', voxel_type 'uint8', size '256,256,64',
  *   chunk_size '64,64,16', resolution '4,4,40', encoding 'gzip',
  *   voxel_offset '0,0,0', num_channels '1', layer_type 'image',
  *   num_mips '3')
  * }}}
  */
class PrecomputedCatalog extends TableCatalog {

  private var catName = "graft"
  // identifier key → (store root, optional pinned mip)
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Option[Int])]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keySet().asScala.toArray.sorted.map { k =>
      val parts = k.split("\\.")
      Identifier.of(parts.dropRight(1), parts.last)
    }.filter(_.namespace().sameElements(namespace))

  override def loadTable(ident: Identifier): Table =
    tables.get(key(ident)) match {
      case null =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catName) ++ ident.namespace() :+ ident.name())
      case (root, mip) => new PrecomputedTable(root, mip)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "precomputed: PARTITIONED BY is not supported — the chunk grid IS the partitioning")
    if (tables.containsKey(key(ident)))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catName) ++ ident.namespace() :+ ident.name())
    // a declared column list must be exactly the chunk-table schema — the
    // store's schema is fixed by the format, not by DDL
    if (schema.nonEmpty)
      require(schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        PrecomputedTable.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"precomputed: declared columns must match the chunk-table schema " +
          s"${PrecomputedTable.Schema.simpleString} (or be omitted)")
    def opt(k: String): Option[String] =
      Option(properties.get(k)).orElse(Option(properties.get(s"option.$k")))
    // Spark canonicalizes the `path` option into the `location` property
    // (and prefixes the rest with `option.`)
    val root = opt("path").orElse(Option(properties.get(TableCatalog.PROP_LOCATION)))
      .getOrElse(throw new IllegalArgumentException(
        s"precomputed: OPTIONS must carry path (got keys: ${properties.keySet().asScala.toSeq.sorted.mkString(", ")})"))
    val mip = opt("mip").map(_.toInt)
    val spark = SparkSession.active
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val creationKeys = Seq("voxel_type", "data_type", "size", "chunk_size",
      "resolution", "voxel_offset", "encoding", "layer_type", "num_channels",
      "num_mips")
    if (ChunkStore.exists(fs, root, "info")) {
      // ATTACH: the stored info is authoritative; silently ignoring
      // conflicting creation options would hide a wrong mental model
      val stray = creationKeys.filter(opt(_).isDefined)
      require(stray.isEmpty,
        s"precomputed: $root already holds a dataset — CREATE attaches it; " +
          s"drop the creation options ${stray.mkString(", ")} (stored info wins)")
    } else {
      def triple(s: String): (Int, Int, Int) = {
        val a = s.split(",").map(_.trim.toInt)
        require(a.length == 3, s"precomputed: expected 'x,y,z', got '$s'")
        (a(0), a(1), a(2))
      }
      def tripleD(s: String): (Double, Double, Double) = {
        val a = s.split(",").map(_.trim.toDouble)
        require(a.length == 3, s"precomputed: expected 'x,y,z', got '$s'")
        (a(0), a(1), a(2))
      }
      val dt = Meta.VoxelType.fromName(
        opt("voxel_type").orElse(opt("data_type")).getOrElse("uint8"))
      val size = triple(opt("size").getOrElse(throw new IllegalArgumentException(
        "precomputed: creating a new dataset needs OPTIONS size 'x,y,z'")))
      val chunk = triple(opt("chunk_size").getOrElse("64,64,64"))
      val res = tripleD(opt("resolution").getOrElse("1,1,1"))
      val off = triple(opt("voxel_offset").getOrElse("0,0,0"))
      val scaleKey = s"${res._1.round}_${res._2.round}_${res._3.round}"
      val meta0 = Meta.VolumeMeta(
        layerType = opt("layer_type").getOrElse("image"),
        dataType = dt,
        numChannels = opt("num_channels").map(_.toInt).getOrElse(1),
        scales = Vector(Meta.ScaleMeta(scaleKey, chunk,
          opt("encoding").getOrElse("gzip"), res, size, off)))
      val meta = opt("num_mips").map(n => meta0.withNumMips(n.toInt)).getOrElse(meta0)
      Volume.create(spark, root, meta) // writes `info` (reference: type.jl:85-99)
    }
    tables.put(key(ident), (root, mip))
    new PrecomputedTable(root, mip)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "precomputed: ALTER TABLE is not supported — edit the store's info via the Volume API")

  override def dropTable(ident: Identifier): Boolean =
    // deregister ONLY — the dataset on the store outlives the catalog
    // entry (documented above); re-CREATE with the same path re-attaches
    tables.remove(key(ident)) != null

  /** `DROP TABLE … PURGE` must not be a silent alias for the deregister:
    * purge REQUESTS data deletion, and this catalog's contract is that DDL
    * never deletes voxel data (object-store last-writer-wins — datasets
    * outlive any one session's catalog). Refuse loudly; a store is removed
    * with storage tooling, not DDL. */
  override def purgeTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "precomputed: DROP TABLE ... PURGE is not supported — DDL never deletes " +
        "voxel data (plain DROP TABLE deregisters and keeps the store)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val v = tables.remove(key(oldIdent))
    if (v == null)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName) ++ oldIdent.namespace() :+ oldIdent.name())
    tables.put(key(newIdent), v)
  }
}
