package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Grid, Meta}
import graft.testutil.SparkSuite
import graft.volume.{ChunkStore, Volume, VoxelBuffer}

/** The SQL DDL surface (r10 stretch directive): a volume is created,
  * ingested, and read back ENTIRELY from SQL — `CREATE TABLE ... USING
  * precomputed OPTIONS (...)` (≅ the reference's create-new-dataset path,
  * type.jl:85-99), `INSERT INTO ... SELECT` over the DSv2 chunk tables,
  * and plain `SELECT`. The voxel payload is then cross-checked through the
  * independent Volume.cutout path. */
class SqlDdlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkSuite.spark
    graft.plans.GraftExtensions.install(s) // registers the `graft` catalog
    s
  }

  private def seededVolume(): Volume = {
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("4_4_40", (32, 32, 8), "gzip", (4, 4, 40), (64, 64, 16), (0, 0, 0))))
    val vol = Volume.create(spark, SparkSuite.tempDir("graft-ddl-src"), meta)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 64, 64, 16, 1, (1, 1, 1)))
    vol
  }

  test("create + ingest + read a volume entirely from SQL") {
    val src = seededVolume()
    val dstRoot = SparkSuite.tempDir("graft-ddl-dst") + "/layer"
    // CREATE: writes the info from the options (the create-new-dataset path)
    spark.sql(s"""CREATE TABLE graft.ddl_dst USING precomputed OPTIONS (
      path '$dstRoot', voxel_type 'uint8', size '64,64,16',
      chunk_size '32,32,8', resolution '4,4,40', encoding 'gzip')""")
    val stored = Volume.open(spark, dstRoot)
    assert(stored.meta.dataType == Meta.TUInt8)
    assert(stored.meta.scale(1).chunkSize == ((32, 32, 8)))
    assert(stored.meta.scale(1).size == ((64, 64, 16)))
    // ATTACH the source store, then ingest dst FROM SQL (chunk-grain
    // conversion: both layers share grid + encoding, blobs move verbatim)
    spark.sql(s"CREATE TABLE graft.ddl_src USING precomputed OPTIONS (path '${src.root}')")
    spark.sql("INSERT INTO graft.ddl_dst SELECT * FROM graft.ddl_src")
    // read back from SQL: every chunk arrived under its canonical key
    val keys = spark.sql("SELECT key FROM graft.ddl_dst ORDER BY key")
      .collect().map(_.getString(0)).toSeq
    assert(keys.size == 8 && keys.contains("0-32_0-32_0-8"), keys)
    val n = spark.sql("SELECT count(*) AS n FROM graft.ddl_dst WHERE cx = 1").head.getLong(0)
    assert(n == 4)
    // the voxel payload survives bit-exactly (independent cutout path)
    val box = Grid.Box(1, 64, 1, 64, 1, 16)
    assert(Volume.open(spark, dstRoot).cutout(box) == src.cutout(box))
  }

  test("DDL guardrails: schema fixed by format; attach rejects creation options; drop keeps data") {
    val src = seededVolume()
    // a declared column list must match the chunk-table schema
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.ddl_bad (a INT) USING precomputed OPTIONS (path '/tmp/x')"))
    assert(e1.getMessage.contains("chunk-table schema"), e1.getMessage)
    // attaching an existing dataset with conflicting creation options is loud
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.ddl_bad USING precomputed OPTIONS (path '${src.root}', size '8,8,8')"))
    assert(e2.getMessage.contains("stored info wins"), e2.getMessage)
    // DROP deregisters but never deletes the dataset; re-CREATE re-attaches
    spark.sql(s"CREATE TABLE graft.ddl_keep USING precomputed OPTIONS (path '${src.root}')")
    spark.sql("DROP TABLE graft.ddl_keep")
    val fs = ChunkStore.fs(src.root, spark.sessionState.newHadoopConf())
    assert(ChunkStore.exists(fs, src.root, "info"), "DROP must not touch the store")
    spark.sql(s"CREATE TABLE graft.ddl_keep USING precomputed OPTIONS (path '${src.root}')")
    assert(spark.sql("SELECT count(*) FROM graft.ddl_keep").head.getLong(0) == 8)
    spark.sql("DROP TABLE graft.ddl_keep")
  }

  test("CTAS at chunk grain: CREATE TABLE ... AS SELECT ingests through the DSv2 write path") {
    val src = seededVolume()
    val dstRoot = SparkSuite.tempDir("graft-ddl-ctas") + "/layer"
    spark.sql(s"CREATE TABLE graft.ddl_ctas_src USING precomputed OPTIONS (path '${src.root}')")
    // one statement: create-new-dataset from the options AND ingest the
    // SELECT's chunk rows (Spark v2 CTAS = createTable + append through
    // the same WriteBuilder INSERT INTO uses — canonical keys, RMW rules)
    spark.sql(s"""CREATE TABLE graft.ddl_ctas USING precomputed OPTIONS (
      path '$dstRoot', voxel_type 'uint8', size '64,64,16',
      chunk_size '32,32,8', resolution '4,4,40', encoding 'gzip')
      AS SELECT * FROM graft.ddl_ctas_src""")
    val keys = spark.sql("SELECT key FROM graft.ddl_ctas ORDER BY key")
      .collect().map(_.getString(0)).toSeq
    assert(keys.size == 8 && keys.contains("0-32_0-32_0-8"), keys)
    // payload survives bit-exactly through the independent cutout path
    val box = Grid.Box(1, 64, 1, 64, 1, 16)
    assert(Volume.open(spark, dstRoot).cutout(box) == src.cutout(box))
    spark.sql("DROP TABLE graft.ddl_ctas")
    spark.sql("DROP TABLE graft.ddl_ctas_src")
  }

  test("DROP semantics: IF EXISTS is quiet; PURGE refuses to delete voxel data") {
    val src = seededVolume()
    // IF EXISTS on an unregistered identifier is a quiet no-op
    spark.sql("DROP TABLE IF EXISTS graft.ddl_never_created")
    // PURGE requests data deletion — the catalog's contract forbids it
    spark.sql(s"CREATE TABLE graft.ddl_purge USING precomputed OPTIONS (path '${src.root}')")
    val e = intercept[Exception](spark.sql("DROP TABLE graft.ddl_purge PURGE"))
    assert(e.getMessage.contains("never deletes"), e.getMessage)
    // the refusal left the registration AND the store intact
    assert(spark.sql("SELECT count(*) FROM graft.ddl_purge").head.getLong(0) == 8)
    spark.sql("DROP TABLE graft.ddl_purge")
    val fs = ChunkStore.fs(src.root, spark.sessionState.newHadoopConf())
    assert(ChunkStore.exists(fs, src.root, "info"), "plain DROP must keep the store")
  }

  test("DDL lifecycle: SHOW TABLES lists registrations; ALTER TABLE RENAME keeps the store") {
    val src = seededVolume()
    spark.sql(s"CREATE TABLE graft.ddl_old USING precomputed OPTIONS (path '${src.root}')")
    val listed = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(listed.contains("ddl_old"), listed)
    // the TO identifier is relative to the table's own catalog
    spark.sql("ALTER TABLE graft.ddl_old RENAME TO ddl_new")
    assert(spark.sql("SELECT count(*) FROM graft.ddl_new").head.getLong(0) == 8)
    val e = intercept[Exception](spark.sql("SELECT count(*) FROM graft.ddl_old").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    spark.sql("DROP TABLE graft.ddl_new")
  }
}
