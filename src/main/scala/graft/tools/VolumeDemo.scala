package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Grid, Meta}
import graft.core.Grid.Box
import graft.volume.{Volume, VoxelBuffer}

/** Usage sample / smoke driver for the array surface: create → ingest →
  * cutout → voxel view → SQL, on a local temp store. Run:
  * `sbt "runMain graft.tools.VolumeDemo"`. */
object VolumeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-volume-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("6_6_30", (100, 100, 5), "gzip", (6, 6, 30), (510, 510, 2022), (-300, -300, -10))))
    val vol = Volume.create(spark, root, meta)
    println(s"created volume at $root; volumeBox=${vol.ctx.volumeBox}")

    val buf = VoxelBuffer.sequenced(Meta.TUInt8, 200, 200, 10, 1, (1, 1, 1))
    vol.ingest(buf)
    println(s"ingested ${buf.numVoxels} voxels over ${vol.numChunks(buf.box)} chunks")
    println("chunk objects on disk: " + new java.io.File(root, "6_6_30").list().sorted.mkString(", "))

    val cut = vol.cutout(Box(57, 123, 90, 110, 3, 8))
    println(s"cutout box=${cut.box} firstVoxel=${cut.getLong(0, 0, 0)} " +
      s"matchesIngest=${cut == buf.slice(Box(57, 123, 90, 110, 3, 8))}")

    val vox = vol.toVoxels(Box(1, 200, 1, 200, 1, 10))
    vox.createOrReplaceTempView("voxels")
    spark.sql(
      """SELECT z, count(*) AS n, avg(value) AS mean, max(value) AS mx
        |FROM voxels GROUP BY z ORDER BY z""".stripMargin).show(5)

    println("missing chunks over a wider box: " +
      vol.missingChunks(Box(1, 300, 1, 200, 1, 10)).collect().mkString(", "))

    // probe: non-aligned write must be rejected with a clear message
    try vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 10, 10, 5, 1, (3, 1, 1)))
    catch { case e: IllegalArgumentException => println(s"non-aligned write rejected: ${e.getMessage}") }

    spark.stop()
  }
}

/** DSv2 + SQL-function surface demo: chunk table scans with pushdown,
  * SQL chunk-grid functions, generator-based voxel explode. */
object SqlSurfaceDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-sql-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ChunkExprs.register(spark)
    graft.functions.VectorExprs.register(spark)

    val root = java.nio.file.Files.createTempDirectory("graft-sqldemo").toString
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("6_6_30", (100, 100, 5), "gzip", (6, 6, 30), (510, 510, 2022), (0, 0, 0))))
    val vol = Volume.create(spark, root, meta)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 200, 200, 10, 1, (1, 1, 1)))

    val chunks = spark.read.format("precomputed").load(root)
    chunks.createOrReplaceTempView("chunks")
    println("chunk table:")
    spark.sql("SELECT cx, cy, cz, key, octet_length(blob) AS bytes FROM chunks ORDER BY key").show(false)
    val pruned = chunks.filter(col("cx") === 1 && col("cz") === 2)
    println("pruned scan plan: " + pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PrecomputedScan")).getOrElse("?"))
    println(s"pruned count = ${pruned.count()}")
    println("SQL chunk fns: " + spark.sql(
      "SELECT chunk_key(chunk_id(157, 100, 0), chunk_id(57, 100, 0), chunk_id(7, 5, 0), 100, 100, 5, 0, 0, 0) AS k")
      .collect().head.getString(0))
    println("vec fns: " + spark.sql(
      "SELECT round(vec_cosine(array(1.0D,2.0D,3.0D), array(3.0D,2.0D,1.0D)), 4)").collect().head.getDouble(0))

    // Catalyst-native voxel view with box pruning
    graft.plans.GraftExtensions.install(spark)
    val vox = vol.voxels().filter(col("x").between(101, 150) && col("z") < 6)
    println("optimized: " + vox.queryExecution.optimizedPlan.toString.linesIterator
      .find(_.contains("VoxelScan")).getOrElse("?").trim)
    println(s"pruned voxel count = ${vox.count()}")
    // coords-only scan: pruned output skips blob fetch entirely
    val coords = vol.voxels().filter(col("z") === 3).select(col("x"), col("y"))
    println("coords-only optimized: " + coords.queryExecution.optimizedPlan.toString.linesIterator
      .find(_.contains("VoxelScan")).getOrElse("?").trim)
    println(s"coords-only count = ${coords.count()}")
    spark.stop()
  }
}
