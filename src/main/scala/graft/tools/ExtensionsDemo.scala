package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Grid, Meta}
import graft.volume.{Volume, VoxelBuffer}

/** Proves the production registration path: a session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` gets the voxel-scan
  * rule/strategy and the SQL functions with no further calls. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-ext-demo")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("SQL fns via extensions: " + spark.sql(
      "SELECT chunk_key(chunk_id(157, 100, 0), 1, 2, 100, 100, 5, 0, 0, 0) AS k").collect().head.getString(0))
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("1_1_1", (32, 32, 4), "gzip", (1, 1, 1), (64, 64, 8), (0, 0, 0))))
    val vol = Volume.create(spark, java.nio.file.Files.createTempDirectory("graft-ext").toString, meta)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 64, 64, 8, 1, (1, 1, 1)))
    val vox = vol.voxels().filter(col("x") <= 32 && col("z") === 2)
    println("rule fired via extensions: " + vox.queryExecution.optimizedPlan.toString.linesIterator
      .find(_.contains("VoxelScan")).getOrElse("?").trim)
    println(s"count = ${vox.count()}")
    spark.stop()
  }
}
