package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Grid, Meta}
import graft.volume.{Volume, VoxelBuffer}

/** Write one chunk + its voxel view for the python/numpy byte-compat
  * cross-check (dev/check_byte_compat.py). */
object ByteCompatDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft-bc").toString
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("1_1_1", (16, 12, 8), "gzip", (1, 1, 1), (16, 12, 8), (0, 0, 0))))
    val vol = Volume.create(spark, root, meta)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 16, 12, 8, 1, (1, 1, 1)))
    vol.toVoxels(Grid.Box(1, 16, 1, 12, 1, 8))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/voxels.parquet")
    println(root)
    spark.stop()
  }
}
