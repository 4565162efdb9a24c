package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, sum}

import graft.core.{Grid, Meta}
import graft.volume.{Volume, VoxelBuffer}

/** Micro-audit for the columnar voxel path's widened types: times the same
  * ~9.4M-voxel VoxelScanExec aggregate over a u8 and a u64 volume. The u64
  * path must stay within ~2x of u8 (it moves 8x the bytes and widens to
  * Decimal(20,0); see VoxelScan.writeVoxel). */
object U64ScanBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)

    def scanTime(dtype: String, layer: String): Double = {
      val dt = Meta.VoxelType.fromName(dtype)
      val root = java.nio.file.Files.createTempDirectory(s"graft-u64b-$dtype").toString
      val meta = Meta.VolumeMeta(layer, dt, 1, Vector(
        Meta.ScaleMeta("1_1_1", (64, 64, 64), "gzip", (1, 1, 1), (256, 256, 256), (0, 0, 0))))
      val vol = Volume.create(spark, root, meta)
      vol.ingest(VoxelBuffer.sequenced(dt, 256, 256, 256, 1, (1, 1, 1)))
      def once: Double = {
        val t0 = System.nanoTime()
        val r = vol.voxels()
          .filter(col("x") <= 192 && col("y") <= 192)
          .agg(sum(col("value")), count(lit(1))).collect().head
        require(r.getLong(1) == 192L * 192 * 256, "row count mismatch")
        (System.nanoTime() - t0) / 1e9
      }
      val a = once; val b = once; val c = once
      math.min(a, math.min(b, c))
    }

    val t8 = scanTime("uint8", "image")
    val t64 = scanTime("uint64", "segmentation")
    println(f"""{"v_scan_u8":$t8%.3f,"v_scan_u64":$t64%.3f,"ratio":${t64 / t8}%.2f}""")
    spark.stop()
  }
}
