package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full evaluation through the `noop` sink
  * (`count()` would let Catalyst prune projection work), after a warmup
  * pass that absorbs JVM/codegen/session startup. Prints exactly one JSON
  * line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // opt-in reliable-checkpoint mode: with a dir set, Tables.materialize
    // takes the production (executor-loss-safe) branch instead of
    // localCheckpoint — same results, slightly more I/O (MaterializeSpec
    // pins the equivalence; this knob lets the branch run under the bench)
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a query may have persisted (e.g. the minhash shingle
      // set) so runs don't accumulate memory pressure across 2x37 queries
      spark.catalog.clearCache()
      dt
    }

    // warmup: session machinery + parquet footers + codegen paths
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    force("q01_agg"); force("q02_join5")

    // best-of-2: the first execution of a query pays one-time janino
    // compilation of its generated code (seconds for wide aggregates),
    // which is amortized away in any long-running deployment
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results0 = names.map { n =>
      val a = force(n); val b = force(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }

    // array-surface throughput (the reference's per-call MB/s metric,
    // src/modes/sequential.jl:62-63): 256^3 uint8 = 16 MiB ingest + cutout
    val arrayBench = try {
      import graft.core.{Grid, Meta}
      import graft.volume.{Volume, VoxelBuffer}
      val root = java.nio.file.Files.createTempDirectory("graft-bench-vol").toString
      val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
        Meta.ScaleMeta("1_1_1", (64, 64, 64), "gzip", (1, 1, 1), (256, 256, 256), (0, 0, 0))))
      val vol = Volume.create(spark, root, meta)
      val buf = VoxelBuffer.sequenced(Meta.TUInt8, 256, 256, 256, 1, (1, 1, 1))
      def best2(f: => Unit): Double = {
        def once = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
        val a = once; math.min(a, once)
      }
      val tIngest = best2(vol.ingest(buf))
      var out: VoxelBuffer = null
      val tCutout = best2 { out = vol.cutout(Grid.Box(1, 256, 1, 256, 1, 256)) }
      require(out == buf, "array bench roundtrip mismatch")
      // native VoxelScan throughput: box-pruned scan + aggregate over ~9.4M
      // voxels through the custom Catalyst leaf (exercises VoxelScanExec's
      // row production, not the driver cutout path)
      graft.plans.GraftExtensions.install(spark)
      import org.apache.spark.sql.functions.{col, sum, count, lit}
      val tScan = best2 {
        val r = vol.voxels()
          .filter(col("x") <= 192 && col("y") <= 192)
          .agg(sum(col("value")), count(lit(1))).collect().head
        require(r.getLong(1) == 192L * 192 * 256, "scan row count mismatch")
      }
      // whole-volume re-layout throughput (one shuffle by destination chunk)
      val tRechunk = best2 {
        val dst = java.nio.file.Files.createTempDirectory("graft-bench-rck").toString
        val n = graft.ops.VolumeOps.rechunk(vol, Grid.Box(1, 256, 1, 256, 1, 256),
          dst, chunkSize = (128, 128, 32))
        require(n == 2L * 2 * 8, "rechunk chunk count mismatch")
      }
      Seq("v_ingest_256" -> tIngest, "v_cutout_256" -> tCutout, "v_scan_256" -> tScan,
        "v_rechunk_256" -> tRechunk)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] array bench failed: $e"); Seq.empty
    }
    val results = results0 ++ arrayBench
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the driver parses this line from the log tail: stop Spark FIRST (its
    // shutdown logging would otherwise interleave mid-line), flush both
    // streams, then emit the JSON as one atomic write
    spark.stop()
    System.err.flush()
    System.out.flush()
    System.out.println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
