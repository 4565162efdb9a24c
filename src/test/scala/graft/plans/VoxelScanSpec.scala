package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Grid, Meta}
import graft.core.Grid.Box
import graft.testutil.SparkSuite
import graft.volume.{Volume, VoxelBuffer}

class VoxelScanSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkSuite.spark; GraftExtensions.install(s); s }

  def newVolume(): (Volume, VoxelBuffer) = {
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("6_6_30", (100, 100, 5), "gzip", (6, 6, 30), (510, 510, 2022), (0, 0, 0))))
    val vol = Volume.create(spark, SparkSuite.tempDir("graft-vscan"), meta)
    val buf = VoxelBuffer.sequenced(Meta.TUInt8, 200, 200, 10, 1, (1, 1, 1))
    vol.ingest(buf)
    (vol, buf)
  }

  test("voxels() filter results match toVoxels on the same box") {
    val (vol, buf) = newVolume()
    val viaScan = vol.voxels()
      .filter(col("x").between(57, 123) && col("y").between(90, 110) && col("z").between(3, 8))
      .agg(sum("value"), count(lit(1))).collect().head
    val viaToVoxels = vol.toVoxels(Box(57, 123, 90, 110, 3, 8))
      .agg(sum("value"), count(lit(1))).collect().head
    assert(viaScan == viaToVoxels)
  }

  test("scan executes columnar: ColumnarToRow sits above VoxelScanExec") {
    val (vol, buf) = newVolume()
    val df = vol.voxels().filter(col("z") === 1)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("ColumnarToRow"), s"expected columnar transition in:\n$physical")
    assert(physical.contains("VoxelScanExec"), physical)
    // row-path / columnar-path agreement on values, order-insensitively
    val viaColumnar = df.agg(sum("value"), count(lit(1))).collect().head
    val viaDriver = vol.toVoxels(Box(vol.meta.scales.head.volumeBox.x.lo, vol.meta.scales.head.volumeBox.x.hi,
      vol.meta.scales.head.volumeBox.y.lo, vol.meta.scales.head.volumeBox.y.hi, 1, 1))
      .agg(sum("value"), count(lit(1))).collect().head
    assert(viaColumnar == viaDriver)
  }

  test("contradictory filters short-circuit to an empty scan") {
    val (vol, _) = newVolume()
    // x >= 100 AND x <= 1 narrows the box to a negative-length interval;
    // the physical scan must treat it as empty, not a garbage id space
    assert(vol.voxels().filter(col("x") >= 100 && col("x") <= 1).count() == 0)
    assert(vol.numChunks(Box(100, 1, 1, 10, 1, 10)) == 0)
    assert(vol.chunkTasks(Box(100, 1, 1, 10, 1, 10)).count() == 0)
    val empty = vol.cutout(Box(100, 1, 1, 10, 1, 10))
    assert(empty.sx == 0 && empty.sy == 0 && empty.sz == 0)
  }

  test("PushBoxFilters narrows the scan box in the optimized plan") {
    val (vol, _) = newVolume()
    val df = vol.voxels().filter(col("x") >= 101 && col("x") <= 150 && col("z") < 6)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("box=[101..150, 1..510, 1..5]"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("VoxelScanExec"), physical)
  }

  test("narrowed box reads only intersecting chunks (pruned I/O)") {
    val (vol, buf) = newVolume()
    // destroy chunks outside x<=100: a pruned scan must not touch them
    for (k <- Seq("100-200_0-100_0-5", "100-200_0-100_5-10", "100-200_100-200_0-5", "100-200_100-200_5-10"))
      assert(new java.io.File(vol.root, s"6_6_30/$k").delete())
    val strict = new Volume(spark, vol.root, vol.meta, 1, fillMissing = false)
    // strict mode: touching any deleted (x>100) chunk would throw, so a
    // successful count proves the box narrowing pruned them out
    val n = strict.voxels()
      .filter(col("x") <= 100 && col("y") <= 200 && col("z") <= 10).count()
    assert(n == 100L * 200 * 10)
  }

  test("unfilterable predicates still evaluate correctly as residuals") {
    val (vol, buf) = newVolume()
    val n = vol.voxels()
      .filter(col("x").between(1, 10) && col("y").between(1, 10) && col("z") === 1 && col("value") > 128)
      .count()
    var expect = 0L
    for (x <- 0 until 10; y <- 0 until 10) if (buf.getLong(x, y, 0) > 128) expect += 1
    assert(n == expect)
  }

  test("aggregation composes over the custom scan") {
    val (vol, buf) = newVolume()
    val rows = vol.voxels().filter(col("x").between(1, 100) && col("y").between(1, 100) && col("z").between(1, 5))
      .groupBy(col("z")).agg(count(lit(1)).as("n")).orderBy(col("z")).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == 100L * 100))
  }

  test("column pruning: coords-only scans never touch the store under zero-fill") {
    val (vol, _) = newVolume()
    // delete EVERY chunk: a pruned count must still succeed (no blob fetch)
    val dir = new java.io.File(vol.root, "6_6_30")
    dir.listFiles().foreach(f => assert(f.delete()))
    val n = vol.voxels()
      .filter(col("x").between(1, 200) && col("y").between(1, 200) && col("z").between(1, 10))
      .select(col("x"), col("y"), col("z"))
      .count()
    assert(n == 200L * 200 * 10)
    // strict mode still raises (fetch not skipped)
    val strict = new Volume(spark, vol.root, vol.meta, 1, fillMissing = false)
    assertThrows[org.apache.spark.SparkException] {
      strict.voxels().filter(col("x").between(1, 10) && col("y").between(1, 10) && col("z") === 1)
        .select(col("x")).count()
    }
  }

  test("u64 values scan exactly through both Decimal branches (high bit set and clear)") {
    val meta = Meta.VolumeMeta("image", Meta.TUInt64, 1, Vector(
      Meta.ScaleMeta("1_1_1", (4, 4, 2), "gzip", (1, 1, 1), (4, 4, 2), (0, 0, 0))))
    val vol = Volume.create(spark, SparkSuite.tempDir("graft-u64scan"), meta)
    val buf = new graft.volume.VoxelBuffer(Meta.TUInt64, 4, 4, 2, 1, (1, 1, 1),
      new Array[Byte](4 * 4 * 2 * 8))
    // x odd → value above 2^63 (unsigned top half), x even → small
    for (z <- 0 until 2; y <- 0 until 4; x <- 0 until 4)
      buf.setLong(x, y, z, 0, if (x % 2 == 1) java.lang.Long.MIN_VALUE + x + y else (x + 10L * y))
    vol.ingest(buf)
    val rows = vol.voxels().collect()
    assert(rows.length == 4 * 4 * 2)
    rows.foreach { r =>
      val (x, y) = (r.getInt(0), r.getInt(1))
      val got = r.getDecimal(4)
      val expected = if ((x - 1) % 2 == 1)
        new java.math.BigDecimal(new java.math.BigInteger(
          java.lang.Long.toUnsignedString(java.lang.Long.MIN_VALUE + (x - 1) + (y - 1))))
      else new java.math.BigDecimal((x - 1) + 10L * (y - 1))
      assert(got.compareTo(expected) == 0, s"($x,$y): $got != $expected")
    }
  }

  test("SQL metrics account fetched chunks, bytes, and output rows") {
    val (vol, _) = newVolume()
    def runAndMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      // collect() executes df's OWN QueryExecution (a write would plan a
      // fresh one and leave these metrics untouched)
      df.collect()
      val execs = df.queryExecution.executedPlan.collect { case v: VoxelScanExec => v }
      assert(execs.length == 1, df.queryExecution.executedPlan.toString)
      execs.head.metrics.map { case (k, m) => k -> m.value }
    }
    // value scan over one full chunk: exactly 1 object fetched, bytes > 0
    val m1 = runAndMetrics(vol.voxels()
      .filter(col("x").between(1, 100) && col("y").between(1, 100) && col("z").between(1, 5)))
    assert(m1("numOutputRows") == 100L * 100 * 5)
    assert(m1("chunksFetched") == 1)
    assert(m1("chunksMissing") == 0)
    assert(m1("bytesFetched") > 0)
    // coords-only scan: zero I/O, full row count (the pruning is observable)
    val m2 = runAndMetrics(vol.voxels()
      .filter(col("x").between(1, 200) && col("y").between(1, 200) && col("z").between(1, 10))
      .select(col("x"), col("y"), col("z")))
    assert(m2("numOutputRows") == 200L * 200 * 10)
    assert(m2("chunksFetched") == 0)
    assert(m2("bytesFetched") == 0)
  }
}
