package graft.volume

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Config-only cloud-path coverage: the container has zero egress, so what
  * is testable is exactly the configuration the engine hands the Hadoop
  * connectors per (scheme, encoding) — the engine's analog of the
  * reference's per-backend PUT headers (S3Dicts.jl:57-77, GSDicts.jl:54-68).
  * Protocol dispatch itself (scheme → FileSystem) is Hadoop's, exercised
  * for file:// by every storage test in this suite tree. */
class CloudConfSpec extends AnyFunSuite {

  private def conf() = new Configuration(false)

  test("s3a + gzip chunks advertise Content-Encoding like the reference PUT") {
    val c = ChunkStore.storeConf(conf(), "s3a://bucket/layer", "gzip")
    assert(c.get("fs.s3a.object.content.encoding") == "gzip")
  }

  test("s3a + non-gzip chunks set no encoding header") {
    for (enc <- Seq("zstd", "identity", "blosclz", "jpeg")) {
      val c = ChunkStore.storeConf(conf(), "s3a://bucket/layer", enc)
      assert(c.get("fs.s3a.object.content.encoding") == null, enc)
    }
  }

  test("gs and file schemes set nothing (gcs-connector has no per-object knob; reads magic-sniff)") {
    for (root <- Seq("gs://bucket/layer", "file:///tmp/layer", "/tmp/layer")) {
      val c = ChunkStore.storeConf(conf(), root, "gzip")
      assert(c.get("fs.s3a.object.content.encoding") == null, root)
      // nothing else was introduced either
      assert(!c.iterator().hasNext, root)
    }
  }

  test("credential settings are never touched (provider chains stay default)") {
    val c = ChunkStore.storeConf(conf(), "s3a://bucket/layer", "gzip")
    for (k <- Seq("fs.s3a.access.key", "fs.s3a.secret.key",
        "fs.s3a.aws.credentials.provider", "fs.gs.auth.type",
        "google.cloud.auth.service.account.enable"))
      assert(c.get(k) == null, k)
  }

  test("the volume read/write path routes every store op through storeConf") {
    // file:// volume end-to-end still works with the extracted config path
    val spark = graft.testutil.SparkSuite.spark
    import graft.core.{Grid, Meta}
    val meta = Meta.VolumeMeta("image", Meta.TUInt8, 1, Vector(
      Meta.ScaleMeta("1_1_1", (16, 16, 4), "gzip", (1, 1, 1), (32, 32, 4), (0, 0, 0))))
    val vol = Volume.create(spark, graft.testutil.SparkSuite.tempDir("graft-cloudconf"), meta)
    val buf = VoxelBuffer.sequenced(Meta.TUInt8, 32, 32, 4, 1, (1, 1, 1))
    vol.ingest(buf)
    assert(vol.cutout(Grid.Box(1, 32, 1, 32, 1, 4)) == buf)
  }
}
