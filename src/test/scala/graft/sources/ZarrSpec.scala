package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Codec, Grid, Meta}
import graft.core.Grid.Box
import graft.testutil.SparkSuite
import graft.volume.VoxelBuffer

/** Zarr v2 format coverage. The goldens are handcrafted from the PUBLIC
  * spec (no zarr library exists in this container): chunk files written as
  * raw C-order bytes with values derived from their (d0,d1,d2) indices, so
  * a correct reader must get the axis mapping, key naming, and edge-chunk
  * padding exactly right to reproduce them. */
class ZarrSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Handcraft a raw (null-compressor) C-order zarr store:
    * shape [4, 8, 16] (d0,d1,d2), chunks [2, 4, 8], dtype u1,
    * value(d0,d1,d2) = (d0*100 + d1*10 + d2) mod 251. */
  private def handcraftStore(): String = {
    val root = SparkSuite.tempDir("graft-zarr-golden")
    val zarray =
      """{"zarr_format": 2, "shape": [4, 8, 16], "chunks": [2, 4, 8],
        | "dtype": "|u1", "order": "C", "compressor": null,
        | "fill_value": 0, "filters": null}""".stripMargin
    Files.writeString(Paths.get(root, ".zarray"), zarray)
    def v(d0: Int, d1: Int, d2: Int): Byte = ((d0 * 100 + d1 * 10 + d2) % 251).toByte
    for (c0 <- 0 until 2; c1 <- 0 until 2; c2 <- 0 until 2) {
      // C-order within the chunk: d2 fastest, then d1, then d0
      val bytes = for {
        i0 <- 0 until 2; i1 <- 0 until 4; i2 <- 0 until 8
      } yield v(c0 * 2 + i0, c1 * 4 + i1, c2 * 8 + i2)
      Files.write(Paths.get(root, s"$c0.$c1.$c2"), bytes.toArray)
    }
    root
  }

  test("golden: handcrafted C-order store reads with exact axis mapping") {
    val root = handcraftStore()
    val vol = Zarr.open(spark, root)
    // axis mapping: x = d2 (16), y = d1 (8), z = d0 (4)
    assert(vol.ctx.volumeBox == Box(1, 16, 1, 8, 1, 4))
    assert(vol.ctx.chunkSize == (8, 4, 2))
    val cut = vol.cutout(Box(1, 16, 1, 8, 1, 4))
    for (z <- 1 to 4; y <- 1 to 8; x <- 1 to 16)
      assert(cut.getLong(x - 1, y - 1, z - 1) == ((z - 1) * 100 + (y - 1) * 10 + (x - 1)) % 251,
        s"voxel ($x, $y, $z)")
    // SQL over the zarr voxel view
    val sum = vol.toVoxels(Box(1, 16, 1, 1, 1, 1)).agg(org.apache.spark.sql.functions.sum("value"))
      .collect().head.getLong(0)
    assert(sum == (0 until 16).sum)
  }

  test("golden: padded edge chunks decode full-size, values clamped to shape") {
    // shape [3, 8] (2-d), chunks [2, 8]: the second d0-chunk is half padding
    val root = SparkSuite.tempDir("graft-zarr-pad")
    Files.writeString(Paths.get(root, ".zarray"),
      """{"zarr_format": 2, "shape": [3, 8], "chunks": [2, 8], "dtype": "|u1",
        | "order": "C", "compressor": null, "fill_value": 0, "filters": null}""".stripMargin)
    Files.write(Paths.get(root, "0.0"), (0 until 16).map(_.toByte).toArray)
    Files.write(Paths.get(root, "1.0"),
      ((100 until 108).map(_.toByte) ++ Array.fill[Byte](8)(99)).toArray) // row + padding
    val vol = Zarr.open(spark, root)
    assert(vol.ctx.volumeBox == Box(1, 8, 1, 3, 1, 1)) // x=d1, y=d0 (2-d → z=1)
    val cut = vol.cutout(Box(1, 8, 1, 3, 1, 1))
    for (x <- 1 to 8) {
      assert(cut.getLong(x - 1, 0, 0) == x - 1)
      assert(cut.getLong(x - 1, 1, 0) == 8 + x - 1)
      assert(cut.getLong(x - 1, 2, 0) == 100 + x - 1) // padding (99s) never surfaces
    }
  }

  test("roundtrip: create + ingest + reopen + cutout across codecs") {
    for (enc <- Seq("zlib", "blosclz", "identity")) {
      val root = SparkSuite.tempDir(s"graft-zarr-rt-$enc")
      val vol = Zarr.create(spark, root, shape = (20, 12, 6), chunks = (8, 4, 2),
        dataType = Meta.TUInt16, encoding = enc)
      val buf = VoxelBuffer.sequenced(Meta.TUInt16, 24, 12, 6, 1, (1, 1, 1))
        .slice(Box(1, 20, 1, 12, 1, 6)) // non-chunk-multiple shape in x
      // zarr writes must start chunk-aligned like precomputed ingest
      vol.ingest(VoxelBuffer.sequenced(Meta.TUInt16, 24, 12, 6, 1, (1, 1, 1)))
      val re = Zarr.open(spark, root)
      assert(re.ctx.keyStyle == "zarr-c" && re.ctx.padEdgeChunks)
      val cut = re.cutout(Box(1, 20, 1, 12, 1, 6))
      for (x <- 1 to 20; y <- 1 to 12 by 3; z <- 1 to 6)
        assert(cut.getLong(x - 1, y - 1, z - 1) == buf.getLong(x - 1, y - 1, z - 1), s"$enc ($x,$y,$z)")
      // stored objects use dotted zarr keys, full chunk grid
      val keys = new java.io.File(root).list().filterNot(_ == ".zarray").toSet
      assert(keys.forall(_.matches("""\d+\.\d+\.\d+""")), keys)
      assert(keys.contains("0.0.0") && keys.contains("2.2.2"), keys)
    }
  }

  test("zarr store works through the relational voxel surface (missingChunks, toVoxels)") {
    val root = SparkSuite.tempDir("graft-zarr-rel")
    val vol = Zarr.create(spark, root, shape = (16, 8, 4), chunks = (8, 4, 2),
      dataType = Meta.TUInt8, encoding = "zlib")
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 16, 8, 4, 1, (1, 1, 1)))
    assert(vol.missingChunks(Box(1, 16, 1, 8, 1, 4)).count() == 0)
    // delete one chunk object: missing set reports its zarr key
    assert(new java.io.File(root, "1.1.1").delete())
    assert(vol.missingChunks(Box(1, 16, 1, 8, 1, 4)).collect().toSet == Set("1.1.1"))
  }

  test("unsupported .zarray fields fail loudly") {
    def parse(s: String) = Zarr.parseZarray(s)
    intercept[IllegalArgumentException](parse(
      """{"zarr_format": 3, "shape": [4], "chunks": [2], "dtype": "|u1", "compressor": null}"""))
    intercept[IllegalArgumentException](parse(
      """{"zarr_format": 2, "shape": [4, 4], "chunks": [2, 2], "dtype": ">u2", "compressor": null}"""))
    intercept[IllegalArgumentException](parse(
      """{"zarr_format": 2, "shape": [4, 4], "chunks": [2, 2], "dtype": "|u1",
        | "compressor": {"id": "blosc", "cname": "lz4"}}""".stripMargin))
    intercept[IllegalArgumentException](parse(
      """{"zarr_format": 2, "shape": [4, 4], "chunks": [2, 2], "dtype": "|u1",
        | "compressor": null, "fill_value": 7}""".stripMargin))
  }

  test(".zarray JSON roundtrips through the serializer") {
    val z = Zarr.ZarrayMeta((16, 8, 4), (8, 4, 2), Meta.TUInt16, "zlib", "zarr-c")
    assert(Zarr.parseZarray(Zarr.toZarrayJson(z)) == z)
  }
}
