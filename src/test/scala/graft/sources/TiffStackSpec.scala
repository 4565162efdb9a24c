package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Grid.Box
import graft.core.Meta
import graft.testutil.SparkSuite
import graft.volume.VoxelBuffer

/** TIFF image-stack format: per-slice REAL TIFF objects via javax.imageio,
  * metadata derived from the slice files themselves (no sidecar). */
class TiffStackSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("roundtrip: ingest writes real per-slice TIFFs; reopen derives geometry from headers") {
    for (dt <- Seq(Meta.TUInt8, Meta.TUInt16)) {
      val root = SparkSuite.tempDir(s"graft-tiff-$dt")
      val vol = TiffStack.create(spark, root, shape = (20, 12, 8), dataType = dt)
      val buf = VoxelBuffer.sequenced(dt, 20, 12, 8, 1, (1, 1, 1))
      vol.ingest(buf)
      // on-disk layout: one NNNN.tif per slice, nothing else, REAL TIFF magic
      val files = new java.io.File(root).list().sorted
      assert(files.toSeq == (0 until 8).map(z => f"$z%04d.tif"))
      val head = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "0000.tif")).take(4)
      assert((head(0) == 'I' && head(1) == 'I' && head(2) == 42 && head(3) == 0) ||
        (head(0) == 'M' && head(1) == 'M' && head(2) == 0 && head(3) == 42), "TIFF magic")
      // a third-party decode of one slice sees the engine's pixels
      val img = javax.imageio.ImageIO.read(new java.io.File(root, "0003.tif"))
      assert(img.getWidth == 20 && img.getHeight == 12)
      // reopen: W/H/dtype from the slice header, depth from the listing
      val re = TiffStack.open(spark, root)
      assert(re.ctx.keyStyle == "tiff-z")
      assert(re.meta.dataType == dt)
      assert(re.ctx.volumeBox == Box(1, 20, 1, 12, 1, 8))
      val cut = re.cutout(Box(1, 20, 1, 12, 1, 8))
      for (x <- 1 to 20; y <- 1 to 12 by 3; z <- 1 to 8)
        assert(cut.getLong(x - 1, y - 1, z - 1) == buf.getLong(x - 1, y - 1, z - 1),
          s"$dt ($x,$y,$z)")
    }
  }

  test("sparse stack: missing slices read as zeros; depth from the highest index") {
    val root = SparkSuite.tempDir("graft-tiff-sparse")
    val vol = TiffStack.create(spark, root, shape = (8, 4, 6), dataType = Meta.TUInt8)
    // write only slices 0 and 5 (chunk-aligned single-slice ingests)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 8, 4, 1, 1, (1, 1, 1)))
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 8, 4, 1, 1, (1, 1, 6)))
    val re = TiffStack.open(spark, root)
    assert(re.ctx.volumeBox == Box(1, 8, 1, 4, 1, 6))
    val cut = re.cutout(Box(1, 8, 1, 4, 1, 6))
    assert(cut.getLong(2, 1, 0) == VoxelBuffer.sequenced(Meta.TUInt8, 8, 4, 1, 1, (1, 1, 1)).getLong(2, 1, 0))
    for (z <- 2 to 5) assert(cut.getLong(3, 2, z - 1) == 0, s"slice $z should be zero-filled")
    assert(re.missingChunks(Box(1, 8, 1, 4, 1, 6)).collect().toSet ==
      Set("0001.tif", "0002.tif", "0003.tif", "0004.tif"))
    // listing enumeration agrees — and costs ONE directory-wide LIST (a
    // per-slice exact-name glob would pay the probe plan's request count)
    val lists0 = graft.volume.ChunkStore.listCalls.get()
    assert(re.presentChunks(Box(1, 8, 1, 4, 1, 6)).collect().toSet ==
      Set((1, 1, 1), (1, 1, 6)))
    assert(graft.volume.ChunkStore.listCalls.get() - lists0 == 1,
      "tiff-z listing must be a single flat-directory LIST")
  }

  test("open rejects non-canonical padding and duplicate slice indices") {
    val root = SparkSuite.tempDir("graft-tiff-pad")
    val vol = TiffStack.create(spark, root, shape = (8, 4, 2), dataType = Meta.TUInt8)
    vol.ingest(VoxelBuffer.sequenced(Meta.TUInt8, 8, 4, 1, 1, (1, 1, 1)))
    import java.nio.file.{Files, Paths}
    // duplicate spellings for one index (7.tif AND 0007.tif): the read path
    // would resolve only one of them — open must refuse
    Files.copy(Paths.get(root, "0000.tif"), Paths.get(root, "7.tif"))
    Files.copy(Paths.get(root, "0000.tif"), Paths.get(root, "0007.tif"))
    val dup = intercept[IllegalArgumentException](TiffStack.open(spark, root))
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    // non-canonical padding alone: every read of slice 7 would silently
    // come back zero-filled — open must name the expected spelling
    Files.delete(Paths.get(root, "0007.tif"))
    val pad = intercept[IllegalArgumentException](TiffStack.open(spark, root))
    assert(pad.getMessage.contains("0007.tif"), pad.getMessage)
    // canonical stack still opens (depth re-derived from the one slice left)
    Files.delete(Paths.get(root, "7.tif"))
    assert(TiffStack.open(spark, root).ctx.volumeBox == Box(1, 8, 1, 4, 1, 1))
  }

  test("empty directory and corrupt slice fail loudly") {
    val root = SparkSuite.tempDir("graft-tiff-bad")
    intercept[IllegalArgumentException](TiffStack.open(spark, root))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "0000.tif"),
      "not a tiff".getBytes("UTF-8"))
    intercept[Exception](TiffStack.open(spark, root))
    intercept[IllegalArgumentException](
      TiffStack.create(spark, root, (4, 4, 1), Meta.TFloat32))
  }
}
