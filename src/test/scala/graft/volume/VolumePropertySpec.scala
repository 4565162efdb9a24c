package graft.volume

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{Grid, Meta}
import graft.core.Grid.Box
import graft.testutil.SparkSuite

/** Property-style roundtrips over randomized volume geometry: chunk sizes,
  * offsets (incl. negative), dtypes, and aligned write boxes — the
  * generalized form of the reference's fixed test scenarios. */
class VolumePropertySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  case class Scenario(cs: (Int, Int, Int), off: (Int, Int, Int),
      dtype: Meta.VoxelType, nChunks: (Int, Int, Int))

  val genScenario: Gen[Scenario] = for {
    csx <- Gen.chooseNum(5, 40); csy <- Gen.chooseNum(5, 40); csz <- Gen.chooseNum(2, 10)
    ox <- Gen.chooseNum(-200, 200); oy <- Gen.chooseNum(-200, 200); oz <- Gen.chooseNum(-50, 50)
    dt <- Gen.oneOf(Meta.TUInt8, Meta.TUInt16, Meta.TUInt32, Meta.TFloat32, Meta.TFloat64)
    nx <- Gen.chooseNum(1, 3); ny <- Gen.chooseNum(1, 3); nz <- Gen.chooseNum(1, 3)
  } yield Scenario((csx, csy, csz), (ox, oy, oz), dt, (nx, ny, nz))

  test("randomized aligned ingest/cutout roundtrips (12 scenarios)") {
    val p = Gen.Parameters.default
    (0 until 12).foreach { i =>
      val sc = genScenario.apply(p, Seed(1000L + i)).get
      val (csx, csy, csz) = sc.cs
      val (ox, oy, oz) = sc.off
      // volume: 6x6x6 chunks anchored at the offset
      val meta = Meta.VolumeMeta("image", sc.dtype, 1, Vector(
        Meta.ScaleMeta("1_1_1", sc.cs, "gzip", (1, 1, 1),
          (csx * 6, csy * 6, csz * 6), sc.off)))
      val vol = Volume.create(spark, SparkSuite.tempDir(s"graft-prop$i"), meta)
      // aligned write box starting at the chunk grid: origin = offset + 1
      val buf = VoxelBuffer.sequenced(sc.dtype,
        csx * sc.nChunks._1, csy * sc.nChunks._2, csz * sc.nChunks._3, 1,
        (ox + 1, oy + 1, oz + 1))
      vol.ingest(buf)
      assert(vol.cutout(buf.box) == buf, s"scenario $i: $sc")
      // interior sub-box
      val sub = Box(
        Grid.Ival(buf.box.x.lo + csx / 2, buf.box.x.hi - csx / 3),
        Grid.Ival(buf.box.y.lo + csy / 2, buf.box.y.hi - csy / 3),
        Grid.Ival(buf.box.z.lo, buf.box.z.hi))
      if (!sub.isEmpty)
        assert(vol.cutout(sub) == buf.slice(sub), s"scenario $i sub: $sc")
    }
  }
}
