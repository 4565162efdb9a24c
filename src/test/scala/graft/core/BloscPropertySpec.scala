package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style roundtrips for the pure-JVM blosc container: randomized
  * payload distributions (runs, structured elements, noise, mixtures),
  * sizes crossing block/split boundaries, typesizes, and shuffle — the
  * generalized form of BloscSpec's fixed vectors. */
class BloscPropertySpec extends AnyFunSuite {

  case class Scenario(n: Int, ts: Int, shuffle: Boolean, kind: Int, seed: Long)

  val genScenario: Gen[Scenario] = for {
    n <- Gen.oneOf(Gen.chooseNum(0, 300), Gen.chooseNum(1000, 70000), Gen.chooseNum(250000, 400000))
    ts <- Gen.oneOf(1, 2, 3, 4, 8, 16)
    shuffle <- Gen.oneOf(true, false)
    kind <- Gen.chooseNum(0, 3)
    seed <- Gen.chooseNum(0L, 1L << 40)
  } yield Scenario(n, ts, shuffle, kind, seed)

  private def payload(sc: Scenario): Array[Byte] = {
    val rnd = new scala.util.Random(sc.seed)
    sc.kind match {
      case 0 => // long runs (RLE-heavy)
        Array.tabulate[Byte](sc.n)(i => ((i / 997) * 31).toByte)
      case 1 => // structured elements (shuffle-friendly)
        Array.tabulate[Byte](sc.n)(i => (((i / sc.ts) % 251) + (i % sc.ts) * 3).toByte)
      case 2 => // pure noise (memcpy fallback path)
        Array.fill[Byte](sc.n)(rnd.nextInt(256).toByte)
      case _ => // mixture: noise islands inside repeated motifs
        val motif = Array.fill[Byte](64)(rnd.nextInt(256).toByte)
        Array.tabulate[Byte](sc.n)(i =>
          if ((i / 512) % 3 == 2) rnd.nextInt(256).toByte else motif(i % 64))
    }
  }

  test("randomized container roundtrips (40 scenarios)") {
    val p = Gen.Parameters.default
    (0 until 40).foreach { i =>
      val sc = genScenario.apply(p, Seed(4200L + i)).get
      val raw = payload(sc)
      val packed = Blosc.compress(raw, sc.ts, sc.shuffle)
      val got = Blosc.decompress(packed)
      assert(got.sameElements(raw), s"scenario $i: $sc")
    }
  }

  test("randomized raw lz streams roundtrip (no container)") {
    val p = Gen.Parameters.default
    (0 until 25).foreach { i =>
      val sc = genScenario.apply(p, Seed(990L + i)).get
      val raw = payload(sc.copy(n = math.min(sc.n, 80000)))
      val buf = new Array[Byte](raw.length * 2 + 128)
      val csize = Blosc.lzCompress(raw, 0, raw.length, buf, 0, buf.length)
      if (csize > 0) { // incompressible payloads legitimately decline
        val back = new Array[Byte](raw.length)
        assert(Blosc.lzDecompress(buf, 0, csize, back, 0, raw.length) == raw.length)
        assert(back.sameElements(raw), s"scenario $i: $sc")
      }
    }
  }
}
