package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.MiniProp

/** Property coverage of the shard container byte format: for arbitrary
  * shard grids, present-cell subsets, blob contents, index locations, and
  * CRC settings, `build` → `parseAll`/`parseIndex` must invert exactly,
  * and entry arithmetic must agree with the C-order cell layout. */
class ShardPropertySpec extends AnyFunSuite with MiniProp {

  private val genGrid = for {
    gx <- Gen.choose(1, 4); gy <- Gen.choose(1, 4); gz <- Gen.choose(1, 3)
    crc <- Gen.oneOf(true, false)
    atEnd <- Gen.oneOf(true, false)
  } yield Shard.Params(gx, gy, gz, crc, atEnd)

  private def genInner(p: Shard.Params): Gen[Map[Int, Array[Byte]]] = for {
    cells <- Gen.someOf(0 until p.numInner)
    blobs <- Gen.sequence[Seq[Array[Byte]], Array[Byte]](
      cells.map(_ => Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))))
  } yield cells.zip(blobs).toMap

  test("build → parseAll inverts for arbitrary grids, subsets, and framings") {
    forAll(genGrid) { p =>
      forAll(genInner(p)) { inner =>
        val blob = Shard.build(p, inner)
        val back = Shard.parseAll(p, blob)
        assert(back.keySet == inner.keySet)
        inner.foreach { case (cell, bytes) =>
          assert(back(cell).toSeq == bytes.toSeq, s"cell $cell roundtrip under $p")
        }
        // the index alone agrees: present cells carry sane offsets/lengths,
        // absent cells the Missing marker
        val idxOff = if (p.indexAtEnd) blob.length - p.indexBytes else 0
        val idx = Shard.parseIndex(p,
          java.util.Arrays.copyOfRange(blob, idxOff, idxOff + p.indexBytes))
        (0 until p.numInner).foreach { cell =>
          val (off, len) = (idx(cell * 2), idx(cell * 2 + 1))
          if (inner.contains(cell)) {
            assert(len == inner(cell).length.toLong)
            assert(off >= 0 && off + len <= blob.length)
          } else assert(off == Shard.Missing && len == Shard.Missing)
        }
      }
    }
  }

  test("linear() is the C-order cell layout (z, y, x — x fastest)") {
    forAll(genGrid) { p =>
      val seen = for {
        wz <- 0 until p.gz; wy <- 0 until p.gy; wx <- 0 until p.gx
      } yield p.linear(wx, wy, wz)
      assert(seen == (0 until p.numInner), s"layout mismatch for $p")
    }
  }

  test("a flipped CRC bit is always detected") {
    forAll(genGrid.suchThat(_.crc32c)) { p =>
      val blob = Shard.build(p, Map(0 -> Array[Byte](1, 2, 3)))
      val idxOff = if (p.indexAtEnd) blob.length - p.indexBytes else 0
      blob(idxOff) = (blob(idxOff) ^ 0x01).toByte
      intercept[IllegalArgumentException] {
        Shard.parseIndex(p,
          java.util.Arrays.copyOfRange(blob, idxOff, idxOff + p.indexBytes))
      }
    }
  }
}
