package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.testutil.MiniProp
import org.scalacheck.Gen
import Grid._

class GridSpec extends AnyFunSuite with MiniProp {

  // Golden vectors from the reference's own unit tests (test/Indexes.jl:5-10).
  test("key codec golden vectors") {
    val box = Box(2969, 3480, 1777, 2288, 16913, 17424)
    assert(boxKey(box) == "2968-3480_1776-2288_16912-17424")
    assert(parseKey("2968-3480_1776-2288_16912-17424").contains(box))
  }

  test("key codec handles negatives and .gz suffix and path prefixes") {
    val b = parseKey("-1024--896_-1024--896_1428-1429")
    assert(b.contains(Box(-1023, -896, -1023, -896, 1429, 1429)))
    assert(parseKey("6_6_30/0-100_0-100_0-5.gz").contains(Box(1, 100, 1, 100, 1, 5)))
    assert(parseKey("garbage").isEmpty)
  }

  test("key format/parse roundtrip (property)") {
    val ival = for {
      lo <- Gen.chooseNum(-5000, 5000); len <- Gen.chooseNum(1, 2000)
    } yield Ival(lo, lo + len - 1)
    forAll(ival, ival, ival) { (x, y, z) =>
      val b = Box(x, y, z)
      assert(parseKey(boxKey(b)).contains(b))
    }
  }

  test("chunk id math matches Julia fld semantics incl. negatives") {
    // fld(x-1-o, c)+1 with o=0, c=100: x=1 -> 1, x=100 -> 1, x=101 -> 2, x=0 -> 0, x=-99 -> 0, x=-100 -> -1
    assert(chunkIdOf(1, 100, 0) == 1)
    assert(chunkIdOf(100, 100, 0) == 1)
    assert(chunkIdOf(101, 100, 0) == 2)
    assert(chunkIdOf(0, 100, 0) == 0)
    assert(chunkIdOf(-99, 100, 0) == 0)
    assert(chunkIdOf(-100, 100, 0) == -1)
  }

  test("chunkIval inverts chunkIdOf") {
    forAll(Gen.chooseNum(-3000, 3000), Gen.chooseNum(1, 300), Gen.chooseNum(-500, 500)) {
      (x, cs, off) =>
        val o = gridOffset(off, cs)
        val id = chunkIdOf(x, cs, o)
        val iv = chunkIval(id, cs, o)
        assert(iv.contains(x), s"x=$x cs=$cs o=$o id=$id iv=$iv")
        assert(iv.len == cs)
    }
  }

  test("chunksFor covers the query exactly, disjointly") {
    forAll(
      Gen.chooseNum(-300, 300), Gen.chooseNum(1, 400),
      Gen.chooseNum(-300, 300), Gen.chooseNum(1, 400),
      Gen.chooseNum(-300, 300), Gen.chooseNum(1, 400),
      Gen.chooseNum(25, 120)) { (x0, lx, y0, ly, z0, lz, cs) =>
      val q = Box(x0, x0 + lx - 1, y0, y0 + ly - 1, z0, z0 + lz - 1)
      val slices = chunksFor(q, (cs, cs, cs), (0, 0, 0))
      // total cutout voxels == query voxels (full disjoint cover)
      assert(slices.map(_.cutoutBox.numVoxels).sum == q.numVoxels)
      // every cutout is inside its chunk and inside the query
      slices.foreach { s =>
        assert(s.cutoutBox.intersect(s.chunkBox) == s.cutoutBox)
        assert(s.cutoutBox.intersect(q) == s.cutoutBox)
        val ric = s.rangeInChunk
        assert(ric.x.lo >= 1 && ric.x.hi <= cs)
      }
    }
  }

  test("reference test scenario: 200x200x10 write over 100x100x5 chunks = 8 chunks") {
    // mirrors test/BinDicts.jl:51-57 (aligned roundtrip box)
    val slices = chunksFor(Box(1, 200, 1, 200, 1, 10), (100, 100, 5), (0, 0, 0))
    assert(slices.length == 8)
    assert(slices.forall(s => s.cutoutBox == s.chunkBox)) // aligned: full chunks
    assert(slices.map(_.key).toSet.contains("0-100_0-100_0-5"))
    assert(slices.map(_.key).toSet.contains("100-200_100-200_5-10"))
  }

  test("volume boundary clamping mirrors adjust_volume_boundary") {
    // volume [1..510]x[1..510]x[1..2022] like fixture A at mip 1 with offset (-300,-300,-10)
    // shifted: here use offset 0, size (110,110,7) to mirror the clip test expectation shape
    val vol = Box(1, 110, 1, 110, 1, 7)
    val slices = chunksFor(Box(101, 300, 101, 300, 1, 10), (100, 100, 5), (0, 0, 0), Some(vol))
    // only chunks overlapping the volume survive
    assert(slices.nonEmpty)
    slices.foreach { s =>
      assert(s.cutoutBox.x.hi <= 110 && s.cutoutBox.y.hi <= 110 && s.cutoutBox.z.hi <= 7)
      assert(s.chunkBox.x.hi <= 110 && s.chunkBox.y.hi <= 110 && s.chunkBox.z.hi <= 7)
    }
    // the surviving region is [101..110]x[101..110]x[1..7]
    assert(slices.map(_.cutoutBox.numVoxels).sum == 10L * 10 * 7)
  }

  test("grid offset normalization matches mod semantics (ChunkIterators.jl:34)") {
    assert(gridOffset(-300, 100) == 0)
    assert(gridOffset(-597, 100) == 3)
    assert(gridOffset(-103, 5) == 2)
    assert(gridOffset(14720, 64) == 0)
  }
}
