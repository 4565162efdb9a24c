package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** blosclz / blosc-container tests. Real c-blosc is unavailable in this
  * environment (zero egress, no native lib), so coverage is: handcrafted
  * token-stream goldens derived from the public format, container-level
  * roundtrips across typesizes/shuffle/block shapes, and the memcpy
  * fallback. */
class BloscSpec extends AnyFunSuite {

  private def lz(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private def decodeStream(stream: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    val n = Blosc.lzDecompress(stream, 0, stream.length, out, 0, outLen)
    assert(n == outLen, s"decoded $n of $outLen")
    out
  }

  test("golden: literal run") {
    // token 4 => 5 literals
    assert(decodeStream(lz(4, 'h', 'e', 'l', 'l', 'o'), 5).sameElements("hello".getBytes))
  }

  test("golden: short match") {
    // "abcabc": 3 literals then match len 3 (token v=1 -> (1<<5)), stored
    // distance 2 (actual 3): high 0, low byte 2
    val got = decodeStream(lz(2, 'a', 'b', 'c', (1 << 5), 2), 6)
    assert(got.sameElements("abcabc".getBytes))
  }

  test("golden: RLE via stored distance 0") {
    // 1 literal 'x' then match len 5 (v=3), stored distance 0 -> run of 'x'
    val got = decodeStream(lz(0, 'x', (3 << 5), 0), 6)
    assert(got.sameElements("xxxxxx".getBytes))
  }

  test("golden: extended length (255-continued)") {
    // 1 literal then a run: v=7 -> mlen = 6 + ext codes; ext [255, 1] ->
    // mlen = 6 + 256, copyLen = 265
    val got = decodeStream(lz(0, 'z', (7 << 5), 255, 1, 0), 1 + 265)
    assert(got.forall(_ == 'z'.toByte))
  }

  test("golden: overlapping copy semantics (LZ77)") {
    // "ab" then match len 6 stored distance 1 (actual 2) -> "abababab"
    val got = decodeStream(lz(1, 'a', 'b', (4 << 5), 1), 8)
    assert(got.sameElements("abababab".getBytes))
  }

  test("golden: far-distance match (> 8191) decodes correctly") {
    // 8500 pattern literals, then a 10-byte match at actual distance 8497:
    // stored = 8496 -> far form (8496 - 8191 = 305 = 0x0131):
    // token (7<<5)|31, ext len 10-9=1, low 255, far hi 0x01, far lo 0x31
    val n = 8500
    val pat = Array.tabulate[Byte](n)(i => ((i * 37 + 11) % 251).toByte)
    val body = scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    while (i < n) {
      val run = math.min(32, n - i)
      body += (run - 1).toByte
      body ++= pat.slice(i, i + run)
      i += run
    }
    body ++= Seq(((7 << 5) | 31).toByte, 1.toByte, 255.toByte, 0x01.toByte, 0x31.toByte)
    val got = decodeStream(body.toArray, n + 10)
    assert(got.take(n).sameElements(pat))
    assert(got.drop(n).sameElements(pat.slice(n - 8497, n - 8497 + 10)))
  }

  test("encoder finds matches across > 8191 distance (far form roundtrip)") {
    // motif + highly-compressible middle + motif: the second motif sits
    // ~9000 bytes after the first; whether the encoder links it far-form is
    // hash-luck, but the stream must roundtrip bit-exactly either way
    val motif = Array.tabulate[Byte](64)(i => (i * 7 + 1).toByte)
    val middle = Array.tabulate[Byte](9000)(i => ((i % 13) * 17).toByte)
    val raw = motif ++ middle ++ motif
    val out = new Array[Byte](raw.length * 2 + 64)
    val csize = Blosc.lzCompress(raw, 0, raw.length, out, 0, out.length)
    assert(csize > 0, "compressible input must compress")
    val back = new Array[Byte](raw.length)
    assert(Blosc.lzDecompress(out, 0, csize, back, 0, raw.length) == raw.length)
    assert(back.sameElements(raw))
  }

  test("container roundtrip across typesizes, shuffle, and block shapes") {
    val rnd = new scala.util.Random(11)
    val shapes = Seq(
      0, 1, 3, 127, 128, 1000, 65536, 300000 // incl. multi-block + leftover
    )
    for (n <- shapes; ts <- Seq(1, 2, 4, 8); shuffle <- Seq(true, false)) {
      // compressible pattern: repeating structured elements + mild noise
      val raw = Array.tabulate[Byte](n)(i => ((i / ts) % 251 + (i % ts)).toByte)
      val packed = Blosc.compress(raw, ts, shuffle)
      val got = Blosc.decompress(packed)
      assert(got.sameElements(raw), s"n=$n ts=$ts shuffle=$shuffle")
      assert(packed.length < math.max(n, 64) + 17, s"no gain n=$n ts=$ts")
      val _ = rnd // keep seed for future variants
    }
  }

  test("incompressible input degrades to the memcpy container") {
    val rnd = new scala.util.Random(5)
    val raw = Array.fill[Byte](4096)(rnd.nextInt(256).toByte)
    val packed = Blosc.compress(raw, 4, shuffle = true)
    assert((packed(2) & 0x2) != 0, "memcpy flag expected for random data")
    assert(packed.length == 16 + raw.length)
    assert(Blosc.decompress(packed).sameElements(raw))
  }

  test("header validation: truncated, bad version, foreign compressor") {
    intercept[IllegalArgumentException](Blosc.decompress(Array[Byte](1, 2, 3)))
    // compressible input so the container is NOT the memcpy fallback (the
    // compressor-code check only applies to compressed containers)
    val ok = Blosc.compress(Array.tabulate[Byte](1024)(i => (i % 16).toByte), 1, shuffle = false)
    assert((ok(2) & 0x2) == 0, "fixture must be a compressed container")
    val badVer = ok.clone(); badVer(0) = 9
    intercept[IllegalArgumentException](Blosc.decompress(badVer))
    val badComp = ok.clone(); badComp(2) = (badComp(2) | (1 << 5)).toByte // lz4 code
    intercept[IllegalArgumentException](Blosc.decompress(badComp))
  }

  test("blosclz volume: ingest/cutout roundtrip through the store") {
    import graft.core.Meta
    import graft.volume.{Volume, VoxelBuffer}
    val spark = graft.testutil.SparkSuite.spark
    for (dt <- Seq(Meta.TUInt8, Meta.TUInt16, Meta.TFloat32)) {
      val meta = Meta.VolumeMeta("image", dt, 1, Vector(
        Meta.ScaleMeta("1_1_1", (32, 32, 4), "blosclz", (1, 1, 1), (64, 64, 8), (0, 0, 0))))
      val vol = Volume.create(spark, graft.testutil.SparkSuite.tempDir("graft-blosc"), meta)
      val buf = VoxelBuffer.sequenced(dt, 64, 64, 8, 1, (1, 1, 1))
      vol.ingest(buf)
      assert(vol.cutout(Grid.Box(1, 64, 1, 64, 1, 8)) == buf, s"dtype $dt")
    }
  }
}
