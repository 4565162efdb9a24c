package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.MiniProp

/** Property coverage of the hand-built RIFF/AVI container and the BPE
  * learner kernels — the generalized forms of ExtensionOpsSpec's fixed
  * vectors.
  *
  * AVI: for arbitrary geometry (including widths on and off the 4-byte
  * stride boundary), frame counts, rates, and pixel contents, encode →
  * decode must return every frame bit-exactly with the header-declared
  * (w, h, fps); truncations must fail loudly, never return garbage.
  *
  * BPE: for arbitrary corpora, the learner must be deterministic, merges
  * must be applied greedily left-to-right non-overlapping, and encoding
  * invariants (token count ≤ symbol count ≤ char count) must hold. */
class MultimodalPropertySpec extends AnyFunSuite with MiniProp {

  case class AviCase(w: Int, h: Int, fps: Int, nFrames: Int, seed: Long)

  private val genAvi = for {
    w <- Gen.choose(1, 37) // crosses stride boundaries: w%4 in {0,1,2,3}
    h <- Gen.choose(1, 23)
    fps <- Gen.choose(1, 60)
    n <- Gen.choose(0, 9)
    seed <- Gen.chooseNum(0L, 1L << 40)
  } yield AviCase(w, h, fps, n, seed)

  test("AVI roundtrip is lossless for arbitrary geometry, counts, rates") {
    forAll(genAvi) { c =>
      val rnd = new scala.util.Random(c.seed)
      val frames = Vector.fill(c.nFrames)(Array.fill[Byte](c.w * c.h)(rnd.nextInt(256).toByte))
      val avi = Multimodal.aviEncode(frames, c.w, c.h, c.fps)
      val (decoded, w, h, fps) = Multimodal.aviDecode(avi)
      assert((w, h, fps) == (c.w, c.h, c.fps), s"$c headers")
      assert(decoded.length == c.nFrames, s"$c frame count")
      decoded.zip(frames).zipWithIndex.foreach { case ((d, f), i) =>
        assert(d.sameElements(f), s"$c frame $i")
      }
    }
  }

  test("truncated or bit-flipped containers fail loudly, never decode silently") {
    val frames = Vector.fill(3)(Array.tabulate[Byte](30 * 20)(_.toByte))
    val avi = Multimodal.aviEncode(frames, 30, 20, 10)
    // truncation anywhere inside the movi list: loud failure or fewer frames
    // with intact headers — never sheared pixels. The decode either throws
    // (checked AFTER the try so a failing assertion can't be swallowed) or
    // its output must be a bit-exact prefix of the original frames
    Seq(avi.length - 1, avi.length / 2, 64, 13).foreach { cut =>
      val t = java.util.Arrays.copyOf(avi, cut)
      val outcome = scala.util.Try(Multimodal.aviDecode(t))
      outcome.foreach { case (decoded, w, h, _) =>
        assert(w == 30 && h == 20, s"cut $cut")
        decoded.zipWithIndex.foreach { case (d, i) =>
          assert(d.sameElements(frames(i)), s"cut $cut frame $i")
        }
      }
    }
    // fourcc corruption is always loud
    Seq(0, 8).foreach { pos =>
      val b = avi.clone(); b(pos) = 'Z'.toByte
      intercept[Exception](Multimodal.aviDecode(b))
    }
  }

  case class BpeCase(nDocs: Int, vocab: Int, seed: Long)

  private val genBpe = for {
    nDocs <- Gen.choose(1, 12)
    vocab <- Gen.choose(2, 6) // tiny alphabet → many repeated pairs
    seed <- Gen.chooseNum(0L, 1L << 40)
  } yield BpeCase(nDocs, vocab, seed)

  private def corpus(c: BpeCase): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(c.seed)
    val letters = "abcdef".take(c.vocab)
    (1L to c.nDocs).map { id =>
      val words = Seq.fill(1 + rnd.nextInt(20))(
        Seq.fill(1 + rnd.nextInt(8))(letters(rnd.nextInt(letters.length))).mkString)
      id -> words.mkString(" ")
    }
  }

  test("BPE fit is deterministic; encode invariants hold on arbitrary corpora") {
    val spark = graft.testutil.SparkSuite.spark
    import spark.implicits._
    forAll(Gen.listOfN(6, genBpe).map(_.distinct)) { cases =>
      cases.foreach { c =>
        val df = corpus(c).toDF("doc_id", "text")
        val m1 = TextOps.fitBpeMerges(df, nMerges = 20, cap = 1000)
        val m2 = TextOps.fitBpeMerges(df, nMerges = 20, cap = 1000)
        assert(m1.toSeq == m2.toSeq, s"$c determinism")
        // well-formed merge table: both sides non-empty (an empty side
        // would make the greedy fold degenerate) and no duplicate pairs
        m1.foreach { case (l, r) => assert(l.nonEmpty && r.nonEmpty, s"$c ($l,$r)") }
        assert(m1.toSeq.distinct.length == m1.length, s"$c duplicate merges")
        corpus(c).foreach { case (_, text) =>
          val toks = (s"""( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +)""".r).findAllIn(text).toVector
          toks.foreach { t =>
            val n = TextOps.bpeSymbolCount(t, m1)
            assert(n >= 1 && n <= t.length, s"$c '$t'")
          }
        }
      }
    }
  }

  test("aHash: brightness-shift invariant, byte-hash is not; identical rasters collide") {
    val ipx = Multimodal.ThumbW * Multimodal.ThumbH
    val genRaster = for {
      seed <- Gen.chooseNum(0L, 1L << 40)
      delta <- Gen.choose(1, 40)
    } yield (seed, delta)
    forAll(genRaster) { case (seed, delta) =>
      val rnd = new scala.util.Random(seed)
      // headroom so the +delta shift never clips at 255
      val px = Array.fill(ipx)((rnd.nextInt(200)).toByte)
      val shifted = px.map(b => ((b & 0xff) + delta).toByte)
      // the perceptual property: bs*64 > ts is invariant under a global
      // shift (48*64*d on the left == 3072*d on the right), so re-graded
      // copies of an image collide — while any byte hash separates them
      assert(Multimodal.aHashHex(px) == Multimodal.aHashHex(shifted),
        s"aHash must be brightness-shift invariant (seed=$seed delta=$delta)")
      assert(!java.util.Arrays.equals(px, shifted))
      // and a structural change (one block forced dark) flips the hash
      val dark = px.clone()
      var y = 0
      while (y < 6) { // block (0,0): x<8, y<6
        var x = 0
        while (x < 8) { dark(y * Multimodal.ThumbW + x) = 0; x += 1 }
        y += 1
      }
      // only guaranteed to differ when block 0 was not already all-below-mean
      if (Multimodal.aHashHex(px).charAt(0) >= '8')
        assert(Multimodal.aHashHex(px) != Multimodal.aHashHex(dark))
    }
  }

  test("mergePair never produces adjacent un-merged (l, r) pairs") {
    val genSyms = Gen.listOfN(12, Gen.oneOf("a", "b", "ab", "ba")).map(_.toArray)
    forAll(genSyms, Gen.oneOf(("a", "b"), ("b", "a"), ("a", "a"), ("ab", "a"))) { (syms, lr) =>
      val (l, r) = lr
      val out = TextOps.mergePair(syms, l, r)
      // a pass is COMPLETE: no adjacent (l, r) can survive it — a trailing
      // r only ever follows a non-l (merged symbols can't equal l or r,
      // since l+r == l or == r needs the other side empty)
      assert(!out.sliding(2).exists(p => p.length == 2 && p(0) == l && p(1) == r),
        s"unmerged pair in ${out.toSeq} from ${syms.toSeq} merging ($l,$r)")
      // total characters conserved
      assert(out.map(_.length).sum == syms.map(_.length).sum)
    }
  }

  test("VAD kernel invariants and brute-force agreement over arbitrary doc ids") {
    forAll(Gen.chooseNum(0L, 1L << 40)) { id =>
      val smp = Multimodal.synthVadSamples(id)
      // WAV roundtrip stays bit-exact on the modulated waveform
      val (dec, sr, _, _) = Multimodal.wavDecode(Multimodal.wavEncode(smp))
      assert(sr == 16000 && dec.toSeq == smp.toSeq)
      // brute-force frame classification agrees with the closed form
      val frames = smp.grouped(Multimodal.VadFrame).filter(_.length == Multimodal.VadFrame).toSeq
      val acts = frames.map(f => f.map(s => s.toLong * s).sum > Multimodal.VadThreshold)
      val nSeg = acts.zip(false +: acts).count { case (a, p) => a && !p }
      val wantActive = frames.indices.map(f => (id * 31 + f.toLong * 17) % 7 < 3)
      assert(acts == wantActive, s"id=$id energy classification must mirror the envelope")
      assert(nSeg <= acts.count(identity) && (acts.count(identity) == 0 || nSeg >= 1))
    }
  }

  test("m13 resample: both WAV roundtrips bit-exact; pair means floor-exact over arbitrary ids") {
    forAll(Gen.chooseNum(0L, 1L << 40)) { id =>
      val smp = Multimodal.synthSamples(id)
      val (dec, sr, _, _) = Multimodal.wavDecode(Multimodal.wavEncode(smp))
      assert(sr == 16000 && dec.toSeq == smp.toSeq)
      val half = Array.tabulate(smp.length / 2)(j =>
        Math.floorDiv(smp(2 * j) + smp(2 * j + 1), 2).toShort)
      val (dec2, sr2, ch2, bits2) = Multimodal.wavDecode(
        Multimodal.wavEncode(half, Multimodal.AudioRate / 2))
      assert(sr2 == 8000 && ch2 == 1 && bits2 == 16, "re-encoded header must carry 8 kHz mono 16-bit")
      assert(dec2.toSeq == half.toSeq, s"id=$id second roundtrip must be lossless")
      // floor semantics: pair mean of (-3, 2) is -1 (floor of -0.5), not 0
      assert(Math.floorDiv(-3 + 2, 2) == -1)
    }
  }

  test("m16 watermark: every id recovers bit-exactly; perturbation LSB-bounded") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.modalWatermark(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, rec, ok, delta) =>
      assert(ok && rec == id, s"doc $id recovered $rec")
      assert(delta <= 64, s"doc $id perturbation $delta must be LSB-bounded")
    }
    // some ids actually flip bits (delta > 0 somewhere)
    assert(rows.exists(_._4 > 0))
  }

  test("m15 trim: boundaries land on active frames; interior silence survives") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.modalTrim(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, na, lead, tail, energy) =>
      assert(lead + na + tail == nb, s"doc $id: cuts + kept must tile the clip")
      assert(lead % Multimodal.VadFrame == 0, s"doc $id: lead cut frame-aligned")
      // first and last KEPT frames are active per the closed-form envelope
      val f0 = (lead / Multimodal.VadFrame).toInt
      val fl = ((lead + na) / Multimodal.VadFrame).toInt - 1
      def act(f: Int) = (id * 31 + f.toLong * 17) % 7 < 3
      assert(act(f0) && act(fl), s"doc $id: trim boundaries must be active frames")
      if (f0 > 0) assert(!act(f0 - 1), s"doc $id: frame before lead must be silent")
      assert(energy > 0)
      // interior silence survives: kept span ≥ active frame count alone
      assert(na >= Multimodal.VadFrame, s"doc $id keeps at least one frame")
    }
    // the trim must actually cut somewhere in this corpus
    assert(rows.exists(r => r._4 > 0) && rows.exists(r => r._5 > 0))
  }

  test("m14 augment: flip is an involution, rot90 four times is identity, dims swap") {
    forAll(Gen.chooseNum(0L, 1L << 40)) { seed =>
      val w = 16; val h = 12
      val src = Array.tabulate(w * h)(i => ((seed + i * 31) % 251).toByte)
      def flip(px: Array[Byte]) =
        Array.tabulate(w * h)(i => px((i / w) * w + (w - 1 - i % w)))
      // the kernel's clockwise rule, parameterized by the CURRENT dims
      def rot(px: Array[Byte], sw: Int, sh: Int) =
        Array.tabulate(sw * sh)(j => px((sh - 1 - j % sh) * sw + j / sh))
      assert(flip(flip(src)).toSeq == src.toSeq, "hflip twice = identity")
      val r1 = rot(src, w, h); val r2 = rot(r1, h, w)
      val r3 = rot(r2, w, h); val r4 = rot(r3, h, w)
      assert(r4.toSeq == src.toSeq, "rot90 four times = identity")
      // a known 2x1 check: rotating [a b] (w=2,h=1) cw gives column [a; b]
      val tiny = rot(Array[Byte](1, 2), 2, 1)
      assert(tiny.toSeq == Seq[Byte](1, 2) && tiny.length == 2)
    }
    // and through the REAL codec: both roundtrips bit-exact on a fixture
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.modalAugment(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) == Multimodal.ThumbH && r.getInt(4) == Multimodal.ThumbW,
        "rotation must swap the header-declared dimensions")
      assert(r.getString(1) != r.getString(2), "flip and rot90 differ on non-symmetric rasters")
    }
  }

  test("m12 patches tile each image exactly: per-doc patch mass equals raster mass") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.modalPatches(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, ps) =>
      assert(ps.length == 48, s"doc $id has ${ps.length} patches") // 8x6 grid
      assert(ps.map(p => (p._2, p._3)).toSet ==
        (for (r <- 0 until 6; c <- 0 until 8) yield (r, c)).toSet)
    }
    // tiling invariant against the independent closed-form raster
    import org.apache.spark.sql.functions.col
    Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
      .collect().take(20).foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("UTF-8")
      val want = (0 until 64 * 48).map(i => bytes(i % bytes.length) & 0xff).map(_.toLong).sum
      assert(byDoc(id).map(_._4).sum == want, s"doc $id")
    }
  }

  test("m11 ZCR matches a direct fold over the pre-roundtrip samples") {
    val got = Multimodal.modalZcr(graft.testutil.SparkSuite.spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 500)
    got.keys.toSeq.sorted.take(20).foreach { id =>
      val smp = Multimodal.synthVadSamples(id)
      val zc = (1 until smp.length).count(i => (smp(i - 1) < 0) != (smp(i) < 0)).toLong
      val sa = smp.map(s => math.abs(s.toLong)).sum
      // equality THROUGH the WAV roundtrip = the codec is bit-lossless
      assert(got(id) == ((smp.length.toLong, zc, sa)), s"id=$id")
      // the waveform must actually oscillate or ZCR is vacuous
      assert(zc > smp.length / 16, s"id=$id zc=$zc")
    }
  }

  test("m18 loudness: gains land the RMS on target (modulo clipping), exact recompute") {
    val spark = graft.testutil.SparkSuite.spark
    val got = Multimodal.loudnessNormalize(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (n, sumSqIn, sumSqOut, peak, clipped)) =>
      // independent recompute straight from the synthesis (no WAV layer)
      val smp = Multimodal.synthSamples(id)
      assert(n == smp.length && sumSqIn == smp.map(s => s.toLong * s.toLong).sum)
      val g = 26000.0 / math.sqrt(sumSqIn.toDouble / n)
      val out = smp.map(s => math.max(-32768L,
        math.min(32767L, math.floor(s.toDouble * g + 0.5).toLong)))
      assert(sumSqOut == out.map(s => s * s).sum, s"id=$id energy")
      assert(peak == out.map(math.abs).max && peak <= 32768L, s"id=$id peak")
      assert(clipped == out.count(s => s == 32767L || s == -32768L), s"id=$id clip")
      // the point of the pass: post-gain RMS sits on target up to the
      // energy clipping removes (bounded well under the 30% this corpus
      // clips at most)
      val rmsOut = math.sqrt(sumSqOut.toDouble / n)
      assert(rmsOut <= 26000.0 + 1 && rmsOut > 26000.0 * 0.80, s"id=$id rms=$rmsOut")
      assert(clipped > 0, s"id=$id: target chosen to exercise saturation")
    }
  }

  test("m17 png surgery: insert -> strip returns the ORIGINAL bytes, CRCs enforced") {
    val clean = Multimodal.imgEncode(
      Multimodal.tileRaster("quick brown fox".getBytes("UTF-8"), 32, 24), 32, 24)
    // the fresh encoder output must itself be ancillary-free, or the m17
    // closed-form audit would undercount
    assert(Multimodal.pngChunks(clean).forall(c => !Character.isLowerCase(c._1.charAt(0))),
      Multimodal.pngChunks(clean).map(_._1))
    val entries = Seq("Author" -> "cam-007", "Comment" -> "gps 1.2,3.4")
    val dirty = Multimodal.pngInsertText(clean, entries)
    // injected chunks sit in the stream, each framed 12 + kw + 1 + value
    val texts = Multimodal.pngChunks(dirty).filter(_._1 == "tEXt")
    assert(texts.size == 2)
    assert(texts.map(_._3) == entries.map { case (k, v) => k.length + 1 + v.length })
    // strip is EXACT byte-level inversion of insert — stronger than
    // pixel equality: the critical chunk stream is untouched
    val (stripped, n, bytes) = Multimodal.pngStripAncillary(dirty)
    assert(stripped.sameElements(clean))
    assert(n == 2 && bytes == entries.map { case (k, v) => 12L + k.length + 1 + v.length }.sum)
    // a flipped payload byte must fail the CRC walk, not strip silently
    val corrupt = dirty.clone()
    val (_, off, len) = Multimodal.pngChunks(dirty).find(_._1 == "tEXt").get
    corrupt(off + 8 + len / 2) = (corrupt(off + 8 + len / 2) ^ 0x5A).toByte
    val ex = intercept[IllegalArgumentException](Multimodal.pngStripAncillary(corrupt))
    assert(ex.getMessage.contains("CRC"))
  }

  test("m27 blur QC: flags exactly the injected 3-tap blurred images, with margin") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.blurQc(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val floor = 1200L * (Multimodal.ThumbW - 2) * Multimodal.ThumbH
    rows.foreach { case (id, ssl, blurry) =>
      assert(id % 3 == 0)
      assert(blurry == (id % 6 == 3), s"doc $id ssl=$ssl")
      // verdicts must not sit near the floor — the injection proof is a
      // separation claim, not a lucky threshold
      if (id % 6 == 3) assert(ssl * 3 < floor * 2, s"doc $id blurred too sharp: $ssl")
      else assert(ssl * 2 > floor * 3, s"doc $id natural too soft: $ssl")
    }
    assert(rows.exists(_._1 % 6 == 3), "no injected images in fixture")
    assert(rows.exists(_._1 % 6 != 3), "no natural images in fixture")
  }

  test("m29 keyframe: the sharp frame wins every scene, with real margin") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.keyframeSelect(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, scene, keyFno, keyE, bestBlurred) =>
      assert(id % 3 == 2, s"doc $id not a video")
      assert(keyFno == scene * 3, s"doc $id scene $scene picked blurred frame $keyFno")
      assert(keyE > bestBlurred, s"doc $id scene $scene: no margin ($keyE vs $bestBlurred)")
    }
    // scene census matches the m10 device: 2 + id % 4 scenes per video
    rows.groupBy(_._1).foreach { case (id, sc) =>
      assert(sc.map(_._2).toSet == (0L until (2 + id % 4)).toSet, s"doc $id scene set")
    }
  }

  test("m28 near-dup: every planted donor pair surfaces; verification bound holds") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.imageNearDup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, h, planted) =>
      assert(a < b && h <= 3, s"pair ($a,$b) hamming $h")
      assert(planted == (b - a == 3 && b % 9 == 0), s"pair ($a,$b) planted flag")
      if (planted) assert(h <= 2, s"planted pair ($a,$b) drifted to hamming $h")
    }
    // every planted pair must surface: donor = id - 3 for id % 9 == 0, id >= 9
    val nImgs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.expr("doc_id % 3 = 0")).count()
    val maxId = (nImgs - 1) * 3
    val wantPlanted = (9L to maxId by 9).map(id => (id - 3, id)).toSet
    val gotPlanted = rows.filter(_._4).map(r => (r._1, r._2)).toSet
    assert(gotPlanted == wantPlanted, "planted pair set mismatch")
  }

  test("m21 frame dedup: frozen videos report exactly the injected duplication") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.frameDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nd, maxRun, share) =>
      assert(id % 3 == 2)
      assert(n == 4 + id % 7)
      assert(math.abs(share - BigDecimal((n - nd).toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
      if (id % 4 == 0) {
        // every odd frame frozen to its predecessor: ⌈n/2⌉ distinct, runs of 2
        assert(nd == (n + 1) / 2, s"doc $id: $nd distinct of $n")
        assert(maxRun >= 2L, s"doc $id: no static run despite injection")
      } else {
        // natural frames repeat only when (Δf·131) mod len == 0 — possible
        // but a run of 2+ plus full duplication of half the video is not
        assert(nd > n / 2, s"doc $id: unexpected mass duplication")
      }
    }
    assert(rows.exists(_._1 % 4 == 0), "no injected videos in fixture")
    assert(rows.exists(r => r._1 % 4 != 0 && r._3 == r._2), "no clean videos in fixture")
  }

  test("m20 pitch: injected sawtooths detected at exactly their period, noise never flags") {
    val spark = graft.testutil.SparkSuite.spark
    val rows = Multimodal.pitchDetect(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    var nInjected = 0
    rows.foreach { case (id, period, dMin, periodic) =>
      assert(id % 3 == 1)
      if (id % 5 == 2) {
        nInjected += 1
        assert(periodic && dMin == 0L && period == 40 + id % 40,
          s"doc $id: period $period dMin $dMin (want ${40 + id % 40})")
      } else {
        // pseudo-random noise must never look perfectly periodic
        assert(!periodic && dMin > 0L, s"doc $id: noise flagged periodic")
        assert(period >= 40 && period <= 79)
      }
    }
    assert(nInjected > 0, "fixture has no injected docs")
  }

  test("m19 exposure QC: injected saturation counted exactly, impurity matches recount") {
    val spark = graft.testutil.SparkSuite.spark
    val dir = "/root/testdata/sf0.001"
    val rows = Multimodal.imageExposureQc(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(rows.nonEmpty)
    val texts = Tables.t(spark, dir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, (mn, mx, nSat, imp, lowC)) =>
      assert(id % 3 == 0)
      val bytes = texts(id).getBytes("UTF-8")
      val n = 64 * 48
      val px = Array.tabulate(n) { p =>
        if ((7L * p + id) % 101 == 0) 255 else bytes(p % bytes.length) & 0xff
      }
      // injection rule: positions p ≡ -id·7⁻¹ (mod 101) → ⌈(n - offset)/101⌉ hits
      val expSat = px.count(_ == 255)
      assert(nSat == expSat && nSat > 0, s"doc $id: n_sat $nSat vs $expSat")
      assert(mn == px.min && mx == px.max)
      assert(lowC == (mx - mn < 64))
      val ssq = px.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      val expImp = BigDecimal(1.0 - ssq.toDouble / (n.toLong * n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(imp == expImp, s"doc $id: impurity $imp vs $expImp")
      // fixture text never reaches full scale without the injection
      assert(px.count(_ == 255) == px.zipWithIndex.count { case (_, p) => (7L * p + id) % 101 == 0 })
    }
  }
}
