package graft.core

/** Pure-JVM implementation of the public c-blosc v1 container with the
  * blosclz codec — enough to read (and write) the chunks the reference
  * produces via `Blosc.compress(data)` / `Blosc.decompress(UInt8, data)`
  * (reference: src/Codings.jl:74-80), with no native library.
  *
  * Format (public, from the c-blosc project's documented v1 layout):
  *
  * 16-byte header:
  * {{{
  *   0      version (format; 1 or 2)
  *   1      versionlz (codec version)
  *   2      flags: bit0 byte-shuffle, bit1 pure-memcpy, bit2 bit-shuffle,
  *                 bits5-7 compressor code (0 = blosclz)
  *   3      typesize
  *   4-7    nbytes   (LE, uncompressed size)
  *   8-11   blocksize (LE)
  *   12-15  cbytes   (LE, total compressed size incl. header)
  * }}}
  *
  * Then, unless pure-memcpy: one LE int32 start offset per block (absolute
  * within the buffer), and per block `nsplits` sub-streams, each prefixed
  * with its LE int32 compressed size; a split whose size equals its
  * uncompressed size is stored raw. Blocks are byte-shuffled independently
  * (typesize byte planes), which is also why a block splits into `typesize`
  * streams when `typesize <= 16 && blocksize/typesize >= 128` and the block
  * is not the leftover block — the split rule is implied by the format and
  * must be mirrored exactly on decode.
  *
  * blosclz streams are FastLZ-style tokens: a control byte `c`; `c < 32`
  * runs `c+1` literals; otherwise a match of length `(c>>5)+2` (7 extends
  * by following bytes, 255-continued) at stored distance
  * `((c&31)<<8) | low` + 1, where `low == 255` with `(c&31) == 31` marks a
  * far match whose distance continues in two more bytes (+8191). A stored
  * distance of 0 (previous byte) is the RLE fast path. The first control
  * byte is masked `& 31` (streams open with a literal run).
  */
object Blosc {

  private val MaxSplits = 16
  private val MinBuffersize = 128
  private val MaxDistance = 8191

  private def leInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def putLeInt(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }

  /** The format-implied split count of a (non-leftover) block. */
  private def splitsOf(typesize: Int, blocksize: Int, leftover: Boolean): Int = {
    val ts = math.max(typesize, 1)
    if (!leftover && ts <= MaxSplits && blocksize / ts >= MinBuffersize) ts else 1
  }

  // ------------------------------------------------------------------
  // container
  // ------------------------------------------------------------------

  def decompress(src: Array[Byte]): Array[Byte] = {
    require(src.length >= 16, "blosc: truncated header")
    val version = src(0) & 0xff
    require(version >= 1 && version <= 2, s"blosc: unsupported format version $version")
    val flags = src(2) & 0xff
    val typesize = math.max(src(3) & 0xff, 1)
    val nbytes = leInt(src, 4)
    val blocksize = leInt(src, 8)
    val cbytes = leInt(src, 12)
    require(nbytes >= 0 && cbytes >= 16 && cbytes <= src.length,
      s"blosc: corrupt sizes nbytes=$nbytes cbytes=$cbytes have=${src.length}")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & 0x2) != 0) { // pure memcpy container
      require(src.length >= 16 + nbytes, "blosc: truncated memcpy payload")
      System.arraycopy(src, 16, out, 0, nbytes)
      return out
    }
    require((flags & 0x4) == 0, "blosc: bit-shuffle filter unsupported")
    require(((flags >> 5) & 0x7) == 0,
      s"blosc: compressor code ${(flags >> 5) & 0x7} unsupported (only blosclz)")
    require(blocksize > 0, "blosc: corrupt blocksize")
    val shuffle = (flags & 0x1) != 0 && typesize > 1
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val block = new Array[Byte](blocksize)
    var j = 0
    while (j < nblocks) {
      var pos = leInt(src, 16 + 4 * j) // absolute block start
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val nsplits = splitsOf(typesize, blocksize, leftover = bsize != blocksize)
      val neblock = bsize / nsplits
      var s = 0
      var boff = 0
      while (s < nsplits) {
        val csize = leInt(src, pos); pos += 4
        val want = if (s == nsplits - 1) bsize - boff else neblock
        if (csize == want) { // stored split
          System.arraycopy(src, pos, block, boff, want)
        } else {
          val got = lzDecompress(src, pos, csize, block, boff, want)
          require(got == want, s"blosc: split decoded $got of $want bytes")
        }
        pos += csize; boff += want
        s += 1
      }
      if (shuffle) unshuffle(typesize, bsize, block, out, j * blocksize)
      else System.arraycopy(block, 0, out, j * blocksize, bsize)
      j += 1
    }
    out
  }

  /** Compress `raw` into a blosc v1 container (blosclz codec; byte-shuffle
    * when `shuffle` and `typesize > 1`). Incompressible input degrades to
    * the pure-memcpy container exactly like c-blosc. */
  def compress(raw: Array[Byte], typesize: Int = 1, shuffle: Boolean = true): Array[Byte] = {
    val ts = math.max(typesize, 1)
    require(ts <= 255, s"blosc: typesize $ts > 255")
    val nbytes = raw.length
    // block size: bounded work set per block, multiple of typesize
    val blocksize0 = math.min(math.max(nbytes, 1), 256 * 1024)
    val blocksize = math.max(blocksize0 - blocksize0 % ts, ts)
    val doShuffle = shuffle && ts > 1
    val nblocks = if (nbytes == 0) 0 else (nbytes + blocksize - 1) / blocksize
    val header = 16 + 4 * nblocks
    // worst case: every split stored raw + 4-byte prefix
    val outCap = header + nbytes + 4 * nblocks * MaxSplits + 64
    val out = new Array[Byte](outCap)
    out(0) = 2; out(1) = 1
    out(2) = (((if (doShuffle) 1 else 0))).toByte
    out(3) = ts.toByte
    putLeInt(out, 4, nbytes)
    putLeInt(out, 8, blocksize)
    val block = new Array[Byte](blocksize)
    var pos = header
    var j = 0
    var fellBack = false
    while (j < nblocks && !fellBack) {
      putLeInt(out, 16 + 4 * j, pos)
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      if (doShuffle) shuffleBytes(ts, bsize, raw, j * blocksize, block)
      else System.arraycopy(raw, j * blocksize, block, 0, bsize)
      val nsplits = splitsOf(ts, blocksize, leftover = bsize != blocksize)
      val neblock = bsize / nsplits
      var s = 0
      while (s < nsplits && !fellBack) {
        val want = if (s == nsplits - 1) bsize - s * neblock else neblock
        if (pos + 4 + want + 64 > outCap) fellBack = true
        else {
          val csize = lzCompress(block, s * neblock, want, out, pos + 4, want)
          if (csize < 0) { // no gain: store the split raw
            putLeInt(out, pos, want)
            System.arraycopy(block, s * neblock, out, pos + 4, want)
            pos += 4 + want
          } else {
            putLeInt(out, pos, csize)
            pos += 4 + csize
          }
        }
        s += 1
      }
      j += 1
    }
    if (fellBack || pos >= 16 + nbytes) {
      // memcpy container: compression gained nothing
      val mc = new Array[Byte](16 + nbytes)
      mc(0) = 2; mc(1) = 1; mc(2) = 0x2; mc(3) = ts.toByte
      putLeInt(mc, 4, nbytes)
      putLeInt(mc, 8, blocksize)
      putLeInt(mc, 12, mc.length)
      System.arraycopy(raw, 0, mc, 16, nbytes)
      return mc
    }
    putLeInt(out, 12, pos)
    java.util.Arrays.copyOf(out, pos)
  }

  // ------------------------------------------------------------------
  // byte shuffle (per block): typesize byte planes
  // ------------------------------------------------------------------

  private def shuffleBytes(ts: Int, size: Int, src: Array[Byte], srcOff: Int,
      dst: Array[Byte]): Unit = {
    val elems = size / ts
    var b = 0
    while (b < ts) {
      var e = 0
      while (e < elems) {
        dst(b * elems + e) = src(srcOff + e * ts + b)
        e += 1
      }
      b += 1
    }
    var i = elems * ts
    while (i < size) { dst(i) = src(srcOff + i); i += 1 } // remainder verbatim
  }

  private def unshuffle(ts: Int, size: Int, src: Array[Byte], dst: Array[Byte],
      dstOff: Int): Unit = {
    val elems = size / ts
    var b = 0
    while (b < ts) {
      var e = 0
      while (e < elems) {
        dst(dstOff + e * ts + b) = src(b * elems + e)
        e += 1
      }
      b += 1
    }
    var i = elems * ts
    while (i < size) { dst(dstOff + i) = src(i); i += 1 }
  }

  // ------------------------------------------------------------------
  // blosclz token codec
  // ------------------------------------------------------------------

  /** Decode one blosclz stream; returns bytes produced. */
  private[core] def lzDecompress(src: Array[Byte], off: Int, len: Int,
      out: Array[Byte], outOff: Int, outLen: Int): Int = {
    if (len <= 0) return 0
    var ip = off
    val ipLimit = off + len
    var op = outOff
    val opLimit = outOff + outLen
    var ctrl = src(ip) & 31; ip += 1
    var loop = true
    while (loop) {
      if (ctrl >= 32) {
        var mlen = (ctrl >> 5) - 1
        val ofsHigh = (ctrl & 31) << 8
        var ref = op - ofsHigh
        if (mlen == 6) { // 255-continued extended length
          var code = 0
          do { code = src(ip) & 0xff; ip += 1; mlen += code } while (code == 255)
        }
        val low = src(ip) & 0xff; ip += 1
        ref -= low
        if (low == 255 && ofsHigh == (31 << 8)) { // far match marker
          var ofs = (src(ip) & 0xff) << 8; ip += 1
          ofs += src(ip) & 0xff; ip += 1
          ref = op - ofs - MaxDistance
        }
        val copyLen = mlen + 3
        require(op + copyLen <= opLimit, "blosclz: output overrun")
        require(ref - 1 >= outOff, "blosclz: back-reference before stream start")
        if (ref == op) { // stored distance 0: run of the previous byte
          java.util.Arrays.fill(out, op, op + copyLen, out(ref - 1))
          op += copyLen
        } else { // stored distance d: copy from actual distance d+1 (may overlap)
          var r = ref - 1
          var i = 0
          while (i < copyLen) { out(op) = out(r); op += 1; r += 1; i += 1 }
        }
      } else {
        val n = ctrl + 1
        require(op + n <= opLimit && ip + n <= ipLimit, "blosclz: literal overrun")
        System.arraycopy(src, ip, out, op, n)
        ip += n; op += n
      }
      if (ip < ipLimit) { ctrl = src(ip) & 0xff; ip += 1 } else loop = false
    }
    op - outOff
  }

  /** Greedy hash-chain blosclz encoder. Returns compressed size, or -1 when
    * the stream would not fit in `maxOut` (caller stores the split raw). */
  private[core] def lzCompress(src: Array[Byte], off: Int, len: Int,
      out: Array[Byte], outOff: Int, maxOut: Int): Int = {
    if (len == 0) return -1
    val HashLog = 14
    val htab = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(htab, -1)
    @inline def hash(i: Int): Int = {
      val v = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) | ((src(i + 2) & 0xff) << 16)
      (v * 0x9E3779B1) >>> (32 - HashLog)
    }
    var op = outOff
    val opLimit = outOff + maxOut
    var ip = off
    val end = off + len
    var anchor = ip // start of pending literals
    @inline def flushLiterals(upTo: Int): Boolean = {
      var a = anchor
      while (a < upTo) {
        val n = math.min(32, upTo - a)
        if (op + 1 + n > opLimit) return false
        out(op) = (n - 1).toByte; op += 1
        System.arraycopy(src, a, out, op, n)
        op += n; a += n
      }
      anchor = upTo
      true
    }
    @inline def put(b: Int): Boolean = {
      if (op + 1 > opLimit) false
      else { out(op) = b.toByte; op += 1; true }
    }
    // decoder computes copyLen = mlen + 3 with mlen = 6 + sum(extension
    // bytes) in the extended case, so the extension encodes l - 9
    def putExtLen(l: Int): Boolean = {
      var rem = l - 9
      while (rem >= 255) { if (!put(255)) return false; rem -= 255 }
      put(rem)
    }
    while (ip + 2 < end) {
      var matched = 0
      var dist = 0
      val h = hash(ip)
      val cand = htab(h)
      htab(h) = ip
      if (cand >= off && cand < ip && ip - cand <= MaxDistance + 65535 + 1 &&
          src(cand) == src(ip) && src(cand + 1) == src(ip + 1) && src(cand + 2) == src(ip + 2)) {
        var l = 3
        while (ip + l < end && src(cand + l) == src(ip + l)) l += 1
        matched = l
        dist = ip - cand
      }
      if (matched >= 3) {
        if (!flushLiterals(ip)) return -1
        val stored = dist - 1
        val l = matched
        val vbits = if (l - 2 < 7) l - 2 else 7
        if (stored <= MaxDistance - 1) { // short form (8191 is the far marker)
          if (!put((vbits << 5) | (stored >> 8))) return -1
          if (vbits == 7 && !putExtLen(l)) return -1
          if (!put(stored & 0xff)) return -1
        } else { // far form: stored in [8191, 8191+65535]
          val far = stored - MaxDistance
          require(far <= 0xffff, "blosclz: distance out of range")
          if (!put((vbits << 5) | 31)) return -1
          if (vbits == 7 && !putExtLen(l)) return -1
          if (!put(255)) return -1
          if (!put(far >>> 8)) return -1
          if (!put(far & 0xff)) return -1
        }
        // index positions inside the match so later matches can refer here
        var p = ip + 1
        val stop = math.min(ip + l, end - 3)
        while (p < stop) { htab(hash(p)) = p; p += 1 }
        ip += l
        anchor = ip
      } else {
        ip += 1
      }
    }
    if (!flushLiterals(end)) return -1
    val size = op - outOff
    if (size >= len) -1 else size
  }
}
