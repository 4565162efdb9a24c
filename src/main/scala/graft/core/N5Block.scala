package graft.core

/** N5 block-object framing (public format: github.com/saalfeldlab/n5 README,
  * "Default block" layout). Every block object is
  *
  *   `{mode: u16 = 0, numDims: u16, dims: u32[numDims]}` big-endian header,
  *   written RAW, followed by the element payload run through the dataset's
  *   compression stream.
  *
  * Values are big-endian too (n5 serializes via java DataOutputStream), so
  * the bridge to this engine's little-endian buffers is one O(n) byte swap
  * inside the executor task that fetched the block. 3-d blocks only — the
  * dims carry the block's ACTUAL (edge-clipped) size, which the engine
  * cross-checks against the clamped chunk box.
  */
object N5Block {

  val headerLen: Int = 2 + 2 + 3 * 4

  /** Strip the default-mode block header; returns (dims, payload). Fails
    * loudly (message, not a BufferUnderflowException) on truncated or
    * corrupt framing — the caller adds the block key for context. */
  def strip(blob: Array[Byte]): ((Int, Int, Int), Array[Byte]) = {
    require(blob.length >= headerLen,
      s"n5: block object truncated (${blob.length} bytes < $headerLen-byte header)")
    val bb = java.nio.ByteBuffer.wrap(blob) // big-endian by default
    val mode = bb.getShort()
    require(mode == 0, s"n5: only default block mode supported, got $mode")
    val nd = bb.getShort()
    require(nd == 3, s"n5: block rank $nd unsupported (3-d only)")
    val dims = (bb.getInt(), bb.getInt(), bb.getInt())
    require(dims._1 > 0 && dims._2 > 0 && dims._3 > 0,
      s"n5: non-positive block dims $dims")
    val payload = java.util.Arrays.copyOfRange(blob, bb.position(), blob.length)
    (dims, payload)
  }

  /** Default-mode block header for a block of the given dims. */
  def header(dx: Int, dy: Int, dz: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(headerLen)
    bb.putShort(0).putShort(3).putInt(dx).putInt(dy).putInt(dz)
    bb.array()
  }

  /** Endianness swap per element (n5 payloads are big-endian, the engine's
    * buffers little-endian). Identity for 1-byte types. */
  def swapEndian(bytes: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return bytes
    require(bytes.length % elemSize == 0, s"n5: payload not a multiple of $elemSize")
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < bytes.length) {
      var k = 0
      while (k < elemSize) { out(i + k) = bytes(i + elemSize - 1 - k); k += 1 }
      i += elemSize
    }
    out
  }
}
