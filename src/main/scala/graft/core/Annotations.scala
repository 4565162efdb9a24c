package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Neuroglancer "precomputed" ANNOTATION codec — the multiple-annotation
  * encoding used by the spatial-index and related-id cells of the public
  * `neuroglancer_annotations_v1` layer (the annotation layer ships next to
  * the voxel/mesh/skeleton layers this engine already reads; viewers use
  * it for synapses, somata, and proofreading point marks):
  *
  * ```
  * uint64le  count
  * float32le positions[count * 3]   (POINT geometry, rank-3 xyz triplets)
  * uint64le  annotation_ids[count]
  * ```
  *
  * (the full spec appends per-annotation property bytes after each
  * geometry and supports LINE/ELLIPSOID/BOX geometries; this codec covers
  * the rank-3 POINT core with no properties — the shape every spatial
  * index cell must at minimum frame). Encode exists so fixtures and
  * exports roundtrip through the REAL bytes; decode validates framing
  * loudly — a truncated cell must never return a partial point set.
  */
object Annotations {

  /** One spatial-index cell: `positions` are xyz triplets, row i of
    * `ids` labels triplet i. */
  final case class Points(positions: Array[Float], ids: Array[Long]) {
    require(positions.length == 3 * ids.length,
      s"positions/ids mismatch: ${positions.length} floats vs ${ids.length} ids")
    def count: Int = ids.length
  }

  def encode(p: Points): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 12 * p.count + 8 * p.count)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(p.count.toLong)
    p.positions.foreach(buf.putFloat)
    p.ids.foreach(buf.putLong)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Points = {
    require(bytes.length >= 8, s"annotation cell truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong()
    require(n >= 0 && n <= Int.MaxValue &&
      bytes.length == 8 + 20L * n,
      s"annotation cell framing: $n points declared, ${bytes.length} bytes")
    val pos = new Array[Float](3 * n.toInt)
    var i = 0
    while (i < pos.length) { pos(i) = buf.getFloat(); i += 1 }
    val ids = new Array[Long](n.toInt)
    i = 0
    while (i < ids.length) { ids(i) = buf.getLong(); i += 1 }
    Points(pos, ids)
  }
}
