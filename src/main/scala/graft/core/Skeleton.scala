package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Neuroglancer "precomputed" SKELETON codec (the public per-segment
  * skeleton format that ships next to the voxel + mesh layers this engine
  * already reads; reference-ecosystem viewers consume it for neuron
  * tracing/QC):
  *
  * ```
  * uint32le  num_vertices
  * uint32le  num_edges
  * float32le vertex_positions[num_vertices * 3]   (x, y, z triplets)
  * uint32le  edges[num_edges * 2]                 (vertex-index pairs)
  * ```
  *
  * (optional per-vertex attributes follow in the full spec; this codec
  * covers the geometry core every consumer requires). Encode exists so
  * fixtures and exports roundtrip through the REAL bytes; decode validates
  * framing loudly — truncation or a dangling edge index must never return
  * garbage topology.
  */
object Skeleton {

  final case class Skel(vertices: Array[Float], edges: Array[Int]) {
    def numVertices: Int = vertices.length / 3
    def numEdges: Int = edges.length / 2
  }

  def encode(s: Skel): Array[Byte] = {
    require(s.vertices.length % 3 == 0, "vertices must be xyz triplets")
    require(s.edges.length % 2 == 0, "edges must be index pairs")
    val buf = ByteBuffer.allocate(8 + 4 * s.vertices.length + 4 * s.edges.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(s.numVertices)
    buf.putInt(s.numEdges)
    s.vertices.foreach(buf.putFloat)
    s.edges.foreach(buf.putInt)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Skel = {
    require(bytes.length >= 8, s"skeleton truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nv = buf.getInt()
    val ne = buf.getInt()
    require(nv >= 0 && ne >= 0 &&
      bytes.length == 8 + 12L * nv + 8L * ne,
      s"skeleton framing: $nv vertices + $ne edges declared, ${bytes.length} bytes")
    val verts = new Array[Float](nv * 3)
    var i = 0
    while (i < verts.length) { verts(i) = buf.getFloat(); i += 1 }
    val edges = new Array[Int](ne * 2)
    i = 0
    while (i < edges.length) { edges(i) = buf.getInt(); i += 1 }
    edges.foreach(v => require(v >= 0 && v < nv, s"edge index $v out of range (nv=$nv)"))
    Skel(verts, edges)
  }
}
