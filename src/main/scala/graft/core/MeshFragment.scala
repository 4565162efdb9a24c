package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Neuroglancer "precomputed" LEGACY mesh fragment codec (the public
  * single-resolution format every segmentation viewer consumes; reference
  * datasets ship it next to the voxel layers this engine already reads):
  *
  * ```
  * uint32le  num_vertices
  * float32le vertices[num_vertices * 3]   (x, y, z triplets)
  * uint32le  indices[...]                 (triangles; length implied by EOF)
  * ```
  *
  * plus, per segment id, a JSON manifest object `<segid>:0` of the form
  * `{"fragments": ["<fragment-name>", ...]}` naming the binary fragment
  * objects. Encode exists so fixtures and exports roundtrip through the
  * REAL bytes; decode validates framing loudly (truncation must never
  * return garbage geometry).
  */
object MeshFragment {

  final case class Mesh(vertices: Array[Float], indices: Array[Int]) {
    def numVertices: Int = vertices.length / 3
    def numFaces: Int = indices.length / 3
  }

  def encode(m: Mesh): Array[Byte] = {
    require(m.vertices.length % 3 == 0, "vertices must be xyz triplets")
    require(m.indices.length % 3 == 0, "indices must be triangles")
    val buf = ByteBuffer.allocate(4 + 4 * m.vertices.length + 4 * m.indices.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(m.numVertices)
    m.vertices.foreach(buf.putFloat)
    m.indices.foreach(buf.putInt)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Mesh = {
    require(bytes.length >= 4, s"mesh fragment truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nv = buf.getInt()
    require(nv >= 0 && bytes.length >= 4 + 12L * nv,
      s"mesh fragment truncated: $nv vertices declared, ${bytes.length} bytes")
    val verts = new Array[Float](nv * 3)
    var i = 0
    while (i < verts.length) { verts(i) = buf.getFloat(); i += 1 }
    val rest = bytes.length - 4 - 12 * nv
    require(rest % 12 == 0,
      s"mesh fragment index section is $rest bytes — not whole uint32 triangles")
    val idx = new Array[Int](rest / 4)
    i = 0
    while (i < idx.length) { idx(i) = buf.getInt(); i += 1 }
    idx.foreach(v => require(v >= 0 && v < nv, s"index $v out of range (nv=$nv)"))
    Mesh(verts, idx)
  }

  /** The manifest JSON for one segment (legacy layout: `<segid>:0`). */
  def manifestJson(fragments: Seq[String]): String =
    fragments.map(f => "\"" + f + "\"").mkString("{\"fragments\": [", ", ", "]}")

  /** Parse a legacy manifest — minimal, loud. */
  def parseManifest(json: String): Seq[String] = {
    val m = "\"fragments\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"not a mesh manifest: $json"))
    val body = m.group(1).trim
    if (body.isEmpty) Seq.empty
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }
}
