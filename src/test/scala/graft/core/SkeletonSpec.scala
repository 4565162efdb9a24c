package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Byte-framing contract of the precomputed skeleton codec (a42's
  * foundation): exact roundtrip, and loud failure on truncation, trailing
  * garbage, and dangling edge indices — a corrupt object must never decode
  * into silently-wrong topology. */
class SkeletonSpec extends AnyFunSuite {
  private val skel = Skeleton.Skel(
    Array(0f, 0f, 0f, 2f, 0f, 0f, 2f, 2f, 0f),
    Array(0, 1, 1, 2))

  test("encode/decode roundtrip preserves every float and index") {
    val out = Skeleton.decode(Skeleton.encode(skel))
    assert(out.vertices.toSeq == skel.vertices.toSeq)
    assert(out.edges.toSeq == skel.edges.toSeq)
    assert(out.numVertices == 3 && out.numEdges == 2)
  }

  test("framing: byte length must equal 8 + 12*nv + 8*ne exactly") {
    val bytes = Skeleton.encode(skel)
    intercept[IllegalArgumentException](Skeleton.decode(bytes.dropRight(1)))
    intercept[IllegalArgumentException](Skeleton.decode(bytes :+ 0.toByte))
    intercept[IllegalArgumentException](Skeleton.decode(bytes.take(5)))
  }

  test("dangling edge index is rejected") {
    val bad = Skeleton.encode(Skeleton.Skel(skel.vertices, Array(0, 7)))
    intercept[IllegalArgumentException](Skeleton.decode(bad))
  }

  test("empty skeleton roundtrips") {
    val out = Skeleton.decode(Skeleton.encode(Skeleton.Skel(Array.empty, Array.empty)))
    assert(out.numVertices == 0 && out.numEdges == 0)
  }
}
