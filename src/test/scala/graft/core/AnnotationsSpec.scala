package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Byte-framing contract of the precomputed annotation-cell codec (a44's
  * foundation): exact roundtrip, and loud failure on truncation and
  * trailing garbage — a corrupt spatial-index cell must never decode into
  * a silently-partial point set. */
class AnnotationsSpec extends AnyFunSuite {
  private val pts = Annotations.Points(
    Array(1f, 2f, 3f, 4.5f, 5f, 6f), Array(11L, 22L))

  test("encode/decode roundtrip preserves every position and id") {
    val out = Annotations.decode(Annotations.encode(pts))
    assert(out.positions.toSeq == pts.positions.toSeq)
    assert(out.ids.toSeq == pts.ids.toSeq)
    assert(out.count == 2)
  }

  test("framing: byte length must equal 8 + 20*count exactly") {
    val bytes = Annotations.encode(pts)
    intercept[IllegalArgumentException](Annotations.decode(bytes.dropRight(1)))
    intercept[IllegalArgumentException](Annotations.decode(bytes :+ 0.toByte))
    intercept[IllegalArgumentException](Annotations.decode(bytes.take(5)))
  }

  test("positions/ids arity is enforced at construction") {
    intercept[IllegalArgumentException](
      Annotations.Points(Array(1f, 2f), Array(1L)))
  }

  test("empty cell roundtrips") {
    val out = Annotations.decode(Annotations.encode(
      Annotations.Points(Array.empty, Array.empty)))
    assert(out.count == 0)
  }
}
