package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact upper-triangle product-limb sums for the covariance fit (s24) —
  * the custom-aggregate form of the r12 "unscaled-long limb kernel":
  * for each input row (an array of `dim` exact scaled longs `u`), every
  * upper-triangle product `t = u(i)·u(j)` (i ≤ j) splits into exact
  * base-1e9 limbs `t = (t div 1e9)·1e9 + (t % 1e9)` (truncating-div
  * identity — sign carried by both limbs), and the aggregate maintains
  * the two LONG limb sums per triangle cell. Long addition commutes, so
  * the result is bit-identical to the r12 formulation that exploded
  * dim·(dim+1)/2 struct rows per vector into a (i, j)-keyed hash
  * aggregate — but the per-row work here is one tight JVM loop over a
  * primitive buffer: no generator, no 2 080 InternalRows per input row,
  * no hash-map probe per term, and the exchange carries ONE buffer per
  * partition instead of partial sums per (i, j) key.
  *
  * Output: `array<bigint>` of length `dim·(dim+1) + 1` — cell `p`
  * (row-major over the upper triangle) has its hi-limb sum at index `2p`
  * and lo-limb sum at `2p+1`, and the LAST element counts the rows
  * actually accumulated. The caller reassembles `Σt = sh·1e9 + sl` in
  * DECIMAL(38,0) exactly as before and reads `n` from the same buffer.
  * Exactness bounds are the s24 header's: |coordinate| < 10 keeps
  * |u| ≤ 1e9, each product ≤ 1e18 inside int64, and each limb sum holds
  * ~9e9 rows before nearing int64. Rows whose array is null (or contains
  * nulls) are skipped — and, because the row counter lives INSIDE the
  * buffer, skipped rows are excluded from `n` and from the sums
  * consistently (ADVICE r13: a separate `count(u)` counted
  * null-element rows the fold skipped).
  */
case class TriangleLimbSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val nCells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"triangle_limb_sum expects array<bigint>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * nCells + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"triangle_limb_sum: input length ${arr.numElements()} != declared dim $dim")
      val u = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return buf // skip rows with null coordinates
        u(i) = arr.getLong(i)
        i += 1
      }
      var p = 0
      i = 0
      while (i < dim) {
        val ui = u(i)
        var j = i
        while (j < dim) {
          val t = ui * u(j)
          buf(2 * p) += t / 1000000000L
          buf(2 * p + 1) += t % 1000000000L
          p += 1
          j += 1
        }
        i += 1
      }
      buf(2 * nCells) += 1 // rows actually accumulated (not the skipped ones)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < a.length) { a(p) += b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TriangleLimbSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TriangleLimbSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "triangle_limb_sum"
}

object TriangleLimbSumAgg {
  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  /** Column entry point: `triangle_limb_sum(uCol, dim)` over an
    * `array<bigint>` column of fixed length `dim`. */
  def triangle_limb_sum(u: Column, dim: Int): Column =
    toColumn(TriangleLimbSumAgg(toExpression(u), dim).toAggregateExpression())
}
