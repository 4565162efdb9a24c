package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash aggregate — the custom-AGGREGATE extension point of the
  * Catalyst surface (scalar expressions, a Generator, and a plan node live
  * elsewhere; this completes the set).
  *
  * `simhash_agg(hash64)` folds any number of 64-bit element hashes into a
  * 64-char bit string: counter j accumulates +1/−1 per element depending on
  * bit j of the hash; the output bit is 1 when the counter is positive
  * (MSB first) — identical to the 64-column `sum(when(...))` formulation in
  * graft.ops.Dedup.simhash, but in ONE fixed 256-byte buffer per group
  * instead of 64 shuffled sum columns. Partial aggregation (map-side
  * combine) works as usual: `merge` sums counter vectors.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects a 64-bit hash column (BIGINT), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val sb = new java.lang.StringBuilder(64)
    var j = 63
    while (j >= 0) { sb.append(if (buf(j) > 0) '1' else '0'); j -= 1 }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_agg"
}

object SimhashAgg {
  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  /** Column entry point: `simhash_agg(hashCol)` (input must be BIGINT,
    * e.g. `xxhash64(...)`; enforced at analysis by checkInputDataTypes). */
  def simhash_agg(hash: Column): Column =
    toColumn(SimhashAgg(toExpression(hash)).toAggregateExpression())

  /** SQL registration: builders return the raw AggregateFunction — the
    * analyzer wraps it in an AggregateExpression (same contract as the
    * built-in Sum/Avg builders). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_agg", exprs => SimhashAgg(exprs.head), "built-in")
}
