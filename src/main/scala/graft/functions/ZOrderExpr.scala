package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `zorder_key(x, y, z)` — the 3-d Morton (z-order) code of a grid cell:
  * the bits of the three coordinates interleaved into one 63-bit long
  * (x lowest). Cells close in space get close codes, so sorting or
  * `repartitionByRange` on the key clusters spatially adjacent chunks into
  * the same files/partitions — the standard multi-dimensional layout trick
  * (z-ordering) that turns 3-d box queries into a few contiguous key
  * ranges at 100 TB instead of a scatter over the whole store.
  *
  * Domain: coordinates in `[0, 2^21)` per axis (21 bits × 3 = 63 bits);
  * higher bits are masked off. Codegen'd bit-spreading (magic masks), no
  * loops — stays inside whole-stage codegen.
  */
object ZOrderExpr {

  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  /** The five spread steps: 21 source bits fanned out to every 3rd bit.
    * Shared by eval, codegen, and the DuckDB oracle generator so the
    * constants can never drift. */
  val SpreadMasks: Seq[(Int, Long)] = Seq(
    32 -> 0x1F00000000FFFFL,
    16 -> 0x1F0000FF0000FFL,
    8 -> 0x100F00F00F00F00FL,
    4 -> 0x10C30C30C30C30C3L,
    2 -> 0x1249249249249249L)

  val CoordMask: Long = 0x1FFFFFL // 21 bits per axis

  def spread(v0: Long): Long =
    SpreadMasks.foldLeft(v0 & CoordMask) { case (v, (sh, m)) => (v | (v << sh)) & m }

  def interleave3(x: Int, y: Int, z: Int): Long =
    spread(x.toLong) | (spread(y.toLong) << 1) | (spread(z.toLong) << 2)

  case class ZOrderKey(x: Expression, y: Expression, z: Expression)
      extends TernaryExpression {
    override def first: Expression = x
    override def second: Expression = y
    override def third: Expression = z
    override def dataType: DataType = LongType

    // INT coordinates checked at analysis, not as a runtime CCE (the
    // interpreted path casts; the codegen path would mask the mismatch)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      val bad = children.map(_.dataType).filterNot(_ == IntegerType)
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects INT coordinates, got ${children.map(_.dataType.simpleString).mkString(", ")}")
    }

    override def nullSafeEval(xv: Any, yv: Any, zv: Any): Any =
      interleave3(xv.asInstanceOf[Int], yv.asInstanceOf[Int], zv.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xv, yv, zv) => {
        def spreadCode(src: String, v: String): String =
          s"long $v = ((long) $src) & ${CoordMask}L;\n" +
            SpreadMasks.map { case (sh, m) => s"$v = ($v | ($v << $sh)) & ${m}L;" }
              .mkString("\n") + "\n"
        val (sx, sy, sz) = (ctx.freshName("sx"), ctx.freshName("sy"), ctx.freshName("sz"))
        spreadCode(xv, sx) + spreadCode(yv, sy) + spreadCode(zv, sz) +
          s"${ev.value} = $sx | ($sy << 1) | ($sz << 2);"
      })

    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
      copy(x = a, y = b, z = c)
  }

  def zorder_key(x: Column, y: Column, z: Column): Column =
    toColumn(ZOrderKey(toExpression(x), toExpression(y), toExpression(z)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("zorder_key",
      exprs => ZOrderKey(exprs(0), exprs(1), exprs(2)), "built-in")
}
