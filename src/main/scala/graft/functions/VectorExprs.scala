package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity-search hot path.
  *
  * `zip_with` + `aggregate` higher-order functions are interpreted per row
  * (lambda dispatch per element); these expressions generate a tight fused
  * loop inside whole-stage codegen instead — the preferred extension point
  * before UDFs (see SURVEY.md §2.8).
  *
  * Semantics match the HOF formulation exactly: elements are cast to double
  * and accumulated left-to-right, so results are bit-identical to the
  * previous implementation (and to the DuckDB oracle's
  * `sum(x::DOUBLE * y::DOUBLE)` over zipped unnest).
  */
object VectorExprs {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def elemAccess(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  private def elemEval(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  /** Shared shape for the fused vector kernels: both inputs must be
    * `array<float|double|tinyint>` (checked at analysis, not as a runtime
    * CCE — tinyint serves int8-quantized code vectors, accumulated exactly
    * in double), and a null ELEMENT nulls the result — exactly the
    * documented `zip_with`+`aggregate` semantics (a null product poisons
    * the sum). */
  sealed trait VectorKernel extends BinaryExpression {
    override def dataType: DataType = DoubleType

    protected def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    protected def mayHaveNullElems: Boolean = Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

    override def nullable: Boolean = left.nullable || right.nullable || mayHaveNullElems

    override def checkInputDataTypes(): TypeCheckResult = {
      val bad = Seq(left, right).map(_.dataType).collectFirst {
        case t @ ArrayType(et, _) if et != FloatType && et != DoubleType && et != ByteType => t
        case t if !t.isInstanceOf[ArrayType] => t
      }
      bad match {
        case Some(t) => TypeCheckResult.TypeCheckFailure(
          s"${prettyName} requires array<float>, array<double> or array<tinyint> arguments, got ${t.simpleString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    }

    /** Per-element null guard for generated code; empty when the element
      * types are provably non-null so the hot loop stays branch-free. */
    protected def nullGuard(a: String, b: String, i: String, onNull: String): String =
      if (mayHaveNullElems) s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $onNull }" else ""
  }

  /** dot(a, b) = Σ aᵢ·bᵢ in double precision over float/double arrays.
    * Null-safe (null input/element → null); mismatched lengths truncate to
    * the shorter (same as zip_with). */
  case class DotProduct(left: Expression, right: Expression) extends VectorKernel {

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (ta, tb) = (elemType(left), elemType(right))
      val nullable = mayHaveNullElems
      val n = math.min(aa.numElements(), bb.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (nullable && (aa.isNullAt(i) || bb.isNullAt(i))) return null
        acc += elemEval(aa, i, ta) * elemEval(bb, i, tb)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val ea = elemAccess(a, i, elemType(left))
        val eb = elemAccess(b, i, elemType(right))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${nullGuard(a, b, i, s"${ev.isNull} = true; break;")}
           |  $acc += $ea * $eb;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cos(a, b) = dot(a,b) / (‖a‖·‖b‖), accumulating all three sums in one
    * fused pass. Returns null for null inputs/elements; 0 for zero-norm
    * vectors. */
  case class CosineSim(left: Expression, right: Expression) extends VectorKernel {

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (ta, tb) = (elemType(left), elemType(right))
      val nullable = mayHaveNullElems
      val n = math.min(aa.numElements(), bb.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (nullable && (aa.isNullAt(i) || bb.isNullAt(i))) return null
        val x = elemEval(aa, i, ta); val y = elemEval(bb, i, tb)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("d")
        val ea = elemAccess(a, i, elemType(left))
        val eb = elemAccess(b, i, elemType(right))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${nullGuard(a, b, i, s"${ev.isNull} = true; break;")}
           |  double $x = $ea; double $y = $eb;
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if (!${ev.isNull}) {
           |  ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  /** Column-level entry points. */
  def vec_dot(a: Column, b: Column): Column = toColumn(DotProduct(toExpression(a), toExpression(b)))
  def vec_cosine(a: Column, b: Column): Column = toColumn(CosineSim(toExpression(a), toExpression(b)))

  /** SQL registration: `SELECT vec_dot(a, b), vec_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
  }
}
