package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nfkc(str)` — Unicode NFKC normalization (compatibility decomposition
  * followed by canonical composition) via the JDK's `java.text.Normalizer`,
  * no ICU dependency. This is the canonicalization CCNet-family dedup
  * pipelines run before hashing: ligatures (ﬁ→fi), full/half-width forms
  * (Ｈ→H), superscripts (²→2), circled/roman numerals, unit squares
  * (㎒→MHz) and non-breaking spaces all collapse to their compatibility
  * equivalents, and decomposed accent sequences (e + U+0301) compose — so
  * visually-identical text gets one md5, not many.
  *
  * Row-local and codegen'd (a static JDK call inside whole-stage codegen —
  * no UDF serialization, no fallback to interpreted projection). */
object NfkcExpr {

  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  case class Nfkc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nfkc expects STRING, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFKC))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFKC))")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfkc(s: Column): Column = toColumn(Nfkc(toExpression(s)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("nfkc",
      exprs => Nfkc(exprs.head), "built-in")
}
