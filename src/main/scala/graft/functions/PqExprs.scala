package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (IVFADC-family): the vector is cut into
  * `m` subspaces and each subvector is replaced by the id of its nearest
  * codebook centroid — `m` bytes instead of `dim` floats at rest and in
  * shuffle. Scoring decodes to the concatenated centroids (asymmetric
  * distance: exact query × quantized corpus), so the inner product against
  * a reconstruction equals the sum of per-subspace table lookups without
  * materializing any per-query tables.
  *
  * Same engineering rules as [[CentroidExprs]]: the codebook tensor rides
  * as ONE reference object (generated code size independent of m·k), and
  * every floating-point reduction is a sequential left-to-right sum so the
  * DuckDB replay oracle reproduces results bit-for-bit. Distances compare
  * via the three-dot-product expansion `(‖x‖² − 2·x·c) + ‖c‖²` — BOTH
  * engines compute exactly this association, so near-tie argmin decisions
  * can never diverge. */
sealed trait PqKernel extends UnaryExpression {
  /** codebooks(m)(code) = centroid of subspace `m`, length dim/m. */
  def codebooks: Array[Array[Array[Double]]]

  protected def subDim: Int = codebooks(0)(0).length

  /** ‖c‖² per (subspace, code), pre-computed once per task (sequential
    * sum — bit-identical to the oracle's `list_dot_product(cent, cent)`). */
  @transient protected lazy val centNorm2: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var n = 0.0; var i = 0
      while (i < c.length) { n += c(i) * c(i); i += 1 }
      n
    })

  def compute(arr: ArrayData): AnyRef

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqKernel", this, "graft.functions.PqKernel")
      val r = ctx.freshName("r")
      // ev.isNull is only DECLARED by nullSafeCodeGen for nullable
      // expressions — referencing it otherwise is uncompilable generated
      // Java (silent interpreted fallback); see CentroidKernel.doGenCode
      val onNull =
        if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(\"non-nullable pq kernel returned null\");"
      s"""
         |Object $r = $self.compute($a);
         |if ($r == null) { $onNull }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
}

/** `array<float|double>` → `array<int>` of per-subspace nearest-code ids
  * (squared L2, ties to the smallest code — ≡ `ORDER BY dist, code`).
  * One row-local pass, zero shuffle: the encode side of a PQ index build. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends PqKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }
  override def nullable: Boolean = child.nullable || mayHaveNullElems

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.simpleString}")
  }

  // hoisted once per expression instance — elem runs m·k·subDim times per
  // row, a DataType pattern match there is pure hot-loop overhead
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elem(arr: ArrayData, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  override def compute(arr: ArrayData): AnyRef = {
    // a short row would otherwise read past numElements on UnsafeArrayData
    // (no bounds check) and emit plausible-looking garbage codes
    require(arr.numElements() == codebooks.length * subDim,
      s"pq_encode: expected ${codebooks.length * subDim}-dim vector, got ${arr.numElements()}")
    if (mayHaveNullElems) {
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) return null // null element poisons, like vec_*
        i += 1
      }
    }
    val m = codebooks.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      // ‖x_s‖² once per subspace (sequential — same value the oracle's
      // list_dot_product(sv, sv) computes)
      var nx = 0.0
      var i = 0
      while (i < subDim) { val x = elem(arr, off + i); nx += x * x; i += 1 }
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dot = 0.0
        var j = 0
        while (j < subDim) { dot += elem(arr, off + j) * cent(j); j += 1 }
        // the exact association the oracle uses: (nx - 2·dot) + ‖c‖²
        val d = (nx - 2.0 * dot) + centNorm2(s)(c)
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) { best = c; bestD = d }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `array<int>` codes → `array<double>` reconstruction (the concatenated
  * selected centroids) — the decode side of asymmetric-distance scoring:
  * `vec_dot(query, pq_decode(codes))` is the ADC inner product. */
case class PqDecode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends PqKernel {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }
  override def nullable: Boolean = child.nullable || mayHaveNullElems

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.simpleString}")
  }

  override def compute(arr: ArrayData): AnyRef = {
    val m = codebooks.length
    require(arr.numElements() == m, s"expected $m codes, got ${arr.numElements()}")
    // getInt on a null slot silently reads 0 (decodes centroid 0) — poison
    // instead, mirroring pq_encode's null handling
    if (mayHaveNullElems) {
      var i = 0
      while (i < m) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
    }
    val out = new Array[Any](m * subDim)
    var s = 0
    while (s < m) {
      val code = arr.getInt(s)
      val cb = codebooks(s)
      require(code >= 0 && code < cb.length,
        s"pq_decode: code $code out of range [0, ${cb.length}) in subspace $s")
      val cent = cb(code)
      var i = 0
      while (i < subDim) { out(s * subDim + i) = cent(i); i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqExprs {
  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqEncode(toExpression(emb), codebooks))

  def pq_decode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqDecode(toExpression(codes), codebooks))
}
