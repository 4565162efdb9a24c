package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Pins the repo-wide signed-zero convention (r8 verdict: DuckDB's round
  * preserves `-0.0` where Spark's BigDecimal HALF_UP round cannot emit it —
  * value-equal, hash-DIFFERENT under the driver's formatted hash; s24 cell
  * (5,9) shipped red that way). Three layers, each fed a tiny negative:
  *   1. Spark `round()` itself — documents WHY Spark-side code is safe;
  *   2. `Tables.outd` — the in-query presentation helper;
  *   3. `Verify.normSignedZero` / `Verify.wrapOracle` — the mechanical gate
  *      boundary that normalizes EVERY float/double output column on both
  *      engines, so no hand-written oracle can reintroduce the class. */
class SignedZeroSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def isNegZero(d: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(d) == java.lang.Double.doubleToRawLongBits(-0.0)

  test("Spark round() on a tiny negative emits +0.0, never -0.0") {
    val r = spark.range(1)
      .select(round(lit(-5.0e-9), 6).as("r6"), round(lit(-0.0), 3).as("rz"))
      .head()
    assert(r.getDouble(0) == 0.0 && !isNegZero(r.getDouble(0)))
    assert(!isNegZero(r.getDouble(1)))
  }

  test("outd on a tiny negative is bitwise +0.0") {
    val d = spark.range(1).select(graft.ops.Tables.outd(lit(-4.9e-7), 6).as("v")).head()
    assert(d.getDouble(0) == 0.0 && !isNegZero(d.getDouble(0)))
  }

  test("normSignedZero flips -0.0 to +0.0 in double, float, and array columns") {
    import spark.implicits._
    val df = Seq((-0.0d, -0.0f, Seq(-0.0d, 1.5d, -0.0d), Seq(-0.0f), "s", 3L))
      .toDF("d", "f", "ad", "af", "str", "lng")
    val out = Verify.normSignedZero(df)
    // schema (names, types, order) unchanged — the driver compares both
    assert(out.schema == df.schema)
    val r = out.head()
    assert(!isNegZero(r.getDouble(0)))
    assert(java.lang.Float.floatToRawIntBits(r.getFloat(1)) == 0)
    val ad = r.getSeq[Double](2)
    assert(ad == Seq(0.0, 1.5, 0.0) && ad.forall(!isNegZero(_)))
    assert(java.lang.Float.floatToRawIntBits(r.getSeq[Float](3).head) == 0)
    assert(r.getString(4) == "s" && r.getLong(5) == 3L)
  }

  test("normSignedZero preserves null and NaN") {
    import spark.implicits._
    val df = Seq((Option.empty[Double], Double.NaN), (Some(-0.0d), 1.0))
      .toDF("d", "x")
    val rows = Verify.normSignedZero(df).collect().sortBy(r => r.isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(1).getDouble(1).isNaN)
    assert(!isNegZero(rows(0).getDouble(0)))
  }

  test("wrapOracle projects + 0.0 over exactly the float/double columns") {
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("cov", DoubleType),
      StructField("fv", FloatType), StructField("arr", ArrayType(DoubleType)),
      StructField("name", StringType)))
    val sql = Verify.wrapOracle("SELECT 1", schema)
    assert(sql.contains("\"cov\" + 0.0 AS \"cov\""))
    assert(sql.contains("\"fv\" + CAST(0.0 AS FLOAT) AS \"fv\""))
    assert(sql.contains("list_transform(\"arr\", x -> x + 0.0) AS \"arr\""))
    assert(sql.contains("\"i\",") && sql.contains("\"name\""))
    assert(!sql.contains("\"i\" + 0.0") && !sql.contains("\"name\" + 0.0"))
    assert(sql.contains("FROM (\nSELECT 1\n) AS graft_zero_norm"))
    // no float/double columns → SQL passes through untouched (no wrap noise)
    val intOnly = StructType(Seq(StructField("n", LongType), StructField("s", StringType)))
    assert(Verify.wrapOracle("SELECT 2", intOnly) == "SELECT 2")
  }

  test("end-to-end: a query whose rounded output is a signed zero gates clean") {
    // the s24 failure shape in miniature: round() of a tiny negative —
    // Spark emits +0.0; the oracle twin (DuckDB) would emit -0.0 and the
    // wrap's + 0.0 is exactly what re-aligns the formatted hash
    import spark.implicits._
    val got = Verify.normSignedZero(
      Seq(-4.0e-9, 2.5).toDF("v").select(round(col("v"), 6).as("r"))).collect()
    assert(got.forall(r => !isNegZero(r.getDouble(0))))
  }
}
