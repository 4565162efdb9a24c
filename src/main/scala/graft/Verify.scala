package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, transform => atransform}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Signed-zero gate normalization, Spark side.
    *
    * Spark's `round()` (BigDecimal HALF_UP — no signed zero) can never emit
    * `-0.0`; DuckDB's `round()` preserves it. Any oracle that rounds a
    * signed/centered quantity can therefore produce `-0.0` where Spark
    * produces `+0.0` — value-equal, hash-DIFFERENT under the driver's
    * formatted hash (r8: s24 cell (5,9)). Rather than hand-normalizing
    * every signed `round()` in ~200 oracle strings (and re-missing the
    * class on the next new query), the GATE BOUNDARY normalizes BOTH
    * engines mechanically: every float/double output column (top-level or
    * array element) gets `+ 0.0` (IEEE 754: `-0.0 + 0.0 = +0.0`; exact
    * identity for every other value including NaN/±Inf) on the Spark
    * result before the dump, and on the oracle SQL via [[wrapOracle]]'s
    * projection — the convention is enforced by construction, not by grep. */
  def normSignedZero(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType => col(f.name) + lit(0.0d)
        case FloatType  => col(f.name) + lit(0.0f)
        case ArrayType(DoubleType, _) => atransform(col(f.name), _ + lit(0.0d))
        case ArrayType(FloatType, _)  => atransform(col(f.name), _ + lit(0.0f))
        case _ => col(f.name)
      }
    }
    df.select(df.schema.fields.zip(cols).map { case (f, c) => c.as(f.name) }.toSeq: _*)
  }

  /** Signed-zero gate normalization, oracle side: wrap the SQL in one
    * projection that applies the same `+ 0.0` to the same columns (driven
    * by the SPARK result schema — names must already match for the gate to
    * pass at all). FLOAT columns add a FLOAT zero so the oracle's type is
    * unchanged (FLOAT + DOUBLE would widen). Queries whose Spark run failed
    * have no schema and dump unwrapped — their row is already red. */
  def wrapOracle(sql: String, schema: StructType): String = {
    def qn(n: String) = "\"" + n.replace("\"", "\"\"") + "\""
    val needs = schema.fields.exists(f => f.dataType match {
      case DoubleType | FloatType => true
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    })
    if (!needs) sql
    else {
      val proj = schema.fields.map { f =>
        f.dataType match {
          case DoubleType => s"${qn(f.name)} + 0.0 AS ${qn(f.name)}"
          case FloatType  => s"${qn(f.name)} + CAST(0.0 AS FLOAT) AS ${qn(f.name)}"
          case ArrayType(DoubleType, _) =>
            s"list_transform(${qn(f.name)}, x -> x + 0.0) AS ${qn(f.name)}"
          case ArrayType(FloatType, _) =>
            s"list_transform(${qn(f.name)}, x -> x + CAST(0.0 AS FLOAT)) AS ${qn(f.name)}"
          case _ => qn(f.name)
        }
      }.mkString(", ")
      s"SELECT $proj FROM (\n$sql\n) AS graft_zero_norm"
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: only dump queries whose name contains one of
    // them (dev iteration; the driver always passes exactly two args)
    val only = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a failed query must leave a VISIBLE artifact, not silently vanish
    // from the dump (a missing parquet dir reads as "not registered" to the
    // driver) — collect failures and write errors.json alongside the dumps
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // result schemas, collected per dumped query, drive the oracle-side
    // signed-zero wrap (names/types are the Spark result's by definition)
    val schemas = scala.collection.mutable.Map.empty[String, StructType]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
      .foreach { case (name, fn) =>
      try {
        val df = normSignedZero(fn(spark, sfDir))
        schemas(name) = df.schema
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = schemas.get(k).map(wrapOracle(v, _)).getOrElse(v)
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // loud, but exit 0: a nonzero exit could make the driver discard the
    // healthy dumps too — the errors.json artifact plus VerifyGateSpec
    // (which runs every registered query) are the enforcement points
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} FAILED: ${errors.keys.mkString(", ")} (see errors.json)")
    spark.stop()
  }
}
