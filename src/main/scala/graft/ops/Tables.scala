package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table access + cross-engine-deterministic numeric helpers.
  *
  * The driver validates every query against DuckDB by hashing result values,
  * so floating-point aggregates must be bit-reproducible across engines:
  * sums run on exact decimals (order-insensitive), and only the final value
  * is cast to double and rounded.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture has shipped two physical ts encodings: parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects (read as raw
    * int64 via `nanosAsLong` and truncated to µs), and plain
    * TIMESTAMP(MICROS) without timezone, which Spark reads natively as
    * TIMESTAMP_NTZ. Normalize both to a session-tz TIMESTAMP — sessions run
    * UTC, so the NTZ cast preserves the wall-clock epoch micros DuckDB sees. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  /** Normalize a raw events `ts` column (int64 nanos or TIMESTAMP_NTZ µs)
    * to TIMESTAMP; shared by the batch and streaming loaders. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      // the NTZ→TZ cast preserves epoch micros only under a UTC session —
      // enforce it here rather than trusting every entrypoint's builder
      require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "normalizeTs requires spark.sql.session.timeZone=UTC (the NTZ cast shifts otherwise)")
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  /** Exact decimal sum of a double column (identical in Spark and DuckDB
    * regardless of partial-aggregation order). */
  def dsum(c: Column, scale: Int = 4): Column = sum(c.cast(DecimalType(18, scale)))

  /** Exact decimal product-sum: sum(a*b) with both factors decimal-cast. */
  def dsum2(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4)))

  /** Final presentation: double rounded to `s` places, signed-zero
    * normalized. Spark's round (BigDecimal HALF_UP) can never emit `-0.0`
    * so the `+ 0.0` is a numeric no-op here — it exists as the visible
    * half of the repo-wide convention (r8 s24: DuckDB's round PRESERVES
    * `-0.0`, value-equal but hash-different under the driver's formatted
    * hash). The enforcement point is mechanical — `Verify.normSignedZero`
    * / `Verify.wrapOracle` normalize every float/double output column on
    * both engines at the gate boundary — so no hand-written oracle can
    * reintroduce the class; SignedZeroSpec pins each path. */
  def outd(c: Column, s: Int = 3): Column = round(c.cast(DoubleType), s) + lit(0.0)

  /** Eagerly materialize a multiply-consumed intermediate.
    *
    * With a checkpoint directory configured (`sc.setCheckpointDir`, the
    * standard knob — point it at durable storage on a real cluster; the
    * bench/driver honor `SPARK_GRAFT_CHECKPOINT_DIR`) this is a RELIABLE
    * checkpoint: blocks survive executor loss, so long jobs under dynamic
    * allocation / node failure recover instead of failing hard. The input
    * is cached across the two checkpoint jobs — a bare `checkpoint(true)`
    * recomputes its RDD when the checkpoint-WRITE job runs (the
    * `RDD.checkpoint` contract), which would re-scan the source twice; with
    * the cache, the write job reads blocks, keeping the source-scan count
    * at one (the invariant PlanShapeSpec pins). The cache is dropped as
    * soon as the checkpoint files exist.
    * Without a checkpoint dir it falls back to `localCheckpoint(eager =
    * true)` — cheapest for bench/local runs, but executor-local: losing an
    * executor loses blocks that lineage can no longer recompute, turning a
    * retryable recompute into a job failure. Production 100 TB runs should
    * set the checkpoint dir; everything here works either way. */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(true) finally df.unpersist(false)
    } else df.localCheckpoint(true)
}
