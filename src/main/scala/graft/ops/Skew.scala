package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * `saltedAgg` is the classic two-phase aggregation for heavily skewed group
  * keys: phase 1 aggregates on (key, salt) — spreading one hot key over
  * `buckets` reducers — phase 2 merges the partials. Results are identical
  * to a direct groupBy (which is how the oracle checks it); only the shuffle
  * distribution changes. AQE's skew-join handling covers joins; this covers
  * aggregation, where AQE cannot split a hot group. */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param df       input
    * @param keys     group-by keys
    * @param sums     columns to sum (must be re-aggregable: sum of sums)
    * @param buckets  salt fan-out for phase 1
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], sums: Seq[(Column, String)],
      buckets: Int = 16): DataFrame = {
    // the salt must be DETERMINISTIC per row: under a fetch-failure partial
    // recompute, a nondeterministic salt (partition id, monotonic id, rand)
    // can re-bucket rows between attempts and double-count/lose them in
    // phase 1 (SPARK-23207). A hash of the full row content spreads a hot
    // key just as well and is stable across retries.
    val salted = df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(sums.head._1).as(s"__p_${sums.head._2}"),
        sums.tail.map { case (c, n) => sum(c).as(s"__p_$n") } :+ count(lit(1)).as("__p_n"): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(s"__p_${sums.head._2}").as(sums.head._2),
        sums.tail.map { case (_, n) => sum(s"__p_$n").as(n) } :+ sum("__p_n").as("n"): _*)
  }

  /** Salt-and-replicate equi-join for a skewed PROBE side — the manual
    * skew-join decomposition for when AQE's OptimizeSkewedJoin can't fire
    * (its split works per shuffle partition at runtime; a probe side whose
    * single hottest key dwarfs every split threshold, or a join forced
    * under a strict shuffle reuse, still hot-spots one reducer). Each probe
    * row gets a deterministic content-hash salt in [0, buckets) — stable
    * under fetch-failure recompute (SPARK-23207, same discipline as
    * [[saltedAgg]]) — and the build side replicates `buckets` times so
    * every (key, salt) bucket finds its matches. Output multiset is
    * IDENTICAL to the plain equi-join (the oracle checks exactly that);
    * only the reducer-key histogram flattens. Build-side cost: ×`buckets`
    * rows through one shuffle — use for moderate build sides that are
    * still too big to broadcast. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(buckets.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
