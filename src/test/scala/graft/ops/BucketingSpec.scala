package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.testutil.SparkSuite

/** Co-located joins via bucketing: both fact tables bucketed by the join key
  * so the sort-merge join needs no Exchange — the pre-partitioning pattern
  * for repeated large-scale joins (100 TB story: shuffle once at write time,
  * never again at read time). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      Tables.t(spark, dir, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.t(spark, dir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle on either bucketed side
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      // and results match the unbucketed join
      val expect = Tables.t(spark, dir, "lineitem")
        .join(Tables.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("streaming dedup within watermark drops duplicate event ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val name = s"dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      mem.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2))) // dup id 1 within watermark
      q.processAllAvailable()
      mem.addData((2L, ts(3)), (3L, ts(4)))
      q.processAllAvailable()
      val ids = spark.table(name).select("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }
}
