package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Print the physical plans of key queries for scan/shuffle/broadcast
  * inspection: `sbt "runMain graft.tools.PlanAudit [query ...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg", "q02_join5", "q06_topk", "q13_rangejoin", "d3_dedup_minhash", "s1_cosine_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
