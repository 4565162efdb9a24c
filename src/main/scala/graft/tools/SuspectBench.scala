package graft.tools

import org.apache.spark.sql.SparkSession

/** Controlled re-measure for bench entries flagged `suspect` by a round
  * verdict (r3: q02_join5, q22_setops_all — 2-4x swings on unchanged code
  * with clean plans). Runs each query N times in BOTH orders under the
  * exact Bench harness settings (noop sink, AQE on, 32 shuffle
  * partitions), prints per-run times + best/median so machine variance can
  * be separated from structural regressions. */
object SuspectBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_join5", "q22_setops_all")
    val reps = 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup: session + parquet footers + codegen
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    names.foreach(force)

    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"best=${s.head}%.3f median=${s(s.length / 2)}%.3f worst=${s.last}%.3f runs=[${xs.map(x => f"$x%.2f").mkString(",")}]"
    }
    val fwd = names.map(n => n -> (1 to reps).map(_ => force(n))).toMap
    val bwd = names.reverse.map(n => n -> (1 to reps).map(_ => force(n))).toMap
    names.foreach { n =>
      println(s"[suspect] $n order=fwd ${stats(fwd(n))}")
      println(s"[suspect] $n order=rev ${stats(bwd(n))}")
    }
    spark.stop()
  }
}
