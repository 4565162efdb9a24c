package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.testutil.SparkSuite

/** The composition gate: the six-stage curation pipeline
  * (quality → dedup → decontam → reweight → quota-sample → export) must
  * hold its funnel invariants end-to-end — each stage only ever REMOVES or
  * ANNOTATES rows, survivors satisfy every upstream cut, and the
  * hive-partitioned export reloads losslessly. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  test("curation pipeline: monotone funnel, cut consistency, lossless export") {
    val (funnel, reloaded) = graft.tools.CurationPipelineDemo.run(spark, dir)
    val counts = funnel.toMap
    // monotone: no stage may ADD documents
    funnel.map(_._2).sliding(2).foreach { case Seq(a, b) => assert(b <= a, funnel.toString) }
    assert(counts("6_exported") == counts("5_sampled"))
    assert(counts("6_exported") > 0)
    // every survivor passes the quality verdict and is decontaminated
    val docs = Tables.t(spark, dir, "documents")
    val ids = reloaded.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val keepIds = TextOps.gopherRules(docs).filter(col("keep"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val contaminated = Corpus.decontaminate(docs).filter(col("contaminated"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keepIds), "an exported doc failed the quality verdict")
    assert(ids.intersect(contaminated).isEmpty, "a contaminated doc was exported")
    // survivors carry a finite importance weight
    reloaded.select(col("iw").cast("double")).collect().foreach { r =>
      assert(!r.getDouble(0).isNaN && !r.getDouble(0).isInfinite)
    }
    // per-source quota honored
    val perSource = reloaded.groupBy(col("source")).count()
      .collect().map(_.getLong(1))
    assert(perSource.forall(_ <= 12), perSource.mkString(","))
  }
}
