package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Plan-shape regression guards for the structural properties the engine
  * relies on at scale: filter pushdown reaching the parquet scan, dimension
  * joins broadcast, top-k planned as TakeOrderedAndProject, window top-k
  * using WindowGroupLimit, and no accidental cartesian products anywhere in
  * the driver query set. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter and column pruning reach the parquet scan") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(!p.contains("l_comment"), "pruned column leaked into the scan")
  }

  test("q02: dimension joins broadcast; no shuffle of the small sides") {
    val p = plan("q02_join5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q06: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q06_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s2: ranked filter pushes through the window as WindowGroupLimit") {
    val p = plan("s2_ann_lsh")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("no driver query plans a cartesian product") {
    // s4's centroid scoring is now inlined literals (row-local argmax +
    // sort), so even the IVF path must be equi-join-only
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Set("e1_stream_hourly", "e2_stream_dedup", "e3_stream_enrich",
        "e4_stream_sessions", "e5_stream_sessions_wm")) // streaming: no batch plan
      .filter { n =>
        val p = plan(n)
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders == Seq("s1_cosine_topk", "s5_sq8_topk", "t9_bm25"),
      s"unexpected non-equi joins in: $offenders")
    // s1/s5 are the EXACT brute-force baselines (float and int8-quantized):
    // a query×corpus comparison is definitionally all-pairs, implemented as
    // a broadcast nested loop of the 10-row query side — the approximate
    // paths (s2/s3/s4) exist precisely to avoid this shape at scale.
    // t9 cross-joins a broadcast ONE-ROW global-stats aggregate (n_docs,
    // avglen) onto every term row — a 1-row BNLJ is the standard way to
    // attach corpus constants and is shuffle-free at any scale
  }
}
