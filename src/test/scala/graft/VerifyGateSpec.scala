package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Runs EVERY registered gate query against sf0.001 — the in-repo twin of
  * the driver's Verify pass. Round 7 proved why this must exist: the e7
  * drive broke (a staged-dir path assumption) and, with no spec executing
  * it, the query silently vanished from CORRECTNESS instead of failing a
  * test. Any query that throws — or returns an empty result without being
  * allowlisted — fails here FIRST, in `sbt test`, before a driver round can
  * ship it broken. */
class VerifyGateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  /** Queries that legitimately return zero rows at sf0.001 (tiny-SF data
    * shape, not breakage). Keep this list minimal and justified. */
  private val emptyOk = Set(
    "q04_antijoin" // customers-without-orders: none exist at sf0.001
  )

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"gate query $name executes and returns rows") {
      val n = fn(spark, dir).count()
      if (emptyOk(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
