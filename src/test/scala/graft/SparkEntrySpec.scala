package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Driver-contract consistency: the correctness gate silently weakens if an
  * oracle entry has no query twin (or a query name drifts), so the mapping
  * is asserted here. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a query; names never drift") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("every query is under the hash gate: the rows-only set is EMPTY") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // t4 (the last holdout) fell to HUGEINT arithmetic in round 4
    assert(rowsOnly.isEmpty,
      s"unexpected rows-only set: $rowsOnly — add an oracle or document why not")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(SparkSuite.spark).count() > 0)
  }

  test("oracle SQL contains no unescapable control characters") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(!v.exists(c => c < ' ' && c != '\n' && c != '\t'), s"$k has raw control chars")
    }
  }
}
