package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver smoke contract: entry() must return rows. */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows and sane labels") {
    val df = SparkEntry.entry(TestSpark.spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("points_inside") > 0))
  }

  /** Queries whose outputs derive from pixel content — not expressible in
    * SQL, so the driver records a rows-only check for them (contract
    * allows this); everything else must carry an oracle.
    */
  private val pixelDerived = Set("q_phash_groups")

  test("every query has an oracle unless pixel-derived") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- pixelDerived
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle entries without a query")
  }
}
