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

  test("every query has an oracle") {
    // since round 2 even q_phash_groups carries one (group structure via
    // the closed-form render_id mapping; injectivity asserted in
    // PipelineOpsSpec)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle entries without a query")
  }
}
