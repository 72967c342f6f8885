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

  test("every query has either an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
