package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Harness robustness: round 3's driver bench died to ONE transient task
  * failure and shipped no evidence (`parsed: null`). These tests pin the
  * two fixes — task retries in local mode, and per-workload isolation
  * with an unconditional JSON evidence line.
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("local[N] master is rewritten to local[N,4] for task retries") {
    assert(GraftSession.withTaskRetries("local[32]") == "local[32,4]")
    assert(GraftSession.withTaskRetries("local[8]") == "local[8,4]")
    // already-explicit retry counts and cluster masters pass through
    assert(GraftSession.withTaskRetries("local[8,2]") == "local[8,2]")
    assert(GraftSession.withTaskRetries("spark://host:7077") == "spark://host:7077")
  }

  test("a failing workload records an error; the rest still measure; JSON still renders") {
    val workloads: Seq[(String, Long, () => DataFrame)] = Seq(
      ("good_before", 1L, () => spark.range(10).toDF),
      // build-time failure (operator constructor throws)
      ("bad_build", 1L, () => throw new RuntimeException("injected \"quoted\"\nmultiline")),
      // exec-time failure (tasks abort during the noop write — the round-3
      // crash shape, surfacing through all local[N,4] retries)
      ("bad_exec", 1L, () => spark.range(2).select(expr("raise_error('task boom')"))),
      ("good_after", 1L, () => spark.range(10).toDF))
    val (times, errors) = BenchWorkloads.runSeq(spark, workloads)
    assert(times.keySet == Set("good_before", "good_after"))
    assert(errors.keySet == Set("bad_build", "bad_exec"))
    // no stranded storage after the failures (the tripwire released it)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    val line = Bench.renderJson(times, errors, "/some/sf")
    assert(!line.contains("\n"), "evidence must stay one line")
    assert(line.contains("\"bad_build\":-1") && line.contains("\"bad_exec\":-1"),
      s"failed workloads must appear as -1: $line")
    assert(line.contains("\"errors\":{"), s"errors object missing: $line")
    // the injected quote/newline must not break the JSON string
    assert(line.contains("\\\"quoted\\\""), s"quote escaping broken: $line")
    assert(line.contains("\"good_before\":"), s"surviving measurements missing: $line")
  }

  test("renderJson without errors matches the classic shape") {
    val line = Bench.renderJson(Map("a" -> 1.5, "b" -> 0.25), Map.empty, "/sf")
    assert(line == """{"metric":"total","value":1.750,"unit":"sec","queries":{"a":1.500,"b":0.250},"sf":"/sf"}""")
  }

  test("renderJson carries per-pass raw times (interference evidence)") {
    // the round-4 driver artifact's one failure mode: a 37.5 s minhash
    // sample that re-measured at 5-7 s, with nothing in the line showing
    // the spread. The `passes` object makes tight-vs-spread visible.
    val line = Bench.renderJson(
      Map("a" -> 1.5, "b" -> 0.25), Map.empty, "/sf",
      perPass = Map("a" -> Seq(37.5, 1.5, 1.6), "b" -> Seq(0.25, 0.3, 0.3)))
    assert(!line.contains("\n"), "evidence must stay one line")
    assert(line.contains(""""passes":{"a":[37.500,1.500,1.600],"b":[0.250,0.300,0.300]}"""),
      s"per-pass raw times missing: $line")
    // the headline min is still the reported per-query value
    assert(line.contains(""""queries":{"a":1.500,"b":0.250}"""), line)
  }
}
