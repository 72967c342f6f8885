package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("splitter is a bijection mod 1e6: a full residue range keeps EXACTLY ppm rows") {
    val df = spark.range(1000000).withColumn("s", lit("x")).toDF("doc_id", "s")
    val kept = Sampling.stratifiedSample(df, "doc_id", "s", Map("x" -> 250000L))
    assert(kept.count() === 250000L)
    // and the ids above 1e6 reuse the same residues: 2e6 rows -> 2x
    val df2 = spark.range(2000000).withColumn("s", lit("x")).toDF("doc_id", "s")
    assert(Sampling.stratifiedSample(df2, "doc_id", "s", Map("x" -> 250000L)).count() === 500000L)
  }

  test("rate-based sampling is a pure filter: no exchange in the executed plan") {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 250000L), defaultPpm = 50000L)
    kept.count()
    val exchanges = kept.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty)
  }

  test("per-stratum rates and default are respected deterministically") {
    val rates = Map("en" -> 900000L, "de" -> 0L)
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 100000L)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 100000L)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    val langs = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 100000L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!langs.contains("de")) // rate 0 keeps nothing
    // en at 90% keeps most of the en rows
    val enTotal = docs.where($"lang" === "en").count()
    assert(langs("en") > enTotal / 2)
  }

  test("quota sampling: exactly n per stratum, cut matches the brute-force order") {
    val n = 5
    val got = Sampling.stratifiedQuota(docs, "doc_id", "lang", n)
      .select("lang", "doc_id", "rank").as[(String, Long, Int)].collect()
    val counts = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts.values.forall(_ == n))
    // brute force: same splitter, same tie-break
    val brute = docs.select($"lang", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)
        .sortBy(id => ((id % 1000000L) * 2654435761L % 1000000L, id)).take(n).toSet)
      .toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).toSet === brute(lang), s"stratum $lang")
    }
  }
}
