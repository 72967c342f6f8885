package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Round-7 throwaway profiler: per-stage seconds of the dedup_clusters
  * bench workload (pairs -> CC -> assignment), NOT part of the bench
  * contract. `sbt "runMain graft.operators.ProfDedup [passes]"`.
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt, "graft-prof")
    for (p <- 1 to passes) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      var t0 = System.nanoTime()
      val pairs = Dedup.minhashLshPairs(docs, 16, 4, 1, 2, expandWithin = false)
      val tPairs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val cc = Components.connectedComponents(pairs.select("doc_a", "doc_b"))
      val tCc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val out = docs.select(col("doc_id").as("id"))
        .join(cc, Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      val res = Caching.materializeAndRelease(out)
      val tAssign = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      res.write.format("noop").mode("overwrite").save()
      val tNoop = (System.nanoTime() - t0) / 1e9
      println(f"[prof] pass=$p pairs=$tPairs%.2f cc=$tCc%.2f assign=$tAssign%.2f noop=$tNoop%.2f " +
        f"(pairRows=${pairs.count()}, ccRows=${cc.count()})")
      Caching.release(res); Caching.release(cc); Caching.release(pairs)
    }
    spark.stop()
  }
}
