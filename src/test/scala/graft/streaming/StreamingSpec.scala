package graft.streaming

import graft.TestSpark
import graft.geom.CellIndex
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must equal the equivalent batch computation when the
  * stream is fully drained (memory sink + processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val eventsDir: String = {
    // stream source: a directory holding the sf0.001 events parquet
    val d = Files.createTempDirectory("events_stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def streamingEvents = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
  }

  test("windowed counts: streaming == batch on a drained stream") {
    val q = Streaming.windowedCounts(streamingEvents)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(unix_timestamp($"bucket_start").as("b"), $"event_type", $"n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = spark.read.parquet(eventsDir)
        .withColumn("b", floor(unix_timestamp($"ts") / 300L) * 300L)
        .groupBy("b", "event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming cell assignment matches CellIndex row-by-row") {
    val q = Streaming.cellAssign(streamingEvents, 10)
      .select("event_id", "x", "y", "cell_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cells_stream").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cells_stream").collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        assert(r.getLong(3) === CellIndex.cellOf(r.getDouble(1), r.getDouble(2), 10))
      }
    } finally q.stop()
  }

  test("dedupByKeyWithinWatermark: drops within the window, re-emits after eviction") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    // three-file replay over one checkpoint (the q_stream_dedup_wm shape,
    // minimized): k1@T0 emits; k1@T0+1m drops (state alive); a sentinel
    // pushes the watermark past k1's expiry; a flush batch evicts; then
    // k1@T0+120m RE-EMITS — the bounded-state contract plain
    // dropDuplicates can never exhibit
    val srcDir = Files.createTempDirectory("wm_dedup_src")
    val outDir = Files.createTempDirectory("wm_dedup_out").toString
    val ckpt = Files.createTempDirectory("wm_dedup_ckpt").toString
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType)))
    val t0 = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    def mins(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    def addFile(name: String, rows: Seq[(String, java.sql.Timestamp)]): Unit = {
      val tmp = Files.createTempDirectory(s"wm_dedup_tmp_$name")
      rows.toDF("k", "ts").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      Files.move(part, srcDir.resolve(s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val q = Streaming.dedupByKeyWithinWatermark(
          spark.readStream.schema(schema).parquet(srcDir.toString), "k", "ts", "10 minutes")
        .select($"k", unix_timestamp($"ts").as("t"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    addFile("a", Seq(("k1", mins(0)), ("k1", mins(1)), ("sent1", mins(60)))); runOnce()
    addFile("b", Seq(("sent2", mins(90)))); runOnce()
    addFile("c", Seq(("k1", mins(120)))); runOnce()
    val got = spark.read.parquet(outDir).where($"k" === "k1")
      .select("t").collect().map(_.getLong(0)).sorted.toSeq
    // exactly two emissions: the first occurrence and the post-eviction one
    assert(got === Seq(mins(0).getTime / 1000, mins(120).getTime / 1000))
  }

  test("stateful running per-user aggregate equals batch group-by") {
    val ev = streamingEvents
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Streaming.EventRow]
    val q = Streaming.runningUserAgg(ev)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("user_agg").start()
    try {
      q.processAllAvailable()
      // last update per user carries the complete running state
      val got = spark.table("user_agg")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.read.parquet(eventsDir)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally q.stop()
  }
}
