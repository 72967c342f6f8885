package graft.streaming

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md E17 — not present in the
  * reference; provided so the engine covers streaming ingest of the same
  * operators): watermarked tumbling-window aggregation, streaming
  * cell-assignment (the geometry expressions evaluate per-row, so they
  * work unchanged in streams), and stateful per-user running aggregates
  * via mapGroupsWithState.
  */
object Streaming {

  /** Tumbling 5-minute event counts with a 10-minute watermark — the
    * streaming form of the batch q_events_window query.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ -> event time
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming spatial enrichment: assign each event a quadkey cell from
    * deterministic coordinates — geometry expressions are row-local, so
    * the streaming plan is identical to the batch plan.
    */
  def cellAssign(events: DataFrame, level: Int): DataFrame =
    events
      .withColumn("x", (col("event_id") % 3600) / 10.0 - 180.0)
      .withColumn("y", (col("user_id") % 1800) / 10.0 - 90.0)
      .withColumn("cell_id", cell_of(col("x"), col("y"), lit(level)))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class UserState(n: Long, total: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Streaming exact deduplication: keep the first-seen row per key via
    * the engine's stateful dropDuplicates (state = one entry per distinct
    * key; at web scale callers bound it with
    * `dropDuplicatesWithinWatermark`). WHICH physical row survives a key
    * is micro-batch-order-dependent, so deterministic consumers must
    * project key-derived columns only — q_stream_dedup projects
    * (fingerprint, length) of the text key.
    */
  def dedupByKey(stream: DataFrame, key: String): DataFrame =
    stream.dropDuplicates(key)

  /** BOUNDED-STATE streaming dedup — the 100 TB form of [[dedupByKey]]:
    * `dropDuplicatesWithinWatermark` keeps one state entry per key only
    * until the event-time watermark passes the entry's event time plus
    * `delay`, so state size is bounded by the key arrival rate within one
    * watermark window instead of growing with every distinct key forever.
    * The semantic trade is explicit: a duplicate arriving more than
    * `delay` after the retained occurrence is re-emitted (its state was
    * evicted) — the dedup guarantee is exact WITHIN the watermark window,
    * which is the contract a web-scale ingest pipeline actually wants
    * (exact-once per boilerplate burst, not per corpus lifetime).
    */
  def dedupByKeyWithinWatermark(stream: DataFrame, key: String,
                                tsCol: String, delay: String): DataFrame =
    stream
      .withColumn(tsCol, col(tsCol).cast("timestamp")) // parquet NTZ -> event time
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(key)

  /** Stateful running per-user aggregate (mapGroupsWithState): the custom-
    * state shape kNN/tiling pipelines would use for incremental ingest.
    */
  def runningUserAgg(events: Dataset[EventRow]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { r => n += 1; total += r.value }
          state.update(UserState(n, total))
          UserAgg(uid, n, total)
      }
  }
}
