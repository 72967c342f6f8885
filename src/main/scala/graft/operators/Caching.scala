package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Cache discipline shared by the graft operators: an operator that
  * persists intermediates must not leak them past its own return
  * (measured failure mode: a kNN round's stale cached blocks evicted the
  * next workload's execution memory and turned a 14 s join into 195 s).
  *
  * Pattern: persist the (output-sized, small) RESULT, force it with one
  * count, then drop every intermediate cache. The caller owns the
  * returned frame's storage and releases it with [[release]] when done —
  * specs assert nothing else stays behind.
  */
object Caching {

  /** Materialize `result`, then release `intermediates`. */
  def materializeAndRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Release a frame returned by a graft operator, whether its storage is
    * a registered cache (`persist`) or localCheckpoint blocks — the
    * latter are NOT registered with the CacheManager, so a bare
    * `Dataset.unpersist()` cannot reach them; the blocks hide behind the
    * plan's LogicalRDD leaf.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
