package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache discipline shared by the dedup/similarity operators: an operator
  * that persists intermediates must not leak them past its own return
  * (measured failure mode: a kNN round's stale cached blocks evicted the
  * next workload's execution memory and turned a 14 s join into 195 s).
  *
  * Pattern: persist the (output-sized, small) RESULT, force it with one
  * count, then drop every intermediate cache. The caller owns the returned
  * frame's cache and may `unpersist()` it when done — PipelineOpsSpec
  * asserts nothing else stays behind.
  */
private[operators] object Caching {

  /** Materialize `result`, then release `intermediates`. */
  def materializeAndRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
