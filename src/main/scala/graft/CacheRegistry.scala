package graft

import org.apache.spark.sql.Dataset

/** Registry for per-query scratch caches — DataFrames that a query plan
  * caches because the plan reads them more than once (LSH band tables,
  * candidate pair sets, connected-components node sets), but that outlive
  * the query because the RESULT DataFrame is lazy: the cache must stay
  * alive until the caller has executed the plan, so the query body cannot
  * unpersist it.
  *
  * `track` tags such a cache; `clear()` (called from Bench/Verify teardown
  * via `TextQueries.clearCaches()`) unpersists every tracked cache. In a
  * long-lived service this is the end-of-unit-of-work hook that keeps the
  * block manager from accumulating dead scratch state.
  */
object CacheRegistry {

  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  def track[T <: Dataset[_]](df: T): T = synchronized { live += df; df }

  /** Unpersist every tracked cache (no-op for already-unpersisted ones). */
  def clear(): Unit = synchronized {
    live.foreach(_.unpersist())
    live.clear()
  }
}
