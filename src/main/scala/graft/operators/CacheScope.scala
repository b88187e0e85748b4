package graft.operators

import org.apache.spark.sql.DataFrame

/** Owns the MEMORY_AND_DISK intermediates a dedup/packing plan pins
  * (signature caches, prefix sums): the returned DataFrames stay lazy, so
  * the operator cannot unpersist them itself — the consumer decides when the
  * last action has run. Pass `new CacheScope` and call [[release]] after the
  * final action to free the blocks deterministically; the default
  * [[CacheScope.unmanaged]] leaves release to Spark's ContextCleaner, which
  * frees them only once the plans are garbage-collected — fine for
  * one-query jobs, a slow leak in a long-lived session running many dedup
  * plans.
  */
final class CacheScope private (tracking: Boolean) {
  def this() = this(true)
  private val owned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private[graft] def own(df: DataFrame): DataFrame = {
    if (tracking) synchronized { owned += df }
    df
  }

  /** Unpersist every intermediate acquired under this scope (non-blocking).
    * Plans returned by the operator remain valid but recompute from source
    * if acted on again.
    */
  def release(): Unit = synchronized {
    owned.foreach(_.unpersist(blocking = false))
    owned.clear()
  }
}

object CacheScope {
  /** No-op scope: intermediates are freed by the ContextCleaner when their
    * plans become unreachable (the historical default behavior).
    */
  val unmanaged: CacheScope = new CacheScope(false)
}
