package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset

/** CacheManager lookups are `private[sql]`; this shim re-exports the one
  * probe the engine needs: "is this frame still registered as cached?".
  * Long-lived shared frames (memoized fitted indexes) use it to re-register
  * their cache after an external `spark.catalog.clearCache()` sweep —
  * without it, a swept frame silently degrades to recompute-per-reference
  * (twice per self-join) instead of once-then-reuse.
  */
object CacheBridge {
  def isCached(df: Dataset[_]): Boolean = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.sparkSession.sharedState.cacheManager.lookupCachedData(d).isDefined
    case _ => false
  }

  /** Re-register `df` in the cache iff it is not currently registered. */
  def ensureCached(df: Dataset[_]): Unit =
    if (!isCached(df)) df.cache()
}
