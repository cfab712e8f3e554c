package graft

import org.apache.spark.sql.DataFrame

object SparkUtil {
  /** Ensure a scan has at least the session's default parallelism. Local
    * single-parquet-file inputs plan as 1-2 partitions, serializing every
    * downstream narrow pipeline; at cluster scale inputs arrive pre-split
    * and this is a no-op (never reduces partitioning).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Mid-query caches registered for explicit release. Operators that must
    * persist an intermediate frame (shared by both sides of a self-join, or
    * pinned against filter-pushdown re-execution) register it here instead
    * of leaking one storage entry per invocation; the harness (Verify /
    * Bench / a user pipeline) calls [[releaseScopedCaches]] once the query's
    * result is materialized. Every registered frame is a plain persist —
    * recomputable — so release is always safe, never a correctness event.
    */
  private val scopedCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseScopedCaches]]. */
  def scopedPersist(df: DataFrame): DataFrame = registerScoped(df.persist())

  /** Register an already-persisted frame for the next sweep. */
  def registerScoped(df: DataFrame): DataFrame = { scopedCaches.add(df); df }

  /** Unpersist every registered mid-query cache (non-blocking). */
  def releaseScopedCaches(): Unit = {
    var df = scopedCaches.poll()
    while (df != null) {
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
      df = scopedCaches.poll()
    }
  }
}
