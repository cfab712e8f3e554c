package graft

import org.apache.spark.sql.DataFrame

object SparkUtil {
  /** Ensure a scan has at least the session's default parallelism. Local
    * single-parquet-file inputs plan as 1-2 partitions, serializing every
    * downstream narrow pipeline; at cluster scale inputs arrive pre-split
    * and this is a no-op (never reduces partitioning).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    // streaming frames: .rdd is illegal and parallelism is the source's
    // business (micro-batch planning re-splits per trigger) — pass through
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Normalize the events table's `ts` column to a session-zone TIMESTAMP.
    * Driver testdata generations have shipped it as TIMESTAMP(NANOS) parquet
    * (Spark 4 only reads that as long NANOS under the `nanosAsLong` legacy
    * flag — convert with integer division; a double roundtrip would lose
    * precision at 1.7e18) and as TIMESTAMP(MICROS) (arrives as
    * TIMESTAMP_NTZ). With the session zone pinned UTC both paths yield
    * bit-identical instants.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }

  /** Mid-query caches registered for explicit release. Operators that must
    * persist an intermediate frame (shared by both sides of a self-join, or
    * pinned against filter-pushdown re-execution) register it here instead
    * of leaking one storage entry per invocation. Release paths:
    *
    *  - [[withScopedCaches]] — the PUBLIC bracket: caches registered while
    *    the body runs are released when it returns, automatically and
    *    nesting-safe. A user pipeline composing operators directly wraps
    *    each materialization (`withScopedCaches { op(...).count() }`) and
    *    never touches the registry.
    *  - [[releaseScopedCaches]] — the harness sweep (Verify per query,
    *    Bench between reps) for code not running inside a bracket.
    *
    * Every registered frame is a plain persist — recomputable — so release
    * is always safe, never a correctness event (a bracket that closes
    * before the caller materializes its DataFrame only costs recompute).
    */
  private val scopedCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Active [[withScopedCaches]] frames for the current thread (operators
    * build their plans — and register their caches — on the calling
    * thread, so thread-local scoping matches operator composition).
    */
  private val frames = new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[DataFrame]]] {
    override def initialValue() = new java.util.ArrayDeque[java.util.ArrayList[DataFrame]]()
  }

  /** Persist `df` and register it for release — to the innermost enclosing
    * [[withScopedCaches]] bracket if one is active on this thread, else to
    * the global queue drained by [[releaseScopedCaches]].
    */
  def scopedPersist(df: DataFrame): DataFrame = registerScoped(df.persist())

  /** Register an already-persisted frame (same scoping as [[scopedPersist]]). */
  def registerScoped(df: DataFrame): DataFrame = {
    val stack = frames.get()
    if (!stack.isEmpty) stack.peek().add(df) else scopedCaches.add(df)
    df
  }

  /** Run `body` and release every scoped cache it registered, automatically
    * — the cache-hygiene bracket for pipelines composing operators outside
    * the Verify/Bench harness. Nesting-safe: an inner bracket releases only
    * its own registrations. Wrap the MATERIALIZATION (the action), not just
    * the plan construction, or the caches are released before they pay off.
    */
  def withScopedCaches[T](body: => T): T = {
    val stack = frames.get()
    val frame = new java.util.ArrayList[DataFrame]()
    stack.push(frame)
    try body
    finally {
      stack.pop()
      frame.forEach { df =>
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
      }
    }
  }

  /** Run independent Spark ACTIONS concurrently and wait for all of them
    * (optimization-guide §2.6 "overlap independent jobs": actions are only
    * sequential because driver code calls them sequentially; submitting
    * independent jobs from separate threads lets the next job's tasks
    * back-fill executors freed by the current job's tail). Used by the
    * maintenance protocols for side-writes that are mutually independent
    * AND all-or-nothing at the caller (the crash contract is replay-whole,
    * so partial completion under a failure is the already-covered crashed
    * shape). Threads are created by the CALLING thread, so Spark's
    * inheritable thread-locals (job group/description) propagate.
    *
    * Failure contract: the FIRST failure rethrows AS-IS after every action
    * has finished — protocol error types (FenceViolation, IOException)
    * must cross unchanged so callers' race/outage classification keeps
    * working. Remaining actions are not cancelled (Spark actions are not
    * interruptible mid-commit; letting them finish keeps the on-disk
    * state one of the shapes the replay contract already covers).
    */
  /** Whether [[inParallel]] actually overlaps (A/B knob for the bench-gate
    * harness; `GRAFT_INPARALLEL=off` forces sequential execution in
    * declaration order without rebuilding the jar).
    */
  private def parallelSaves: Boolean =
    !sys.env.get("GRAFT_INPARALLEL").contains("off")

  /** Env-gated protocol phase timer (`GRAFT_PROTO_TIMING=1`): prints one
    * `PSTEP tag seconds` line per wrapped phase so the maintenance
    * protocols' wall-clock can be attributed without a profiler. Zero
    * overhead when the env var is unset (the default — one cached boolean
    * test per call).
    */
  private val protoTiming = sys.env.contains("GRAFT_PROTO_TIMING")
  def ptime[T](tag: String)(body: => T): T =
    if (!protoTiming) body
    else {
      val t0 = System.nanoTime(); val r = body
      println(f"PSTEP $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

  def inParallel(actions: (() => Unit)*): Unit = {
    val real = actions.filter(_ ne null)
    if (real.isEmpty) return
    if (real.size == 1 || !parallelSaves) { real.foreach(_.apply()); return }
    val firstFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = real.map { a =>
      val t = new Thread(() =>
        try a()
        catch {
          case e: Throwable =>
            // keep the FIRST failure as the thrown one; later failures
            // ride along as suppressed so a multi-component save that
            // fails twice loses no diagnostics
            if (!firstFailure.compareAndSet(null, e)) {
              val f = firstFailure.get()
              if (f ne e) f.synchronized { f.addSuppressed(e) }
            }
        })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val e = firstFailure.get()
    if (e != null) throw e
  }

  /** Number of globally-registered caches awaiting a sweep (test surface). */
  private[graft] def scopedCacheCount: Int = scopedCaches.size

  /** Unpersist every globally-registered mid-query cache (non-blocking). */
  def releaseScopedCaches(): Unit = {
    var df = scopedCaches.poll()
    while (df != null) {
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
      df = scopedCaches.poll()
    }
  }
}
