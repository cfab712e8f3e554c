package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty` are
  * `private[spark]`; this shim re-exports the one call shuffle-byte
  * instrumentation needs: block until every queued listener event has been
  * delivered. Without the drain, a [[graft.ShuffleMeter]] read races the
  * async bus and under-counts the final stages of the query it just timed.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
