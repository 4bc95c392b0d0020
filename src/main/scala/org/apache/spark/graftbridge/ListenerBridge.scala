package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench's per-query
  * shuffle/spill attribution needs to drain the async event bus between
  * queries so task metrics land in the right query's bucket. Same
  * package-tree shim pattern as `sql.graftbridge.ColumnBridge`.
  */
object ListenerBridge {
  /** Block until all queued listener events have been delivered (or the
    * timeout lapses — attribution noise, not failure, if it ever does).
    */
  def flushListeners(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () }
}
