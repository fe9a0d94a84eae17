package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` bridge (the ColumnOps pattern): lets the scale
  * harness drain the listener bus so per-query shuffle-byte accounting
  * reads the query just finished, not a tail of the previous one.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
