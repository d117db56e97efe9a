package org.apache.spark.graftshims

import org.apache.spark.SparkContext

/** private[spark] access point: drain the listener bus so metric
  * snapshots are complete before reading (used by ProgressCounters
  * consumers).
  */
object ListenerShim {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
