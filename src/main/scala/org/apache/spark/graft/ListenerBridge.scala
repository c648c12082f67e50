package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the rehearsal
  * harness needs to drain it so per-stage metric snapshots are not
  * racing async listener delivery. Same pattern as
  * `org.apache.spark.sql.graft.ColumnBridge`. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
