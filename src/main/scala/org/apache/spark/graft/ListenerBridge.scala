package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; benchmark code needs to
  * drain it so per-query stage metrics snapshots don't race the async
  * listener dispatch. Same package-bridge idiom as
  * `org.apache.spark.sql.graft.ColumnBridge`.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
