package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; metrics collection needs to
  * drain it before reading counters (listener events post asynchronously).
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
