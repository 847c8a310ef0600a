package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only shim into `private[spark]` listener-bus internals: stage
  * counts asserted by plan-shape specs must drain the ASYNC listener bus
  * deterministically — a sleep both undercounts (bus still draining) and
  * cross-contaminates consecutive measurements (late events from the
  * previous run land in the next window). */
object TestBusShims {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
