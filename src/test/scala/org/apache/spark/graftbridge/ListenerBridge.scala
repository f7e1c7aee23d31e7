package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` SparkContext internals:
  * draining the listener bus so a spec can read task metrics
  * deterministically after an action. Lives under org.apache.spark.*
  * solely for access; contains no Spark-derived logic.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
