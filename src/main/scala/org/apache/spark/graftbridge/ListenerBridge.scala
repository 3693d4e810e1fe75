package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (`private[spark]` in Spark 4.x).
  *
  * The bench's per-query task-time accounting reads an accumulator that a
  * `SparkListener.onTaskEnd` writes; listener events are delivered on an
  * async bus, so the reader must drain the bus before sampling or the last
  * tasks of a query get charged to the next one. This is the one sanctioned
  * way to block on that drain.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () } // a timed-out drain degrades accounting, never the bench
}
