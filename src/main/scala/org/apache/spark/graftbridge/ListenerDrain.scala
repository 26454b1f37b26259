package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus: block until every
  * queued listener event has been delivered. Task-end events post
  * asynchronously, so a metrics listener read immediately after an
  * action returns can miss the tail of the job's tasks; draining at
  * the measurement boundary makes per-query metric deltas exact. The
  * package-shim form is the standard public pattern for this (e.g.
  * holdenk/spark-testing-base's SparkContext bridges).
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
