package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic drain of Spark's ASYNC listener bus — the race-free
  * replacement for `Thread.sleep` bracketing around
  * listener-accumulated metrics (shuffle-bytes / input-bytes
  * measurements in ScaleSmoke and the specs): after a job completes,
  * its task/stage events may still sit in the bus queues, so a metric
  * read without a drain can attribute late events to the wrong
  * measurement window or drop them entirely. `SparkContext.listenerBus`
  * is `private[spark]`, hence this one-line accessor living under the
  * `org.apache.spark` namespace — the standard pattern for reaching a
  * package-private test hook from user code; no Spark internals are
  * copied or re-implemented. */
object ListenerBusBarrier {

  /** Block until every queued listener event has been delivered (or
    * `timeoutMs` elapses — then throws `TimeoutException`, loudly:
    * a silent partial drain is exactly the race this exists to
    * kill). */
  def drain(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
