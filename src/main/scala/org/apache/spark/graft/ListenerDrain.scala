package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus: task-end metric events
  * land asynchronously, so a bench snapshotting per-query byte deltas
  * right after a job returns can miss the tail of a large task set (the
  * events smear into the NEXT query's delta). A fixed post-run sleep is
  * a race with a constant; waiting on the bus drain is the actual
  * synchronization the measurement needs. This object lives in the
  * `org.apache.spark` namespace solely to reach the private[spark]
  * member — it holds no state and touches nothing else.
  */
object ListenerDrain {
  /** Block until every queued listener event is dispatched, or
    * `timeoutMs` elapses. Returns true when the bus fully drained. */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
