package org.apache.spark

/** Test-scope bridge into the private[spark] listener bus (the
  * GraftPlanBridge convention): specs that count job-start events need
  * the bus DRAINED before resetting their counter, and a fixed sleep is
  * a race on a loaded box — a straggler JobStart from the build phase
  * can land inside the counted window (ADVICE r18 item 1).
  * `waitUntilEmpty` blocks until every queued event has been delivered,
  * making the zero-job windows deterministic.
  */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
