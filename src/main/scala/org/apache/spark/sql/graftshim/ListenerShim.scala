package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** `private[spark]` listener-bus access for the chaos/dynalloc probe
  * harness: the bus delivers events ASYNCHRONOUSLY, so a probe that
  * resets its counters between passes (or reads them at collect
  * return) needs a quiescence barrier — without it, a previous pass's
  * late-delivered task-failure events would be credited to the
  * current pass's "in-run" evidence and could attest a kill that
  * actually missed.
  */
object ListenerShim {

  /** Block until every queued listener event is delivered (capped —
    * a wedged queue must not hang the probe; the counters are then
    * merely conservative).
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
