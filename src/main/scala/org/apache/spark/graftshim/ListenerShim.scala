package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Listener-bus drain for deterministic metric reads.
  *
  * Spark delivers SparkListener events asynchronously; a benchmark that
  * reads listener-accumulated metrics right after an action races the
  * bus and undercounts. `waitUntilEmpty` is the standard settle point —
  * Spark's own test harness uses it — but it is `private[spark]`, so
  * this shim sits inside the spark package namespace to re-export
  * exactly that one call (the same pattern as the sql-side Bridge shim
  * for Column↔Expression).
  */
object ListenerShim {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
