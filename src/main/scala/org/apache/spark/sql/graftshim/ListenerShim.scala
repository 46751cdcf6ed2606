package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Drains the async listener bus — measurement tools that count jobs or
  * stages through a SparkListener must settle the bus before reading
  * (or zeroing) their counters, and `SparkContext.listenerBus` is
  * `private[spark]`.
  */
object ListenerShim {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
