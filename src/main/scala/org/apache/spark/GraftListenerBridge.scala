package org.apache.spark

/** Bridge into the private[spark] listener bus drain — the supported
  * test seam (Spark's own suites call it) for making asynchronous
  * listener deliveries visible before asserting on them. Used by the
  * scale lint's intermediate-plan capture: QueryExecutionListener
  * callbacks arrive on the shared bus thread, so the lint must drain
  * the bus before walking what a query's driver actions executed.
  * Same narrow-accessor pattern as [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftListenerBridge {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
