package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Bridge to Spark's listener-bus drain: `SparkContext.listenerBus` is
  * `private[spark]`, and flushing an audit at the end of a pipeline run
  * must not race the asynchronous listener delivery of the run's last
  * action. Same access pattern as ColumnBridge — a narrowly-scoped
  * sql-subpackage shim instead of reflection.
  */
object ListenerBridge {

  /** Block until every queued listener event is delivered (or the
    * timeout passes). Returns false on timeout — callers flush whatever
    * arrived rather than failing the pipeline over telemetry.
    */
  def waitUntilEmpty(spark: SparkSession, timeoutMillis: Long): Boolean =
    try { spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
