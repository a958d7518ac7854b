package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.CollectMetricsExec

/** Reads the observed-metrics row (`Dataset.observe`) straight off a
  * materialized plan — the hook Spark only exposes through listeners.
  * Lets an iterative loop fold its convergence probe into the SAME job
  * that materializes the round's state (one scheduled job per round
  * instead of two): run any full action on `df`, then read the row.
  */
object MetricsBridge {
  /** The metrics row of observation `name`, after `df` has executed. */
  def observed(df: DataFrame, name: String): Option[Row] =
    CollectMetricsExec.collect(df.queryExecution.executedPlan).get(name)
}
