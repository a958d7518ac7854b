package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation gate
  * a curation pipeline runs before anything downstream trains on the
  * data (the Deequ/dbt-test shape, expressed as plain aggregates).
  * Every rule returns ONE row `(rule, n_violations, pass)`; `report`
  * unions them into the audit table. Rules are independent aggregates
  * over the same scans — each is map-side-combinable, nothing
  * collects, and a violating ROW SAMPLE (for debugging) is just the
  * rule's predicate as a filter, left to the caller.
  */
object Quality {

  private def row(name: String, violations: Column): Column =
    struct(lit(name).as("rule"), violations.as("n_violations"))

  /** Rows where any of `cols` is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(when(cols.map(col(_).isNull).reduce(_ || _), 1))
        .as("n_violations"))
      .select(lit("not_null:" + cols.mkString(",")).as("rule"),
        col("n_violations"))

  /** Surplus rows beyond the first per key tuple (0 ⇔ key unique). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n") - 1).as("n_violations"))
      .select(lit("unique:" + cols.mkString(",")).as("rule"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))

  /** Child rows whose key has no parent (referential integrity);
    * null child keys are not violations (SQL FK semantics). */
  def foreignKey(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"fk:$childKey").as("rule"), col("n_violations"))

  /** Rows outside [lo, hi] (nulls are not violations — pair with
    * [[notNull]] when they should be). */
  def inRange(df: DataFrame, colName: String, lo: Double, hi: Double): DataFrame =
    df.agg(count(when(col(colName) < lo || col(colName) > hi, 1))
        .as("n_violations"))
      .select(lit(s"range:$colName").as("rule"), col("n_violations"))

  /** Rows failing an arbitrary predicate (nulls count as failing —
    * 3VL unknown is not a pass). */
  def satisfies(df: DataFrame, name: String, predicate: Column): DataFrame =
    df.agg(count(when(!coalesce(predicate, lit(false)), 1))
        .as("n_violations"))
      .select(lit(s"satisfies:$name").as("rule"), col("n_violations"))

  /** Union the rule rows into the audit table with a pass flag. */
  def report(rules: DataFrame*): DataFrame =
    rules.reduce(_ unionByName _)
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0).cast("int").as("pass"))
}
