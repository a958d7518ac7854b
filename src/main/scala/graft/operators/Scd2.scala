package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 interval construction (Kimball's
  * SCD2): collapse a keyed change stream into validity intervals of
  * the tracked attributes — one row per (key, attribute-run) with
  * `valid_from`/`valid_to` and an `is_current` flag on the open
  * interval. The reference's ETL tier has per-row triggers but no
  * history operator (SURVEY §2.1); this is the batch form a warehouse
  * build needs.
  *
  * Semantics: events are ordered per key by (`tsCol`, `tieCols`...);
  * consecutive events whose tracked attributes are ALL equal compress
  * into one interval (null-safe equality, so null→null is "no
  * change"); `valid_to` is the next change's timestamp (half-open
  * intervals, null on the current row).
  *
  * Scale shape: two keyed window passes (change flag via `lag`, then
  * `lead` for the closing timestamp) plus one filter — every window is
  * partitioned by the dimension key, so there is exactly one hash
  * shuffle on the key and NO global window; a hot key serializes only
  * its own history, the same bound as any keyed sort. The tie columns
  * make the ordering total, which is what lets an external SQL engine
  * replay the build bit-for-bit.
  */
object Scd2 {

  def intervals(events: DataFrame, keyCols: Seq[String], tsCol: String,
                trackedCols: Seq[String],
                tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(trackedCols.nonEmpty, "scd2 needs at least one tracked column")
    val ord = (col(tsCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    // a row opens a new interval iff any tracked attribute differs
    // from the previous event (null-safe; the first event always opens)
    val changed = trackedCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val opens = events
      .withColumn("__first", lag(col(tsCol), 1).over(w).isNull)
      .withColumn("__open", col("__first") || changed)
      .filter(col("__open"))
    // among interval-opening rows, the NEXT opener's ts closes this one
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    opens
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
      .select((keyCols.map(col) ++ trackedCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
