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

  /** Incremental SCD2 upsert: fold a batch of NEW observations into an
    * existing interval table, producing exactly what [[intervals]]
    * over the concatenated history would produce — without touching
    * any row of an unaffected key (the O(delta) warehouse-merge shape:
    * at 100 TB the dimension is huge and the daily batch is not).
    *
    * Precondition (the append-only warehouse contract): every batch
    * observation's ts is at or after the affected key's current
    * interval start. Late-arriving history needs a rebuild of that
    * key, not a merge.
    *
    * Mechanics: build the batch's own mini-SCD2, then stitch per key —
    * if the batch's first run carries the SAME tracked values as the
    * key's current interval, the run absorbs into it (the current row
    * keeps its valid_from and inherits the batch run's close);
    * otherwise the current interval closes at the batch run's start.
    * Closed history and untouched keys pass through by anti/semi join.
    * Equivalence with the full rebuild is spec-asserted AND the
    * external oracle of the merge query IS the full-history rebuild.
    */
  def merge(existing: DataFrame, batch: DataFrame, keyCols: Seq[String],
            tsCol: String, trackedCols: Seq[String],
            tieCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col)
    val bInt = intervals(batch, keyCols, tsCol, trackedCols, tieCols)
    val bKeys = batch.select(keys: _*).distinct()
    val untouched = existing.join(bKeys, keyCols, "left_anti")
    val affected = existing.join(bKeys, keyCols, "left_semi")
    val affClosed = affected.filter(!col("is_current"))
    val affCur = affected.filter(col("is_current"))
    val w = Window.partitionBy(keys: _*).orderBy(col("valid_from"))
    val bMarked = bInt.withColumn("__rn", row_number().over(w))
    val bRest = bMarked.filter(col("__rn") > 1).drop("__rn")
    val bFirst = trackedCols.foldLeft(bMarked.filter(col("__rn") === 1).drop("__rn"))(
        (df, c) => df.withColumnRenamed(c, s"__b_$c"))
      .withColumnRenamed("valid_from", "__b_vf")
      .withColumnRenamed("valid_to", "__b_vt")
      .drop("is_current")
    val same = trackedCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    // every affected key has exactly one current row and one batch
    // first run, so this join is 1:1 on the key
    val mergedCur = affCur.join(bFirst, keyCols)
      .select(keys ++ trackedCols.map(col) ++ Seq(
        col("valid_from"),
        when(same, col("__b_vt")).otherwise(col("__b_vf")).as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)
    // the batch's first run survives as its own interval unless absorbed
    val curMarked = affCur.select(
      (keys :+ lit(true).as("__has")) ++
        trackedCols.map(c => col(c).as(s"__e_$c")): _*)
    val firstKept = bFirst.join(curMarked, keyCols, "left")
      .filter(col("__has").isNull ||
        !trackedCols.map(c => col(s"__e_$c") <=> col(s"__b_$c")).reduce(_ && _))
      .select(keys ++ trackedCols.map(c => col(s"__b_$c").as(c)) ++ Seq(
        col("__b_vf").as("valid_from"), col("__b_vt").as("valid_to"),
        col("__b_vt").isNull.as("is_current")): _*)
    val shape = (keyCols ++ trackedCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)
    Seq(untouched, affClosed, mergedCur, firstKept, bRest)
      .map(_.select(shape: _*)).reduce(_ unionByName _)
  }
}
