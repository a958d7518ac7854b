package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (the event-time "most recent right row at or
  * before each left row" join; pandas `merge_asof`, kdb `aj`). The
  * reference has no such operator (SURVEY §2.3 as-of row) — this is a
  * beyond-parity addition for event/feature pipelines, where the naive
  * formulation (`l JOIN r ON key AND r.ts <= l.ts` + argmax) explodes
  * into a range join Spark executes as a per-key cartesian.
  *
  * Implementation: UNION the two sides tagged left/right, hash-shuffle
  * ONCE on the equi-keys, sort each partition by (ts, side-tag), and
  * take the running `last` non-null right payload — an O(n log n)
  * sort-merge profile with NO range-join explosion and no second
  * shuffle (the argmax-dedup of the naive form). At equal timestamps
  * the right row sorts BEFORE the left row, so matches are inclusive
  * (`r.ts <= l.ts`), matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Scale: cost and skew behavior are exactly a sort-merge join's — one
  * exchange of left+right rows keyed by the join keys, in-partition
  * sort, streaming window. A pathologically hot key (one user with a
  * billion events) serializes within its key, the same bound as any
  * keyed window; range-bucketing the time axis per hot key would be
  * the salting path if a corpus ever needs it.
  *
  * Ties within the right side (duplicate (key, ts)): the running last
  * picks the final row in sort order, which is whatever order the
  * duplicates arrived in — dedupe the right side first if that
  * distinction matters (the shipped q26 query keeps the max event id).
  */
object AsOfJoin {

  /** As-of join of `left` to `right` on equality over `on` plus the
    * time condition: `direction = "backward"` (default) matches the
    * most recent right row with `rightTs <= leftTs`; `"forward"`
    * matches the earliest right row with `rightTs >= leftTs` (both
    * inclusive, as in pandas `merge_asof`). Forward is the same
    * lowering with the side tags swapped (so equal-ts right rows land
    * INSIDE the following frame) and a running `first` over the
    * following frame instead of `last` over the preceding one.
    *
    * @param tolerance  optional max allowed gap (`leftTs - rightTs`
    *                   backward, `rightTs - leftTs` forward) as a
    *                   Spark interval/numeric Column matching the ts
    *                   type arithmetic (e.g. `expr("INTERVAL 1 HOUR")`
    *                   for timestamps); matches farther away are
    *                   treated as misses
    * @param joinType   "left" (unmatched left rows survive with null
    *                   right columns) or "inner"
    * @param rightSuffix appended to right payload columns whose names
    *                   collide with left columns (join keys are emitted
    *                   once, from the left)
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTs: String, rightTs: String,
           tolerance: Option[Column] = None,
           joinType: String = "left",
           rightSuffix: String = "_r",
           direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    require(Seq("left", "inner").contains(joinType),
      s"asof joinType must be left|inner, got $joinType")
    require(Seq("backward", "forward").contains(direction),
      s"asof direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val (sideL, sideR) = if (backward) (1, 0) else (0, 1)
    val rightPayload = right.columns.filterNot(on.contains).toSeq
    val outRight = rightPayload.map { c =>
      if (left.columns.contains(c)) c + rightSuffix else c
    }
    val l = left.select(
      on.map(col) ++ Seq(col(leftTs).as("__ts"), lit(sideL).as("__side"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val r = right.select(
      on.map(col) ++ Seq(col(rightTs).as("__ts"), lit(sideR).as("__side"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    // unionByName(allowMissing) nulls each side's absent payload struct
    val u = l.unionByName(r, allowMissingColumns = true)
    val wBase = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val matchedRaw =
      if (backward)
        last(col("__r"), ignoreNulls = true).over(
          wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__r"), ignoreNulls = true).over(
          wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withMatch = u.withColumn("__m", matchedRaw)
      .filter(col("__side") === sideL)
    // tolerance applies to the MATCHED right row's own ts
    val gap =
      if (backward) col("__ts") - col("__m").getField(rightTs)
      else col("__m").getField(rightTs) - col("__ts")
    val gated = tolerance match {
      case Some(tol) => when(col("__m").isNotNull && gap <= tol, col("__m"))
      case None => col("__m")
    }
    val projected = withMatch.withColumn("__m", gated)
    val base = if (joinType == "inner") projected.filter(col("__m").isNotNull)
               else projected
    base.select(
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        rightPayload.zip(outRight).map { case (c, o) =>
          col("__m").getField(c).as(o)
        }: _*)
  }
}
