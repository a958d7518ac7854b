package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — pairs of rows whose [start, end] ranges
  * intersect, optionally co-keyed, without a cross join.
  *
  * The naive plan for `l.s <= r.e AND r.s <= l.e` is a
  * BroadcastNestedLoopJoin (or worse, a cartesian): O(|L|·|R|)
  * comparisons regardless of how few pairs overlap. The standard
  * scalable lowering (same family as [[BandJoin]]'s eps-grid and the
  * DBMS literature's grid-partitioned interval joins): tile the value
  * axis into cells of width `cell`, explode every interval to the
  * cells it covers, equi-join on (key, cell), then keep each pair once
  * (attributed to the FIRST cell both intervals cover — a stateless
  * tie-break, no dropDuplicates shuffle) and verify exact overlap with
  * a codegen'd filter.
  *
  * Work is Σ interval-length/cell per row — choose `cell` near the
  * median interval length so most intervals hit 1–2 cells. The only
  * shuffle is the (key, cell) equi-join; a hot cell means genuinely
  * many concurrent intervals, i.e. output the operator must emit.
  * Long intervals degrade gracefully (more replicas, never wrong);
  * at 100 TB the cell width is the one knob, and AQE handles residual
  * skew.
  *
  * Both sides must expose numeric (castable-to-long) start/end with
  * start <= end; `keys` empty means a pure interval join (every
  * overlapping pair across the tables).
  */
object IntervalJoin {

  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  keys: Seq[String] = Nil, cell: Long = 86400L): DataFrame = {
    require(cell > 0, s"cell width must be positive, got $cell")
    def cells(s: Column, e: Column): Column =
      sequence(floor(s / cell).cast("long"), floor(e / cell).cast("long"))
    val lc = left.withColumn("__lcells", cells(col(lStart), col(lEnd)))
      .withColumn("__cell", explode(col("__lcells")))
    val rc = right.withColumn("__rcells", cells(col(rStart), col(rEnd)))
      .withColumn("__cell", explode(col("__rcells")))
    lc.join(rc, keys :+ "__cell")
      // exact overlap, then count the pair only in the first shared
      // cell: max(firstCell_l, firstCell_r) — both replicas of a
      // surviving pair agree on it, so the predicate is a pure filter
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__cell") === greatest(element_at(col("__lcells"), 1),
          element_at(col("__rcells"), 1)))
      .drop("__cell", "__lcells", "__rcells")
  }
}
