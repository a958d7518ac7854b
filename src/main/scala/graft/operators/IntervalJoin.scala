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
                  keys: Seq[String] = Nil, cell: Long = 86400L,
                  chunk: Int = 1024): DataFrame = {
    require(cell > 0, s"cell width must be positive, got $cell")
    require(chunk > 0, s"chunk must be positive, got $chunk")
    // two-level explode (coarse chunks of `chunk` cells, then the
    // cells inside each chunk): a mis-sized `cell` against a very long
    // interval produces many ROWS — inherent replication — but never a
    // single huge array (the per-row bound is max(chunk, span/chunk)).
    // The first covered cell is a scalar column, not element_at over a
    // retained array, so nothing array-valued survives to the join.
    def expand(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__i0", floor(col(s) / cell).cast("long"))
        .withColumn("__i1", floor(col(e) / cell).cast("long"))
        .withColumn("__c",
          explode(sequence(floor(col("__i0") / chunk).cast("long"),
            floor(col("__i1") / chunk).cast("long"))))
        .withColumn("__cell",
          explode(sequence(greatest(col("__c") * chunk, col("__i0")),
            least(col("__c") * chunk + (chunk - 1), col("__i1")))))
        .drop("__c", "__i1")
    val lc = expand(left, lStart, lEnd).withColumnRenamed("__i0", "__lfirst")
    val rc = expand(right, rStart, rEnd).withColumnRenamed("__i0", "__rfirst")
    lc.join(rc, keys :+ "__cell")
      // exact overlap, then count the pair only in the first shared
      // cell: max(firstCell_l, firstCell_r) — both replicas of a
      // surviving pair agree on it, so the predicate is a pure filter
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__cell") === greatest(col("__lfirst"), col("__rfirst")))
      .drop("__cell", "__lfirst", "__rfirst")
  }
}
