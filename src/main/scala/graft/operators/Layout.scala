package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curve).
  *
  * The 100 TB problem: parquet min/max pruning only skips files whose
  * value RANGES exclude the predicate. A table range-partitioned on one
  * column prunes perfectly on that column and not at all on any other.
  * Interleaving the bits of k columns into one sort key gives every
  * file a small bounding BOX in k-space, so selective predicates on ANY
  * of the k columns (or combinations) skip most files — the standard
  * layout trick of the lakehouse engines, expressed here with nothing
  * but codegen'd bit arithmetic + `repartitionByRange`.
  *
  * `zValue` is exact integer bit-interleaving (bit j of column i lands
  * at position j·k+i), so an external SQL engine reproduces it
  * verbatim — the operator itself is oracle-checkable, and the layout
  * effect (per-partition bounding boxes shrink vs. an unclustered
  * layout) is spec-asserted. Inputs must already be quantized to
  * `bits`-bit non-negative integers (rank/percent-tile or modular
  * quantization — the caller chooses the binning that matches its
  * predicate granularity).
  */
object Layout {

  /** Morton code of `cols` (each a non-negative integer < 2^bits).
    * k·bits must fit a long (≤ 63). Pure codegen'd bit arithmetic —
    * no UDF, stays inside whole-stage codegen.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"zValue needs >= 2 columns, got $k")
    require(k * bits <= 63, s"$k cols x $bits bits exceeds a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Re-layout `df` into `numPartitions` z-ordered partitions: rows
    * close in k-space land in the same partition, so each written file
    * carries tight min/max bounds on EVERY clustering column. One
    * range shuffle; the within-partition sort is the usual
    * write-side ordering (no global sort).
    */
  def zorder(df: DataFrame, cols: Seq[Column], bits: Int,
             numPartitions: Int): DataFrame = {
    val z = zValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
