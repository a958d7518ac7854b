package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series regularization: fill the missing buckets of a
  * pre-aggregated series (one row per (key, bucket)) over each key's
  * own [min, max] span, then zero-fill counts and forward-fill values.
  *
  * The naive calendar — `explode(sequence(min, max))` per key — holds
  * a key's ENTIRE span in one array row before the explode: a 10-year
  * key at minute grain is a 5M-element array, a per-row memory spike
  * that scales with span, not data. This operator generates the
  * calendar in TWO bounded levels in bucket-index space: coarse chunks
  * of `chunk` buckets (span/chunk elements per row), then the buckets
  * inside each chunk (≤ `chunk` elements per row) — no row ever
  * materializes more than max(chunk, span/chunk) elements, so `chunk`
  * near sqrt(max span) bounds both. Values are identical to the
  * single-sequence form.
  *
  * Everything else is the scale-safe shape: spans from one
  * map-side-combinable min/max aggregate, the join on (key, bucket),
  * and the forward fill one window PER KEY — never global.
  */
object TimeSeries {

  /** One row per (key, bucket) covering each key's span at `step`.
    * `spans` must carry the key columns plus `d0`/`d1` (longs, `d0 <=
    * d1`, multiples of `step` — the bucketed aggregate guarantees it).
    */
  def calendar(spans: DataFrame, keyCols: Seq[String], bucketCol: String,
               step: Long, chunk: Int = 1024): DataFrame = {
    require(step > 0 && chunk > 0, s"step/chunk must be positive")
    val keys = keyCols.map(col)
    spans
      .withColumn("__i0", (col("d0") / step).cast("long"))
      .withColumn("__i1", (col("d1") / step).cast("long"))
      .withColumn("__c",
        explode(sequence(floor(col("__i0") / chunk).cast("long"),
          floor(col("__i1") / chunk).cast("long"))))
      .withColumn("__i",
        explode(sequence(greatest(col("__c") * chunk, col("__i0")),
          least(col("__c") * chunk + (chunk - 1), col("__i1")))))
      .select(keys :+ (col("__i") * step).as(bucketCol): _*)
  }

  /** Regularize `df` (one row per (key, bucket), bucket = long epoch
    * multiple of `step`): missing buckets appear with `zeroFill`
    * columns as 0 and `forwardFill` columns carrying the last non-null
    * earlier value within the key.
    */
  def gapFill(df: DataFrame, keyCols: Seq[String], bucketCol: String,
              step: Long, zeroFill: Seq[String] = Nil,
              forwardFill: Seq[String] = Nil, chunk: Int = 1024): DataFrame = {
    val keys = keyCols.map(col)
    val spans = df.groupBy(keys: _*)
      .agg(min(col(bucketCol)).as("d0"), max(col(bucketCol)).as("d1"))
    val cal = calendar(spans, keyCols, bucketCol, step, chunk)
    val joined = cal.join(df, keyCols :+ bucketCol, "left")
    val zeroed = zeroFill.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    val w = Window.partitionBy(keys: _*).orderBy(col(bucketCol))
    forwardFill.foldLeft(zeroed)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
