package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TPC-H-ish parquet tables (see TESTDATA.md).
  *
  * Each accessor is a plain `spark.read.parquet` — lazy, columnar, and
  * partition-prunable; Catalyst pushes filters/projections into the scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Schema inference reads the parquet footer on the driver (~100 ms per
  // table); the resulting DataFrame is an immutable lazy plan, safe to
  // share across engines — even mutating ones, which only ever swap
  // catalog entries, never touch source frames. Memoizing saves ~1.5 s
  // per fresh engine construction.
  private def t(name: String): DataFrame =
    Tables.cache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet has shipped with two physical `ts` types across
    * testdata generations: TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so we read nanos as long (legacy conf) and
    * integer-divide to micros, the same truncation DuckDB applies —
    * and plain TIMESTAMP(MICROS), which needs no conversion. Dispatch
    * on the footer schema so both read identically; `div` (integer
    * division) avoids double-precision loss on epoch-nano magnitudes.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ forbids the numeric casts the window queries use; with the
        // session pinned to UTC this cast is value-preserving.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, String), DataFrame]()
}
