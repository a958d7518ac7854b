package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-performance analytics over [[QueryAudit]] history — the Spark
  * counterpart of the reference's analytics surface
  * (/root/reference/packages/fastopendata/src/fastopendata/analytics/
  * collector.py ring-buffer metrics, engine.py `AnalyticsEngine` /
  * `PerformanceSummary`, regression.py `RegressionDetector` /
  * `RegressionAlert`). The reference iterates python lists on one
  * process; here every computation is a DataFrame aggregation over the
  * audit frame (`QueryAudit.toDF` for the live ring buffer, or
  * `spark.read.parquet` over a `flushTo` sink), so the SAME analytics
  * run over a session's 10k-row buffer or a cluster's multi-year
  * at-rest audit log — per-fingerprint history is a groupBy partition,
  * never a driver loop.
  *
  * Severity and windowing semantics mirror the reference exactly
  * (regression.py:119-247): per-fingerprint history capped at
  * baseline+recent most-recent successes, baseline = the earliest
  * `baselineWindow` of the retained window, recent = the latest
  * `recentWindow`, alert when recent/baseline mean ratio ≥ threshold
  * (warning) or ≥ critical.
  */
object QueryAnalytics {

  /** Structural fingerprint column: the canonical plan hash when the
    * audit row has one (two runs of the same logical query share it —
    * strictly stronger than text fingerprinting), else the reference's
    * text fingerprint (regression.py:30-50): literals → `?`, whitespace
    * collapsed, uppercased, hashed.
    */
  def fingerprintCol(label: Column, planHash: Column): Column = {
    val normalized = upper(trim(regexp_replace(regexp_replace(label,
      """('[^']*'|"[^"]*"|\b\d+(\.\d+)?\b)""", "?"), """\s+""", " ")))
    when(length(planHash) > 0, planHash)
      .otherwise(substring(md5(normalized.cast("binary")), 1, 16))
  }

  private def withFingerprint(audit: DataFrame): DataFrame =
    audit.withColumn("fingerprint",
      fingerprintCol(col("label"), col("planHash")))

  /** One-row latency/error summary (engine.py `PerformanceSummary`'s
    * numeric core): total queries, error rate, p50/p90/p95/p99/mean/
    * min/max over successful action durations, and the count above
    * `slowThresholdMs` (the engine's slow-query bottleneck signal).
    * EXACT percentiles (one sort-based aggregate) — audit frames are
    * metadata-sized next to the data they describe.
    */
  def summary(audit: DataFrame, slowThresholdMs: Double = 1000.0): DataFrame = {
    val ok = col("status") === "success"
    val d = when(ok, col("durationMs"))
    audit.agg(
      count(lit(1)).as("total_queries"),
      round(coalesce(avg(when(ok, 0.0).otherwise(1.0)), lit(0.0)) + lit(1e-11), 4)
        .as("error_rate"),
      round(coalesce(percentile(d, lit(0.5)), lit(0.0)) + lit(1e-11), 3).as("p50_ms"),
      round(coalesce(percentile(d, lit(0.9)), lit(0.0)) + lit(1e-11), 3).as("p90_ms"),
      round(coalesce(percentile(d, lit(0.95)), lit(0.0)) + lit(1e-11), 3).as("p95_ms"),
      round(coalesce(percentile(d, lit(0.99)), lit(0.0)) + lit(1e-11), 3).as("p99_ms"),
      round(coalesce(avg(d), lit(0.0)) + lit(1e-11), 3).as("mean_ms"),
      round(coalesce(min(d), lit(0.0)) + lit(1e-11), 3).as("min_ms"),
      round(coalesce(max(d), lit(0.0)) + lit(1e-11), 3).as("max_ms"),
      sum(when(ok && col("durationMs") > slowThresholdMs, 1L).otherwise(0L))
        .as("n_slow"))
  }

  /** Per-fingerprint baselines over successful runs: observation count,
    * median / p95 / mean latency, and a sample label — the "historical
    * norm" table `regressions` compares against, useful standalone as
    * the per-query SLO reference.
    */
  def baselines(audit: DataFrame): DataFrame =
    withFingerprint(audit.filter(col("status") === "success"))
      .groupBy(col("fingerprint"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("durationMs"), lit(0.5)) + lit(1e-11), 3).as("median_ms"),
        round(percentile(col("durationMs"), lit(0.95)) + lit(1e-11), 3).as("p95_ms"),
        round(avg(col("durationMs")) + lit(1e-11), 3).as("mean_ms"),
        max_by(col("label"), col("tsMillis")).as("sample_label"))

  /** Regression alerts (regression.py `RegressionDetector`): one row
    * per fingerprint whose recent-window mean exceeds its baseline-
    * window mean by ≥ `thresholdRatio`. Fingerprints with fewer than
    * baseline+recent successful observations are skipped (not enough
    * data), exactly as the reference. Scale shape: one ranking window
    * partitioned by fingerprint (partition size capped at the audit
    * history per query — the ring buffer caps the live case), then one
    * combinable aggregate.
    *
    * `sinceMillis` is the at-rest retention pre-filter: the deque
    * semantics only ever look at each fingerprint's newest
    * baseline+recent rows, so against a multi-year audit sink the
    * ranking window must not scan history older than the caller's
    * retention horizon. The filter applies to `tsMillis` AND — when
    * the frame carries the `audit_date` partition column
    * ([[QueryAudit.flushTo]] with `partitionByDay`) — to `audit_date`,
    * so on a day-partitioned sink the scan PRUNES whole partitions
    * instead of reading and discarding them (plan-asserted in
    * OpsSpec). Semantics caveat, stated rather than hidden: a
    * fingerprint whose window STRADDLES the horizon sees only its
    * in-horizon rows, exactly as if its older history had been
    * compacted away — which is the retention contract.
    */
  def regressions(audit: DataFrame,
                  baselineWindow: Int = 20, recentWindow: Int = 5,
                  thresholdRatio: Double = 2.0,
                  criticalRatio: Double = 5.0,
                  sinceMillis: Option[Long] = None): DataFrame = {
    require(baselineWindow >= 1 && recentWindow >= 1,
      "windows must be >= 1 observation")
    require(thresholdRatio > 0 && criticalRatio >= thresholdRatio,
      "need 0 < thresholdRatio <= criticalRatio")
    val keep = baselineWindow + recentWindow
    val recentAudit = sinceMillis.map { s =>
      val byTs = audit.filter(col("tsMillis") >= lit(s))
      if (audit.columns.contains("audit_date"))
        byTs.filter(col("audit_date") >= to_date(timestamp_millis(lit(s))))
      else byTs
    }.getOrElse(audit)
    val w = Window.partitionBy(col("fingerprint"))
      .orderBy(col("tsMillis").desc, col("durationMs").desc)
    val ranked = withFingerprint(recentAudit.filter(col("status") === "success"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= keep) // the reference's deque(maxlen=B+R)
    val stats = ranked.groupBy(col("fingerprint")).agg(
      count(lit(1)).as("__n"),
      avg(when(col("__rn") > recentWindow, col("durationMs"))).as("__base"),
      avg(when(col("__rn") <= recentWindow, col("durationMs"))).as("__recent"),
      max_by(col("label"), col("tsMillis")).as("sample_label"),
      max(col("tsMillis")).as("last_seen_ms"))
    stats
      .filter(col("__n") === keep && col("__base") > 0.0 &&
        col("__recent") / col("__base") >= thresholdRatio)
      .select(
        col("fingerprint"), col("sample_label"),
        round(col("__base") + lit(1e-11), 2).as("baseline_ms"),
        round(col("__recent") + lit(1e-11), 2).as("current_ms"),
        round(col("__recent") / col("__base") + lit(1e-11), 2).as("ratio"),
        when(col("__recent") / col("__base") >= criticalRatio, "critical")
          .otherwise("warning").as("severity"),
        col("last_seen_ms"))
  }

  /** Time-bucketed trend (engine.py `TrendPoint`): per `bucketSeconds`
    * window — query count, error count, mean and p95 latency of
    * successes. One combinable aggregate keyed on the bucket.
    */
  def trends(audit: DataFrame, bucketSeconds: Long = 60L): DataFrame = {
    val bucketMs = bucketSeconds * 1000L
    val d = when(col("status") === "success", col("durationMs"))
    audit
      .groupBy((floor(col("tsMillis") / bucketMs) * bucketMs)
        .as("bucket_start_ms"))
      .agg(
        count(lit(1)).as("query_count"),
        sum(when(col("status") === "success", 0L).otherwise(1L))
          .as("error_count"),
        round(coalesce(avg(d), lit(0.0)) + lit(1e-11), 3).as("avg_latency_ms"),
        round(coalesce(percentile(d, lit(0.95)), lit(0.0)) + lit(1e-11), 3)
          .as("p95_latency_ms"))
      .orderBy(col("bucket_start_ms"))
  }

  /** The N slowest successful audit rows (engine.py `_find_slowest`). */
  def slowest(audit: DataFrame, n: Int = 10): DataFrame =
    audit.filter(col("status") === "success")
      .orderBy(col("durationMs").desc, col("tsMillis").desc)
      .limit(n)
      .select(col("tsMillis"), col("label"), col("action"),
        col("durationMs"), col("rowsOut"))
}
