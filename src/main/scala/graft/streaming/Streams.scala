package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming parity layer (SURVEY.md §2.9) — the reference's
  * fastopendata.streaming mini-engine re-expressed on Structured
  * Streaming, where most of its hand-built machinery is a built-in:
  *
  *  - WatermarkTracker (core.py:162-204)      → withWatermark
  *  - StreamBuffer ring buffer (core.py:83)   → micro-batch engine internals
  *  - DeduplicationStore (core.py:205-230)    → dropDuplicatesWithinWatermark
  *  - Tumbling/sliding windows (windows.py:63-136) → window()
  *  - Session windows + merge (windows.py:137-177) → session_window()
  *  - WindowManager.fire on watermark (windows.py:178-251) → Append mode
  *  - StreamTableJoin (joins.py:19-160)       → stream-static join
  *  - IncrementalView (views.py:21-185)       → foreachBatch upsert into an
  *    in-memory/Delta table + queryable snapshot
  *
  * All helpers take/return DataFrames so batch DataFrames drive the same
  * code in tests (memory sink + processAllAvailable).
  */
object Streams {

  /** Event-time watermark (allowed lateness), default mirroring the
    * reference's 5 s (core.py:178).
    */
  def withLateness(df: DataFrame, tsCol: String,
                   lateness: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, lateness)

  /** Exactly-once by record id within the watermark horizon. */
  def dedup(df: DataFrame, idCol: String, tsCol: String,
            lateness: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Tumbling-window aggregation. */
  def tumbling(df: DataFrame, tsCol: String, size: String,
               keys: Seq[Column], aggs: Seq[Column],
               lateness: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(Seq(window(col(tsCol), size)) ++ keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding-window aggregation. */
  def sliding(df: DataFrame, tsCol: String, size: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column],
              lateness: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(Seq(window(col(tsCol), size, slide)) ++ keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session-window aggregation with gap timeout (merging built in). */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[Column], aggs: Seq[Column],
              lateness: String = "5 seconds"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(Seq(session_window(col(tsCol), gap)) ++ keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Stream-static enrichment join (the reference's StreamTableJoin /
    * TableSnapshot: the static side is re-read per micro-batch, so a
    * swapped-in snapshot is picked up automatically).
    */
  def enrich(stream: DataFrame, table: DataFrame, keys: Seq[String],
             joinType: String = "left_outer"): DataFrame =
    stream.join(table, keys, joinType)

  /** Incremental materialized view: each micro-batch is upserted by key
    * into a versioned parquet store, queryable via `snapshot`. The
    * changelog semantics of the reference's IncrementalView
    * (views.py:21-185) map to Update output mode + per-batch keyed merge.
    *
    * State lives entirely in executor-written parquet — never on the
    * driver heap — so the view is bounded by storage, not driver memory.
    * The merge is anti-join(existing, batch-keys) ∪ batch: one shuffle on
    * the key per batch. Versioned directories make the swap atomic for
    * readers (a snapshot always reads a fully-committed version); the
    * superseded version is pruned after commit. On a cluster with Delta
    * available, `absorb` is the seam to replace with MERGE INTO, which
    * prunes to matching files instead of rewriting the store.
    */
  final class IncrementalView(keyCols: Seq[String],
                              storeDir: String =
                                java.nio.file.Files.createTempDirectory("graft_iv")
                                  .toFile.getAbsolutePath) {
    @volatile private var version = -1
    private def path(v: Int) = s"$storeDir/v$v"

    def absorb(batch: DataFrame): Unit = synchronized {
      val spark = batch.sparkSession
      val merged =
        if (version < 0) batch
        else spark.read.parquet(path(version))
          .join(batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
          .unionByName(batch)
      merged.write.mode("overwrite").parquet(path(version + 1))
      version += 1
      if (version > 0) { // prune the superseded version
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path(version - 1)), true)
      }
    }

    /** Attach as a foreachBatch sink on an Update-mode aggregation. */
    def sink(ds: DataFrame): DataStreamWriter[Row] =
      ds.writeStream.outputMode(OutputMode.Update())
        .foreachBatch((batch: DataFrame, _: Long) => absorb(batch))

    def snapshot(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      require(version >= 0, "IncrementalView: no batch absorbed yet")
      spark.read.parquet(path(version))
    }
  }

  /** Convenience: run a streaming DataFrame to completion against the
    * currently-available input (memory sink) and return the result —
    * the test harness pattern for batch-driving streaming plans.
    */
  def runToMemory(ds: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = ds.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    ds.sparkSession.table(name)
  }
}
