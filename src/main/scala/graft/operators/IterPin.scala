package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Checkpoint discipline for iterative operators (pageRank/LPA/k-core/
  * sssp/BFS/components/path closure): every loop pins its per-round
  * state with an EAGER checkpoint so the plan stays linear, and frees
  * the SUPERSEDED round's blocks once the successor is materialized —
  * without the free, every round's full state stays pinned in the
  * block manager until GC-triggered cleanup gets around to it, and on
  * a shared heap (local mode; dense cluster executors) that retention
  * was the measured memory-pressure term of the sf10 scaling study
  * (round 12: gr02's residual 1.17 exponent isolated to one-JVM heap).
  *
  * `pin` is `localCheckpoint` by default (executor-local blocks, no
  * I/O beyond the memory/disk tier). Set `graft.iter.checkpointDir`
  * to a reliable location (HDFS/object store) to route the same call
  * sites through RELIABLE `checkpoint` instead — on a large cluster
  * localCheckpoint blocks die with their executor and a lost executor
  * kills the whole iteration (no lineage to recompute from); reliable
  * checkpoints trade per-round write I/O for fault tolerance, the
  * right side of the trade once rounds are minutes long.
  *
  * `free` is safe by construction: it only acts when the frame IS a
  * checkpoint result (its plan root is the materialized-RDD leaf) and
  * that RDD is still persisted — a derived/plain frame no-ops, so
  * callers never have to track which of first-round inputs were
  * checkpoints. Callers must free a frame only after its successor is
  * materialized AND the frame's last consumer (convergence probe,
  * delta check) has run: a freed localCheckpoint cannot be recomputed.
  */
private[graft] object IterPin {

  /** Eagerly materialize an iteration frame (see class doc). */
  def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("graft.iter.checkpointDir") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  private val probeId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** [[pin]] plus the round's convergence probe IN THE SAME JOB: the
    * aggregate columns ride as a `Dataset.observe` node on the frame
    * being checkpointed, so the materialization action itself fills
    * them and the loop reads the row off the executed plan
    * ([[org.apache.spark.sql.graftshim.MetricsBridge]]) — one
    * scheduled job per round where pin-then-agg paid two. At the
    * bench's state sizes the probe job was pure scheduler floor; at
    * cluster scale it was a full extra pass over the round's state.
    *
    * Exactness: observed metrics are accumulator-backed. Spark applies
    * accumulator updates once per successful task per stage execution,
    * which is exact everywhere the bench runs (local mode — no
    * speculation, no stage retries). On clusters, a stage RETRY after
    * executor loss can double-apply a lost task's update; a loop whose
    * convergence rule would be corrupted by an inflated probe can set
    * `graft.iter.observeProbe=false` to route through the old
    * pin-then-aggregate two-job probe (bit-identical results either
    * way — the probe only decides WHEN to stop, and every caller's
    * update rule is idempotent past its fixpoint).
    */
  def pinProbed(df: DataFrame, metrics: Seq[org.apache.spark.sql.Column])
  : (DataFrame, org.apache.spark.sql.Row) = {
    val observe = df.sparkSession.conf
      .get("graft.iter.observeProbe", "true").toBoolean
    if (observe) {
      val name = s"__iterpin_probe_${probeId.incrementAndGet()}"
      val obs = df.observe(name, metrics.head, metrics.tail: _*)
      val pinned = pin(obs)
      val row = org.apache.spark.sql.graftshim.MetricsBridge
        .observed(obs, name)
        .getOrElse(throw new IllegalStateException(
          s"observed metrics '$name' missing after materialization"))
      (pinned, row)
    } else {
      val pinned = pin(df)
      (pinned, pinned.agg(metrics.head, metrics.tail: _*).head())
    }
  }

  /** Drop the storage behind a SUPERSEDED pinned frame — block-manager
    * blocks for localCheckpoint pins, the checkpoint DIRECTORY for
    * reliable pins (nothing else ever reclaims those files: without
    * this a long-running session leaves one directory per pinned round
    * on the checkpoint filesystem until SparkContext shutdown — the
    * block-retention problem one level down, on exactly the
    * deployments `graft.iter.checkpointDir` targets). No-op unless the
    * frame is exactly a checkpoint leaf. The caller contract is the
    * same either way: free only after the successor is materialized
    * and the frame's last consumer ran, because neither a freed
    * localCheckpoint nor a deleted checkpoint directory can be re-read.
    * Non-blocking on the block route; the file delete is a single
    * recursive FS call on the round's own directory.
    */
  def free(df: DataFrame): Unit =
    if (df.sparkSession.conf.get("graft.iter.free", "true").toBoolean)
      df.queryExecution.logical match {
        case lr: LogicalRDD =>
          if (lr.rdd.getStorageLevel != StorageLevel.NONE)
            lr.rdd.unpersist(blocking = false)
          // reliable checkpoints report storage level NONE and live as
          // files under checkpointDir/<uuid>/rdd-<id>; getCheckpointFile
          // is Some only for the reliable kind, so the local route never
          // enters here
          lr.rdd.getCheckpointFile.foreach { dir =>
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(
                df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          }
        case _ => ()
      }
}
