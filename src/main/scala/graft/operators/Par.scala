package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Scan-parallelism guard for CPU-heavy derivation frontends (shingle
  * explodes, token hashing, signature aggregates).
  *
  * The hazard it closes: a SMALL corpus file arrives as ONE scan
  * partition (a 64-dim embedding table or a 10k-document demo corpus is
  * a single parquet split), and every derivation downstream — explode ×
  * n-gram assembly × 64-slot hash aggregates — runs in a single task
  * regardless of cluster size. Bytes-based split sizing cannot see that
  * the derivation multiplies work per input byte. Measured: dd02's four
  * concurrent shingle/signature map stages at 2.7 s EACH in one task.
  *
  * `spread` repartitions such a frame to the session's shuffle
  * parallelism — but ONLY when (a) the frame is a narrow chain
  * (project/filter) over leaves, so the probe and the shuffle are
  * cheap and safe, and (b) its current scan parallelism is below half
  * the target. An already-parallel scan (the 100 TB case: thousands of
  * splits) is a no-op — this must never add a corpus-wide shuffle to a
  * big input. Derived frames (joins/aggregates upstream) are left
  * alone: their partitioning comes from their own shuffles, and
  * probing them would execute subtrees early under AQE.
  */
private[graft] object Par {

  private def isNarrowOverLeaves(plan: LogicalPlan): Boolean = plan match {
    case _: Project | _: Filter | _: SubqueryAlias =>
      plan.children.forall(isNarrowOverLeaves)
    case _: LeafNode => true
    case _ => false
  }

  /** Repartition a narrow-over-scan frame up to the session's shuffle
    * parallelism; identity for anything already parallel or derived.
    * Row order is NOT preserved — callers feed order-insensitive
    * aggregates/joins.
    */
  def spread(df: DataFrame): DataFrame = {
    if (!isNarrowOverLeaves(df.queryExecution.optimizedPlan)) df
    else {
      val par = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt
      // safe: a narrow-over-leaves plan has no query stages, so the
      // partition probe plans splits on the driver without running jobs
      val cur = df.rdd.getNumPartitions
      if (cur * 2 <= par) df.repartition(par) else df
    }
  }

  /** [[spread]] plus a one-shot eager materialization WHEN THE SPREAD
    * FIRED — for frames consumed by several independent subtrees of
    * one query. A fired spread means the source arrived as one (or
    * few) splits; without the pin every consumer re-runs its own
    * scan + spread shuffle (Catalyst's exchange reuse does not fire
    * across the consumers — column pruning specializes each scan, so
    * the exchanges never canonicalize equal; dd02's round-20 plan
    * carried SEVEN scans of the same parquet). Identity when spread
    * no-ops, so the at-scale path (thousands of splits) never
    * materializes a corpus: the pin only ever holds a frame small
    * enough to have arrived under-split.
    */
  def spreadPinned(df: DataFrame): DataFrame = {
    val s = spread(df)
    if (s eq df) df else s.localCheckpoint(true)
  }
}
