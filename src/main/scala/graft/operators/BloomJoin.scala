package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

/** Bloom-filter–accelerated semi/anti joins.
  *
  * The 100 TB problem these solve: a semi/anti join of a fact table
  * against a selective dimension subset shuffles the ENTIRE fact side,
  * even though almost none of it survives. Runtime row-level filtering
  * (Spark's own `spark.sql.optimizer.runtime.bloomFilter` does the same
  * trick inside Catalyst for equi-joins it can see through) drops
  * non-matching fact rows at the SCAN, before the exchange, so the
  * shuffle carries `match_rate + fpp` of the fact table instead of all
  * of it. We expose the pattern as an explicit operator because the
  * incremental-dedup shape (probe a new batch against an at-rest corpus
  * index — reference `data_source.py`'s seen-key session dedup, scaled)
  * is not an equi-join Catalyst can infer, and because an at-rest index
  * can persist its bloom bytes alongside the data and skip the build.
  *
  * Mechanics: keys of ANY type are normalized to `xxhash64` longs; the
  * build side aggregates them into an `org.apache.spark.util.sketch`
  * bloom (distributed partial aggregation under `stat.bloomFilter`),
  * and the probe side evaluates Spark's native codegen'd
  * [[BloomFilterMightContain]] against the broadcast-literal sketch —
  * no UDF, the prefilter stays inside whole-stage codegen. Bloom
  * answers are one-sided (no false negatives), so:
  *   - semiJoin: prefilter keeps all true matches; an exact leftsemi
  *     join removes the ~fpp false positives. Result == plain leftsemi.
  *   - antiJoin: rows the bloom rejects are DEFINITELY absent and skip
  *     the join entirely; only the `might-contain` sliver (true dups +
  *     fpp) pays an exact leftanti. Result == plain leftanti.
  */
object BloomJoin {

  /** Serialized bloom sketch over `xxhash64(key)` of `df`.
    *
    * `expectedItems < 0` derives the size from a count job on the
    * build side (the small side by construction — the count is cheaper
    * than one mis-sized sketch). ~1.2 bytes/item at fpp=0.03: a 100M-key
    * dimension costs ~120 MB, broadcastable; far beyond that, bump fpp —
    * the exact post-join keeps correctness regardless.
    */
  def buildBloomBytes(df: DataFrame, key: Column,
                      expectedItems: Long = -1L,
                      fpp: Double = 0.03): Array[Byte] = {
    val hashed = df.select(xxhash64(key).as("__h"))
    val n = if (expectedItems >= 0) expectedItems else hashed.count()
    val bf = hashed.stat.bloomFilter("__h", math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd `might_contain(sketch, xxhash64(key))` predicate. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      expression(lit(bloomBytes)), expression(xxhash64(key))))

  /** Exact leftsemi join, bloom-prefiltered on the big side. */
  def semiJoin(big: DataFrame, bigKey: Column,
               small: DataFrame, smallKey: Column,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBloomBytes(small, smallKey, expectedItems, fpp)
    big.filter(mightContain(bytes, bigKey))
      .join(small.select(smallKey.as("__k")).distinct(),
        bigKey === col("__k"), "leftsemi")
  }

  /** Exact leftanti join; bloom-definite-absent rows bypass the join.
    *
    * This is the incremental-dedup fast path: in steady state almost
    * every new-batch row is unseen, so almost nothing reaches the
    * exchange — the join input is the true-duplicate sliver plus fpp
    * of the batch.
    */
  def antiJoin(big: DataFrame, bigKey: Column,
               small: DataFrame, smallKey: Column,
               expectedItems: Long = -1L, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBloomBytes(small, smallKey, expectedItems, fpp)
    val definitelyNew = big.filter(!mightContain(bytes, bigKey))
    val sliver = big.filter(mightContain(bytes, bigKey))
      .join(small.select(smallKey.as("__k")).distinct(),
        bigKey === col("__k"), "leftanti")
    definitelyNew.unionAll(sliver)
  }
}
