package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Externally-replayable cardinality sketching.
  *
  * Spark's own `approx_count_distinct` is a black box to any other
  * engine — fine in production, unverifiable by this repo's DuckDB
  * oracle gate. This HyperLogLog (Flajolet et al. 2007) is built from
  * md5 arithmetic that BOTH engines compute bit-identically, so the
  * approximate answer itself sits under the exact-match oracle, and
  * the estimate ships next to the exact count as an audited error row
  * (the dd02/ann09 recall-ledger pattern applied to counting).
  *
  * Determinism mechanics: register index = first 2 md5 hex chars
  * (m = 256); rank input = next 15 hex chars as a 60-bit integer; ρ =
  * leading-zero count + 1 via string length of the binary expansion
  * (61 − length(bin(v)), the v = 0 edge pinned to 61). The harmonic
  * denominator Σ 2^−M is summed EXACTLY as 2^(61−M) scaled integers in
  * DECIMAL(38,0) — summing the doubles directly would be
  * order-dependent at the 52-bit mantissa and break the cross-engine
  * hash — with absent registers contributing 2^61 each. Only the final
  * α·m²·2^61 / S division runs in floating point: one deterministic
  * expression, identical IEEE ops in both engines.
  *
  * Scale shape: one hash aggregate to (group, bucket) registers —
  * map-side combinable max, duplicate-insensitive, so the sketch of a
  * 100 TB key column shuffles at most m rows per group and never
  * carries a distinct set. Raw HLL estimate (no small/large-range
  * corrections): the documented ±1.04/√m ≈ 6.5% regime at m = 256,
  * and the q40 audit row MEASURES the realized error against exact.
  */
object Sketches {

  private val M = 256           // registers (b = 8 index bits)
  private val Scale = 1L << 61  // 2^61: the exact-integer scaling of 2^-M

  /** Count-min sketch frequency estimates (Cormode–Muthukrishnan
    * 2005), replayable for the same reason as [[hllDistinct]]: the d
    * salted hash rows are md5 arithmetic, the counters are exact
    * integer counts, and the estimate is an integer min — no floating
    * point anywhere, so the approximate answer hash-matches an
    * external replay exactly. The CMS guarantee (estimate ≥ true
    * count, overshoot ≤ εN w.h.p. at w = e/ε) becomes an AUDITABLE
    * column when joined with exact counts, as q41 does.
    *
    * Scale shape: the counter table is d·w rows regardless of input
    * size (one map-side-combinable count), and probing joins the
    * DISTINCT keys against it on (row, column) — the sketch of a
    * 100 TB column is a broadcast-sized table. Returns one (key, est)
    * row per distinct NON-NULL input value (null keys are filtered,
    * per SQL aggregate convention — see the note in the body).
    */
  def cmsEstimates(df: DataFrame, valueCol: String,
                   d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    def cells(c: Column) = (0 until d).map { r =>
      struct(lit(r).as("r"),
        (conv(substring(md5(concat(lit(s"$r:"),
          c.cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % w).as("c"))
    }
    // null keys are EXCLUDED (explicitly, here) — md5(null) would
    // otherwise yield null cells that silently vanish from both the
    // counters and the probe join; SQL-aggregate convention (count()
    // etc. skip nulls), and it keeps "one (key, est) row per distinct
    // NON-NULL value" exact
    val in = df.filter(col(valueCol).isNotNull)
    // aggregate to per-key counts FIRST, then hash: cell(key) is a pure
    // function of the key, so counter(r,c) = Σ_{key→(r,c)} count(key) —
    // identical counters with d·|distinct keys| md5 evaluations instead
    // of d·|rows| (the corpus row count never meets the hash), and ONE
    // corpus scan feeding both the counters and the probe side (the old
    // shape scanned it twice). The exploded keyCnt frame is the shared
    // subtree of both consumers.
    val keyCnt = in.groupBy(col(valueCol).as("key"))
      .agg(count(lit(1)).as("__n"))
    val ex = keyCnt
      .select(col("key"), col("__n"), explode(array(cells(col("key")): _*)).as("rc"))
      .select(col("key"), col("__n"), col("rc.r").as("r"), col("rc.c").as("c"))
    val counters = ex.groupBy(col("r"), col("c")).agg(sum(col("__n")).as("cnt"))
    ex.select(col("key"), col("r"), col("c"))
      .join(counters, Seq("r", "c"))
      .groupBy(col("key")).agg(min(col("cnt")).as("est"))
  }

  /** The (group, register, max-ρ) table — the sketch's mergeable,
    * persistable state: registers of two corpora (or an at-rest
    * register table and a new batch's) merge by one more max-groupBy,
    * and `hllFromRegisters` of the merge EQUALS the estimate over the
    * concatenated data (spec-asserted) — the incremental-counting
    * shape: never re-scan history to keep a distinct count current.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   valueCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val h = md5(col(valueCol).cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("long").as("__b")
    val v = conv(substring(h, 3, 15), 16, 10).cast("long")
    val rho = when(v === 0, lit(61)).otherwise(lit(61) - length(bin(v)))
    df.select(keys :+ bucket :+ rho.as("__rho"): _*)
      .groupBy(keys :+ col("__b"): _*).agg(max(col("__rho")).as("__m"))
  }

  /** Merge register tables (same group/register schema): max per
    * (group, register). */
  def hllMergeRegisters(regs: DataFrame*): DataFrame = {
    val all = regs.reduce(_ unionByName _)
    val keys = all.columns.filterNot(Seq("__m").contains).map(col)
    all.groupBy(keys.toSeq: _*).agg(max(col("__m")).as("__m"))
  }

  /** Estimate from a register table produced by [[hllRegisters]],
    * with Flajolet's small-range correction: when the raw estimate is
    * ≤ 2.5m and empty registers remain, linear counting
    * (m·ln(m/V), V = empty registers) replaces it — raw HLL
    * overestimates tiny cardinalities by orders of magnitude. The
    * branch condition and both branches are identical expressions in
    * the external replay; ln is the one libm call in the pipeline,
    * and the 2dp(+1e-11) rounding absorbs cross-engine ulps.
    */
  def hllFromRegisters(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val vZero = lit(M) - col("__present")
    val raw =
      lit(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0) * lit(Scale.toDouble) /
        (col("__s0") + vZero * lit(java.math.BigDecimal.valueOf(Scale)))
          .cast("double")
    val est = when(raw <= lit(2.5 * 256.0) && vZero > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / vZero.cast("double")))
      .otherwise(raw)
    regs.groupBy(keys: _*)
      .agg(
        sum(expr("cast(shiftleft(1L, cast(61 - __m as int)) as decimal(38,0))"))
          .as("__s0"),
        count(lit(1)).as("__present"))
      .select(keys :+ round(est + lit(1e-11), 2).as("n_hll"): _*)
  }

  /** (groupCols..., n_hll) — raw HLL estimate, rounded 2dp. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String],
                  valueCol: String): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCols, valueCol), groupCols)
}
