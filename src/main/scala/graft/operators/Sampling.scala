package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & corpus resolution for training-data
  * pipelines — the mixing/selection stage that sits between dedup and
  * the tokenizer at 100 TB.
  *
  * Sampling is HASH-derived, never `rand()`: md5 of the row key decides
  * membership, so the sample is (a) exactly reproducible across runs,
  * engines, task retries, and partitionings — a DuckDB oracle computes
  * the identical subset; (b) scan-local — a codegen'd filter with no
  * shuffle, no state, no seed plumbing; (c) consistent across tables —
  * the same key always lands the same way, so sampled fact/dim joins
  * stay aligned. Granularity is sixteenths (first hex digit of the
  * md5), which is where portable determinism is cheapest; compose two
  * digits for 1/256 granularity the same way.
  */
object Sampling {

  private def hexDigit(keyCol: Column): Column =
    // value 0..15 of the md5's first hex digit
    conv(substring(md5(keyCol.cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int")

  private def hex2(keyCol: Column): Column =
    // value 0..255 of the md5's first two hex digits — the finer
    // acceptance lattice per-row probabilities need
    conv(substring(md5(keyCol.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")

  /** DSIR importance RESAMPLING (Xie et al. 2023 — the selection step
    * the importance score exists for): keep each row with probability
    * exp((score - max)/temperature), self-normalized so the
    * best-scoring row is always kept and acceptance decays with the
    * score gap; lower temperature sharpens toward greedy top-score
    * selection. Membership is the same deterministic md5 rule as
    * [[hashSample]], quantized to 256ths (two hex digits), so the
    * sample is reproducible across engines, partitionings, and
    * retries. Scale: one broadcast scalar (the max score) and one
    * codegen'd filter — scan-shaped, no shuffle of the corpus. The
    * 1e-9 shift before floor keeps exact-integer acceptance fractions
    * from quantizing down on ulp drift (the temperatureSample rule).
    */
  def importanceResample(df: DataFrame, keyCol: String, scoreCol: String,
                         temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val mx = df.agg(max(col(scoreCol)).as("__smax"))
    df.crossJoin(broadcast(mx))
      .filter(hex2(col(keyCol)) <
        floor(exp((col(scoreCol) - col("__smax")) / lit(temperature)) * 256
          + lit(1e-9)))
      .drop("__smax")
  }

  /** Keep rows whose key hashes into the first `sixteenths`/16 of the
    * space. 0 keeps nothing, 16 everything.
    */
  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16,
      s"sixteenths must be in [0,16], got $sixteenths")
    if (sixteenths >= 16) df
    else df.filter(hexDigit(col(keyCol)) < lit(sixteenths))
  }

  /** Per-group sampling quotas (source/language mixing): groups absent
    * from `quotas` keep `default`/16. One scan, one codegen'd CASE —
    * the data-mixing primitive for "x% of web, y% of code, all of
    * books" recipes.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, groupCol: String,
                       quotas: Map[String, Int],
                       default: Int = 16): DataFrame = {
    (quotas.values ++ Seq(default)).foreach(q =>
      require(q >= 0 && q <= 16, s"quota must be in [0,16], got $q"))
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(default): Column) {
      case (acc, (g, q)) => when(col(groupCol) === lit(g), lit(q)).otherwise(acc)
    }
    df.filter(hexDigit(col(keyCol)) < quota)
  }

  /** Temperature-flattened corpus mixing (the multilingual rebalancing
    * step, XLM-R style): group l's share of the OUTPUT follows
    * q_l ∝ n_l^alpha, so alpha < 1 upweights low-resource groups.
    * The total is the largest T feasible without upsampling
    * (T = min_l n_l / q_l, so the most-upweighted group keeps all its
    * rows), each group's keep-fraction f_l = T·q_l / n_l is quantized
    * to md5 sixteenths, and membership is the same deterministic hash
    * rule as `hashSample` — reproducible across engines, partitionings,
    * and retries, with the group-rate table a broadcast join of
    * |groups| rows. The 1e-9 shift before floor keeps the exact-1.0
    * fraction of the argmin group (computed as (n/q)·q/n in doubles)
    * from quantizing to 15/16 on ulp drift.
    */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__q", pow(col("__n"), alpha))
    val norm = sizes.crossJoin(broadcast(sizes.agg(sum(col("__q")).as("__sq"))))
      .withColumn("__qn", col("__q") / col("__sq"))
    val rates = norm
      .crossJoin(broadcast(norm.agg(min(col("__n") / col("__qn")).as("__T"))))
      .withColumn("__f", least(lit(1.0), col("__T") * col("__qn") / col("__n")))
      .select(col(groupCol), floor(col("__f") * 16 + lit(1e-9))
        .cast("int").as("__s"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hexDigit(col(keyCol)) < col("__s"))
      .drop("__s")
  }

  /** Deterministic per-group token-budget filling: within each group,
    * rows are ordered by their md5 hash (a reproducible shuffle — no
    * rand(), no seed) and kept while the running token sum stays within
    * the group's budget, so "N tokens of source X, M of source Y" is
    * exact, stable across runs, and monotone in the budget.
    *
    * TWO-PHASE prefix sum, not one window per group: a training corpus
    * is usually one dominant group ("en" is most of the web), and a
    * single `Window.partitionBy(group)` would sort that entire group in
    * ONE task. Instead rows bucket by the first two md5 hex digits
    * (bucket order IS md5-prefix order, so global order = (bucket,
    * md5, key)): the heavy cumsum windows run per (group, bucket) —
    * 256-way parallel within a group — while the bucket-total prefix
    * runs on the aggregated ≤256-rows-per-group table and broadcasts
    * back. Row's global running sum = earlier-buckets total + local
    * cumsum; results are bit-identical to the single-window form.
    */
  def budgetSample(df: DataFrame, keyCol: String, groupCol: String,
                   weightCol: String,
                   budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(Long.MaxValue): Column) {
      case (acc, (g, b)) => when(col(groupCol) === lit(g), lit(b)).otherwise(acc)
    }
    val order = md5(col(keyCol).cast("string").cast("binary"))
    val bucketed = df.withColumn("__bkt",
      conv(substring(order, 1, 2), 16, 10).cast("int"))
    val wLocal = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(order, col(keyCol))
    val totals = bucketed.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(weightCol)).as("__bt"))
    val wPre = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals
      .withColumn("__pre", coalesce(sum(col("__bt")).over(wPre), lit(0L)))
      .select(col(groupCol), col("__bkt"), col("__pre"))
    bucketed
      .withColumn("__lcum", sum(col(weightCol)).over(wLocal))
      .join(broadcast(prefix), Seq(groupCol, "__bkt"))
      .filter(col("__pre") + col("__lcum") <= budget)
      .select(df.columns.map(col): _*) // the USING join fronts its keys
  }

  /** Global top-k rows per group (highest `orderCol`, ties to the
    * lowest `tieCol`), with a 1-based `rank` column appended — the
    * "best k documents per domain/language by quality" selection every
    * curation pipeline runs.
    *
    * TWO-PHASE ranking, not one window per group: the corpus is
    * usually one dominant group, and `row_number().over(partitionBy(
    * group))` would sort it in a single task. Rows first salt into 256
    * deterministic buckets (md5 of the tie key), rank per (group,
    * salt) and keep k — any global top-k row is necessarily top-k
    * within its bucket — then the survivors (≤ 256·k per group) rank
    * once more per group for the exact global answer. Both phases are
    * windows, but the per-group one only ever sees the bounded
    * phase-1 output.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                   k: Int, tieCol: String,
                   ascending: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    val salt = conv(substring(
      md5(col(tieCol).cast("string").cast("binary")), 1, 2), 16, 10).cast("int")
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(ord, col(tieCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(ord, col(tieCol))
    df.withColumn("__salt", salt)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .drop("__salt", "__r1")
  }

  /** End-to-end duplicate resolution: near-dup PAIRS → connected
    * components → ONE surviving representative per cluster (highest
    * quality, ties to the lowest id), singletons surviving untouched.
    * Output is (doc_id, comp, quality) for the surviving corpus — the
    * table a pipeline actually feeds downstream after dedup.
    *
    * Shuffle budget: the component propagation (O(log d) rounds of two
    * equi-joins, see Components), one join to attach quality, one
    * map-side-combinable winner aggregate per component + a semi-join
    * back. Deliberately NOT a row_number window over comp: a
    * boilerplate mega-cluster (one component holding 10⁸ near-identical
    * docs at 100 TB) would land its whole membership in one task's
    * sort; the aggregate collapses it to one row per map task, and the
    * join-back is AQE-skew-splittable. No all-pairs work anywhere.
    */
  def resolveDuplicates(pairs: DataFrame, quality: DataFrame,
                        idCol: String = "doc_id",
                        qualityCol: String = "quality"): DataFrame = {
    // pin the pair set ONCE: the upstream pair pipeline (LSH + exact
    // verification) is expensive and the component propagation
    // references it from both union branches and every loop action —
    // without this checkpoint the whole pair plan re-executes per
    // reference
    val pinned = pairs.select(col(pairs.columns.head).as("id1"),
      col(pairs.columns(1)).as("id2")).localCheckpoint()
    val comp = Components.connectedComponents(pinned, "id1", "id2")
    val withComp = quality
      .join(comp, quality(idCol) === comp("id"), "left_outer")
      .select(quality(idCol), quality(qualityCol),
        coalesce(col("comp"), quality(idCol)).as("comp"))
    // winner = min over (-quality, id): max quality, ties → lowest id.
    // Null quality negates to null, and null struct fields sort FIRST
    // in ascending struct order — coalesce to +inf so null-quality docs
    // lose their cluster (the desc-window nulls-last semantics this agg
    // replaced).
    val winner = withComp.groupBy(col("comp"))
      .agg(min(struct(coalesce(-col(qualityCol), lit(Double.MaxValue)).as("__nq"),
        col(idCol).as("__i")))
        .as("__w"))
      .select(col("comp"), col("__w.__i").as(idCol))
    withComp.join(winner, Seq("comp", idCol), "left_semi")
      .select(col(idCol), col("comp"), col(qualityCol))
  }

  /** Sequence packing (concat-and-chunk): lay documents end-to-end in
    * `idCol` order and cut the token stream every `ctxLen` tokens —
    * the standard LM-pretraining packing that turns a curated corpus
    * into fixed-length training sequences with zero padding. Emits per
    * document its global token `offset` and the `first_seq`/`last_seq`
    * window ids it lands in (`first_seq != last_seq` marks a document
    * split across a sequence boundary — the attention-masking cases a
    * loader needs enumerated up front).
    *
    * Scale shape: the global running sum is NOT one
    * `Window.orderBy(id)` (that funnels the corpus through a single
    * task — the exact shape removed from MutationEngine). Instead a
    * TWO-PHASE prefix sum: `repartitionByRange` on the id gives
    * contiguous id ranges in partition order, the heavy cumsum runs
    * per partition, and only the ≤`parts`-row partition-totals table
    * pays a (bounded) global window before broadcasting back. Values
    * are bit-identical to the single-window form and independent of
    * sampled range boundaries.
    *
    * Rows with non-positive weight are excluded (a zero-token document
    * occupies no stream position); weights must be integral tokens.
    */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    ctxLen: Long, parts: Int = 256): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val src = df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("__w"))
    val parted = src.repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    // global-window on the TOTALS only: ≤ parts rows, driver-bounded
    val wPre = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = parted.groupBy(col("__pid")).agg(sum(col("__w")).as("__pt"))
      .withColumn("__pre", coalesce(sum(col("__pt")).over(wPre), lit(0L)))
      .select(col("__pid"), col("__pre"))
    parted
      .withColumn("__cum", sum(col("__w")).over(wLocal))
      .join(broadcast(prefix), Seq("__pid"))
      .withColumn("offset", col("__pre") + col("__cum") - col("__w"))
      .select(col(idCol), col("__w").as("n_tokens"), col("offset"),
        expr(s"offset div ${ctxLen}L").as("first_seq"),
        expr(s"(offset + __w - 1) div ${ctxLen}L").as("last_seq"))
  }
}
