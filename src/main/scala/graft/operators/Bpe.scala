package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING and encoding
  * (Sennrich et al. 2016) — the on-cluster tokenizer-learning job of a
  * pre-training data pipeline, beyond the reference's surface.
  *
  * Representation: a word's symbol sequence is one STRING with every
  * symbol wrapped in `␟` sentinels — `[l,o,w]` is `␟l␟␟o␟␟w␟`.
  * Merging pair (a,b) is then a literal (non-regex, codegen'd)
  * `replace(w, "␟a␟␟b␟", "␟ab␟")`: Java's replace scans left-to-right
  * and resumes AFTER each replacement, which is exactly BPE's
  * non-overlapping greedy merge (`x x x` → `xx x`), and the doubled
  * separator between symbols means adjacent matches never share a
  * sentinel character, so `a b a b` merges BOTH pairs in one pass.
  *
  * Scale: training state is the DISTINCT-word count table (Zipf: tens
  * of millions of rows at 100 TB, never the corpus itself). Each merge
  * iteration is (1) one map-side-combinable pair-count aggregate
  * shuffling one row per distinct (word, adjacent-pair) and (2) a
  * map-only literal replace — two narrow jobs; the driver receives ONE
  * argmax row per iteration. Lineage is truncated with a local
  * checkpoint every few iterations so the plan never grows with the
  * merge count.
  */
object Bpe {

  private val S = "\u001F" // unit separator: the symbol sentinel
  private val SS = S + S

  /** Wrap a whitespace token into sentinel form, one symbol per
    * character. Raw `␟` in input text is stripped first (it IS the
    * framing character), as is the empty word.
    */
  private def wrapChars(word: Column): Column =
    concat(lit(S), array_join(split(translate(word, S, ""), ""), SS), lit(S))

  /** Distinct-word counts of `textCol` under the corpus-standard
    * lowercase whitespace tokenization, in wrapped-symbol form.
    */
  private[graft] def wordCounts(df: DataFrame, textCol: String): DataFrame =
    Par.spread(df.select(col(textCol).as("__txt")))
      .select(explode(Dedup.tokens(col("__txt"))).as("word"))
      .filter(length(translate(col("word"), S, "")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(wrapChars(col("word")).as("w"), col("cnt"))

  /** Symbols of a wrapped word (sentinels stripped, split on the
    * doubled separator).
    */
  private def symbolsOf(w: Column): Column =
    split(w.substr(lit(2), length(w) - 2), SS)

  /** Adjacent symbol pairs of a wrapped word, as (a, b) structs.
    * Single-symbol words yield an empty array (Spark's `sequence(1, 0)`
    * DESCENDS, so the straightforward form would index element 0).
    */
  private def pairsOf(w: Column): Column = {
    val sym = symbolsOf(w)
    when(size(sym) >= 2,
      transform(sequence(lit(1), size(sym) - 1),
        i => struct(element_at(sym, i).as("a"), element_at(sym, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** One merge: (rank, left, right, pair_count). */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Learn `numMerges` BPE merges from the corpus. Deterministic: the
    * argmax pair breaks count ties lexicographically on (left, right).
    * Stops early when no pair reaches `minPairCount`.
    *
    * Scale: each merge is one aggregate over the DISTINCT-WORD table
    * (the corpus is scanned once, before the loop), so training cost
    * is numMerges × vocab-aggregate — argmax merges are sequential by
    * definition, and Spark has no updatable pair-count store to make
    * the per-merge step delta-sized. The web-scale path is therefore
    * FIRST-CLASS, not advice: `sampleSixteenths` < 16 trains on a
    * deterministic md5 hash sample of DOCUMENTS (keyed on the text —
    * engine-portable, the [[Sampling.hashSample]] rule). Sampled-train
    * quality is MEASURED, not cited (graft.BpeAgreement, sf1 corpus,
    * 128 requested / 102 learned merges — artifacts/r18/
    * bpe_agreement_sf1.json): the HALF sample learns the IDENTICAL
    * merge set (top-all overlap 1.0000) and the QUARTER sample 97.1%
    * (top-64 overlap 0.98/0.92), while the exact greedy ORDER diverges
    * at rank 7 in both — near-tie counts reorder early under sampling
    * even when the learned vocabulary matches, so compare merge SETS,
    * not rank sequences, when auditing a sampled train. DEPTH (r19):
    * the 102 above is that corpus's complete merge CLOSURE, not a
    * floor artifact — minPairCount = 1 still stops at 102
    * (artifacts/r19/bpe_agreement_sf1_deep.json), and the half sample
    * learns the closure bit-identically. At real tokenizer depth —
    * 1,024 merges on the character-diverse sf1_div corpus
    * (artifacts/r19/bpe_agreement_sf1_div_1024.json) — the half
    * sample holds 96.1% of the top-256 / 96.5% of the top-512 /
    * 94.0% of the full set (quarter: 94.9/95.7/92.0%), with the
    * divergent tail in rare sample-dependent pair counts; order
    * diverges at rank 3 (near-tie churn). Overlap falls with DEPTH
    * into the rare tail, not with corpus size — size the sample to
    * the vocabulary depth you need faithful. A BUDGET GUARD
    * fails fast when distinct-words ×
    * numMerges exceeds `graft.bpe.trainBudget` (session conf, default
    * 10⁹ word-merge rows ≈ minutes of cluster aggregates), with the
    * error routing to the sampled arm — so a 32k-merge full-corpus
    * train is an informed, auditable decision instead of a silent 32k
    * sequential jobs ([[trainWithLedger]] records what was decided).
    * `encode` stays O(1)-plan in the vocabulary and always runs on the
    * full corpus.
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 50,
            minPairCount: Long = 2L, sampleSixteenths: Int = 16): Seq[Merge] =
    trainWithLedger(df, textCol, numMerges, minPairCount, sampleSixteenths)._1

  /** [[train]] plus a one-row audit LEDGER (the editDistancePairsAuto
    * discipline): (sample_sixteenths, distinct_words, requested_merges,
    * learned_merges, min_pair_count, budget, estimated_rows) —
    * `estimated_rows` is the guarded distinct-words × numMerges
    * product the budget gates on.
    */
  def trainWithLedger(df: DataFrame, textCol: String = "text",
                      numMerges: Int = 50, minPairCount: Long = 2L,
                      sampleSixteenths: Int = 16)
  : (Seq[Merge], DataFrame) = {
    require(sampleSixteenths >= 1 && sampleSixteenths <= 16,
      s"sampleSixteenths must be in [1, 16], got $sampleSixteenths")
    val spark = df.sparkSession
    val budget = spark.conf.getOption("graft.bpe.trainBudget")
      .map(_.toLong).getOrElse(1000000000L)
    val corpus =
      if (sampleSixteenths >= 16) df
      else Sampling.hashSample(df, textCol, sampleSixteenths)
    var words = wordCounts(corpus, textCol).persist()
    val distinctWords = words.count() // materialize; the scan runs once
    // the guard reads the POST-SAMPLE vocabulary — the sampled arm is
    // exactly how a caller gets back under budget
    val est = distinctWords * numMerges.toLong
    if (est > budget) {
      words.unpersist()
      throw new IllegalArgumentException(
        s"BPE train budget exceeded: $distinctWords distinct words x " +
          s"$numMerges merges = $est word-merge rows > graft.bpe.trainBudget " +
          s"= $budget. Train on a hash sample (sampleSixteenths < 16 — " +
          "merge quality converges long before the full corpus; encode " +
          "stays full-corpus and O(1)-plan), reduce numMerges, or raise " +
          "the budget conf to opt into the full sequential loop.")
    }
    val merges = trainLoop(words, numMerges, minPairCount)
    import spark.implicits._
    val ledger = Seq((sampleSixteenths, distinctWords, numMerges,
        merges.size, minPairCount, budget, est))
      .toDF("sample_sixteenths", "distinct_words", "requested_merges",
        "learned_merges", "min_pair_count", "budget", "estimated_rows")
    (merges, ledger)
  }

  /** The sequential merge loop over a materialized distinct-word count
    * table (consumes the persist; see [[train]] for the cost model).
    */
  private def trainLoop(words0: DataFrame, numMerges: Int,
                        minPairCount: Long): Seq[Merge] = {
    // ONE job per merge: the argmax aggregate itself re-derives the
    // current word table from the last pinned frame plus at most 7
    // pending literal replaces — a narrow, codegen'd prefix of the
    // same stage, so deferring the state materialization costs a few
    // string scans while saving a whole scheduled job per merge (the
    // old shape paid argmax + persist-count every iteration: 2x the
    // scheduler floor, which DOMINATES at vocab-table row counts).
    // Every 8th merge the state is pinned eagerly (plan stays O(1)
    // across iterations) and the superseded pin is freed (IterPin
    // discipline). Same expressions in the same order → bit-identical
    // merges.
    var pinned = words0 // last materialized frame (caller persisted it)
    var words = words0  // pinned + <8 lazy replaces
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    def freeSuperseded(prev: DataFrame): Unit =
      if (prev eq words0) words0.unpersist() else IterPin.free(prev)
    while (rank <= numMerges && !done) {
      val best = words
        .select(explode(pairsOf(col("w"))).as("p"), col("cnt"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      best.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2))) match {
        case Some((a, b, n)) if n >= minPairCount =>
          merges += Merge(rank, a, b, n)
          words = words.select(
            replace(col("w"), lit(S + a + S + S + b + S), lit(S + a + b + S)).as("w"),
            col("cnt"))
          if (rank % 8 == 0) {
            val next = IterPin.pin(words) // eager — truncates lineage
            freeSuperseded(pinned)
            pinned = next
            words = next
          }
          rank += 1
        case _ => done = true
      }
    }
    freeSuperseded(pinned)
    merges.toSeq
  }

  /** The learned vocabulary as a DataFrame (for `queries()` exposure /
    * persistence): one row per merge in rank order.
    */
  def trainTable(spark: SparkSession, df: DataFrame, textCol: String = "text",
                 numMerges: Int = 50, minPairCount: Long = 2L,
                 sampleSixteenths: Int = 16): DataFrame = {
    import spark.implicits._
    train(df, textCol, numMerges, minPairCount, sampleSixteenths)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Above this many merges, encode switches from the literal-replace
    * chain (one expression node per merge — ideal codegen at demo
    * sizes, but a 32k-merge vocab would be a 32k-deep expression tree,
    * past Janino's 64KB method limit into interpreted fallback) to
    * [[graft.functions.BpeApply]], whose vocabulary rides as ONE
    * codegen reference object with O(1) plan size.
    */
  private[graft] val ChainMaxMerges = 64

  /** Encode: apply the merges to a wrapped word in rank order, one
    * left-to-right pass each — the standard apply-BPE chain (a later
    * merge's operands only ever exist after earlier merges ran, so
    * rank order IS priority order). Returns the symbol array. Small
    * vocabularies inline as a literal-replace chain; real ones route
    * through the O(1)-plan [[graft.functions.BpeApply]] expression
    * (BpeApplySpec proves the two paths agree).
    */
  private[graft] def encodeWord(word: Column, merges: Seq[Merge]): Column =
    if (merges.size <= ChainMaxMerges) {
      val merged = merges.foldLeft(wrapChars(word)) { (w, m) =>
        replace(w, lit(S + m.left + S + S + m.right + S), lit(S + m.left + m.right + S))
      }
      symbolsOf(merged)
    } else {
      org.apache.spark.sql.graftshim.ColumnBridge.column(
        graft.functions.BpeApply(
          org.apache.spark.sql.graftshim.ColumnBridge.expression(word),
          merges.map(m => (m.left, m.right))))
    }

  /** Per-document token accounting under the learned vocabulary:
    * whitespace tokens, BPE tokens, and chars-per-BPE-token
    * compression — the signal that sizes a token budget before a
    * training run. Map-only over the document scan (the merge chain is
    * a codegen'd literal-replace pipeline; no shuffle, no UDFs).
    */
  def encodeStats(df: DataFrame, merges: Seq[Merge], idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val words = Dedup.tokens(col(textCol))
    val bpe = aggregate(
      transform(words, w => size(encodeWord(w, merges))),
      lit(0), (acc, n) => acc + n)
    df.select(
      col(idCol),
      size(words).cast("long").as("ws_tokens"),
      bpe.cast("long").as("bpe_tokens"),
      round(length(regexp_replace(col(textCol), "\\s+", "")) * lit(1.0) /
        bpe + lit(1e-11), 4).as("chars_per_token"))
  }
}
