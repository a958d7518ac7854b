package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: statistics, quality
  * scoring, fingerprinting, token counting, and a lightweight
  * language-ID heuristic. All pure native-function column expressions
  * (whole-stage codegen, no UDFs), so they run at scan speed and
  * columns not consumed downstream are pruned by Catalyst.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space split, matching the DuckDB oracle's
    * string_split(text, ' ')).
    */
  private def toks(c: Column): Column = split(c, " ")

  /** Per-document surface statistics. */
  def stats(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"), col("n_chars"),
      length(col("text")).as("text_len"),
      size(toks(col("text"))).as("n_tokens"),
      size(array_distinct(toks(col("text")))).as("n_unique_tokens"),
      round(length(regexp_replace(col("text"), " ", "")) * lit(1.0) / length(col("text"))
        + lit(1e-11), 4).as("nonspace_ratio"))

  /** Quality score in [0,1]: half length saturation, half lexical
    * diversity (type/token ratio). Mirrors the reference's
    * length/ratio-heuristic scoring style.
    */
  def qualityScore(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      round(
        lit(0.5) * least(length(col("text")) / lit(500.0), lit(1.0)) +
          lit(0.5) * (size(array_distinct(toks(col("text")))) * lit(1.0) /
            size(toks(col("text")))) + lit(1e-11),
        4).as("quality"))

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * stable under reflow/indentation changes.
    */
  def fingerprint(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")).cast("binary")).as("fp"))

  /** Token count under a BPE-ish regex (word pieces, numbers, single
    * punctuation marks) next to the plain whitespace count.
    */
  def tokenCounts(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol),
      size(split(trim(col(textCol)), "\\s+")).as("ws_tokens"),
      size(filter(split(col(textCol), "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
        t => length(trim(t)) > 0)).as("bpe_tokens"))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "je", "pas"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para", "con", "yo", "no"),
    "it" -> Seq("il", "gli", "che", "di", "per", "con", "sono", "una", "non", "io", "si"))

  /** Language-ID heuristic: CJK/Cyrillic/Greek script detection by
    * character class, else argmax of stopword hit-rate over small
    * per-language dictionaries. Deterministic tie-break by language code.
    * A real n-gram model would slot into the same column expression.
    */
  def languageId(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val t = toks(lower(col(textCol)))
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(t, x => x.isin(words: _*)))
      struct((hits * lit(1.0) / greatest(size(t), lit(1))).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    df.select(
      col(idCol),
      when(col(textCol).rlike("[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}]"), lit("zh"))
        .when(col(textCol).rlike("[\\p{IsCyrillic}]"), lit("ru"))
        .when(col(textCol).rlike("[\\p{IsGreek}]"), lit("el"))
        .when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("pred_lang"))
  }

  /** Per-document top-k TF-IDF terms — the keyword/topic signal stage of
    * a curation pipeline (domain tagging, boilerplate spotting).
    * `tfidf = tf × ln((N+1)/(df+1))`, ranked within each document by
    * (score desc, term asc); the score is rounded (4 dp, epsilon-shifted)
    * BEFORE ranking so ordering is identical across engines regardless
    * of log/ulp differences — which also makes this fully oracle-able.
    *
    * Scale: term frequencies and document frequencies are two
    * map-side-combinable hash aggregates (the df table is one row per
    * vocab term — counts only, no postings); the corpus size N rides in
    * as a broadcast 1-row join, and the final ranking window partitions
    * by document, so no stage materializes anything wider than
    * (doc, term) rows.
    */
  def tfidfTopTerms(df: DataFrame, k: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val terms = df
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("t"))
      .select(col("id"), explode(col("t")).as("term"))
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df_t") + lit(1.0)))
          + lit(1e-11), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("rank"), col("tfidf"))
  }

  /** Split documents into overlapping token-window chunks — the
    * context-window preparation step between curation and tokenization
    * (stride < chunkSize keeps `chunkSize - stride` tokens of overlap
    * so no span falls across a hard boundary). Chunk construction is
    * whole-stage codegen'd: explode the chunk INDICES, then one
    * `slice` + `concat_ws` per row — the shingleRows shape, scan-speed
    * at corpus scale with no interpreted lambdas and no shuffle at all
    * (a pure per-row Generate).
    */
  def chunk(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text",
            chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val base = df.select(col(idCol).as("__id"), Dedup.tokens(col(textCol)).as("t"))
      .withColumn("__n", size(col("t")))
      .withColumn("__nch",
        when(col("__n") <= chunkSize, lit(1L)).otherwise(
          floor((col("__n") - chunkSize + (stride - 1)) / lit(stride.toDouble)) + 1))
    base
      .select(col("__id"), col("t"),
        explode(sequence(lit(0L), col("__nch") - 1)).as("chunk_id"))
      .withColumn("__ct", slice(col("t"), (col("chunk_id") * stride + 1).cast("int"),
        lit(chunkSize)))
      .select(col("__id").as(idCol), col("chunk_id"),
        concat_ws(" ", col("__ct")).as("chunk_text"),
        size(col("__ct")).as("chunk_tokens"))
  }

  /** Per-document mean unigram negative log-likelihood under the
    * corpus's own empirical unigram distribution — the cheap stand-in
    * for the CCNet/KenLM perplexity filter: documents whose tokens are
    * systematically improbable in the corpus score high and are
    * outlier/noise candidates; boilerplate scores low. `nll =
    * avg(-ln(count(term)/total))` over token OCCURRENCES (so repeated
    * common words pull the average down, as in a real LM).
    *
    * Scale: one (doc, term) count aggregate, one vocab-sized count
    * aggregate, a broadcast scalar total, and one final per-doc
    * average — all map-side-combinable, shuffling (doc, term) and
    * (term) count rows only.
    */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val terms = df
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("t"))
      .select(col("id"), explode(col("t")).as("term"))
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = cf.agg(sum(col("cf")).as("total_tokens"))
    tf.join(cf, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(round(
        (sum(col("tf") * -log(col("cf") / col("total_tokens"))) / sum(col("tf")))
          + lit(1e-11), 4).as("nll"))
      .select(col("id").as(idCol), col("nll"))
  }

  /** Repetition / quality-filter statistics in the Gopher (Rae et al.
    * 2021) and C4 (Raffel et al. 2020) style, re-based on token-level
    * signals (this corpus is single-line, so line/paragraph duplicate
    * fractions are degenerate — the token 2-gram and duplicate-token
    * fractions carry the same repetition signal):
    *
    *  - `top2gram_frac`  — fraction of tokens covered by the most
    *    frequent token 2-gram (Gopher's top-n-gram filter);
    *  - `dup_token_frac` — 1 − unique/total tokens;
    *  - `mean_word_len`  — mean token length (Gopher bounds 3..10);
    *  - `symbol_ratio`   — non-letter/digit/space characters over all
    *    characters (C4's symbol filter);
    *  - `gopher_pass`    — 1 iff all thresholds hold.
    *
    * Scale: the only non-scan work is the 2-gram mode, computed as
    * explode → two map-side-combinable hash aggregates keyed on
    * (doc, gram) then (doc) — shuffles carry one row per distinct
    * per-doc gram, never per token occurrence, and the join back to the
    * scan-speed surface stats is on the doc id. No UDFs, no windows,
    * no driver participation.
    */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      minTokens: Int = 20, maxTop2GramFrac: Double = 0.18,
                      maxDupTokenFrac: Double = 0.6,
                      minMeanWordLen: Double = 2.0,
                      maxMeanWordLen: Double = 12.0): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      Dedup.tokens(col(textCol)).as("t"),
      lower(trim(col(textCol))).as("txt"))
    // 2-grams through the shared codegen'd shingle kernel (explode
    // start positions + element_at — an interpreted transform/slice
    // lambda pays CodegenFallback dispatch per token, the dominant
    // cost of a corpus-wide Gopher filter pass). Docs shorter than 2
    // tokens are excluded up front, exactly as before (shingleRows
    // would otherwise emit their whole text as one gram).
    val top2 = Dedup.shingleRows(
        df.filter(size(Dedup.tokens(col(textCol))) >= 2), idCol, textCol, 2)
      .groupBy(col("id"), col("shingle")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id")).agg(max(col("cnt")).as("max2"))
      .withColumnRenamed("id", "__id")
    val eps = lit(1e-11)
    base.join(top2, Seq("__id"), "left")
      .select(col("__id"), col("t"), col("txt"),
        size(col("t")).as("n_tokens"),
        (coalesce(col("max2"), lit(0L)) * lit(2.0) / size(col("t"))).as("tg"),
        (lit(1.0) - size(array_distinct(col("t"))) * lit(1.0) / size(col("t"))).as("dup"),
        (length(translate(col("txt"), " ", "")) * lit(1.0) / size(col("t"))).as("mwl"),
        (length(regexp_replace(col("txt"), "[\\p{L}\\p{N}\\s]", "")) * lit(1.0) /
          nullif(length(col("txt")), lit(0))).as("sym"))
      .select(col("__id").as(idCol),
        col("n_tokens"),
        round(col("tg") + eps, 4).as("top2gram_frac"),
        round(col("dup") + eps, 4).as("dup_token_frac"),
        round(col("mwl") + eps, 4).as("mean_word_len"),
        round(col("sym") + eps, 4).as("symbol_ratio"),
        (col("n_tokens") >= minTokens && col("tg") <= maxTop2GramFrac &&
          col("dup") <= maxDupTokenFrac &&
          col("mwl").between(minMeanWordLen, maxMeanWordLen))
          .cast("int").as("gopher_pass"))
  }

  /** Shared Java-regex / RE2 subset (no lookaround, ASCII classes), so
    * the identical patterns run in Spark and in external SQL engines.
    */
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII scrubbing (the C4/Dolma pre-training scrub): redact emails,
    * IPv4 addresses, and NANP phone numbers with typed placeholder
    * tokens and count each class. A chain of codegen'd regexp_replace /
    * regexp_extract_all — scan-speed, shuffle-free, no UDFs. Counts are
    * taken over the original text (a match consumed by an earlier
    * redaction class still counts for its own class); replacement order
    * is email → IP → phone.
    */
  def redactPii(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, emailRe, "<EMAIL>"),
          ipv4Re, "<IP>"),
        phoneRe, "<PHONE>").as("redacted"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank corpus
    * documents by how target-like they are, as the mean per-token
    * log-likelihood ratio between a TARGET unigram distribution (the
    * rows matching `targetFilter` — a trusted high-quality slice) and
    * the RAW corpus distribution. Both distributions are Laplace
    * (+1) smoothed over the corpus vocabulary, so target-unseen terms
    * contribute a finite negative ratio instead of -inf:
    *
    *   p(w) = (cnt_target(w)+1) / (T_target+V)
    *   q(w) = (cnt_corpus(w)+1) / (T_corpus+V)
    *   importance(d) = Σ_w tf(d,w)·ln(p(w)/q(w)) / Σ_w tf(d,w)
    *
    * Selecting the top-importance documents (or hash-sampling
    * proportional to exp(importance)) reproduces DSIR's
    * importance-resampled pre-training mix.
    *
    * Scale: the corpus is scanned and tokenized ONCE — both unigram
    * distributions and the totals derive from the per-(doc, term)
    * count table (`is_target` rides along as a grouping key, constant
    * per doc), so the explode→partial-aggregate subplan is shared and
    * Spark's ReuseExchange executes it a single time; the three
    * broadcast scalars (token totals + vocab size) and the final
    * per-doc average shuffle only (doc, term) and (term) count rows —
    * the same profile as [[unigramLogProb]], which runs in ~0.6 s over
    * sf0.1. No windows, no driver participation, skew-free keys.
    */
  def dsirImportance(df: DataFrame, targetFilter: Column,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val terms = df
      .select(col(idCol).as("id"), targetFilter.as("is_target"),
        Dedup.tokens(col(textCol)).as("t"))
      .select(col("id"), col("is_target"), explode(col("t")).as("term"))
    val tf = terms.groupBy(col("id"), col("is_target"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("term")).agg(
      sum(col("tf")).as("cf_raw"),
      sum(when(col("is_target"), col("tf")).otherwise(0L)).as("cf_tgt"))
    val totals = cf.agg(
      sum(col("cf_raw")).as("tot_raw"),
      sum(col("cf_tgt")).as("tot_tgt"),
      count(lit(1)).as("vocab"))
    tf.join(cf, Seq("term"))
      .crossJoin(broadcast(totals))
      .groupBy(col("id"))
      .agg(round(
        (sum(col("tf") *
          (log((col("cf_tgt") + lit(1.0)) / (col("tot_tgt") + col("vocab"))) -
            log((col("cf_raw") + lit(1.0)) / (col("tot_raw") + col("vocab"))))) /
          sum(col("tf"))) + lit(1e-11), 6).as("importance"))
      .select(col("id").as(idCol), col("importance"))
  }

  /** CCNet-style language-model quality bucketing (Wenzek et al. 2020):
    * score every document by its perplexity proxy under a bigram LM
    * with stupid backoff (Brants et al. 2007) trained on a TARGET
    * slice of the corpus (CCNet trains on Wikipedia and scores the
    * crawl; `targetFilter` selects the in-domain slice here), then
    * assign head / middle / tail buckets at the tertiles of the
    * per-document score — the standard LM-filter front door of a
    * pre-training data pipeline.
    *
    * Model: S(w2|w1) = C(w1 w2)/C(w1) when the bigram occurs in the
    * training slice, else backoff * (C(w2)+1)/(N+V) — the stupid-
    * backoff unigram fallback with the same Laplace smoothing over the
    * training vocabulary that [[dsirImportance]] uses, so words unseen
    * in training still get a finite penalty. Per-doc score = the
    * occurrence-weighted mean of -ln S over the doc's bigrams
    * (documents under 2 tokens have no bigrams and are absent, as in
    * [[ngramNovelty]]). Lower = more target-like; `head` is the
    * best-scoring third.
    *
    * Scale: bigrams come from the shared codegen'd shingle kernel;
    * training counts are two map-side-combinable aggregates over the
    * TARGET slice only; scoring is three hash joins on short keys
    * (bigram string, then each side word against the unigram table —
    * boilerplate grams spread across docs, so no skew-prone hot keys);
    * totals ride in as one broadcast row. The tertile thresholds are a
    * single exact-percentile aggregate over PRE-ROUNDED per-doc scores
    * (bounded distinct values, so the percentile buffer stays small)
    * broadcast back as one row — the same threshold pattern as the
    * quality-quartile binning. No windows, no driver loops.
    */
  def bigramPerplexityBins(df: DataFrame, targetFilter: Column,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           backoff: Double = 0.4): DataFrame = {
    val longEnough = df.filter(size(Dedup.tokens(col(textCol))) >= 2)
    // per-doc bigram occurrence counts over the WHOLE corpus
    val tf = Dedup.shingleRows(longEnough, idCol, textCol, 2)
      .groupBy(col("id"), col("shingle")).agg(count(lit(1)).as("tf"))
    val tgt = df.filter(targetFilter)
    // training-slice bigram and unigram counts + totals
    val cb = Dedup.shingleRows(tgt.filter(size(Dedup.tokens(col(textCol))) >= 2),
        idCol, textCol, 2)
      .groupBy(col("shingle")).agg(count(lit(1)).as("cb"))
    val cu = tgt.select(explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val totals = cu.agg(sum(col("cu")).as("n_train"), count(lit(1)).as("v_train"))
    val scored = tf
      .withColumn("w1", substring_index(col("shingle"), " ", 1))
      .withColumn("w2", substring_index(col("shingle"), " ", -1))
      .join(cb, Seq("shingle"), "left")
      .join(cu.select(col("term").as("w1"), col("cu").as("c1")), Seq("w1"), "left")
      .join(cu.select(col("term").as("w2"), col("cu").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("s",
        when(col("cb").isNotNull,
          col("cb") / col("c1"))
          .otherwise(lit(backoff) * (coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (col("n_train") + col("v_train"))))
    val nll = scored.groupBy(col("id"))
      .agg(round((sum(col("tf") * -log(col("s"))) / sum(col("tf")))
        + lit(1e-11), 4).as("nll"))
    // tertiles over the pre-rounded score: when the interpolation
    // position is fractional the threshold falls strictly between two
    // distinct data values (1-ulp engine differences can't flip a <=),
    // and when it is integral both engines return the element verbatim
    val th = nll.agg(
      percentile(col("nll"), lit(1.0 / 3)).as("t1"),
      percentile(col("nll"), lit(2.0 / 3)).as("t2"))
    nll.crossJoin(broadcast(th))
      .select(col("id").as(idCol), col("nll"),
        when(col("nll") <= col("t1"), "head")
          .when(col("nll") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** N-gram novelty ("contribution") scoring: the fraction of a
    * document's distinct n-grams whose FIRST corpus occurrence (owner =
    * minimum doc id over the gram) is this document — a dedup-aware
    * signal for how much new text a doc contributes to the corpus,
    * used to weight or drop documents during mixture construction
    * (the per-doc aggregate view of the Lee et al. duplicated-gram
    * analysis that `duplicatedSpans` cuts at span level).
    *
    * Docs shorter than n tokens produce no grams and are absent from
    * the output, matching the `positionalGramRows` domain. Work scales
    * with distinct-gram volume: one distinct over (doc, gram), one
    * map-side-combinable min per gram, one count per doc — no windows,
    * no skew-prone keys (a boilerplate gram's rows spread over its
    * many docs).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 4): DataFrame = {
    val g = Dedup.positionalGramRows(df, idCol, textCol, n)
      .select(col("id"), col("gh")).distinct()
    val owners = g.groupBy(col("gh")).agg(min(col("id")).as("__owner"))
    g.join(owners, Seq("gh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__owner") === col("id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel") / col("n_grams") + lit(1e-11), 6).as("novelty"))
  }
}
