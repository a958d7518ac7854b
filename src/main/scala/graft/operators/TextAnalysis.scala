package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
