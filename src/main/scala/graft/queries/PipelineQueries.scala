package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Training-data-pipeline operators (dedup / similarity / text analysis)
  * exposed through the driver's queries()/oracleSql() correctness gate.
  *
  * SQL-expressible variants carry a DuckDB oracle; the sketch-based ones
  * (MinHash LSH, SimHash) are checked rows-only by the driver and
  * additionally pair-verified in ScalaTest against exact Jaccard.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact dedup: keep lowest doc_id per content hash.
    "dd01_exact_dedup" -> { (s, dir) =>
      Dedup.exactByHash(Tables(s, dir).documents, col("text"), col("doc_id"))
    },

    // Near-dup candidate pairs via MinHash + LSH banding (rows-only check).
    "dd02_minhash_lsh" -> { (s, dir) =>
      Dedup.minHashLshPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16)
    },

    // SimHash 64-bit fingerprints + near-dup pairs at hamming<=6 (rows-only).
    "dd03_simhash" -> { (s, dir) =>
      Dedup.simHashPairs(Tables(s, dir).documents, "doc_id", "text", maxHamming = 6)
    },

    // Exact token-set Jaccard similarity on LSH candidates (rows-only).
    "dd04_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir).documents, "doc_id", "text",
        n = 3, threshold = 0.5)
    },

    // Embedding near-dup: cosine >= 0.95 pairs via bucketed join (rows-only).
    "dd05_embedding_neardup" -> { (s, dir) =>
      Dedup.embeddingNearDupPairs(Tables(s, dir).embeddings, "vec_id", "embedding",
        threshold = 0.4, planes = 6, tables = 8)
    },

    // Brute-force cosine top-k ANN against the vec_id=0 query vector.
    "ann01_bruteforce_topk" -> { (s, dir) =>
      Similarity.bruteForceTopK(Tables(s, dir).embeddings, "vec_id", "embedding",
        queryVecId = 0L, k = 10)
    },

    // LSH-bucketed ANN (random hyperplane signature prefilter; rows-only).
    "ann02_lsh_topk" -> { (s, dir) =>
      Similarity.lshTopK(Tables(s, dir).embeddings, "vec_id", "embedding",
        queryVecId = 0L, k = 10, planes = 8)
    },

    // Text statistics: token counts + ratios.
    "tx01_text_stats" -> { (s, dir) =>
      TextAnalysis.stats(Tables(s, dir).documents)
    },

    // Quality score from length/token heuristics.
    "tx02_quality_score" -> { (s, dir) =>
      TextAnalysis.qualityScore(Tables(s, dir).documents)
    },

    // Document fingerprint: hash of whitespace-normalized lowercase text.
    "tx03_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprint(Tables(s, dir).documents)
    },

    // Language ID via stopword-hit heuristic (rows-only; spec-tested
    // against the labeled `lang` column).
    "tx04_langid" -> { (s, dir) =>
      TextAnalysis.languageId(Tables(s, dir).documents)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "dd01_exact_dedup" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies,
         min(doc_id) AS keep_id
         FROM documents GROUP BY 1""",
    "ann01_bruteforce_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qe
                    FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
                round(CAST(list_cosine_similarity(
                  CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)) AS DOUBLE), 6)
                  AS cos_sim
         FROM embeddings WHERE vec_id <> 0
         ORDER BY cos_sim DESC, vec_id LIMIT 10""",
    "tx01_text_stats" ->
      """SELECT doc_id, n_chars,
         length(text) AS text_len,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
         round(length(replace(text, ' ', '')) * 1.0 / length(text) + 1e-11, 4)
           AS nonspace_ratio
         FROM documents""",
    "tx02_quality_score" ->
      """SELECT doc_id,
         round(0.5 * least(length(text) / 500.0, 1.0)
             + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))) + 1e-11, 4) AS quality
         FROM documents""",
    "tx03_fingerprint" ->
      """SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents"""
  )
}
