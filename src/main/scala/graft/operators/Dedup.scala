package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text/embedding corpora.
  *
  * All operators are pure DataFrame transformers built from codegen'd
  * native functions (no UDFs): they shuffle only on the keys that define
  * the dedup semantics, so they scale horizontally — candidate
  * generation is always a hash-partitioned equi-join on a short key
  * (content hash / LSH band / signature block / token shingle), never an
  * all-pairs comparison.
  *
  * Reference behaviors mirrored (re-designed Spark-first, not ported):
  * exact + fuzzy duplicate handling in the reference ETL layer
  * (/root/reference/packages/fastopendata/src/fastopendata/etl — dedup
  * strategies; see SURVEY.md §2 and the beyond-parity mandate).
  */
object Dedup {

  /** Exact dedup: one representative (minimum id) per identical content.
    * Single shuffle on the 128-bit content hash; map-side partial agg.
    */
  def exactByHash(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content.cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("keep_id"))

  /** Word-level n-gram shingles from an already-materialized tokens
    * column. IMPORTANT: `toks` must be a column *attribute* (from a prior
    * projection), not the split(...) expression itself — higher-order
    * functions evaluate their argument expression once per lambda
    * invocation in interpreted mode, so an inline split() would re-split
    * the text for every shingle index (measured ~9 ms/doc vs ~0.1).
    */
  private[graft] def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))

  /** Lowercased whitespace tokens. */
  private[graft] def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** 64-bit MinHash signature: element h = min over shingles of
    * xxhash64(h, shingle). One array column, no shuffle.
    */
  private[graft] def minHashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(sh, x => xxhash64(lit(h), x)))
    }: _*)

  /** MinHash + LSH banding near-duplicate candidate pairs.
    *
    * Pipeline: shingle → signature → explode one row per band (band key =
    * hash of that band's signature slice) → self-equi-join on
    * (band, key) with id1 < id2 → distinct pairs → estimate Jaccard as
    * the fraction of matching signature components.
    *
    * Scale: the only shuffles are the band-key join and the final
    * distinct; both are hash-partitioned on short keys. Bucket skew is
    * bounded because a band key is 64 bits of minhash — collisions are
    * genuine near-dups, not hot keys.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), shingleSize).as("sh"))
      .select(col("id"), minHashSignature(col("sh"), numHashes).as("sig"))

    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    val l = banded.select(col("band"), col("bkey"),
      col("id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("bkey"),
      col("id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b),
          x => x)) / lit(numHashes.toDouble)).as("est_jaccard"))
      .groupBy(col("id1"), col("id2"))
      .agg(round(max(col("est_jaccard")), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash of the token multiset: bit b is set when the sum of
    * ±1 votes (sign of bit b of each token's xxhash64) is positive. Bit
    * positions are unrolled statically so every shift amount is a
    * literal; codegen's common-subexpression elimination shares the
    * per-token hash across the 64 bit extractions.
    */
  private[graft] def simHash(toks: Column): Column = {
    (0 until 64).map { b =>
      val votes = aggregate(toks, lit(0L),
        (acc, t) => acc + when(
          shiftrightunsigned(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<=7).
    *
    * Pigeonhole blocking: split the 64-bit fingerprint into 8 bytes; any
    * pair within hamming distance 7 must agree on at least one byte, so
    * the candidate join is an equi-join on (block_idx, block_val) —
    * never an all-pairs scan.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "8-block pigeonhole covers hamming<=7")
    val sigDf = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), simHash(col("toks")).as("sim"))
    val blocked = sigDf.select(col("id"), col("sim"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("sim"), b * 8).bitwiseAND(255L).as("bval"))
      }: _*)).as("kb"))
      .select(col("id"), col("sim"), col("kb.blk").as("blk"), col("kb.bval").as("bval"))
    val l = blocked.select(col("blk"), col("bval"), col("id").as("id1"), col("sim").as("sim1"))
    val r = blocked.select(col("blk"), col("bval"), col("id").as("id2"), col("sim").as("sim2"))
    l.join(r, Seq("blk", "bval"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard pairs >= threshold via inverted-index join.
    *
    * explode (id, shingle) → self-join on shingle → count common shingles
    * per pair → Jaccard = common / (|A| + |B| - common). High-document-
    * frequency shingles (stopword-like) are dropped before the join —
    * the standard skew guard: a shingle shared by f docs contributes
    * f^2 join rows.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDf: Int = 1000): DataFrame = {
    val sets = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), n).as("sh"))
      .withColumn("set_size", size(col("sh")))
    val inverted = sets.select(col("id"), col("set_size"), explode(col("sh")).as("shingle"))
    val rare = inverted.groupBy(col("shingle")).agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxShingleDf)
      .select(col("shingle"))
    val pruned = inverted.join(rare, Seq("shingle"))
    val l = pruned.select(col("shingle"), col("id").as("id1"), col("set_size").as("sz1"))
    val r = pruned.select(col("shingle"), col("id").as("id2"), col("set_size").as("sz2"))
    l.join(r, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("sz1"), col("sz2"))
      .agg(count(lit(1)).as("common"))
      .select(col("id1"), col("id2"),
        round(col("common") / (col("sz1") + col("sz2") - col("common")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs (cosine >= threshold) via random-hyperplane
    * LSH: `tables` independent 8-bit signatures; pairs agreeing on any
    * signature are verified with exact double-precision cosine.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, planes: Int = 8,
                            tables: Int = 4): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val signed = v.withColumn("sigs", array((0 until tables).map { t =>
      Similarity.hyperplaneSignature(col("v"), planes, seed = t * 7919 + 17)
    }: _*))
    val bucketed = signed.select(col("id"), col("v"), col("norm"),
      posexplode(col("sigs")).as(Seq("tbl", "sig")))
    val l = bucketed.select(col("tbl"), col("sig"), col("id").as("id1"),
      col("v").as("v1"), col("norm").as("n1"))
    val rr = bucketed.select(col("tbl"), col("sig"), col("id").as("id2"),
      col("v").as("v2"), col("norm").as("n2"))
    l.join(rr, Seq("tbl", "sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (aggregate(zip_with(col("v1"), col("v2"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) / (col("n1") * col("n2"))).as("cos"))
      .groupBy(col("id1"), col("id2"))
      .agg(round(max(col("cos")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
