package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), designed so the same plan shape works at 100 TB:
  * the query vector rides along as a broadcast single-row DataFrame
  * (never a driver-side collect into the plan), the distance math is
  * native `zip_with`/`aggregate` (codegen'd, no UDF), and top-k goes
  * through `orderBy().limit(k)` which Spark executes as
  * TakeOrderedAndProject — per-partition heaps + driver merge, no
  * global sort shuffle.
  */
object Similarity {

  /** Double-precision cosine similarity between two array<double> cols:
    * dot(a,b) / (norm(a) * norm(b)), sequential left-to-right fold so it
    * is bit-identical with the DuckDB oracle's evaluation order.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force cosine top-k against the vector with id
    * `queryVecId`. One broadcast-nested-loop against a 1-row dimension,
    * then TakeOrderedAndProject.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryVecId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryVecId)
      .select(asDouble(col(vecCol)).as("qv"))
    df.filter(col(idCol) =!= queryVecId)
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col("v"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Int8 scalar quantization: symmetric per-vector max-abs scaling,
    * `code_i = round(x_i * 127 / max|x|)` stored as tinyint — 4× less
    * memory/IO than float32, which at 100 TB is the difference between
    * an in-memory and a spilling ANN working set. Positive per-vector
    * scales cancel in cosine, so quantized cosine is EXACTLY the cosine
    * of the code vectors (and integer-valued dot products are exact in
    * double, making the whole pipeline bit-reproducible — unlike the
    * float original, this variant has a full external oracle).
    * Zero vectors quantize to null and drop out of similarity search.
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("__m", nullif(array_max(transform(col("v"), x => abs(x))), lit(0.0)))
      .select(col(idCol),
        transform(col("v"), x => round(x * lit(127.0) / col("__m")).cast("tinyint"))
          .as("codes"))

  /** Exact cosine top-k over int8-quantized vectors: same plan shape as
    * `bruteForceTopK` (broadcast 1-row query + TakeOrderedAndProject),
    * but the scan carries tinyint codes instead of floats.
    */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
                    queryVecId: Long, k: Int): DataFrame = {
    val codes = quantize(df, idCol, vecCol)
      .select(col(idCol), asDouble(col("codes")).as("cd"))
    val q = codes.filter(col(idCol) === queryVecId).select(col("cd").as("qcd"))
    codes.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col("cd"), col("qcd")), 6).as("cos_sim"))
      .filter(col("cos_sim").isNotNull)
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** `planes`-bit random-hyperplane signature of an array<double> vector.
    * Hyperplane p's component for dimension d is a deterministic ±1
    * derived from xxhash64(seed, p, d) — no stored model, so executors
    * recompute it locally and nothing is shuffled or broadcast.
    */
  private[graft] def hyperplaneSignature(v: Column, planes: Int, seed: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * when(xxhash64(lit(seed), lit(p), d).bitwiseAND(1L) === 1L, 1.0)
            .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF (inverted-file) ANN — the FAISS IVF-Flat layout expressed
    * relationally: coarse k-means centroids (Spark ML, a handful of
    * scan-bounded iterations) partition the corpus into `nlist`
    * buckets; a query scores exact cosine ONLY inside its `nprobe`
    * nearest buckets. At 100 TB the bucket id is the natural partition
    * key — write the corpus `partitionBy(__bucket)` and a query's scan
    * prunes to nprobe buckets of files; the centroid table is tiny and
    * driver-resident by construction (nlist rows).
    */
  /** Fitted coarse quantizers, keyed by a caller-supplied corpus key —
    * an IVF index is built ONCE offline and amortized over every query
    * against that corpus (the FAISS usage model); refitting k-means per
    * query would charge the index build to each lookup. LRU-bounded so
    * rewritten/forgotten corpora can't pin stale KMeansModels (and the
    * session references inside them) for the life of the process.
    */
  private val ivfModelCap = 32
  private val ivfModels = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Int, Long),
      org.apache.spark.ml.clustering.KMeansModel](16, 0.75f, true) {
      override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Int, Long),
          org.apache.spark.ml.clustering.KMeansModel]): Boolean =
        size() > ivfModelCap
    })

  /** Drop a cached quantizer (call after the corpus under `corpusKey`
    * is rewritten — the cache has no content-based invalidation, so a
    * stale model would silently degrade recall).
    */
  def ivfInvalidate(corpusKey: String): Unit = ivfModels.synchronized {
    val it = ivfModels.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == corpusKey) it.remove()
  }

  /** Fit (or fetch the cached) coarse k-means quantizer for a corpus.
    * The cache keys on (corpusKey, nlist, seed) only — the caller owns
    * the contract that a key names an immutable corpus snapshot; use
    * `ivfInvalidate` when the data under a key changes.
    */
  def ivfFit(df: DataFrame, vecCol: String,
             nlist: Int, seed: Long,
             corpusKey: Option[String] = None)
  : org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def fit() = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__fv").setPredictionCol("__bucket")
      .fit(df.select(asDouble(col(vecCol)).as("v"))
        .withColumn("__fv", array_to_vector(col("v"))))
    corpusKey match {
      case Some(key) => ivfModels.synchronized {
        val k = (key, nlist, seed)
        Option(ivfModels.get(k)).getOrElse { val m = fit(); ivfModels.put(k, m); m }
      }
      case None => fit()
    }
  }

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryVecId: Long, k: Int, nlist: Int = 16,
              nprobe: Int = 4, seed: Long = 7L,
              corpusKey: Option[String] = None): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = df
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("__fv", array_to_vector(col("v")))
    val model = ivfFit(df, vecCol, nlist, seed, corpusKey)
    val assigned = model.transform(withVec).drop("__fv")
    // nprobe nearest centroids to the query vector: nlist² driver flops.
    // An absent query id returns an empty frame (matching the sibling
    // top-k operators' empty-broadcast behavior), never a throw.
    val qRow = withVec.filter(col(idCol) === queryVecId).select(col("v")).head(1)
    if (qRow.isEmpty)
      return df.select(col(idCol), lit(null).cast("double").as("cos_sim")).limit(0)
    val qVec = qRow.head.getSeq[Double](0).toArray
    val probe = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, i)
    }.sortBy(_._1).take(nprobe).map(_._2)
    val q = assigned.filter(col(idCol) === queryVecId).select(col("v").as("qv"))
    assigned.filter(col("__bucket").isin(probe.toIndexedSeq: _*))
      .filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col("v"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: prefilter to vectors whose hyperplane signature
    * is within hamming distance 1 of the query's (multi-probe), then
    * exact cosine top-k inside the candidate set. At scale the signature
    * is a bucketing/partition key, so a query touches only its probe
    * buckets instead of the full corpus.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryVecId: Long, k: Int, planes: Int, seed: Int = 42): DataFrame = {
    val withSig = df
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), planes, seed))
    val q = withSig.filter(col(idCol) === queryVecId)
      .select(col("v").as("qv"), col("sig").as("qsig"))
    withSig.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= 1)
      .select(col(idCol), round(cosine(col("v"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
