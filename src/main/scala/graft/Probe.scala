package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling/validation harness (like Scratch). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val qv = emb.filter(col("vec_id") === 0L)
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
        .head().getSeq[Double](0)

      val lshPath = s"/tmp/graft_probe/$sf/lsh"
      Similarity.lshIndexWrite(emb, "vec_id", "embedding", lshPath, planes = 8)
      val lsh = Similarity.lshIndexTopK(spark, lshPath, qv, 10,
        excludeId = Some(0L), idColName = "vec_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      println(s"[probe] $sf ann02(lshIndex)==brute: ${lsh == brute}  lsh=$lsh")

      val ivfPath = s"/tmp/graft_probe/$sf/ivf"
      Similarity.ivfIndexWrite(emb, "vec_id", "embedding", ivfPath, nlist = 16)
      val ivf = Similarity.ivfIndexTopK(spark, ivfPath, qv, 10, nprobe = 4,
        excludeId = Some(0L), idColName = "vec_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      println(s"[probe] $sf ann03(ivfIndex)==brute: ${ivf == brute}")
      val ivfOld = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
        nlist = 16, nprobe = 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      println(s"[probe] $sf ivfTopK==ivfIndexTopK: ${ivfOld == ivf}")

      // dd05 vs all-pairs exact cosine >= 0.4
      val dd05 = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4, planes = 6, tables = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val v = emb.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val allPairs = v.select(col("id").as("id1"), col("v").as("v1"))
        .join(v.select(col("id").as("id2"), col("v").as("v2")),
          col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(Similarity.cosine(col("v1"), col("v2")), 6).as("c"))
        .filter(col("c") >= 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] $sf dd05==allpairs: ${dd05 == allPairs} " +
        s"(dd05=${dd05.size} truth=${allPairs.size} missed=${(allPairs -- dd05).size})")

      // dd02 LSH candidates cover all exhaustive truth pairs?
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cand = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] $sf dd02 covers truth: ${truth.subsetOf(cand)} " +
        s"(truth=${truth.size} cand=${cand.size} missed=${(truth -- cand).size})")

      // dd03 finds every identical-fingerprint pair?
      val fp = docs.select(col("doc_id"), md5(lower(regexp_replace(trim(col("text")),
        "\\s+", " "))).as("fp"))
      val dupPairs = fp.select(col("fp"), col("doc_id").as("id1"))
        .join(fp.select(col("fp"), col("doc_id").as("id2")), Seq("fp"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dd03 = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] $sf dd03 covers exact dups: ${dupPairs.subsetOf(dd03)} " +
        s"(dups=${dupPairs.size} dd03=${dd03.size})")
    }
  }
}
