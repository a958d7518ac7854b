package graft

import org.apache.spark.sql.SparkSession

/** Measures full-vs-sampled BPE merge-table agreement (VERDICT r17
  * item 6): the budget guard in [[graft.operators.Bpe.trainWithLedger]]
  * routes web-scale trains to the md5-sampled arm on the convergence
  * argument; this harness turns that citation into a measured number by
  * training sampleSixteenths = 16 (full) vs 8 vs 4 on the same corpus
  * and comparing the learned merge tables:
  *
  *   - `overlap@k`: |top-k merge sets ∩| / k as UNORDERED (left, right)
  *     pairs, for k in {16, 32, 64, all} — "does the sample learn the
  *     same vocabulary", the metric that matters for encode quality;
  *   - `first_divergence`: the first rank where the ORDERED tables
  *     disagree (merges.size + 1 when they never do) — how deep the
  *     exact greedy order survives sampling (ties and near-tie counts
  *     reorder early under sampling even when the learned set matches).
  *
  * Run (after ScaleData builds the corpus):
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_full \
  *     sbt "runMain graft.BpeAgreement" → one JSON line, recorded under
  *   artifacts/r18/ and adjudicated in PERFORMANCE.md.
  */
object BpeAgreement {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val numMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "128").toInt
    // r18 verdict item 6: the 128-merge run hit the minPairCount floor
    // at 102 merges — the deep-convergence run (1k+ merges, where real
    // tokenizers live) needs the floor at 1
    val minPair = sys.env.getOrElse("SPARK_GRAFT_BPE_MINPAIR", "2").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Bpe
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def trained(sx: Int): (Seq[Bpe.Merge], Double) = {
      val t0 = System.nanoTime()
      val m = Bpe.train(docs, "text", numMerges = numMerges,
        minPairCount = minPair, sampleSixteenths = sx)
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val (full, tFull) = trained(16)
    val (half, tHalf) = trained(8)
    val (quarter, tQuarter) = trained(4)

    def key(m: Bpe.Merge): (String, String) = (m.left, m.right)
    def overlapAt(a: Seq[Bpe.Merge], b: Seq[Bpe.Merge], k: Int): Double = {
      val kk = math.min(k, math.min(a.size, b.size))
      if (kk == 0) 1.0
      else (a.take(kk).map(key).toSet
        .intersect(b.take(kk).map(key).toSet)).size.toDouble / kk
    }
    def firstDivergence(a: Seq[Bpe.Merge], b: Seq[Bpe.Merge]): Int =
      a.zip(b).indexWhere { case (x, y) => key(x) != key(y) } match {
        case -1 => math.min(a.size, b.size) + 1
        case i  => i + 1
      }
    def block(name: String, s: Seq[Bpe.Merge], t: Double): String =
      s""""$name":{"learned":${s.size},"secs":${f"$t%.1f"},""" +
        s""""overlap16":${overlapAt(full, s, 16)},""" +
        s""""overlap32":${overlapAt(full, s, 32)},""" +
        s""""overlap64":${overlapAt(full, s, 64)},""" +
        s""""overlap256":${f"${overlapAt(full, s, 256)}%.4f"},""" +
        s""""overlap512":${f"${overlapAt(full, s, 512)}%.4f"},""" +
        s""""overlap_all":${f"${overlapAt(full, s, numMerges)}%.4f"},""" +
        s""""first_divergence":${firstDivergence(full, s)}}"""
    println(s"""{"sf_dir":"$sfDir","num_merges":$numMerges,"min_pair_count":$minPair,""" +
      s""""full":{"learned":${full.size},"secs":${f"$tFull%.1f"}},""" +
      s"${block("half_sample", half, tHalf)}," +
      s"${block("quarter_sample", quarter, tQuarter)}}")
    spark.stop()
  }
}
