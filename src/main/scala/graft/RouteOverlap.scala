package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantifies the simhash→minhash ROUTED-RELATION trade (r19 verdict
  * item 4): the candidate-budget router's two relations — fingerprint-
  * hamming pairs vs estimated-shingle-Jaccard pairs — are individually
  * oracled (dd03 / dd02+dd29), but an operator reading `route=minhash`
  * in a ledger needs to know what recall shift the route bought. On a
  * corpus where BOTH arms are feasible (sf1_div: raw simhash 113 s,
  * routed minhash ~13 s in r19's measurements), this computes, at the
  * router's wired parameters (maxHamming=6 vs shingle 3 / 64 hashes /
  * 16 bands / minEstJaccard 0.9):
  *
  *  - edge-set overlap of the two PAIR relations (normalized unordered
  *    pairs): Jaccard, precision and recall of routed-vs-raw;
  *  - SURVIVOR-set overlap after connected components + min-id
  *    canonicalization over each arm's thin edge graph — the number
  *    that matters operationally, since survivor selection is what the
  *    router routes.
  *
  * Emits ONE JSON line; recorded as artifacts/r20/route_overlap_sf1_div
  * .json and quoted in the README ledger documentation.
  */
object RouteOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_div")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Components, Dedup}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      times(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    def norm(df: DataFrame): DataFrame = df
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .distinct()

    // the two PAIR relations at the router's wired parameters
    val raw = timed("raw_simhash_pairs")(
      norm(Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6)
        .select(col("id1"), col("id2"))).localCheckpoint())
    val routed = timed("routed_minhash_pairs")(
      norm(Dedup.minHashLshPairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 64, bands = 16)
        .filter(col("est_jaccard") >= 0.9)
        .select(col("id1"), col("id2"))).localCheckpoint())
    val nRaw = raw.count()
    val nRouted = routed.count()
    val nInter = raw.join(routed, Seq("a", "b"), "left_semi").count()
    val union = nRaw + nRouted - nInter

    // survivor sets: components over each arm's THIN edge graph,
    // survivors = docs that are their component's min id (plus
    // singletons)
    def survivors(edges: DataFrame): DataFrame = {
      val dropped = Components
        .connectedComponents(edges.select(col("id1"), col("id2")),
          "id1", "id2")
        .filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      docs.select(col("doc_id")).join(dropped, Seq("doc_id"), "left_anti")
    }
    val sRaw = timed("raw_survivors")(
      survivors(Dedup.simHashDedupEdges(docs, "doc_id", "text",
        maxHamming = 6)).localCheckpoint())
    val sRouted = timed("routed_survivors")(
      survivors(Dedup.minHashLshDedupEdges(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16,
        minEstJaccard = 0.9)).localCheckpoint())
    val nSRaw = sRaw.count()
    val nSRouted = sRouted.count()
    val nSInter = sRaw.join(sRouted, Seq("doc_id"), "left_semi").count()
    val sUnion = nSRaw + nSRouted - nSInter

    def r4(x: Double): Double = math.rint(x * 10000) / 10000.0
    val json =
      s"""{"sf_dir":"$sfDir","raw_pairs":$nRaw,"routed_pairs":$nRouted,""" +
      s""""pair_intersection":$nInter,""" +
      s""""pair_jaccard":${r4(nInter.toDouble / math.max(1L, union))},""" +
      s""""pair_precision":${r4(nInter.toDouble / math.max(1L, nRouted))},""" +
      s""""pair_recall":${r4(nInter.toDouble / math.max(1L, nRaw))},""" +
      s""""raw_survivors":$nSRaw,"routed_survivors":$nSRouted,""" +
      s""""survivor_intersection":$nSInter,""" +
      s""""survivor_jaccard":${r4(nSInter.toDouble / math.max(1L, sUnion))},""" +
      s""""secs":{${times.map { case (k, v) =>
        s""""$k":${f"$v%.2f"}""" }.mkString(",")}}}"""
    println(json)
    spark.stop()
  }
}
