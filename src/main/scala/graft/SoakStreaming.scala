package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STREAMING curation soak at scale (VERDICT r18 item 3): the sf10
  * batch soak (SoakCuration) proved composition adds no super-linear
  * term in BATCH form; this drives the STREAMING loop — the
  * exactly-once ledger path and the pin-flatness contract are spec'd
  * at toy size in StreamingSpec — over the sf1 ScaleData corpus sliced
  * into ~20 micro-batches, recording per batch:
  *
  *   - wall seconds (start + processAllAvailable + stop around each
  *     slice — the restart-per-slice driver the StreamingSpec arms
  *     use, so batch boundaries are deterministic; the ~1-2 s stream
  *     startup is a constant term, and FLATNESS across batches is the
  *     metric, not the absolute),
  *   - pinned-RDD count after the batch (sc.getPersistentRDDs — the
  *     loop must free its own pins; growth here is the block-manager
  *     retention the IterPin discipline exists to prevent),
  *   - cumulative output rows and fuzzy-router ledger rows.
  *
  * Pipeline: minhash_dedup against an index-at-rest (index_dir +
  * compact_every 8, so the self-maintenance path runs inside the soak
  * — expect wall SPIKES at compaction batches, adjudicated, not
  * hidden) followed by a ledgered fuzzy_dedup fall-through
  * (ledger_dir + sticky_tier, one audit row per batch).
  *
  * REPLAY INJECTION: after the batch indexed `SPARK_GRAFT_SOAK_REPLAY`
  * (default 10) commits, its checkpoint commit marker is deleted and
  * the stream restarted with NO new input — Structured Streaming
  * re-runs exactly that batch from its recorded offsets. Output rows,
  * index admissions, and ledger row counts must be IDENTICAL before
  * and after (the exactly-once contract at soak scale); both counts
  * are recorded in the JSON line.
  *
  * Run (after ScaleData builds the corpus):
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_full \
  *     sbt "runMain graft.SoakStreaming" → one JSON line, recorded
  *   under artifacts/r19/ and adjudicated in PERFORMANCE.md.
  */
object SoakStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val work = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/graft_soak_str")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "20").toInt
    val replayAt = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPLAY", "10").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.etl.{PipelineConfig, PipelineRunner}
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(work))
    val src = s"$work/src"
    val out = s"$work/out"
    val ck = s"$work/ck"
    val idx = s"$work/index"
    val led = s"$work/fuzzy_ledger"
    new java.io.File(src).mkdirs()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val config = PipelineConfig.parse(
      s"""project: {name: soak}
         |curation:
         |  - id: soak
         |    input: $src
         |    streaming: true
         |    checkpoint: $ck
         |    output: $out
         |    schema: "doc_id LONG, text STRING"
         |    stages:
         |      - {op: minhash_dedup, index_dir: $idx, threshold: "0.8",
         |         compact_every: "8", compact_retain: "1"}
         |      - {op: fuzzy_dedup, max_dist: "1", ledger_dir: $led,
         |         sticky_tier: "true"}
         |""".stripMargin)

    def countDir(dir: String): Long =
      if (!new java.io.File(dir).exists()) 0L
      else spark.read.parquet(dir).count()
    def runOnce(): Double = {
      val t0 = System.nanoTime()
      val q = PipelineRunner.startCuration(spark, config, "soak")
      q.processAllAvailable(); q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pins = scala.collection.mutable.ArrayBuffer.empty[Int]
    val outRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ledgerParts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val probeDirectMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val probeScanMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var replayBlock = ""
    (0 until nBatches).foreach { b =>
      docs.filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === b)
        .write.mode("append").parquet(src)
      val secs = runOnce()
      walls += secs
      pins += spark.sparkContext.getPersistentRDDs.size
      outRows += countDir(out)
      // CONTROL-PATH CREEP probes (r19 verdict items 2-3): the ledger
      // accrues one batch=<id> partition per micro-batch, so the
      // r19-era sticky probe (full-directory scan, filter batch < b)
      // pays an O(B) listing at batch B — O(B²) cumulative — while the
      // r20 probe reads the ONE known batch=<b-1> partition. Both are
      // timed against the same on-disk ledger every batch; the soak's
      // job is to expose the scan's growth term and the direct probe's
      // flatness over 100+ batches.
      ledgerParts += Option(new java.io.File(led).list())
        .map(_.count(_.startsWith("batch="))).getOrElse(0)
      val tD = System.nanoTime()
      val direct = graft.etl.CurationStages
        .stickyPriorTier(spark, led, b + 1)
      probeDirectMs += (System.nanoTime() - tD) / 1e6
      val tS = System.nanoTime()
      val scan = spark.read.parquet(led)
        .filter(col("batch").cast("long") >= 0 &&
          col("batch").cast("long") < b + 1)
        .orderBy(col("batch").cast("long").desc)
        .select(col("tier")).limit(1).collect().headOption
        .map(_.getString(0))
      probeScanMs += (System.nanoTime() - tS) / 1e6
      require(direct == scan,
        s"probe disagreement at batch $b: direct=$direct scan=$scan")
      println(f"[soak-streaming] batch $b: $secs%.1fs " +
        f"pins=${pins.last} out_rows=${outRows.last} " +
        f"ledger_rows=${countDir(led)} ledger_parts=${ledgerParts.last} " +
        f"probe_direct=${probeDirectMs.last}%.0fms " +
        f"probe_scan=${probeScanMs.last}%.0fms")
      if (b == replayAt) {
        // INJECTED REPLAY: drop the committed marker for this batch —
        // the restart finds offsets/<b> without commits/<b> and
        // re-runs exactly this micro-batch from its recorded offsets
        val preOut = countDir(out)
        val preLed = countDir(led)
        val preIdx = countDir(s"$idx/_sigs")
        val commit = new java.io.File(s"$ck/commits/$b")
        require(commit.exists(), s"no commit marker at $commit")
        commit.delete()
        // the local ChecksumFs keeps a CRC sidecar next to the marker;
        // leaving it behind fails the replayed batch's own commit
        // rename with FileAlreadyExistsException on the .crc
        new java.io.File(s"$ck/commits/.$b.crc").delete()
        val rSecs = runOnce()
        val postOut = countDir(out)
        val postLed = countDir(led)
        val postIdx = countDir(s"$idx/_sigs")
        val ok = preOut == postOut && preLed == postLed && preIdx == postIdx
        println(f"[soak-streaming] REPLAY of batch $b: $rSecs%.1fs " +
          s"out $preOut->$postOut ledger $preLed->$postLed " +
          s"index $preIdx->$postIdx exactly_once=$ok")
        replayBlock =
          s""""replay":{"batch":$b,"secs":${f"$rSecs%.1f"},""" +
            s""""out_before":$preOut,"out_after":$postOut,""" +
            s""""ledger_before":$preLed,"ledger_after":$postLed,""" +
            s""""index_before":$preIdx,"index_after":$postIdx,""" +
            s""""exactly_once":$ok},"""
      }
    }
    val inRows = spark.read.parquet(src).count()
    println(s"""{"sf_dir":"$sfDir","n_batches":$nBatches,""" +
      s""""rows_in":$inRows,"rows_out":${outRows.last},""" +
      s""""ledger_rows":${countDir(led)},$replayBlock""" +
      s""""walls":[${walls.map(w => f"$w%.1f").mkString(",")}],""" +
      s""""pins":[${pins.mkString(",")}],""" +
      s""""out_rows":[${outRows.mkString(",")}],""" +
      s""""ledger_parts":[${ledgerParts.mkString(",")}],""" +
      s""""probe_direct_ms":[${probeDirectMs.map(v => f"$v%.0f")
        .mkString(",")}],""" +
      s""""probe_scan_ms":[${probeScanMs.map(v => f"$v%.0f")
        .mkString(",")}]}""")
    spark.stop()
  }
}
