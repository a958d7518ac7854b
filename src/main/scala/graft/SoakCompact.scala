package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak measurement for streaming-curation self-maintenance
  * (`compact_every`): run a few hundred tiny micro-batches through a
  * streaming dedup stage twice — compaction OFF then ON — and print
  * the index's data-file count and an at-rest probe's wall time every
  * `sample` batches, one JSON line each. The claim under test:
  * exactly-once writes leave one `batch=N` partition per micro-batch,
  * so without compaction BOTH curves grow linearly in batch count
  * (every probe pays listing + footer-open costs on every historical
  * file); with `compact_every` both stay flat. Results are recorded in
  * PERFORMANCE.md (rounds 15-16).
  *
  * Three stages (round 16 extended past exact — the fuzzy and vector
  * indexes write MULTIPLES of exact's per-batch file count, so their
  * un-compacted curves grow steeper):
  *   - `exact`: exact_dedup — `keys/batch=N` (one component)
  *   - `fuzzy`: fuzzy_dedup forced onto the MINHASH tier
  *     (max_mean_key_len 8) — `sketch/bands/batch=N/band=B` (32 band
  *     dirs per batch) + `sketch/_sigs/batch=N`
  *   - `semantic`: semantic_dedup — `vecs/batch=N/__bucket=B` + a
  *     `drift_every` watchdog ledger
  *
  * Usage: `runMain graft.SoakCompact [batches] [compactEvery] [sample]
  * [stage]` with stage in {exact, fuzzy, semantic} (default exact).
  * Output lines: `{"arm":"off|on","stage":S,"batch":N,"files":F,
  * "probe_ms":P}`
  */
object SoakCompact {

  private def dataFiles(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden = underscore/dot prefix WITHOUT an `=` (Spark's discovery
    // rule — `__bucket=4` partition dirs are data, the
    // BatchCompaction.dataFileCount fix)
    def walk(q: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(q).map { st =>
        val n = st.getPath.getName
        if ((n.startsWith("_") || n.startsWith(".")) && !n.contains("=")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else 1L
      }.sum
    if (fs.exists(p)) walk(p) else 0L
  }

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(150)
    val every = args.lift(1).map(_.toInt).getOrElse(20)
    val sample = args.lift(2).map(_.toInt).getOrElse(25)
    val stage = args.lift(3).getOrElse("exact")
    require(Seq("exact", "fuzzy", "semantic").contains(stage),
      s"stage must be exact|fuzzy|semantic, got $stage")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // small shuffle width: keeps the per-batch file count (and the
      // soak's wall time) modest without changing the growth SHAPE —
      // a real crawl writes shuffle.partitions files per batch too
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.etl.{PipelineConfig, PipelineRunner}

    def runArm(arm: String): Unit = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_soak_${stage}_$arm")
        .toFile.getAbsolutePath
      val (src, out, ck, idx) =
        (s"$base/src", s"$base/out", s"$base/ck", s"$base/index")
      val compact =
        if (arm == "on") s", compact_every: \"$every\"" else ""
      // per-stage wiring: schema, the stage YAML line, and the at-rest
      // component whose file count and probe cost the soak samples
      val (schema, stageYaml, probeDir) = stage match {
        case "fuzzy" =>
          ("doc_id LONG, text STRING",
            s"""- {op: fuzzy_dedup, index_dir: $idx,
               |         max_mean_key_len: "8"$compact}""".stripMargin,
            s"$idx/sketch/bands")
        case "semantic" =>
          ("doc_id LONG, text STRING, emb ARRAY<DOUBLE>",
            s"""- {op: semantic_dedup, index_dir: $idx, vec_col: emb,
               |         tau: "0.9999", nlist: "4", drift_every: "10",
               |         drift_dir: $base/drift$compact}""".stripMargin,
            s"$idx/vecs")
        case _ =>
          ("doc_id LONG, text STRING",
            s"- {op: exact_dedup, index_dir: $idx$compact}",
            s"$idx/keys")
      }
      val config = PipelineConfig.parse(
        s"""project: {name: soak}
           |curation:
           |  - id: soak
           |    input: $src
           |    streaming: true
           |    checkpoint: $ck
           |    output: $out
           |    schema: "$schema"
           |    stages:
           |      $stageYaml
           |""".stripMargin)
      import spark.implicits._
      for (i <- 0 until batches) {
        // one fresh doc + one constant dup per batch; the semantic arm
        // walks the unit circle in 0.1 rad steps — at tau 0.9999
        // (admit iff below it; threshold angle ~0.014 rad) every step
        // AND every wrap-around offset (0.018 rad at i=63) stays a
        // fresh admit for 150 batches, so the OFF curve keeps growing
        // instead of plateauing at the first wrap;
        // the fuzzy arm's fresh keys must be PAIRWISE far in edit
        // distance (plain "document $i" keys are all within dist 1 of
        // "document 0", so nothing past batch 0 would ever admit)
        val df = stage match {
          case "semantic" =>
            Seq((i.toLong, s"document $i",
                Seq(math.cos(i * 0.1), math.sin(i * 0.1))),
              (i.toLong + 1000000L, "the dup", Seq(1.0, 0.0)))
              .toDF("doc_id", "text", "emb")
          case "fuzzy" =>
            Seq((i.toLong, s"record $i key ${i * 31} tag ${i * 17}"),
              (i.toLong + 1000000L, "the constant duplicated entry"))
              .toDF("doc_id", "text")
          case _ =>
            Seq((i.toLong, s"document $i"), (i.toLong + 1000000L, "the dup"))
              .toDF("doc_id", "text")
        }
        df.coalesce(1).write.mode("append").parquet(src)
        val q = PipelineRunner.startCuration(spark, config, "soak")
        q.processAllAvailable(); q.stop()
        if (i % sample == sample - 1 || i == batches - 1) {
          val files = dataFiles(spark, probeDir)
          // the probe shape every micro-batch pays: an as-of read of
          // the whole at-rest component (listing + footers dominate at
          // high batch counts — exactly the cost compaction bounds)
          val t0 = System.nanoTime()
          spark.read.parquet(probeDir)
            .filter(col("batch") < lit(batches.toLong)).count()
          val probeMs = (System.nanoTime() - t0) / 1e6
          println(s"""{"arm":"$arm","stage":"$stage","batch":$i,""" +
            s""""files":$files,"probe_ms":${math.round(probeMs)}}""")
        }
      }
    }
    runArm("off")
    runArm("on")
    spark.stop()
  }
}
