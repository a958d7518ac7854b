package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak measurement for streaming-curation self-maintenance
  * (`compact_every`): run a few hundred tiny micro-batches through the
  * `exact_dedup` streaming stage twice — compaction OFF then ON — and
  * print the index's data-file count and an at-rest probe's wall time
  * every `sample` batches, one JSON line each. The claim under test:
  * exactly-once writes leave one `batch=N` partition per micro-batch,
  * so without compaction BOTH curves grow linearly in batch count
  * (every probe pays listing + footer-open costs on every historical
  * file); with `compact_every` both stay flat. Results are recorded in
  * PERFORMANCE.md (round 15).
  *
  * Usage: `runMain graft.SoakCompact [batches] [compactEvery] [sample]`
  * Output lines: `{"arm":"off|on","batch":N,"files":F,"probe_ms":P}`
  */
object SoakCompact {

  private def dataFiles(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(q: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(q).map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else 1L
      }.sum
    if (fs.exists(p)) walk(p) else 0L
  }

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(150)
    val every = args.lift(1).map(_.toInt).getOrElse(20)
    val sample = args.lift(2).map(_.toInt).getOrElse(25)
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
      val base = java.nio.file.Files.createTempDirectory(s"graft_soak_$arm")
        .toFile.getAbsolutePath
      val (src, out, ck, idx) =
        (s"$base/src", s"$base/out", s"$base/ck", s"$base/index")
      val compact =
        if (arm == "on") s", compact_every: \"$every\"" else ""
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
           |      - {op: exact_dedup, index_dir: $idx$compact}
           |""".stripMargin)
      import spark.implicits._
      for (i <- 0 until batches) {
        Seq((i.toLong, s"document $i"), (i.toLong + 1000000L, "the dup"))
          .toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(src)
        val q = PipelineRunner.startCuration(spark, config, "soak")
        q.processAllAvailable(); q.stop()
        if (i % sample == sample - 1 || i == batches - 1) {
          val files = dataFiles(spark, s"$idx/keys")
          // the probe shape every micro-batch pays: an as-of read of
          // the whole key index (listing + footers dominate at high
          // batch counts — exactly the cost compaction bounds)
          val t0 = System.nanoTime()
          spark.read.parquet(s"$idx/keys")
            .filter(col("batch") < lit(batches.toLong)).count()
          val probeMs = (System.nanoTime() - t0) / 1e6
          println(s"""{"arm":"$arm","batch":$i,"files":$files,""" +
            s""""probe_ms":${math.round(probeMs)}}""")
        }
      }
    }
    runArm("off")
    runArm("on")
    spark.stop()
  }
}
