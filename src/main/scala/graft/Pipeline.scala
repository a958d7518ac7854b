package graft

import org.apache.spark.sql.SparkSession

import graft.etl.{PipelineConfig, PipelineRunner}

/** CLI entry point — `nmetl` parity (/root/reference/packages/pycypher/
  * src/pycypher/cli/pipeline.py): run / validate / list-queries over a
  * YAML pipeline.
  *
  *   sbt "runMain graft.Pipeline run path/to/pipeline.yaml"
  *   sbt "runMain graft.Pipeline validate path/to/pipeline.yaml"
  *   sbt "runMain graft.Pipeline list-queries path/to/pipeline.yaml"
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.Pipeline <run|validate|list-queries> <pipeline.yaml>"
    if (args.length != 2) { System.err.println(usage); sys.exit(2) }
    val Array(cmd, path) = args
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val config = PipelineConfig.parse(yaml)

    cmd match {
      case "list-queries" =>
        config.queries.foreach(q =>
          println(s"${q.id}: ${q.description.getOrElse(q.cypher.linesIterator.next())}"))
      case "validate" | "run" =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName(s"graft-pipeline-${config.name}")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try {
          val problems = PipelineRunner.validate(spark, config)
          if (problems.nonEmpty) {
            problems.foreach(p => System.err.println(s"[invalid] $p"))
            if (cmd == "validate") sys.exit(1) else sys.exit(3)
          }
          if (cmd == "validate") println(s"pipeline '${config.name}' is valid")
          else {
            val result = PipelineRunner.run(spark, config)
            result.queries.foreach { case (id, df) =>
              println(s"[query] $id: ${df.columns.mkString(", ")}")
            }
            result.outputsWritten.foreach(u => println(s"[output] wrote $u"))
          }
        } finally spark.stop()
      case other =>
        System.err.println(s"unknown command: $other\n$usage"); sys.exit(2)
    }
  }
}
