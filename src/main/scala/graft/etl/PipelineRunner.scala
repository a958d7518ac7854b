package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.CypherEngine
import graft.model.GraphCatalog
import graft.parser.CypherAst._

/** YAML-configured ETL pipeline runner — the Spark counterpart of
  * `nmetl run` (/root/reference/packages/pycypher/src/pycypher/cli/
  * pipeline.py:653-914): load sources → register graph → run queries in
  * dependency order → write sinks. The reference's DuckDB "streaming
  * fast path" (:499-652) disappears: Spark is lazy end-to-end, so every
  * pipeline is file→transform→sink with no intermediate materialization
  * unless a query mutates the graph.
  */
object PipelineRunner {

  final case class RunResult(queries: Map[String, DataFrame],
                             outputsWritten: Seq[String])

  // ---------------- sources (SURVEY §2.1: FileDataSource re-expressed) ----------------

  /** SQL-scheme URIs the reference's data_source_from_uri dispatches to
    * SqlDataSource (ingestion/data_sources.py:24-25, 56, 874-875).
    */
  private val SqlSchemes =
    Set("postgresql", "postgres", "mysql", "sqlite", "duckdb", "derby")

  /** URI-dispatch reader: csv / parquet / json(-lines) by extension,
    * file:// or bare path (s3a:// etc. pass straight to Hadoop FS);
    * SQL-scheme / jdbc: URIs go through the JDBC reader. Optional
    * `query` runs ANSI SQL over a temp view named `source` (files) or
    * inside the source database (JDBC); schema hints cast columns
    * after load.
    */
  def readSource(spark: SparkSession, uri: String,
                 query: Option[String] = None,
                 schemaHints: Map[String, String] = Map.empty): DataFrame = {
    if (uri.startsWith("jdbc:") || SqlSchemes(uri.takeWhile(_ != ':')))
      return readJdbc(spark, uri, query, schemaHints)
    val path = uri.stripPrefix("file://")
    val lower = path.toLowerCase
    var df =
      if (lower.endsWith(".csv") || lower.endsWith(".csv.gz"))
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("sep", detectDelimiter(spark, path)).csv(path)
      else if (lower.endsWith(".parquet")) spark.read.parquet(path)
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl") ||
        lower.endsWith(".ndjson")) spark.read.json(path)
      else if (lower.endsWith(".orc")) spark.read.orc(path)
      // raw-text corpora (the canonical LLM-pipeline ingest): one row
      // per line in a single `value` column; shape with `query`
      else if (lower.endsWith(".txt") || lower.endsWith(".text"))
        spark.read.text(path)
      else throw new IllegalArgumentException(s"unsupported source format: $uri")
    schemaHints.foreach { case (c, t) =>
      df = df.withColumn(c, df(c).cast(sqlTypeName(t)))
    }
    query match {
      case Some(q) =>
        df.createOrReplaceTempView("source")
        spark.sql(q)
      case None => df
    }
  }

  /** SqlDataSource parity (reference ingestion/data_sources.py:700-910):
    * `query` executes INSIDE the source database via Spark's JDBC
    * `query` option — full computation pushdown, exactly like the
    * reference running its SQL on the caller's connection. Without a
    * query, a `#table` URI fragment reads the whole table via
    * `dbtable`, which is also the seam for partitioned parallel reads
    * (partitionColumn/lowerBound/upperBound) on a cluster. Exercised
    * offline against embedded Derby (on Spark's own classpath) in
    * PipelineSpec; network databases only need their driver jar.
    */
  private def readJdbc(spark: SparkSession, uri: String,
                       query: Option[String],
                       schemaHints: Map[String, String]): DataFrame = {
    val (base0, fragPart) = uri.span(_ != '#')
    val frag = fragPart.stripPrefix("#")
    val url0 = if (base0.startsWith("jdbc:")) base0 else s"jdbc:$base0"
    val url = url0.replaceFirst("^jdbc:postgres:", "jdbc:postgresql:")
    var reader = spark.read.format("jdbc").option("url", url)
    if (url.startsWith("jdbc:derby:"))
      reader = reader.option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    reader = query match {
      case Some(q)               => reader.option("query", q)
      case None if frag.nonEmpty => reader.option("dbtable", frag)
      case None => throw new IllegalArgumentException(
        s"sql source $uri needs a `query` or a #table fragment")
    }
    var df = reader.load()
    schemaHints.foreach { case (c, t) =>
      df = df.withColumn(c, df(c).cast(sqlTypeName(t)))
    }
    df
  }

  /** Delimiter inference for csv (the reference accepts `|`-delimited
    * fixtures — ingestion/data_sources.py format options).
    */
  private def detectDelimiter(spark: SparkSession, path: String): String = {
    val head = spark.read.text(path).limit(1).collect()
      .headOption.map(_.getString(0)).getOrElse("")
    Seq("|", "\t", ";", ",").find(d => head.contains(d)).getOrElse(",")
  }

  private def sqlTypeName(t: String): String = t.toUpperCase match {
    case "INTEGER" | "INT" | "INT4"  => "int"
    case "BIGINT" | "INT8" | "LONG"  => "bigint"
    case "DOUBLE" | "FLOAT8" | "REAL" => "double"
    case "VARCHAR" | "TEXT" | "STRING" => "string"
    case "BOOLEAN" | "BOOL" => "boolean"
    case "DATE" => "date"
    case "TIMESTAMP" => "timestamp"
    case other => other.toLowerCase
  }

  /** File sink (SURVEY §2.1 output_writer parity). */
  def writeSink(df: DataFrame, uri: String, format: Option[String]): Unit = {
    val path = uri.stripPrefix("file://")
    val fmt = format.getOrElse {
      val lower = path.toLowerCase
      if (lower.endsWith(".csv")) "csv"
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl")) "json"
      else if (lower.endsWith(".orc")) "orc"
      else "parquet"
    }
    fmt match {
      case "csv"     => df.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(path)
      case "json"    => df.coalesce(1).write.mode("overwrite").json(path)
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "orc"     => df.write.mode("overwrite").orc(path)
      case other     => throw new IllegalArgumentException(s"unsupported sink format: $other")
    }
  }

  // ---------------- dependency ordering (SURVEY §2.12) ----------------

  /** produces/consumes analysis per query: labels minted by
    * CREATE/MERGE vs labels read by MATCH; topological order so a query
    * that reads a label runs after the query that creates it (reference:
    * multi_query_analyzer.py, cli/pipeline.py:227-283).
    */
  private[etl] def dependencyOrder(engine: CypherEngine,
                                   queries: Seq[QueryDef]): Seq[QueryDef] = {
    def labelsOf(q: QueryDef): (Set[String], Set[String]) = {
      val ast = engine.parse(q.cypher)
      var produces = Set.empty[String]
      var consumes = Set.empty[String]
      def pathLabels(p: PathPattern): Seq[String] =
        p.start.labels ++ p.hops.flatMap(_._2.labels)
      ast.statements.foreach(_.clauses.foreach {
        case m: Match  => consumes ++= m.paths.flatMap(pathLabels)
        case c: Create => produces ++= c.paths.flatMap(pathLabels)
        case mg: Merge => produces ++= pathLabels(mg.path)
        case _ =>
      })
      (produces, consumes -- produces)
    }
    val info = queries.map(q => q.id -> labelsOf(q)).toMap
    val existing = engine.catalog.labels.toSet
    // Kahn's algorithm over produced-label edges
    val remaining = scala.collection.mutable.LinkedHashSet(queries: _*)
    val available = scala.collection.mutable.Set(existing.toSeq: _*)
    val ordered = scala.collection.mutable.ArrayBuffer.empty[QueryDef]
    var progress = true
    while (remaining.nonEmpty && progress) {
      progress = false
      remaining.toSeq.foreach { q =>
        val (produces, consumes) = info(q.id)
        val producedElsewhere = remaining.exists(r =>
          r.id != q.id && info(r.id)._1.intersect(consumes).nonEmpty)
        if (consumes.forall(available.contains) || !producedElsewhere) {
          ordered += q
          available ++= produces
          remaining -= q
          progress = true
        }
      }
    }
    ordered ++= remaining // cycles: keep config order
    ordered.toSeq
  }

  // ---------------- run / validate ----------------

  def run(spark: SparkSession, config: PipelineConfig): RunResult = {
    // Query audit by default when the config names a sink
    // (project.audit_uri): every ETL run leaves a queryable parquet
    // artifact of what executed — per-action wall time, rows, shuffle
    // bytes and plan hashes from the listener, plus one caller-timed
    // row per sink write labeled with its pipeline query id (the write
    // command's QueryExecution is a fresh object, so identity-keyed
    // labels cannot correlate it; the runner times it instead).
    // Reference analog: the Star lifecycle's audit log + metrics
    // recording (star.py:833-896) along the nmetl pipeline path.
    val audit = config.auditUri.map(_ => new graft.ops.QueryAudit(spark).attach())
    try runAudited(spark, config, audit)
    finally audit.foreach { a =>
      // flush in finally, not on the success path: the audit artifact
      // matters MOST when the run dies mid-pipeline (the failure row
      // and everything that executed before it must survive). Drain
      // the async listener bus first so the last action's record is in
      // the buffer; telemetry failures never mask the run's outcome.
      try {
        config.auditUri.foreach { uri =>
          org.apache.spark.sql.graftshim.ListenerBridge.waitUntilEmpty(spark, 10000L)
          a.flushTo(uri, partitionByDay = config.auditDaily)
        }
      } catch {
        // an unwritable audit sink must not replace the pipeline's real
        // outcome (an exception thrown from a finally block would) —
        // telemetry IO failures are reported, never propagated
        case e: Throwable =>
          System.err.println(s"[pipeline] audit flush failed: ${e.getMessage}")
      } finally a.detach()
    }
  }

  private def runAudited(spark: SparkSession, config: PipelineConfig,
                         audit: Option[graft.ops.QueryAudit]): RunResult = {
    val catalog = new GraphCatalog
    config.entities.foreach { e =>
      try {
        val df = readSource(spark, e.uri, e.query, e.schemaHints)
        catalog.addEntity(e.entityType, df, e.idCol)
      } catch {
        case ex: Exception if e.onError != "fail" =>
          if (e.onError == "warn")
            System.err.println(s"[pipeline] source ${e.id} failed: ${ex.getMessage}")
      }
    }
    config.relationships.foreach { r =>
      try {
        val df = readSource(spark, r.uri)
        catalog.addRelationship(r.relationshipType, df, r.sourceCol, r.targetCol, r.idCol)
      } catch {
        case ex: Exception if r.onError != "fail" =>
          if (r.onError == "warn")
            System.err.println(s"[pipeline] source ${r.id} failed: ${ex.getMessage}")
      }
    }
    val engine = new CypherEngine(spark, catalog)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    dependencyOrder(engine, config.queries).foreach { q =>
      results(q.id) = graft.ops.QueryAudit.label(engine.execute(q.cypher), q.id)
    }
    // curation pipelines (gate → dedup → budget from YAML): input is a
    // source URI or an earlier result id (a query's frame or a prior
    // curation pipeline — declaration order is execution order), and
    // the curated frame joins the results map so `output:` entries can
    // reference it like any query id
    // streaming pipelines don't run in the batch pass — they are
    // long-lived queries started explicitly via `startCuration`
    val curationWrites = config.curation.filterNot(_.streaming).map { c =>
      val input = results.getOrElse(c.input,
        readSource(spark, c.input))
      val curated = graft.ops.QueryAudit.label(
        CurationStages.run(spark, input, c), c.id)
      results(c.id) = curated
      c.outputUri.foreach { uri =>
        val t0 = System.nanoTime()
        try {
          writeSink(curated, uri, c.format)
          audit.foreach(_.record(c.id, s"sink:$uri", (System.nanoTime() - t0) / 1e6))
        } catch {
          case e: Throwable =>
            audit.foreach(_.record(c.id, s"sink:$uri",
              (System.nanoTime() - t0) / 1e6, status = "failure",
              error = String.valueOf(e.getMessage).take(500)))
            throw e
        }
      }
      c.outputUri
    }.flatten
    val written = curationWrites ++ config.outputs.map { o =>
      val df = results.getOrElse(o.queryId,
        throw new IllegalArgumentException(s"output references unknown query ${o.queryId}"))
      val t0 = System.nanoTime()
      try {
        writeSink(df, o.uri, o.format)
        audit.foreach(_.record(o.queryId, s"sink:${o.uri}", (System.nanoTime() - t0) / 1e6))
      } catch {
        case e: Throwable =>
          audit.foreach(_.record(o.queryId, s"sink:${o.uri}",
            (System.nanoTime() - t0) / 1e6, status = "failure",
            error = String.valueOf(e.getMessage).take(500)))
          throw e
      }
      o.uri
    }
    RunResult(results.toMap, written)
  }

  /** Start a `streaming: true` curation pipeline from the config as a
    * long-lived Structured Streaming query: the pipeline's `input:`
    * becomes a file-source stream (schema inferred from a batch read
    * of whatever already sits in the directory — file streams require
    * a declared schema), the stage list runs per micro-batch through
    * [[CurationStages.runStreaming]] (cross-batch dedup against the
    * stage's MinHash index-at-rest), survivors append to `output:`.
    * Give the pipeline a `checkpoint:` so offsets and exactly-once
    * accounting survive restarts — the dedup INDEX survives either
    * way, it is at-rest parquet.
    */
  def startCuration(spark: SparkSession, config: PipelineConfig,
                    id: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val c = config.curation.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown curation pipeline: $id"))
    require(c.streaming,
      s"curation pipeline $id is batch (streaming: true to stream it)")
    // a crawl input is a directory (no extension for readSource's
    // dispatch to key on) — resolve the format from `format:` or the
    // path, then take the schema the file stream requires from the
    // pipeline's explicit `schema:` DDL, or batch-read the directory
    // once to infer it. Explicit DDL is the production posture: it
    // works before the first file lands, and CSV inference from the
    // initial files can mis-type columns relative to later ones.
    val fmt = c.format.getOrElse(inferFormat(c.input))
    val schema = c.schemaDdl match {
      case Some(ddl) => org.apache.spark.sql.types.StructType.fromDDL(ddl)
      case None =>
        val inferred =
          try spark.read.format(fmt)
            .option("header", "true").option("inferSchema", "true")
            .load(c.input).schema
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"curation pipeline $id: cannot infer the stream schema " +
                  s"from '${c.input}' (missing or empty at start). Either " +
                  "declare it in the YAML — schema: \"doc_id LONG, text " +
                  "STRING\" — or create the directory with at least one " +
                  "file before starting.", e)
          }
        if (inferred.isEmpty) throw new IllegalArgumentException(
          s"curation pipeline $id: inferred an empty schema from " +
            s"'${c.input}'; declare schema: \"...\" in the YAML instead")
        inferred
    }
    val stream = spark.readStream.schema(schema)
      .format(fmt).option("header", "true").load(c.input)
    CurationStages.runStreaming(spark, stream, c).start()
  }

  private def inferFormat(uri: String): String = {
    val clean = uri.stripSuffix("/")
    if (clean.endsWith(".csv")) "csv"
    else if (clean.endsWith(".json") || clean.endsWith(".jsonl")) "json"
    else "parquet"
  }

  /** Every (sourceId, frame) the config declares, loaded lazily —
    * schema inspection only, nothing is executed.
    */
  private def sourceFrames(spark: SparkSession, config: PipelineConfig)
  : Seq[(String, DataFrame)] =
    config.entities.map(e =>
      e.id -> readSource(spark, e.uri, e.query, e.schemaHints)) ++
      config.relationships.map(r => r.id -> readSource(spark, r.uri))

  /** Snapshot every source's current schema into the baseline dir
    * (run once after a known-good pipeline run; each call appends a new
    * lineage version). Returns (sourceId, version).
    */
  def snapshotSchemas(spark: SparkSession, config: PipelineConfig,
                      baselineDir: String): Seq[(String, Int)] =
    sourceFrames(spark, config).map { case (id, df) =>
      id -> SchemaEvolution.snapshot(baselineDir, id, df.schema)
    }

  /** Structured drift report per source vs the stored baseline —
    * `nmetl validate` extended with the reference's schema-evolution
    * subsystem (drift detection + compatibility verdict; see
    * SchemaEvolution).
    */
  def driftReports(spark: SparkSession, config: PipelineConfig,
                   baselineDir: String): Seq[SchemaEvolution.DriftReport] =
    sourceFrames(spark, config).map { case (id, df) =>
      SchemaEvolution.check(baselineDir, id, df.schema)
    }

  /** Dry-run validation (`nmetl validate` parity): parse every query,
    * check source files exist, check output references; with a schema
    * baseline, additionally surface BREAKING schema drift per source
    * (compatible/widening evolution passes — the engine can still read).
    * Returns the list of problems (empty = valid).
    */
  def validate(spark: SparkSession, config: PipelineConfig,
               schemaBaseline: Option[String] = None): Seq[String] = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    schemaBaseline.foreach { base =>
      driftReports(spark, config, base).filter(_.verdict == "breaking").foreach { r =>
        val det = r.breaking.map(d =>
          s"${d.column} ${d.kind}" +
            d.before.map(b => s" (was $b${d.after.fold("")(a => s", now $a")})")
              .getOrElse("")).mkString("; ")
        problems += s"source ${r.sourceId}: breaking schema drift vs v${r.baselineVersion}: $det"
      }
    }
    (config.entities.map(e => (e.id, e.uri)) ++
      config.relationships.map(r => (r.id, r.uri))).foreach { case (id, uri) =>
      val p = uri.stripPrefix("file://")
      val isSql = p.startsWith("jdbc:") || SqlSchemes(p.takeWhile(_ != ':'))
      if (!isSql && !p.contains("://") && !new java.io.File(p).exists())
        problems += s"source $id: file not found: $uri"
    }
    config.queries.foreach { q =>
      try graft.parser.CypherParser.parse(q.cypher)
      catch { case e: Exception => problems += s"query ${q.id}: ${e.getMessage}" }
    }
    val qids = config.queries.map(_.id).toSet
    config.outputs.foreach { o =>
      if (!qids.contains(o.queryId))
        problems += s"output ${o.uri}: unknown query_id ${o.queryId}"
    }
    problems.toSeq
  }
}
