package graft.ops

import java.io.{BufferedReader, PrintWriter}
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

import graft.CypherEngine
import graft.etl.PipelineRunner

/** Interactive Cypher REPL — the Spark counterpart of the reference's
  * `repl.py:79-958` (CypherRepl over python `cmd`) and the query
  * rendering half of `_cli_query.py:26-205`. Same user surface: a
  * psql-style console with dot-commands for schema inspection and
  * session control, automatic per-query timing and row counts,
  * EXPLAIN/PROFILE prefixes, multi-line input terminated by `;`,
  * history with search, output formats, parameterized templates, batch
  * files, and mid-session `.load` of new sources.
  *
  * Architecture differences from the reference, all Spark-first:
  *   - runs over a pair of INJECTABLE streams (the CypherLsp pattern) —
  *     the interactive console is `run()` on stdin/stdout, and a spec
  *     drives the identical loop with a scripted session;
  *   - result display never materializes more than maxRows+1 rows on
  *     the driver (`df.limit(n+1).collect`, plus a distributed count
  *     only when the page overflows), where the reference collects the
  *     whole pandas frame — a 100M-row RETURN costs the REPL driver
  *     ~50 rows of memory;
  *   - EXPLAIN shows the Catalyst formatted physical plan + the
  *     complexity gate report (the engine's honest plan, where the
  *     reference prints its Lark AST: repl.py:309-356);
  *   - PROFILE delegates to [[QueryProfiler]] (per-operator SQL
  *     metrics; reference repl.py:357-387 times its clause interpreter);
  *   - tab completion is the pure `complete(text)` surface
  *     (dot-commands, keywords, functions, labels, `var.prop`),
  *     terminal-bound through jline 3 by [[JlineConsole]] when stdin
  *     is a real TTY (reference repl.py:869-947 binds the same list
  *     through readline); the stream loop stays dependency-free.
  */
final class CypherRepl(engine: CypherEngine, in: BufferedReader,
                       out: PrintWriter,
                       historyFile: Option[Path] = CypherRepl.defaultHistory) {

  import CypherRepl._

  private val history = scala.collection.mutable.ArrayBuffer.empty[String]
  private val templates = scala.collection.mutable.LinkedHashMap.empty[String, String]
  private val multiline = scala.collection.mutable.ArrayBuffer.empty[String]
  private var outputFormat = "table"
  private var queryCount = 0
  private var errorCount = 0
  private var totalMs = 0.0
  private var done = false
  // caller-recorded per-query audit (not a session listener — the REPL
  // owns exactly its own queries), feeding `.metrics`' baseline +
  // regression analytics through [[QueryAnalytics]]; graft-visible so
  // specs can feed synthetic history to the `.metrics` surface
  private[graft] val audit = new QueryAudit(engine.spark)

  private def echo(s: String = ""): Unit = { out.println(s); out.flush() }

  /** Read-eval-print loop over the injected streams until EOF/.quit. */
  def run(): Unit = runWith { prompt =>
    out.print(prompt)
    out.flush()
    Option(in.readLine())
  }

  /** The prompt for the next read — continuation form mid-statement. */
  private[ops] def promptText: String =
    if (multiline.nonEmpty) "    .> " else "cypher> "

  /** Abort any half-typed multi-line statement (Ctrl-C semantics):
    * clears the continuation buffer so the next empty line is a no-op
    * instead of executing the abandoned fragment. Returns whether
    * anything was discarded, so the caller can acknowledge the abort.
    */
  def discardPending(): Boolean = {
    val had = multiline.nonEmpty
    multiline.clear()
    had
  }

  /** The loop with an injectable line source (prompt → line, None =
    * EOF): the plain-stream console and the jline-bound terminal
    * ([[JlineConsole]]) drive the SAME dispatch/history/session state.
    */
  def runWith(readLine: String => Option[String]): Unit = {
    loadHistory()
    echo("graft Cypher shell\nType Cypher queries or .help for commands.  " +
      "End queries with ';' or press Enter.")
    while (!done) {
      readLine(promptText) match {
        case None       => done = true // EOF = Ctrl-D (repl.py:802)
        case Some(line) => handleLine(line)
      }
    }
    saveHistory()
  }

  /** One line of input — the dispatch the loop and specs share. */
  def handleLine(line: String): Unit = {
    val stripped = line.trim
    if (stripped.nonEmpty && multiline.isEmpty) history += stripped

    if (stripped.isEmpty && multiline.isEmpty) return

    if (stripped.startsWith(".") && multiline.isEmpty) { dotCommand(stripped); return }

    // accumulate multi-line input until a ';' terminator (repl.py:242-266).
    // Escape hatches while accumulating: an empty line executes what is
    // buffered (matching the banner's "or press Enter"), and .quit/.exit
    // still dispatch so a half-typed MATCH can't trap the session.
    if (multiline.nonEmpty) {
      if (stripped == ".quit" || stripped == ".exit") {
        multiline.clear(); dotCommand(stripped); return
      }
      if (stripped.isEmpty) {
        val q = multiline.mkString(" ").trim.stripSuffix(";").trim
        multiline.clear()
        if (q.nonEmpty) executeQuery(q)
        return
      }
      multiline += line
      if (stripped.endsWith(";")) {
        val q = multiline.mkString(" ").trim.stripSuffix(";").trim
        multiline.clear()
        if (q.nonEmpty) executeQuery(q)
      }
      return
    }
    if (!stripped.endsWith(";") && looksIncomplete(stripped)) {
      multiline += line
      return
    }
    val q = stripped.stripSuffix(";").trim
    if (q.nonEmpty) executeQuery(q)
  }

  // ----------------------------------------------------------------
  // query execution
  // ----------------------------------------------------------------

  private def executeQuery(query: String): Unit = {
    val upper = query.toUpperCase
    if (upper.startsWith("EXPLAIN ")) { explainQuery(query.drop(8).trim); return }
    if (upper.startsWith("PROFILE ")) { profileQuery(query.drop(8).trim); return }

    val t0 = System.nanoTime()
    val result =
      try {
        // one execution fetches maxRows+1; the separate distributed
        // count only runs when the result actually overflows the page,
        // so small results cost a single job and shown rows can never
        // disagree with the reported count for nondeterministic frames
        val df = engine.execute(query)
        val n = maxRows
        val fetched = df.limit(n + 1).collect()
        val total = if (fetched.length > n) df.count() else fetched.length.toLong
        Right((df, total, fetched.take(n)))
      } catch { case NonFatal(e) => Left(rootMessage(e)) }
    val ms = (System.nanoTime() - t0) / 1e6

    result match {
      case Left(msg) =>
        errorCount += 1
        echo(s"Error: $msg")
      case Right((df, total, shown)) =>
        queryCount += 1
        totalMs += ms
        audit.record(query, "repl", ms, total)
        displayResult(df, total, shown)
        echo(f"$total row(s)  ($ms%.1f ms)")
    }
  }

  private def explainQuery(query: String): Unit =
    try echo(engine.explain(query))
    catch { case NonFatal(e) => errorCount += 1; echo(s"Error: ${rootMessage(e)}") }

  private def profileQuery(query: String): Unit =
    try {
      val report = QueryProfiler.profile(engine, query)
      queryCount += 1
      totalMs += report.totalMs
      echo(report.render)
    } catch { case NonFatal(e) => errorCount += 1; echo(s"Error: ${rootMessage(e)}") }

  private def maxRows: Int =
    sys.env.get("GRAFT_REPL_MAX_ROWS").flatMap(_.toIntOption)
      .orElse(engine.spark.conf.getOption("graft.repl.maxRows").map(_.toInt))
      .getOrElse(50)

  private def displayResult(df: DataFrame, total: Long,
                            shown: Array[org.apache.spark.sql.Row]): Unit = {
    if (total == 0) { echo("(no rows returned)"); return }
    val cols = df.columns.toSeq
    outputFormat match {
      case "csv" =>
        echo(cols.map(csvCell).mkString(","))
        shown.foreach(r => echo(cols.indices.map(i => csvCell(fmtCell(r.get(i)))).mkString(",")))
      case "json" =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val arr = om.createArrayNode()
        shown.foreach { r =>
          val o = arr.addObject()
          cols.zipWithIndex.foreach { case (c, i) =>
            r.get(i) match {
              case null       => o.putNull(c)
              case b: Boolean => o.put(c, b)
              case n: Long    => o.put(c, n)
              case n: Int     => o.put(c, n)
              case n: Double  => o.put(c, n)
              case v          => o.put(c, fmtCell(v))
            }
          }
        }
        echo(om.writerWithDefaultPrettyPrinter().writeValueAsString(arr))
      case _ => // pipe-separated table, widths capped (_cli_query.py:42-113)
        val rows = shown.map(r => cols.indices.map(i => fmtCell(r.get(i))))
        val widths = cols.indices.map { i =>
          math.min(MaxCellWidth,
            math.max(cols(i).length, rows.map(_(i).length).maxOption.getOrElse(0)))
        }
        def fmtRow(cells: Seq[String]): String =
          cells.lazyZip(widths).map { (c, w) =>
            val t = if (c.length > w) c.take(math.max(1, w - 1)) + "…" else c
            t.padTo(w, ' ')
          }.mkString("| ", " | ", " |")
        echo(fmtRow(cols))
        echo(widths.map("-" * _).mkString("|-", "-|-", "-|"))
        rows.foreach(r => echo(fmtRow(r)))
    }
    if (total > shown.length)
      echo(s"... (${total - shown.length} more rows, set GRAFT_REPL_MAX_ROWS to show more)")
  }

  // ----------------------------------------------------------------
  // dot-commands (repl.py:388-806)
  // ----------------------------------------------------------------

  private def dotCommand(line: String): Unit = {
    val parts = line.drop(1).split("\\s+", 2)
    val cmd = parts.headOption.getOrElse("")
    val arg = if (parts.length > 1) parts(1).trim else ""
    cmd match {
      case "help"      => doHelp()
      case "schema"    => doSchema()
      case "tables"    => doTables()
      case "functions" => doFunctions()
      case "examples"  => doExamples()
      case "metrics"   => doMetrics()
      case "analytics" => doAnalytics(arg)
      case "catalog"   => doCatalog(arg)
      case "history"   => doHistory()
      case "search"    => doSearch(arg)
      case "format"    => doFormat(arg)
      case "template"  => doTemplate(arg)
      case "batch"     => doBatch(arg)
      case "load"      => doLoad(arg)
      case "clear"     => echo("[2J[H")
      case "quit" | "exit" => done = true
      case other =>
        val near = DotCommands.filter(editDistance(other, _) <= 2)
        if (near.nonEmpty)
          echo(s"Unknown command '.$other'. Did you mean: ${near.map("." + _).mkString(", ")}?")
        else echo(s"Unknown command '.$other'. Type .help for available commands.")
    }
  }

  private def doHelp(): Unit = echo(
    """
      |Commands:
      |  .help                  Show this help
      |  .load                  Load entity or relationship data sources
      |  .schema                Show loaded entity types and relationships
      |  .tables                Show entity and relationship table details
      |  .functions             List available Cypher functions
      |  .examples              Show query examples for loaded schema
      |  .metrics               Show session query metrics
      |  .analytics <report> <auditPath>  Analytics over an at-rest audit sink
      |  .catalog save|open|versions <dir>  Durable catalog snapshots
      |  .history               Show recent query history
      |  .search <keyword>      Search history for matching queries
      |  .format <table|csv|json>  Set output format
      |  .template save|list|run|delete  Manage query templates
      |  .batch <file>          Run queries from a file
      |  .clear                 Clear the screen
      |  .quit / .exit          Exit the REPL
      |
      |Query prefixes:
      |  EXPLAIN <query>  Show execution plan without running
      |  PROFILE <query>  Run with detailed timing breakdown
      |
      |End multi-line queries with ';'""".stripMargin)

  private def doSchema(): Unit = {
    val cat = engine.catalog
    if (cat.labels.isEmpty && cat.relTypes.isEmpty) { echo("No context loaded."); return }
    echo()
    echo("Entity types:")
    cat.labels.foreach { l =>
      val e = cat.entity(l)
      val props = e.df.columns.filterNot(_ == e.idCol)
      echo(s"  :$l  (${props.length} properties)")
      props.foreach(p => echo(s"    .$p"))
    }
    if (cat.relTypes.nonEmpty) {
      echo()
      echo("Relationship types:")
      cat.relTypes.foreach { t =>
        val r = cat.relationship(t)
        val meta = Set(r.srcCol, r.dstCol) ++ r.idCol
        val props = r.df.columns.filterNot(meta)
        echo(s"  [:$t]  (${r.srcLabel.getOrElse("?")})->(${r.dstLabel.getOrElse("?")})  " +
          s"(${props.length} properties)")
        props.foreach(p => echo(s"    .$p"))
      }
    }
    echo()
  }

  private def doTables(): Unit = {
    val cat = engine.catalog
    if (cat.labels.isEmpty && cat.relTypes.isEmpty) { echo("No context loaded."); return }
    echo()
    echo("Entity tables:")
    cat.labels.foreach { l =>
      val df = cat.entity(l).df
      echo(s"  $l: ${df.count()} rows, ${df.columns.length} cols")
    }
    if (cat.relTypes.nonEmpty) {
      echo()
      echo("Relationship tables:")
      cat.relTypes.foreach { t =>
        val df = cat.relationship(t).df
        echo(s"  $t: ${df.count()} rows, ${df.columns.length} cols")
      }
    }
    echo()
  }

  private def doFunctions(): Unit = {
    val fns = CypherLsp.FunctionDocs.keys.toSeq.sorted
    echo()
    echo(s"${fns.length} available functions:")
    fns.grouped(4).foreach(row =>
      echo("  " + row.map(f => f.padTo(20, ' ')).mkString("  ")))
    echo()
  }

  private def doExamples(): Unit = {
    val cat = engine.catalog
    echo()
    echo("Query Examples:")
    cat.labels.headOption match {
      case Some(e) =>
        val ent = cat.entity(e)
        val p = ent.df.columns.filterNot(_ == ent.idCol).headOption.getOrElse("name")
        echo(s"\n  -- Find all $e nodes\n  MATCH (n:$e) RETURN n.$p")
        echo(s"\n  -- Count $e nodes\n  MATCH (n:$e) RETURN count(n) AS total")
        echo(s"\n  -- Filter by property\n  MATCH (n:$e) WHERE n.$p IS NOT NULL RETURN n.$p")
        echo(s"\n  -- Create a new $e\n  CREATE (:$e {$p: 'value'})")
        cat.relTypes.headOption.foreach(r => echo(
          s"\n  -- Follow relationships\n  MATCH (n:$e)-[r:$r]->(m) RETURN n, r, m LIMIT 10"))
      case None =>
        echo("\n  -- Basic node query\n  MATCH (n:Label) RETURN n.property")
        echo("\n  -- Filter with WHERE\n  MATCH (n:Label) WHERE n.age > 30 RETURN n.name")
        echo("\n  -- Relationship traversal\n  MATCH (a)-[r:REL]->(b) RETURN a, r, b")
        echo("\n  -- Aggregation\n  MATCH (n:Label) RETURN n.type, count(n) AS cnt")
    }
    echo("\n  Tip: Use EXPLAIN <query> to see the execution plan without running.")
    echo()
  }

  private def doMetrics(): Unit = {
    val avg = if (queryCount > 0) totalMs / queryCount else 0.0
    echo()
    echo(f"Session metrics: $queryCount quer${if (queryCount == 1) "y" else "ies"}, " +
      f"$errorCount error(s), total $totalMs%.1f ms, avg $avg%.1f ms")
    // performance analytics over the session's per-query audit
    // (QueryAnalytics — the reference's AnalyticsEngine/
    // RegressionDetector surface): latency percentiles, then any
    // fingerprints whose recent runs regressed vs their own baseline
    if (queryCount > 0) {
      val df = audit.toDF
      val s = QueryAnalytics.summary(df).collect()(0)
      echo(f"Latency: p50 ${s.getAs[Double]("p50_ms")}%.1f ms, " +
        f"p95 ${s.getAs[Double]("p95_ms")}%.1f ms, " +
        f"max ${s.getAs[Double]("max_ms")}%.1f ms")
      val alerts = QueryAnalytics.regressions(df,
          baselineWindow = replBaselineWindow, recentWindow = replRecentWindow)
        .collect()
      alerts.foreach { a =>
        echo(f"REGRESSION [${a.getAs[String]("severity")}] " +
          f"${a.getAs[Double]("ratio")}%.1fx slower " +
          f"(baseline ${a.getAs[Double]("baseline_ms")}%.1f ms -> " +
          f"recent ${a.getAs[Double]("current_ms")}%.1f ms): " +
          a.getAs[String]("sample_label").linesIterator.mkString(" ").take(80))
      }
      if (alerts.isEmpty) echo("No query regressions detected.")
    }
    echo()
  }

  /** `.analytics <report> <auditPath> [arg]` — the four analytics.*
    * procedures plus `slowest`, bound to an AT-REST audit sink (a
    * `QueryAudit.flushTo` path or the pipeline runner's `audit_uri`) —
    * parity with the reference's CLI analytics entry points
    * (fastopendata analytics/engine.py surfaced through its CLI) where
    * `.metrics` covers only the LIVE session's ring buffer. Results
    * render through the session's normal output format.
    */
  private def doAnalytics(arg: String): Unit = {
    val parts = arg.split("\\s+").filter(_.nonEmpty)
    if (parts.length < 2) {
      echo("Usage: .analytics <report> <auditPath> [arg]")
      echo("  summary <path> [slowMs]       latency/error overview")
      echo("  regressions <path> [sinceMs]  per-fingerprint regression alerts")
      echo("  baselines <path>              per-fingerprint latency norms")
      echo("  trends <path> [bucketSec]     time-bucketed latency/error trend")
      echo("  slowest <path> [n]            slowest successful queries")
      return
    }
    val sub = parts(0).toLowerCase
    val path = parts(1)
    val extra = parts.lift(2)
    if (!Set("summary", "regressions", "baselines", "trends", "slowest")(sub)) {
      echo(s"Unknown analytics report '$sub' " +
        "(summary, regressions, baselines, trends, slowest)")
      return
    }
    try {
      val atRest = engine.spark.read.parquet(path)
      val result = sub match {
        case "summary" => QueryAnalytics.summary(atRest,
          slowThresholdMs = extra.flatMap(_.toDoubleOption).getOrElse(1000.0))
        case "regressions" => QueryAnalytics.regressions(atRest,
          sinceMillis = extra.flatMap(_.toLongOption))
        case "baselines" => QueryAnalytics.baselines(atRest)
        case "trends" => QueryAnalytics.trends(atRest,
          bucketSeconds = extra.flatMap(_.toLongOption).getOrElse(60L))
        case _ => QueryAnalytics.slowest(atRest,
          n = extra.flatMap(_.toIntOption).getOrElse(10))
      }
      val n = maxRows
      val fetched = result.limit(n + 1).collect()
      val total = if (fetched.length > n) result.count() else fetched.length.toLong
      displayResult(result, total, fetched.take(n))
    } catch {
      case NonFatal(e) => errorCount += 1; echo(s"Error: ${rootMessage(e)}")
    }
  }

  /** `.catalog save|open|versions <dir> [version]` — the durable side
    * of the session's graph ([[graft.model.CatalogStore]]): `save`
    * writes every registered table + manifest as a new version and
    * moves the atomic pointer; `open` absorbs a snapshot's
    * registrations into the LIVE catalog (same-name labels/types are
    * overwritten by the snapshot, extra live ones are kept — the
    * mutation-commit absorb semantics); `versions` lists retained
    * snapshots for time travel (`.catalog open <dir> v00001`).
    */
  private def doCatalog(arg: String): Unit = {
    val parts = arg.split("\\s+").filter(_.nonEmpty)
    if (parts.length < 2 ||
        !Set("save", "open", "versions")(parts(0).toLowerCase)) {
      echo("Usage: .catalog save|open|versions <dir> [version]")
      return
    }
    val dir = parts(1)
    try parts(0).toLowerCase match {
      case "save" =>
        val v = graft.model.CatalogStore.save(engine.spark, engine.catalog, dir)
        echo(s"Catalog saved as $v (${engine.catalog.labels.size} " +
          s"labels, ${engine.catalog.relTypes.size} relationship types)")
      case "open" =>
        val loaded = graft.model.CatalogStore.load(engine.spark, dir,
          version = parts.lift(2))
        engine.catalog.absorbFrom(loaded)
        echo(s"Catalog loaded: labels ${loaded.labels.mkString(", ")}; " +
          s"relationships ${loaded.relTypes.mkString(", ")}")
      case "versions" =>
        val vs = graft.model.CatalogStore.versions(engine.spark, dir)
        if (vs.isEmpty) echo("No snapshots found.")
        else echo(vs.mkString("Versions: ", ", ", ""))
    } catch {
      case NonFatal(e) => errorCount += 1; echo(s"Error: ${rootMessage(e)}")
    }
  }

  // regression windows sized for an interactive session (the library
  // default of 20+5 suits service traffic); conf-overridable
  private def replBaselineWindow: Int =
    engine.spark.conf.getOption("graft.repl.regressionBaselineWindow")
      .flatMap(_.toIntOption).getOrElse(5)
  private def replRecentWindow: Int =
    engine.spark.conf.getOption("graft.repl.regressionRecentWindow")
      .flatMap(_.toIntOption).getOrElse(3)

  private def doHistory(): Unit = {
    echo()
    echo(s"Recent history (${history.length} total):")
    val start = math.max(0, history.length - 20)
    history.zipWithIndex.drop(start).foreach { case (h, i) => echo(s"  ${i + 1}: $h") }
    echo()
  }

  private def doSearch(arg: String): Unit = {
    if (arg.isEmpty) { echo("Usage: .search <keyword>"); return }
    val kw = arg.toLowerCase
    val matches = history.zipWithIndex.filter(_._1.toLowerCase.contains(kw))
    if (matches.isEmpty) { echo(s"No history entries matching '$arg'."); return }
    echo()
    echo(s"${matches.length} match(es) for '$arg':")
    matches.takeRight(20).foreach { case (h, i) => echo(s"  ${i + 1}: $h") }
    echo()
  }

  private def doFormat(arg: String): Unit = arg.toLowerCase match {
    case "table" | "csv" | "json" =>
      outputFormat = arg.toLowerCase
      echo(s"Output format set to: $outputFormat")
    case "" =>
      echo(s"Current format: $outputFormat")
      echo("Usage: .format <table|csv|json>")
    case other => echo(s"Unknown format '$other'. Choose: table, csv, json")
  }

  private def doTemplate(arg: String): Unit = {
    val parts = arg.split("\\s+", 2)
    val action = parts.headOption.getOrElse("").toLowerCase
    val rest = if (parts.length > 1) parts(1) else ""
    action match {
      case "save" =>
        val sp = rest.split("\\s+", 2)
        if (sp.length < 2) { echo("Usage: .template save <name> <query>"); return }
        templates(sp(0)) = sp(1)
        echo(s"Template '${sp(0)}' saved.")
      case "list" =>
        if (templates.isEmpty) {
          echo("No templates saved. Use .template save <name> <query>"); return
        }
        echo()
        echo(s"${templates.size} template(s):")
        templates.foreach { case (n, q) =>
          echo(s"  $n: ${if (q.length <= 60) q else q.take(57) + "..."}")
        }
        echo()
      case "run" =>
        val rp = rest.split("\\s+").filter(_.nonEmpty)
        if (rp.isEmpty) { echo("Usage: .template run <name> param1=val1 ..."); return }
        templates.get(rp.head) match {
          case None =>
            val avail = if (templates.isEmpty) "(none)" else templates.keys.mkString(", ")
            echo(s"No template '${rp.head}'. Available: $avail")
          case Some(tpl) =>
            var q = tpl
            rp.tail.foreach { p =>
              p.split("=", 2) match {
                case Array(k, v) => q = q.replace(s"$$$k", v)
                case _           =>
              }
            }
            val remaining = "\\$\\w+".r.findAllIn(q).toSeq.distinct
            if (remaining.nonEmpty)
              echo(s"Warning: unsubstituted parameters: ${remaining.mkString(", ")}")
            echo(s"Running: $q")
            executeQuery(q)
        }
      case "delete" =>
        if (templates.remove(rest.trim).isDefined) echo(s"Template '${rest.trim}' deleted.")
        else echo(s"No template '${rest.trim}'.")
      case other =>
        echo(s"Unknown template action '$other'. Use: save, list, run, delete")
    }
  }

  private def doBatch(arg: String): Unit = {
    if (arg.isEmpty) { echo("Usage: .batch <file.cypher>"); return }
    val p = Paths.get(arg)
    if (!Files.exists(p)) { echo(s"File not found: $arg"); return }
    // join the file and split on ';' (outside string literals), so
    // batch files support the same multi-line query syntax the
    // interactive loop accepts — a clause-per-line MATCH is one query
    val body = Files.readAllLines(p).asScala.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--")).mkString(" ")
    val queries = splitStatements(body)
    if (queries.isEmpty) { echo("No queries found in file."); return }
    echo(s"Running ${queries.length} queries from $arg...")
    queries.zipWithIndex.foreach { case (q, i) =>
      echo(s"\n[${i + 1}/${queries.length}] $q")
      executeQuery(q)
    }
    echo(s"\nBatch complete: ${queries.length} queries.")
  }

  /** `.load entity Label=path[:idCol]` / `.load rel REL=path:src:tgt` —
    * registers through the same URI-dispatch reader the ETL pipeline
    * uses (csv/parquet/json by extension; reference repl.py:741-788).
    */
  private def doLoad(arg: String): Unit = {
    val parts = arg.split("\\s+", 2)
    if (parts.length < 2) {
      echo("Usage:\n  .load entity Label=path[:id_col]\n" +
        "  .load rel REL=path:src_col:tgt_col")
      return
    }
    val spec = parts(1)
    try parts(0).toLowerCase match {
      case "entity" | "e" =>
        val (label, rest) = splitSpec(spec)
        val bits = rest.split(":")
        val df = PipelineRunner.readSource(engine.spark, bits(0))
        val idCol = bits.lift(1).getOrElse(
          df.columns.headOption.getOrElse("__ID__"))
        require(df.columns.contains(idCol), s"id column '$idCol' not in ${bits(0)}")
        engine.catalog.addEntity(label, df, idCol)
        echo(s"Loaded entity $label from ${bits(0)} (id=$idCol, ${df.count()} rows)")
      case "rel" | "relationship" | "r" =>
        val (relType, rest) = splitSpec(spec)
        val bits = rest.split(":")
        require(bits.length >= 3, s"relationship spec needs 'REL=path:src_col:tgt_col', got '$spec'")
        val df = PipelineRunner.readSource(engine.spark, bits(0))
        require(df.columns.contains(bits(1)) && df.columns.contains(bits(2)),
          s"src/tgt columns '${bits(1)}'/'${bits(2)}' not in ${bits(0)}")
        engine.catalog.addRelationship(relType, df, bits(1), bits(2))
        echo(s"Loaded relationship $relType from ${bits(0)} (${df.count()} rows)")
      case other => echo(s"Unknown load type '$other'. Use 'entity' or 'rel'.")
    } catch { case NonFatal(e) => echo(s"Error: ${rootMessage(e)}") }
  }

  private def splitSpec(spec: String): (String, String) = {
    val i = spec.indexOf('=')
    require(i > 0, s"expected 'Name=path', got '$spec'")
    (spec.take(i).trim, spec.drop(i + 1).trim)
  }

  // ----------------------------------------------------------------
  // completion surface (repl.py:869-958)
  // ----------------------------------------------------------------

  /** Completion candidates for a partial token: dot-commands, Cypher
    * keywords, function names, catalog labels/types, and `var.prop`
    * property completion after a dot.
    */
  def complete(text: String): Seq[String] = {
    if (text.startsWith("."))
      return DotCommands.map("." + _).filter(_.startsWith(text))
    val dotAt = text.lastIndexOf('.')
    if (dotAt > 0) {
      val (prefix, partial) = (text.take(dotAt), text.drop(dotAt + 1))
      val cat = engine.catalog
      val props =
        cat.labels.flatMap { l =>
          val e = cat.entity(l); e.df.columns.filterNot(_ == e.idCol)
        } ++ cat.relTypes.flatMap { t =>
          val r = cat.relationship(t)
          val meta = Set(r.srcCol, r.dstCol) ++ r.idCol
          r.df.columns.filterNot(meta)
        }
      return props.distinct.sorted
        .filter(_.toLowerCase.startsWith(partial.toLowerCase))
        .map(p => s"$prefix.$p")
    }
    val upper = text.toUpperCase
    val lower = text.toLowerCase
    val kws = CypherLsp.Keywords.filter(_.startsWith(upper))
    val fns = CypherLsp.FunctionDocs.keys.toSeq.sorted
      .filter(_.startsWith(lower)).map(_ + "(")
    val labels = (engine.catalog.labels ++ engine.catalog.relTypes)
      .filter(l => l.startsWith(text) || l.toUpperCase.startsWith(upper))
    kws ++ fns ++ labels
  }

  // ----------------------------------------------------------------
  // history persistence (repl.py:52-75)
  // ----------------------------------------------------------------

  private def loadHistory(): Unit = historyFile.foreach { p =>
    try if (Files.exists(p))
      history ++= Files.readAllLines(p).asScala.takeRight(MaxHistory)
    catch { case NonFatal(_) => }
  }

  private def saveHistory(): Unit = historyFile.foreach { p =>
    try {
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, history.takeRight(MaxHistory).asJava)
    } catch { case NonFatal(_) => }
  }

  private def rootMessage(e: Throwable): String = {
    var t = e
    while (t.getCause != null && t.getCause != t) t = t.getCause
    Option(t.getMessage).getOrElse(t.getClass.getSimpleName).linesIterator
      .nextOption().getOrElse("")
  }
}

object CypherRepl {

  val DotCommands: Seq[String] = Seq("help", "load", "schema", "tables",
    "functions", "metrics", "analytics", "catalog", "history", "search",
    "format", "template", "batch", "examples", "clear", "quit", "exit")

  private val MaxHistory = 1000
  private val MaxCellWidth = 40

  private def defaultHistory: Option[Path] =
    sys.props.get("user.home").map(h => Paths.get(h, ".graft", "repl_history"))

  /** Incomplete-query heuristic (repl.py:992-1004): a trailing clause
    * keyword, or MATCH without RETURN, continues onto the next line.
    */
  private[ops] def looksIncomplete(line: String): Boolean = {
    val upper = line.toUpperCase.trim
    val continuing = Set("MATCH", "WITH", "UNWIND", "OPTIONAL", "WHERE", "ORDER")
    val words = upper.split("\\s+").filter(_.nonEmpty)
    if (words.lastOption.exists(continuing)) return true
    upper.contains("MATCH") && !upper.contains("RETURN") &&
      !Seq("CREATE", "MERGE", "DELETE", "SET ", "REMOVE").exists(upper.contains)
  }

  /** Split a batch-file body into statements on ';', ignoring
    * semicolons inside single/double-quoted string literals (with
    * backslash escapes) and backticked identifiers.
    */
  private[graft] def splitStatements(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < body.length) {
      val c = body(i)
      if (quote != 0) {
        cur += c
        if (c == '\\' && quote != '`' && i + 1 < body.length) {
          cur += body(i + 1); i += 1
        } else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case ';' =>
          val q = cur.toString.trim
          if (q.nonEmpty) out += q
          cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    val tail = cur.toString.trim
    if (tail.nonEmpty) out += tail
    out.toSeq
  }

  private[ops] def fmtCell(v: Any): String = v match {
    case null            => "null"
    case d: Double       => if (d == math.rint(d) && math.abs(d) < 1e15) f"$d%.1f" else d.toString
    case s: Seq[_]       => s.map(fmtCell).mkString("[", ", ", "]")
    case a: Array[_]     => a.map(fmtCell).mkString("[", ", ", "]")
    case m: Map[_, _]    => m.map { case (k, x) => s"$k: ${fmtCell(x)}" }.mkString("{", ", ", "}")
    case other           => other.toString
  }

  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private[ops] def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  /** `graft repl` console entry: builds a local session, optional
    * `--entity Label=path[:id]` / `--rel REL=path:src:tgt` preloads
    * (reference CLI `nmetl repl`: repl.py:948-1041 click entry).
    */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-repl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = CypherEngine(spark)
    val repl = new CypherRepl(engine,
      new BufferedReader(new java.io.InputStreamReader(System.in)),
      new PrintWriter(System.out))
    args.sliding(2, 2).foreach {
      case Array("--entity", spec) => repl.handleLine(s".load entity $spec")
      case Array("--rel", spec)    => repl.handleLine(s".load rel $spec")
      case other => System.err.println(s"ignored args: ${other.mkString(" ")}")
    }
    // a real terminal gets jline line editing + tab completion
    // (GRAFT_REPL_PLAIN=1 opts out); piped/redirected stdin keeps the
    // plain stream loop
    if (System.console() != null && !sys.env.contains("GRAFT_REPL_PLAIN"))
      JlineConsole.run(repl)
    else repl.run()
    spark.stop()
  }
}
