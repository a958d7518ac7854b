package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.compiler.QueryCompiler
import graft.model.GraphCatalog
import graft.parser.{CypherAst, CypherParser}

/** User-facing engine facade — the Spark counterpart of the reference's
  * `Star` (/root/reference/packages/pycypher/src/pycypher/star.py:
  * 620-929): parse (cached) → compile → lazy DataFrame. Validation,
  * timeout and caching layers of the reference map onto Spark-native
  * mechanisms (analysis exceptions, job groups, persist); execution is
  * a single Catalyst-optimized plan instead of a per-clause pandas loop.
  */
final class CypherEngine(val spark: SparkSession, val catalog: GraphCatalog,
                         resultCache: Option[graft.ops.ResultCache] = None,
                         rejectComplexityAbove: Int = Int.MaxValue,
                         warnComplexityAbove: Int = Int.MaxValue,
                         rateLimiter: Option[graft.ops.RateLimiter] = None) {

  /** Engine lifecycle counters (run admissions/completions/failures),
    * scraped by [[startHealthServer]].
    */
  val metrics = new graft.ops.EngineMetrics

  // parsed-AST cache, mirroring the reference's LRU parse cache
  // (star.py:107-131) — parsing is pure so a plain bounded map suffices.
  private val astCache =
    new java.util.concurrent.ConcurrentHashMap[String, CypherAst.Query]()

  def parse(cypher: String): CypherAst.Query =
    astCache.computeIfAbsent(cypher, CypherParser.parse)

  /** Run `body` with Spark's ANSI mode disabled — Cypher-compatible
    * coercion/null semantics (bad casts yield null, as in the reference's
    * `...OrNull` conversions). Scoped save/restore: cast eval modes bake
    * into the plan at analysis time (inside `body`), so other SQL on the
    * shared session keeps its own semantics.
    */
  private def withCypherConf[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try body finally prev match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None    => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  def query(cypher: String, params: Map[String, Any] = Map.empty): DataFrame =
    withCypherConf {
      // admission gate — the reference gates Star.run the same way
      // (rate_limiter.py via star.py:650-653); over-rate queries are
      // rejected before any parse/compile work is spent
      rateLimiter.foreach(_.acquireOrThrow())
      val ast = parse(cypher)
      graft.ops.QueryComplexity.gate(ast, rejectComplexityAbove, warnComplexityAbove)
      val df = resultCache.flatMap(_.get(cypher, params)).getOrElse {
        val compiled = new QueryCompiler(catalog, spark, params).compile(ast)
        resultCache.map(_.put(cypher, params, compiled)).getOrElse(compiled)
      }
      // audit correlation: a registered QueryAudit listener reports
      // this frame's actions under the originating Cypher text
      graft.ops.QueryAudit.label(df, cypher)
    }

  /** Query with a wall-clock timeout, collected — the reference's
    * `Star.run(query, timeout_seconds=…)` (star.py:625-690). The
    * timeout guards the ACTION; expiry cancels the query's job group so
    * no orphaned stages keep running.
    *
    * The collect is BOUNDED: at most `maxRows` rows reach the driver
    * (default 10,000 — finite on purpose: an unbounded `MATCH (n)
    * RETURN n` through the convenience API must not OOM the driver).
    * Like the REPL, one execution fetches maxRows+1 and a distributed
    * count runs only on overflow, so within-bound queries cost a
    * single job. `runCounted` reports the truncation; pass
    * `Int.MaxValue` to opt back into an unbounded collect explicitly.
    */
  def run(cypher: String, timeoutSeconds: Double,
          params: Map[String, Any] = Map.empty,
          maxRows: Int = CypherEngine.DefaultMaxRows)
  : Array[org.apache.spark.sql.Row] = {
    val r = runCounted(cypher, timeoutSeconds, params, maxRows)
    // the convenience API drops the truncation flag — make the cut
    // visible so callers that relied on complete results notice
    // (use runCounted to detect it programmatically)
    if (r.truncated)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"query result truncated to $maxRows of ${r.totalRows} rows; " +
        "use runCounted (or raise maxRows) for the full result")
    r.rows
  }

  /** [[run]] with the truncation made explicit: the retained page, the
    * TRUE distributed row count, and whether the page is partial.
    */
  def runCounted(cypher: String, timeoutSeconds: Double,
                 params: Map[String, Any] = Map.empty,
                 maxRows: Int = CypherEngine.DefaultMaxRows)
  : CypherEngine.RunResult = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    metrics.started.incrementAndGet()
    try {
      val r = graft.ops.QueryGuard.withTimeout(spark, timeoutSeconds) {
        val df = query(cypher, params)
        val fetched =
          if (maxRows == Int.MaxValue) df.collect()
          else df.limit(maxRows + 1).collect()
        if (fetched.length > maxRows)
          CypherEngine.RunResult(fetched.take(maxRows), df.count(),
            truncated = true)
        else CypherEngine.RunResult(fetched, fetched.length.toLong,
          truncated = false)
      }
      metrics.completed.incrementAndGet()
      r
    } catch { case e: Throwable => metrics.failed.incrementAndGet(); throw e }
  }

  /** Liveness/metrics endpoint fed by the engine counters (and a
    * QueryAudit listener's action records when one is attached) — the
    * reference's `health_server.py` counterpart. Port 0 = ephemeral;
    * read the bound port from the returned server.
    */
  def startHealthServer(port: Int = 0,
                        audit: Option[graft.ops.QueryAudit] = None)
  : graft.ops.HealthServer =
    new graft.ops.HealthServer(() => {
      val base = metrics.snapshot(rateLimiter)
      audit.map { a =>
        val recs = a.records
        base +
          ("audited_actions_success" -> recs.count(_.status == "success").toLong) +
          ("audited_actions_failure" -> recs.count(_.status == "failure").toLong)
      }.getOrElse(base)
    }, port)

  /** EXPLAIN: complexity report + the Catalyst formatted physical plan
    * (the reference's query_explainer.py analog; SURVEY §2 ops row).
    */
  def explain(cypher: String, params: Map[String, Any] = Map.empty): String = {
    val report = graft.ops.QueryComplexity.score(parse(cypher))
    val df = query(cypher, params)
    s"complexity: ${report.score} (${report.reasons.mkString(", ")})\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
  }

  /** Query straight to a file sink — the reference's
    * `Star.stream_query_to_uri` (star.py:578-618). Spark plans are lazy
    * end-to-end, so this streams file→transform→sink with no
    * intermediate materialization; the whole "relation engine" second
    * path of the reference (SURVEY §3.3) collapses into this one call.
    */
  def queryToUri(cypher: String, uri: String, format: Option[String] = None,
                 params: Map[String, Any] = Map.empty): Unit =
    graft.etl.PipelineRunner.writeSink(query(cypher, params), uri, format)

  /** Execute a query that may mutate the graph. Mutations stage into a
    * catalog snapshot (eagerly materialized per mutation); the snapshot
    * is swapped in atomically after the whole query compiles and runs —
    * the reference's begin/commit/rollback protocol
    * (relational_models.py:589-708) with immutable-DataFrame semantics.
    * Read-only queries pass through `query` untouched (lazy).
    */
  def execute(cypher: String, params: Map[String, Any] = Map.empty): DataFrame = {
    val ast = parse(cypher)
    // read-only strings keep the cached `query` path (which gates);
    // mutations gate here before any staging work
    if (!isMutating(ast)) query(cypher, params)
    else { rateLimiter.foreach(_.acquireOrThrow()); executeAst(ast, params) }
  }

  private def isMutating(ast: graft.parser.CypherAst.Query): Boolean = {
    import graft.parser.CypherAst._
    ast.statements.exists(_.clauses.exists {
      case _: Create | _: Merge | _: SetClause | _: Delete | _: Remove |
           _: Foreach => true
      case _ => false
    })
  }

  /** Execute a multi-query pipeline. Combinable pipelines (single-
    * statement queries, disjoint pattern variables) merge through
    * QueryCombiner into ONE query — one Catalyst plan, one snapshot
    * commit — exactly the reference's `WITH *` combination
    * (query_combiner.py), minus its string round-trip. Non-combinable
    * inputs fall back to sequential execution in the given order.
    * Returns the final query's result.
    */
  def executeAll(cyphers: Seq[String],
                 params: Map[String, Any] = Map.empty): DataFrame = {
    require(cyphers.nonEmpty, "executeAll: empty pipeline")
    val asts = cyphers.map(parse)
    if (asts.size > 1 && graft.compiler.QueryCombiner.combinable(asts))
      executeAst(graft.compiler.QueryCombiner.combine(asts), params)
    else cyphers.map(execute(_, params)).last
  }

  private def executeAst(ast: graft.parser.CypherAst.Query,
                         params: Map[String, Any]): DataFrame = {
    import graft.parser.CypherAst._
    val mutates = isMutating(ast)
    if (!mutates) withCypherConf {
      graft.ops.QueryComplexity.gate(ast, rejectComplexityAbove, warnComplexityAbove)
      new QueryCompiler(catalog, spark, params).compile(ast)
    }
    else withCypherConf {
      val snap = catalog.snapshot()
      val df = new QueryCompiler(snap, spark, params).compile(ast)
      // Every mutation materializes eagerly (localCheckpoint) during
      // compile, so a statement ENDING in a mutation has no lazy tail
      // left to fail after commit — forcing the frame again would only
      // re-run the read side. A trailing read clause (RETURN/WITH) is
      // still forced so its failures surface before the snapshot swap.
      val endsInMutation = ast.statements.forall(_.clauses.lastOption.exists {
        case _: Create | _: Merge | _: SetClause | _: Delete | _: Remove |
             _: Foreach => true
        case _ => false
      })
      if (!endsInMutation) df.count() // force lazy tail; failures roll back
      catalog.absorbFrom(snap)
      resultCache.foreach(_.invalidateAll()) // epoch bump
      df
    }
  }
}

object CypherEngine {
  /** Driver-side row cap for the convenience collect APIs. */
  val DefaultMaxRows: Int = 10000

  /** A bounded collect: the retained rows, the true total count, and
    * whether `rows` is a partial page.
    */
  final case class RunResult(rows: Array[org.apache.spark.sql.Row],
                             totalRows: Long, truncated: Boolean)

  def apply(spark: SparkSession): CypherEngine =
    new CypherEngine(spark, new GraphCatalog)
}
