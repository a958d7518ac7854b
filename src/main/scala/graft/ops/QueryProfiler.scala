package graft.ops

import org.apache.spark.sql.execution.SparkPlan

/** Query profiling + bottleneck analysis — the Spark-native form of the
  * reference's `query_profiler.py` (/root/reference/packages/pycypher/
  * src/pycypher/query_profiler.py:36-250). Where the reference times
  * its per-clause pandas interpreter, a compiled Catalyst plan has no
  * per-clause execution to time — the honest equivalents are the
  * phases the engine actually runs (parse → compile/analyze →
  * execute) plus Spark's per-PHYSICAL-OPERATOR SQL metrics, which the
  * executor collects for free on every action. Hotspot = the operator
  * with the most recorded time; recommendations combine plan-shape
  * anti-patterns (cartesian products, unpushed scans, exchange count)
  * with the reference's timing/row-count heuristics
  * (`_generate_recommendations`, query_profiler.py:251-420).
  */
object QueryProfiler {

  /** One physical operator's recorded metrics (times in ms where the
    * metric is a timing metric; counts otherwise).
    */
  final case class OperatorProfile(operator: String, timeMs: Double,
                                   rowsOut: Long, metrics: Map[String, Long])

  final case class ProfileReport(query: String, totalMs: Double,
                                 parseMs: Double, compileMs: Double,
                                 executeMs: Double, rowCount: Long,
                                 operators: Seq[OperatorProfile],
                                 hotspot: Option[String],
                                 recommendations: Seq[String]) {
    def render: String = {
      val header = Seq(
        f"Query Profile: ${query.linesIterator.mkString(" ").take(80)}",
        f"Total: $totalMs%.1fms (parse=$parseMs%.1fms, compile=$compileMs%.1fms, execute=$executeMs%.1fms)",
        f"Rows: $rowCount  Hotspot: ${hotspot.getOrElse("none")}",
        "Operator breakdown:")
      val ops = operators.sortBy(-_.timeMs).take(12).map { op =>
        val pct = if (totalMs > 0) op.timeMs / totalMs * 100 else 0.0
        f"  ${op.operator}%-28s ${op.timeMs}%8.1fms ($pct%4.1f%%)  rows=${op.rowsOut}"
      }
      val recs = if (recommendations.isEmpty) Seq("Recommendations: none")
        else "Recommendations:" +: recommendations.map("  - " + _)
      (header ++ ops ++ recs).mkString("\n")
    }
  }

  // reference thresholds (query_profiler.py:29-32)
  private val SlowParseMs = 50.0
  private val SlowCompileMs = 20.0
  private val LargeResultRows = 10000L

  /** Spark timing metrics are reported in ns or ms depending on the
    * metric type; `metricType` disambiguates ("timing" = ms,
    * "nsTiming" = ns).
    */
  private def timeMsOf(plan: SparkPlan): Double =
    plan.metrics.collect {
      case (_, m) if m.metricType == "timing"   => m.value.toDouble
      case (_, m) if m.metricType == "nsTiming" => m.value / 1e6
    }.sum

  /** Execute and profile one query through the engine. The action runs
    * the frame's OWN executed plan as a distributed row count (a fold
    * of per-partition counts), so operator SQL metrics reflect a
    * complete run while the driver never materializes a single result
    * row — profiling a 100M-row query costs the driver no more memory
    * than profiling 10 rows.
    */
  def profile(engine: graft.CypherEngine, cypher: String,
              params: Map[String, Any] = Map.empty): ProfileReport = {
    val t0 = System.nanoTime()
    engine.parse(cypher)
    val parseMs = (System.nanoTime() - t0) / 1e6

    val t1 = System.nanoTime()
    val df = engine.query(cypher, params)
    val plan = df.queryExecution.executedPlan // force analysis + planning
    val compileMs = (System.nanoTime() - t1) / 1e6

    val t2 = System.nanoTime()
    // run under a SQL execution id so the profiled run shows up in the
    // SQL UI/event log and driver-side metrics (broadcast/subquery)
    // still post — plan.execute() alone would skip all of that
    val rowCount = org.apache.spark.sql.execution.SQLExecution
      .withNewExecutionId(df.queryExecution) {
        plan.execute()
          .mapPartitions(it => Iterator.single {
            var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
          }).fold(0L)(_ + _)
      }
    val executeMs = (System.nanoTime() - t2) / 1e6
    val totalMs = (System.nanoTime() - t0) / 1e6

    val operators = plan.collect { case node =>
      OperatorProfile(node.nodeName, timeMsOf(node),
        node.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
        node.metrics.map { case (k, m) => k -> m.value }.toMap)
    }
    val hotspot = operators.filter(_.timeMs > 0).sortBy(-_.timeMs)
      .headOption.map(_.operator)

    ProfileReport(cypher, totalMs, parseMs, compileMs, executeMs,
      rowCount, operators, hotspot,
      recommend(cypher, plan, parseMs, compileMs, rowCount, operators))
  }

  private def recommend(cypher: String, plan: SparkPlan, parseMs: Double,
                        compileMs: Double, rowCount: Long,
                        operators: Seq[OperatorProfile]): Seq[String] = {
    val recs = scala.collection.mutable.ArrayBuffer.empty[String]
    val planStr = plan.toString
    val upper = cypher.toUpperCase

    if (parseMs > SlowParseMs)
      recs += f"Parse time ($parseMs%.0fms) is high; the engine's AST cache amortizes repeats of the same text."
    if (compileMs > SlowCompileMs)
      recs += f"Compile/planning time ($compileMs%.0fms) is high; simplify the pattern or reuse the compiled frame."
    if (rowCount > LargeResultRows)
      recs += s"Large result set ($rowCount rows); add LIMIT or more selective WHERE predicates."

    if (planStr.contains("CartesianProduct") ||
        planStr.contains("BroadcastNestedLoopJoin"))
      recs += "Plan contains a cartesian/nested-loop join; relate the patterns through a shared variable or an equality predicate."
    val exchanges = operators.count(_.operator.startsWith("Exchange"))
    if (exchanges > 4)
      recs += s"Plan has $exchanges shuffles; co-partition inputs or pre-aggregate to reuse a partitioning."
    // a Filter directly above an unpushed scan: predicate never reached
    // the source (non-pushable expression or misconfigured source)
    if (planStr.contains("PushedFilters: []") && upper.contains("WHERE"))
      recs += "WHERE predicate did not push into the scan; prefer comparisons on plain columns over computed expressions."
    val shuffleBytes = operators.flatMap(_.metrics.get("shuffleBytesWritten")).sum
    if (shuffleBytes > (1L << 30))
      recs += f"Shuffle volume is ${shuffleBytes / 1e9}%.1f GB; aggregate earlier or broadcast the small side."
    recs.toSeq
  }
}
