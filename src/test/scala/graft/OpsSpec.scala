package graft

import graft.model.GraphCatalog
import graft.ops.{QueryComplexity, QueryGuard, QueryTimeoutException, ResultCache}

/** Operational layer: result cache, complexity gate, EXPLAIN. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def engineWith(cache: Option[ResultCache],
                         reject: Int = Int.MaxValue): CypherEngine = {
    val person = Seq((0L, "Alice", 30L), (1L, "Bob", 25L)).toDF("__ID__", "name", "age")
    val cat = new GraphCatalog().addEntity("Person", person)
    new CypherEngine(spark, cat, cache, reject)
  }

  test("result cache hits on repeat, skips non-deterministic queries") {
    var now = 0L
    val cache = new ResultCache(maxEntries = 2, ttlMillis = 1000, clock = () => now)
    val eng = engineWith(Some(cache))
    val q = "MATCH (p:Person) RETURN count(*) AS n"
    val df1 = eng.query(q)
    assert(cache.size == 1)
    val df2 = eng.query(q)
    assert(df2 eq df1) // same cached instance
    eng.query("MATCH (p:Person) RETURN rand() AS r")
    assert(cache.size == 1) // rand() not cached
    now = 2000
    assert(cache.get(q, Map.empty).isEmpty) // TTL expired
  }

  test("mutation invalidates the cache") {
    val cache = new ResultCache()
    val eng = engineWith(Some(cache))
    val q = "MATCH (p:Person) RETURN count(*) AS n"
    assert(eng.query(q).collect().head.getLong(0) == 2L)
    assert(cache.size == 1)
    eng.execute("CREATE (p:Person {name: 'New', age: 1})")
    assert(cache.size == 0)
    assert(eng.query(q).collect().head.getLong(0) == 3L) // fresh result
  }

  test("query timeout cancels the job group instead of waiting it out") {
    val slow = spark.range(8).as[Long]
      .mapPartitions { it => Thread.sleep(8000); it }
    val t0 = System.nanoTime()
    intercept[QueryTimeoutException] {
      QueryGuard.withTimeout(spark, 0.8)(slow.count())
    }
    assert((System.nanoTime() - t0) / 1e9 < 6.0, "timeout did not cancel early")
    // a generous timeout passes results through untouched
    assert(QueryGuard.withTimeout(spark, 60.0)(spark.range(10).count()) == 10L)
    // body failures propagate as themselves, not wrapped
    intercept[IllegalStateException] {
      QueryGuard.withTimeout(spark, 60.0)(throw new IllegalStateException("x"))
    }
  }

  test("query audit records a row per engine action with plan hash and metrics") {
    import graft.ops.QueryAudit
    val audit = new QueryAudit(spark).attach()
    def await(n: Int): Unit = {
      val deadline = System.nanoTime() + 5_000_000_000L
      while (audit.records.count(_.label.nonEmpty) < n &&
        System.nanoTime() < deadline) Thread.sleep(20)
    }
    try {
      val eng = engineWith(None)
      val q1 = "MATCH (p:Person) RETURN p.name AS name ORDER BY name"
      val q2 = "MATCH (p:Person) WHERE p.age > 26 RETURN count(*) AS n"
      eng.query(q1).collect()
      eng.query(q2).collect()
      // the listener bus is async — wait for delivery
      await(2)
      val recs = audit.records.filter(_.label.nonEmpty)
      // one audit row per engine query, labeled with the Cypher text
      assert(recs.map(_.label) == Seq(q1, q2), recs.toString)
      val r = recs.head
      assert(r.status == "success" && r.action.nonEmpty)
      assert(r.durationMs > 0 && r.planHash.length == 32)
      // repeated runs of the same logical query share a plan hash
      eng.query(q1).collect()
      await(3)
      val again = audit.records.filter(_.label == q1).last
      assert(again.planHash == r.planHash)
      // queryable as a DataFrame
      val df = audit.toDF
      assert(df.filter(df("label") === q2).count() == 1)
    } finally audit.detach()
  }

  test("complexity gate rejects expensive queries with reasons") {
    val eng = engineWith(None, reject = 10)
    eng.query("MATCH (p:Person) RETURN p.name AS n") // trivial passes
    val e = intercept[QueryComplexity.ComplexityException] {
      eng.query(
        """MATCH (a:Person)-[:KNOWS*1..20]->(b:Person), (c:Person), (d:Person)
           RETURN count(*) AS n""")
    }
    assert(e.getMessage.contains("var-length span"))
  }

  test("complexity score components") {
    val r = QueryComplexity.score(parserParse(
      "MATCH (a:X)-[:R]->(b:Y) WHERE EXISTS { (a)-[:R]->(c:Z) } RETURN a"))
    assert(r.score >= 5) // pattern + hop + exists
    assert(r.reasons.exists(_.contains("exists")))
  }

  private def parserParse(q: String) = graft.parser.CypherParser.parse(q)

  test("percentileDisc is exact beyond the approx sketch's accuracy bound") {
    import org.apache.spark.sql.functions.{col, lit, percentile_approx, when}
    import graft.functions.FunctionRegistry
    def disc(df: org.apache.spark.sql.DataFrame, p: Double): Any =
      df.agg(FunctionRegistry
        .aggregate("percentileDisc", Seq(col("v"), lit(p)), distinct = false)
        .as("x")).head.get(0)
    // small group: inverse-distribution semantics (smallest value with
    // cume_dist >= p) — identical to DuckDB quantile_disc
    val small = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(disc(small, 0.25) == 1.0 && disc(small, 0.5) == 2.0 &&
      disc(small, 0.9) == 4.0)
    // 4M-value group, 2M duplicates then a distinct tail, percentile
    // just past the duplicate head: the former percentile_approx(…,1e6)
    // compilation silently returns the WRONG element once the group
    // exceeds the sketch's accuracy bound (rank slack n/accuracy) —
    // exactly the group shape a 100 TB corpus produces
    val big = spark.range(0, 4000000L)
      .select(when(col("id") < 2000000L, 0L).otherwise(col("id")).as("v"))
    val p = 0.5000005 // target rank 2000002: first row past the head
    assert(disc(big, p) == 2000001.0) // exact inverse distribution
    val approx = big.agg(percentile_approx(col("v"), lit(p), lit(1000000)))
      .head.getLong(0)
    assert(approx == 0L) // the sketch answers inside the duplicate head
    // the sketch stays available as an explicit opt-in
    spark.conf.set("graft.percentileDisc.approx", "true")
    try assert(disc(big, p) == approx)
    finally spark.conf.unset("graft.percentileDisc.approx")
  }

  test("rate limiter: over-rate queries are rejected, refill restores admission") {
    import graft.ops.{RateLimiter, RateLimitExceededException}
    var nanos = 0L
    val rl = new RateLimiter(permitsPerSecond = 2.0, burst = 2, clock = () => nanos)
    val person = Seq((0L, "Alice", 30L)).toDF("__ID__", "name", "age")
    val cat = new GraphCatalog().addEntity("Person", person)
    val eng = new CypherEngine(spark, cat, rateLimiter = Some(rl))
    val q = "MATCH (p:Person) RETURN p.name AS n"
    eng.query(q); eng.query(q)                       // burst admits 2
    intercept[RateLimitExceededException](eng.query(q))
    intercept[RateLimitExceededException](            // mutations gate too
      eng.execute("CREATE (p:Person {name: 'X', age: 1})"))
    assert(rl.rejected == 2)
    nanos = 500L * 1000000                            // +0.5 s -> 1 token
    eng.query(q)                                      // admitted again
    intercept[RateLimitExceededException](eng.query(q))
    assert(rl.rejected == 3)
  }

  test("health server: /healthz liveness and /metrics counter scrape") {
    import graft.ops.RateLimiter
    val rl = new RateLimiter(permitsPerSecond = 1000.0, burst = 1000)
    val person = Seq((0L, "Alice", 30L)).toDF("__ID__", "name", "age")
    val cat = new GraphCatalog().addEntity("Person", person)
    val eng = new CypherEngine(spark, cat, rateLimiter = Some(rl))
    eng.run("MATCH (p:Person) RETURN p.name AS n", timeoutSeconds = 60)
    intercept[Exception](eng.run("MATCH (p:Nope) RETURN p.x AS x", 60))
    val srv = eng.startHealthServer()
    try {
      def get(path: String): String = {
        val conn = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try new String(conn.getInputStream.readAllBytes(), "UTF-8")
        finally conn.disconnect()
      }
      assert(get("/healthz").trim == "ok")
      val m = get("/metrics").linesIterator.map(_.split(" "))
        .map(a => a(0) -> a(1).toLong).toMap
      assert(m("graft_queries_started") == 2)
      assert(m("graft_queries_completed") == 1)
      assert(m("graft_queries_failed") == 1)
      assert(m("graft_queries_in_flight") == 0)
      assert(m("graft_rate_limited_rejections") == 0)
    } finally srv.stop()
  }

  test("query formatter: keywords uppercase, clause-per-line, strings untouched") {
    import graft.ops.QueryFormatter
    val messy = "match (n:Person)   where n.name = 'match me'  return n.name as name order by name limit 3"
    val formatted = QueryFormatter.format(messy)
    assert(formatted ==
      """MATCH (n:Person)
        |  WHERE n.name = 'match me'
        |RETURN n.name AS name
        |ORDER BY name
        |LIMIT 3""".stripMargin)
    // idempotent: formatting formatted text is a fixed point
    assert(QueryFormatter.format(formatted) == formatted)
    // OPTIONAL MATCH splits as one clause, SET is indented
    val f2 = QueryFormatter.format(
      "match (a:Person) optional match (a)-[:KNOWS]->(b:Person) set a.seen = true return a.name as n")
    assert(f2 ==
      """MATCH (a:Person)
        |OPTIONAL MATCH (a)-[:KNOWS]->(b:Person)
        |  SET a.seen = TRUE
        |RETURN a.name AS n""".stripMargin)
  }

  test("query formatter: literals, dotted identifiers, backticks survive") {
    import graft.ops.QueryFormatter
    // multi-space string literal must survive byte-identical — the LSP
    // applies format() as a whole-document edit
    val f = QueryFormatter.format("match (n)   where n.x = 'a  b'  return n.x as y")
    assert(f.contains("'a  b'"))
    // keyword-colliding property names are identifiers, not keywords
    val f2 = QueryFormatter.format("match (n) return n.in as i, n.contains as c")
    assert(f2.contains("n.in") && f2.contains("n.contains"))
    // backtick-quoted identifiers are never rewritten
    val f3 = QueryFormatter.format("match (n) return n.`match  all` as m")
    assert(f3.contains("`match  all`"))
    // and none of these draw lint case warnings
    assert(!QueryFormatter.lint("MATCH (n) RETURN n.in AS i").exists(_.message.contains("uppercase")))
    assert(!QueryFormatter.lint("MATCH (n) RETURN n.`match` AS m").exists(_.message.contains("uppercase")))
  }

  test("query linter: case issues, trailing whitespace, parse errors") {
    import graft.ops.QueryFormatter
    val issues = QueryFormatter.lint("match (n:Person) RETURN n.name AS name ")
    assert(issues.exists(i =>
      i.message.contains("'match' should be uppercase") && i.line == 1))
    assert(issues.exists(_.message == "Trailing whitespace"))
    // keywords inside string literals are never flagged
    val clean = QueryFormatter.lint("MATCH (n:Person) WHERE n.name = 'match' RETURN n.name AS x")
    assert(!clean.exists(_.message.contains("uppercase")))
    val broken = QueryFormatter.lint("MATCH (n:Person RETURN")
    assert(broken.exists(i => i.severity == "error" && i.message.startsWith("Parse error")))
  }

  test("query profiler: phase timings, operator metrics, recommendations") {
    import graft.ops.QueryProfiler
    val eng = engineWith(None)
    val rep = QueryProfiler.profile(eng,
      "MATCH (p:Person) WHERE p.age > 20 RETURN p.name AS name")
    assert(rep.rowCount == 2)
    assert(rep.parseMs >= 0 && rep.compileMs > 0 && rep.executeMs > 0)
    assert(rep.totalMs >= rep.executeMs)
    assert(rep.operators.nonEmpty) // physical operators captured
    assert(rep.operators.exists(_.rowsOut >= 0))
    assert(rep.render.contains("Query Profile:"))
    // anti-pattern surface: a cross product draws a recommendation
    val cross = QueryProfiler.profile(eng,
      "MATCH (a:Person), (b:Person) RETURN a.name AS x, b.name AS y")
    assert(cross.rowCount == 4)
    assert(cross.recommendations.exists(_.toLowerCase.contains("cartesian")))
  }

  test("query profiler never materializes the result on the driver") {
    import graft.ops.QueryProfiler
    // 200k rows x ~200-char payload ≈ 40 MB serialized: a collect-based
    // profile ships it all to the driver; the plan-count profile ships
    // only per-partition counts. Task resultSize is the public record
    // of what actually crossed that wire.
    val wide = spark.range(200000L).selectExpr(
      "id AS __ID__", "repeat('x', 200) AS payload")
    val cat = new GraphCatalog().addEntity("Doc", wide)
    val eng = new CypherEngine(spark, cat)
    val resultBytes = new java.util.concurrent.atomic.AtomicLong
    val tasksSeen = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) resultBytes.addAndGet(e.taskMetrics.resultSize)
        tasksSeen.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rep = QueryProfiler.profile(eng,
        "MATCH (d:Doc) RETURN d.payload AS payload")
      assert(rep.rowCount == 200000L)
      // listener delivery is async: wait until the task stream goes quiet
      var last = -1L
      var spins = 0
      while (tasksSeen.get() != last && spins < 50) {
        last = tasksSeen.get(); Thread.sleep(100); spins += 1
      }
      val mb = resultBytes.get() / 1e6
      assert(resultBytes.get() < 5L * 1000 * 1000,
        f"profile shipped $mb%.1f MB to the driver — it is collecting the result")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("explain includes complexity and the physical plan") {
    val eng = engineWith(None)
    val text = eng.explain("MATCH (p:Person) WHERE p.age > 26 RETURN p.name AS n")
    assert(text.contains("complexity:"))
    assert(text.contains("Physical Plan") || text.contains("Scan"))
  }

  test("run bounds its collect: huge results truncate with the true count") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val big = spark.range(30000)
      .select(col("id").as("__ID__"),
        concat(lit("n"), col("id").cast("string")).as("name"))
    val cat = new GraphCatalog().addEntity("Person", big)
    val eng = new CypherEngine(spark, cat)
    val r = eng.runCounted("MATCH (p:Person) RETURN p.name AS n",
      timeoutSeconds = 120, maxRows = 100)
    assert(r.rows.length == 100 && r.totalRows == 30000L && r.truncated)
    // the convenience array form truncates at the finite default
    assert(eng.run("MATCH (p:Person) RETURN p.name AS n", 120).length ==
      CypherEngine.DefaultMaxRows)
    // within-bound results are complete and unmarked
    val small = eng.runCounted(
      "MATCH (p:Person) WHERE p.__ID__ < 3 RETURN p.name AS n", 120)
    assert(small.rows.length == 3 && small.totalRows == 3L && !small.truncated)
  }

  test("regression detector: a slowed query yields exactly one alert; " +
    "steady and short-history queries yield none") {
    import graft.ops.{QueryAnalytics, QueryAudit}
    val audit = new QueryAudit(spark)
    // slowed: 20 baseline runs ~10ms, then 5 recent runs ~60ms (6x →
    // critical at the default 5x bar); recorded with strictly
    // increasing synthetic timestamps via distinct labels? record()
    // stamps wall time — order by insertion is preserved because each
    // call gets currentTimeMillis and ties sort stably by duration,
    // so make recent runs strictly later via a tiny sleep each 5 rows
    def burst(label: String, ms: Double, n: Int): Unit =
      (1 to n).foreach { _ =>
        audit.record(label, "collect", ms); Thread.sleep(2)
      }
    burst("MATCH (n:Doc) WHERE n.x > 1 RETURN n", 10.0, 20)
    burst("MATCH (n:Doc) WHERE n.x > 9 RETURN n", 60.0, 5) // same fingerprint
    // steady control at the same volume
    burst("MATCH (m:Other) RETURN count(m)", 12.0, 25)
    // short history (below baseline+recent): must not alert even if slow
    burst("MATCH (q:New) RETURN q", 500.0, 6)
    val alerts = QueryAnalytics.regressions(audit.toDF).collect()
    assert(alerts.length == 1, alerts.mkString("\n"))
    val a = alerts(0)
    assert(a.getAs[String]("severity") == "critical")
    assert(a.getAs[Double]("ratio") == 6.0)
    assert(a.getAs[Double]("baseline_ms") == 10.0)
    assert(a.getAs[Double]("current_ms") == 60.0)
    assert(a.getAs[String]("sample_label").contains("n.x > 9"))
    // 2x-5x classifies as warning
    val audit2 = new QueryAudit(spark)
    (1 to 20).foreach(_ => audit2.record("q", "collect", 10.0))
    Thread.sleep(5)
    (1 to 5).foreach(_ => audit2.record("q", "collect", 25.0))
    val warn = QueryAnalytics.regressions(audit2.toDF).collect()
    assert(warn.length == 1 && warn(0).getAs[String]("severity") == "warning")
    // a recovered query (recent back to baseline) clears
    Thread.sleep(5)
    (1 to 5).foreach(_ => audit2.record("q", "collect", 10.0))
    assert(QueryAnalytics.regressions(audit2.toDF).isEmpty)
  }

  test("regressions sinceMillis PRUNES day partitions of a partitioned " +
    "audit sink (flushTo partitionByDay) and bounds the alert scan") {
    import graft.ops.{QueryAnalytics, QueryAudit}
    import QueryAudit.AuditRecord
    import org.apache.spark.sql.functions.{col, timestamp_millis, to_date}
    val path = java.nio.file.Files.createTempDirectory("graft_paudit").toString
    // an OLD day (2024-01-01) that WOULD alert if scanned: 20 fast
    // runs then 5 slow ones under one label
    val oldMs = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val oldRows = (1 to 20).map(i =>
      AuditRecord(oldMs + i, "MATCH (o:Old) RETURN o", "collect",
        10.0, 1L, 0L, "", "success", "")) ++
      (21 to 25).map(i =>
        AuditRecord(oldMs + i, "MATCH (o:Old) RETURN o", "collect",
          80.0, 1L, 0L, "", "success", ""))
    oldRows.toDF()
      .withColumn("audit_date", to_date(timestamp_millis(col("tsMillis"))))
      .write.mode("append").partitionBy("audit_date").parquet(path)
    // the LIVE day through the real flushTo(partitionByDay) path
    val audit = new QueryAudit(spark)
    (1 to 20).foreach(_ => audit.record("MATCH (l:Live) RETURN l", "collect", 10.0))
    Thread.sleep(5)
    (1 to 5).foreach(_ => audit.record("MATCH (l:Live) RETURN l", "collect", 80.0))
    audit.flushTo(path, partitionByDay = true)
    val atRest = spark.read.parquet(path)
    assert(atRest.columns.contains("audit_date"))
    // unbounded: both days scanned, both fingerprints alert
    assert(QueryAnalytics.regressions(atRest).collect().length == 2)
    // 30-day horizon: only the live fingerprint alerts, and the scan
    // carries an audit_date PARTITION filter (directory pruning, not
    // a data filter over the full history)
    val since = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
    val reg = QueryAnalytics.regressions(atRest, sinceMillis = Some(since))
    val p = reg.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.filter(_.contains("PartitionFilters"))
        .mkString.contains("audit_date"),
      s"no partition pruning on audit_date:\n$p")
    val alerts = reg.collect()
    assert(alerts.length == 1, alerts.mkString("\n"))
    assert(alerts(0).getAs[String]("sample_label").contains("Live"))
  }

  test("analytics summary/baselines/trends over synthetic audit history") {
    import graft.ops.{QueryAnalytics, QueryAudit}
    val audit = new QueryAudit(spark)
    (1 to 9).foreach(i => audit.record("a", "collect", i * 10.0))
    audit.record("a", "collect", -1.0, status = "failure")
    val s = QueryAnalytics.summary(audit.toDF, slowThresholdMs = 45.0).collect()(0)
    assert(s.getAs[Long]("total_queries") == 10L)
    assert(s.getAs[Double]("error_rate") == 0.1)
    assert(s.getAs[Double]("p50_ms") == 50.0)   // exact interpolated median of 10..90
    assert(s.getAs[Double]("min_ms") == 10.0 && s.getAs[Double]("max_ms") == 90.0)
    assert(s.getAs[Long]("n_slow") == 5L)       // 50..90
    val b = QueryAnalytics.baselines(audit.toDF).collect()
    assert(b.length == 1 && b(0).getAs[Long]("n") == 9L &&
      b(0).getAs[Double]("median_ms") == 50.0)
    val t = QueryAnalytics.trends(audit.toDF, bucketSeconds = 3600L).collect()
    assert(t.map(_.getAs[Long]("query_count")).sum == 10L)
    assert(t.map(_.getAs[Long]("error_count")).sum == 1L)
    // text fingerprinting (no plan hash): literals collapse, so the
    // same structure with different constants shares a fingerprint
    import org.apache.spark.sql.functions.lit
    val fp = spark.range(1).select(
      QueryAnalytics.fingerprintCol(
        lit("MATCH (n) WHERE n.age > 30 RETURN n"), lit("")).as("f1"),
      QueryAnalytics.fingerprintCol(
        lit("MATCH  (n) WHERE n.age > 99  RETURN n"), lit("")).as("f2"),
      QueryAnalytics.fingerprintCol(
        lit("MATCH (n) WHERE n.name = 'x' RETURN m"), lit("")).as("f3"))
      .collect()(0)
    assert(fp.getString(0) == fp.getString(1))
    assert(fp.getString(0) != fp.getString(2))
  }
}
