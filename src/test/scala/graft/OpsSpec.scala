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

  test("explain includes complexity and the physical plan") {
    val eng = engineWith(None)
    val text = eng.explain("MATCH (p:Person) WHERE p.age > 26 RETURN p.name AS n")
    assert(text.contains("complexity:"))
    assert(text.contains("Physical Plan") || text.contains("Scan"))
  }
}
