package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}
import java.nio.file.Files

import graft.model.GraphCatalog
import graft.ops.CypherRepl

/** Interactive REPL over injectable streams (reference repl.py:79-958):
  * scripted sessions drive the SAME loop the stdin console runs —
  * dot-commands, timing/row counts, EXPLAIN/PROFILE, multi-line `;`,
  * templates, batch files, history persistence, completion.
  */
class ReplSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine: CypherEngine = {
    val person = Seq(
      (0L, "Alice", 30L),
      (1L, "Bob", 25L),
      (2L, "Carol", 35L)).toDF("__ID__", "name", "age")
    val knows = Seq((0L, 0L, 1L), (1L, 1L, 2L))
      .toDF("__ID__", "__SOURCE__", "__TARGET__")
    val cat = new GraphCatalog()
      .addEntity("Person", person)
      .addRelationship("KNOWS", knows,
        srcLabel = Some("Person"), dstLabel = Some("Person"))
    new CypherEngine(spark, cat)
  }

  /** Run a scripted session; returns the full transcript. */
  private def session(lines: String*): String = {
    val engine = freshEngine
    val out = new StringWriter()
    val repl = new CypherRepl(engine,
      new BufferedReader(new StringReader(lines.mkString("\n"))),
      new PrintWriter(out), historyFile = None)
    repl.run()
    out.toString
  }

  test("query executes with row count and timing") {
    val t = session("MATCH (p:Person) RETURN p.name AS name ORDER BY name;")
    assert(t.contains("Alice") && t.contains("Bob") && t.contains("Carol"))
    assert("""3 row\(s\)\s+\(\d+(\.\d+)? ms\)""".r.findFirstIn(t).isDefined, t)
  }

  test("multi-line input accumulates until ';'") {
    val t = session(
      "MATCH (p:Person)",
      "WHERE p.age > 26",
      "RETURN count(*) AS n;")
    // continuation prompt appears, then one result
    assert(t.contains(".> "))
    assert(t.contains("1 row(s)"))
    assert(t.contains("| 2"))
  }

  test("errors are reported, counted, and do not kill the loop") {
    val t = session(
      "MATCH (p:Nope) RETURN p;",
      "MATCH (p:Person) RETURN count(*) AS n;",
      ".metrics")
    assert(t.contains("Error:"))
    assert(t.contains("1 row(s)"))
    assert(t.contains("1 error(s)"), t)
  }

  test("EXPLAIN shows the plan without running; PROFILE shows a breakdown") {
    val t = session("EXPLAIN MATCH (p:Person) RETURN p.name;")
    assert(t.contains("complexity:") && t.contains("Physical Plan"), t)
    val p = session("PROFILE MATCH (p:Person) RETURN p.name AS name;")
    assert(p.contains("Query Profile:") && p.contains("Operator breakdown:"), p)
  }

  test(".help lists every dot-command") {
    val t = session(".help")
    CypherRepl.DotCommands.foreach(c => assert(t.contains(s".$c"), s"missing .$c"))
    assert(t.contains("EXPLAIN") && t.contains("PROFILE"))
  }

  test(".schema shows labels, relationship endpoints, and properties") {
    val t = session(".schema")
    assert(t.contains(":Person") && t.contains("(2 properties)"))
    assert(t.contains(".name") && t.contains(".age"))
    assert(t.contains("[:KNOWS]") && t.contains("(Person)->(Person)"))
  }

  test(".tables shows row and column counts") {
    val t = session(".tables")
    assert(t.contains("Person: 3 rows, 3 cols"))
    assert(t.contains("KNOWS: 2 rows, 3 cols"))
  }

  test(".functions lists the registry surface") {
    val t = session(".functions")
    assert(t.contains("available functions:"))
    Seq("count", "collect", "substring", "percentiledisc").foreach(f =>
      assert(t.contains(f), s"missing $f"))
  }

  test(".examples are schema-aware") {
    val t = session(".examples")
    assert(t.contains("MATCH (n:Person)"))
    assert(t.contains("[r:KNOWS]"))
  }

  test(".metrics aggregates session counts") {
    val t = session(
      "MATCH (p:Person) RETURN count(*) AS n;",
      "MATCH (p:Person) RETURN count(*) AS n;",
      ".metrics")
    assert(t.contains("2 queries"), t)
    // the analytics surface rides along: latency percentiles and the
    // (empty, here) regression report
    assert(t.contains("Latency: p50"), t)
    assert(t.contains("No query regressions detected."), t)
  }

  test("jline binding: completer adapts complete(text); runWith drives " +
    "the same loop with prompts") {
    import graft.ops.JlineConsole
    val engine = freshEngine
    val out = new StringWriter()
    val repl = new CypherRepl(engine,
      new BufferedReader(new StringReader("")),
      new PrintWriter(out), historyFile = None)
    // the jline Completer feeds candidates from the REPL surface
    val completer = JlineConsole.completer(repl)
    def candidatesFor(w: String): Seq[String] = {
      val parsed = new org.jline.reader.ParsedLine {
        override def word(): String = w
        override def wordCursor(): Int = w.length
        override def wordIndex(): Int = 0
        override def words(): java.util.List[String] =
          java.util.Collections.singletonList(w)
        override def line(): String = w
        override def cursor(): Int = w.length
      }
      val cands = new java.util.ArrayList[org.jline.reader.Candidate]()
      completer.complete(null, parsed, cands)
      scala.jdk.CollectionConverters.ListHasAsScala(cands).asScala
        .map(_.value()).toSeq
    }
    assert(candidatesFor("MAT").contains("MATCH"))
    assert(candidatesFor(".he").contains(".help"))
    assert(candidatesFor("Pers").contains("Person"))
    assert(candidatesFor("coun").exists(_.startsWith("count(")))
    // runWith: a scripted line source sees the standard + continuation
    // prompts and drives the same dispatch as run()
    val prompts = scala.collection.mutable.ArrayBuffer.empty[String]
    val script = Iterator(
      "MATCH (p:Person)", "RETURN count(*) AS n;", ".quit")
    repl.runWith { prompt =>
      prompts += prompt
      if (script.hasNext) Some(script.next()) else None
    }
    assert(prompts.take(3) == Seq("cypher> ", "    .> ", "cypher> "), prompts)
    assert(out.toString.contains("| 3"), out.toString)
  }

  test(".metrics surfaces a regression alert from the session audit") {
    val engine = freshEngine
    val out = new StringWriter()
    val repl = new CypherRepl(engine,
      new BufferedReader(new StringReader(
        "MATCH (p:Person) RETURN count(*) AS n;\n.metrics")),
      new PrintWriter(out), historyFile = None)
    // feed synthetic history sized to the REPL's interactive windows
    // (baseline 5 + recent 3): one fingerprint runs 5 x 10ms then
    // 3 x 80ms (8x -> critical). The real query above ensures
    // queryCount > 0 so doMetrics runs the analytics block.
    (1 to 5).foreach(_ => repl.audit.record("MATCH (d:Doc) RETURN d", "repl", 10.0))
    Thread.sleep(5)
    (1 to 3).foreach(_ => repl.audit.record("MATCH (d:Doc) RETURN d", "repl", 80.0))
    repl.run()
    val t = out.toString
    assert(t.contains("REGRESSION [critical]"), t)
    assert(t.contains("8.0x slower"), t)
    assert(t.count(_ == 'R') > 0 &&
      "REGRESSION".r.findAllIn(t).size == 1, t) // exactly one alert
  }

  test(".analytics binds the analytics reports to an at-rest audit sink") {
    val path = Files.createTempDirectory("graft_replaudit").toFile.getAbsolutePath
    val audit = new graft.ops.QueryAudit(spark)
    (1 to 20).foreach(_ => audit.record("MATCH (x:A) RETURN x", "collect", 10.0))
    Thread.sleep(5)
    (1 to 5).foreach(_ => audit.record("MATCH (x:A) RETURN x", "collect", 80.0))
    audit.flushTo(path)
    val t = session(
      s".analytics summary $path",
      s".analytics regressions $path",
      s".analytics baselines $path",
      ".analytics nope somewhere",
      ".analytics")
    assert(t.contains("total_queries"), t)     // summary header rendered
    assert(t.contains("critical"), t)          // the 8x regression alert
    assert(t.contains("median_ms"), t)         // baselines header
    assert(t.contains("Unknown analytics report 'nope'"), t)
    assert(t.contains("Usage: .analytics"), t)
  }

  test(".catalog save/versions/open round-trips the session graph " +
    "through disk, including time travel to an earlier version") {
    val dir = Files.createTempDirectory("graft_replcat").toFile.getAbsolutePath
    val t1 = session(
      s".catalog save $dir",
      "CREATE (p:Person {name: 'Dave', age: 40});",
      s".catalog save $dir",
      s".catalog versions $dir",
      ".catalog bogus x",
      ".catalog")
    assert(t1.contains("Catalog saved as v00001"), t1)
    assert(t1.contains("Catalog saved as v00002"), t1)
    assert(t1.contains("Versions: v00001, v00002"), t1)
    assert(t1.contains("Usage: .catalog"), t1)
    // a FRESH session opens the live snapshot (4 persons), then time-
    // travels to v00001 (3 persons — pre-mutation)
    val t2 = session(
      s".catalog open $dir",
      "MATCH (p:Person) RETURN count(*) AS n;",
      s".catalog open $dir v00001",
      "MATCH (p:Person) RETURN count(*) AS n;")
    assert(t2.contains("Catalog loaded"), t2)
    val counts = "\\| (\\d+) ".r.findAllMatchIn(t2).map(_.group(1)).toSeq
    assert(counts == Seq("4", "3"), s"$counts\n$t2")
  }

  test(".history and .search recall prior input") {
    val t = session(
      "MATCH (p:Person) RETURN count(*) AS n;",
      ".schema",
      ".history",
      ".search match",
      ".search zzznope")
    assert(t.contains("Recent history"))
    // the .search line itself is in history by dispatch time, like readline
    assert(t.contains("2 match(es) for 'match'"), t)
    assert(t.contains("1: MATCH (p:Person)"), t)
    // a .search always matches its own history entry, like readline;
    // 'zzznope' matches nothing else
    assert(t.contains("1 match(es) for 'zzznope'"), t)
  }

  test(".format switches table/csv/json output") {
    val csv = session(".format csv",
      "MATCH (p:Person) RETURN p.name AS name, p.age AS age ORDER BY name LIMIT 1;")
    assert(csv.contains("name,age") && csv.contains("Alice,30"), csv)
    val json = session(".format json",
      "MATCH (p:Person) RETURN p.name AS name ORDER BY name LIMIT 1;")
    assert(json.contains("\"name\" : \"Alice\""), json)
    val bad = session(".format yaml")
    assert(bad.contains("Unknown format 'yaml'"))
  }

  test(".template save/list/run/delete with $param substitution") {
    val t = session(
      ".template save byname MATCH (p:Person {name: '$name'}) RETURN p.age AS age",
      ".template list",
      ".template run byname name=Alice",
      ".template delete byname",
      ".template list")
    assert(t.contains("Template 'byname' saved."))
    assert(t.contains("1 template(s):"))
    assert(t.contains("Running: MATCH (p:Person {name: 'Alice'})"))
    assert(t.contains("| 30"), t)
    assert(t.contains("Template 'byname' deleted."))
    assert(t.contains("No templates saved."))
    val warn = session(
      ".template save q MATCH (p:Person {name: '$name'}) RETURN p",
      ".template run q")
    assert(warn.contains("unsubstituted parameters: $name"))
  }

  test(".batch runs queries from a file, skipping -- comments") {
    val f = Files.createTempFile("repl_batch", ".cypher")
    Files.write(f, java.util.List.of(
      "-- a comment",
      "MATCH (p:Person) RETURN count(*) AS n;",
      "",
      "MATCH (p:Person) WHERE p.age > 26 RETURN count(*) AS n;"))
    try {
      val t = session(s".batch $f", ".metrics")
      assert(t.contains("Running 2 queries"))
      assert(t.contains("[1/2]") && t.contains("[2/2]"))
      assert(t.contains("Batch complete: 2 queries."))
      assert(t.contains("2 queries,"), t) // both counted in metrics
    } finally Files.delete(f)
  }

  test(".load registers entity and relationship sources mid-session") {
    val dir = Files.createTempDirectory("repl_load")
    val cities = dir.resolve("cities.csv")
    Files.write(cities, java.util.List.of("cid,cname", "1,Oslo", "2,Bergen"))
    val edges = dir.resolve("edges.csv")
    Files.write(edges, java.util.List.of("s,t", "1,2"))
    try {
      val t = session(
        s".load entity City=$cities:cid",
        s".load rel NEAR=$edges:s:t",
        "MATCH (c:City) RETURN count(*) AS n;",
        ".load bogus x=y",
        ".load entity Broken=/nope/missing.csv")
      assert(t.contains("Loaded entity City") && t.contains("2 rows"), t)
      assert(t.contains("Loaded relationship NEAR"))
      assert(t.contains("| 2"))
      assert(t.contains("Unknown load type 'bogus'"))
      assert(t.contains("Error:"))
    } finally {
      Files.delete(cities); Files.delete(edges); Files.delete(dir)
    }
  }

  test("mutations run through the REPL and persist within the session") {
    val t = session(
      "CREATE (p:Person {name: 'Dave', age: 40});",
      "MATCH (p:Person) RETURN count(*) AS n;")
    assert(t.contains("| 4"), t)
  }

  test("unknown dot-command suggests close matches") {
    val t = session(".shcema", ".zzz")
    assert(t.contains("Did you mean") && t.contains(".schema"), t)
    assert(t.contains("Type .help for available commands."))
  }

  test("result display is driver-bounded: truncation note past maxRows") {
    val engine = freshEngine
    spark.conf.set("graft.repl.maxRows", "2")
    try {
      val out = new StringWriter()
      new CypherRepl(engine,
        new BufferedReader(new StringReader(
          "MATCH (p:Person) RETURN p.name AS name ORDER BY name;")),
        new PrintWriter(out), historyFile = None).run()
      val t = out.toString
      assert(t.contains("3 row(s)"))
      assert(t.contains("... (1 more rows"), t)
    } finally spark.conf.unset("graft.repl.maxRows")
  }

  test("history persists across sessions via the history file") {
    val f = Files.createTempFile("repl_hist", "")
    Files.delete(f)
    try {
      val out1 = new StringWriter()
      new CypherRepl(freshEngine,
        new BufferedReader(new StringReader("MATCH (p:Person) RETURN count(*) AS n;")),
        new PrintWriter(out1), historyFile = Some(f)).run()
      assert(Files.exists(f))
      val out2 = new StringWriter()
      new CypherRepl(freshEngine,
        new BufferedReader(new StringReader(".history")),
        new PrintWriter(out2), historyFile = Some(f)).run()
      assert(out2.toString.contains("MATCH (p:Person) RETURN count(*) AS n"), out2.toString)
    } finally Files.deleteIfExists(f)
  }

  test("completion surface: dot-commands, keywords, functions, labels, props") {
    val engine = freshEngine
    val repl = new CypherRepl(engine,
      new BufferedReader(new StringReader("")),
      new PrintWriter(new StringWriter()), historyFile = None)
    assert(repl.complete(".sch") == Seq(".schema"))
    assert(repl.complete("MAT").contains("MATCH"))
    assert(repl.complete("coun").contains("count("))
    assert(repl.complete("Pers").contains("Person"))
    assert(repl.complete("KNO").contains("KNOWS"))
    assert(repl.complete("p.na").contains("p.name"))
  }

  test(".quit ends the loop without reading further input") {
    val t = session(".quit", "MATCH (p:Person) RETURN count(*) AS n;")
    assert(!t.contains("row(s)"), t)
  }

  test("empty line executes the accumulated multi-line buffer") {
    val t = session(
      "MATCH (p:Person)",
      "RETURN count(*) AS n",
      "", // Enter on an empty line runs the buffer, per the banner
      "MATCH (p:Person) WHERE p.age > 26 RETURN count(*) AS n;")
    assert(t.contains("| 3"), t)
    assert(t.contains("| 2"), t)
  }

  test("Ctrl-C discard: discardPending clears the continuation buffer so " +
    "the empty line jline hands back is a no-op, not an execution") {
    val engine = freshEngine
    val out = new StringWriter()
    val repl = new CypherRepl(engine,
      new BufferedReader(new StringReader("")),
      new PrintWriter(out), historyFile = None)
    repl.handleLine("MATCH (p:Person)")
    assert(repl.discardPending())        // something WAS buffered
    repl.handleLine("")                  // the post-Ctrl-C empty line
    assert(!out.toString.contains("row(s)"), out.toString) // nothing ran
    assert(!repl.discardPending())       // buffer already clean
    // control: WITHOUT the discard, the empty line executes the buffer
    repl.handleLine("MATCH (p:Person)")
    repl.handleLine("RETURN count(*) AS n")
    repl.handleLine("")
    assert(out.toString.contains("1 row(s)"), out.toString)
  }

  test(".quit dispatches even while multi-line input is accumulating") {
    val t = session(
      "MATCH (p:Person)",
      ".quit",
      "MATCH (p:Person) RETURN count(*) AS n;")
    assert(!t.contains("row(s)"), t)
  }

  test(".batch supports multi-line queries split across file lines") {
    val f = Files.createTempFile("repl_batch_ml", ".cypher")
    Files.write(f, java.util.List.of(
      "MATCH (p:Person)",
      "WHERE p.age > 26",
      "RETURN count(*) AS n;",
      "-- trailing query without a semicolon still runs",
      "MATCH (p:Person) RETURN count(*) AS total"))
    try {
      val t = session(s".batch $f")
      assert(t.contains("Running 2 queries"), t)
      assert(t.contains("| 2"), t)
      assert(t.contains("| 3"), t)
    } finally Files.delete(f)
  }

  test("statement splitting ignores ';' inside string literals and backticks") {
    assert(CypherRepl.splitStatements(
      "RETURN 'a; b' AS x; RETURN \"c;\" AS y; MATCH (n:`w;t`) RETURN n") ==
      Seq("RETURN 'a; b' AS x", "RETURN \"c;\" AS y", "MATCH (n:`w;t`) RETURN n"))
    assert(CypherRepl.splitStatements("RETURN 'esc\\'; still' AS x; RETURN 1") ==
      Seq("RETURN 'esc\\'; still' AS x", "RETURN 1"))
  }
}
