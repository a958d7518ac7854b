package graft.ops

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Language Server Protocol server for graft Cypher, speaking framed
  * JSON-RPC ("Content-Length: N" headers, then an N-byte JSON body)
  * over a pair of injectable streams, so editors attach via stdio and
  * specs drive a scripted session in-memory with no process.
  *
  * Supported methods (the reference's editor surface,
  * packages/pycypher/src/pycypher/cypher_lsp.py:30-38):
  *   - initialize / initialized / shutdown / exit
  *   - textDocument/didOpen | didChange | didClose (full-document sync;
  *     open and change publish diagnostics)
  *   - textDocument/completion: clause keywords + scalar and aggregate
  *     functions (snippet inserts)
  *   - textDocument/hover: keyword and function documentation
  *   - textDocument/definition: jump to a variable's binding site
  *   - textDocument/signatureHelp: parameter hints inside a call
  *   - textDocument/formatting: whole-document TextEdit via
  *     QueryFormatter.format
  *
  * Re-grounded for graft: diagnostics reuse `QueryFormatter.lint`
  * (which runs the real `CypherParser`, so parse errors are severity-1
  * and style findings severity-2); documentation is a curated table
  * over the `FunctionRegistry` surface rather than runtime registry
  * introspection (the registry compiles straight to Catalyst columns,
  * so there is no metadata object to reflect on).
  */
final class CypherLsp(in: InputStream, out: OutputStream) {
  import CypherLsp._

  private val docs = mutable.LinkedHashMap.empty[String, String]
  private var running = true

  /** Serve until `exit` or EOF. */
  def run(): Unit =
    while (running) readMessage() match {
      case Some(msg) => handle(msg)
      case None      => running = false
    }

  // ----------------- transport -----------------

  private def readMessage(): Option[JsonNode] = {
    var contentLength = -1
    var line = readHeaderLine()
    while (line.exists(_.nonEmpty)) {
      line.get.split(":", 2) match {
        case Array(k, v) if k.trim.equalsIgnoreCase("Content-Length") =>
          contentLength = try v.trim.toInt catch { case _: NumberFormatException => -1 }
        case _ => () // other headers (Content-Type) are ignored
      }
      line = readHeaderLine()
    }
    if (line.isEmpty || contentLength <= 0 || contentLength > MaxContentLength) None
    else {
      val body = new Array[Byte](contentLength)
      var off = 0
      while (off < contentLength) {
        val n = in.read(body, off, contentLength - off)
        if (n < 0) return None
        off += n
      }
      try Some(mapper.readTree(body)) catch { case _: Exception => None }
    }
  }

  /** One CRLF- (or LF-) terminated header line; None at EOF. */
  private def readHeaderLine(): Option[String] = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    Some(sb.toString)
  }

  private def send(msg: ObjectNode): Unit = {
    val body = mapper.writeValueAsBytes(msg)
    out.write(s"Content-Length: ${body.length}\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.write(body)
    out.flush()
  }

  private def respond(id: JsonNode, result: JsonNode): Unit = {
    val m = obj("jsonrpc" -> "2.0")
    m.set[ObjectNode]("id", id)
    m.set[ObjectNode]("result", result)
    send(m)
  }

  private def notify(method: String, params: ObjectNode): Unit = {
    val m = obj("jsonrpc" -> "2.0", "method" -> method)
    m.set[ObjectNode]("params", params)
    send(m)
  }

  // ----------------- dispatch -----------------

  private def handle(msg: JsonNode): Unit = {
    val method = msg.path("method").asText("")
    val params = msg.path("params")
    val id = msg.get("id")
    method match {
      case "initialize"  => respond(id, initializeResult())
      case "initialized" => ()
      case "textDocument/didOpen" =>
        val td = params.path("textDocument")
        storeAndDiagnose(td.path("uri").asText(""), td.path("text").asText(""))
      case "textDocument/didChange" =>
        val uri = params.path("textDocument").path("uri").asText("")
        val changes = params.path("contentChanges")
        if (changes.isArray && changes.size() > 0)
          storeAndDiagnose(uri, changes.get(changes.size() - 1).path("text").asText(""))
      case "textDocument/didClose" =>
        docs.remove(params.path("textDocument").path("uri").asText(""))
      case "textDocument/completion"    => respond(id, completions())
      case "textDocument/hover"         => respond(id, atPosition(params)(hover))
      case "textDocument/definition" =>
        val uri = params.path("textDocument").path("uri").asText("")
        respond(id, atPosition(params)(definition(uri, _, _, _)))
      case "textDocument/signatureHelp" => respond(id, atPosition(params)(signatureHelp))
      case "textDocument/formatting" =>
        val text = docs.getOrElse(params.path("textDocument").path("uri").asText(""), "")
        respond(id, formattingEdits(text))
      case "shutdown" => respond(id, mapper.nullNode())
      case "exit"     => running = false
      case _          => if (id != null) respond(id, mapper.nullNode())
    }
  }

  private def atPosition(params: JsonNode)(
      f: (String, Int, Int) => JsonNode): JsonNode = {
    val text = docs.getOrElse(params.path("textDocument").path("uri").asText(""), "")
    val pos = params.path("position")
    f(text, pos.path("line").asInt(0), pos.path("character").asInt(0))
  }

  private def storeAndDiagnose(uri: String, text: String): Unit = {
    docs.remove(uri) // re-insert so eviction order is recency-of-touch
    docs.put(uri, text)
    while (docs.size > MaxDocuments) docs.remove(docs.head._1)
    publishDiagnostics(uri, text)
  }

  private def initializeResult(): ObjectNode = {
    val caps = obj()
    caps.set[ObjectNode]("textDocumentSync", obj("openClose" -> true, "change" -> 1))
    val completion = obj()
    completion.set[ObjectNode]("triggerCharacters", arr(".", ":", "("))
    caps.set[ObjectNode]("completionProvider", completion)
    caps.put("hoverProvider", true)
    caps.put("definitionProvider", true)
    val sig = obj()
    sig.set[ObjectNode]("triggerCharacters", arr("(", ","))
    caps.set[ObjectNode]("signatureHelpProvider", sig)
    caps.put("documentFormattingProvider", true)
    val r = obj()
    r.set[ObjectNode]("capabilities", caps)
    r.set[ObjectNode]("serverInfo", obj("name" -> "graft-cypher-lsp", "version" -> "0.1.0"))
    r
  }

  // ----------------- diagnostics -----------------

  private def publishDiagnostics(uri: String, text: String): Unit = {
    val diags = mapper.createArrayNode()
    val firstLineLen = text.takeWhile(_ != '\n').length
    QueryFormatter.lint(text).foreach { i =>
      if (i.severity == "error") // parser has no position: flag line 1
        diags.add(diagnostic(0, 0, 0, math.max(firstLineLen, 1), 1, i.message))
      else
        diags.add(diagnostic(i.line - 1, math.max(0, i.column - 1),
          i.line - 1, i.column + 10, 2, i.message))
    }
    val p = obj("uri" -> uri)
    p.set[ObjectNode]("diagnostics", diags)
    notify("textDocument/publishDiagnostics", p)
  }

  private def diagnostic(l0: Int, c0: Int, l1: Int, c1: Int,
                         severity: Int, message: String): ObjectNode = {
    val d = obj("severity" -> severity, "source" -> "graft", "message" -> message)
    d.set[ObjectNode]("range", range(l0, c0, l1, c1))
    d
  }

  // ----------------- completion -----------------

  private def completions(): ArrayNode = {
    val items = mapper.createArrayNode()
    Keywords.foreach { kw =>
      items.add(obj("label" -> kw, "kind" -> 14, "detail" -> "Cypher keyword",
        "insertText" -> kw))
    }
    FunctionDocs.values.foreach { d =>
      val name = d.signature.takeWhile(_ != '(')
      val item = obj("label" -> s"$name()", "kind" -> 3, "detail" -> d.detail,
        "insertText" -> s"$name($$0)")
      item.put("insertTextFormat", 2) // snippet
      items.add(item)
    }
    items
  }

  // ----------------- hover -----------------

  private def hover(text: String, line: Int, character: Int): JsonNode = {
    val word = wordAt(text, line, character)
    if (word.isEmpty) return mapper.nullNode()
    val md = FunctionDocs.get(word.toLowerCase).map { d =>
      s"**${d.signature}** — ${d.detail}\n\n${d.description}\n\n```\n${d.example}\n```"
    }.orElse(keywordDocAt(text, line, word))
    md.fold[JsonNode](mapper.nullNode()) { v =>
      val h = obj()
      h.set[ObjectNode]("contents", obj("kind" -> "markdown", "value" -> v))
      h
    }
  }

  /** Keyword doc, preferring two-word forms (ORDER BY, OPTIONAL MATCH)
    * around the hovered word.
    */
  private def keywordDocAt(text: String, line: Int, word: String): Option[String] = {
    val row = text.split("\n", -1).lift(line).getOrElse("").toLowerCase
    KeywordDocs.collectFirst {
      case (k, doc) if k.contains(" ") && row.contains(k) && k.split(" ").contains(word.toLowerCase) => doc
    }.orElse(KeywordDocs.get(word.toLowerCase))
  }

  // ----------------- definition -----------------

  /** First binding site of the variable under the cursor: the earliest
    * `(v`, `[v` (pattern binding) or `UNWIND ... AS v` / `AS v`
    * occurrence strictly before any later re-mention.
    */
  private def definition(uri: String, text: String, line: Int,
                         character: Int): JsonNode = {
    val word = wordAt(text, line, character)
    if (word.isEmpty) return mapper.nullNode()
    val q = java.util.regex.Pattern.quote(word)
    val binder = s"(?:[(\\[]\\s*|\\bAS\\s+)($q)\\b".r
    text.split("\n", -1).zipWithIndex.iterator.flatMap { case (row, ln) =>
      binder.findAllMatchIn(row).map(m => (ln, m.start(1)))
    }.toSeq.headOption.fold[JsonNode](mapper.nullNode()) { case (ln, col) =>
      // Location.uri must echo the request's document — an empty uri
      // makes go-to-definition a silent no-op in real editors.
      val loc = obj("uri" -> uri)
      loc.set[ObjectNode]("range", range(ln, col, ln, col + word.length))
      loc
    }
  }

  // ----------------- signature help -----------------

  private def signatureHelp(text: String, line: Int, character: Int): JsonNode = {
    enclosingCall(text, line, character) match {
      case Some((name, activeParam)) =>
        FunctionDocs.get(name.toLowerCase).fold[JsonNode](mapper.nullNode()) { d =>
          val params = mapper.createArrayNode()
          d.params.foreach(p => params.add(obj("label" -> p)))
          val sig = obj("label" -> d.signature, "documentation" -> d.description)
          sig.set[ObjectNode]("parameters", params)
          val sigs = mapper.createArrayNode(); sigs.add(sig)
          val r = obj("activeSignature" -> 0,
            "activeParameter" -> math.min(activeParam, math.max(d.params.size - 1, 0)))
          r.set[ObjectNode]("signatures", sigs)
          r
        }
      case None => mapper.nullNode()
    }
  }

  /** Walk back from the cursor to the unmatched open paren; return the
    * function name before it and the comma count at depth zero.
    */
  private def enclosingCall(text: String, line: Int,
                            character: Int): Option[(String, Int)] = {
    val row = text.split("\n", -1).lift(line).getOrElse("")
    val prefix = row.take(character)
    var depth = 0
    var commas = 0
    var i = prefix.length - 1
    while (i >= 0) {
      prefix.charAt(i) match {
        case ')' => depth += 1
        case ',' if depth == 0 => commas += 1
        case '(' if depth > 0 => depth -= 1
        case '(' =>
          val m = "([A-Za-z_]\\w*)\\s*$".r.findFirstMatchIn(prefix.substring(0, i))
          return m.map(mm => (mm.group(1), commas))
        case _ => ()
      }
      i -= 1
    }
    None
  }

  // ----------------- formatting -----------------

  private def formattingEdits(text: String): ArrayNode = {
    val edits = mapper.createArrayNode()
    if (text.isEmpty) return edits
    try {
      val formatted = QueryFormatter.format(text)
      val lines = text.split("\n", -1)
      val edit = obj("newText" -> formatted)
      edit.set[ObjectNode]("range",
        range(0, 0, lines.length - 1, lines.last.length))
      edits.add(edit)
    } catch { case _: Exception => () } // unformattable: no edits
    edits
  }

  // ----------------- helpers -----------------

  private def wordAt(text: String, line: Int, character: Int): String = {
    val row = text.split("\n", -1).lift(line).getOrElse("")
    "[A-Za-z_]\\w*".r.findAllMatchIn(row)
      .find(m => m.start <= character && character <= m.end)
      .map(_.matched).getOrElse("")
  }

  private def range(l0: Int, c0: Int, l1: Int, c1: Int): ObjectNode = {
    val r = obj()
    r.set[ObjectNode]("start", obj("line" -> l0, "character" -> c0))
    r.set[ObjectNode]("end", obj("line" -> l1, "character" -> c1))
    r
  }

  private def obj(fields: (String, Any)*): ObjectNode = {
    val o = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String)  => o.put(k, v)
      case (k, v: Int)     => o.put(k, v)
      case (k, v: Boolean) => o.put(k, v)
      case (k, v)          => o.put(k, String.valueOf(v))
    }
    o
  }

  private def arr(items: String*): ArrayNode = {
    val a = mapper.createArrayNode()
    items.foreach(a.add)
    a
  }
}

object CypherLsp {
  private val mapper = new ObjectMapper()
  private val MaxContentLength = 10 * 1024 * 1024
  private val MaxDocuments = 128

  /** Stdio entry point: `sbt "runMain graft.ops.CypherLsp"`. */
  def main(args: Array[String]): Unit =
    new CypherLsp(System.in, System.out).run()

  /** Completion keyword surface (reference cypher_lsp.py:461-520). */
  val Keywords: Seq[String] = Seq(
    "MATCH", "OPTIONAL MATCH", "WHERE", "RETURN", "WITH", "ORDER BY",
    "SKIP", "LIMIT", "CREATE", "MERGE", "DELETE", "DETACH DELETE", "SET",
    "REMOVE", "UNWIND", "FOREACH", "CALL", "YIELD", "UNION", "UNION ALL",
    "AND", "OR", "XOR", "NOT", "IN", "AS", "DISTINCT", "IS NULL",
    "IS NOT NULL", "STARTS WITH", "ENDS WITH", "CONTAINS", "EXISTS",
    "CASE", "WHEN", "THEN", "ELSE", "END", "TRUE", "FALSE", "NULL",
    "ASC", "DESC")

  final case class FunctionDoc(signature: String, params: Seq[String],
                               description: String, example: String,
                               detail: String = "Scalar function")

  /** Curated documentation over the FunctionRegistry surface — the
    * hover, completion, and signature-help data source.
    */
  val FunctionDocs: Map[String, FunctionDoc] = {
    def s(sig: String, desc: String, ex: String) = {
      val params = sig.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
        .split(",").map(_.trim.stripSuffix("]").stripPrefix("[")).filter(_.nonEmpty).toSeq
      FunctionDoc(sig, params, desc, ex)
    }
    def a(sig: String, desc: String, ex: String) =
      s(sig, desc, ex).copy(detail = "Aggregate function")
    Map(
      // aggregates
      "count" -> a("count(expr)", "Count rows or non-null values", "count(n) or count(*)"),
      "sum" -> a("sum(expr)", "Sum numeric values", "sum(n.price)"),
      "avg" -> a("avg(expr)", "Arithmetic mean", "avg(n.score)"),
      "min" -> a("min(expr)", "Minimum value (also list minimum)", "min(n.age)"),
      "max" -> a("max(expr)", "Maximum value (also list maximum)", "max(n.age)"),
      "collect" -> a("collect(expr)", "Collect values into a list", "collect(n.name)"),
      "stdev" -> a("stDev(expr)", "Sample standard deviation", "stDev(n.value)"),
      "stdevp" -> a("stDevP(expr)", "Population standard deviation", "stDevP(n.value)"),
      "percentiledisc" -> a("percentileDisc(expr, percentile)",
        "Discrete percentile: an actual element of the group (exact inverse-distribution)",
        "percentileDisc(n.score, 0.5)"),
      "percentilecont" -> a("percentileCont(expr, percentile)",
        "Continuous (interpolated) percentile", "percentileCont(n.score, 0.5)"),
      // strings
      "toupper" -> s("toUpper(string)", "Uppercase a string", "toUpper(n.name)"),
      "tolower" -> s("toLower(string)", "Lowercase a string", "toLower(n.name)"),
      "substring" -> s("substring(original, start, [length])",
        "Substring from a 0-based offset", "substring('hello', 1, 3)"),
      "trim" -> s("trim(string)", "Strip leading and trailing whitespace", "trim(n.raw)"),
      "ltrim" -> s("lTrim(string)", "Strip leading whitespace", "lTrim(n.raw)"),
      "rtrim" -> s("rTrim(string)", "Strip trailing whitespace", "rTrim(n.raw)"),
      "replace" -> s("replace(original, search, replacement)",
        "Replace every occurrence of a substring", "replace(n.s, 'a', 'b')"),
      "split" -> s("split(string, delimiter)", "Split into a list of strings",
        "split('a,b', ',')"),
      "reverse" -> s("reverse(value)", "Reverse a string or list", "reverse(n.name)"),
      "left" -> s("left(string, length)", "Leftmost characters", "left(n.name, 3)"),
      "right" -> s("right(string, length)", "Rightmost characters", "right(n.name, 3)"),
      "size" -> s("size(value)", "Length of a string, list, or map", "size(n.tags)"),
      "tostring" -> s("toString(expr)", "Convert a value to its string form", "toString(n.age)"),
      // conversions
      "tointeger" -> s("toInteger(expr)", "Convert to integer (truncating floats, parsing strings)",
        "toInteger('3.7')"),
      "tofloat" -> s("toFloat(expr)", "Convert to float", "toFloat('2.5')"),
      "toboolean" -> s("toBoolean(expr)", "Convert to boolean", "toBoolean('true')"),
      // math
      "abs" -> s("abs(number)", "Absolute value", "abs(n.delta)"),
      "ceil" -> s("ceil(number)", "Smallest integer at or above", "ceil(0.1)"),
      "floor" -> s("floor(number)", "Largest integer at or below", "floor(0.9)"),
      "round" -> s("round(number, [precision], [mode])",
        "Round to a precision with an optional rounding mode", "round(3.141, 2)"),
      "sqrt" -> s("sqrt(number)", "Square root", "sqrt(256)"),
      "sign" -> s("sign(number)", "Signum: -1, 0, or 1", "sign(n.delta)"),
      "exp" -> s("exp(number)", "e raised to the power", "exp(1)"),
      "log" -> s("log(number)", "Natural logarithm", "log(n.x)"),
      "log10" -> s("log10(number)", "Base-10 logarithm", "log10(1000)"),
      "rand" -> s("rand()", "Uniform random double in [0, 1)", "rand()"),
      "pi" -> s("pi()", "The constant pi", "pi()"),
      // lists
      "range" -> s("range(start, end, [step])", "List of integers, end-inclusive",
        "range(0, 10, 2)"),
      "head" -> s("head(list)", "First element", "head(n.tags)"),
      "tail" -> s("tail(list)", "All but the first element", "tail(n.tags)"),
      "last" -> s("last(list)", "Last element", "last(n.tags)"),
      "keys" -> s("keys(value)", "Property or map keys as a list", "keys(n)"),
      "reduce" -> s("reduce(acc = init, x IN list | expr)",
        "Fold a list into a single value", "reduce(s = 0, x IN [1,2,3] | s + x)"),
      // entity introspection
      "id" -> s("id(entity)", "Internal id of a node or relationship", "id(n)"),
      "elementid" -> s("elementId(entity)", "String element id", "elementId(n)"),
      "labels" -> s("labels(node)", "Labels of a node as a list", "labels(n)"),
      "type" -> s("type(relationship)", "Relationship type name", "type(r)"),
      "properties" -> s("properties(entity)", "All properties as a map", "properties(n)"),
      "coalesce" -> s("coalesce(expr, ...)", "First non-null argument",
        "coalesce(n.nick, n.name)"),
      "nullif" -> s("nullIf(a, b)", "Null when both arguments are equal", "nullIf(n.x, 0)"),
      "randomuuid" -> s("randomUUID()", "Random UUID string", "randomUUID()"),
      // temporal
      "date" -> s("date([value])", "A calendar date", "date('2026-01-01')"),
      "datetime" -> s("datetime([value])", "A timestamp with date and time",
        "datetime('2026-01-01T12:00:00')"),
      "duration" -> s("duration(value)", "A duration from an ISO-8601 string or map",
        "duration('P1DT2H')"),
      "timestamp" -> s("timestamp()", "Milliseconds since the epoch", "timestamp()"),
      // paths
      "nodes" -> s("nodes(path)", "Nodes along a path as a list", "nodes(p)"),
      "relationships" -> s("relationships(path)", "Relationships along a path", "relationships(p)"))
  }

  /** Keyword hover docs (reference cypher_lsp.py:656-707). */
  val KeywordDocs: Map[String, String] = Map(
    "match" -> "**MATCH** — Find graph patterns.\n\nBinds variables to nodes and relationships matching a pattern.",
    "optional match" -> "**OPTIONAL MATCH** — Left outer join pattern.\n\nLike MATCH, but yields NULL bindings when nothing matches.",
    "where" -> "**WHERE** — Filter results.\n\nApplies a boolean predicate to rows from MATCH or WITH.",
    "return" -> "**RETURN** — Project results.\n\nDefines the expressions in the query output.",
    "with" -> "**WITH** — Intermediate projection.\n\nPipes results between query parts, enabling chained transformations.",
    "create" -> "**CREATE** — Create graph elements.\n\nInserts new nodes and relationships.",
    "merge" -> "**MERGE** — Match or create.\n\nEnsures a pattern exists; creates it if missing.",
    "delete" -> "**DELETE** — Remove graph elements.\n\nUse DETACH DELETE for nodes that still have relationships.",
    "set" -> "**SET** — Update properties.\n\nSets property values or labels on nodes and relationships.",
    "remove" -> "**REMOVE** — Remove properties or labels.",
    "unwind" -> "**UNWIND** — Expand a list.\n\nTurns a list into one row per element.",
    "foreach" -> "**FOREACH** — Iterate and mutate.\n\nApplies mutations for each element of a list.",
    "order by" -> "**ORDER BY** — Sort results.\n\nSorts output rows by one or more expressions (ASC or DESC).",
    "skip" -> "**SKIP** — Skip rows.\n\nSkips the first N rows of the result.",
    "limit" -> "**LIMIT** — Limit rows.\n\nAt most N rows of output.",
    "union" -> "**UNION** — Combine results.\n\nDeduplicates by default; UNION ALL keeps duplicates.",
    "exists" -> "**EXISTS** — Existence check.\n\nTrue when the subpattern has at least one match.",
    "case" -> "**CASE** — Conditional expression.\n\nWHEN/THEN branches with an optional ELSE.",
    "distinct" -> "**DISTINCT** — Deduplicate results.",
    "call" -> "**CALL** — Invoke a procedure.\n\nExecutes a procedure and optionally YIELDs its columns.")
}
