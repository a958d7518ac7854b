package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CypherLsp

/** Scripted LSP sessions over in-memory streams — no process, no Spark.
  * Frames requests exactly as an editor would (Content-Length headers)
  * and parses the framed responses back out of the output stream.
  */
class LspSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def frame(json: String): Array[Byte] = {
    val body = json.getBytes(StandardCharsets.UTF_8)
    val header = s"Content-Length: ${body.length}\r\n\r\n"
    header.getBytes(StandardCharsets.US_ASCII) ++ body
  }

  /** Run a scripted session; returns every server message in order. */
  private def session(requests: String*): Seq[JsonNode] = {
    val in = new ByteArrayInputStream(requests.flatMap(frame).toArray)
    val out = new ByteArrayOutputStream()
    new CypherLsp(in, out).run()
    parseFrames(out.toByteArray)
  }

  private def parseFrames(bytes: Array[Byte]): Seq[JsonNode] = {
    val msgs = Seq.newBuilder[JsonNode]
    var i = 0
    while (i < bytes.length) {
      val headerEnd = {
        var j = i
        while (j + 3 < bytes.length &&
          !(bytes(j) == '\r' && bytes(j + 1) == '\n' &&
            bytes(j + 2) == '\r' && bytes(j + 3) == '\n')) j += 1
        j
      }
      val header = new String(bytes, i, headerEnd - i, StandardCharsets.US_ASCII)
      val len = header.linesIterator
        .collectFirst { case l if l.startsWith("Content-Length:") =>
          l.split(":")(1).trim.toInt }.get
      val bodyStart = headerEnd + 4
      msgs += mapper.readTree(new String(bytes, bodyStart, len, StandardCharsets.UTF_8))
      i = bodyStart + len
    }
    msgs.result()
  }

  private def req(id: Int, method: String, params: String = "{}"): String =
    s"""{"jsonrpc":"2.0","id":$id,"method":"$method","params":$params}"""

  private def notif(method: String, params: String): String =
    s"""{"jsonrpc":"2.0","method":"$method","params":$params}"""

  private def didOpen(uri: String, text: String): String = {
    val t = mapper.writeValueAsString(text)
    notif("textDocument/didOpen",
      s"""{"textDocument":{"uri":"$uri","text":$t}}""")
  }

  private def byId(msgs: Seq[JsonNode], id: Int): JsonNode =
    msgs.find(m => m.path("id").asInt(-1) == id).get.path("result")

  private def diagnosticsFor(msgs: Seq[JsonNode], uri: String): Seq[JsonNode] = {
    import scala.jdk.CollectionConverters._
    msgs.filter(m => m.path("method").asText("") == "textDocument/publishDiagnostics" &&
        m.path("params").path("uri").asText("") == uri)
      .flatMap(_.path("params").path("diagnostics").elements().asScala)
  }

  test("initialize advertises the full capability surface; exit ends the loop") {
    val msgs = session(req(1, "initialize"), notif("exit", "{}"))
    val caps = byId(msgs, 1).path("capabilities")
    assert(caps.path("hoverProvider").asBoolean())
    assert(caps.path("definitionProvider").asBoolean())
    assert(caps.path("documentFormattingProvider").asBoolean())
    assert(caps.path("textDocumentSync").path("openClose").asBoolean())
    assert(caps.path("completionProvider").path("triggerCharacters").size() == 3)
    assert(caps.path("signatureHelpProvider").has("triggerCharacters"))
    assert(byId(msgs, 1).path("serverInfo").path("name").asText() == "graft-cypher-lsp")
  }

  test("didOpen publishes lint diagnostics; didChange re-publishes; clean text clears") {
    val uri = "file:///q.cypher"
    val msgs = session(
      didOpen(uri, "match (n:Person) RETURN n.name AS name"),
      notif("textDocument/didChange",
        s"""{"textDocument":{"uri":"$uri"},"contentChanges":[{"text":"MATCH (n:Person) RETURN n.name AS name"}]}"""))
    val pubs = msgs.filter(_.path("method").asText("") == "textDocument/publishDiagnostics")
    assert(pubs.size == 2)
    import scala.jdk.CollectionConverters._
    val first = pubs.head.path("params").path("diagnostics").elements().asScala.toSeq
    assert(first.exists(d => d.path("severity").asInt() == 2 &&
      d.path("message").asText().contains("'match' should be uppercase")))
    assert(first.head.path("range").path("start").path("line").asInt() == 0)
    assert(pubs(1).path("params").path("diagnostics").size() == 0)
  }

  test("parse errors surface as severity-1 diagnostics") {
    val uri = "file:///broken.cypher"
    val msgs = session(didOpen(uri, "MATCH (n:Person RETURN"))
    val diags = diagnosticsFor(msgs, uri)
    assert(diags.exists(d => d.path("severity").asInt() == 1 &&
      d.path("message").asText().startsWith("Parse error")))
  }

  test("completion offers keywords and functions as snippets") {
    import scala.jdk.CollectionConverters._
    val msgs = session(req(2, "textDocument/completion",
      """{"textDocument":{"uri":"file:///q"},"position":{"line":0,"character":0}}"""))
    val items = byId(msgs, 2).elements().asScala.toSeq
    assert(items.exists(i => i.path("label").asText() == "MATCH" &&
      i.path("kind").asInt() == 14))
    assert(items.exists(i => i.path("label").asText() == "percentileDisc()" &&
      i.path("kind").asInt() == 3 && i.path("insertTextFormat").asInt() == 2))
    assert(items.exists(_.path("label").asText() == "substring()"))
  }

  test("hover documents functions and keywords, preferring two-word keywords") {
    val uri = "file:///h.cypher"
    val open = didOpen(uri, "MATCH (n:Person) RETURN substring(n.name, 0, 3) ORDER BY n.name")
    def hoverAt(id: Int, ch: Int) = req(id, "textDocument/hover",
      s"""{"textDocument":{"uri":"$uri"},"position":{"line":0,"character":$ch}}""")
    // ch=27 inside "substring"; ch=50 inside "ORDER"
    val msgs = session(open, hoverAt(3, 27), hoverAt(4, 50))
    val fn = byId(msgs, 3).path("contents").path("value").asText()
    assert(fn.contains("substring(original, start, [length])"))
    assert(fn.contains("0-based"))
    val kw = byId(msgs, 4).path("contents").path("value").asText()
    assert(kw.contains("ORDER BY"))
  }

  test("definition jumps to the variable's binding site") {
    val uri = "file:///d.cypher"
    val text = "MATCH (who:Person)-[:KNOWS]->(b:Person)\nRETURN who.name AS n"
    // cursor on "who" in RETURN (line 1, char 8)
    val msgs = session(didOpen(uri, text), req(5, "textDocument/definition",
      s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":8}}"""))
    val loc = byId(msgs, 5)
    // the Location must echo the request's document uri — an empty uri
    // makes go-to-definition a silent no-op in real editors
    assert(loc.path("uri").asText() == uri)
    assert(loc.path("range").path("start").path("line").asInt() == 0)
    assert(loc.path("range").path("start").path("character").asInt() == 7)
  }

  test("signature help tracks the active parameter through commas") {
    val uri = "file:///s.cypher"
    val text = "RETURN substring('hello', 1"
    val msgs = session(didOpen(uri, text), req(6, "textDocument/signatureHelp",
      s"""{"textDocument":{"uri":"$uri"},"position":{"line":0,"character":${text.length}}}"""))
    val r = byId(msgs, 6)
    assert(r.path("signatures").get(0).path("label").asText()
      .startsWith("substring("))
    assert(r.path("activeParameter").asInt() == 1)
    assert(r.path("signatures").get(0).path("parameters").size() == 3)
  }

  test("formatting returns one whole-document TextEdit with the canonical form") {
    val uri = "file:///f.cypher"
    val msgs = session(
      didOpen(uri, "match (n:Person) where n.age > 1 return n.name as name"),
      req(7, "textDocument/formatting", s"""{"textDocument":{"uri":"$uri"}}"""))
    val edits = byId(msgs, 7)
    assert(edits.size() == 1)
    val newText = edits.get(0).path("newText").asText()
    assert(newText ==
      """MATCH (n:Person)
        |  WHERE n.age > 1
        |RETURN n.name AS name""".stripMargin)
    assert(edits.get(0).path("range").path("start").path("line").asInt() == 0)
  }

  test("shutdown responds null; unknown requests respond null; didClose drops the doc") {
    val uri = "file:///c.cypher"
    val msgs = session(
      didOpen(uri, "MATCH (n:Person) RETURN n.name AS x"),
      notif("textDocument/didClose", s"""{"textDocument":{"uri":"$uri"}}"""),
      // formatting a closed doc: empty edit list, not a crash
      req(8, "textDocument/formatting", s"""{"textDocument":{"uri":"$uri"}}"""),
      req(9, "some/unknownMethod"),
      req(10, "shutdown"))
    assert(byId(msgs, 8).size() == 0)
    assert(byId(msgs, 9).isNull)
    assert(byId(msgs, 10).isNull)
  }
}
