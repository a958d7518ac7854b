package graft.ops

/** Cypher query formatter + linter — the Spark-side counterpart of the
  * reference's `query_formatter.py` (/root/reference/packages/pycypher/
  * src/pycypher/query_formatter.py:1-379): uppercase keywords outside
  * string literals, clause-per-line layout, indented sub-clauses, and
  * lint diagnostics (keyword case, trailing whitespace, parse errors).
  * Pure string/AST work — no Spark session involved, usable from CLI
  * hooks and editor integrations alike.
  */
object QueryFormatter {

  /** Clause keywords that begin a new line (longest-first matching, so
    * OPTIONAL MATCH wins over MATCH, ON CREATE SET over SET).
    */
  private val ClauseKeywords: Seq[String] = Seq(
    "OPTIONAL MATCH", "DETACH DELETE", "ON CREATE SET", "ON MATCH SET",
    "ORDER BY", "UNION ALL", "MATCH", "WHERE", "WITH", "RETURN", "SKIP",
    "LIMIT", "CREATE", "MERGE", "DELETE", "SET", "REMOVE", "UNWIND",
    "FOREACH", "CALL", "YIELD", "UNION")

  private val AllKeywords: Seq[String] = ClauseKeywords ++ Seq(
    "IS NOT NULL", "STARTS WITH", "ENDS WITH", "DESCENDING", "ASCENDING",
    "IS NULL", "CONTAINS", "DISTINCT", "SINGLE", "EXISTS", "AND", "XOR",
    "NOT", "CASE", "WHEN", "THEN", "ELSE", "NONE", "DESC", "TRUE",
    "FALSE", "NULL", "ALL", "ANY", "ASC", "END", "OR", "IN", "AS", "BY")

  private val IndentAfter = Set("WHERE", "SET", "ON CREATE SET", "ON MATCH SET")

  /** Split into (isString, fragment) runs so keyword rewriting never
    * touches quoted literals (the reference's
    * `_tokenize_preserving_strings`).
    */
  private[ops] def tokenizePreservingStrings(text: String): Seq[(Boolean, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    val buf = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        if (buf.nonEmpty) { out += ((false, buf.toString)); buf.clear() }
        val quote = c
        val s = new StringBuilder().append(c)
        i += 1
        var done = false
        while (i < text.length && !done) {
          if (text.charAt(i) == '\\' && i + 1 < text.length) {
            s.append(text.charAt(i)).append(text.charAt(i + 1)); i += 2
          } else if (text.charAt(i) == quote) {
            s.append(quote); i += 1; done = true
          } else { s.append(text.charAt(i)); i += 1 }
        }
        out += ((true, s.toString))
      } else { buf.append(c); i += 1 }
    }
    if (buf.nonEmpty) out += ((false, buf.toString))
    out.toSeq
  }

  /** `(?<!\.)` keeps property accesses like `n.in` untouched — a
    * keyword-colliding identifier after a dot is an identifier, not a
    * keyword (backtick-quoted identifiers are excluded earlier, by the
    * string tokenizer).
    */
  private def keywordRegex(kw: String): scala.util.matching.Regex =
    ("(?i)(?<!\\.)\\b" + java.util.regex.Pattern.quote(kw)
      .replace(" ", "\\E\\s+\\Q") + "\\b").r

  private val uppercasePatterns: Seq[(scala.util.matching.Regex, String)] =
    AllKeywords.sortBy(-_.length).map(kw => keywordRegex(kw) -> kw)

  private def uppercaseFragment(fragment: String): String =
    uppercasePatterns.foldLeft(fragment) { case (acc, (re, kw)) =>
      re.replaceAllIn(acc, java.util.regex.Matcher.quoteReplacement(kw))
    }

  /** Format: normalize whitespace, uppercase keywords (outside
    * strings), one clause per line, indent sub-clauses.
    */
  def format(query: String, uppercase: Boolean = true, indent: Int = 2): String = {
    if (query == null || query.trim.isEmpty) return query
    // collapse whitespace OUTSIDE string literals only — `'a  b'` must
    // survive formatting byte-identical (the LSP applies format() as a
    // whole-document edit, so a literal rewrite would alter semantics)
    val collapsed = tokenizePreservingStrings(query).map {
      case (true, s)  => s
      case (false, s) => s.replaceAll("\\s+", " ")
    }.mkString.trim
    val upped =
      if (!uppercase) collapsed
      else tokenizePreservingStrings(collapsed).map {
        case (true, s)  => s
        case (false, s) => uppercaseFragment(s)
      }.mkString
    // newline before each clause keyword occurring outside strings
    val clausePat = ("(?i)\\s+(" + ClauseKeywords.sortBy(-_.length)
      .map(kw => java.util.regex.Pattern.quote(kw)
        .replace(" ", "\\E\\s+\\Q")).mkString("|") + ")\\b").r
    // shield literal newlines inside strings from the line pass below;
    // they are restored verbatim at the end
    val NL = '\u0000' // unrepresentable in a query, restored below
    val lined = tokenizePreservingStrings(upped).map {
      case (true, s)  => s.replace('\n', NL)
      case (false, s) => clausePat.replaceAllIn(s, m => "\n" + m.group(1))
    }.mkString
    lined.split("\n").map(_.trim).filter(_.nonEmpty).map { line =>
      val first2 = line.split("\\s+").take(3)
      val heads = Seq(first2.take(1), first2.take(2), first2.take(3))
        .map(_.mkString(" ").toUpperCase)
      if (heads.exists(IndentAfter.contains)) (" " * indent) + line else line
    }.mkString("\n").replace(NL, '\n')
  }

  /** One lint finding (1-based line/column). */
  final case class LintIssue(line: Int, column: Int, message: String,
                             severity: String = "warning")

  /** Lint: keyword case, trailing whitespace, parse errors (via the
    * real parser — the reference falls back the same way).
    */
  def lint(query: String): Seq[LintIssue] = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[LintIssue]
    query.split("\n", -1).zipWithIndex.foreach { case (line, idx) =>
      val lineNum = idx + 1
      val stripped = line.replaceAll("\\s+$", "")
      if (stripped != line)
        issues += LintIssue(lineNum, stripped.length + 1, "Trailing whitespace")
      var col = 1
      tokenizePreservingStrings(line).foreach { case (isString, tok) =>
        if (!isString) {
          AllKeywords.sortBy(-_.length).foreach { kw =>
            keywordRegex(kw).findAllMatchIn(tok).foreach { m =>
              if (m.matched.split("\\s+").mkString(" ") != kw)
                issues += LintIssue(lineNum, col + m.start,
                  s"Keyword '${m.matched}' should be uppercase: $kw")
            }
          }
        }
        col += tok.length
      }
    }
    try graft.parser.CypherParser.parse(query)
    catch {
      case e: Exception =>
        issues += LintIssue(1, 0, s"Parse error: ${e.getMessage}", "error")
    }
    issues.toSeq
  }
}
