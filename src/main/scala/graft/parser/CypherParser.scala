package graft.parser

import scala.collection.mutable.ArrayBuffer

import CypherAst._

/** Hand-rolled openCypher lexer + recursive-descent/Pratt parser.
  *
  * Grammar coverage mirrors the reference's Lark BNF surface
  * (/root/reference/packages/pycypher/src/pycypher/grammar_parser.py:70+,
  * ast_converter.py) re-derived from the public openCypher grammar:
  * MATCH / OPTIONAL MATCH (multi-path, var-length, shortestPath),
  * WHERE, WITH, RETURN (DISTINCT / ORDER BY / SKIP / LIMIT), UNWIND,
  * UNION [ALL], CREATE, MERGE (ON CREATE/ON MATCH), SET, DELETE,
  * DETACH DELETE, REMOVE, CALL ... YIELD, and the full expression
  * surface (3VL boolean ops, comparison chains, string predicates,
  * IN, IS [NOT] NULL, CASE, list/map literals, comprehensions,
  * quantifiers, reduce, exists, slicing/indexing, label predicates).
  */
object CypherParser {

  // ---------------- lexer ----------------
  sealed trait Tok { def text: String }
  final case class TIdent(text: String) extends Tok
  /** Keyword token: `text` is the uppercased form (used for matching),
    * `raw` preserves source casing so keywords can serve as
    * labels/property names (`:Order`, `x.end`). */
  final class TKw(val text: String, val raw: String) extends Tok
  object TKw {
    def apply(up: String, raw: String): TKw = new TKw(up, raw)
    def unapply(t: TKw): Option[String] = Some(t.text)
  }
  final case class TInt(text: String) extends Tok
  final case class TFloat(text: String) extends Tok
  final case class TStr(text: String) extends Tok // unescaped value
  final case class TParam(text: String) extends Tok
  final case class TSym(text: String) extends Tok
  case object TEof extends Tok { val text = "<EOF>" }

  private val keywords = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "AS", "UNWIND", "UNION",
    "ALL", "DISTINCT", "ORDER", "BY", "ASC", "DESC", "ASCENDING", "DESCENDING",
    "SKIP", "LIMIT", "AND", "OR", "XOR", "NOT", "IN", "STARTS", "ENDS",
    "CONTAINS", "IS", "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE",
    "END", "CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE", "ON",
    "CALL", "YIELD", "EXISTS", "ANY", "NONE", "SINGLE", "REDUCE", "FOREACH")

  def tokenize(s: String): IndexedSeq[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = s.length
    def peekc(k: Int): Char = if (i + k < n) s.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && peekc(1) == '/') { while (i < n && s.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peekc(1) == '*') {
        i += 2; while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i += 2
      }
      else if (c.isDigit || (c == '.' && peekc(1).isDigit &&
        // ".." range vs decimal: a lone '.' followed by digit is a float start
        (out.isEmpty || !out.last.isInstanceOf[TInt]))) {
        val start = i
        var isFloat = false
        while (i < n && s.charAt(i).isDigit) i += 1
        if (i < n && s.charAt(i) == '.' && peekc(1).isDigit) {
          isFloat = true; i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E') &&
          (peekc(1).isDigit || ((peekc(1) == '+' || peekc(1) == '-') && peekc(2).isDigit))) {
          isFloat = true; i += 1
          if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        val text = s.substring(start, i)
        out += (if (isFloat) TFloat(text) else TInt(text))
      }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != quote) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = s.charAt(i + 1)
            sb += (e match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'b' => '\b'; case 'f' => '\f'
              case other => other
            })
            i += 2
          } else { sb += ch; i += 1 }
        }
        if (i >= n) throw new CypherSyntaxException(s"unterminated string literal")
        i += 1
        out += TStr(sb.toString)
      }
      else if (c == '`') {
        val start = i + 1
        i += 1
        while (i < n && s.charAt(i) != '`') i += 1
        if (i >= n) throw new CypherSyntaxException("unterminated backtick identifier")
        out += TIdent(s.substring(start, i))
        i += 1
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val text = s.substring(start, i)
        val up = text.toUpperCase
        out += (if (keywords.contains(up)) TKw(up, text) else TIdent(text))
      }
      else if (c == '$') {
        val start = i + 1
        i += 1
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TParam(s.substring(start, i))
      }
      else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "<>" || two == "=~" || two == "..") {
          out += TSym(two); i += 2
        } else {
          out += TSym(c.toString); i += 1
        }
      }
    }
    out += TEof
    out.toIndexedSeq
  }

  final class CypherSyntaxException(msg: String) extends RuntimeException(msg)

  // ---------------- parser ----------------
  def parse(query: String): Query = new P(tokenize(query)).parseQuery()

  private final class P(toks: IndexedSeq[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def peekAt(k: Int): Tok = toks(math.min(pos + k, toks.length - 1))
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(msg: String): Nothing =
      throw new CypherSyntaxException(s"$msg at token ${pos} ('${peek.text}')")

    private def isKw(k: String): Boolean = peek match {
      case TKw(t) => t == k; case _ => false
    }
    private def eatKw(k: String): Unit =
      if (isKw(k)) pos += 1 else fail(s"expected $k")
    private def tryKw(k: String): Boolean = { if (isKw(k)) { pos += 1; true } else false }
    private def isSym(s0: String): Boolean = peek match {
      case TSym(t) => t == s0; case _ => false
    }
    private def eatSym(s0: String): Unit =
      if (isSym(s0)) pos += 1 else fail(s"expected '$s0'")
    private def trySym(s0: String): Boolean = { if (isSym(s0)) { pos += 1; true } else false }
    /** Name position where ANY keyword is legal (labels, rel types,
      * property keys, map keys): `:Order`, `x.end`, `{count: 1}`. */
    private def labelIdent(): String = peek match {
      case TIdent(t) => pos += 1; t
      case t: TKw    => pos += 1; t.raw
      case _         => fail("expected name")
    }

    private def ident(): String = peek match {
      case TIdent(t) => pos += 1; t
      // allow non-reserved-feeling keywords as identifiers where safe
      case TKw(t) if Set("ANY", "ALL", "NONE", "SINGLE", "CONTAINS", "END",
        "COUNT", "EXISTS").contains(t) => pos += 1; t.toLowerCase
      case _ => fail("expected identifier")
    }

    // ----- query / clauses -----
    def parseQuery(): Query = {
      val stmts = ArrayBuffer(parseSingleQuery())
      val alls = ArrayBuffer.empty[Boolean]
      while (isKw("UNION")) {
        eatKw("UNION")
        alls += tryKw("ALL")
        stmts += parseSingleQuery()
      }
      if (peek != TEof && !isKw("UNION")) {
        if (isSym(";")) pos += 1 else if (peek != TEof) fail("unexpected trailing input")
      }
      Query(stmts.toSeq, alls.toSeq)
    }

    private def parseSingleQuery(): SingleQuery = {
      val clauses = ArrayBuffer.empty[Clause]
      var done = false
      while (!done) {
        peek match {
          case TKw("MATCH") => pos += 1; clauses += parseMatch(optional = false)
          case TKw("OPTIONAL") => pos += 1; eatKw("MATCH"); clauses += parseMatch(optional = true)
          case TKw("UNWIND") =>
            pos += 1
            val e = parseExpr()
            eatKw("AS")
            clauses += Unwind(e, ident())
          case TKw("WITH") => pos += 1; clauses += parseWith()
          case TKw("RETURN") => pos += 1; clauses += Return(parseProjection())
          case TKw("CREATE") => pos += 1; clauses += Create(parsePatternList())
          case TKw("MERGE") =>
            pos += 1
            val p = parsePathPattern()
            var onCreate = Seq.empty[SetItem]; var onMatch = Seq.empty[SetItem]
            while (isKw("ON")) {
              pos += 1
              if (tryKw("CREATE")) { eatKw("SET"); onCreate = parseSetItems() }
              else { eatKw("MATCH"); eatKw("SET"); onMatch = parseSetItems() }
            }
            clauses += Merge(p, onCreate, onMatch)
          case TKw("SET") => pos += 1; clauses += SetClause(parseSetItems())
          case TKw("DETACH") => pos += 1; eatKw("DELETE"); clauses += parseDelete(detach = true)
          case TKw("DELETE") => pos += 1; clauses += parseDelete(detach = false)
          case TKw("REMOVE") => pos += 1; clauses += parseRemove()
          case TKw("CALL") => pos += 1; clauses += parseCall()
          // Neo4j administration-show surface, desugared onto the
          // procedure registry: SHOW PROCEDURES ≡
          // CALL db.procedures() YIELD name RETURN name ORDER BY name
          case TIdent(t) if t.equalsIgnoreCase("SHOW") &&
              clauses.isEmpty && (peekAt(1) match {
                case TIdent(w) => w.equalsIgnoreCase("PROCEDURES")
                case _         => false
              }) =>
            pos += 2
            val item = ReturnItem(Variable("name"), None)
            clauses += CallProcedure("db.procedures", Seq.empty, Seq(item))
            clauses += Return(Projection(Seq(item), star = false,
              distinct = false,
              orderBy = Seq(OrderItem(Variable("name"), descending = false)),
              skip = None, limit = None))
          case TKw("FOREACH") =>
            pos += 1
            eatSym("(")
            val v = ident()
            eatKw("IN")
            val list = parseExpr()
            eatSym("|")
            val body = ArrayBuffer.empty[Clause]
            var bodyDone = false
            while (!bodyDone) {
              peek match {
                case TKw("SET") => pos += 1; body += SetClause(parseSetItems())
                case TKw("CREATE") => pos += 1; body += Create(parsePatternList())
                case TKw("MERGE") => pos += 1; body += Merge(parsePathPattern(), Seq.empty, Seq.empty)
                case TKw("DELETE") => pos += 1; body += parseDelete(detach = false)
                case TKw("DETACH") => pos += 1; eatKw("DELETE"); body += parseDelete(detach = true)
                case TKw("REMOVE") => pos += 1; body += parseRemove()
                case _ => bodyDone = true
              }
            }
            eatSym(")")
            clauses += Foreach(v, list, body.toSeq)
          case _ => done = true
        }
      }
      if (clauses.isEmpty) fail("empty query")
      SingleQuery(clauses.toSeq)
    }

    private def parseMatch(optional: Boolean): Match = {
      val paths = parsePatternList()
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      Match(paths, where, optional)
    }

    private def parseWith(): With = {
      val proj = parseProjection()
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      With(proj, where)
    }

    private def parseProjection(): Projection = {
      val distinct = tryKw("DISTINCT")
      var star = false
      val items = ArrayBuffer.empty[ReturnItem]
      if (isSym("*")) { pos += 1; star = true }
      if (!star || isSym(",")) {
        if (star) eatSym(",")
        items += parseReturnItem()
        while (trySym(",")) items += parseReturnItem()
      }
      val orderBy = ArrayBuffer.empty[OrderItem]
      if (isKw("ORDER")) {
        pos += 1; eatKw("BY")
        def one(): Unit = {
          val e = parseExpr()
          val desc = if (tryKw("DESC") || tryKw("DESCENDING")) true
          else { tryKw("ASC"); tryKw("ASCENDING"); false }
          orderBy += OrderItem(e, desc)
        }
        one(); while (trySym(",")) one()
      }
      val skip = if (tryKw("SKIP")) Some(parseExpr()) else None
      val limit = if (tryKw("LIMIT")) Some(parseExpr()) else None
      Projection(items.toSeq, star, distinct, orderBy.toSeq, skip, limit)
    }

    private def parseReturnItem(): ReturnItem = {
      val e = parseExpr()
      val alias = if (tryKw("AS")) Some(ident()) else None
      ReturnItem(e, alias)
    }

    private def parseDelete(detach: Boolean): Delete = {
      val es = ArrayBuffer(parseExpr())
      while (trySym(",")) es += parseExpr()
      Delete(es.toSeq, detach)
    }

    private def parseSetItems(): Seq[SetItem] = {
      val items = ArrayBuffer.empty[SetItem]
      def one(): Unit = {
        val startPos = pos
        val v = ident()
        if (isSym(".")) {
          pos += 1
          val key = labelIdent()
          eatSym("=")
          items += SetProperty(Variable(v), key, parseExpr())
        } else if (isSym(":")) {
          val labels = ArrayBuffer.empty[String]
          while (trySym(":")) labels += ident()
          items += SetLabels(v, labels.toSeq)
        } else if (isSym("=") || (isSym("+") && peekAt(1) == TSym("="))) {
          val additive = isSym("+")
          if (additive) { pos += 1 }
          eatSym("=")
          items += SetVariable(v, parseExpr(), additive)
        } else { pos = startPos; fail("bad SET item") }
      }
      one(); while (trySym(",")) one()
      items.toSeq
    }

    private def parseRemove(): Remove = {
      val items = ArrayBuffer.empty[RemoveItem]
      def one(): Unit = {
        val v = ident()
        if (isSym(".")) { pos += 1; items += RemoveProperty(Variable(v), labelIdent()) }
        else {
          val labels = ArrayBuffer.empty[String]
          while (trySym(":")) labels += ident()
          items += RemoveLabels(v, labels.toSeq)
        }
      }
      one(); while (trySym(",")) one()
      Remove(items.toSeq)
    }

    private def parseCall(): CallProcedure = {
      val name = new StringBuilder(ident())
      while (isSym(".")) { pos += 1; name.append('.').append(ident()) }
      val args = ArrayBuffer.empty[Expr]
      if (trySym("(")) {
        if (!isSym(")")) { args += parseExpr(); while (trySym(",")) args += parseExpr() }
        eatSym(")")
      }
      val yields = ArrayBuffer.empty[ReturnItem]
      if (tryKw("YIELD")) {
        yields += parseReturnItem(); while (trySym(",")) yields += parseReturnItem()
      }
      CallProcedure(name.toString, args.toSeq, yields.toSeq)
    }

    // ----- patterns -----
    private def parsePatternList(): Seq[PathPattern] = {
      val ps = ArrayBuffer(parsePathPattern())
      while (trySym(",")) ps += parsePathPattern()
      ps.toSeq
    }

    private def parsePathPattern(): PathPattern = {
      // [var =] [shortestPath(] (n)-[...]-(m) [)]
      var pathVar: Option[String] = None
      peek match {
        case TIdent(v) if peekAt(1) == TSym("=") && peekAt(2) != TSym("=") =>
          pathVar = Some(v); pos += 2
        case _ =>
      }
      var shortest: Option[String] = None
      peek match {
        case TIdent(f) if (f.equalsIgnoreCase("shortestPath") ||
          f.equalsIgnoreCase("allShortestPaths")) && peekAt(1) == TSym("(") =>
          shortest = Some(if (f.equalsIgnoreCase("shortestPath")) "shortest" else "allShortest")
          pos += 2
        case _ =>
      }
      val start = parseNodePattern()
      val hops = ArrayBuffer.empty[(RelPattern, NodePattern)]
      while (isSym("-") || isSym("<")) {
        val rel = parseRelPattern()
        val node = parseNodePattern()
        hops += ((rel, node))
      }
      if (shortest.isDefined) eatSym(")")
      PathPattern(pathVar, start, hops.toSeq, shortest)
    }

    private def parseNodePattern(): NodePattern = {
      eatSym("(")
      var variable: Option[String] = None
      peek match {
        case TIdent(_) => variable = Some(ident())
        case _ =>
      }
      val labels = ArrayBuffer.empty[String]
      while (trySym(":")) labels += labelIdent()
      val props = if (isSym("{")) parseMapEntries() else Seq.empty
      eatSym(")")
      NodePattern(variable, labels.toSeq, props)
    }

    private def parseRelPattern(): RelPattern = {
      // directions: -[...]-> | <-[...]- | -[...]- | --> | <-- | --
      var left = false
      if (trySym("<")) { left = true }
      eatSym("-")
      var variable: Option[String] = None
      val types = ArrayBuffer.empty[String]
      var props: Seq[(String, Expr)] = Seq.empty
      var varLength: Option[(Int, Option[Int])] = None
      if (trySym("[")) {
        peek match {
          case TIdent(_) => variable = Some(ident())
          case _ =>
        }
        if (trySym(":")) {
          types += labelIdent()
          while (trySym("|")) { trySym(":"); types += labelIdent() }
        }
        if (trySym("*")) {
          var lo = 1
          var hi: Option[Int] = None
          peek match {
            case TInt(t) => pos += 1; lo = t.toInt; hi = Some(t.toInt)
            case _ =>
          }
          if (trySym("..")) {
            hi = None
            peek match {
              case TInt(t) => pos += 1; hi = Some(t.toInt)
              case _ =>
            }
          }
          varLength = Some((lo, hi))
        }
        if (isSym("{")) props = parseMapEntries()
        eatSym("]")
      }
      eatSym("-")
      var right = false
      if (!left && trySym(">")) right = true
      val dir = if (left) "IN" else if (right) "OUT" else "BOTH"
      RelPattern(variable, types.toSeq, props, dir, varLength)
    }

    private def parseMapEntries(): Seq[(String, Expr)] = {
      eatSym("{")
      val entries = ArrayBuffer.empty[(String, Expr)]
      if (!isSym("}")) {
        def one(): Unit = {
          val k = peek match {
            case TIdent(t) => pos += 1; t
            case t: TKw    => pos += 1; t.raw
            case TStr(t)   => pos += 1; t
            case _ => fail("expected map key")
          }
          eatSym(":")
          entries += ((k, parseExpr()))
        }
        one(); while (trySym(",")) one()
      }
      eatSym("}")
      entries.toSeq
    }

    // ----- expressions (precedence climbing) -----
    def parseExpr(): Expr = parseOr()

    private def parseOr(): Expr = {
      var e = parseXor()
      while (tryKw("OR")) e = BinOp("OR", e, parseXor())
      e
    }
    private def parseXor(): Expr = {
      var e = parseAnd()
      while (tryKw("XOR")) e = BinOp("XOR", e, parseAnd())
      e
    }
    private def parseAnd(): Expr = {
      var e = parseNot()
      while (tryKw("AND")) e = BinOp("AND", e, parseNot())
      e
    }
    private def parseNot(): Expr =
      if (tryKw("NOT")) UnaryOp("NOT", parseNot()) else parseComparison()

    private def parseComparison(): Expr = {
      var e = parseAddSub()
      val parts = ArrayBuffer.empty[Expr] // chain a < b < c => (a<b) AND (b<c)
      var chain: Expr = null
      var done = false
      while (!done) {
        val opOpt: Option[String] = peek match {
          case TSym(t) if Set("=", "<>", "<", "<=", ">", ">=", "=~").contains(t) => Some(t)
          case TKw("IN") => Some("IN")
          case TKw("STARTS") => Some("STARTS WITH")
          case TKw("ENDS") => Some("ENDS WITH")
          case TKw("CONTAINS") => Some("CONTAINS")
          case TKw("IS") => Some("IS")
          case _ => None
        }
        opOpt match {
          case None => done = true
          case Some("IS") =>
            pos += 1
            val negated = tryKw("NOT")
            eatKw("NULL")
            val cmp = IsNull(e, negated)
            chain = if (chain == null) cmp else BinOp("AND", chain, cmp)
            done = true
          case Some(op) =>
            pos += 1
            if (op == "STARTS WITH" || op == "ENDS WITH") eatKw("WITH")
            val rhs = parseAddSub()
            val cmp = BinOp(op, e, rhs)
            chain = if (chain == null) cmp else BinOp("AND", chain, cmp)
            e = rhs
        }
      }
      if (chain == null) e else chain
    }

    private def parseAddSub(): Expr = {
      var e = parseMulDiv()
      var done = false
      while (!done) {
        if (isSym("+")) { pos += 1; e = BinOp("+", e, parseMulDiv()) }
        else if (isSym("-")) { pos += 1; e = BinOp("-", e, parseMulDiv()) }
        else done = true
      }
      e
    }
    private def parseMulDiv(): Expr = {
      var e = parsePow()
      var done = false
      while (!done) {
        if (isSym("*")) { pos += 1; e = BinOp("*", e, parsePow()) }
        else if (isSym("/")) { pos += 1; e = BinOp("/", e, parsePow()) }
        else if (isSym("%")) { pos += 1; e = BinOp("%", e, parsePow()) }
        else done = true
      }
      e
    }
    private def parsePow(): Expr = {
      val base = parseUnary()
      if (isSym("^")) { pos += 1; BinOp("^", base, parsePow()) } else base
    }
    private def parseUnary(): Expr =
      if (isSym("-")) { pos += 1; UnaryOp("-", parseUnary()) }
      else if (isSym("+")) { pos += 1; parseUnary() }
      else parsePostfix()

    private def parsePostfix(): Expr = {
      var e = parseAtom()
      var done = false
      while (!done) {
        if (isSym(".")) {
          // var.ident( => dotted function call (e.g. date.truncate, db.labels)
          (e, peekAt(1), peekAt(2)) match {
            case (Variable(base), TIdent(f), TSym("(")) =>
              pos += 2
              e = parseCallArgs(s"$base.$f")
            case _ =>
              pos += 1
              e = Property(e, labelIdent())
          }
        } else if (isSym("[")) {
          pos += 1
          if (isSym("..")) { // l[..to]
            pos += 1
            val to = if (isSym("]")) None else Some(parseExpr())
            eatSym("]")
            e = Slice(e, None, to)
          } else {
            val first = parseExpr()
            if (trySym("..")) {
              val to = if (isSym("]")) None else Some(parseExpr())
              eatSym("]")
              e = Slice(e, Some(first), to)
            } else { eatSym("]"); e = Index(e, first) }
          }
        } else if (isSym(":") && e.isInstanceOf[Variable] &&
          (peekAt(1).isInstanceOf[TIdent] || peekAt(1).isInstanceOf[TKw])) {
          val labels = ArrayBuffer.empty[String]
          while (isSym(":") && (peekAt(1).isInstanceOf[TIdent] || peekAt(1).isInstanceOf[TKw])) {
            pos += 1; labels += labelIdent()
          }
          e = HasLabel(e, labels.toSeq)
        } else done = true
      }
      e
    }

    private def parseCallArgs(name: String): Expr = {
      // assumes '(' is current token
      eatSym("(")
      if (name.equalsIgnoreCase("count") && isSym("*")) {
        pos += 1; eatSym(")")
        return CountStar
      }
      val distinct = tryKw("DISTINCT")
      val args = ArrayBuffer.empty[Expr]
      if (!isSym(")")) { args += parseExpr(); while (trySym(",")) args += parseExpr() }
      eatSym(")")
      FnCall(name, args.toSeq, distinct)
    }

    private def looksLikePattern(): Boolean = {
      // at '(' — a pattern if "(ident? :" or "()" or "(ident)" followed by -[ / <- / --
      if (!isSym("(")) return false
      val save = pos
      try {
        pos += 1
        peek match { case TIdent(_) => pos += 1; case _ => }
        if (isSym(":") || isSym("{")) { pos = save; return true }
        if (isSym(")")) {
          val after = peekAt(1)
          pos = save
          return after == TSym("-") || after == TSym("<")
        }
        pos = save
        false
      } finally if (pos != save) pos = save
    }

    private def parseAtom(): Expr = {
      peek match {
        case TInt(t) => pos += 1; IntLit(t.toLong)
        case TFloat(t) => pos += 1; FloatLit(t.toDouble)
        case TStr(t) => pos += 1; StrLit(t)
        case TParam(t) => pos += 1; Param(t)
        case TKw("TRUE") => pos += 1; BoolLit(true)
        case TKw("FALSE") => pos += 1; BoolLit(false)
        case TKw("NULL") => pos += 1; NullLit
        case TKw("CASE") => pos += 1; parseCase()
        case TKw("COUNT") if peekAt(1) == TSym("(") => pos += 1; parseCallArgs("count")
        case TKw(q @ ("ANY" | "ALL" | "NONE" | "SINGLE")) if peekAt(1) == TSym("(") =>
          pos += 1; parseQuantifier(q.toLowerCase)
        case TKw("REDUCE") if peekAt(1) == TSym("(") => pos += 1; parseReduce()
        case TKw("EXISTS") =>
          pos += 1
          if (isSym("{")) parseExistsBlock()
          else if (isSym("(")) {
            // exists((a)-[:T]->(b)) pattern predicate or exists(n.prop);
            // the pattern form arrives wrapped: exists( <path> )
            val save = pos
            pos += 1 // consume outer '('
            if (looksLikePattern()) {
              val path = parsePathPattern()
              eatSym(")")
              ExistsPattern(Seq(path), None)
            } else { pos = save; parseCallArgs("exists") }
          } else fail("EXISTS requires { } or ( )")
        case TIdent(_) if peekAt(1) == TSym("(") =>
          val name = ident()
          parseCallArgs(name)
        case TIdent(_) =>
          // bare pattern predicate like (a)-[:T]->(b) never starts with ident
          Variable(ident())
        case TSym("(") =>
          if (looksLikePattern()) {
            val path = parsePathPattern()
            ExistsPattern(Seq(path), None)
          } else {
            pos += 1
            val e = parseExpr()
            eatSym(")")
            e
          }
        case TSym("[") =>
          pos += 1
          parseListOrComprehension()
        case TSym("{") => MapLit(parseMapEntries())
        case other => fail(s"unexpected token '${other.text}'")
      }
    }

    private def parseExistsBlock(): Expr = {
      eatSym("{")
      tryKw("MATCH")
      val paths = parsePatternList()
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      eatSym("}")
      ExistsPattern(paths, where)
    }

    private def parseCase(): Expr = {
      val subject = if (!isKw("WHEN")) Some(parseExpr()) else None
      val branches = ArrayBuffer.empty[(Expr, Expr)]
      while (tryKw("WHEN")) {
        val w = parseExpr()
        eatKw("THEN")
        branches += ((w, parseExpr()))
      }
      val default = if (tryKw("ELSE")) Some(parseExpr()) else None
      eatKw("END")
      CaseExpr(subject, branches.toSeq, default)
    }

    private def parseQuantifier(kind: String): Expr = {
      eatSym("(")
      val v = ident()
      eatKw("IN")
      val list = parseExpr()
      eatKw("WHERE")
      val pred = parseExpr()
      eatSym(")")
      Quantifier(kind, v, list, pred)
    }

    private def parseReduce(): Expr = {
      eatSym("(")
      val acc = ident()
      eatSym("=")
      val init = parseExpr()
      eatSym(",")
      val v = ident()
      eatKw("IN")
      val list = parseExpr()
      eatSym("|")
      val step = parseExpr()
      eatSym(")")
      Reduce(acc, init, v, list, step)
    }

    private def parseListOrComprehension(): Expr = {
      // after '['
      if (isSym("]")) { pos += 1; return ListLit(Seq.empty) }
      (peek, peekAt(1)) match {
        case (TIdent(v), TKw("IN")) =>
          pos += 2
          val list = parseExpr()
          val where = if (tryKw("WHERE")) Some(parseExpr()) else None
          val proj = if (trySym("|")) Some(parseExpr()) else None
          eatSym("]")
          ListComprehension(v, list, where, proj)
        case _ if looksLikePattern() =>
          // pattern comprehension [(a)-[:R]->(b) WHERE … | expr]
          val path = parsePathPattern()
          val where = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatSym("|")
          val proj = parseExpr()
          eatSym("]")
          PatternComprehension(path, where, proj)
        case _ =>
          val items = ArrayBuffer(parseExpr())
          while (trySym(",")) items += parseExpr()
          eatSym("]")
          ListLit(items.toSeq)
      }
    }
  }
}
