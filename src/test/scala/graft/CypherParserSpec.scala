package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.CypherAst._
import graft.parser.CypherParser

class CypherParserSpec extends AnyFunSuite {

  test("MATCH/WHERE/RETURN shape") {
    val q = CypherParser.parse(
      "MATCH (p:Person) WHERE p.age > 28 RETURN p.name AS name, p.age AS age")
    val Seq(m: Match, r: Return) = q.statements.head.clauses: @unchecked
    assert(!m.optional && m.where.isDefined)
    assert(m.paths.head.start.labels == Seq("Person"))
    assert(r.projection.items.map(_.alias) == Seq(Some("name"), Some("age")))
  }

  test("relationship patterns: direction, types, var-length, props") {
    val q = CypherParser.parse(
      "MATCH (a:A)-[r:KNOWS*2..4 {since: 2020}]->(b:B), (b)<-[:REL]-(c), (a)-[]-(d) RETURN a")
    val m = q.statements.head.clauses.head.asInstanceOf[Match]
    val (r1, _) = m.paths(0).hops.head
    assert(r1.variable.contains("r") && r1.types == Seq("KNOWS"))
    assert(r1.varLength.contains((2, Some(4))) && r1.direction == "OUT")
    assert(r1.props == Seq(("since", IntLit(2020))))
    assert(m.paths(1).hops.head._1.direction == "IN")
    assert(m.paths(2).hops.head._1.direction == "BOTH")
  }

  test("keywords usable as labels and property keys") {
    val q = CypherParser.parse("MATCH (o:Order) WHERE o.end > 1 RETURN o.count AS n")
    val m = q.statements.head.clauses.head.asInstanceOf[Match]
    assert(m.paths.head.start.labels == Seq("Order"))
    assert(m.where.contains(BinOp(">", Property(Variable("o"), "end"), IntLit(1))))
  }

  test("expression precedence and chains") {
    val q = CypherParser.parse("RETURN 1 + 2 * 3 ^ 2 AS a, NOT true OR false AS b")
    val r = q.statements.head.clauses.head.asInstanceOf[Return]
    assert(r.projection.items.head.expr ==
      BinOp("+", IntLit(1), BinOp("*", IntLit(2), BinOp("^", IntLit(3), IntLit(2)))))
  }

  test("comparison chain desugars to AND") {
    val q = CypherParser.parse("RETURN 1 < 2 < 3 AS x")
    val e = q.statements.head.clauses.head.asInstanceOf[Return].projection.items.head.expr
    assert(e == BinOp("AND", BinOp("<", IntLit(1), IntLit(2)), BinOp("<", IntLit(2), IntLit(3))))
  }

  test("string predicates, IN, IS NULL, regex") {
    val q = CypherParser.parse(
      "MATCH (n:X) WHERE n.a STARTS WITH 'p' AND n.b IN [1,2] AND n.c IS NOT NULL AND n.d =~ '.*x' RETURN n")
    assert(q.statements.head.clauses.head.asInstanceOf[Match].where.isDefined)
  }

  test("CASE, comprehension, quantifier, reduce") {
    val q = CypherParser.parse(
      """RETURN CASE WHEN 1 > 0 THEN 'a' ELSE 'b' END AS c,
         [x IN [1,2,3] WHERE x > 1 | x * 2] AS l,
         any(y IN [1,2] WHERE y = 2) AS q,
         reduce(s = 0, z IN [1,2] | s + z) AS r""")
    val items = q.statements.head.clauses.head.asInstanceOf[Return].projection.items
    assert(items.size == 4)
    assert(items(1).expr.isInstanceOf[ListComprehension])
    assert(items(2).expr.isInstanceOf[Quantifier])
    assert(items(3).expr.isInstanceOf[Reduce])
  }

  test("UNION / UNION ALL chain") {
    val q = CypherParser.parse("RETURN 1 AS x UNION ALL RETURN 2 AS x UNION RETURN 3 AS x")
    assert(q.statements.size == 3 && q.unionAll == Seq(true, false))
  }

  test("WITH modifiers: DISTINCT, ORDER BY, SKIP, LIMIT, WHERE") {
    val q = CypherParser.parse(
      "MATCH (n:X) WITH DISTINCT n.a AS a ORDER BY a DESC SKIP 1 LIMIT 2 WHERE a > 0 RETURN a")
    val w = q.statements.head.clauses(1).asInstanceOf[With]
    assert(w.projection.distinct && w.projection.orderBy.head.descending)
    assert(w.projection.skip.contains(IntLit(1)) && w.projection.limit.contains(IntLit(2)))
    assert(w.where.isDefined)
  }

  test("mutations parse: CREATE, MERGE, SET, DELETE, REMOVE") {
    val q = CypherParser.parse(
      """CREATE (a:P {name: 'x'})-[:R]->(b:Q)
         MERGE (c:P {name: 'y'}) ON CREATE SET c.v = 1 ON MATCH SET c.v = 2
         SET a.z = 3
         REMOVE a.z
         DETACH DELETE b
         RETURN a""")
    val cs = q.statements.head.clauses
    assert(cs.exists(_.isInstanceOf[Create]) && cs.exists(_.isInstanceOf[Merge]))
    assert(cs.exists(_.isInstanceOf[SetClause]) && cs.exists(_.isInstanceOf[Remove]))
    assert(cs.collect { case d: Delete => d }.head.detach)
  }

  test("EXISTS block and exists(pattern)") {
    val q = CypherParser.parse(
      "MATCH (a:X) WHERE EXISTS { MATCH (a)-[:R]->(b:Y) WHERE b.v > 1 } RETURN a")
    val w = q.statements.head.clauses.head.asInstanceOf[Match].where.get
    assert(w.isInstanceOf[ExistsPattern])
  }

  test("syntax errors raise") {
    assertThrows[CypherParser.CypherSyntaxException](CypherParser.parse("MATCH (a:"))
    assertThrows[CypherParser.CypherSyntaxException](CypherParser.parse("RETURN"))
    assertThrows[CypherParser.CypherSyntaxException](CypherParser.parse("MATCH (a) RETURN a extra"))
  }
}
