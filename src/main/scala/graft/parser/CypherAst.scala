package graft.parser

/** Typed openCypher AST, mirroring the shape of the reference's Pydantic
  * AST models (/root/reference/packages/pycypher/src/pycypher/ast_models/
  * clauses.py:25-410, expressions.py:26-516) as a sealed Scala hierarchy.
  * Construction is parser-only; the compiler consumes it immutably.
  */
object CypherAst {

  // ---------- expressions ----------
  sealed trait Expr

  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(items: Seq[(String, Expr)]) extends Expr
  final case class Param(name: String) extends Expr

  final case class Variable(name: String) extends Expr
  final case class Property(subject: Expr, key: String) extends Expr

  /** Binary operator: + - * / % ^ = <> < <= > >= AND OR XOR,
    * STARTS WITH / ENDS WITH / CONTAINS / =~ / IN.
    */
  final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr
  final case class UnaryOp(op: String, operand: Expr) extends Expr // "-", "+", "NOT"
  final case class IsNull(operand: Expr, negated: Boolean) extends Expr

  /** Function call; `distinct` marks aggregate-DISTINCT (count(DISTINCT x)). */
  final case class FnCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case object CountStar extends Expr

  final case class CaseExpr(subject: Option[Expr],
                            branches: Seq[(Expr, Expr)],
                            default: Option[Expr]) extends Expr

  /** l[idx] */
  final case class Index(subject: Expr, idx: Expr) extends Expr
  /** l[from..to] (either side optional) */
  final case class Slice(subject: Expr, from: Option[Expr], to: Option[Expr]) extends Expr

  /** [x IN list WHERE pred | proj] */
  final case class ListComprehension(variable: String, list: Expr,
                                     where: Option[Expr], projection: Option[Expr]) extends Expr
  /** any/all/none/single(x IN list WHERE pred) */
  final case class Quantifier(kind: String, variable: String, list: Expr,
                              where: Expr) extends Expr
  /** reduce(acc = init, x IN list | expr) */
  final case class Reduce(acc: String, init: Expr, variable: String,
                          list: Expr, step: Expr) extends Expr

  /** n:Label predicate */
  final case class HasLabel(subject: Expr, labels: Seq[String]) extends Expr

  /** EXISTS { MATCH ... [WHERE ...] } or exists((a)-[]->(b)) pattern predicate */
  final case class ExistsPattern(paths: Seq[PathPattern], where: Option[Expr],
                                 negated: Boolean = false) extends Expr

  /** [(a)-[:R]->(b) WHERE pred | proj] — collects `proj` over every match
    * of the pattern, correlated on the variables already bound outside
    * (reference: collection_evaluator.py:1-13, ast_models/
    * expressions.py:323-507). Compiled as correlated join + collect_list
    * + left-join-back, never per-row evaluation.
    */
  final case class PatternComprehension(path: PathPattern, where: Option[Expr],
                                        projection: Expr) extends Expr

  // ---------- patterns ----------
  /** (v:Label {prop: expr, ...}) — all parts optional. */
  final case class NodePattern(variable: Option[String], labels: Seq[String],
                               props: Seq[(String, Expr)]) extends Expr

  /** -[v:TYPE*min..max {props}]-> ; direction: OUT, IN, BOTH. */
  final case class RelPattern(variable: Option[String], types: Seq[String],
                              props: Seq[(String, Expr)],
                              direction: String,
                              varLength: Option[(Int, Option[Int])])

  final case class PathPattern(pathVariable: Option[String],
                               start: NodePattern,
                               hops: Seq[(RelPattern, NodePattern)],
                               shortest: Option[String] = None) // shortestPath | allShortestPaths

  // ---------- clauses ----------
  sealed trait Clause

  final case class Match(paths: Seq[PathPattern], where: Option[Expr],
                         optional: Boolean) extends Clause
  final case class Unwind(expr: Expr, alias: String) extends Clause

  final case class ReturnItem(expr: Expr, alias: Option[String])
  final case class OrderItem(expr: Expr, descending: Boolean)
  final case class Projection(items: Seq[ReturnItem], star: Boolean,
                              distinct: Boolean,
                              orderBy: Seq[OrderItem],
                              skip: Option[Expr], limit: Option[Expr])

  final case class With(projection: Projection, where: Option[Expr]) extends Clause
  final case class Return(projection: Projection) extends Clause

  // mutations
  final case class Create(paths: Seq[PathPattern]) extends Clause
  final case class Merge(path: PathPattern,
                         onCreate: Seq[SetItem], onMatch: Seq[SetItem]) extends Clause
  sealed trait SetItem
  final case class SetProperty(subject: Expr, key: String, value: Expr) extends SetItem
  final case class SetVariable(variable: String, value: Expr, additive: Boolean) extends SetItem
  final case class SetLabels(variable: String, labels: Seq[String]) extends SetItem
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class Delete(exprs: Seq[Expr], detach: Boolean) extends Clause
  sealed trait RemoveItem
  final case class RemoveProperty(subject: Expr, key: String) extends RemoveItem
  final case class RemoveLabels(variable: String, labels: Seq[String]) extends RemoveItem
  final case class Remove(items: Seq[RemoveItem]) extends Clause
  final case class CallProcedure(name: String, args: Seq[Expr],
                                 yields: Seq[ReturnItem]) extends Clause
  /** FOREACH (x IN list | mutation clauses) */
  final case class Foreach(variable: String, list: Expr,
                           body: Seq[Clause]) extends Clause

  // ---------- query ----------
  final case class SingleQuery(clauses: Seq[Clause])
  /** UNION chain; `all(i)` says whether the i-th UNION keeps duplicates. */
  final case class Query(statements: Seq[SingleQuery], unionAll: Seq[Boolean])
}
