package graft.compiler

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.parser.CypherAst._
import graft.functions.FunctionRegistry

/** Compiles Cypher AST expressions to Spark `Column`s.
  *
  * Mirrors the semantics of the reference's evaluator stack
  * (boolean_evaluator / comparison_evaluator / arithmetic_evaluator /
  * string_predicate_evaluator / collection_evaluator — see SURVEY.md
  * §2.8) on top of `org.apache.spark.sql.functions`, which are
  * whole-stage-codegen'd. Spark SQL's 3-valued logic matches Cypher's,
  * so AND/OR/NOT/comparisons need no shimming.
  *
  * Type-directed dispatch (`+` on strings/lists, `/` integer division)
  * probes the frame's schema at compile time — Spark columns are
  * monotyped, so what the reference decides per row we decide per plan.
  */
final class ExpressionCompiler(val frame: Frame, params: Map[String, Any]) {

  def compile(e: Expr): Column = compileEnv(e, Map.empty)

  /** `env` carries lambda-bound variables (comprehensions, reduce). */
  def compileEnv(e: Expr, env: Map[String, Column]): Column = e match {
    case IntLit(v)   => lit(v)
    case FloatLit(v) => lit(v)
    case StrLit(v)   => lit(v)
    case BoolLit(v)  => lit(v)
    case NullLit     => lit(null)
    case ListLit(items) => array(items.map(compileEnv(_, env)): _*)
    case MapLit(items) =>
      struct(items.map { case (k, v) => compileEnv(v, env).as(k) }: _*)
    case Param(name) =>
      params.get(name) match {
        case Some(v: Seq[_]) => array(v.map(x => lit(x)): _*)
        case Some(v)         => lit(v)
        case None            => throw new IllegalArgumentException(s"missing parameter: $$$name")
      }

    case Variable(v) if env.contains(v) => env(v)
    case Variable(v) =>
      frame.vars.get(v) match {
        case Some(ValueVar) => col(v)
        case Some(PathVar(h, _, _)) => col(h)
        case Some(NodeVar(_, _, attrs)) =>
          struct(attrs.map(a => col(frame.col(v, a)).as(a)): _*)
        case Some(RelVar(_, _, _, attrs)) =>
          struct(attrs.map(a => col(frame.col(v, a)).as(a)): _*)
        case None => throw new IllegalArgumentException(s"unbound variable: $v")
      }

    case Property(Variable(v), key) if !env.contains(v) && frame.vars.get(v).exists {
      case _: NodeVar | _: RelVar => true; case _ => false
    } =>
      val attrs = frame.vars(v) match {
        case NodeVar(_, _, a)   => a
        case RelVar(_, _, _, a) => a
        case _                  => Seq.empty
      }
      // Cypher: accessing a missing property yields null, not an error.
      if (attrs.contains(key)) col(frame.col(v, key)) else lit(null)
    case Property(subject, key) =>
      val s = compileEnv(subject, env)
      typeOf(s) match {
        case Some(_: MapType) => s.getItem(key)
        case _                => s.getField(key)
      }

    case BinOp(op, l, r) => compileBinOp(op, l, r, env)
    case UnaryOp("NOT", x) => !compileEnv(x, env)
    case UnaryOp("-", x)   => negate(compileEnv(x, env))
    case UnaryOp(op, _)    => throw new IllegalArgumentException(s"unary $op")

    case IsNull(Variable(v), negated) if frame.vars.get(v).exists(_.isInstanceOf[NodeVar]) =>
      val c = col(frame.idCol(v))
      if (negated) c.isNotNull else c.isNull
    case IsNull(x, negated) =>
      val c = compileEnv(x, env)
      if (negated) c.isNotNull else c.isNull

    case CountStar =>
      throw new IllegalArgumentException("count(*) outside aggregation context")
    // length(p) of a path variable = traversal depth (hop count)
    case FnCall(n, Seq(Variable(v)), _)
      if n.equalsIgnoreCase("length") && frame.vars.get(v).exists(_.isInstanceOf[PathVar]) =>
      val PathVar(h, _, _) = frame.vars(v): @unchecked
      col(h)
    // nodes(p) / relationships(p): the materialized node-id /
    // relationship-identity sequences. Divergence from Neo4j (documented
    // in SURVEY §6): this engine returns the IDENTITIES (node ids,
    // relationship identity hashes), not entity maps — the relational
    // surface where attributes join back by id. Requires a materialized
    // path: free for fixed-hop patterns; var-length and shortestPath
    // patterns opt in via graft.pathExpand.materializePaths (each path
    // row then carries O(maxHops) ids; shortestPath additionally
    // switches its BFS dedup to the deterministic lex-min witness).
    case FnCall(n, Seq(Variable(v)), _)
      if (n.equalsIgnoreCase("nodes") || n.equalsIgnoreCase("relationships")) &&
        frame.vars.get(v).exists(_.isInstanceOf[PathVar]) =>
      val PathVar(_, nodesCol, relsCol) = frame.vars(v): @unchecked
      val c = if (n.equalsIgnoreCase("nodes")) nodesCol else relsCol
      c.map(col).getOrElse(throw new IllegalArgumentException(
        s"${n.toLowerCase}($v) needs a materialized path: set " +
          "graft.pathExpand.materializePaths=true for var-length and " +
          "shortestPath patterns (relationships() also needs every hop " +
          "var-length — fixed hops carry no relationship identity)"))
    // id(n) / elementId(n): the entity's identity column (this engine's
    // ids are the natural keys, so id() is stable — unlike Neo4j's
    // store-internal ids); elementId stringifies per openCypher
    case FnCall(n, Seq(Variable(v)), _)
      if (n.equalsIgnoreCase("id") || n.equalsIgnoreCase("elementId")) &&
        frame.vars.get(v).exists {
          case _: NodeVar | _: RelVar => true; case _ => false
        } =>
      val c = col(frame.idCol(v))
      if (n.equalsIgnoreCase("elementId")) c.cast(StringType) else c
    case f @ FnCall(name, args, _) =>
      if (FunctionRegistry.isAggregate(name))
        throw new IllegalArgumentException(s"aggregate $name outside aggregation context")
      FunctionRegistry.scalar(name, args.map(compileEnv(_, env)), args, this, env)

    case CaseExpr(subject, branches, default) =>
      val subj = subject.map(compileEnv(_, env))
      val first = branches.head
      val start = subj match {
        case Some(s) => when(s === compileEnv(first._1, env), compileEnv(first._2, env))
        case None    => when(compileEnv(first._1, env), compileEnv(first._2, env))
      }
      val chained = branches.tail.foldLeft(start) { case (acc, (w, t)) =>
        subj match {
          case Some(s) => acc.when(s === compileEnv(w, env), compileEnv(t, env))
          case None    => acc.when(compileEnv(w, env), compileEnv(t, env))
        }
      }
      default.map(d => chained.otherwise(compileEnv(d, env))).getOrElse(chained)

    case Index(subject, idx) =>
      val s = compileEnv(subject, env)
      typeOf(s) match {
        case Some(_: MapType) => s.getItem(compileEnv(idx, env))
        case Some(_: StructType) =>
          idx match {
            case StrLit(k) => s.getField(k)
            case _ => throw new IllegalArgumentException("struct index must be literal")
          }
        case _ =>
          // Cypher list index is 0-based; negative = from end. element_at is
          // 1-based with native negative support.
          val i = compileEnv(idx, env)
          element_at(s, when(i >= 0, i + 1).otherwise(i).cast(IntegerType))
      }

    case Slice(subject, fromE, toE) =>
      val s = compileEnv(subject, env)
      val sz = size(s)
      def norm(c: Column): Column = when(c < 0, sz + c).otherwise(c)
      val fromIdx = fromE.map(x => norm(compileEnv(x, env))).getOrElse(lit(0))
      val toIdx = toE.map(x => norm(compileEnv(x, env))).getOrElse(sz.cast(LongType))
      slice(s, (fromIdx + 1).cast(IntegerType),
        greatest(toIdx - fromIdx, lit(0)).cast(IntegerType))

    case ListComprehension(v, list, where, proj) =>
      val l = compileEnv(list, env)
      val filtered = where match {
        case Some(p) => filter(l, x => compileEnv(p, env + (v -> x)))
        case None    => l
      }
      proj match {
        case Some(pr) => transform(filtered, x => compileEnv(pr, env + (v -> x)))
        case None     => filtered
      }

    case Quantifier(kind, v, list, pred) =>
      val l = compileEnv(list, env)
      def ex = exists(l, x => compileEnv(pred, env + (v -> x)))
      def fa = forall(l, x => compileEnv(pred, env + (v -> x)))
      kind match {
        case "any"    => ex
        case "all"    => fa
        case "none"   => !ex
        case "single" => size(filter(l, x => compileEnv(pred, env + (v -> x)))) === 1
      }

    case Reduce(acc, init, v, list, step) =>
      aggregate(compileEnv(list, env), compileEnv(init, env),
        (a, x) => compileEnv(step, env + (acc -> a) + (v -> x)))

    case HasLabel(Variable(v), wanted) =>
      // Labels are static per variable — except multi-label union scans
      // ("*"), whose __label column discriminates at runtime (and lets
      // Catalyst constant-fold the predicate per union branch).
      frame.vars.get(v) match {
        case Some(NodeVar("*", _, _)) =>
          wanted.map(w => col(frame.col(v, "__label")) === lit(w))
            .reduce(_ && _)
        case Some(NodeVar(label, _, _)) => lit(wanted.forall(_ == label))
        case _                          => lit(false)
      }
    case HasLabel(_, _) => lit(false)

    case _: ExistsPattern =>
      throw new IllegalArgumentException(
        "EXISTS pattern predicates are only supported as top-level WHERE conjuncts")
    case _: NodePattern =>
      throw new IllegalArgumentException("unexpected pattern in expression")
  }

  // ---------- helpers ----------

  /** Schema probe: resolve the column against the frame to learn its type. */
  def typeOf(c: Column): Option[DataType] =
    Try(frame.df.select(c).schema.head.dataType).toOption

  private def isIntegral(t: Option[DataType]): Boolean = t.exists {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }

  private def isTemporal(t: Option[DataType]): Boolean = t.exists {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  private def isDuration(t: Option[DataType]): Boolean =
    t.exists(FunctionRegistry.isDurationType)

  private def compileBinOp(op: String, le: Expr, re: Expr, env: Map[String, Column]): Column = {
    lazy val l = compileEnv(le, env)
    lazy val r = compileEnv(re, env)
    // durations order by estimated length (months = 30 days)
    def durCmp(f: (Column, Column) => Column): Option[Column] =
      if (isDuration(typeOf(l)) && isDuration(typeOf(r)))
        Some(f(FunctionRegistry.durationTotalMicros(l),
          FunctionRegistry.durationTotalMicros(r)))
      else None
    op match {
      case "AND" => l && r
      case "OR"  => l || r
      case "XOR" => (l && !r) || (!l && r) // 3VL: null-propagating via && / ||
      case "="   => l === r
      case "<>"  => l =!= r
      case "<"   => durCmp(_ < _).getOrElse(l < r)
      case "<="  => durCmp(_ <= _).getOrElse(l <= r)
      case ">"   => durCmp(_ > _).getOrElse(l > r)
      case ">="  => durCmp(_ >= _).getOrElse(l >= r)
      case "+" =>
        (typeOf(l), typeOf(r)) match {
          case (lt, rt) if isDuration(lt) && isDuration(rt) =>
            FunctionRegistry.durationStruct(
              l.getField("months") + r.getField("months"),
              l.getField("days") + r.getField("days"),
              l.getField("micros") + r.getField("micros"))
          case (lt, rt) if isTemporal(lt) && isDuration(rt) =>
            l + FunctionRegistry.durationToInterval(r)
          case (lt, rt) if isDuration(lt) && isTemporal(rt) =>
            r + FunctionRegistry.durationToInterval(l)
          case (Some(StringType), _) | (_, Some(StringType)) => concat(l, r)
          case (Some(_: ArrayType), Some(_: ArrayType))      => concat(l, r)
          case (Some(_: ArrayType), _)                       => concat(l, array(r))
          case (_, Some(_: ArrayType))                       => concat(array(l), r)
          case _                                             => l + r
        }
      case "-" =>
        (typeOf(l), typeOf(r)) match {
          case (lt, rt) if isDuration(lt) && isDuration(rt) =>
            FunctionRegistry.durationStruct(
              l.getField("months") - r.getField("months"),
              l.getField("days") - r.getField("days"),
              l.getField("micros") - r.getField("micros"))
          case (lt, rt) if isTemporal(lt) && isDuration(rt) =>
            l - FunctionRegistry.durationToInterval(r)
          case _ => l - r
        }
      case "*" => l * r
      case "/" =>
        // Cypher `/` on two integers is integer division truncating toward
        // zero; cast-of-double-quotient matches that for the int64 range
        // representable in a double.
        if (isIntegral(typeOf(l)) && isIntegral(typeOf(r))) (l / r).cast(LongType)
        else l / r
      case "%" => l % r
      case "^" => pow(l, r)
      case "IN" =>
        re match {
          case ListLit(items) if items.forall(_.isInstanceOf[StrLit]) =>
            l.isin(items.collect { case StrLit(s) => s }: _*)
          case ListLit(items) if items.forall(i =>
            i.isInstanceOf[IntLit] || i.isInstanceOf[FloatLit]) =>
            l.isin(items.collect {
              case IntLit(v) => v: Any
              case FloatLit(v) => v: Any
            }: _*)
          case _ => array_contains(r, l)
        }
      case "STARTS WITH" => l.startsWith(r)
      case "ENDS WITH"   => l.endsWith(r)
      case "CONTAINS"    => l.contains(r)
      case "=~" =>
        // Cypher =~ is a FULL match; Spark rlike is a substring match.
        re match {
          case StrLit(p) => l.rlike("^(?:" + p + ")$")
          case _         => regexp_like(l, concat(lit("^(?:"), r, lit(")$")))
        }
      case other => throw new IllegalArgumentException(s"unknown operator $other")
    }
  }
}
