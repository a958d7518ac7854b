package graft.compiler

import graft.parser.CypherAst._

/** Multi-query combination — the Spark counterpart of the reference's
  * QueryCombiner (/root/reference/packages/pycypher/src/pycypher/
  * query_combiner.py:1-120): order queries by produce/consume label
  * analysis, strip intermediate RETURNs, and sequence the clause lists
  * with `WITH *` separators so earlier queries' variables stay visible.
  *
  * Where the reference emits a combined query STRING to re-parse, this
  * combines at the AST level and the result compiles into ONE Catalyst
  * plan — a pipeline of N queries becomes a single optimized DAG
  * (shared scans, cross-query pushdown) and, for mutating pipelines,
  * ONE snapshot commit instead of N.
  */
object QueryCombiner {

  /** Labels a query creates vs reads (multi_query_analyzer parity). */
  private def labelsOf(q: Query): (Set[String], Set[String]) = {
    def pathLabels(p: PathPattern): Seq[String] =
      p.start.labels ++ p.hops.flatMap(_._2.labels)
    var produces = Set.empty[String]
    var consumes = Set.empty[String]
    q.statements.foreach(_.clauses.foreach {
      case m: Match  => consumes ++= m.paths.flatMap(pathLabels)
      case c: Create => produces ++= c.paths.flatMap(pathLabels)
      case mg: Merge => produces ++= pathLabels(mg.path)
      case _ =>
    })
    (produces, consumes -- produces)
  }

  /** Every name a path pattern can bind: the path variable itself plus
    * node and relationship variables on every hop.
    */
  private def pathVars(p: PathPattern): Seq[String] =
    p.pathVariable.toSeq ++ p.start.variable.toSeq ++
      p.hops.flatMap { case (r, n) => r.variable.toSeq ++ n.variable.toSeq }

  /** Names a projection introduces into scope: explicit aliases plus
    * bare-variable passthroughs (`WITH n` rebinds `n` downstream).
    */
  private def projectionVars(pr: Projection): Seq[String] =
    pr.items.flatMap {
      case ReturnItem(_, Some(alias))    => Seq(alias)
      case ReturnItem(Variable(name), _) => Seq(name)
      case _                             => Seq.empty
    }

  /** True when every input can be merged into one clause sequence:
    * single-statement queries (no UNION) whose bound names don't collide
    * across stages (a later `WITH *` would otherwise rebind them —
    * silently different semantics than sequential execution). Counts
    * EVERY binder: MATCH/CREATE/MERGE patterns (incl. path variables),
    * UNWIND/FOREACH aliases, CALL ... YIELD items, and WITH/RETURN
    * projection aliases.
    */
  def combinable(queries: Seq[Query]): Boolean = {
    if (queries.exists(_.statements.size != 1)) return false
    def clauseVars(cl: Clause): Seq[String] = cl match {
      case m: Match         => m.paths.flatMap(pathVars)
      case c: Create        => c.paths.flatMap(pathVars)
      case mg: Merge        => pathVars(mg.path)
      case u: Unwind        => Seq(u.alias)
      case w: With          => projectionVars(w.projection)
      case r: Return        => projectionVars(r.projection)
      case cp: CallProcedure =>
        cp.yields.flatMap(y => y.alias.toSeq ++ (y.expr match {
          case Variable(n) => Seq(n); case _ => Seq.empty
        }))
      case fe: Foreach      => fe.variable +: fe.body.flatMap(clauseVars)
      case _                => Seq.empty
    }
    val varSets = queries.map(_.statements.head.clauses.flatMap(clauseVars).toSet)
    // pairwise disjoint bound names across stages
    varSets.combinations(2).forall { case Seq(a, b) => (a intersect b).isEmpty }
  }

  private val passAll = With(
    Projection(Seq.empty, star = true, distinct = false,
      orderBy = Seq.empty, skip = None, limit = None), where = None)

  /** Combine in dependency order; the LAST query's RETURN survives,
    * intermediate RETURNs are stripped (they would terminate the
    * pipeline), and `WITH *` bridges each stage.
    */
  def combine(queries: Seq[Query]): Query = {
    require(queries.nonEmpty, "nothing to combine")
    require(combinable(queries), "queries are not combinable")
    val info = queries.map(q => q -> labelsOf(q))
    // Kahn-style: a query runs once every label it consumes is available
    // or no remaining query produces it (external source)
    val remaining = scala.collection.mutable.LinkedHashSet(info: _*)
    val available = scala.collection.mutable.Set.empty[String]
    val ordered = scala.collection.mutable.ArrayBuffer.empty[Query]
    var progress = true
    while (remaining.nonEmpty && progress) {
      progress = false
      remaining.toSeq.foreach { case e @ (q, (produces, consumes)) =>
        val producedElsewhere = remaining.exists { case (r, (p, _)) =>
          r != q && p.intersect(consumes).nonEmpty }
        if (consumes.forall(available.contains) || !producedElsewhere) {
          ordered += q; available ++= produces; remaining -= e; progress = true
        }
      }
    }
    ordered ++= remaining.map(_._1) // cycles: keep given order
    val n = ordered.size
    val clauses = ordered.zipWithIndex.flatMap { case (q, i) =>
      val cls = q.statements.head.clauses
      val stripped = if (i < n - 1) cls.filterNot(_.isInstanceOf[Return]) else cls
      if (i == 0) stripped else passAll +: stripped
    }
    Query(Seq(SingleQuery(clauses.toSeq)), unionAll = Seq.empty)
  }
}
