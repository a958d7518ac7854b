package graft.paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.compiler.{ExpressionCompiler, Frame, NodeVar, PathVar, QueryCompiler}
import graft.model.GraphCatalog
import graft.parser.CypherAst._

/** Variable-length path / shortestPath expansion as an iterative
  * frontier-join loop — the Spark counterpart of the reference's BFS
  * expander (/root/reference/packages/pycypher/src/pycypher/
  * path_expander.py:53-298; caps :40-50; shortestPath :299-490).
  *
  * Each hop is one equi-join of the frontier against the edge table
  * (hash-partitioned on the join key — at scale this is the same
  * plan GraphFrames BFS produces), with `localCheckpoint` per hop to
  * keep lineage flat and an action-based empty-frontier early stop.
  * Multiplicity semantics: walks (edge repetition allowed), which
  * equals Cypher path counting on acyclic graphs; the hop cap bounds
  * cyclic inputs exactly like the reference's MAX_HOPS=20.
  */
object PathExpand {

  val DefaultMaxHops = 20

  def compile(qc: QueryCompiler, catalog: GraphCatalog, p: PathPattern,
              params: Map[String, Any]): Frame = {
    require(p.hops.size == 1,
      "var-length segment must be the only hop in its pattern (round-1 limit)")
    val (rel, endNode) = p.hops.head
    val (minHops, maxHopsOpt) = rel.varLength.getOrElse((1, Some(1)))
    val maxHops = maxHopsOpt.getOrElse(DefaultMaxHops)
    require(minHops <= maxHops, s"bad var-length range $minHops..$maxHops")

    val relType = rel.types.headOption.getOrElse(
      throw new IllegalArgumentException("var-length requires a relationship type"))
    val rd = catalog.relationship(relType)

    val startVar = p.start.variable.getOrElse(qc.mkFreshVar())
    val startLabel = qc.mkResolveLabel(p.start, Some(rel), isStart = rel.direction != "IN")
    val start0 = qc.mkNodeFrame(startVar, startLabel, p.start.props)
    val start = start0.copy(df = start0.df.withColumn("__origin", monotonically_increasing_id()))

    // direction-adjusted edge list (BOTH = union of both orientations)
    val fwd = rd.df.select(col(rd.srcCol).as("__src"), col(rd.dstCol).as("__dst"))
    val bwd = rd.df.select(col(rd.dstCol).as("__src"), col(rd.srcCol).as("__dst"))
    var edges = rel.direction match {
      case "OUT"  => fwd
      case "IN"   => bwd
      case "BOTH" => fwd.unionByName(bwd)
    }
    // inline rel property predicates filter the edge set before the loop
    if (rel.props.nonEmpty) {
      val relVar = rel.variable.getOrElse(qc.mkFreshVar())
      val attrs = rd.df.columns.toSeq
      val pref = rd.df.select(attrs.map(a => col(a).as(s"${relVar}__$a")): _*)
      val rf = Frame(pref, Map(relVar -> graft.compiler.RelVar(rd.relType, rd.srcCol, rd.dstCol, attrs)))
      val cond = rel.props.map { case (k, e) =>
        col(s"${relVar}__$k") === new ExpressionCompiler(rf, params).compile(e)
      }.reduce(_ && _)
      val filtered = pref.filter(cond)
        .select(col(s"${relVar}__${rd.srcCol}").as("__src"),
          col(s"${relVar}__${rd.dstCol}").as("__dst"))
      edges = rel.direction match {
        case "OUT"  => filtered
        case "IN"   => filtered.select(col("__dst").as("__src"), col("__src").as("__dst"))
        case "BOTH" => filtered.unionByName(
          filtered.select(col("__dst").as("__src"), col("__src").as("__dst")))
      }
    }

    val endVar = endNode.variable.getOrElse(qc.mkFreshVar())
    val endLabel = qc.mkResolveLabel(endNode, Some(rel), isStart = rel.direction == "IN")

    val startIdCol = start.idCol(startVar)
    var frontier: DataFrame = start.df
      .select(col("__origin"), col(startIdCol).as("__node"), lit(0L).as("__hops"))
    var results = Vector.empty[DataFrame]
    // A zero-length path means start and end are the SAME node, so it can
    // only contribute when the end label is the start label — otherwise an
    // id coincidence across label key spaces would fabricate matches.
    if (minHops == 0 && endLabel == startLabel) results :+= frontier

    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      frontier = frontier.join(edges, col("__node") === col("__src"))
        .select(col("__origin"), col("__dst").as("__node"),
          (col("__hops") + 1).as("__hops"))
        .localCheckpoint() // flat lineage; also materializes for the early-stop probe
      if (frontier.isEmpty) exhausted = true
      else if (hop >= minHops) results :+= frontier
      hop += 1
    }

    val reached =
      if (results.isEmpty) frontier.limit(0)
      else results.reduce(_ unionByName _)

    val collapsed = p.shortest match {
      case Some(_) =>
        // min-hop per (origin, node); without materialized edge lists,
        // shortestPath and allShortestPaths coincide.
        reached.groupBy(col("__origin"), col("__node"))
          .agg(min(col("__hops")).as("__hops"))
      case None => reached
    }

    val endFrame = qc.mkNodeFrame(endVar, endLabel, endNode.props)

    val joined = start.df.join(collapsed, Seq("__origin"))
      .join(endFrame.df, col("__node") === col(endFrame.idCol(endVar)))

    val hopsCol = s"__hops_${p.pathVariable.getOrElse(endVar)}"
    val out = joined.withColumn(hopsCol, col("__hops"))
      .drop("__origin", "__node", "__hops")

    val pathVars: Map[String, graft.compiler.VarMeta] =
      p.pathVariable.map(pv => pv -> PathVar(hopsCol)).toMap
    Frame(out, start.vars ++ endFrame.vars ++ pathVars)
  }
}
