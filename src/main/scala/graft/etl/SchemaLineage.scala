package graft.etl

import org.apache.spark.sql.types._

import graft.etl.SchemaEvolution.ColumnDrift

/** Conflict-resolving merge of drifted source schemas.
  *
  * Spark-first counterpart of the reference's `SchemaMerger`
  * (/root/reference/packages/fastopendata/src/fastopendata/
  * schema_evolution/schema.py:357-463): same observable semantics —
  * merged schema is the column superset in first-appearance order,
  * columns missing from any input become nullable, same-type columns
  * union their nullability, and type conflicts resolve per strategy
  * (widen / prefer-first / prefer-last / fail, with a string fallback
  * when no widening path exists) — but the type authority is Catalyst's
  * own `Cast.canUpCast`, not a hand-rolled widening table: "widens"
  * here means exactly that Spark will read every source's data under
  * the merged type losslessly, the property an ETL user actually needs
  * when N drifting feeds union into one table.
  */
object SchemaMerger {

  sealed trait ConflictStrategy
  /** Pick the narrowest type every conflicting type up-casts to;
    * fall back to string when no such type exists.
    */
  case object Widen extends ConflictStrategy
  /** Keep the first schema's type. */
  case object PreferFirst extends ConflictStrategy
  /** Keep the last schema's type. */
  case object PreferLast extends ConflictStrategy
  /** Throw on any type conflict. */
  case object Fail extends ConflictStrategy

  /** One resolved type conflict: the types seen across the inputs (in
    * input order, deduped) and how the merge settled it
    * (widened | string_fallback | prefer_first | prefer_last).
    */
  final case class MergeConflict(column: String, types: Seq[String],
                                 resolved: String, resolution: String)

  final case class MergeResult(schema: StructType, conflicts: Seq[MergeConflict]) {
    /** Conflicts Spark cannot read losslessly from every source — the
      * ones a pipeline owner must adjudicate.
      */
    def lossy: Seq[MergeConflict] = conflicts.filter(_.resolution != "widened")
  }

  private def canUp(from: DataType, to: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)

  /** Merge N schemas (N >= 1). Column order is first appearance across
    * the inputs; a column absent from any input is nullable in the
    * merge (rows from that source hold null there).
    */
  def merge(schemas: Seq[StructType],
            strategy: ConflictStrategy = Widen): MergeResult = {
    require(schemas.nonEmpty, "SchemaMerger.merge: no schemas")
    val names = schemas.flatMap(_.fields.map(_.name)).distinct
    val conflicts = Seq.newBuilder[MergeConflict]
    val fields = names.map { n =>
      val present = schemas.flatMap(_.fields.find(_.name == n))
      val everywhere = present.size == schemas.size
      val types = present.map(_.dataType).distinct
      val nullable = !everywhere || present.exists(_.nullable)
      val tpe =
        if (types.size == 1) types.head
        else {
          val (resolved, how) = strategy match {
            case Fail => throw new IllegalArgumentException(
              s"SchemaMerger: type conflict on '$n': " +
                types.map(_.simpleString).mkString(" vs "))
            case PreferFirst => (types.head, "prefer_first")
            case PreferLast => (types.last, "prefer_last")
            case Widen =>
              // the narrowest candidate every other candidate up-casts
              // to, ties to input order; no such type -> string
              types.filter(t => types.forall(f => f == t || canUp(f, t)))
                .sortBy(_.defaultSize).headOption
                .map((_, "widened"))
                .getOrElse((StringType, "string_fallback"))
          }
          conflicts += MergeConflict(n, types.map(_.simpleString),
            resolved.simpleString, how)
          resolved
        }
      StructField(n, tpe, nullable)
    }
    MergeResult(StructType(fields), conflicts.result())
  }
}

/** Source → transform/query → sink lineage DAG with impact analysis.
  *
  * Mirrors the reference's `LineageGraph`
  * (/root/reference/packages/fastopendata/src/fastopendata/
  * schema_evolution/lineage.py:49-180): nodes with a kind, directed
  * edges, forward-BFS impact analysis, backward-BFS provenance, Kahn
  * topological order, source/sink listing — plus a column-level slice
  * the reference lacks: edges may declare WHICH upstream columns the
  * downstream node consumes, so `columnImpact` and `breakage` answer
  * "which queries and sinks does this column change break", joined to
  * `SchemaEvolution.diff`'s compatibility grading.
  *
  * Control-plane structure (id strings + schemas), deliberately
  * driver-side: at most thousands of pipeline nodes, never data.
  * Instances are mutable builders and not thread-safe.
  */
final class LineageGraph {
  import scala.collection.mutable

  /** kind: source | transform | query | sink (free-form). */
  final case class Node(id: String, kind: String,
                        schema: Option[StructType] = None)

  /** `columns` = the columns of `from` that `to` reads; empty means
    * "all of them" (a conservative consume-everything edge).
    */
  final case class Edge(from: String, to: String,
                        columns: Set[String] = Set.empty)

  private val nodes = mutable.LinkedHashMap.empty[String, Node]
  private val edges = mutable.ArrayBuffer.empty[Edge]
  private val fwd = mutable.Map.empty[String, Vector[Edge]].withDefaultValue(Vector.empty)
  private val bwd = mutable.Map.empty[String, Vector[Edge]].withDefaultValue(Vector.empty)

  def addNode(id: String, kind: String,
              schema: Option[StructType] = None): this.type = {
    nodes(id) = Node(id, kind, schema); this
  }

  def addEdge(from: String, to: String,
              columns: Set[String] = Set.empty): this.type = {
    require(nodes.contains(from), s"unknown lineage node '$from'")
    require(nodes.contains(to), s"unknown lineage node '$to'")
    val e = Edge(from, to, columns)
    edges += e
    fwd(from) = fwd(from) :+ e
    bwd(to) = bwd(to) :+ e
    this
  }

  def node(id: String): Option[Node] = nodes.get(id)
  def sources: Seq[Node] = nodes.values.toSeq.filter(n => bwd(n.id).isEmpty)
  def sinks: Seq[Node] = nodes.values.toSeq.filter(n => fwd(n.id).isEmpty)

  private def bfs(start: Iterable[String],
                  next: String => Vector[Edge],
                  pick: Edge => String): Seq[Node] = {
    val visited = mutable.Set.empty[String]
    val out = mutable.ArrayBuffer.empty[Node]
    val queue = mutable.Queue.empty[String]
    queue ++= start
    val startSet = start.toSet
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      next(cur).map(pick).foreach { n =>
        if (!visited(n) && !startSet(n)) {
          visited += n; queue += n; out += nodes(n)
        }
      }
    }
    out.toSeq
  }

  /** Everything transitively downstream: "if this node changes, what
    * is affected?" (forward BFS, excludes the start node).
    */
  def impact(id: String): Seq[Node] = bfs(Seq(id), fwd, _.to)

  /** Everything transitively upstream: "where did this come from?" */
  def provenance(id: String): Seq[Node] = bfs(Seq(id), bwd, _.from)

  /** Downstream nodes reachable through an edge that consumes `column`
    * from `id` — after the first hop the column is baked into derived
    * data, so everything further downstream of a consumer is affected.
    */
  def columnImpact(id: String, column: String): Seq[Node] = {
    val direct = fwd(id)
      .filter(e => e.columns.isEmpty || e.columns(column)).map(_.to).distinct
    val firstHop = direct.map(nodes(_))
    (firstHop ++ bfs(direct, fwd, _.to)).distinct.filterNot(_.id == id)
  }

  /** Which downstream nodes a schema change to source `id` breaks:
    * every breaking column drift (vs the node's recorded schema) paired
    * with the consumers `columnImpact` reaches. The answer to "this
    * feed retyped a column overnight — which queries and sinks go red".
    */
  def breakage(id: String, current: StructType): Seq[(ColumnDrift, Seq[Node])] = {
    val recorded = nodes.get(id).flatMap(_.schema).getOrElse(
      throw new IllegalArgumentException(s"node '$id' has no recorded schema"))
    SchemaEvolution.diff(recorded, current)
      .filter(_.compatibility == "breaking")
      .map(d => d -> columnImpact(id, d.column))
  }

  /** Kahn topological order; throws on a cycle (lineage must be a DAG). */
  def topological: Seq[Node] = {
    val indeg = mutable.Map.empty[String, Int].withDefaultValue(0)
    nodes.keys.foreach(k => indeg(k) = bwd(k).size)
    val queue = mutable.Queue(nodes.keys.filter(indeg(_) == 0).toSeq: _*)
    val out = mutable.ArrayBuffer.empty[Node]
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      out += nodes(cur)
      fwd(cur).foreach { e =>
        indeg(e.to) -= 1
        if (indeg(e.to) == 0) queue += e.to
      }
    }
    require(out.size == nodes.size, "lineage graph has a cycle")
    out.toSeq
  }
}
