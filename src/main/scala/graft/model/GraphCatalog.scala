package graft.model

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Registry mapping node labels and relationship types to DataFrames —
  * the Spark-native counterpart of the reference's `Context` +
  * `EntityTable`/`RelationshipTable`
  * (/root/reference/packages/pycypher/src/pycypher/relational_models.py:
  * 282-718, 917-1338). Reserved-column handling (`__ID__`,
  * `__SOURCE__`, `__TARGET__`, relational_models.py:41-49) becomes
  * explicit per-table column names declared at registration; no data is
  * copied or renamed — the DataFrames stay lazy.
  *
  * Mutation clauses (CREATE/SET/DELETE/MERGE) operate on a snapshot and
  * swap registrations atomically on commit, mirroring the reference's
  * shadow-write transaction (relational_models.py:589-708) with
  * immutable DataFrames instead of shadow copies.
  */
final case class EntityDef(label: String, df: DataFrame, idCol: String)

final case class RelationshipDef(relType: String, df: DataFrame,
                                 srcCol: String, dstCol: String,
                                 idCol: Option[String],
                                 srcLabel: Option[String], dstLabel: Option[String])

final class GraphCatalog {
  private val entities = TrieMap.empty[String, EntityDef]
  private val relationships = TrieMap.empty[String, RelationshipDef]

  // durable-snapshot read-lease release hook ([[CatalogStore.load]]
  // installs it; no-op otherwise)
  private[graft] var releaseLease: () => Unit = () => ()

  /** Release this catalog's snapshot read lease, if it holds one. A
    * leased reader blocks [[CatalogStore.prune]] from deleting the
    * version its lazy plans point at — close when done querying.
    * Idempotent; a no-op for catalogs that never came from a snapshot.
    */
  def close(): Unit = {
    val r = releaseLease
    releaseLease = () => ()
    r()
  }

  def addEntity(label: String, df: DataFrame, idCol: String = "__ID__"): GraphCatalog = {
    require(df.columns.contains(idCol), s"id column '$idCol' not in ${df.columns.mkString(",")}")
    entities.put(label, EntityDef(label, df, idCol))
    this
  }

  def addRelationship(relType: String, df: DataFrame,
                      srcCol: String = "__SOURCE__", dstCol: String = "__TARGET__",
                      idCol: Option[String] = None,
                      srcLabel: Option[String] = None,
                      dstLabel: Option[String] = None): GraphCatalog = {
    require(df.columns.contains(srcCol) && df.columns.contains(dstCol),
      s"src/dst columns '$srcCol'/'$dstCol' not in ${df.columns.mkString(",")}")
    // the reference's reserved `__ID__` column IS the relationship
    // identity when present (FIXTURES §A.1) — without it, parallel
    // edges between one (src, dst) pair would silently share an
    // identity, conflating them under trail semantics and
    // allShortestPaths witness dedup
    val rid = idCol.orElse(Option.when(df.columns.contains("__ID__"))("__ID__"))
    relationships.put(relType, RelationshipDef(relType, df, srcCol, dstCol, rid,
      srcLabel, dstLabel))
    this
  }

  // Unknown labels/types are conf-gated via `graft.strictLabels`
  // (default true): strict mode THROWS — in an ETL pipeline a
  // misordered or misspelled label must fail loudly; the dependency
  // analyzer reorders producers before consumers precisely so that a
  // clean pipeline never hits this, and a silent empty match would
  // convert ordering bugs into silently-empty sinks. Setting
  // `graft.strictLabels=false` restores openCypher's schema-free
  // parity (reference: relational_models.py:617-646 — unknown labels
  // are creatable/queryable, never errors): the unknown label/type
  // matches EMPTY, as an id-only zero-row frame (property access on it
  // compiles to null-for-missing like any absent column).
  private def strict: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .forall(_.conf.get("graft.strictLabels", "true").toBoolean)

  /** Id type for synthesized empty frames: follow whatever the live
    * catalog uses (string ids, int ids, …) so the empty match unions
    * and joins against real frames without analysis-time type
    * mismatches; LongType only when the catalog is empty too.
    */
  private def emptyIdType(preferRelationships: Boolean)
      : org.apache.spark.sql.types.DataType = {
    // TrieMap iteration order is nondeterministic — pick the
    // lexicographically-first key so heterogeneous-id catalogs
    // synthesize the SAME empty-frame type run-to-run; empty rel
    // frames prefer a relationship's src/dst type over an entity id
    def entityT = entities.keys.toSeq.sorted.headOption
      .map(l => { val e = entities(l); e.df.schema(e.idCol).dataType })
    def relT = relationships.keys.toSeq.sorted.headOption
      .map(t => { val r = relationships(t); r.df.schema(r.srcCol).dataType })
    (if (preferRelationships) relT.orElse(entityT) else entityT.orElse(relT))
      .getOrElse(org.apache.spark.sql.types.LongType)
  }

  private def emptyDf(cols: String*): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val t = emptyIdType(preferRelationships = cols.contains("__SOURCE__"))
    org.apache.spark.sql.SparkSession.active.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(cols.map(StructField(_, t, nullable = true))))
  }

  def entity(label: String): EntityDef =
    entities.getOrElse(label,
      if (strict) throw new NoSuchElementException(s"unknown label: $label")
      else EntityDef(label, emptyDf("__ID__"), "__ID__"))
  def relationship(relType: String): RelationshipDef =
    relationships.getOrElse(relType,
      if (strict) throw new NoSuchElementException(s"unknown relationship type: $relType")
      else RelationshipDef(relType, emptyDf("__ID__", "__SOURCE__", "__TARGET__"),
        "__SOURCE__", "__TARGET__", Some("__ID__"), None, None))

  def hasEntity(label: String): Boolean = entities.contains(label)
  def hasRelationship(relType: String): Boolean = relationships.contains(relType)
  def labels: Seq[String] = entities.keys.toSeq.sorted
  def relTypes: Seq[String] = relationships.keys.toSeq.sorted

  /** Replace a label's DataFrame (mutation commit). */
  def replaceEntity(label: String, df: DataFrame): Unit = {
    val old = entity(label)
    entities.put(label, old.copy(df = df))
  }
  def replaceRelationship(relType: String, df: DataFrame): Unit = {
    val old = relationship(relType)
    relationships.put(relType, old.copy(df = df))
  }

  /** All entity registrations, label-sorted (stable for manifests). */
  def entityDefs: Seq[EntityDef] = labels.map(entities(_))
  /** All relationship registrations, type-sorted. */
  def relationshipDefs: Seq[RelationshipDef] = relTypes.map(relationships(_))

  /** Shallow snapshot for query-scoped mutation staging. */
  def snapshot(): GraphCatalog = {
    val c = new GraphCatalog
    entities.foreach { case (k, v) => c.entities.put(k, v) }
    relationships.foreach { case (k, v) => c.relationships.put(k, v) }
    c
  }

  /** Commit: adopt all registrations from a staged snapshot (the
    * query-scoped shadow layer's `commit_query` analog).
    */
  def absorbFrom(other: GraphCatalog): Unit = {
    other.entities.foreach { case (k, v) => entities.put(k, v) }
    other.relationships.foreach { case (k, v) => relationships.put(k, v) }
  }
}
