package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.CypherEngine
import graft.model.GraphCatalog

/** Graph view of the driver testdata (FIXTURES.md §B): entities are the
  * TPC-H-ish tables keyed by their natural keys; relationships are
  * derived from the foreign keys, mirroring the reference's
  * relationship-derivation pattern (/root/reference/packages/
  * fastopendata/src/fastopendata/etl/relationship_derivation.py).
  *
  * Relationship tables are the child tables themselves with src/dst
  * columns pointing at the FK pair — no data copies, so Catalyst prunes
  * unused attribute columns out of every traversal scan.
  */
object TpchGraph {

  // One engine per (session, dir): parquet schema discovery plus the
  // derived-edge analysis cost ~1.8 s per construction, which would
  // otherwise be paid by every query. Mutating callers take
  // `freshEngine` so catalog writes never leak across queries.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, CypherEngine]()

  def engine(spark: SparkSession, dir: String): CypherEngine =
    cache.computeIfAbsent(s"${System.identityHashCode(spark)}:$dir",
      _ => freshEngine(spark, dir))

  def freshEngine(spark: SparkSession, dir: String): CypherEngine = {
    val t = Tables(spark, dir)
    // Homogeneous Nation→Nation successor edges (n → n+1 and n → n+2,
    // keys kept within the table): the one edge type whose composition
    // with itself is non-trivial, so var-length *1..k and shortestPath
    // get genuinely branching walk counts and BFS distances to verify
    // against a DuckDB recursive CTE.
    val nk = t.nation.select(col("n_nationkey"))
    val steps = nk
      .select(col("n_nationkey").as("src"), (col("n_nationkey") + 1).as("dst"))
      .unionByName(nk
        .select(col("n_nationkey").as("src"), (col("n_nationkey") + 2).as("dst")))
    val nextEdges = steps
      .join(nk.select(col("n_nationkey").as("dst")), Seq("dst"))
      .select(col("src"), col("dst"))
    val catalog = new GraphCatalog()
      .addEntity("Region", t.region, idCol = "r_regionkey")
      .addEntity("Nation", t.nation, idCol = "n_nationkey")
      .addEntity("Customer", t.customer, idCol = "c_custkey")
      .addEntity("Supplier", t.supplier, idCol = "s_suppkey")
      .addEntity("Part", t.part, idCol = "p_partkey")
      .addEntity("Order", t.orders, idCol = "o_orderkey")
      .addEntity("Lineitem", t.lineitem, idCol = "l_orderkey") // composite in truth; see CONTAINS
      .addEntity("Document", t.documents, idCol = "doc_id")
      // FK-derived relationships (child row = edge):
      .addRelationship("IN_REGION", t.nation,
        srcCol = "n_nationkey", dstCol = "n_regionkey",
        srcLabel = Some("Nation"), dstLabel = Some("Region"))
      .addRelationship("FROM_NATION", t.customer,
        srcCol = "c_custkey", dstCol = "c_nationkey",
        srcLabel = Some("Customer"), dstLabel = Some("Nation"))
      .addRelationship("SUPP_NATION", t.supplier,
        srcCol = "s_suppkey", dstCol = "s_nationkey",
        srcLabel = Some("Supplier"), dstLabel = Some("Nation"))
      .addRelationship("PLACED", t.orders,
        srcCol = "o_custkey", dstCol = "o_orderkey",
        srcLabel = Some("Customer"), dstLabel = Some("Order"))
      .addRelationship("CONTAINS", t.lineitem,
        srcCol = "l_orderkey", dstCol = "l_partkey",
        srcLabel = Some("Order"), dstLabel = Some("Part"))
      .addRelationship("SUPPLIED_BY", t.lineitem,
        srcCol = "l_partkey", dstCol = "l_suppkey",
        srcLabel = Some("Part"), dstLabel = Some("Supplier"))
      .addRelationship("NEXT_N", nextEdges,
        srcCol = "src", dstCol = "dst",
        srcLabel = Some("Nation"), dstLabel = Some("Nation"))
      .addRelationship("PREV_N", nextEdges
        .select(col("dst").as("src"), col("src").as("dst")),
        srcCol = "src", dstCol = "dst",
        srcLabel = Some("Nation"), dstLabel = Some("Nation"))
    new CypherEngine(spark, catalog)
  }
}
