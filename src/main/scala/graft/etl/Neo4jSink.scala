package graft.etl

import org.apache.spark.sql.functions._

import graft.model.GraphCatalog

/** Neo4j sink — the offline-capable counterpart of the reference's bolt
  * streaming sink (/root/reference/packages/pycypher/src/pycypher/
  * sinks/neo4j.py:60-612).
  *
  * The reference streams MERGE batches over a live bolt connection; the
  * zero-egress build cannot ship the neo4j-spark-connector jar, so the
  * durable path here is `neo4j-admin database import` bulk CSV: one
  * directory per label with an `:ID(<label>)` id-space header and a
  * `:LABEL` column, one per relationship type with
  * `:START_ID`/`:END_ID`/`:TYPE`. Each directory holds ordinary Spark
  * part-files (the importer accepts multiple files per group), so the
  * export is fully distributed — no coalesce, no driver collect.
  *
  * When the connector jar IS available, `connectorSeam` documents the
  * one-line substitution (same DataFrames, `format("org.neo4j.spark")`).
  */
object Neo4jSink {

  /** Export the whole catalog; returns the written directories in
    * neo4j-admin argument order (nodes first, then relationships).
    */
  def exportBulkCsv(catalog: GraphCatalog, outDir: String): Seq[String] = {
    val nodeDirs = catalog.labels.map { label =>
      val e = catalog.entity(label)
      val dir = s"$outDir/nodes_$label"
      val renamed = e.df.columns.foldLeft(e.df) { (df, c) =>
        if (c == e.idCol) df.withColumnRenamed(c, s"$c:ID($label)") else df
      }
      renamed.withColumn(":LABEL", lit(label))
        .write.mode("overwrite").option("header", "true").csv(dir)
      dir
    }
    val relDirs = catalog.relTypes.map { relType =>
      val r = catalog.relationship(relType)
      val srcSpace = r.srcLabel.map(l => s"($l)").getOrElse("")
      val dstSpace = r.dstLabel.map(l => s"($l)").getOrElse("")
      val dir = s"$outDir/rels_$relType"
      r.df.withColumnRenamed(r.srcCol, s":START_ID$srcSpace")
        .withColumnRenamed(r.dstCol, s":END_ID$dstSpace")
        .withColumn(":TYPE", lit(relType))
        .write.mode("overwrite").option("header", "true").csv(dir)
      dir
    }
    nodeDirs ++ relDirs
  }

  /** The live-connector seam: with neo4j-spark-connector on the
    * classpath this is the whole bolt path — kept as documentation
    * (and a compile-time string, not dead code) because the jar cannot
    * resolve offline.
    */
  val connectorSeam: String =
    """df.write.format("org.neo4j.spark")
      |  .option("url", boltUri).option("labels", label)
      |  .option("node.keys", idCol).mode("overwrite").save()""".stripMargin
}
