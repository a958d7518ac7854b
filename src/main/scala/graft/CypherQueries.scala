package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries executed through the graft Cypher engine (parser + compiler)
  * over the TPC-H graph mapping (FIXTURES.md §B), each verified against
  * a DuckDB SQL oracle expressing the same FK joins. Populated as the
  * engine lands.
  */
object CypherQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
