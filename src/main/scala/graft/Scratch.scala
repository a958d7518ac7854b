package graft

import org.apache.spark.sql.SparkSession
import graft.queries.TpchGraph

/** Throwaway dev harness for the Cypher engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val eng = TpchGraph.engine(spark, "/root/testdata/sf0.001")

    val queries = Seq(
      "scan" -> "MATCH (c:Customer) RETURN c.c_name AS name LIMIT 3",
      "filter" -> "MATCH (c:Customer) WHERE c.c_acctbal > 9000 RETURN c.c_name AS name, c.c_acctbal AS bal ORDER BY bal DESC LIMIT 3",
      "hop" -> "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 300000 RETURN c.c_name AS name, o.o_totalprice AS price ORDER BY price DESC LIMIT 3",
      "agg" -> "MATCH (c:Customer) RETURN c.c_mktsegment AS seg, count(*) AS n, round(avg(c.c_acctbal), 2) AS avg_bal ORDER BY seg",
      "twohop" -> "MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part) RETURN count(*) AS n",
      "with" -> "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, count(o) AS n_orders WHERE n_orders > 12 RETURN c.c_name AS name, n_orders ORDER BY n_orders DESC, name LIMIT 5",
      "optional" -> "MATCH (n:Nation) OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n) RETURN n.n_name AS nation, count(c) AS n_cust ORDER BY n_cust DESC LIMIT 5",
      "unwind" -> "UNWIND [1,2,3] AS x RETURN x, x*2 AS dbl",
      "union" -> "MATCH (c:Customer) RETURN c.c_nationkey AS nk UNION MATCH (s:Supplier) RETURN s.s_nationkey AS nk",
      "exists" -> "MATCH (c:Customer) WHERE EXISTS { (c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 400000 } RETURN count(*) AS n",
      "case_in" -> "MATCH (o:Order) RETURN CASE WHEN o.o_totalprice < 100000 THEN 'lo' ELSE 'hi' END AS band, count(*) AS n",
      "strings" -> "MATCH (c:Customer) WHERE c.c_name ENDS WITH '7' RETURN toUpper(c.c_name) AS u, size(c.c_name) AS len LIMIT 3",
      "listcomp" -> "UNWIND [[1,2,3],[4,5,6]] AS l RETURN [x IN l WHERE x % 2 = 0 | x * 10] AS evens, reduce(s = 0, x IN l | s + x) AS total",
      "varlen" -> "MATCH (n:Nation)-[:IN_REGION*1..1]->(r:Region) RETURN r.r_name AS region, count(*) AS n_nations ORDER BY region",
      "distinct" -> "MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg ORDER BY seg"
    )
    queries.foreach { case (name, q) =>
      try {
        val df = eng.query(q)
        println(s"=== $name: OK ${df.count()} rows")
        df.show(5, truncate = false)
      } catch {
        case e: Throwable =>
          println(s"=== $name: FAIL ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
