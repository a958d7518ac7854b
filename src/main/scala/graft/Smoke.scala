package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: exercises the driver's `SparkEntry.entry` contract and
  * prints plan + row count. Usage: sbt "runMain graft.Smoke [queryName sfDir]".
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args match {
      case Array(name, sfDir) =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
        val t0 = System.nanoTime()
        println(s"[smoke] $name rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
      case _ =>
        val df = SparkEntry.entry(spark)
        val n = df.count()
        println(s"[smoke] entry rows=$n")
        df.show(5, truncate = false)
        assert(n > 0, "entry must return rows")
    }
    spark.stop()
  }
}
