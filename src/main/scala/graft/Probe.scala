package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling harness (like Scratch). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    import graft.operators.Dedup
    (1 to 2).foreach { round =>
      val rows = Dedup.shingleRows(docs, "doc_id", "text", 3)
      time(s"r$round shingleRows count")(println("  n=" + rows.count()))
      val distinct = rows.dropDuplicates("id", "shingle")
      time(s"r$round distinct count")(println("  n=" + distinct.count()))
      val m = classOf[Dedup.type].getDeclaredMethods
        .find(_.getName == "invertedIndexPairs").get
      m.setAccessible(true)
      val cand = m.invoke(Dedup, distinct, Double.box(0.5), Int.box(1000))
        .asInstanceOf[org.apache.spark.sql.DataFrame]
      time(s"r$round candidates count")(println("  n=" + cand.count()))
      val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      time(s"r$round full dd04 count")(println("  n=" + full.count()))
    }
  }
}
