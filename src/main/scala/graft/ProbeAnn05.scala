package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage probe of knnLabelAgreement's plan cost. */
object ProbeAnn05 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"[probe] n=${df.count()}")
    import graft.operators.Similarity
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val nd = 64
    def norm(c: org.apache.spark.sql.Column) = sqrt(
      (1 to nd).map(d => element_at(c, d) * element_at(c, d))
        .foldLeft(lit(0.0))(_ + _))
    val v = df.select(col("vec_id").as("id"), col("label").as("lbl"),
      transform(col("embedding").cast("array<double>"),
        x => x / norm(col("embedding").cast("array<double>"))).as("v"))
      .localCheckpoint(true)
    val r = v.select(col("id").as("id2"), col("v").as("v2"), col("lbl").as("lbl2"))
    def pairDot = (1 to nd).map(d => element_at(col("v"), d) * element_at(col("v2"), d))
      .foldLeft(lit(0.0))(_ + _)
    val pairs = v.crossJoin(broadcast(r)).filter(col("id") =!= col("id2"))
      .select(col("id"), col("lbl"), col("id2"), col("lbl2"),
        round(pairDot, 6).as("__cos"))
    timed("pairs+dot only")(pairs.count())
    timed("pairs+dot only (2nd)")(pairs.count())
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col("id")).orderBy(col("__cos").desc, col("id2"))
    val top = pairs.withColumn("__rn", row_number().over(wk)).filter(col("__rn") <= 5)
    timed("with window topk")(top.count())
    val pinned = pairs.localCheckpoint(true)
    timed("window on pinned pairs")(
      pinned.withColumn("__rn", row_number().over(wk)).filter(col("__rn") <= 5).count())
    val agg = pairs.groupBy(col("id"), col("lbl"))
      .agg(slice(sort_array(collect_list(struct((-col("__cos")).as("nc"),
        col("id2"), col("lbl2")))), 1, 5).as("top"))
    timed("groupBy collect+slice topk")(agg.count())
    timed("repartitioned window")(
      pairs.repartition(32, col("id"))
        .withColumn("__rn", row_number().over(wk)).filter(col("__rn") <= 5).count())
    println("=== WINDOW PLAN ===")
    top.explain("formatted")
    println("=== AGG PLAN ===")
    agg.explain("formatted")
    spark.stop()
  }
}
