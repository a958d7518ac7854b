package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage — the Spark-native realization of the
  * reference's adjacency index (graph_index.py:60-217; SURVEY §2.10 /
  * §4.2 map that index to "bucketed/partitioned edge tables").
  *
  * An edge table written with `bucketBy(n, "src")` is physically
  * hash-partitioned on disk: every equi-join keyed on `src` against a
  * table bucketed the same way (or any frame Spark must shuffle
  * anyway) reads the buckets CO-LOCATED — the bucketed side is never
  * exchanged, which at 100 TB means the dominant traversal joins skip
  * their corpus-sized shuffle entirely. `sortBy` within buckets adds
  * the O(degree) locality of the reference's per-vertex adjacency
  * lists (sorted runs per source id, merge-joinable without a sort).
  *
  * This is storage-level: frames read back via [[table]] carry the
  * bucketing in their scan metadata, so Catalyst's EnsureRequirements
  * drops the exchange on that side automatically — `PlanSpec` asserts
  * both the co-bucketed (zero exchanges) and one-sided (bucketed side
  * unshuffled) join shapes. Register the read-back frame in
  * `GraphCatalog` and every compiled hop against it inherits the
  * shuffle elision.
  */
object BucketedGraphStore {

  /** Write `df` as a bucketed parquet table in the session catalog.
    * `path` pins the files to an external location (otherwise the
    * session warehouse dir).
    */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
                    buckets: Int = 32, sortCols: Seq[String] = Seq.empty,
                    path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    val w0 = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w1 = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    val w2 = path.fold(w1)(p => w1.option("path", p))
    w2.saveAsTable(name)
  }

  /** The bucketed table as a DataFrame (scan carries the bucket spec). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
