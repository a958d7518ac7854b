package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric band (range) join — the value-space sibling of
  * [[AsOfJoin]]: every (left, right) pair whose numeric columns are
  * within `eps` of each other, without a cross join.
  *
  * Lowering: both sides land on an eps-grid (`floor(v/eps)`); the
  * right side is exploded to its own cell plus both neighbors, and the
  * pair candidates come from ONE equi-join on the cell key. Recall is
  * exact: |a−b| ≤ eps implies |a/eps − b/eps| ≤ 1, so the floors
  * differ by at most one cell. A codegen'd |diff| ≤ eps filter
  * discards the false candidates the 3-cell probe admits.
  *
  * Scale: the only shuffle is the grid-key equi-join (right side 3×
  * its row count, both sides hash-partitioned on a long); a hot cell
  * means genuinely many near-equal values — exactly the pairs the
  * operator must emit. Skew beyond that is AQE's job.
  */
object BandJoin {

  def bandJoin(left: DataFrame, lValCol: String,
               right: DataFrame, rValCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val lb = left.withColumn("__band",
      floor(col(lValCol) / eps).cast("long"))
    val rb = right
      .withColumn("__b0", floor(col(rValCol) / eps).cast("long"))
      .withColumn("__band",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    lb.join(rb, Seq("__band"))
      .filter(abs(col(lValCol) - col(rValCol)) <= eps)
      .drop("__band")
  }
}
