package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Worst-case-optimal triangle join — the Spark-native counterpart of
  * the reference's leapfrog trie-join (/root/reference/packages/
  * pycypher/src/pycypher/leapfrog_triejoin.py:344-419), re-expressed
  * with existing codegen'd operators instead of a hand-built trie
  * iterator.
  *
  * A binary-join plan for (a)→(b)→(c)→(a) materializes the open wedge
  * (a,b,c) BEFORE the closing edge filters it — worst case |E|² rows
  * for |E|^1.5 output (AGM bound). The leapfrog insight is to extend
  * one vertex at a time through set intersection. Its relational
  * translation:
  *
  *   1. group each non-spine edge set into per-vertex adjacency arrays
  *      (one row per vertex — the trie levels, built by ONE map-side-
  *      combined aggregate each);
  *   2. join the spine edge set (a,b) against both adjacency tables on
  *      its endpoints (vertex-keyed equi-joins, broadcastable when the
  *      vertex count is small);
  *   3. per spine edge, `array_intersect` the b-successors with the
  *      a-closers and explode — the leapfrog intersection, O(deg_b +
  *      deg_a) per edge, so total work matches the WCOJ bound
  *      Σ_(a,b)∈E min-degree instead of the wedge count.
  *
  * Every step is whole-stage-codegen'd; shuffles are |E| rows (spine)
  * plus one row per vertex (adjacency). Assumes simple edge sets
  * (openCypher relationship uniqueness dedups edge triples anyway —
  * `collect_set` makes that explicit). Known caveat at 100 TB: a
  * celebrity vertex makes one adjacency array large; cap or salt such
  * vertices into the binary-join fallback if degree skew is unbounded.
  */
object Wcoj {

  /** Enumerate triangles a→b→c→a: `ab`, `bc`, `ca` are edge frames in
    * pattern orientation with columns (src, dst). Returns (a, b, c) id
    * triples, one row per distinct edge triple.
    */
  def triangles(ab: DataFrame, bc: DataFrame, ca: DataFrame): DataFrame = {
    val succB = bc.groupBy(col("src").as("__b"))
      .agg(collect_set(col("dst")).as("__b_succ"))
    val closeA = ca.groupBy(col("dst").as("__a"))
      .agg(collect_set(col("src")).as("__a_close"))
    ab.select(col("src").as("a"), col("dst").as("b"))
      .join(succB, col("b") === col("__b"))
      .join(closeA, col("a") === col("__a"))
      .select(col("a"), col("b"),
        explode(array_intersect(col("__b_succ"), col("__a_close"))).as("c"))
  }
}
