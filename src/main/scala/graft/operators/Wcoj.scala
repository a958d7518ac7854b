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
  *   1. count parallel edges per (src, dst), then group each non-spine
  *      edge set into per-vertex adjacency MAPS neighbor→multiplicity
  *      (one row per vertex — the trie levels, built by TWO map-side-
  *      combined aggregates each);
  *   2. join the spine edge set (a,b) against both adjacency tables on
  *      its endpoints (vertex-keyed equi-joins, broadcastable when the
  *      vertex count is small);
  *   3. per spine edge, `array_intersect` the b-successor keys with the
  *      a-closer keys and explode — the leapfrog intersection, O(deg_b +
  *      deg_a) per edge, so total work matches the WCOJ bound
  *      Σ_(a,b)∈E min-degree instead of the wedge count. Each surviving
  *      c replicates cnt_bc × cnt_ca times, so multigraph edge sets
  *      return one row per distinct EDGE triple — exactly the
  *      binary-join (and openCypher) row multiplicity, where parallel
  *      relationships are separate match rows.
  *
  * Degree skew: a celebrity vertex would make one adjacency map huge
  * (an unbounded single row). Vertices whose adjacency would exceed
  * `maxAdjDegree` distinct neighbors are excluded from the adjacency
  * build entirely; spine edges touching them detour through the plain
  * binary-join plan (bounded task size, identical results — the heavy
  * set is tiny by definition, so the routing joins broadcast it).
  * Every step is whole-stage-codegen'd; shuffles are |E| rows (spine)
  * plus one row per vertex (adjacency).
  */
object Wcoj {

  /** Enumerate triangles a→b→c→a: `ab`, `bc`, `ca` are edge frames in
    * pattern orientation with columns (src, dst). Returns (a, b, c) id
    * triples, one row per edge triple (parallel edges multiply, matching
    * binary-join semantics).
    */
  def triangles(ab: DataFrame, bc: DataFrame, ca: DataFrame,
                maxAdjDegree: Int = 1 << 20): DataFrame = {
    // parallel-edge multiplicities — also the distinct-neighbor degree
    // source for the skew guard
    val bcCnt = bc.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val caCnt = ca.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val heavyB = bcCnt.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") > maxAdjDegree).select(col("src").as("b"))
    val heavyA = caCnt.groupBy(col("dst")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") > maxAdjDegree).select(col("dst").as("a"))

    val spine = ab.select(col("src").as("a"), col("dst").as("b"))
    val light = spine
      .join(broadcast(heavyB), Seq("b"), "left_anti")
      .join(broadcast(heavyA), Seq("a"), "left_anti")
    val heavy = spine
      .join(broadcast(heavyB.withColumn("__hb", lit(true))), Seq("b"), "left_outer")
      .join(broadcast(heavyA.withColumn("__ha", lit(true))), Seq("a"), "left_outer")
      .filter(col("__hb").isNotNull || col("__ha").isNotNull)
      .select(col("a"), col("b"))

    // adjacency maps only for light vertices — the heavy rows never form
    val succB = bcCnt.join(broadcast(heavyB.withColumnRenamed("b", "src")),
        Seq("src"), "left_anti")
      .groupBy(col("src").as("__b"))
      .agg(map_from_entries(collect_list(struct(col("dst"), col("cnt"))))
        .as("__b_succ"))
    val closeA = caCnt.join(broadcast(heavyA.withColumnRenamed("a", "dst")),
        Seq("dst"), "left_anti")
      .groupBy(col("dst").as("__a"))
      .agg(map_from_entries(collect_list(struct(col("src"), col("cnt"))))
        .as("__a_close"))

    val lightTriples = light
      .join(succB, col("b") === col("__b"))
      .join(closeA, col("a") === col("__a"))
      .select(col("a"), col("b"),
        explode(array_intersect(map_keys(col("__b_succ")),
          map_keys(col("__a_close")))).as("c"),
        col("__b_succ"), col("__a_close"))
      .select(col("a"), col("b"), col("c"),
        (element_at(col("__b_succ"), col("c")) *
          element_at(col("__a_close"), col("c"))).as("__mult"))
      .withColumn("__r", explode(sequence(lit(1L), col("__mult"))))
      .select(col("a"), col("b"), col("c"))

    // binary-join detour for celebrity vertices: multiplicity is native
    val heavyTriples = heavy
      .join(bc.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .join(ca.select(col("dst").as("a"), col("src").as("c")), Seq("c", "a"))
      .select(col("a"), col("b"), col("c"))

    lightTriples.unionByName(heavyTriples)
  }
}
