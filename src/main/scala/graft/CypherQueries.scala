package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.TpchGraph

/** Queries executed through the graft Cypher engine (parser + compiler)
  * over the TPC-H graph mapping (FIXTURES.md §B). Each entry's DuckDB
  * oracle expresses the same FK joins in SQL, making the driver's
  * correctness gate a full differential test of parse → compile →
  * execute. Column aliases match the oracle exactly.
  */
object CypherQueries {

  private def run(cypher: String): (SparkSession, String) => DataFrame =
    (spark, dir) => TpchGraph.engine(spark, dir).query(cypher)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // entity scan + projection
    "cy01_scan" -> run(
      "MATCH (c:Customer) RETURN c.c_custkey AS custkey, c.c_name AS name"),

    // WHERE filter (pushed to the parquet scan by Catalyst)
    "cy02_filter" -> run(
      """MATCH (c:Customer) WHERE c.c_acctbal > 5000 AND c.c_mktsegment = 'BUILDING'
         RETURN c.c_custkey AS custkey, c.c_acctbal AS bal"""),

    // 1-hop traversal (FK-derived PLACED relationship)
    "cy03_hop" -> run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         RETURN c.c_custkey AS custkey, o.o_orderkey AS orderkey,
                o.o_totalprice AS price"""),

    // implicit Cypher grouping (non-aggregate items are the keys)
    "cy04_agg" -> run(
      """MATCH (c:Customer)
         RETURN c.c_mktsegment AS seg, count(*) AS n,
                round(avg(c.c_acctbal), 4) AS avg_bal"""),

    // 2-hop traversal with grouping
    "cy05_twohop" -> run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part)
         RETURN c.c_mktsegment AS seg, count(*) AS n"""),

    // OPTIONAL MATCH → left join; count(c) counts matches, not rows
    "cy06_optional" -> run(
      """MATCH (n:Nation) OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
         RETURN n.n_name AS nation, count(c) AS n_cust"""),

    // WITH + aggregation + post-aggregation WHERE (HAVING shape)
    "cy07_with_having" -> run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         WITH c, count(o) AS n_orders WHERE n_orders > 12
         RETURN c.c_name AS name, n_orders"""),

    // ORDER BY / LIMIT (top-k via TakeOrderedAndProject)
    "cy08_topk" -> run(
      """MATCH (o:Order)
         RETURN o.o_orderkey AS orderkey, o.o_totalprice AS price
         ORDER BY price DESC, orderkey LIMIT 5"""),

    // UNION (dedup)
    "cy09_union" -> run(
      """MATCH (c:Customer) RETURN c.c_nationkey AS nk
         UNION
         MATCH (s:Supplier) RETURN s.s_nationkey AS nk"""),

    // UNWIND + expression arithmetic
    "cy10_unwind" -> run(
      "UNWIND range(1, 10) AS x RETURN x, x * x AS sq"),

    // EXISTS pattern predicate → semi join
    "cy11_exists" -> run(
      """MATCH (c:Customer)
         WHERE EXISTS { (c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 400000 }
         RETURN c.c_mktsegment AS seg, count(*) AS n"""),

    // NOT EXISTS → anti join
    "cy12_not_exists" -> run(
      """MATCH (c:Customer)
         WHERE NOT EXISTS { (c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 300000 }
         RETURN c.c_mktsegment AS seg, count(*) AS n"""),

    // scalar string functions + predicates
    "cy13_strings" -> run(
      """MATCH (c:Customer) WHERE c.c_name ENDS WITH '7'
         RETURN c.c_custkey AS custkey, toUpper(c.c_name) AS uname,
                substring(c.c_name, 0, 8) AS prefix, size(c.c_name) AS len"""),

    // CASE expression with grouping
    "cy14_case" -> run(
      """MATCH (o:Order)
         RETURN CASE WHEN o.o_totalprice < 100000 THEN 'lo'
                     WHEN o.o_totalprice < 250000 THEN 'mid'
                     ELSE 'hi' END AS band, count(*) AS n"""),

    // var-length path (iterative expansion) over the nation->region edge
    "cy15_varlength" -> run(
      """MATCH (n:Nation)-[:IN_REGION*1..1]->(r:Region)
         RETURN r.r_name AS region, count(*) AS n_nations"""),

    // DISTINCT + ORDER BY + SKIP + LIMIT modifiers
    "cy16_modifiers" -> run(
      """MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg
         ORDER BY seg SKIP 1 LIMIT 3"""),

    // undirected relationship (union of both orientations)
    "cy17_undirected" -> run(
      """MATCH (n:Nation)-[:IN_REGION]-(x:Region)
         RETURN n.n_name AS nation, x.r_name AS region"""),

    // multi-path MATCH joined on shared variable
    "cy18_multipath" -> run(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation), (c)-[:PLACED]->(o:Order)
         RETURN n.n_name AS nation, count(*) AS n_orders"""),

    // inline property map predicate (pushdown at the scan)
    "cy19_prop_map" -> run(
      """MATCH (c:Customer {c_mktsegment: 'MACHINERY'})-[:PLACED]->(o:Order)
         RETURN count(*) AS n"""),

    // list comprehension + reduce over UNWIND
    "cy20_list_ops" -> run(
      """UNWIND [[1,2,3,4],[5,6,7,8]] AS l
         RETURN size([x IN l WHERE x % 2 = 0]) AS n_even,
                reduce(s = 0, x IN l | s + x) AS total"""),

    // percentileCont/percentileDisc-ish + stdev through the engine
    "cy21_percentile" -> run(
      """MATCH (l:Lineitem)
         RETURN l.l_returnflag AS flag,
                round(percentileCont(l.l_quantity, 0.5), 4) AS median_qty,
                round(stdev(l.l_quantity), 4) AS sd_qty"""),

    // collect() as deterministic joined string
    "cy22_collect" -> run(
      """MATCH (n:Nation)
         RETURN n.n_regionkey AS rk,
                join(sort(collect(n.n_name)), ',') AS nations"""),

    // scalar math functions per row through the engine
    "cy23_math" -> run(
      """MATCH (o:Order) WHERE o.o_orderkey % 97 = 0
         RETURN o.o_orderkey AS k,
                round(sqrt(o.o_totalprice), 4) AS sq,
                abs(o.o_totalprice - 100000) AS dist,
                toInteger(o.o_totalprice / 1000) AS kprice"""),

    // temporal truncation through the engine
    "cy24_temporal" -> run(
      """MATCH (o:Order)
         RETURN toString(datetime.truncate('month', o.o_orderdate)) AS month,
                count(*) AS n"""),

    // var-length that actually iterates: walk counts over branching
    // successor edges, depth 1..3 (oracle: recursive CTE, UNION ALL)
    "cy25_varlength_deep" -> run(
      """MATCH (a:Nation)-[:NEXT_N*1..3]->(b:Nation)
         RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                count(*) AS n_paths"""),

    // pattern comprehension: correlated collect with predicate; size()
    // and reduce() consume the list order-independently, and nations
    // with no qualifying customers exercise the empty-list default
    "cy26_pattern_comprehension" -> run(
      """MATCH (n:Nation)
         RETURN n.n_name AS nation,
                size([(c:Customer)-[:FROM_NATION]->(n) WHERE c.c_acctbal > 9000 | c.c_custkey]) AS n_rich,
                reduce(s = 0, k IN [(c:Customer)-[:FROM_NATION]->(n) WHERE c.c_acctbal > 9000 | c.c_custkey] | s + k) AS sum_rich"""),

    // correlated OPTIONAL MATCH WHERE: one conjunct is pattern-local
    // (pre-filters before the left join), the other references an outer
    // variable (r) and moves into the left-join condition
    "cy27_optional_correlated" -> run(
      """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
         OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
         WHERE c.c_acctbal > 3000 AND r.r_regionkey < 3
         RETURN n.n_name AS nation, count(c) AS n_cust"""),

    // duration arithmetic: datetime ± duration (ISO string and unit-map
    // forms), plus a duration-comparison predicate
    "cy28_duration" -> run(
      """MATCH (o:Order) WHERE o.o_orderkey % 100 = 0
         RETURN o.o_orderkey AS k,
                toString(o.o_orderdate + duration('P1M')) AS plus_month,
                toString(o.o_orderdate - duration({days: 10, hours: 12})) AS minus_d,
                duration('P1D') > duration('PT23H') AS cmp"""),

    // mutation pipeline oracle: CREATE from a MATCH, SET, MERGE with
    // both ON MATCH and ON CREATE arms, then read the scratch label
    // back — the DuckDB oracle replays the same writes as CTAS/CASE
    "mu01_mutation_pipeline" -> ((spark, dir) => {
      val eng = TpchGraph.freshEngine(spark, dir) // mutates: never share
      eng.execute(
        """MATCH (r:Region) WHERE r.r_regionkey < 2
           CREATE (c:Colony {ckey: r.r_regionkey + 100, cname: r.r_name})""")
      eng.execute("MATCH (c:Colony) SET c.flag = c.ckey % 2")
      eng.execute(
        """MERGE (c:Colony {ckey: 100})
           ON MATCH SET c.matched = 1 ON CREATE SET c.matched = 0""")
      eng.execute(
        """MERGE (c:Colony {ckey: 999})
           ON MATCH SET c.matched = 1 ON CREATE SET c.matched = 0""")
      eng.query(
        """MATCH (c:Colony)
           RETURN c.ckey AS ckey, c.cname AS cname, c.flag AS flag,
                  c.matched AS matched""")
    }),

    // unlabeled scan over a multi-label catalog: union of candidate
    // label tables with a runtime label predicate — the n:Label filter
    // constant-folds per union branch, so only 2 of 8 tables are scanned
    "cy29_multilabel" -> run(
      """MATCH (n) WHERE n:Nation OR n:Region
         RETURN n.__label AS label, count(*) AS cnt"""),

    // cyclic back-reference: the closing (a) filters the far endpoint
    // against the already-bound start id instead of rescanning
    "cy31_cycle" -> run(
      """MATCH (a:Nation)-[:NEXT_N]->(b:Nation)-[:PREV_N]->(a)
         RETURN a.n_nationkey AS a_key, count(*) AS n"""),

    // introspection: keys()/properties() of a node, labels as predicate
    "cy32_introspection" -> run(
      """MATCH (r:Region)
         RETURN r.r_name AS name, size(keys(r)) AS nk,
                r:Region AS is_region, id(r) AS rid,
                elementId(r) AS eid"""),

    // trig/constants + utility scalars through the engine
    "cy33_scalar_misc" -> run(
      """UNWIND range(0, 5) AS i
         RETURN i, round(sin(i) + cos(i) + pi() / e(), 6) AS trig,
                coalesce(nullIf(i % 2, 0), -1) AS oddity"""),

    // untyped relationship: label-compatible types union (here
    // NEXT_N ∪ PREV_N — the Nation→Nation pair); incompatible types are
    // pruned at compile time, before any scan
    "cy34_untyped_rel" -> run(
      """MATCH (a:Nation)-[]->(b:Nation)
         RETURN a.n_nationkey AS a_key, count(*) AS n"""),

    // WITH ... ORDER BY ... LIMIT mid-query, then continue matching:
    // the top-k subframe drives the second MATCH
    "cy35_with_topk_rematch" -> run(
      """MATCH (c:Customer)
         WITH c ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 10
         MATCH (c)-[:PLACED]->(o:Order)
         RETURN c.c_custkey AS custkey, count(o) AS n_orders"""),

    // collect → UNWIND roundtrip preserves multiset semantics
    "cy36_collect_unwind" -> run(
      """MATCH (n:Nation)
         WITH n.n_regionkey AS rk, collect(n.n_name) AS names
         UNWIND names AS nm
         RETURN rk, count(*) AS n"""),

    // dedup-pipeline clustering: near-dup PAIRS → connected components
    // (min-label propagation + pointer jumping). The +2-step nation
    // graph splits into exactly two components (even / odd keys), so
    // the oracle discriminates real propagation from id echo
    "dd06_connected_components" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.col
      val nation = graft.queries.Tables(spark, dir).nation
      val pairs = nation
        .select(col("n_nationkey").as("id1"), (col("n_nationkey") + 2).as("id2"))
        .join(nation.select(col("n_nationkey").as("id2")), Seq("id2"))
      graft.operators.Components.connectedComponents(pairs, "id1", "id2")
    }),

    // EXISTS referencing an outer-only variable inside a correlated
    // OPTIONAL MATCH WHERE: the semi join is precomputed as a boolean
    // flag on the outer frame and referenced in the left-join condition,
    // so non-qualifying rows null out instead of dropping. Regions 0/1
    // (those containing nationkeys < 3) pass; nations elsewhere count 0
    "cy37_optional_exists" -> run(
      """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
         OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n)
         WHERE c.c_acctbal > 3000
           AND EXISTS { (n2:Nation)-[:IN_REGION]->(r) WHERE n2.n_nationkey < 3 }
         RETURN n.n_name AS nation, count(c) AS n_cust"""),

    // correlated CALL: procedure arguments evaluated per DISTINCT arg
    // tuple (one driver invocation each), results joined back on the
    // tuple — every region row multiplies into regionkey+1 series rows
    "cy38_correlated_call" -> run(
      """MATCH (r:Region)
         CALL graft.series(r.r_regionkey + 1) YIELD value
         RETURN r.r_name AS name, value"""),

    // Unicode NFC normalization through the native expression: the
    // decomposed e+COMBINING ACUTE literal must compose identically to
    // DuckDB's nfc_normalize for the hash compare to pass
    "cy39_normalize" -> run(
      "MATCH (r:Region) RETURN r.r_name AS name, " +
        "normalize(r.r_name + ' cafe\u0301') AS nfc, " + // decomposed e+U+0301
        "size(normalize('cafe\u0301')) AS n_nfc"),

    // Full Unicode case folding (UCD C+F): eszett expansion, Greek
    // final sigma, iota-subscript decomposition, NFKC ligature fold,
    // Cherokee folding UP \u2014 the oracle carries the expected folded
    // literals (no SQL engine exposes casefold), anchored per region
    // row so the compare exercises the join path too
    "cy46_casefold" -> run(
      "MATCH (r:Region) RETURN r.r_name AS name, " +
        "normalize('STRA\u1e9eE', 'NFKCCaseFold') AS f_eszett, " +
        "normalize('\u039f\u0394\u039f\u03a3 \u03bf\u03b4\u03cc\u03c2', 'NFKCCaseFold') AS f_sigma, " +
        "normalize('\u1f88\ufb03\u0149', 'NFKCCaseFold') AS f_expand, " +
        "normalize('\uabb3\uab83\uab79', 'NFKCCaseFold') AS f_cherokee"),

    // EXISTS spanning outer (r) and pattern (n) scope inside the
    // OPTIONAL WHERE, plus a pattern-local parity conjunct: witness-set
    // membership drives the left join (no shared variables at all
    // between the outer frame and the optional pattern)
    "cy41_optional_exists_spanning" -> run(
      """MATCH (r:Region)
         OPTIONAL MATCH (n:Nation)
         WHERE EXISTS { (n)-[:IN_REGION]->(r) } AND n.n_nationkey % 2 = 0
         RETURN r.r_name AS region, count(n) AS n_even"""),

    // worst-case-optimal triangle join (SURVEY §2.3 row 21): the flag
    // routes the closing 3-cycle through adjacency-set intersection
    // instead of wedge materialization; triples are (a, a+1, a+2) in
    // the successor graph, cross-checked by the SQL self-join oracle
    "cy40_wcoj_triangles" -> ((spark, dir) => {
      spark.conf.set("graft.wcoj.enabled", "true")
      try TpchGraph.engine(spark, dir).query(
        """MATCH (a:Nation)-[:NEXT_N]->(b:Nation)-[:NEXT_N]->(c:Nation)-[:PREV_N]->(a)
           RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                  c.n_nationkey AS c_key""")
      finally spark.conf.unset("graft.wcoj.enabled")
    }),

    // shortestPath BFS distances per reachable pair
    "cy30_shortestpath" -> run(
      """MATCH p = shortestPath((a:Nation)-[:NEXT_N*1..12]->(b:Nation))
         RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                length(p) AS hops"""),

    // openCypher TRAIL semantics (relationship uniqueness) vs the
    // default walk counting, on a cyclic alternation graph ([:NEXT_N|
    // PREV_N] makes a↔a+1 two-cycles): same 3-hop pattern counted both
    // ways; a walk like e1,e2,e1 reuses an edge and is excluded from
    // n_trails. Oracle: recursive CTE carrying the used-edge list.
    "cy42_trail_semantics" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{coalesce, col, lit}
      val eng = TpchGraph.engine(spark, dir)
      val q =
        """MATCH (a:Nation)-[:NEXT_N|PREV_N*3..3]->(b:Nation)
           RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key, count(*) AS n"""
      val walks = eng.query(q).withColumnRenamed("n", "n_walks")
      spark.conf.set("graft.pathExpand.trailSemantics", "true")
      val trails =
        try eng.query(q).withColumnRenamed("n", "n_trails")
        finally spark.conf.unset("graft.pathExpand.trailSemantics")
      walks.join(trails, Seq("a_key", "b_key"), "left_outer")
        .select(col("a_key"), col("b_key"), col("n_walks"),
          coalesce(col("n_trails"), lit(0L)).as("n_trails"))
    }),

    // nodes(p)/relationships(p) path materialization (beyond-parity:
    // the reference's path expander reports hop counts only, and this
    // openCypher surface is absent there — SURVEY §6 divergence: the
    // functions return IDENTITY sequences, not entity maps). The
    // frontier carries each walk's node-id array under the opt-in
    // conf; the oracle's recursive CTE rebuilds the same arrays, and
    // n_rels (= size(relationships(p))) pins the edge-identity array's
    // length to the hop count on every row.
    "cy43_path_functions" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{array_join, col}
      spark.conf.set("graft.pathExpand.materializePaths", "true")
      try TpchGraph.engine(spark, dir).query(
        """MATCH p = (a:Nation)-[:NEXT_N*2..3]->(b:Nation)
           RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                  length(p) AS hops, nodes(p) AS node_ids,
                  size(relationships(p)) AS n_rels""")
        // joined to a string for the gate (array columns break engines'
        // row-sort comparators); the raw array surface is spec-tested
        .withColumn("node_ids",
          array_join(col("node_ids").cast("array<string>"), ","))
      finally spark.conf.unset("graft.pathExpand.materializePaths")
    }),

    // deterministic shortestPath WITNESS: under materializePaths the
    // BFS per-hop dedup keeps the lexicographically least (nodes,
    // edges) prefix per (origin, node), which makes the surviving
    // path the global lex-min shortest node sequence — a well-defined
    // value an external oracle can recompute (openCypher leaves the
    // witness implementation-defined; an arbitrary one could never be
    // hash-gated). Oracle: enumerate all walks, rank by (hops, nodes).
    "cy44_shortestpath_witness" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{array_join, col}
      spark.conf.set("graft.pathExpand.materializePaths", "true")
      try TpchGraph.engine(spark, dir).query(
        """MATCH p = shortestPath((a:Nation)-[:NEXT_N*1..12]->(b:Nation))
           RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                  length(p) AS hops, nodes(p) AS node_ids""")
        .withColumn("node_ids",
          array_join(col("node_ids").cast("array<string>"), ","))
      finally spark.conf.unset("graft.pathExpand.materializePaths")
    }),

    // allShortestPaths enumeration: EVERY min-hop witness per endpoint
    // pair (only distinguishable from shortestPath with materialized
    // paths — hop counts alone coincide). In the successor graph an odd
    // distance d = 2k-1 has exactly k shortest decompositions (one
    // 1-step among k-1 2-steps), so the pair multiplicities are a real
    // differential, oracled by the same walk CTE without the rn=1 cut.
    "cy45_all_shortest_witnesses" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{array_join, col}
      spark.conf.set("graft.pathExpand.materializePaths", "true")
      try TpchGraph.engine(spark, dir).query(
        """MATCH p = allShortestPaths((a:Nation)-[:NEXT_N*1..12]->(b:Nation))
           RETURN a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                  length(p) AS hops, nodes(p) AS node_ids""")
        .withColumn("node_ids",
          array_join(col("node_ids").cast("array<string>"), ","))
      finally spark.conf.unset("graft.pathExpand.materializePaths")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "cy01_scan" ->
      "SELECT c_custkey AS custkey, c_name AS name FROM customer",
    "cy02_filter" ->
      """SELECT c_custkey AS custkey, c_acctbal AS bal FROM customer
         WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'""",
    "cy03_hop" ->
      """SELECT c_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS price
         FROM customer JOIN orders ON c_custkey = o_custkey""",
    "cy04_agg" ->
      """SELECT c_mktsegment AS seg, count(*) AS n,
         round(avg(c_acctbal), 4) AS avg_bal
         FROM customer GROUP BY 1""",
    "cy05_twohop" ->
      """SELECT c_mktsegment AS seg, count(*) AS n
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "cy06_optional" ->
      """SELECT n_name AS nation, count(c_custkey) AS n_cust
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY 1""",
    "cy07_with_having" ->
      """SELECT c_name AS name, count(*) AS n_orders
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name HAVING count(*) > 12""",
    "cy08_topk" ->
      """SELECT o_orderkey AS orderkey, o_totalprice AS price
         FROM orders ORDER BY price DESC, orderkey LIMIT 5""",
    "cy09_union" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION SELECT s_nationkey AS nk FROM supplier""",
    "cy10_unwind" ->
      "SELECT x, x * x AS sq FROM (SELECT unnest(range(1, 11)) AS x)",
    "cy11_exists" ->
      """SELECT c_mktsegment AS seg, count(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         GROUP BY 1""",
    "cy12_not_exists" ->
      """SELECT c_mktsegment AS seg, count(*) AS n FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         GROUP BY 1""",
    "cy13_strings" ->
      """SELECT c_custkey AS custkey, upper(c_name) AS uname,
         substring(c_name, 1, 8) AS prefix, length(c_name) AS len
         FROM customer WHERE c_name LIKE '%7'""",
    "cy14_case" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'lo'
                     WHEN o_totalprice < 250000 THEN 'mid'
                     ELSE 'hi' END AS band, count(*) AS n
         FROM orders GROUP BY 1""",
    "cy15_varlength" ->
      """SELECT r_name AS region, count(*) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1""",
    "cy16_modifiers" ->
      """SELECT DISTINCT c_mktsegment AS seg FROM customer
         ORDER BY seg OFFSET 1 LIMIT 3""",
    "cy17_undirected" ->
      """SELECT n_name AS nation, r_name AS region
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "cy18_multipath" ->
      """SELECT n_name AS nation, count(*) AS n_orders
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY 1""",
    "cy19_prop_map" ->
      """SELECT count(*) AS n
         FROM customer JOIN orders ON c_custkey = o_custkey
         WHERE c_mktsegment = 'MACHINERY'""",
    "cy20_list_ops" ->
      """SELECT len(list_filter(l, x -> x % 2 = 0)) AS n_even,
         CAST(list_sum(l) AS BIGINT) AS total
         FROM (VALUES ([1,2,3,4]), ([5,6,7,8])) t(l)""",
    "cy21_percentile" ->
      """SELECT l_returnflag AS flag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(stddev_samp(l_quantity), 4) AS sd_qty
         FROM lineitem GROUP BY 1""",
    "cy22_collect" ->
      """SELECT n_regionkey AS rk,
         array_to_string(list_sort(list(n_name)), ',') AS nations
         FROM nation GROUP BY 1""",
    "cy23_math" ->
      """SELECT o_orderkey AS k,
         round(sqrt(o_totalprice), 4) AS sq,
         abs(o_totalprice - 100000) AS dist,
         CAST(trunc(o_totalprice / 1000) AS BIGINT) AS kprice
         FROM orders WHERE o_orderkey % 97 = 0""",
    "cy24_temporal" ->
      """SELECT strftime(date_trunc('month', o_orderdate),
                         '%Y-%m-%d %H:%M:%S') AS month,
         count(*) AS n
         FROM orders GROUP BY 1""",
    "cy25_varlength_deep" ->
      """WITH RECURSIVE e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b
             ON b.n_nationkey = a.n_nationkey + 1
             OR b.n_nationkey = a.n_nationkey + 2
         ),
         walk AS (
           SELECT src, dst, 1 AS depth FROM e
           UNION ALL
           SELECT w.src, e.dst, w.depth + 1
           FROM walk w JOIN e ON e.src = w.dst WHERE w.depth < 3
         )
         SELECT src AS a_key, dst AS b_key, count(*) AS n_paths
         FROM walk GROUP BY 1, 2""",
    "cy26_pattern_comprehension" ->
      """SELECT n_name AS nation,
         count(c_custkey) AS n_rich,
         CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS sum_rich
         FROM nation LEFT JOIN customer
           ON c_nationkey = n_nationkey AND c_acctbal > 9000
         GROUP BY 1""",
    "cy27_optional_correlated" ->
      """SELECT n_name AS nation, count(c_custkey) AS n_cust
         FROM nation JOIN region ON n_regionkey = r_regionkey
         LEFT JOIN customer
           ON c_nationkey = n_nationkey AND c_acctbal > 3000 AND r_regionkey < 3
         GROUP BY 1""",
    "cy28_duration" ->
      """SELECT o_orderkey AS k,
         strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_month,
         strftime(o_orderdate - (INTERVAL 10 DAY + INTERVAL 12 HOUR),
                  '%Y-%m-%d %H:%M:%S') AS minus_d,
         TRUE AS cmp
         FROM orders WHERE o_orderkey % 100 = 0""",
    "mu01_mutation_pipeline" ->
      """SELECT r_regionkey + 100 AS ckey, r_name AS cname,
                (r_regionkey + 100) % 2 AS flag,
                CASE WHEN r_regionkey = 0 THEN 1 END AS matched
         FROM region WHERE r_regionkey < 2
         UNION ALL
         SELECT 999, NULL, NULL, 0""",
    "cy29_multilabel" ->
      """SELECT 'Nation' AS label, count(*) AS cnt FROM nation
         UNION ALL
         SELECT 'Region' AS label, count(*) AS cnt FROM region""",
    "cy31_cycle" ->
      """WITH e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b
             ON b.n_nationkey = a.n_nationkey + 1
             OR b.n_nationkey = a.n_nationkey + 2
         )
         SELECT src AS a_key, count(*) AS n FROM e GROUP BY 1""",
    "cy32_introspection" ->
      """SELECT r_name AS name, 2 AS nk, TRUE AS is_region,
         r_regionkey AS rid, CAST(r_regionkey AS VARCHAR) AS eid
         FROM region""",
    "cy33_scalar_misc" ->
      """SELECT i, round(sin(i) + cos(i) + pi() / exp(1), 6) AS trig,
         coalesce(nullif(i % 2, 0), -1) AS oddity
         FROM (SELECT unnest(range(0, 6)) AS i)""",
    "cy34_untyped_rel" ->
      """WITH e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b
             ON b.n_nationkey = a.n_nationkey + 1
             OR b.n_nationkey = a.n_nationkey + 2
         ),
         both_dirs AS (
           SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
         )
         SELECT src AS a_key, count(*) AS n FROM both_dirs GROUP BY 1""",
    "cy35_with_topk_rematch" ->
      """SELECT c_custkey AS custkey, count(*) AS n_orders
         FROM (SELECT c_custkey FROM customer
               ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
         JOIN orders ON o_custkey = c_custkey
         GROUP BY 1""",
    "cy36_collect_unwind" ->
      """SELECT n_regionkey AS rk, count(*) AS n
         FROM nation GROUP BY 1""",
    "dd06_connected_components" ->
      """WITH RECURSIVE e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 2
         ),
         und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         reach AS (
           SELECT src AS id, src AS r FROM und
           UNION
           SELECT reach.id, und.dst FROM reach JOIN und ON und.src = reach.r
         )
         SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS comp
         FROM reach GROUP BY 1""",
    "cy37_optional_exists" ->
      """WITH flag AS (
           SELECT DISTINCT n_regionkey AS rk FROM nation WHERE n_nationkey < 3
         )
         SELECT n_name AS nation, count(c_custkey) AS n_cust
         FROM nation
         JOIN region ON n_regionkey = r_regionkey
         LEFT JOIN flag ON flag.rk = r_regionkey
         LEFT JOIN customer ON c_nationkey = n_nationkey
           AND c_acctbal > 3000 AND flag.rk IS NOT NULL
         GROUP BY 1""",
    "cy38_correlated_call" ->
      """SELECT r_name AS name, s.value AS value
         FROM region, (SELECT unnest(range(1, 6)) AS value) s
         WHERE s.value <= r_regionkey + 1""",
    "cy39_normalize" ->
      ("SELECT r_name AS name, nfc_normalize(r_name || ' cafe\u0301') AS nfc, " +
        "length(nfc_normalize('cafe\u0301')) AS n_nfc FROM region"),
    "cy46_casefold" ->
      ("SELECT r_name AS name, 'strasse' AS f_eszett, " +
        "'\u03bf\u03b4\u03bf\u03c3 \u03bf\u03b4\u03cc\u03c3' AS f_sigma, " +
        "'\u1f00\u03b9ffi\u02bcn' AS f_expand, " +
        "'\u13e3\u13b3\u13a9' AS f_cherokee FROM region"),
    "cy41_optional_exists_spanning" ->
      """SELECT r_name AS region, count(n_nationkey) AS n_even
         FROM region LEFT JOIN nation
           ON n_regionkey = r_regionkey AND n_nationkey % 2 = 0
         GROUP BY 1""",
    "cy40_wcoj_triangles" ->
      """WITH e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b
             ON b.n_nationkey = a.n_nationkey + 1
             OR b.n_nationkey = a.n_nationkey + 2
         )
         SELECT e1.src AS a_key, e1.dst AS b_key, e2.dst AS c_key
         FROM e e1
         JOIN e e2 ON e2.src = e1.dst
         JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""",
    "cy30_shortestpath" ->
      """WITH RECURSIVE e AS (
           SELECT a.n_nationkey AS src, b.n_nationkey AS dst
           FROM nation a JOIN nation b
             ON b.n_nationkey = a.n_nationkey + 1
             OR b.n_nationkey = a.n_nationkey + 2
         ),
         walk AS (
           SELECT src, dst, 1 AS depth FROM e
           UNION ALL
           SELECT w.src, e.dst, w.depth + 1
           FROM walk w JOIN e ON e.src = w.dst WHERE w.depth < 12
         )
         SELECT src AS a_key, dst AS b_key,
                CAST(min(depth) AS BIGINT) AS hops
         FROM walk GROUP BY 1, 2""",
    // walks vs trails over the NEXT_N|PREV_N alternation: enumerate all
    // 3-hop walks carrying their edge-id list; trails are the walks
    // whose three edges are pairwise distinct
    "cy42_trail_semantics" ->
      """WITH RECURSIVE nk AS (SELECT n_nationkey AS k FROM nation),
         st AS (
           SELECT k AS src, k + 1 AS dst FROM nk
           UNION ALL SELECT k AS src, k + 2 AS dst FROM nk
         ),
         e0 AS (
           SELECT 'N' AS ty, st.src, st.dst FROM st JOIN nk ON nk.k = st.dst
           UNION ALL
           SELECT 'P' AS ty, st.dst AS src, st.src AS dst
           FROM st JOIN nk ON nk.k = st.dst
         ),
         e AS (
           SELECT row_number() OVER (ORDER BY ty, src, dst) AS id, src, dst
           FROM e0
         ),
         walk AS (
           SELECT k AS origin, k AS node, 0 AS hops,
                  CAST([] AS BIGINT[]) AS eids FROM nk
           UNION ALL
           SELECT w.origin, e.dst, w.hops + 1, list_append(w.eids, e.id)
           FROM walk w JOIN e ON e.src = w.node
           WHERE w.hops < 3
         ),
         wk AS (
           SELECT origin, node, count(*) AS n_walks,
                  count(*) FILTER (len(list_distinct(eids)) = 3) AS n_trails
           FROM walk WHERE hops = 3 GROUP BY 1, 2
         )
         SELECT origin AS a_key, node AS b_key,
                n_walks, CAST(n_trails AS BIGINT) AS n_trails
         FROM wk""",
    // every 2..3-hop walk in the successor graph carrying its node-id
    // list; n_rels must equal the hop count (one relationship per hop)
    "cy43_path_functions" ->
      """WITH RECURSIVE nk AS (SELECT n_nationkey AS k FROM nation),
         st AS (
           SELECT k AS src, k + 1 AS dst FROM nk
           UNION ALL SELECT k AS src, k + 2 AS dst FROM nk
         ),
         e AS (SELECT st.src, st.dst FROM st JOIN nk ON nk.k = st.dst),
         walk AS (
           SELECT k AS origin, k AS node, 0 AS hops,
                  [CAST(k AS BIGINT)] AS nodes FROM nk
           UNION ALL
           SELECT w.origin, e.dst, w.hops + 1,
                  list_append(w.nodes, CAST(e.dst AS BIGINT))
           FROM walk w JOIN e ON e.src = w.node
           WHERE w.hops < 3
         )
         SELECT origin AS a_key, node AS b_key, CAST(hops AS BIGINT) AS hops,
                array_to_string(nodes, ',') AS node_ids,
                CAST(hops AS INTEGER) AS n_rels
         FROM walk WHERE hops >= 2""",
    // lex-min shortest witness: all walks to depth 12 carrying node
    // lists, ranked per (origin, node) by (hops, nodes) — rn=1 is
    // exactly the witness the deterministic BFS reduction must keep
    "cy44_shortestpath_witness" ->
      """WITH RECURSIVE nk AS (SELECT n_nationkey AS k FROM nation),
         st AS (
           SELECT k AS src, k + 1 AS dst FROM nk
           UNION ALL SELECT k AS src, k + 2 AS dst FROM nk
         ),
         e AS (SELECT st.src, st.dst FROM st JOIN nk ON nk.k = st.dst),
         walk AS (
           SELECT k AS origin, k AS node, 0 AS hops,
                  [CAST(k AS BIGINT)] AS nodes FROM nk
           UNION ALL
           SELECT w.origin, e.dst, w.hops + 1,
                  list_append(w.nodes, CAST(e.dst AS BIGINT))
           FROM walk w JOIN e ON e.src = w.node
           WHERE w.hops < 12
         ),
         sel AS (
           SELECT origin, node, hops, nodes,
                  row_number() OVER (PARTITION BY origin, node
                                     ORDER BY hops, nodes) AS rn
           FROM walk WHERE hops >= 1
         )
         SELECT origin AS a_key, node AS b_key, CAST(hops AS BIGINT) AS hops,
                array_to_string(nodes, ',') AS node_ids
         FROM sel WHERE rn = 1""",
    // every min-hop witness: the same walk enumeration, min-hop filter
    // per pair, all distinct node sequences kept
    "cy45_all_shortest_witnesses" ->
      """WITH RECURSIVE nk AS (SELECT n_nationkey AS k FROM nation),
         st AS (
           SELECT k AS src, k + 1 AS dst FROM nk
           UNION ALL SELECT k AS src, k + 2 AS dst FROM nk
         ),
         e AS (SELECT st.src, st.dst FROM st JOIN nk ON nk.k = st.dst),
         walk AS (
           SELECT k AS origin, k AS node, 0 AS hops,
                  [CAST(k AS BIGINT)] AS nodes FROM nk
           UNION ALL
           SELECT w.origin, e.dst, w.hops + 1,
                  list_append(w.nodes, CAST(e.dst AS BIGINT))
           FROM walk w JOIN e ON e.src = w.node
           WHERE w.hops < 12
         ),
         sel AS (SELECT origin, node, hops, nodes FROM walk WHERE hops >= 1),
         mn AS (SELECT origin, node, min(hops) AS mh FROM sel GROUP BY 1, 2)
         SELECT DISTINCT sel.origin AS a_key, sel.node AS b_key,
                CAST(sel.hops AS BIGINT) AS hops,
                array_to_string(sel.nodes, ',') AS node_ids
         FROM sel JOIN mn ON sel.origin = mn.origin AND sel.node = mn.node
                         AND sel.hops = mn.mh"""
  )
}
