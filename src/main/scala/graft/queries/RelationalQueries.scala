package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.1–§2.7) expressed
  * Spark-first over the driver testdata, each with a DuckDB oracle.
  *
  * Conventions shared with the oracle SQL:
  *  - every computed column is aliased identically on both sides;
  *  - floating-point aggregates are `round`ed (sums to 2dp, avgs to 4dp)
  *    so summation-order ulp drift can't flip the driver's hash compare;
  *  - timestamps in output are cast to DATE (or epoch-bucket longs);
  *  - result-set order is irrelevant (driver sorts) except under LIMIT,
  *    where a total order (tiebreak on a key) is imposed on both sides.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // §2.4 grouped aggregation with partial (map-side) combine — TPC-H Q1 shape.
    "q01_pricing_summary" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_price_c"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
            .cast("long")).as("sum_disc_price_e4"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // §2.2 filter + projection — both pushed into the parquet scan.
    "q02_filter_project" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") < lit("1995-09-01").cast("timestamp") && col("l_quantity") < 5)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
            .cast("long").as("net_price_e4"))
    },

    // §2.3 join + §2.4 agg + §2.6 top-k (TakeOrderedAndProject) — TPC-H Q3 shape.
    "q03_topk_revenue" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("long")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("o_orderkey"))
        .limit(10)
    },

    // §2.3 semi join (EXISTS).
    "q04_exists_semijoin" -> { (s, dir) =>
      val t = Tables(s, dir)
      val big = t.lineitem.filter(col("l_quantity") >= 49).select(col("l_orderkey"))
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },

    // §2.3 anti join (NOT EXISTS): customers with no high-value order.
    "q05_not_exists_antijoin" -> { (s, dir) =>
      val t = Tables(s, dir)
      val hi = t.orders.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      t.customer.join(hi, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    },

    // §2.7 DISTINCT.
    "q06_distinct" -> { (s, dir) =>
      Tables(s, dir).lineitem.select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    // §2.7 UNION (dedup) across two tables.
    "q07_union" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.select(col("c_nationkey").as("nk"))
        .union(t.supplier.select(col("s_nationkey").as("nk")))
        .distinct()
    },

    // §2.5-adjacent: ranking window (beyond-parity; reference has no
    // OVER). Demonstrates the NATIVE window surface; a production
    // top-k over a low-cardinality group column should use
    // Sampling.topKPerGroup (salted two-phase, tx14), which returns
    // the identical answer without the per-group single-task sort.
    "q08_window_topn_per_group" -> { (s, dir) =>
      val t = Tables(s, dir)
      val joined = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    },

    // §2.3 left outer join preserving unmatched left rows.
    "q09_left_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.nation.join(t.customer, col("n_nationkey") === col("c_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
    },

    // §2.8 UNWIND/generator — explode.
    "q10_unwind_explode" -> { (s, dir) =>
      Tables(s, dir).part
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
    },

    // §2.8 CASE expression.
    "q11_case_when" -> { (s, dir) =>
      Tables(s, dir).orders
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large").as("band"),
          col("o_totalprice"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
    },

    // §2.8 string functions.
    "q12_string_functions" -> { (s, dir) =>
      Tables(s, dir).customer
        .filter(col("c_custkey") % 7 === 0)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 8).as("name8"),
          concat_ws("#", col("c_name"), col("c_mktsegment")).as("tagged"),
          col("c_name").contains("1").cast("int").as("has_one"))
    },

    // §2.8 temporal functions — month bucketing.
    "q13_date_trunc" -> { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
    },

    // §2.8 math functions on keyed rows.
    "q14_math_functions" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          floor(col("l_discount") * 100).cast("long").as("disc_pct"),
          ceil(col("l_tax") * 100).cast("long").as("tax_pct"),
          abs(col("l_quantity") - 25).as("qdist"),
          pmod(col("l_orderkey"), lit(7)).as("okmod7"))
    },

    // §2.3 multi-way join with broadcast dims (star join).
    "q15_star_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      broadcast(t.region)
        .join(broadcast(t.nation), col("r_regionkey") === col("n_regionkey"))
        .join(t.customer, col("n_nationkey") === col("c_nationkey"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
    },

    // §2.4 HAVING (post-aggregation filter).
    "q16_having" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_partkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 300)
    },

    // §2.4 count(DISTINCT).
    "q17_count_distinct" -> { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"))
    },

    // §2.3 cross join (guarded small×small).
    "q18_cross_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.region.select(col("r_name"))
        .crossJoin(t.lineitem.select(col("l_returnflag").as("rf")).distinct())
    },

    // §2.9 batch analog of a tumbling window over the events stream table.
    "q19_tumbling_window" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(
          (floor(col("ts").cast("long") / 300) * 300).cast("long").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    },

    // §2.8 IN / BETWEEN predicates + 3VL null-safe filtering.
    "q20_in_between" -> { (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(10000, 20000))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    },

    // §2.9 batch analog of SESSION windows: gap-based islands via
    // lag + running sum — the exact formulation the oracle uses, so the
    // window-function semantics themselves are differential-tested.
    "q21_session_islands" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .withColumn("brk",
          when(col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w) > 1800, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("brk")).over(wRows))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts").cast("long")).as("session_start"),
          max(col("ts").cast("long")).as("session_end"))
    },

    // Beyond-parity as-of join (SURVEY §2.3 as-of row: absent in the
    // reference): each purchase event joined to the user's most recent
    // at-or-before click via the union+keyed-window lowering — ONE
    // shuffle, no range-join explosion. Right side deduped at
    // (user, ts) keeping the max event id so ties are deterministic in
    // both engines; oracle is DuckDB's NATIVE ASOF LEFT JOIN.
    "q26_asof_join" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
      val c0 = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"),
          col("ts").as("c_ts"), col("value").as("c_value"))
      val wDed = Window.partitionBy(col("user_id"), col("c_ts"))
        .orderBy(col("c_id").desc)
      val c = c0.withColumn("__rn", row_number().over(wDed))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsOfJoin.asof(p, c, Seq("user_id"), "ts", "c_ts")
        .select(col("p_id"), col("user_id"),
          col("ts").cast("long").as("p_epoch"),
          col("c_id"),
          round(col("c_value") + lit(1e-11), 4).as("c_value"),
          (col("ts").cast("long") - col("c_ts").cast("long")).as("gap_s"))
    },

    // Beyond-parity event-funnel analysis (first-touch, strict temporal
    // order, 24 h stage window): per user, the earliest view, the
    // earliest click within a day AFTER that view, the earliest
    // purchase within a day after that click — three filter→join→min
    // chains, all map-side-combinable, no ranking windows — then the
    // stage table with conversion rates. FULLY oracled.
    "q27_funnel" -> { (s, dir) =>
      val win = 86400L
      val ev = Tables(s, dir).events.select(col("user_id"),
        col("event_type"), col("ts").cast("long").as("tsl"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tsl")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("tsl") > col("t1") && col("tsl") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("tsl")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("tsl") > col("t2") && col("tsl") <= col("t2") + win)
        .groupBy(col("user_id")).agg(min(col("tsl")).as("t3"))
      val c1 = t1.agg(count(lit(1)).as("n_users"))
      val stages = c1.select(lit(1).as("stage"), lit("view").as("step"),
          col("n_users"))
        .unionAll(t2.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("stage"), lit("click").as("step"), col("n_users")))
        .unionAll(t3.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("stage"), lit("purchase").as("step"), col("n_users")))
      stages.crossJoin(broadcast(c1.select(col("n_users").as("__n1"))))
        .select(col("stage"), col("step"), col("n_users"),
          round(col("n_users") / col("__n1") + lit(1e-11), 4).as("conv"))
    },

    // Beyond-parity cohort retention: users cohorted by first-signup
    // epoch week, retention = fraction of the cohort active (any
    // event) k weeks later — two map-side-combinable aggregates, a
    // distinct on (user, week), and one broadcast of the cohort
    // sizes. FULLY oracled.
    "q28_retention" -> { (s, dir) =>
      val wk = 604800L
      val ev = Tables(s, dir).events.select(col("user_id"),
        col("event_type"), (col("ts").cast("long") / wk).cast("long").as("w"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("w")).as("c_wk"))
      val sizes = cohort.groupBy(col("c_wk")).agg(count(lit(1)).as("cohort_n"))
      val active = ev.select(col("user_id"), col("w")).distinct()
      cohort.join(active, Seq("user_id"))
        .filter(col("w") >= col("c_wk"))
        .groupBy(col("c_wk"), (col("w") - col("c_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), Seq("c_wk"))
        .select(col("c_wk").as("cohort_week"), col("week_offset"),
          col("n_active"), col("cohort_n"),
          round(col("n_active") / col("cohort_n") + lit(1e-11), 4).as("retention"))
    },

    // Beyond-parity numeric band (range) join: customer × supplier
    // balances within ±1.0, via eps-grid bucketing with a 3-cell
    // probe (exact recall, no cross join). FULLY oracled against the
    // brute-force cross join.
    "q29_band_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.BandJoin.bandJoin(
        t.customer.select(col("c_custkey"), col("c_acctbal")), "c_acctbal",
        t.supplier.select(col("s_suppkey"), col("s_acctbal")), "s_acctbal",
        eps = 1.0)
        .select(col("c_custkey"), col("s_suppkey"),
          round(abs(col("c_acctbal") - col("s_acctbal")) + lit(1e-11), 4)
            .as("adiff"))
    },

    // Beyond-parity SCD2 history build: each customer's order-status
    // change stream collapses into validity intervals (runs of equal
    // status compress; half-open [valid_from, valid_to), open row
    // flagged current). Two windows, both partitioned by the customer
    // key — one shuffle, no global window. FULLY oracled.
    "q30_scd2" -> { (s, dir) =>
      graft.operators.Scd2.intervals(
        Tables(s, dir).orders, keyCols = Seq("o_custkey"),
        tsCol = "o_orderdate", trackedCols = Seq("o_orderstatus"),
        tieCols = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"),
          // o_orderdate ships as TIMESTAMP_NTZ, which forbids numeric
          // casts — the UTC-pinned session makes the hop lossless
          col("valid_from").cast("timestamp").cast("long").as("valid_from_s"),
          col("valid_to").cast("timestamp").cast("long").as("valid_to_s"),
          col("is_current"))
    },

    // §2.4 percentiles + stddev (exact interpolated percentile).
    "q22_percentiles" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
          round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"))
    },

    // §2.4 EXACT discrete percentile (inverse distribution) through the
    // registry's percentileDisc path — the former percentile_approx
    // compilation was exact only under the sketch's 1e6 accuracy bound;
    // this row pins the exact semantics against DuckDB quantile_disc.
    "q25_percentile_disc" -> { (s, dir) =>
      import graft.functions.FunctionRegistry
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          FunctionRegistry.aggregate("percentileDisc",
            Seq(col("l_quantity"), lit(0.5)), distinct = false).as("median_qty"),
          FunctionRegistry.aggregate("percentileDisc",
            Seq(col("l_quantity"), lit(0.9)), distinct = false).as("p90_qty"))
    },

    // §2.4 collect -> deterministic string form (array hashing differs
    // across engines; a joined sorted string is bit-stable).
    "q23_collect" -> { (s, dir) =>
      Tables(s, dir).nation
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
    },

    // §2.4 hierarchical totals via native grouping sets: ROLLUP produces
    // (flag, status), (flag), and grand-total rows in ONE pass — Catalyst
    // expands the sets map-side, so the shuffle still carries one row per
    // (group, set) with partial aggregation (no N-pass union of scans).
    "q24_rollup" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
    },

    // Data-quality constraint report (Deequ/dbt-test shape): five
    // declarative rules over orders+lineitem — null check, key
    // uniqueness, referential integrity, range, and a predicate —
    // each ONE map-side-combinable aggregate, unioned into the audit
    // table a curation pipeline gates on. The range rule is chosen to
    // FAIL (real violations counted), so the pass flag is exercised.
    "q42_quality_report" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.Quality.report(
        graft.operators.Quality.notNull(t.orders, Seq("o_custkey", "o_orderdate")),
        graft.operators.Quality.unique(t.orders, Seq("o_orderkey")),
        graft.operators.Quality.foreignKey(t.lineitem, "l_orderkey",
          t.orders, "o_orderkey"),
        graft.operators.Quality.inRange(t.orders, "o_totalprice", 1000, 450000),
        graft.operators.Quality.satisfies(t.lineitem, "disc_le_10pct",
          col("l_discount") <= 0.1))
    },

    // Externally-replayable HyperLogLog distinct count with an audited
    // error row: the sketch is md5/integer arithmetic both engines
    // compute bit-identically, so the APPROXIMATE estimate itself is
    // under the exact-match oracle (Spark's approx_count_distinct is a
    // black box no external engine can verify) — the recall-ledger
    // pattern applied to counting. One map-side-combinable register
    // aggregate; no distinct set ever shuffles.
    "q40_hll_distinct" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val est = graft.operators.Sketches.hllDistinct(
        li, Seq("l_returnflag"), "l_orderkey")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        .join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"), col("n_hll"),
          round(abs(col("n_hll") - col("n_exact")) / col("n_exact")
            + lit(1e-11), 4).as("rel_err"))
    },

    // Mergeable-sketch rollup: DAILY HLL registers of active users,
    // rolled up to WEEKLY distinct estimates by max-merging registers
    // — no rescan of raw events for the coarser grain (max is
    // associative, so the rollup is IDENTICAL to computing weekly
    // registers directly, which is exactly what the oracle does).
    // This is the pre-aggregated-cube pattern for distinct counts: at
    // 100 TB the daily register tables are m rows per day at rest,
    // and any ad-hoc date-range distinct count is one max-groupBy
    // over them. Exact weekly counts ride along as the audit column.
    "q43_hll_rollup" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("day",
          floor(col("ts").cast("long") / 86400).cast("long"))
      val daily = graft.operators.Sketches.hllRegisters(
        ev, Seq("day"), "user_id")
      val weekly = graft.operators.Sketches.hllFromRegisters(
        daily.withColumn("wk", floor(col("day") / 7).cast("long"))
          .groupBy(col("wk"), col("__b")).agg(max(col("__m")).as("__m")),
        Seq("wk"))
      ev.withColumn("wk", floor(col("day") / 7).cast("long"))
        .groupBy(col("wk"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(weekly, Seq("wk"))
        .select(col("wk"), col("n_exact"), col("n_hll"),
          round(abs(col("n_hll") - col("n_exact")) / col("n_exact")
            + lit(1e-11), 4).as("rel_err"))
    },

    // Count-min heavy hitters with the audit column inline: integer-
    // only md5 sketch arithmetic, so the APPROXIMATE estimates are
    // under the exact-match oracle; overcount = est − exact exposes
    // the CMS one-sided-error guarantee (always ≥ 0) as data.
    "q41_cms_heavy_hitters" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val est = graft.operators.Sketches.cmsEstimates(li, "l_partkey")
      li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_exact"))
        .join(est, col("l_partkey") === col("key"))
        .select(col("l_partkey"), col("est"), col("n_exact"),
          (col("est") - col("n_exact")).as("overcount"))
        .orderBy(col("est").desc, col("l_partkey"))
        .limit(20)
    },

    // §2.4 full grouping-set lattice: CUBE emits all 4 subsets in ONE
    // pass (Expand map-side, still partially aggregated before the
    // shuffle — N-pass union-of-scans is what this replaces at scale);
    // grouping_id() disambiguates aggregated-away NULLs from data NULLs.
    "q31_cube" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
          grouping_id().as("gid"))
    },

    // §2.2/§2.4 pivot with an EXPLICIT value list — the distinct-scan
    // that `pivot(col)` alone would run is elided, and the reshape
    // lowers to one hash aggregate with per-bucket conditional sums
    // (same plan shape as the oracle's FILTER aggregates; no join, no
    // second scan).
    "q32_pivot" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")))
        .withColumnRenamed("F", "f_price_c")
        .withColumnRenamed("O", "o_price_c")
    },

    // Time-series gap fill + forward fill (beyond-parity; the events
    // table is ~5% sparse at hourly grain) through TimeSeries.gapFill:
    // the calendar generates in two bounded levels in bucket-index
    // space (no row ever holds a key's whole span — the hazard the
    // naive per-key sequence() has on decade-span keys), the join is
    // on (key, bucket), and the forward fill is one window per key —
    // no global ordering anywhere.
    "q33_gapfill" -> { (s, dir) =>
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("long").as("hr_epoch"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_ff"))
      graft.operators.TimeSeries.gapFill(hourly, Seq("event_type"),
          "hr_epoch", step = 3600L, zeroFill = Seq("n"),
          forwardFill = Seq("v_ff"))
        .select(col("event_type"), col("hr_epoch"), col("n"), col("v_ff"))
    },

    // §2.3 bloom-prefiltered semi join: the fact side is filtered by a
    // codegen'd might_contain against the dimension subset's sketch
    // BEFORE the exchange, then an exact leftsemi removes the ~fpp
    // false positives — the result is bit-identical to a plain semi
    // join (the oracle IS the plain semi join) while the shuffle
    // carries ~10% of lineitem instead of all of it.
    "q34_bloom_semijoin" -> { (s, dir) =>
      val t = Tables(s, dir)
      val dim = t.orders.filter(col("o_totalprice") > 450000)
      graft.operators.BloomJoin.semiJoin(
          t.lineitem, col("l_orderkey"), dim, col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    },

    // §2.3 interval-overlap join (beyond-parity): two order-derived
    // validity windows, co-keyed on priority, paired iff they overlap
    // — lowered to a grid-cell equi-join (no nested-loop), first-
    // shared-cell dedup as a pure filter, exact overlap verified by
    // codegen. The oracle is the plain inequality join.
    "q35_interval_join" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val l = o.filter(col("o_custkey") % 97 === 0)
        .select(col("o_orderkey").as("l_id"),
          col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("timestamp").cast("long").as("ls"))
        .withColumn("le", col("ls") + (col("l_id") % 14 + 1) * 86400L)
      val r = o.filter(col("o_custkey") % 53 === 0)
        .select(col("o_orderkey").as("r_id"),
          col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("timestamp").cast("long").as("rs"))
        .withColumn("re", col("rs") + (col("r_id") % 21 + 1) * 86400L)
      graft.operators.IntervalJoin.overlapJoin(
          l, "ls", "le", r, "rs", "re", Seq("prio"), cell = 7 * 86400L)
        .select(col("prio"), col("l_id"), col("r_id"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs")))
            .as("overlap_s"))
    },

    // First-touch attribution: each purchase credits the user's FIRST
    // click in the prior 7 days (min (ts, id) struct — deterministic),
    // unattributed purchases kept by the left join. The join is
    // user-keyed with the window as a residual condition — per-user
    // work, no time-bucket explosion needed at this selectivity (the
    // interval-join lowering is the escape hatch when a key's event
    // density makes user-pairs quadratic).
    "q44_first_touch" -> { (s, dir) =>
      val e = Tables(s, dir).events
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("t"), col("event_type"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("t").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("cu"),
          col("t").as("c_ts"))
      val firsts = p.join(c, col("user_id") === col("cu") &&
          col("c_ts") >= col("p_ts") - 604800L && col("c_ts") < col("p_ts"))
        .groupBy(col("p_id"))
        .agg(min(struct(col("c_ts"), col("c_id"))).as("f"))
        .select(col("p_id").as("fp_id"), col("f.c_id").as("c_id"),
          col("f.c_ts").as("f_ts"))
      p.join(firsts, col("p_id") === col("fp_id"), "left")
        .select(col("p_id"), col("user_id"), col("c_id"),
          (col("p_ts") - col("f_ts")).as("secs_before"))
    },

    // §2.5 RANGE-framed moving aggregates: 7-day trailing sum/count
    // per event type over DAILY pre-aggregates — the window runs over
    // ~30 rows per key, not raw events (aggregate-then-window is the
    // scale order; window-then-aggregate would sort the raw table).
    // RANGE (not ROWS) so missing days weight zero, matching the
    // calendar semantics analysts expect.
    "q36_moving_window" -> { (s, dir) =>
      val daily = Tables(s, dir).events
        .groupBy(col("event_type"),
          (date_trunc("day", col("ts")).cast("long") / 86400).cast("long")
            .as("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("v_c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      daily.select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(w).as("n_7d"),
        sum(col("v_c")).over(w).as("v_c_7d"))
    },

    // CDC changelog compaction (keep-latest upsert): one row per key,
    // the newest by (ts, tiebreak) — the SCD1 sibling of q30/q38 and
    // the standard lakehouse MERGE target shape. One keyed ranking
    // window (partitioned by the key — never global).
    "q39_changelog_compact" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables(s, dir).orders
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate").cast("timestamp").cast("long").as("as_of_s"),
          col("o_orderkey").as("src_key"))
    },

    // Incremental SCD2 upsert: the dimension is built from pre-1996
    // history, then the 1996+ batch is MERGED in — closed history and
    // untouched keys pass through by anti/semi join (the O(delta)
    // warehouse shape). The oracle is the FULL-history rebuild (q30's
    // SQL), so the hash compare proves merge == rebuild on real data.
    "q38_scd2_merge" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val cutoff = lit("1996-01-01").cast("timestamp")
      val existing = graft.operators.Scd2.intervals(
        o.filter(col("o_orderdate") < cutoff), Seq("o_custkey"),
        "o_orderdate", Seq("o_orderstatus"), Seq("o_orderkey"))
      graft.operators.Scd2.merge(existing,
          o.filter(col("o_orderdate") >= cutoff), Seq("o_custkey"),
          "o_orderdate", Seq("o_orderstatus"), Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"),
          col("valid_from").cast("timestamp").cast("long").as("valid_from_s"),
          col("valid_to").cast("timestamp").cast("long").as("valid_to_s"),
          col("is_current"))
    },

    // Z-order (Morton) clustering key — the data-layout operator's
    // exact-integer core, oracle-checked bit for bit; the layout
    // effect itself (per-partition bounding boxes shrink on every
    // clustered column) is spec-asserted in OperatorsSpec.
    "q37_zorder" -> { (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderkey") % 17 === 0)
        .select(col("o_orderkey"),
          (col("o_custkey") % 4096).as("ck"),
          (col("o_orderkey") % 4096).as("ok"))
        .withColumn("z",
          graft.operators.Layout.zValue(Seq(col("ck"), col("ok")), 12))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // full replay of q30: change-flag lag window, run compression,
    // closing lead window (IS DISTINCT FROM = Spark's negated <=>)
    "q39_changelog_compact" ->
      """SELECT o_custkey, o_orderstatus,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS as_of_s,
         o_orderkey AS src_key
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1""",
    // the merge's oracle IS the full-history rebuild: hash equality
    // proves the incremental upsert reproduces the q30 build exactly
    "q38_scd2_merge" ->
      """WITH s AS (
           SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                  lag(o_orderstatus) OVER w AS prev,
                  (lag(o_orderdate) OVER w IS NULL) AS first
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)),
         op AS (SELECT * FROM s
                WHERE first OR prev IS DISTINCT FROM o_orderstatus),
         iv AS (SELECT o_custkey, o_orderstatus, o_orderdate AS vf,
                  lead(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS vt
                FROM op)
         SELECT o_custkey, o_orderstatus,
                CAST(floor(epoch(vf)) AS BIGINT) AS valid_from_s,
                CAST(floor(epoch(vt)) AS BIGINT) AS valid_to_s,
                vt IS NULL AS is_current
         FROM iv""",
    "q30_scd2" ->
      """WITH s AS (
           SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                  lag(o_orderstatus) OVER w AS prev,
                  (lag(o_orderdate) OVER w IS NULL) AS first
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)),
         op AS (SELECT * FROM s
                WHERE first OR prev IS DISTINCT FROM o_orderstatus),
         iv AS (SELECT o_custkey, o_orderstatus, o_orderdate AS vf,
                  lead(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS vt
                FROM op)
         SELECT o_custkey, o_orderstatus,
                CAST(floor(epoch(vf)) AS BIGINT) AS valid_from_s,
                CAST(floor(epoch(vt)) AS BIGINT) AS valid_to_s,
                vt IS NULL AS is_current
         FROM iv""",
    // brute-force ground truth for q29 (both engines subtract the
    // identical parquet doubles, so the <= boundary is bit-stable)
    "q29_band_join" ->
      """SELECT c_custkey, s_suppkey,
                round(abs(c_acctbal - s_acctbal) + 1e-11, 4) AS adiff
         FROM customer, supplier
         WHERE abs(c_acctbal - s_acctbal) <= 1.0""",
    // full replay of q28: signup-week cohorts, (user, week) activity
    // distinct, offset counts over broadcastable cohort sizes
    "q28_retention" ->
      """WITH e AS (SELECT user_id, event_type,
               CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 604800.0)
                 AS BIGINT) AS w
             FROM events),
         cohort AS (SELECT user_id, min(w) AS c_wk FROM e
                    WHERE event_type = 'signup' GROUP BY 1),
         sizes AS (SELECT c_wk, count(*) AS cohort_n FROM cohort GROUP BY 1),
         active AS (SELECT DISTINCT user_id, w FROM e),
         hits AS (
           SELECT c.c_wk, a.w - c.c_wk AS week_offset, count(*) AS n_active
           FROM cohort c JOIN active a USING (user_id)
           WHERE a.w >= c.c_wk GROUP BY 1, 2)
         SELECT h.c_wk AS cohort_week, h.week_offset, h.n_active, s.cohort_n,
                round(h.n_active * 1.0 / s.cohort_n + 1e-11, 4) AS retention
         FROM hits h JOIN sizes s USING (c_wk)""",
    // full replay of q27: the three first-touch stage chains and the
    // conversion table (epoch(ts) floored to match Spark's long cast)
    "q27_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS tsl FROM events),
         t1 AS (SELECT user_id, min(tsl) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(tsl) AS t2 FROM e JOIN t1 USING (user_id)
                WHERE event_type = 'click' AND tsl > t1.t1
                  AND tsl <= t1.t1 + 86400 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(tsl) AS t3 FROM e JOIN t2 USING (user_id)
                WHERE event_type = 'purchase' AND tsl > t2.t2
                  AND tsl <= t2.t2 + 86400 GROUP BY 1),
         c1 AS (SELECT count(*) AS n FROM t1),
         c2 AS (SELECT count(*) AS n FROM t2),
         c3 AS (SELECT count(*) AS n FROM t3)
         SELECT 1 AS stage, 'view' AS step, c1.n AS n_users,
                round(c1.n * 1.0 / c1.n + 1e-11, 4) AS conv FROM c1
         UNION ALL
         SELECT 2, 'click', c2.n,
                round(c2.n * 1.0 / (SELECT n FROM c1) + 1e-11, 4) FROM c2
         UNION ALL
         SELECT 3, 'purchase', c3.n,
                round(c3.n * 1.0 / (SELECT n FROM c1) + 1e-11, 4) FROM c3""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
         CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem GROUP BY 1,2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT) AS net_price_e4
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1995-09-01' AND l_quantity < 5""",
    "q03_topk_revenue" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
         CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_e4
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY 1,2
         ORDER BY revenue_e4 DESC, o_orderkey
         LIMIT 10""",
    "q04_exists_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         GROUP BY 1""",
    "q05_not_exists_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 150000)
         GROUP BY 1""",
    "q06_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q07_union" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION
         SELECT s_nationkey AS nk FROM supplier""",
    "q08_window_topn_per_group" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rn <= 3""",
    "q09_left_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers
         FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         GROUP BY 1""",
    "q10_unwind_explode" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
         GROUP BY 1""",
    "q11_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS band,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY 1""",
    "q12_string_functions" ->
      """SELECT c_custkey,
         upper(c_name) AS uname,
         lower(c_mktsegment) AS lseg,
         length(c_name) AS name_len,
         substring(c_name, 1, 8) AS name8,
         concat_ws('#', c_name, c_mktsegment) AS tagged,
         CAST(contains(c_name, '1') AS INT) AS has_one
         FROM customer WHERE c_custkey % 7 = 0""",
    "q13_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY 1""",
    "q14_math_functions" ->
      """SELECT l_orderkey, l_linenumber,
         round(sqrt(l_extendedprice),6) AS sqrt_price,
         CAST(floor(l_discount*100) AS BIGINT) AS disc_pct,
         CAST(ceil(l_tax*100) AS BIGINT) AS tax_pct,
         abs(l_quantity-25) AS qdist,
         l_orderkey % 7 AS okmod7
         FROM lineitem WHERE l_orderkey % 100 = 0""",
    "q15_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM region
         JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         GROUP BY 1,2""",
    "q16_having" ->
      """SELECT l_partkey, round(sum(l_quantity),2) AS total_qty
         FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity),2) > 300""",
    "q17_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
         FROM orders GROUP BY 1""",
    "q18_cross_join" ->
      """SELECT r_name, rf FROM region
         CROSS JOIN (SELECT DISTINCT l_returnflag AS rf FROM lineitem)""",
    "q19_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts)/300) AS BIGINT)*300 AS win_start,
         event_type, count(*) AS n, round(sum(value),2) AS total
         FROM events GROUP BY 1,2""",
    "q20_in_between" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
         FROM orders
         WHERE o_orderstatus IN ('O','F')
           AND o_totalprice BETWEEN 10000 AND 20000""",
    "q21_session_islands" ->
      """WITH d AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                       THEN 1 ELSE 0 END AS brk
           FROM events),
         sid AS (
           SELECT user_id, ts, event_id,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
           FROM d)
         SELECT user_id, sid, count(*) AS n_events,
                min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start,
                max(CAST(floor(epoch(ts)) AS BIGINT)) AS session_end
         FROM sid GROUP BY 1, 2""",
    // the engine's union+window as-of lowering vs DuckDB's NATIVE
    // ASOF LEFT JOIN — two entirely different algorithms, one result
    "q26_asof_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts
                    FROM events WHERE event_type = 'purchase'),
         c0 AS (SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
                FROM events WHERE event_type = 'click'),
         c AS (SELECT * FROM c0
               QUALIFY row_number()
                 OVER (PARTITION BY user_id, c_ts ORDER BY c_id DESC) = 1)
         SELECT p.p_id, p.user_id,
                CAST(floor(epoch(p.ts)) AS BIGINT) AS p_epoch,
                c.c_id,
                round(c.c_value + 1e-11, 4) AS c_value,
                CAST(floor(epoch(p.ts)) AS BIGINT)
                  - CAST(floor(epoch(c.c_ts)) AS BIGINT) AS gap_s
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.c_ts""",
    "q22_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(stddev_pop(l_quantity), 4) AS sdp_qty
         FROM lineitem GROUP BY 1""",
    "q25_percentile_disc" ->
      """SELECT l_returnflag,
         quantile_disc(l_quantity, 0.5) AS median_qty,
         quantile_disc(l_quantity, 0.9) AS p90_qty
         FROM lineitem GROUP BY 1""",
    "q23_collect" ->
      """SELECT n_regionkey,
         array_to_string(list_sort(list(n_name)), ',') AS nations
         FROM nation GROUP BY 1""",
    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q42_quality_report" ->
      """SELECT rule, n_violations,
                CAST(n_violations = 0 AS INTEGER) AS pass FROM (
         SELECT 'not_null:o_custkey,o_orderdate' AS rule,
                count(*) FILTER (o_custkey IS NULL OR o_orderdate IS NULL)
                  AS n_violations FROM orders
         UNION ALL
         SELECT 'unique:o_orderkey',
                CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM (
                  SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
         UNION ALL
         SELECT 'fk:l_orderkey', count(*) FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
           (SELECT o_orderkey FROM orders)
         UNION ALL
         SELECT 'range:o_totalprice',
                count(*) FILTER (o_totalprice < 1000 OR o_totalprice > 450000)
           FROM orders
         UNION ALL
         SELECT 'satisfies:disc_le_10pct',
                count(*) FILTER (NOT coalesce(l_discount <= 0.1, false))
           FROM lineitem)""",
    // full replay of q41: 4 salted md5 hash rows, exact counters,
    // integer min — no floats anywhere in the sketch
    "q41_cms_heavy_hitters" -> {
      def hx(e: String) = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr($e, $i, 1)) - 1) * " +
          s"${1L << (4 * (8 - i))}").mkString(" + ")
      val branches = (0 until 4).map { r =>
        s"""SELECT l_partkey AS key, $r AS r,
            CAST(${hx(s"md5('$r:' || CAST(l_partkey AS VARCHAR))")}
              AS BIGINT) % 512 AS c
            FROM lineitem"""
      }.mkString("\n         UNION ALL ")
      s"""WITH ex AS ($branches),
         counters AS (SELECT r, c, count(*) AS cnt FROM ex GROUP BY 1, 2),
         probes AS (SELECT DISTINCT key, r, c FROM ex),
         est AS (SELECT key, min(cnt) AS est
                 FROM probes JOIN counters USING (r, c) GROUP BY 1),
         exact AS (SELECT l_partkey, count(*) AS n_exact
                   FROM lineitem GROUP BY 1)
         SELECT l_partkey, est, n_exact, est - n_exact AS overcount
         FROM exact JOIN est ON l_partkey = key
         ORDER BY est DESC, l_partkey LIMIT 20"""
    },
    // replay of q43: max-merge associativity means the weekly rollup
    // equals computing weekly registers directly — which is what this
    // does, with the q40 register/decimal machinery on user_id
    "q43_hll_rollup" -> {
      val poly = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(h, ${2 + i}, 1)) - 1) * " +
          s"${1L << (4 * (15 - i))}").mkString(" + ")
      s"""WITH x AS (SELECT
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 7 AS wk,
             user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
         r AS (SELECT wk, user_id,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
                  strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS BIGINT) AS b,
             CAST($poly AS BIGINT) AS v
           FROM x),
         m AS (SELECT wk, b,
             max(CASE WHEN v = 0 THEN 61
                 ELSE 61 - length(bin(v)) END) AS mr
           FROM r GROUP BY 1, 2),
         s AS (SELECT wk,
             sum(CAST((CAST(1 AS BIGINT) << CAST(61 - mr AS INTEGER))
               AS DECIMAL(38,0))) AS s0,
             count(*) AS present
           FROM m GROUP BY 1),
         e0 AS (SELECT wk, 256 - present AS vz,
             0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
               2305843009213693952.0 /
               CAST(s0 + (256 - present) *
                 CAST(2305843009213693952 AS DECIMAL(38,0)) AS DOUBLE) AS raw
           FROM s),
         e AS (SELECT wk,
             round(CASE WHEN raw <= 2.5 * 256.0 AND vz > 0
               THEN 256.0 * ln(256.0 / CAST(vz AS DOUBLE))
               ELSE raw END + 1e-11, 2) AS n_hll
           FROM e0),
         ex AS (SELECT wk, count(DISTINCT user_id) AS n_exact
                FROM x GROUP BY 1)
         SELECT ex.wk, n_exact, n_hll,
                round(abs(n_hll - n_exact) / n_exact + 1e-11, 4) AS rel_err
         FROM ex JOIN e USING (wk)"""
    },
    // full replay of q40: same md5 register index / 60-bit rank value /
    // binary-string rho, the harmonic sum as EXACT scaled integers in
    // DECIMAL(38,0), and the one final double division written with
    // the identical left-associated constants
    "q40_hll_distinct" -> {
      val poly = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr(h, ${2 + i}, 1)) - 1) * " +
          s"${1L << (4 * (15 - i))}").mkString(" + ")
      s"""WITH x AS (SELECT l_returnflag,
             md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
         r AS (SELECT l_returnflag,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
                  strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS BIGINT) AS b,
             CAST($poly AS BIGINT) AS v
           FROM x),
         m AS (SELECT l_returnflag, b,
             max(CASE WHEN v = 0 THEN 61
                 ELSE 61 - length(bin(v)) END) AS mr
           FROM r GROUP BY 1, 2),
         s AS (SELECT l_returnflag,
             sum(CAST((CAST(1 AS BIGINT) << CAST(61 - mr AS INTEGER))
               AS DECIMAL(38,0))) AS s0,
             count(*) AS present
           FROM m GROUP BY 1),
         e0 AS (SELECT l_returnflag, 256 - present AS vz,
             0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
               2305843009213693952.0 /
               CAST(s0 + (256 - present) *
                 CAST(2305843009213693952 AS DECIMAL(38,0)) AS DOUBLE) AS raw
           FROM s),
         e AS (SELECT l_returnflag,
             round(CASE WHEN raw <= 2.5 * 256.0 AND vz > 0
               THEN 256.0 * ln(256.0 / CAST(vz AS DOUBLE))
               ELSE raw END + 1e-11, 2) AS n_hll
           FROM e0),
         ex AS (SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact
           FROM lineitem GROUP BY 1)
         SELECT ex.l_returnflag, n_exact, n_hll,
                round(abs(n_hll - n_exact) / n_exact + 1e-11, 4) AS rel_err
         FROM ex JOIN e USING (l_returnflag)"""
    },
    "q31_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q32_pivot" ->
      """SELECT l_returnflag,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
           FILTER (l_linestatus = 'F') AS BIGINT) AS f_price_c,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
           FILTER (l_linestatus = 'O') AS BIGINT) AS o_price_c
         FROM lineitem GROUP BY 1""",
    "q33_gapfill" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hr,
                  count(*) AS n, round(sum(value), 2) AS v
           FROM events GROUP BY 1, 2),
         cal AS (
           SELECT event_type,
                  unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
           FROM hourly GROUP BY event_type)
         SELECT c.event_type, CAST(floor(epoch(c.hr)) AS BIGINT) AS hr_epoch,
                coalesce(h.n, 0) AS n,
                last_value(h.v IGNORE NULLS) OVER (
                  PARTITION BY c.event_type ORDER BY c.hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
         FROM cal c LEFT JOIN hourly h
           ON c.event_type = h.event_type AND c.hr = h.hr""",
    "q34_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
         GROUP BY 1""",
    "q35_interval_join" ->
      """WITH l AS (SELECT o_orderkey AS l_id, o_orderpriority AS prio,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ls,
             CAST(floor(epoch(o_orderdate)) AS BIGINT)
               + (o_orderkey % 14 + 1) * 86400 AS le
           FROM orders WHERE o_custkey % 97 = 0),
         r AS (SELECT o_orderkey AS r_id, o_orderpriority AS prio,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS rs,
             CAST(floor(epoch(o_orderdate)) AS BIGINT)
               + (o_orderkey % 21 + 1) * 86400 AS re
           FROM orders WHERE o_custkey % 53 = 0)
         SELECT l.prio, l_id, r_id,
                CAST(least(le, re) - greatest(ls, rs) AS BIGINT) AS overlap_s
         FROM l JOIN r ON l.prio = r.prio AND ls <= re AND rs <= le""",
    "q44_first_touch" ->
      """WITH e AS (SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type FROM events),
         p AS (SELECT event_id AS p_id, user_id, t AS p_ts FROM e
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id, t AS c_ts FROM e
               WHERE event_type = 'click'),
         pr AS (SELECT p.p_id, c.c_id, c.c_ts FROM p JOIN c
                ON p.user_id = c.user_id
                AND c.c_ts >= p.p_ts - 604800 AND c.c_ts < p.p_ts),
         f AS (SELECT p_id, min(c_ts) AS f_ts FROM pr GROUP BY 1),
         pk AS (SELECT pr.p_id, f.f_ts, min(pr.c_id) AS c_id
                FROM pr JOIN f ON pr.p_id = f.p_id AND pr.c_ts = f.f_ts
                GROUP BY 1, 2)
         SELECT p.p_id, p.user_id, pk.c_id, p.p_ts - pk.f_ts AS secs_before
         FROM p LEFT JOIN pk ON p.p_id = pk.p_id""",
    "q36_moving_window" ->
      """WITH daily AS (
           SELECT event_type,
                  CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
                    // 86400 AS day,
                  count(*) AS n,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS v_c
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, n,
                CAST(sum(n) OVER w AS BIGINT) AS n_7d,
                CAST(sum(v_c) OVER w AS BIGINT) AS v_c_7d
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""",
    "q37_zorder" -> {
      // the same bit-interleave, generated term by term
      val terms = for {
        (c, i) <- Seq("ck", "ok").zipWithIndex
        j <- 0 until 12
      } yield s"((($c >> $j) & 1) << ${j * 2 + i})"
      s"""WITH q AS (SELECT o_orderkey,
             o_custkey % 4096 AS ck, o_orderkey % 4096 AS ok
           FROM orders WHERE o_orderkey % 17 = 0)
         SELECT o_orderkey, ck, ok,
                CAST(${terms.mkString(" | ")} AS BIGINT) AS z
         FROM q"""
    }
  )
}
