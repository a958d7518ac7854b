package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.GraphCatalog

/** CALL … YIELD procedure registry — the Spark counterpart of the
  * reference's ProcedureRegistry + built-in db.* procedures
  * (/root/reference/packages/pycypher/src/pycypher/relational_models.py:
  * 150-279; executor mutation_engine.py:1061-1143). A procedure is a
  * table-valued function over the catalog.
  */
object ProcedureRegistry {

  type Procedure = (SparkSession, GraphCatalog, Seq[Any]) => DataFrame

  private val procs = scala.collection.concurrent.TrieMap.empty[String, Procedure]

  def register(name: String, p: Procedure): Unit = procs.put(name.toLowerCase, p)

  def apply(name: String): Procedure =
    procs.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown procedure: $name"))

  private def boolArg(a: Option[Any]): Boolean = a match {
    case Some(b: java.lang.Boolean) => b.booleanValue
    case _ => false
  }

  // built-ins (reference: db.labels / db.relationshipTypes / db.propertyKeys)
  register("db.labels", (spark, cat, _) => {
    import spark.implicits._
    cat.labels.toDF("label")
  })
  register("db.relationshiptypes", (spark, cat, _) => {
    import spark.implicits._
    cat.relTypes.toDF("relationshipType")
  })
  register("db.propertykeys", (spark, cat, _) => {
    import spark.implicits._
    val keys = (cat.labels.flatMap(l => cat.entity(l).df.columns) ++
      cat.relTypes.flatMap(t => cat.relationship(t).df.columns)).distinct.sorted
    keys.toDF("propertyKey")
  })

  /** Arg-consuming built-in: `value` = 1..n inclusive. Exercises the
    * argument-evaluation path (incl. correlated args, which run once
    * per distinct tuple) the way the reference's docs demonstrate custom
    * registration (relational_models.py:167-174).
    */
  // registry introspection (Neo4j SHOW PROCEDURES / dbms.procedures):
  // lists every registered name, including later custom registrations
  register("db.procedures", (spark, _, _) => {
    import spark.implicits._
    procs.keys.toSeq.sorted.toDF("name")
  })

  // ---- graph analytics procedures (the GDS-style CALL surface over
  // graft.operators.GraphAlgos): the stored relationship table IS the
  // edge list, so analytics compose with any Cypher pipeline ----

  private def edgeArgs(cat: GraphCatalog, args: Seq[Any])
    : (DataFrame, Int, Boolean) = {
    import org.apache.spark.sql.functions.col
    val relType = args.headOption match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"graph.* procedures take (relType[, iterations[, undirected]]), got $other")
    }
    def intArg(i: Int, default: Int) = args.lift(i) match {
      case Some(n: Number) => n.intValue
      case Some(null) | None => default
      case Some(other) => other.toString.toInt
    }
    val undirected = args.lift(2) match {
      case Some(b: java.lang.Boolean) => b.booleanValue
      case _ => false
    }
    val rel = cat.relationship(relType)
    val e0 = rel.df.select(col(rel.srcCol).as("src"), col(rel.dstCol).as("dst"))
    val e = if (undirected)
      e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    else e0
    (e, intArg(1, -1), undirected)
  }

  register("graph.pagerank", (spark, cat, args) => {
    val (e, iters, _) = edgeArgs(cat, args)
    // optional 4th arg: seed node-id list → personalized PageRank
    val seeds = args.lift(3) match {
      case Some(s: Seq[_]) if s.nonEmpty =>
        Some(s.map(x => x.asInstanceOf[Number].longValue))
      case Some(l: java.util.List[_]) if !l.isEmpty =>
        Some(scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
          .map(x => x.asInstanceOf[Number].longValue))
      case _ => None
    }
    graft.operators.GraphAlgos.pageRank(e,
      iterations = if (iters > 0) iters else 5, seeds = seeds)
  })

  register("graph.labelpropagation", (spark, cat, args) => {
    val (e, iters, _) = edgeArgs(cat, args)
    graft.operators.GraphAlgos.labelPropagation(e,
      iterations = if (iters > 0) iters else 3)
  })

  // k-core: CALL graph.kCore('KNOWS', k[, undirected]) YIELD node, deg
  // — surviving nodes of the k-core with their in-core degree. The
  // arg slot order reuses edgeArgs, so slot 1 is k here (not an
  // iteration count; the peel runs to its fixpoint).
  register("graph.kcore", (spark, cat, args) => {
    val (e, k, _) = edgeArgs(cat, args)
    graft.operators.GraphAlgos.kCore(e, k = if (k > 0) k else 2)
  })

  // approximate distinct values of a node property via the replayable
  // HLL sketch: CALL db.distinctEstimate('Customer', 'c_custkey')
  //   YIELD n_hll — constant state (m registers) however large the
  // label table; the batch operators expose the register tables for
  // incremental maintenance.
  register("db.distinctestimate", (spark, cat, args) => {
    import org.apache.spark.sql.functions.lit
    (args.headOption, args.lift(1)) match {
      case (Some(label: String), Some(prop: String)) =>
        graft.operators.Sketches.hllDistinct(
          cat.entity(label).df.withColumn("__g", lit(1)), Seq("__g"), prop)
          .drop("__g")
      case other => throw new IllegalArgumentException(
        s"db.distinctEstimate takes (label, property), got $other")
    }
  })

  // per-node triangle counts + local clustering coefficient:
  // CALL graph.triangles('KNOWS'[, _, undirected])
  //   YIELD node, triangles, degree, cc
  // (the operator symmetrizes internally for directed input, since a
  // triangle census is an undirected notion)
  register("graph.triangles", (spark, cat, args) => {
    val (e, _, und) = edgeArgs(cat, args)
    val sym = if (und) e else e.unionAll(
      e.select(org.apache.spark.sql.functions.col("dst").as("src"),
        org.apache.spark.sql.functions.col("src").as("dst")))
    graft.operators.GraphAlgos.triangleStats(sym)
  })

  // shortest weighted distances from a seed list (unit weights here —
  // property-weighted edges go through the operator API):
  // CALL graph.sssp('KNOWS', [seedId, ...][, undirected])
  //   YIELD node, dist
  register("graph.sssp", (spark, cat, args) => {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val relType = args.headOption match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"graph.sssp takes (relType, [seeds...][, undirected]), got $other")
    }
    val seedIds: Seq[Long] = args.lift(1) match {
      case Some(s: Seq[_]) if s.nonEmpty =>
        s.map(x => x.asInstanceOf[Number].longValue)
      case Some(l: java.util.List[_]) if !l.isEmpty =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
          .map(x => x.asInstanceOf[Number].longValue)
      case other => throw new IllegalArgumentException(
        s"graph.sssp needs a non-empty seed id list, got $other")
    }
    val und = args.lift(2) match {
      case Some(b: java.lang.Boolean) => b.booleanValue
      case _ => false
    }
    val rel = cat.relationship(relType)
    val e0 = rel.df.select(col(rel.srcCol).as("src"), col(rel.dstCol).as("dst"))
    val e = (if (und) e0.unionAll(e0.select(col("dst").as("src"),
        col("src").as("dst"))) else e0)
      .withColumn("weight", lit(1L))
    graft.operators.GraphAlgos.sssp(e, seedIds.toDF("node"))
  })

  // harmonic closeness, two arms:
  //   CALL graph.closeness('KNOWS', [seedId, ...][, undirected])
  //     YIELD origin, n_reached, closeness        — per-seed landmark
  //     closeness (cost ∝ seeds, fine at any scale)
  //   CALL graph.closeness('KNOWS'[, undirected])
  //     YIELD node, pivots_reached, closeness_est — EVERY vertex,
  //     SIZE-ROUTED (GraphAlgos.harmonicClosenessAuto): exact
  //     all-sources when |V| <= spark.conf
  //     `graft.closeness.exact.maxVertices` (default 10000), else the
  //     Eppstein–Wang pivot estimator with `graft.closeness.pivots`
  //     (default 16) — cost ∝ pivots × graph, the 100 TB plan; raise
  //     the threshold to opt back into exact.
  register("graph.closeness", (spark, cat, args) => {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val relType = args.headOption match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"graph.closeness takes (relType[, seeds...][, undirected]), got $other")
    }
    // seeds are OPTIONAL: absent (or an empty list) = the all-vertex
    // routed arm; a bare boolean in the seeds slot is the undirected
    // flag of that arm
    val (seedIds, und): (Seq[Long], Boolean) = (args.lift(1), args.lift(2)) match {
      case (Some(s: Seq[_]), u) if s.nonEmpty =>
        (s.map(x => x.asInstanceOf[Number].longValue), boolArg(u))
      case (Some(l: java.util.List[_]), u) if !l.isEmpty =>
        (scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
          .map(x => x.asInstanceOf[Number].longValue), boolArg(u))
      case (Some(s: Seq[_]), u) if s.isEmpty => (Seq.empty, boolArg(u))
      case (Some(l: java.util.List[_]), u) if l.isEmpty => (Seq.empty, boolArg(u))
      case (Some(b: java.lang.Boolean), _) => (Seq.empty, b.booleanValue)
      case (None, _) => (Seq.empty, false)
      case other => throw new IllegalArgumentException(
        s"graph.closeness takes (relType[, seeds...][, undirected]), got $other")
    }
    val rel = cat.relationship(relType)
    val e0 = rel.df.select(col(rel.srcCol).as("src"), col(rel.dstCol).as("dst"))
    val e = if (und) e0.unionAll(e0.select(col("dst").as("src"),
      col("src").as("dst"))) else e0
    if (seedIds.nonEmpty)
      graft.operators.GraphAlgos.harmonicCloseness(e, seedIds.toDF("node"))
    else
      graft.operators.GraphAlgos.harmonicClosenessAuto(e,
        exactMaxVertices = spark.conf
          .getOption("graft.closeness.exact.maxVertices").map(_.toLong)
          .getOrElse(10000L),
        pivots = spark.conf.getOption("graft.closeness.pivots")
          .map(_.toInt).getOrElse(16))
  })

  // connected components over a relationship table (always treated as
  // undirected, as components are) → (id, comp = min reachable id)
  register("graph.components", (spark, cat, args) => {
    import org.apache.spark.sql.functions.col
    val relType = args.headOption match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(
        s"graph.components takes (relType), got $other")
    }
    val rel = cat.relationship(relType)
    graft.operators.Components.connectedComponents(
      rel.df.select(col(rel.srcCol), col(rel.dstCol)), rel.srcCol, rel.dstCol)
  })

  // entity-resolution on the Cypher surface: every pair of label
  // `args(0)` whose string property `args(1)` is within edit distance
  // `args(2)` (default 1) — symmetric-delete blocked, exact recall
  register("graph.fuzzymatch", (spark, cat, args) => {
    import org.apache.spark.sql.functions.col
    (args.headOption, args.lift(1)) match {
      case (Some(label: String), Some(prop: String)) =>
        val d = args.lift(2) match {
          case Some(n: Number) => n.intValue
          case _ => 1
        }
        val e = cat.entity(label)
        graft.operators.Dedup.editDistancePairs(
          e.df.select(col(e.idCol), col(prop)), e.idCol, prop, d)
      case other => throw new IllegalArgumentException(
        s"graph.fuzzyMatch takes (label, property[, maxDist]), got $other")
    }
  })

  // query-performance analytics over an at-rest audit parquet sink
  // (the one PipelineRunner writes for project.audit_uri, or any
  // QueryAudit.flushTo path) — the reference's AnalyticsEngine /
  // RegressionDetector surface reachable from plain Cypher:
  //   CALL analytics.summary('path'[, slowMs]) YIELD total_queries, …
  //   CALL analytics.regressions('path'[, baseline, recent]) YIELD …
  //   CALL analytics.baselines('path') YIELD fingerprint, median_ms, …
  //   CALL analytics.trends('path'[, bucketSec]) YIELD bucket_start_ms, …
  private def auditFrame(spark: SparkSession, args: Seq[Any]): DataFrame =
    args.headOption match {
      case Some(path: String) => spark.read.parquet(path)
      case other => throw new IllegalArgumentException(
        s"analytics.* procedures take (auditPath, ...), got $other")
    }
  private def numArg(args: Seq[Any], i: Int, default: Double): Double =
    args.lift(i) match {
      case Some(n: Number) => n.doubleValue
      case _ => default
    }
  register("analytics.summary", (spark, _, args) =>
    graft.ops.QueryAnalytics.summary(auditFrame(spark, args),
      slowThresholdMs = numArg(args, 1, 1000.0)))
  register("analytics.regressions", (spark, _, args) =>
    graft.ops.QueryAnalytics.regressions(auditFrame(spark, args),
      baselineWindow = numArg(args, 1, 20).toInt,
      recentWindow = numArg(args, 2, 5).toInt))
  register("analytics.baselines", (spark, _, args) =>
    graft.ops.QueryAnalytics.baselines(auditFrame(spark, args)))
  register("analytics.trends", (spark, _, args) =>
    graft.ops.QueryAnalytics.trends(auditFrame(spark, args),
      bucketSeconds = numArg(args, 1, 60).toLong))
  register("analytics.slowest", (spark, _, args) =>
    graft.ops.QueryAnalytics.slowest(auditFrame(spark, args),
      n = numArg(args, 1, 10).toInt))

  // ---- durable catalog snapshots on the CALL surface
  // (graft.model.CatalogStore — previously REPL-only via `.catalog`):
  //   CALL catalog.save('dir')        YIELD version, dir
  //   CALL catalog.versions('dir')    YIELD version, current
  //   CALL catalog.prune('dir')       YIELD version   (the ones dropped)
  // so YAML pipelines and LSP clients can snapshot/inspect without
  // the REPL. `save` snapshots the catalog the query RUNS AGAINST.
  private def dirArg(args: Seq[Any], proc: String): String =
    args.headOption match {
      case Some(d: String) if d.nonEmpty => d
      case other => throw new IllegalArgumentException(
        s"$proc takes (snapshotDir), got $other")
    }
  register("catalog.save", (spark, cat, args) => {
    import spark.implicits._
    val dir = dirArg(args, "catalog.save")
    val v = graft.model.CatalogStore.save(spark, cat, dir)
    Seq((v, dir)).toDF("version", "dir")
  })
  register("catalog.versions", (spark, _, args) => {
    import spark.implicits._
    val dir = dirArg(args, "catalog.versions")
    val cur = graft.model.CatalogStore.current(spark, dir)
    graft.model.CatalogStore.versions(spark, dir)
      .map(v => (v, cur.contains(v)))
      .toDF("version", "current")
  })
  // optional args: retainLast (keep the k newest finished versions,
  // default 1) and force (override read leases / collect dir-less
  // claims — the administrative big hammer; see CatalogStore.prune)
  register("catalog.prune", (spark, _, args) => {
    import spark.implicits._
    val dir = dirArg(args, "catalog.prune")
    val retainLast = numArg(args, 1, 1L).toInt
    val force = args.lift(2).exists {
      case b: java.lang.Boolean => b.booleanValue
      case s: String            => s.equalsIgnoreCase("true")
      case _                    => false
    }
    val before = graft.model.CatalogStore.versions(spark, dir)
    graft.model.CatalogStore.prune(spark, dir, retainLast, force)
    val after = graft.model.CatalogStore.versions(spark, dir).toSet
    before.filterNot(after).toDF("version")
  })

  // ---- streaming-index / curated-output maintenance
  // (graft.operators.BatchCompaction — run while the owning stream is
  // STOPPED, on batches whose checkpoint commits are durable):
  //   CALL curation.compact('outDir', upToBatch)      YIELD dir, files_before, files_after
  //   CALL curation.compactIndex('indexDir', upToBatch) YIELD component, files_before, files_after
  register("curation.compact", (spark, _, args) => {
    val dir = dirArg(args, "curation.compact")
    graft.operators.BatchCompaction.compactOutput(spark, dir,
      upTo = numArg(args, 1, -1).toLong,
      targetFiles = numArg(args, 2, 1).toInt)
  })
  register("curation.compactIndex", (spark, _, args) => {
    val dir = dirArg(args, "curation.compactIndex")
    graft.operators.BatchCompaction.compactIndex(spark, dir,
      upTo = numArg(args, 1, -1).toLong,
      targetFiles = numArg(args, 2, 1).toInt)
  })

  // ---- streaming vector-index drift watchdog + offline refit
  // (graft.operators.Similarity — the frozen-centroid trade's
  // maintenance pair):
  //   CALL similarity.indexDrift('dir'[, thresholdRatio]) YIELD batch, n_vecs, mean_dist, baseline_dist, drift_ratio, alert
  //   CALL similarity.refitIndex('dir')                    YIELD dir, n_vecs  (run with the stream STOPPED)
  register("similarity.indexDrift", (spark, _, args) => {
    val dir = dirArg(args, "similarity.indexDrift")
    graft.operators.Similarity.streamIndexDrift(spark, dir,
      thresholdRatio = numArg(args, 1, 4.0))
  })
  register("similarity.refitIndex", (spark, _, args) => {
    import spark.implicits._
    val dir = dirArg(args, "similarity.refitIndex")
    graft.operators.Similarity.refitStreamIndex(spark, dir)
    val n = spark.read.parquet(s"$dir/vecs").count()
    Seq((dir, n)).toDF("dir", "n_vecs")
  })

  register("graft.series", (spark, _, args) => {
    val n = args.headOption match {
      case Some(l: java.lang.Long)    => l.longValue
      case Some(i: java.lang.Integer) => i.longValue
      case Some(null) | None          => 0L
      case Some(other)                => other.toString.toDouble.toLong
    }
    spark.range(1, n + 1).toDF("value")
  })
}
