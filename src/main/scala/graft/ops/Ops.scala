package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.parser.CypherAst._

/** Operational layer (SURVEY §3.1 gate / §4.1 custom rows): result
  * cache, complexity scoring, query timeout, and query explanation —
  * the pieces of the reference's Star lifecycle that Catalyst does NOT
  * subsume.
  */

final class QueryTimeoutException(msg: String) extends RuntimeException(msg)

/** Wall-clock query timeout — the Spark-native form of the reference's
  * TimeoutHandler (star.py:625-690). The guarded action runs in a
  * dedicated job group; on expiry the WHOLE group is cancelled, which
  * aborts every running stage of the query cluster-wide (a thread
  * interrupt alone would leave executor tasks running). Timeouts apply
  * to ACTIONS (collect/count/write) — a lazy DataFrame costs nothing
  * until acted on.
  */
object QueryGuard {
  def withTimeout[T](spark: org.apache.spark.sql.SparkSession,
                     timeoutSeconds: Double)(body: => T): T = {
    val sc = spark.sparkContext
    val group = s"graft-timeout-${java.util.UUID.randomUUID()}"
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor()
    val fut = exec.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        sc.setJobGroup(group, "graft guarded query", interruptOnCancel = true)
        try body finally sc.clearJobGroup()
      }
    })
    try fut.get((timeoutSeconds * 1000).toLong,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        sc.cancelJobGroup(group)
        fut.cancel(true)
        throw new QueryTimeoutException(
          f"query exceeded ${timeoutSeconds}%.1f s and was cancelled")
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    } finally exec.shutdown()
  }
}

/** LRU+TTL result cache keyed by (query, params), invalidated wholesale
  * on mutation (the reference's epoch bump, result_cache.py +
  * relational_models.py:320-323). Cached plans are `persist()`ed so a
  * hit skips recomputation, not just recompilation.
  */
final class ResultCache(maxEntries: Int = 128, ttlMillis: Long = 10 * 60 * 1000,
                        clock: () => Long = System.currentTimeMillis) {
  private case class Entry(df: DataFrame, at: Long)
  private val entries = new ConcurrentHashMap[(String, Map[String, Any]), Entry]()

  /** rand()/randomUUID()/now-dependent queries are uncacheable
    * (star.py:715-751 skip list).
    */
  def cacheable(cypher: String): Boolean = {
    val l = cypher.toLowerCase
    !Seq("rand(", "randomuuid(", "timestamp(", "now(").exists(l.contains)
  }

  def get(cypher: String, params: Map[String, Any]): Option[DataFrame] = {
    val e = entries.get((cypher, params))
    if (e == null) None
    else if (clock() - e.at > ttlMillis) { entries.remove((cypher, params)); None }
    else Some(e.df)
  }

  def put(cypher: String, params: Map[String, Any], df: DataFrame): DataFrame = {
    if (!cacheable(cypher)) return df
    if (entries.size >= maxEntries) {
      // evict oldest
      val it = entries.entrySet().iterator()
      var oldest: (String, Map[String, Any]) = null
      var oldestAt = Long.MaxValue
      while (it.hasNext) {
        val kv = it.next()
        if (kv.getValue.at < oldestAt) { oldestAt = kv.getValue.at; oldest = kv.getKey }
      }
      if (oldest != null) Option(entries.remove(oldest)).foreach(_.df.unpersist())
    }
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    entries.put((cypher, params), Entry(cached, clock()))
    cached
  }

  def invalidateAll(): Unit = {
    entries.values().forEach(e => e.df.unpersist())
    entries.clear()
  }

  def size: Int = entries.size
}

/** Static complexity scoring with reject/warn thresholds — the
  * reference's query_complexity.py re-expressed over our AST. The score
  * weighs the constructs that multiply work: pattern hops, var-length
  * spans, cross-product patterns, EXISTS subqueries, UNION arms.
  */
object QueryComplexity {

  final case class Report(score: Int, reasons: Seq[String])

  def score(q: Query): Report = {
    var total = 0
    val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
    def add(n: Int, why: String): Unit = { total += n; reasons += s"+$n $why" }
    if (q.statements.size > 1) add(2 * (q.statements.size - 1), "union arms")
    q.statements.foreach(_.clauses.foreach {
      case m: Match =>
        m.paths.foreach { p =>
          add(1, "pattern")
          add(p.hops.size, "hops")
          p.hops.foreach { case (rel, _) =>
            rel.varLength.foreach { case (lo, hi) =>
              add(2 * hi.getOrElse(20).max(lo), "var-length span")
            }
          }
        }
        if (m.paths.size > 1) add(m.paths.size, "multi-path join")
        m.where.foreach(w => add(countExists(w) * 3, "exists subqueries"))
      case _: Unwind => add(1, "unwind")
      case w: With   => if (w.projection.items.exists(i => containsAggLite(i.expr)))
        add(1, "aggregation")
      case _ => ()
    })
    Report(total, reasons.toSeq)
  }

  private def countExists(e: Expr): Int = e match {
    case _: ExistsPattern  => 1
    case BinOp(_, l, r)    => countExists(l) + countExists(r)
    case UnaryOp(_, x)     => countExists(x)
    case _                 => 0
  }

  private def containsAggLite(e: Expr): Boolean = e match {
    case CountStar => true
    case FnCall(n, args, _) =>
      graft.functions.FunctionRegistry.isAggregate(n) || args.exists(containsAggLite)
    case BinOp(_, l, r) => containsAggLite(l) || containsAggLite(r)
    case _ => false
  }

  final class ComplexityException(msg: String) extends RuntimeException(msg)

  /** Gate with reject/warn thresholds (config.py:216-246 analog). */
  def gate(q: Query, rejectAbove: Int, warnAbove: Int): Report = {
    val r = score(q)
    if (r.score > rejectAbove)
      throw new ComplexityException(
        s"query complexity ${r.score} exceeds limit $rejectAbove: ${r.reasons.mkString(", ")}")
    if (r.score > warnAbove)
      System.err.println(s"[graft] complexity warning: ${r.score} (${r.reasons.mkString(", ")})")
    r
  }
}

/** Persistent query audit — the Spark-native analog of the reference's
  * per-query audit log + metrics recording in the Star lifecycle
  * (/root/reference/packages/pycypher/src/pycypher/star.py:833-896 and
  * shared/metrics.py). A `QueryExecutionListener` observes every ACTION
  * (collect/count/save) on the session and records wall time, rows out,
  * total shuffle bytes written, and a canonical plan hash — queryable
  * as a DataFrame (`toDF`) or appended to a parquet sink. Listener
  * callbacks run off the action's critical path (Spark invokes them
  * asynchronously on its listener bus), so auditing costs the query
  * nothing; the buffer is ring-bounded so an unattended long-lived
  * session cannot leak.
  */
final class QueryAudit(spark: org.apache.spark.sql.SparkSession,
                       capacity: Int = 10000)
  extends org.apache.spark.sql.util.QueryExecutionListener {

  import org.apache.spark.sql.execution.QueryExecution
  import QueryAudit.AuditRecord

  private val buf = new java.util.ArrayDeque[AuditRecord]()

  private def record(r: AuditRecord): Unit = buf.synchronized {
    if (buf.size >= capacity) buf.removeFirst()
    buf.addLast(r)
  }

  /** Stable digest of the canonicalized physical plan — two runs of the
    * same logical query share a hash even though expression ids differ.
    */
  private def planHash(qe: QueryExecution): String = {
    val canon = qe.executedPlan.canonicalized.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def metricSum(qe: QueryExecution, name: String): Long = {
    var total = 0L
    qe.executedPlan.foreach { node =>
      node.metrics.get(name).foreach(m => total += m.value)
    }
    total
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    record(AuditRecord(System.currentTimeMillis(), QueryAudit.labelOf(qe),
      funcName, durationNs / 1e6,
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
      metricSum(qe, "shuffleBytesWritten"), planHash(qe), "success", ""))

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    record(AuditRecord(System.currentTimeMillis(), QueryAudit.labelOf(qe),
      funcName, -1.0, -1L, metricSum(qe, "shuffleBytesWritten"), planHash(qe),
      "failure", String.valueOf(exception.getMessage).take(500)))

  def attach(): this.type = { spark.listenerManager.register(this); this }
  def detach(): Unit = spark.listenerManager.unregister(this)

  /** Caller-authored audit row — for lifecycle events the listener
    * cannot correlate (a sink write executes a NEW command
    * QueryExecution, so identity-keyed labels can't reach it; the
    * pipeline runner instead times the write on the caller thread and
    * records it under the pipeline query id).
    */
  def record(label: String, action: String, durationMs: Double,
             rowsOut: Long = -1L, status: String = "success",
             error: String = ""): Unit =
    record(AuditRecord(System.currentTimeMillis(), label, action, durationMs,
      rowsOut, -1L, "", status, error))

  def records: Seq[AuditRecord] = buf.synchronized {
    scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq
  }

  /** The audit as a queryable DataFrame. */
  def toDF: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    records.toDF()
  }

  /** Append the current buffer to a parquet audit sink and clear it.
    * `partitionByDay` lays the sink out day-partitioned on an
    * `audit_date` column derived from `tsMillis` — the shape a
    * LONG-LIVED service should use, so retention-bounded analytics
    * ([[QueryAnalytics.regressions]]' `sinceMillis`) prune whole
    * partitions instead of scanning years of history. Keep the flag
    * consistent per sink path (mixed layouts make the partition
    * column sometimes-absent).
    */
  def flushTo(path: String, partitionByDay: Boolean = false): Unit = {
    val snapshot = buf.synchronized {
      val s = records; buf.clear(); s
    }
    if (snapshot.nonEmpty) {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, timestamp_millis, to_date}
      val df = snapshot.toDF()
      if (partitionByDay)
        df.withColumn("audit_date", to_date(timestamp_millis(col("tsMillis"))))
          .write.mode("append").partitionBy("audit_date").parquet(path)
      else df.write.mode("append").parquet(path)
    }
  }
}

final class RateLimitExceededException(msg: String) extends RuntimeException(msg)

/** Token-bucket rate limiter gating query admission — the Spark-native
  * form of the reference's `rate_limiter.py`, wired into the query
  * lifecycle the way `star.py:650-653` gates `Star.run`. Refill is
  * continuous (permits accrue fractionally with elapsed time) up to
  * `burst`; acquisition is O(1) under one lock, so the gate costs
  * nothing next to plan compilation. Over-rate callers are REJECTED,
  * not queued — on a shared cluster a queue just moves the overload
  * into driver memory; the caller owns the retry policy.
  */
final class RateLimiter(permitsPerSecond: Double, burst: Int,
                        clock: () => Long = System.nanoTime) {
  require(permitsPerSecond > 0 && burst >= 1, "need positive rate and burst >= 1")
  private var tokens: Double = burst.toDouble
  private var last: Long = clock()
  private val rejectedCount = new java.util.concurrent.atomic.AtomicLong()

  def tryAcquire(): Boolean = {
    val ok = synchronized {
      val now = clock()
      tokens = math.min(burst.toDouble,
        tokens + (now - last) / 1e9 * permitsPerSecond)
      last = now
      if (tokens >= 1.0) { tokens -= 1.0; true } else false
    }
    if (!ok) rejectedCount.incrementAndGet()
    ok
  }

  def acquireOrThrow(): Unit =
    if (!tryAcquire())
      throw new RateLimitExceededException(
        f"query rate limit exceeded ($permitsPerSecond%.1f/s, burst $burst)")

  def rejected: Long = rejectedCount.get()
}

/** Engine liveness counters — started/completed/failed/in-flight plus
  * rate-limit rejections, scraped by [[HealthServer]].
  */
final class EngineMetrics {
  import java.util.concurrent.atomic.AtomicLong
  val started = new AtomicLong()
  val completed = new AtomicLong()
  val failed = new AtomicLong()
  def inFlight: Long = math.max(0L, started.get() - completed.get() - failed.get())
  def snapshot(rateLimiter: Option[RateLimiter]): Map[String, Long] = Map(
    "queries_started" -> started.get(),
    "queries_completed" -> completed.get(),
    "queries_failed" -> failed.get(),
    "queries_in_flight" -> inFlight,
    "rate_limited_rejections" -> rateLimiter.map(_.rejected).getOrElse(0L))
}

/** Minimal liveness/metrics endpoint over the JDK's built-in HTTP
  * server — the reference's `health_server.py:1-18` counterpart.
  * `GET /healthz` answers `ok` while the JVM is live; `GET /metrics`
  * emits the engine counters in the text exposition format every
  * scraper parses (`name value` lines). Bound to loopback; port 0
  * picks an ephemeral port (read it back from `port`).
  */
final class HealthServer(metrics: () => Map[String, Long], port: Int = 0) {
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                      body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/healthz", ex => respond(ex, 200, "ok\n"))
  server.createContext("/metrics", ex => respond(ex, 200,
    metrics().toSeq.sortBy(_._1)
      .map { case (k, v) => s"graft_$k $v" }.mkString("", "\n", "\n")))
  server.setExecutor(null) // serve on the dispatch thread; scrapes are tiny
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object QueryAudit {
  final case class AuditRecord(tsMillis: Long, label: String, action: String,
                               durationMs: Double, rowsOut: Long,
                               shuffleBytesWritten: Long, planHash: String,
                               status: String, error: String)

  /** Labels keyed by QueryExecution IDENTITY, captured when a frame is
    * created on the caller's thread (listener callbacks arrive on the
    * async bus thread, where a thread-local would be empty). Weak keys:
    * a label lives exactly as long as its frame.
    */
  private val labels = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.execution.QueryExecution, String]())

  /** Attach an audit label to a frame (CypherEngine.query does this
    * automatically with the Cypher text). Applies to direct actions on
    * this frame (collect/show/write — anything executing its plan).
    */
  def label(df: org.apache.spark.sql.DataFrame, name: String)
  : org.apache.spark.sql.DataFrame = {
    labels.put(df.queryExecution, name)
    df
  }

  private[ops] def labelOf(qe: org.apache.spark.sql.execution.QueryExecution): String =
    Option(labels.get(qe)).getOrElse("")
}
