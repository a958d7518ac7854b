package graft.etl

import org.apache.spark.sql.types._

/** Source-schema evolution tracking: drift detection, compatibility
  * grading, and a versioned lineage of each source's schema history.
  *
  * Spark-first counterpart of the reference's schema-evolution subsystem
  * (/root/reference/packages/fastopendata/src/fastopendata/
  * schema_evolution/__init__.py:1-14 — drift detection, compatibility
  * checking, migration planning, lineage). Where the reference
  * hand-rolls schema dataclasses and JSON codecs, this leans on
  * `StructType`'s lossless json round-trip for storage and on
  * Catalyst's own `Cast.canUpCast` as the compatibility authority —
  * the verdict matches what the engine itself will do when it reads
  * the drifted source.
  *
  * Storage is a directory of versioned snapshots
  * `<dir>/<sourceId>/v<N>.json` — control-plane metadata (bytes per
  * source), deliberately driver-side; the 100 TB data plane is never
  * touched. The version chain IS the lineage record. Snapshots go
  * through Hadoop `FileSystem`, so `dir` can live wherever the
  * pipeline's working directory does (HDFS/S3/local), not only on the
  * driver's local disk.
  */
object SchemaEvolution {

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(p: org.apache.hadoop.fs.Path) = p.getFileSystem(hadoopConf)

  /** One column-level change between two schema versions.
    * kind: added | removed | retyped | nullability.
    * compatibility: compatible | widening | breaking.
    */
  final case class ColumnDrift(column: String, kind: String,
                               before: Option[String], after: Option[String],
                               compatibility: String)

  /** Drift of a source vs its latest stored snapshot. `baselineVersion`
    * is 0 when no snapshot exists yet (verdict "baseline").
    * verdict: baseline | unchanged | compatible | breaking.
    */
  final case class DriftReport(sourceId: String, baselineVersion: Int,
                               drifts: Seq[ColumnDrift], verdict: String) {
    def breaking: Seq[ColumnDrift] = drifts.filter(_.compatibility == "breaking")
  }

  private def sourceDir(dir: String, id: String) =
    new org.apache.hadoop.fs.Path(dir, id)

  private def versions(dir: String, id: String): Seq[Int] = {
    val d = sourceDir(dir, id)
    val fs = fsFor(d)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }.sorted
  }

  /** Record `schema` as the next snapshot version for `sourceId`;
    * returns the new version number.
    */
  def snapshot(dir: String, sourceId: String, schema: StructType): Int = {
    val next = versions(dir, sourceId).lastOption.getOrElse(0) + 1
    val d = sourceDir(dir, sourceId)
    val fs = fsFor(d)
    fs.mkdirs(d)
    val out = fs.create(new org.apache.hadoop.fs.Path(d, s"v$next.json"), false)
    try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** The latest stored snapshot, if any. */
  def latest(dir: String, sourceId: String): Option[(Int, StructType)] =
    versions(dir, sourceId).lastOption.map { v =>
      val p = new org.apache.hadoop.fs.Path(sourceDir(dir, sourceId), s"v$v.json")
      val in = fsFor(p).open(p)
      val json =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      (v, DataType.fromJson(json).asInstanceOf[StructType])
    }

  /** Column-level diff `prev` → `cur`. Removed columns break readers;
    * added columns are compatible (append-side only); retypes grade by
    * `Cast.canUpCast` — the exact rule Spark applies on read/store
    * assignment, so "widening" here means the engine will read old data
    * under the new type losslessly; nullable→required tightening is
    * breaking (old rows may hold nulls), required→nullable widens.
    */
  def diff(prev: StructType, cur: StructType): Seq[ColumnDrift] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val p = prev.fields.map(f => f.name -> f).toMap
    val c = cur.fields.map(f => f.name -> f).toMap
    val removed = prev.fields.filterNot(f => c.contains(f.name)).map(f =>
      ColumnDrift(f.name, "removed", Some(f.dataType.simpleString), None, "breaking"))
    val added = cur.fields.filterNot(f => p.contains(f.name)).map(f =>
      ColumnDrift(f.name, "added", None, Some(f.dataType.simpleString), "compatible"))
    val common = prev.fields.filter(f => c.contains(f.name))
    val retyped = common.filter(pf => c(pf.name).dataType != pf.dataType).map { pf =>
      val cf = c(pf.name)
      ColumnDrift(pf.name, "retyped",
        Some(pf.dataType.simpleString), Some(cf.dataType.simpleString),
        if (Cast.canUpCast(pf.dataType, cf.dataType)) "widening" else "breaking")
    }
    val nullab = common.filter(pf => c(pf.name).dataType == pf.dataType &&
      c(pf.name).nullable != pf.nullable).map { pf =>
      val cf = c(pf.name)
      ColumnDrift(pf.name, "nullability",
        Some(if (pf.nullable) "nullable" else "required"),
        Some(if (cf.nullable) "nullable" else "required"),
        if (cf.nullable) "widening" else "breaking")
    }
    (removed ++ retyped ++ nullab ++ added).sortBy(d => (d.column, d.kind))
  }

  /** Compare a source's current schema against its latest snapshot. */
  def check(dir: String, sourceId: String, current: StructType): DriftReport =
    latest(dir, sourceId) match {
      case None => DriftReport(sourceId, 0, Seq.empty, "baseline")
      case Some((v, prev)) =>
        val ds = diff(prev, current)
        val verdict =
          if (ds.isEmpty) "unchanged"
          else if (ds.exists(_.compatibility == "breaking")) "breaking"
          else "compatible"
        DriftReport(sourceId, v, ds, verdict)
    }
}
