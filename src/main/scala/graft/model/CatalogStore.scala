package graft.model

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Durable catalog snapshots: save/load a [[GraphCatalog]] to a
  * versioned parquet directory with an atomic `_current` pointer —
  * the durable arm of the mutation story (SURVEY §1.3). In-memory
  * commits stay what they are (immutable-DataFrame reference swaps,
  * the reference's shadow-write transaction shape,
  * relational_models.py:589-708); `save` is the explicit durability
  * point, the public-parts equivalent of a table-format commit
  * (Delta/Iceberg are out of reach offline — a versioned-directory
  * swap gives the same crash story for a catalog-sized graph).
  *
  * Layout under `dir`:
  * {{{
  *   v00001/entity_<label>/...parquet
  *   v00001/rel_<type>/...parquet
  *   v00001/_manifest/...parquet      (registration metadata)
  *   _current                         (one line: the live version)
  * }}}
  *
  * Crash safety: a new version is fully written BEFORE the pointer
  * moves, and the pointer move is a FileContext rename with OVERWRITE
  * (atomic on HDFS and local filesystems) — a reader never observes a
  * half-written version, and a crash mid-save leaves the previous
  * `_current` intact (the orphaned version directory is garbage, not
  * corruption). Old versions are retained for time-travel/debugging;
  * `prune` drops all but the live one.
  *
  * Scale: each table is one distributed parquet write — the snapshot
  * never collects data to the driver; only the manifest (a few rows of
  * metadata) is small by construction.
  */
object CatalogStore {

  private val VersionRe = "^v(\\d{5,})$".r

  /** Path-safe encoding for labels/types (they may carry characters
    * meaningful to filesystems or URIs).
    */
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def fc(spark: SparkSession, dir: String): FileContext =
    FileContext.getFileContext(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)

  private def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionRe(n) => Some(n.toLong)
          case _            => None
        }
    }.flatten
  }

  private def readPointer(spark: SparkSession, dir: String): Option[String] = {
    val p = new Path(s"$dir/_current")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        Option.when(s.nonEmpty)(s)
      } finally in.close()
    }
  }

  /** Write every registered table plus the registration manifest under
    * a fresh version directory, then atomically move the `_current`
    * pointer to it. Returns the version name (e.g. "v00002").
    */
  def save(spark: SparkSession, catalog: GraphCatalog, dir: String): String = {
    import spark.implicits._
    val next = (listVersions(spark, dir) :+ 0L).max + 1
    val version = f"v$next%05d"
    val vdir = s"$dir/$version"
    val entityRows = catalog.entityDefs.map { e =>
      val path = s"$vdir/entity_${enc(e.label)}"
      e.df.write.mode("overwrite").parquet(path)
      ("entity", e.label, e.idCol, null: String, null: String,
        null: String, null: String, s"entity_${enc(e.label)}")
    }
    val relRows = catalog.relationshipDefs.map { r =>
      val path = s"$vdir/rel_${enc(r.relType)}"
      r.df.write.mode("overwrite").parquet(path)
      ("relationship", r.relType, r.idCol.orNull, r.srcCol, r.dstCol,
        r.srcLabel.orNull, r.dstLabel.orNull, s"rel_${enc(r.relType)}")
    }
    (entityRows ++ relRows)
      .toDF("kind", "name", "id_col", "src_col", "dst_col",
        "src_label", "dst_label", "rel_path")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/_manifest")
    // pointer move LAST, and atomically: tmp write + OVERWRITE rename
    val ctx = fc(spark, dir)
    val tmp = new Path(s"$dir/_current.tmp")
    val cur = new Path(s"$dir/_current")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(version.getBytes("UTF-8")) finally out.close()
    ctx.rename(tmp, cur, Options.Rename.OVERWRITE)
    version
  }

  /** Load the catalog a snapshot directory points at (`version` to
    * time-travel to a specific retained snapshot). Tables come back as
    * lazy parquet reads — nothing is scanned until a query runs.
    */
  def load(spark: SparkSession, dir: String,
           version: Option[String] = None): GraphCatalog = {
    val v = version.orElse(readPointer(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"no catalog snapshot at $dir (missing _current pointer)"))
    val vdir = s"$dir/$v"
    val manifest = spark.read.parquet(s"$vdir/_manifest").collect()
    val cat = new GraphCatalog
    manifest.foreach { m =>
      val kind = m.getAs[String]("kind")
      val name = m.getAs[String]("name")
      val df = spark.read.parquet(s"$vdir/${m.getAs[String]("rel_path")}")
      kind match {
        case "entity" =>
          cat.addEntity(name, df, m.getAs[String]("id_col"))
        case "relationship" =>
          cat.addRelationship(name, df,
            srcCol = m.getAs[String]("src_col"),
            dstCol = m.getAs[String]("dst_col"),
            idCol = Option(m.getAs[String]("id_col")),
            srcLabel = Option(m.getAs[String]("src_label")),
            dstLabel = Option(m.getAs[String]("dst_label")))
        case other =>
          throw new IllegalStateException(s"bad manifest kind: $other")
      }
    }
    cat
  }

  /** List retained snapshot versions, oldest first. */
  def versions(spark: SparkSession, dir: String): Seq[String] =
    listVersions(spark, dir).sorted.map(n => f"v$n%05d")

  /** Drop every retained version except the one `_current` points at. */
  def prune(spark: SparkSession, dir: String): Unit = {
    val keep = readPointer(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(spark, dir).filterNot(keep.contains).foreach { v =>
      fs.delete(new Path(s"$dir/$v"), true)
    }
  }
}
