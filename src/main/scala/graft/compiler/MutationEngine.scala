package graft.compiler

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EntityDef, GraphCatalog, RelationshipDef}
import graft.parser.CypherAst._

/** Write-path executor — the Spark counterpart of the reference's
  * MutationEngine + shadow-write transaction (/root/reference/packages/
  * pycypher/src/pycypher/mutation_engine.py:53-1143,
  * relational_models.py:589-708). Where the reference stages shadow
  * copies and promotes them on commit, here every mutation derives a
  * NEW immutable DataFrame (append = unionByName, delete = anti-join,
  * set = left-join + coalesce) registered into a snapshot catalog; the
  * engine swaps the snapshot in atomically after the whole query
  * succeeds. `localCheckpoint` pins each mutated table so later reads
  * in the same query see the writes without unbounded lineage growth.
  */
/** Dense sequential id assignment WITHOUT a global window.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels every
  * row through ONE task (Spark warns "No Partition Defined for Window
  * operation") — the write path's single-partition bottleneck: CREATE
  * from a 100M-row binding frame serializes. This is the zipWithIndex
  * shape instead: a distributed range-partitioned sort on the order
  * key, then one lightweight count job over partition sizes and a
  * per-partition map adding `base + partitionOffset + localIndex`.
  * Same dense deterministic ids (identical to the window's output
  * whenever the order key is a total order), no single-task stage.
  */
private[graft] object DenseId {
  def assign(df: DataFrame, orderCols: Seq[String],
             idName: String, base: Long): DataFrame = {
    val spark = df.sparkSession
    // a property column sharing the id name would silently duplicate
    // under schema.add (the replaced row_number path overwrote it) —
    // drop it so the assigned id stays the single unambiguous column
    val clean = if (df.columns.contains(idName)) df.drop(idName) else df
    // localCheckpoint pins the sorted layout so zipWithIndex's count
    // job and the subsequent map see the SAME partition contents (an
    // uncached RDD would re-execute the sort once per job)
    val sorted = clean.orderBy(orderCols.map(col): _*).localCheckpoint()
    val schema = sorted.schema.add(idName,
      org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + i))
    }
    spark.createDataFrame(rdd, schema)
  }
}

final class MutationEngine(catalog: GraphCatalog, spark: SparkSession,
                           params: Map[String, Any]) {

  private def ec(f: Frame) = new ExpressionCompiler(f, params)

  /** Does the expression tree reference the variable? Case classes are
    * Products, so a product walk covers every AST node shape (Seq/
    * Option children included — List cells and Some are Products too).
    */
  private def referencesVar(e: Any, rv: String): Boolean = e match {
    case Variable(`rv`) => true
    case s: Seq[_]      => s.exists(referencesVar(_, rv))
    case o: Option[_]   => o.exists(referencesVar(_, rv))
    case p: Product     => p.productIterator.exists(referencesVar(_, rv))
    case _              => false
  }

  /** Allocate `perRow` ids starting after the current max id. */
  private def nextIdBase(df: DataFrame, idCol: String): Long = {
    val m = df.agg(max(col(idCol))).head()
    if (m.isNullAt(0)) 0L else m.getLong(0) + 1L
  }

  // ---------------- CREATE ----------------

  /** CREATE per binding row: nodes get fresh ids; relationship patterns
    * connect bound or just-created endpoint variables. Anonymous node
    * patterns get a synthesized variable so the write still happens
    * (reference creates entities without a variable too:
    * mutation_engine.py:513-540; id allocation :229-323).
    */
  def create(f: Frame, paths: Seq[PathPattern]): Frame = {
    var frame = withRowId(f)
    paths.map(nameAnonNodes).foreach { p =>
      frame = createNodeIfUnbound(frame, p.start)
      var prevVar = p.start.variable.get
      p.hops.foreach { case (rel, node) =>
        frame = createNodeIfUnbound(frame, node)
        frame = createRel(frame, prevVar, rel, node.variable.get)
        prevVar = node.variable.get
      }
    }
    frame.copy(df = frame.df.drop("__rowid"))
  }

  private var anonN = 0
  private def freshVar(): String = { anonN += 1; s"__anonCre$anonN" }
  private def nameAnonNodes(p: PathPattern): PathPattern = p.copy(
    start = if (p.start.variable.isEmpty)
      p.start.copy(variable = Some(freshVar())) else p.start,
    hops = p.hops.map { case (r, n) =>
      (r, if (n.variable.isEmpty) n.copy(variable = Some(freshVar())) else n)
    })

  private def withRowId(f: Frame): Frame =
    if (f.df.columns.contains("__rowid")) f
    else f.copy(df = f.df.withColumn("__rowid", monotonically_increasing_id())
      .localCheckpoint())

  private def createNodeIfUnbound(f: Frame, np: NodePattern): Frame = {
    val v = np.variable.getOrElse(
      throw new IllegalStateException("CREATE node pattern not named (nameAnonNodes)"))
    if (f.vars.contains(v)) return f
    val label = np.labels.headOption.getOrElse(
      throw new IllegalArgumentException(s"CREATE node $v requires a label"))

    val (idCol, existingDf, known) =
      if (catalog.hasEntity(label)) {
        val e = catalog.entity(label)
        (e.idCol, Some(e.df), true)
      } else ("__ID__", None, false)

    val base = existingDf.map(d => nextIdBase(d, idCol)).getOrElse(0L)
    val compiler = ec(f)
    val propCols = np.props.map { case (k, e) => compiler.compile(e).as(k) }
    // one created node per binding row; id = base + dense row number.
    // No pin of its own (round 21, −1 job/CREATE): DenseId pins the
    // sorted layout already, so the id map is deterministic per
    // consumer, and both consumers are cheap narrow maps over those
    // pinned blocks (`merged` is pinned eagerly below; the join-back is
    // forced with the statement).
    val created = DenseId.assign(
      f.df.select(Seq(col("__rowid")) ++ propCols: _*),
      Seq("__rowid"), idCol, base)

    val newRows = created.drop("__rowid")
    val merged = existingDf match {
      case Some(d) => d.unionByName(newRows, allowMissingColumns = true)
      case None    => newRows
    }
    if (known) catalog.replaceEntity(label, merged.localCheckpoint())
    else if (!newRows.isEmpty) catalog.addEntity(label, merged.localCheckpoint(), idCol)
    // zero rows created against an unknown label (e.g. FOREACH over an
    // empty list): don't mint an empty label table

    // bind the created node's columns into the frame (prefixed)
    val attrs = newRows.columns.toSeq
    val prefixed = created.select(Seq(col("__rowid")) ++
      attrs.map(a => col(a).as(s"${v}__$a")): _*)
    Frame(f.df.join(prefixed, Seq("__rowid")),
      f.vars + (v -> NodeVar(label, idCol, attrs)))
  }

  private def createRel(f: Frame, fromVar: String, rel: RelPattern,
                        toVar: String): Frame = {
    val relType = rel.types.headOption.getOrElse(
      throw new IllegalArgumentException("CREATE relationship requires a type"))
    // endpoints: previous chain node and this node — both bound by now;
    // direction decides src/dst roles.
    val (srcVar, dstVar) =
      if (rel.direction == "IN") (toVar, fromVar) else (fromVar, toVar)

    val (srcCol0, dstCol0, idColOpt, existing, known) =
      if (catalog.hasRelationship(relType)) {
        val r = catalog.relationship(relType)
        (r.srcCol, r.dstCol, r.idCol, Some(r.df), true)
      } else ("__SOURCE__", "__TARGET__", Some("__ID__"), None, false)

    val compiler = ec(f)
    val propCols = rel.props.map { case (k, e) => compiler.compile(e).as(k) }
    var newRels = f.df.select(Seq(
      col(f.idCol(srcVar)).as(srcCol0),
      col(f.idCol(dstVar)).as(dstCol0)) ++ propCols: _*)
    idColOpt.foreach { ic =>
      val base = existing.map(d => nextIdBase(d, ic)).getOrElse(0L)
      newRels = DenseId.assign(newRels, Seq(srcCol0, dstCol0), ic, base)
    }
    val merged = existing match {
      case Some(d) => d.unionByName(newRels, allowMissingColumns = true)
      case None    => newRels
    }
    val srcLabel = f.vars.get(srcVar).collect { case NodeVar(l, _, _) => l }
    val dstLabel = f.vars.get(dstVar).collect { case NodeVar(l, _, _) => l }
    if (known) catalog.replaceRelationship(relType, merged.localCheckpoint())
    else catalog.addRelationship(relType, merged.localCheckpoint(),
      srcCol0, dstCol0, idColOpt, srcLabel, dstLabel)
    f
  }

  // ---------------- SET / REMOVE ----------------

  /** SET v.key = expr (per binding row). Multiple bindings of the same
    * entity resolve to one value per id (first, as the reference's
    * row-sequential writes make the last row win — order is undefined
    * there too: mutation_engine.py:118-228).
    */
  def setItems(f: Frame, items: Seq[SetItem]): Frame = {
    items.foreach {
      case SetProperty(Variable(v), key, valueExpr) =>
        val meta = f.vars.getOrElse(v,
          throw new IllegalArgumentException(s"SET on unbound variable $v"))
        meta match {
          case NodeVar(label, idAttr, _) =>
            val e = catalog.entity(label)
            val updates = f.df
              .select(col(f.col(v, idAttr)).as("__uid"), ec(f).compile(valueExpr).as("__uval"))
              .groupBy(col("__uid")).agg(first(col("__uval")).as("__uval"))
            val old = e.df
            val hasCol = old.columns.contains(key)
            val joined = old.join(updates, col(e.idCol) === col("__uid"), "left_outer")
            val updated = (if (hasCol)
              joined.withColumn(key, when(col("__uid").isNotNull, col("__uval"))
                .otherwise(col(key)))
            else joined.withColumn(key, col("__uval")))
              .drop("__uid", "__uval")
            catalog.replaceEntity(label, updated.localCheckpoint())
          // SET r.key on a matched relationship: update the rel table
          // keyed by the declared relationship id when there is one,
          // else by exact (src, dst) orientation (a BOTH-direction
          // match without a declared id can only address the stored
          // orientation — declare an id column for full fidelity).
          case RelVar(relType, _, _, attrs) =>
            val r = catalog.relationship(relType)
            val keyAttrs: Seq[String] = r.idCol match {
              case Some(ic) if attrs.contains(ic) => Seq(ic)
              case _                              => Seq(r.srcCol, r.dstCol)
            }
            val updates = f.df
              .select(keyAttrs.map(a => col(f.col(v, a)).as(s"__uk_$a")) :+
                ec(f).compile(valueExpr).as("__uval"): _*)
              .groupBy(keyAttrs.map(a => col(s"__uk_$a")): _*)
              .agg(first(col("__uval")).as("__uval"))
            val old = r.df
            val joined = old.join(updates,
              keyAttrs.map(a => col(a) === col(s"__uk_$a")).reduce(_ && _),
              "left_outer")
            val marker = col(s"__uk_${keyAttrs.head}")
            val updated = (if (old.columns.contains(key))
              joined.withColumn(key, when(marker.isNotNull, col("__uval"))
                .otherwise(col(key)))
            else joined.withColumn(key, when(marker.isNotNull, col("__uval"))))
              .drop(keyAttrs.map(a => s"__uk_$a") :+ "__uval": _*)
            catalog.replaceRelationship(relType, updated.localCheckpoint())
          case _ => throw new UnsupportedOperationException(
            s"SET on non-node variable $v")
        }
      case SetVariable(v, MapLit(entries), additive) =>
        // SET n += {..} merges keys; SET n = {..} replaces: provided keys
        // are written and every other non-id attribute is nulled
        // (mutation_engine.py SET map semantics).
        entries.foreach { case (k, valueExpr) =>
          setItems(f, Seq(SetProperty(Variable(v), k, valueExpr)))
        }
        if (!additive) f.vars.get(v) match {
          case Some(NodeVar(label, idAttr, _)) =>
            val e = catalog.entity(label)
            val keep = Set(idAttr) ++ entries.map(_._1)
            val ids = f.df.select(col(f.col(v, idAttr)).as("__uid")).distinct()
            var updated = e.df.join(ids, col(e.idCol) === col("__uid"), "left_outer")
            e.df.columns.filterNot(keep.contains).foreach { c =>
              updated = updated.withColumn(c,
                when(col("__uid").isNotNull, lit(null)).otherwise(col(c)))
            }
            catalog.replaceEntity(label, updated.drop("__uid").localCheckpoint())
          case _ =>
        }
      case SetLabels(v, labels) =>
        // An additional label copies the matched rows into that label's
        // table (created on demand) — the multi-table analog of adding a
        // label bit (reference: SET labels, mutation_engine.py:118-228).
        f.vars.get(v) match {
          case Some(NodeVar(_, idAttr, attrs)) =>
            val rows = f.df
              .select(attrs.map(a => col(f.col(v, a)).as(a)): _*).distinct()
            labels.foreach { l =>
              if (catalog.hasEntity(l)) {
                val t = catalog.entity(l)
                val fresh = rows.join(t.df.select(col(t.idCol)),
                  rows(idAttr) === t.df(t.idCol), "left_anti")
                catalog.replaceEntity(l,
                  t.df.unionByName(fresh, allowMissingColumns = true).localCheckpoint())
              } else catalog.addEntity(l, rows.localCheckpoint(), idAttr)
            }
          case _ => throw new UnsupportedOperationException("SET label needs a node variable")
        }
      case other => throw new UnsupportedOperationException(
        s"SET item not yet supported: $other")
    }
    // rebind touched variables so later clauses in this query read the
    // updated values (the reference re-reads through the shadow layer)
    val touched = items.collect { case SetProperty(Variable(v), _, _) => v }.distinct
    touched.foldLeft(f)(rebind)
  }

  /** Re-join a variable's prefixed columns from its (updated) catalog
    * table — by id for nodes; by declared id (else (src, dst), the same
    * keying rule relationship SET uses) for relationships — so later
    * clauses in the same query read post-SET values, mirroring the
    * reference's shadow-layer re-read.
    */
  private def rebind(f: Frame, v: String): Frame = f.vars.get(v) match {
    case Some(RelVar(relType, srcAttr, dstAttr, _)) =>
      val r = catalog.relationship(relType)
      val attrs = r.df.columns.toSeq
      val keyAttrs = r.idCol.filter(attrs.contains).map(Seq(_))
        .getOrElse(Seq(srcAttr, dstAttr))
      val keyCols = keyAttrs.map(a => f.col(v, a))
      val keep = f.df.drop(f.varCols(v).filterNot(keyCols.contains): _*)
      val prefixed = r.df.select(attrs.map(a => col(a).as(s"__rb_$a")): _*)
      val joined = keep.join(prefixed,
        keyAttrs.map(a => col(f.col(v, a)) === col(s"__rb_$a")).reduce(_ && _))
      val renamed = attrs.foldLeft(joined) { (df, a) =>
        if (keyAttrs.contains(a)) df.drop(s"__rb_$a")
        else df.withColumnRenamed(s"__rb_$a", f.col(v, a))
      }
      Frame(renamed, f.vars + (v -> RelVar(relType, srcAttr, dstAttr, attrs)))
    case Some(NodeVar(label, idAttr, _)) =>
      val e = catalog.entity(label)
      val attrs = e.df.columns.toSeq
      val idColName = f.col(v, idAttr)
      val keep = f.df.drop(f.varCols(v).filterNot(_ == idColName): _*)
      val prefixed = e.df.select(attrs.map(a => col(a).as(s"__rb_$a")): _*)
      val joined = keep.join(prefixed, col(idColName) === col(s"__rb_$idAttr"))
      val renamed = attrs.foldLeft(joined) { (df, a) =>
        if (a == idAttr) df.drop(s"__rb_$a")
        else df.withColumnRenamed(s"__rb_$a", f.col(v, a))
      }
      Frame(renamed, f.vars + (v -> NodeVar(label, idAttr, attrs)))
    case _ => f
  }

  /** REMOVE v.key → null out the property for matched ids
    * (reference: mutation_engine.py:1020-1060).
    */
  def remove(f: Frame, items: Seq[RemoveItem]): Frame = {
    items.foreach {
      case RemoveProperty(Variable(v), key) =>
        f.vars.get(v) match {
          case Some(NodeVar(label, _, _)) =>
            val e = catalog.entity(label)
            if (e.df.columns.contains(key)) {
              val ids = f.df.select(col(f.idCol(v)).as("__uid")).distinct()
              val updated = e.df.join(ids, col(e.idCol) === col("__uid"), "left_outer")
                .withColumn(key, when(col("__uid").isNotNull, lit(null)).otherwise(col(key)))
                .drop("__uid")
              catalog.replaceEntity(label, updated.localCheckpoint())
            }
          // REMOVE r.key on a matched relationship: null out the
          // property, same keying rule as relationship SET
          case Some(RelVar(relType, _, _, attrs)) =>
            val r = catalog.relationship(relType)
            if (r.df.columns.contains(key)) {
              val keyAttrs: Seq[String] = r.idCol match {
                case Some(ic) if attrs.contains(ic) => Seq(ic)
                case _                              => Seq(r.srcCol, r.dstCol)
              }
              val ids = f.df.select(keyAttrs.map(a =>
                col(f.col(v, a)).as(s"__uk_$a")): _*).distinct()
              val updated = r.df.join(ids,
                keyAttrs.map(a => col(a) === col(s"__uk_$a")).reduce(_ && _),
                "left_outer")
                .withColumn(key,
                  when(col(s"__uk_${keyAttrs.head}").isNotNull, lit(null))
                    .otherwise(col(key)))
                .drop(keyAttrs.map(a => s"__uk_$a"): _*)
              catalog.replaceRelationship(relType, updated.localCheckpoint())
            }
          case _ => throw new UnsupportedOperationException("REMOVE needs a node variable")
        }
      case RemoveLabels(v, labels) =>
        // Remove from those labels' tables by id (no-op if unknown label
        // or the node was never copied there).
        f.vars.get(v) match {
          case Some(NodeVar(_, idAttr, _)) =>
            val ids = f.df.select(col(f.col(v, idAttr)).as("__rid")).distinct()
            labels.filter(catalog.hasEntity).foreach { l =>
              val t = catalog.entity(l)
              catalog.replaceEntity(l,
                t.df.join(ids, col(t.idCol) === col("__rid"), "left_anti")
                  .localCheckpoint())
            }
          case _ => throw new UnsupportedOperationException("REMOVE label needs a node variable")
        }
    }
    f
  }

  // ---------------- DELETE ----------------

  /** DELETE / DETACH DELETE by anti-join on matched ids (reference:
    * mutation_engine.py:619-745). DETACH also removes relationships
    * whose declared src/dst label matches the deleted node label.
    */
  def delete(f: Frame, exprs: Seq[Expr], detach: Boolean): Frame = {
    exprs.foreach {
      case Variable(v) =>
        f.vars.get(v) match {
          case Some(NodeVar(label, _, _)) =>
            val e = catalog.entity(label)
            val ids = f.df.select(col(f.idCol(v)).as("__did")).distinct().localCheckpoint()
            val remaining = e.df.join(ids, col(e.idCol) === col("__did"), "left_anti")
            catalog.replaceEntity(label, remaining.localCheckpoint())
            if (detach) {
              catalog.relTypes.foreach { rt =>
                val rd = catalog.relationship(rt)
                // undeclared endpoint labels scrub conservatively by id
                // membership on BOTH endpoints (reference behavior) —
                // otherwise an id reused after delete could re-attach a
                // dangling edge to an unrelated new node
                val touchesSrc = rd.srcLabel.forall(_ == label)
                val touchesDst = rd.dstLabel.forall(_ == label)
                if (touchesSrc || touchesDst) {
                  var d = rd.df
                  if (touchesSrc)
                    d = d.join(ids, col(rd.srcCol) === col("__did"), "left_anti")
                  if (touchesDst)
                    d = d.join(ids, col(rd.dstCol) === col("__did"), "left_anti")
                  catalog.replaceRelationship(rt, d.localCheckpoint())
                }
              }
            }
          case Some(RelVar(relType, srcAttr, dstAttr, _)) =>
            val rd = catalog.relationship(relType)
            val pairs = f.df.select(
              col(f.col(v, srcAttr)).as("__ds"), col(f.col(v, dstAttr)).as("__dd"))
              .distinct().localCheckpoint()
            val remaining = rd.df.join(pairs,
              col(rd.srcCol) === col("__ds") && col(rd.dstCol) === col("__dd"), "left_anti")
            catalog.replaceRelationship(relType, remaining.localCheckpoint())
          case _ => throw new IllegalArgumentException(s"DELETE of unbound/value variable")
        }
      case other => throw new IllegalArgumentException(s"DELETE expects variables, got $other")
    }
    f
  }

  // ---------------- MERGE ----------------

  /** Single-node MERGE with ON CREATE / ON MATCH (reference:
    * mutation_engine.py:746-855): exists-split on the property keys —
    * pre-existing keys get ON MATCH SET, missing keys are created with
    * the merge props + ON CREATE SET, then the variable binds to the
    * union so later clauses read the post-merge state.
    */
  def merge(f0: Frame, path: PathPattern,
            onCreate: Seq[SetItem], onMatch: Seq[SetItem]): Frame = {
    if (path.hops.nonEmpty) return mergeRelationship(f0, path, onCreate, onMatch)
    val np = path.start
    val v = np.variable.getOrElse(throw new IllegalArgumentException("MERGE needs a variable"))
    val label = np.labels.headOption.getOrElse(
      throw new IllegalArgumentException("MERGE needs a label"))
    require(np.props.nonEmpty, "MERGE needs property keys to match on")

    val f = withRowId(f0)
    val compiler = ec(f)
    val keyNames = np.props.map(_._1)
    val keyCols = np.props.map { case (k, e0) => compiler.compile(e0).as(k) }
    val want = f.df.select(Seq(col("__rowid")) ++ keyCols: _*).localCheckpoint()

    val e = catalog.entity(label)
    val existingKeyed = e.df.select(e.df.columns.map(c => col(c).as(s"__e_$c")).toSeq: _*)
    val joinCond = keyNames.map(k => col(k) === col(s"__e_$k")).reduce(_ && _)
    // exists-split counts ride the pins' own jobs (IterPin.pinProbed,
    // round 21): the old shape paid a separate .isEmpty job per branch
    // probe on top of each localCheckpoint — two jobs per MERGE saved,
    // same pinned frames, same values
    val (matchedIds, matchedRow) = graft.operators.IterPin.pinProbed(
      want.join(existingKeyed, joinCond, "inner")
        .select(col(s"__e_${e.idCol}").as("__mid")).distinct(),
      Seq(count(lit(1))))
    val anyMatched = matchedRow.getLong(0) > 0L
    val (missing, missingRow) = graft.operators.IterPin.pinProbed(
      want.join(existingKeyed, joinCond, "left_anti"),
      Seq(count(lit(1))))

    if (missingRow.getLong(0) > 0L) {
      val base = nextIdBase(e.df, e.idCol)
      val created = DenseId.assign(missing.dropDuplicates(keyNames),
        Seq("__rowid"), e.idCol, base)
        .drop("__rowid")
      catalog.replaceEntity(label,
        e.df.unionByName(created, allowMissingColumns = true).localCheckpoint())
    }

    // bind v's id per binding row against the post-create table
    val e2 = catalog.entity(label)
    val idBind = e2.df.select(
      Seq(col(e2.idCol).as(s"${v}__${e2.idCol}")) ++
        keyNames.map(k => col(k).as(s"__k_$k")): _*)
    val bindCond = keyNames.map(k => col(k) === col(s"__k_$k")).reduce(_ && _)
    val boundIds = want.join(idBind, bindCond)
      .select(col("__rowid"), col(s"${v}__${e2.idCol}"))
    val idOnlyFrame = Frame(
      f.df.join(boundIds, Seq("__rowid")),
      f.vars + (v -> NodeVar(label, e2.idCol, Seq(e2.idCol))))

    // ON MATCH / ON CREATE evaluate against the FULL post-create
    // attribute set, not just the bound id: `ON MATCH SET m.v = m.v + 1`
    // must read the entity's current property — with an id-only binding,
    // Cypher's null-for-missing property rule silently turned every
    // self-referencing SET into null (caught by the random-mutation
    // differential in PropertySpec)
    val attrs2 = e2.df.columns.toSeq
    val prefixedAll = e2.df.select(attrs2.map(a => col(a).as(s"__b_$a")): _*)
    val fullBound = attrs2.foldLeft(
      idOnlyFrame.df.join(prefixedAll,
        col(s"${v}__${e2.idCol}") === col(s"__b_${e2.idCol}"))) { (df, a) =>
      if (a == e2.idCol) df.drop(s"__b_$a")
      else df.withColumnRenamed(s"__b_$a", s"${v}__$a")
    }
    val boundFrame = Frame(fullBound, f.vars + (v -> NodeVar(label, e2.idCol, attrs2)))
    if (onMatch.nonEmpty && anyMatched) {
      val sub = boundFrame.copy(df = boundFrame.df.join(matchedIds,
        col(s"${v}__${e2.idCol}") === col("__mid")).drop("__mid"))
      setItems(sub, onMatch)
    }
    if (onCreate.nonEmpty) {
      val createdOnly = boundFrame.df.join(matchedIds,
        col(s"${v}__${e2.idCol}") === col("__mid"), "left_anti")
      if (!createdOnly.isEmpty) setItems(boundFrame.copy(df = createdOnly), onCreate)
    }

    // final bind: all attributes from the post-SET table
    val e3 = catalog.entity(label)
    val attrs = e3.df.columns.toSeq
    val prefixedFull = e3.df.select(attrs.map(a => col(a).as(s"__m_$a")): _*)
    val full = idOnlyFrame.df
      .join(prefixedFull, col(s"${v}__${e3.idCol}") === col(s"__m_${e3.idCol}"))
    val cleaned = attrs.foldLeft(full) { (df, a) =>
      if (a == e3.idCol) df.drop(s"__m_$a")
      else df.withColumnRenamed(s"__m_$a", s"${v}__$a")
    }.drop("__rowid")
    Frame(cleaned, f.vars + (v -> NodeVar(label, e3.idCol, attrs)))
  }

  /** Relationship MERGE: (a)-[:T {props}]->(b) with both endpoints
    * bound — create the missing (src, dst) edges, keep existing ones
    * (idempotent). ON CREATE SET writes onto the new edges before they
    * are appended; ON MATCH SET updates the existing edges keyed by
    * (src, dst) (mutation_engine.py:746-855).
    *
    * Duplicate binding rows for one (src, dst) pair fold
    * DETERMINISTICALLY (max over each carried SET/prop value — a fixed
    * linearization of Neo4j's row order, which a distributed frame does
    * not have), and a pair duplicated within the statement applies its
    * ON MATCH values to the edge the first row just created — Neo4j's
    * per-row MERGE does the same: row 2 matches row 1's edge.
    *
    * DOCUMENTED DIVERGENCE (non-idempotent deferred ON MATCH): a
    * self-referencing ON MATCH value (SET r.n = r.n + 1) is applied
    * ONCE per affected edge, not once per binding row — k duplicate
    * rows increment by 1 where Neo4j's sequential per-row MERGE
    * increments by k (k-1 on the created-edge path). Applying an
    * arbitrary expression k times is function iteration, which a
    * single relational pass cannot express; the once-per-edge fold is
    * the deterministic distributed semantics and is spec-tested in
    * MutationSpec ("duplicate binding rows apply a deferred ON MATCH
    * once per edge").
    */
  private def mergeRelationship(f: Frame, path: PathPattern,
                                onCreate: Seq[SetItem], onMatch: Seq[SetItem]): Frame = {
    require(path.hops.size == 1, "relationship MERGE supports a single hop")
    val (rel, endNode) = path.hops.head
    val relType = rel.types.headOption.getOrElse(
      throw new IllegalArgumentException("relationship MERGE needs a type"))
    val fromVar = path.start.variable.getOrElse(
      throw new IllegalArgumentException("MERGE rel endpoints must be bound variables"))
    val toVar = endNode.variable.getOrElse(
      throw new IllegalArgumentException("MERGE rel endpoints must be bound variables"))
    require(f.vars.contains(fromVar) && f.vars.contains(toVar),
      "MERGE rel endpoints must be bound by a prior MATCH/CREATE")
    val (srcVar, dstVar) =
      if (rel.direction == "IN") (toVar, fromVar) else (fromVar, toVar)

    val (srcCol0, dstCol0, idColOpt, existing, known) =
      if (catalog.hasRelationship(relType)) {
        val r = catalog.relationship(relType)
        (r.srcCol, r.dstCol, r.idCol, Some(r.df), true)
      } else ("__SOURCE__", "__TARGET__", Some("__ID__"), None, false)

    val compiler = ec(f)
    // ON CREATE / ON MATCH SET items must target the rel variable; their
    // value expressions evaluate against the binding frame, carried as
    // __oc_/__om_ columns through the (src, dst) dedup. EXCEPTION: an
    // ON MATCH value that references the relationship variable itself
    // (the canonical counter idiom, ON MATCH SET r.n = r.n + 1) cannot
    // be precomputed in the outer frame — it is DEFERRED and evaluated
    // against the matched edge's current row at update time.
    val (omDeferred, omOuter) = onMatch.partition {
      case SetProperty(Variable(rv), _, vexpr) if rel.variable.contains(rv) =>
        referencesVar(vexpr, rv)
      case _ => false
    }
    def relSetCols(items: Seq[SetItem], pref: String): Seq[(String, Column)] =
      items.map {
        case SetProperty(Variable(rv), key, vexpr) if rel.variable.contains(rv) =>
          key -> compiler.compile(vexpr).as(s"$pref$key")
        case other => throw new UnsupportedOperationException(
          s"relationship MERGE SET must target the relationship variable: $other")
      }
    val ocCols = relSetCols(onCreate, "__oc_")
    val omCols = relSetCols(omOuter, "__om_")

    val propCols = rel.props.map { case (k, e0) => compiler.compile(e0).as(k) }
    val carried = rel.props.map(_._1) ++
      ocCols.map("__oc_" + _._1) ++ omCols.map("__om_" + _._1)
    // Duplicate rows for one (src, dst) fold to ONE surviving row
    // atomically: max over a struct of all carried values picks a single
    // deterministic row (lexicographic struct ordering), so the edge
    // never gets a cross-row mix of values no input row contained.
    val grouped = f.df.select(Seq(
      col(f.idCol(srcVar)).as(srcCol0),
      col(f.idCol(dstVar)).as(dstCol0)) ++ propCols ++
      ocCols.map(_._2) ++ omCols.map(_._2): _*)
      .groupBy(col(srcCol0), col(dstCol0))
    val wanted =
      if (carried.isEmpty) grouped.agg(count(lit(1)).as("__dup"))
      else grouped.agg(count(lit(1)).as("__dup"),
          max(struct(carried.map(col): _*)).as("__row"))
        .select(Seq(col(srcCol0), col(dstCol0), col("__dup")) ++
          carried.map(c => col("__row").getField(c).as(c)): _*)

    val missing = existing match {
      case Some(d) => wanted.join(d.select(col(srcCol0), col(dstCol0))
        .withColumnRenamed(srcCol0, "__es").withColumnRenamed(dstCol0, "__ed"),
        col(srcCol0) === col("__es") && col(dstCol0) === col("__ed"), "left_anti")
      case None => wanted
    }

    // ON MATCH: update the pre-existing edges keyed by (src, dst).
    // Edge columns are var-prefixed for the update so deferred
    // (self-referencing) values compile like any property access
    // against the matched edge's CURRENT row, then renamed back.
    if ((omCols.nonEmpty || omDeferred.nonEmpty) && existing.isDefined)
      existing.foreach { d =>
        val rv = rel.variable.get
        val matchKeys = wanted.select(Seq(col(srcCol0).as("__ms"),
          col(dstCol0).as("__md")) ++ omCols.map { case (k, _) => col(s"__om_$k") }: _*)
        val dCols = d.columns.toSeq
        val pref = d.select(dCols.map(c => col(c).as(s"${rv}__$c")): _*)
        var updated = pref.join(matchKeys,
          col(s"${rv}__$srcCol0") === col("__ms") &&
            col(s"${rv}__$dstCol0") === col("__md"), "left_outer")
        def setCol(k: String, value: Column): Unit =
          updated = updated.withColumn(s"${rv}__$k",
            if (dCols.contains(k))
              when(col("__ms").isNotNull, value).otherwise(col(s"${rv}__$k"))
            else when(col("__ms").isNotNull, value))
        omCols.foreach { case (k, _) => setCol(k, col(s"__om_$k")) }
        omDeferred.foreach {
          case SetProperty(Variable(_), k, vexpr) =>
            val rf = Frame(updated, Map(rv -> RelVar(relType, srcCol0, dstCol0, dCols)))
            setCol(k, ec(rf).compile(vexpr))
          case other => throw new UnsupportedOperationException(other.toString)
        }
        var cleaned = updated.drop(
          "__ms" +: "__md" +: omCols.map("__om_" + _._1): _*)
        cleaned.columns.filter(_.startsWith(s"${rv}__")).foreach(c =>
          cleaned = cleaned.withColumnRenamed(c, c.stripPrefix(s"${rv}__")))
        catalog.replaceRelationship(relType, cleaned.localCheckpoint())
      }

    if (!missing.isEmpty) {
      // ON CREATE values become the new edges' properties; a key that ON
      // MATCH also sets takes the ON MATCH value when the pair had
      // duplicate binding rows (the duplicates matched the just-created
      // edge and overwrote it)
      val omKeys = omCols.map(_._1).toSet
      val ocKeys = ocCols.map(_._1).toSet
      var newRels = (ocKeys ++ omKeys).toSeq.sorted.foldLeft(missing) { (df, k) =>
        val created = if (ocKeys(k)) col(s"__oc_$k") else lit(null)
        df.withColumn(k,
          if (omKeys(k)) when(col("__dup") > 1, col(s"__om_$k")).otherwise(created)
          else created)
      }
      // duplicate binding rows matched the edge the first row just
      // created — deferred ON MATCH values evaluate against that
      // created edge's post-ON-CREATE columns
      omDeferred.foreach {
        case SetProperty(Variable(rv), k, vexpr) =>
          val cols0 = newRels.columns.toSeq.filterNot(c =>
            c == "__dup" || c.startsWith("__oc_") || c.startsWith("__om_"))
          val prefd = newRels.select(
            (Seq(col("__dup")) ++ newRels.columns.toSeq.filter(_ != "__dup")
              .map(c => if (cols0.contains(c)) col(c).as(s"${rv}__$c") else col(c))): _*)
          val rf = Frame(prefd, Map(rv -> RelVar(relType, srcCol0, dstCol0, cols0)))
          val nv = ec(rf).compile(vexpr)
          var applied = prefd.withColumn(s"${rv}__$k",
            if (cols0.contains(k)) when(col("__dup") > 1, nv).otherwise(col(s"${rv}__$k"))
            else when(col("__dup") > 1, nv))
          applied.columns.filter(_.startsWith(s"${rv}__")).foreach(c =>
            applied = applied.withColumnRenamed(c, c.stripPrefix(s"${rv}__")))
          newRels = applied
        case other => throw new UnsupportedOperationException(other.toString)
      }
      newRels = newRels.drop(("__dup" +: ocCols.map("__oc_" + _._1)) ++
        omCols.map("__om_" + _._1): _*)
      idColOpt.foreach { ic =>
        val base = existing.map(d => nextIdBase(d, ic)).getOrElse(0L)
        newRels = DenseId.assign(newRels, Seq(srcCol0, dstCol0), ic, base)
      }
      val current = if (catalog.hasRelationship(relType))
        Some(catalog.relationship(relType).df) else None
      val merged = current match {
        case Some(d) => d.unionByName(newRels, allowMissingColumns = true)
        case None    => newRels
      }
      val srcLabel = f.vars.get(srcVar).collect { case NodeVar(l, _, _) => l }
      val dstLabel = f.vars.get(dstVar).collect { case NodeVar(l, _, _) => l }
      if (known) catalog.replaceRelationship(relType, merged.localCheckpoint())
      else catalog.addRelationship(relType, merged.localCheckpoint(),
        srcCol0, dstCol0, idColOpt, srcLabel, dstLabel)
    }
    f
  }
}
