package graft.plans

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.{SnapshotCatalog, SnapshotMoRTable, SnapshotReadTable, Snapshots}

/** The SQL surface of the snapshot log beyond plain reads, injected via
  * [[GraftExtensions]]:
  *
  *  - [[SnapshotRelationRewrite]] serves merge-on-read / renamed /
  *    widened versions: the catalog hands out a no-capability
  *    [[SnapshotMoRTable]] marker and this rule replaces its relation
  *    during analysis with the era-aware [[Snapshots.readAt]] plan, so
  *    the optimizer sees real parquet leaves (pushdown, column pruning,
  *    broadcast tombstone anti-join) instead of an opaque connector.
  *  - [[SnapshotDmlRewrite]] routes `DELETE FROM` / `UPDATE` /
  *    `MERGE INTO` statements on snapshot-catalog tables to the log's
  *    merge-on-read DML ([[Snapshots.deleteWhere]]/[[Snapshots.updateWhere]]/
  *    [[Snapshots.merge]]) as eagerly-executed commands — the Delta
  *    analyzer-rule shape (DeltaAnalysis rewrites the same three nodes to
  *    RunnableCommands), completing the quartet's SQL half: every DML a
  *    DataFrame caller can commit, a SQL caller can too.
  *
  * Both run in the analyzer's resolution fixed-point; the relation
  * rewrite PROTECTS relations sitting under an unconverted DML node so
  * the DML rule never loses the catalog/identifier it needs.
  */
case class SnapshotRelationRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a relation that is a DML TARGET must stay a relation until
    // SnapshotDmlRewrite consumes the enclosing node (the command
    // carries only the table PATH, not the scan)
    val dmlTargets = plan.collect {
      case d: DeleteFromTable => d.table
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
      // INSERT targets: the statement's table IS a child until
      // ResolveInsertInto converts it to AppendData/OverwriteByExpression
      // (whose table field is not a child) — keep it a relation meanwhile
      case i: InsertIntoStatement => i.table
    }.flatMap(_.collect { case r: DataSourceV2Relation => r }).toSet
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotMoRTable] && !dmlTargets(r) =>
        val t = r.table.asInstanceOf[SnapshotMoRTable]
        val inner = GraftSqlBridge.analyzed(
          Snapshots.readAt(spark, t.path, t.snapVersion).getOrElse(
            throw new IllegalStateException(
              s"${t.name()} vanished between catalog resolution and rewrite")))
        val byName = inner.output.map(a => a.name -> a).toMap
        // re-anchor the inner plan's outputs onto the relation's exprIds
        // so references already resolved against the relation keep binding
        Project(r.output.map { a =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        }, inner)
      // metadata tables (history/files) lower to their driver-built
      // O(log) relation — a LocalRelation, never a data scan
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.lake.SnapshotMetaTable] =>
        val t = r.table.asInstanceOf[graft.lake.SnapshotMetaTable]
        val inner = GraftSqlBridge.analyzed(
          if (t.kind == "history") Snapshots.history(spark, t.path)
          else Snapshots.filesMetadata(spark, t.path, t.snapVersion))
        val byName = inner.output.map(a => a.name -> a).toMap
        Project(r.output.map { a =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        }, inner)
    }
  }
}

/** Rewrites resolved DML statements over snapshot-catalog tables into
  * eagerly-executed commands against the log. Fires only once the
  * condition/assignments are resolved (the analyzer resolves them against
  * the relation's output in a prior fixed-point iteration); resolved
  * attribute references are then re-spoken BY NAME so the command can
  * re-resolve them against the fresh era-aware scan it drives. */
case class SnapshotDmlRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The log-table path behind a DML target, when (and only when) the
    * target resolves through a [[SnapshotCatalog]]. */
  private def targetPath(plan: LogicalPlan): Option[String] =
    plan.collectFirst {
      // data tables only — a DML aimed at a history/files METADATA
      // table must not resolve to a path (it would create a bogus
      // table under the data table's directory)
      case r: DataSourceV2Relation
          if r.catalog.exists(_.isInstanceOf[SnapshotCatalog]) &&
            r.identifier.isDefined &&
            (r.table.isInstanceOf[SnapshotReadTable] ||
              r.table.isInstanceOf[SnapshotMoRTable]) =>
        r.catalog.get.asInstanceOf[SnapshotCatalog]
          .tablePath(r.identifier.get)
    }

  /** Resolved references re-spoken by name: the command's runtime scan is
    * a fresh plan with fresh exprIds, so captured AttributeReferences
    * must not survive into it. */
  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case d @ DeleteFromTable(target, cond) if cond.resolved =>
        targetPath(target)
          .map(p => SnapshotDeleteCommand(p,
            GraftSqlBridge.column(byName(cond))): LogicalPlan)
          .getOrElse(d)
      case u @ UpdateTable(target, assignments, cond)
          if assignments.forall(_.resolved) && cond.forall(_.resolved) =>
        targetPath(target).map { p =>
          val sets = assignments.map { a =>
            val name = a.key match {
              case ar: AttributeReference => ar.name
              case other => throw new UnsupportedOperationException(
                s"UPDATE on a snapshot table sets whole columns; got " +
                  s"${other.sql}")
            }
            name -> GraftSqlBridge.column(byName(a.value))
          }
          SnapshotUpdateCommand(p, GraftSqlBridge.column(byName(cond.getOrElse(
            org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))),
            sets): LogicalPlan
        }.getOrElse(u)
      case m: MergeIntoTable if m.childrenResolved &&
          m.mergeCondition.resolved &&
          (m.matchedActions ++ m.notMatchedActions).forall(actionResolved) =>
        targetPath(m.targetTable).map(p => convertMerge(m, p)).getOrElse(m)
      // INSERT INTO → append commit. The table field is NOT a child of
      // AppendData (V2WriteCommand.child = query), so the MoR relation
      // rewrite never touches it — no protection needed here.
      // `outputResolved` waits for ResolveOutputRelation to have ALIGNED
      // the query to the table schema (positional reorder + casts), so
      // the command's `query` always carries table-shaped rows
      case a @ AppendData(r: DataSourceV2Relation, query, _, _, _, _)
          if query.resolved && a.outputResolved =>
        targetPath(r).map(p => SnapshotInsertCommand(p, query,
          r.output.map(_.name), overwrite = false): LogicalPlan).getOrElse(a)
      // INSERT OVERWRITE TABLE → overwrite commit (full-table truncate
      // semantics only — the deleteExpr must be the literal TRUE Spark
      // plans for an unpartitioned static overwrite)
      case o @ OverwriteByExpression(r: DataSourceV2Relation, deleteExpr,
          query, _, _, _, _) if query.resolved && o.outputResolved =>
        targetPath(r).map { p =>
          val isTruncate = deleteExpr match {
            case org.apache.spark.sql.catalyst.expressions.Literal(true,
              org.apache.spark.sql.types.BooleanType) => true
            case _ => false
          }
          if (!isTruncate) throw new UnsupportedOperationException(
            "INSERT OVERWRITE on a snapshot table supports full-table " +
              s"overwrite only; got filter ${deleteExpr.sql} — use " +
              "DELETE FROM + INSERT INTO for partial rewrites")
          SnapshotInsertCommand(p, query, r.output.map(_.name),
            overwrite = true): LogicalPlan
        }.getOrElse(o)
      // CREATE TABLE … AS SELECT → first append commit of a NEW table
      // (the log has no schema-only commits, so the DDL surface is CTAS,
      // not bare CREATE TABLE — data defines the schema, as for the
      // DataFrame path's first append)
      case c @ CreateTableAsSelect(
          org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier(
            cat: SnapshotCatalog, ident), partitioning, query,
          spec: TableSpec, _, ignoreIfExists, _) if query.resolved =>
        ctasShapeCheck(partitioning, spec, "CREATE TABLE ... AS SELECT")
        SnapshotCtasCommand(cat.tablePath(ident), ident.name(), query,
          ignoreIfExists = ignoreIfExists, replace = false, orCreate = false)
      // [CREATE OR] REPLACE TABLE … AS SELECT → overwrite commit when the
      // table exists (history stays time-travelable), create otherwise
      case r @ ReplaceTableAsSelect(
          org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier(
            cat: SnapshotCatalog, ident), partitioning, query,
          spec: TableSpec, _, orCreate, _) if query.resolved =>
        ctasShapeCheck(partitioning, spec, "REPLACE TABLE ... AS SELECT")
        SnapshotCtasCommand(cat.tablePath(ident), ident.name(), query,
          ignoreIfExists = false, replace = true, orCreate = orCreate)
    }

  /** Snapshot tables are unpartitioned file-list tables rooted under the
    * catalog root — shapes the log cannot honor are refused with the
    * reason rather than silently dropped. */
  private def ctasShapeCheck(partitioning: Seq[_], spec: TableSpec,
      what: String): Unit = {
    def unsupported(why: String) = throw new UnsupportedOperationException(
      s"$what on a snapshot catalog: $why")
    if (partitioning.nonEmpty) unsupported(
      "PARTITIONED BY is not supported (snapshot tables are unpartitioned " +
        "file lists; use Z-order OPTIMIZE for layout)")
    if (spec.location.isDefined) unsupported(
      "LOCATION is not supported (the catalog root determines the path)")
    if (spec.properties.nonEmpty || spec.options.nonEmpty) unsupported(
      "TBLPROPERTIES/OPTIONS are not supported")
    if (spec.provider.exists(p => !p.equalsIgnoreCase("parquet")))
      unsupported(s"USING ${spec.provider.get} — snapshot tables are parquet")
  }

  private def actionResolved(a: MergeAction): Boolean = a match {
    case _: UpdateStarAction | _: InsertStarAction => true
    case other => other.resolved
  }

  /** MERGE INTO → [[SnapshotMergeCommand]]. Supported shape — the
    * latest-wins upsert the log's merge-on-read commit implements:
    * equi-join condition on same-named columns, `WHEN MATCHED THEN
    * UPDATE SET *` and/or `WHEN NOT MATCHED THEN INSERT *` (explicit
    * per-column forms must be the full identity mapping), no
    * NOT-MATCHED-BY-SOURCE clauses. Anything else is refused with the
    * precise reason rather than silently approximated. */
  private def convertMerge(m: MergeIntoTable, path: String): LogicalPlan = {
    def unsupported(why: String) = throw new UnsupportedOperationException(
      s"MERGE INTO on a snapshot table supports the latest-wins upsert " +
        s"shape only: $why")
    val targetOut = m.targetTable.output
    val sourceOut = m.sourceTable.output
    val targetIds = targetOut.map(_.exprId).toSet
    val sourceIds = sourceOut.map(_.exprId).toSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetIds(a.exprId) && sourceIds(b.exprId) && a.name == b.name =>
        a.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sourceIds(a.exprId) && targetIds(b.exprId) && a.name == b.name =>
        a.name
      case other => unsupported(
        s"merge condition must be equalities of same-named target/source " +
          s"columns, got ${other.sql}")
    }
    // every action must be (or expand to) the identity column mapping
    def identityOnly(assigns: Seq[Assignment], what: String): Unit =
      assigns.foreach { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference)
              if k.name == v.name && targetIds(k.exprId) &&
                sourceIds(v.exprId) => ()
          case _ => unsupported(
            s"$what must be `SET * `-equivalent (target.c = source.c), " +
              s"got ${a.sql}")
        }
      }
    m.notMatchedBySourceActions.foreach(_ =>
      unsupported("WHEN NOT MATCHED BY SOURCE is not supported"))
    val doUpdate = m.matchedActions match {
      case Nil => false
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, assigns, _)) =>
        identityOnly(assigns, "WHEN MATCHED UPDATE"); true
      case _ => unsupported(
        "matched clause must be a single unconditional UPDATE SET *")
    }
    val doInsert = m.notMatchedActions match {
      case Nil => false
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, assigns)) =>
        identityOnly(assigns, "WHEN NOT MATCHED INSERT"); true
      case _ => unsupported(
        "not-matched clause must be a single unconditional INSERT *")
    }
    if (!doUpdate && !doInsert)
      unsupported("at least one of UPDATE SET * / INSERT * is required")
    // the source must cover the target's columns so the staged delta has
    // the table's schema (extra source columns are projected away)
    val missing = targetOut.map(_.name).filterNot(
      sourceOut.map(_.name).toSet)
    if (missing.nonEmpty) unsupported(
      s"source lacks target column(s) ${missing.mkString(", ")}")
    SnapshotMergeCommand(path, m.sourceTable, targetOut.map(_.name),
      keys.distinct, updateOnly = !doInsert, insertOnly = !doUpdate)
  }
}

/** Answers a bare `count(*)` over a snapshot-catalog table from LOG
  * METADATA instead of a table scan (the Delta optimized-metadata-query
  * shape): a groupless Aggregate whose every output is an unfiltered
  * `count(1)`/`count(*)` over a [[SnapshotReadTable]] relation collapses
  * to a [[LocalRelation]] carrying the version's manifest row-count sum.
  * At 100 TB this turns the most common sanity query from a
  * million-file scan into O(log objects). Declines — leaving the scan
  * plan untouched — for filtered/grouped/column counts, versions with
  * positional deletes (live ≠ file counts; those versions are served as
  * [[SnapshotMoRTable]] and lowered at analysis anyway), and
  * pre-rowcount manifests. Runs as an operator-optimization rule, BEFORE
  * V2 scan planning, so the relation identity is still visible. */
case class SnapshotMetadataCount(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** `Some(count ⇒ output value)` for expressions this rule can answer
    * without a scan: an unfiltered `count(1)`/`count(*)`, or a plain
    * literal riding along in the select list (`SELECT 'live', count(*)`).
    * Anything touching actual rows → None, the scan plan stands. */
  private def constOrCount(e: org.apache.spark.sql.catalyst.expressions
      .NamedExpression): Option[Long => Any] = e match {
    case Alias(org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Count(
            Seq(l: org.apache.spark.sql.catalyst.expressions.Literal)),
          _, false, None, _), _) if l.value != null => Some(n => n)
    case Alias(l: org.apache.spark.sql.catalyst.expressions.Literal, _) =>
      Some(_ => l.value)
    case _ => None
  }

  private def snapshotIdentity(plan: LogicalPlan): Option[(String, Int)] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotReadTable => Some((t.path, t.snapVersion))
        case _ => None
      }
      // column pruning may have inserted a Project; row count is
      // projection-invariant (but NEVER skip a Filter)
      case Project(_, r: DataSourceV2Relation) => snapshotIdentity(r)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      // a groupless Aggregate emits exactly one row whatever the data,
      // so any all-(count|literal) select list is answerable
      case agg @ Aggregate(Nil, exprs, child, _)
          if exprs.nonEmpty && exprs.forall(constOrCount(_).isDefined) =>
        snapshotIdentity(child).flatMap { case (path, v) =>
          Snapshots.rowCountAt(spark, path, v).map { n =>
            LocalRelation(
              agg.output.map(_.asInstanceOf[AttributeReference]),
              Seq(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
                exprs.map(e => constOrCount(e).get(n)))))
          }
        }.getOrElse(agg)
    }
}

/** `DELETE FROM t WHERE cond` → [[Snapshots.deleteWhere]].
  *
  * Conditions/SET expressions are carried as [[Column]]s (opaque to
  * TreeNode), not Expressions: they are deliberately UNRESOLVED — spoken
  * by name so the command re-resolves them against its own fresh
  * era-aware scan — and as product Expressions CheckAnalysis would
  * reject them before the command ever ran. */
case class SnapshotDeleteCommand(path: String,
    cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Snapshots.deleteWhere(session, path, cond)
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE cond` → [[Snapshots.updateWhere]] (all SET
  * right-hand sides see pre-update values, SQL semantics — the log API's
  * own contract). */
case class SnapshotUpdateCommand(path: String,
    cond: org.apache.spark.sql.Column,
    sets: Seq[(String, org.apache.spark.sql.Column)])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Snapshots.updateWhere(session, path, cond, sets.toMap)
    Seq.empty
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE TABLE` → [[Snapshots.append]] /
  * [[Snapshots.overwrite]]: the analyzer has already aligned the query's
  * output to the table schema positionally (ResolveOutputRelation), so
  * the command only restores the table's column NAMES before the commit
  * stages it. One log version per statement, like every DML. */
case class SnapshotInsertCommand(path: String, query: LogicalPlan,
    targetCols: Seq[String], overwrite: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val df = GraftSqlBridge.ofRows(session, query).toDF(targetCols: _*)
    if (overwrite) Snapshots.overwrite(session, path, df)
    else Snapshots.append(session, path, df)
    Seq.empty
  }
}

/** `CREATE [OR REPLACE] TABLE … AS SELECT` → the table's first
  * [[Snapshots.append]] (create) or an [[Snapshots.overwrite]] commit
  * (replace of an existing table — prior versions stay time-travelable,
  * exactly like the DataFrame overwrite path). `IF NOT EXISTS` over an
  * existing table is a no-op that never evaluates the query. */
case class SnapshotCtasCommand(path: String, tableName: String,
    query: LogicalPlan, ignoreIfExists: Boolean, replace: Boolean,
    orCreate: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val exists = Snapshots.latestVersion(session, path).isDefined
    def df = GraftSqlBridge.ofRows(session, query)
    if (replace) {
      if (exists) Snapshots.overwrite(session, path, df)
      else if (orCreate) Snapshots.append(session, path, df)
      else throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(Seq(tableName))
    } else if (exists) {
      if (!ignoreIfExists) throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(Seq(tableName))
    } else Snapshots.append(session, path, df)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON …` → [[Snapshots.merge]] (latest-wins
  * upsert). `updateOnly` drops source rows with no target match (a
  * broadcast semi-join against the live view); `insertOnly` keeps only
  * unmatched rows (anti-join) so existing keys are never replaced. The
  * semi/anti relation is O(source) — the target side never shuffles. */
case class SnapshotMergeCommand(path: String, source: LogicalPlan,
    targetCols: Seq[String], keyCols: Seq[String],
    updateOnly: Boolean, insertOnly: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = GraftSqlBridge.ofRows(session, source)
      .select(targetCols.map(col): _*)
    val changes =
      if (insertOnly || updateOnly) {
        val live = Snapshots.readLatest(session, path).getOrElse(
          throw new IllegalStateException(
            s"MERGE INTO a never-committed snapshot table $path"))
          .select(keyCols.map(col): _*).distinct()
        src.join(live, keyCols, if (insertOnly) "left_anti" else "left_semi")
      } else src
    Snapshots.merge(session, path, changes, keyCols)
    Seq.empty
  }
}
