package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

import graft.lake.Snapshots

/** SQL MAINTENANCE surface for snapshot tables — the three lifecycle
  * statements every lakehouse ships beside DML (Delta's `OPTIMIZE` /
  * `VACUUM` / `CREATE TABLE … SHALLOW CLONE`), parsed by a delegating
  * [[GraftSqlParser]] injected via `SparkSessionExtensions.injectParser`
  * and executed as driver commands over [[Snapshots]]:
  *
  * {{{
  * CREATE TABLE cat.dst SHALLOW CLONE cat.src [VERSION AS OF n]
  * OPTIMIZE cat.t
  * VACUUM cat.t RETAIN n VERSIONS / RETAIN n HOURS
  * ALTER TABLE cat.t SET PARTITION SPEC (bucket(8, c), days(d))
  * ALTER TABLE cat.t CREATE BRANCH b [AS OF VERSION n]
  * ALTER TABLE cat.t CREATE TAG g [AS OF VERSION n]
  * ALTER TABLE cat.t DROP BRANCH b / DROP TAG g
  * ALTER TABLE cat.t FAST FORWARD BRANCH b
  * ALTER TABLE cat.t ALTER COLUMN c SET DEFAULT expr / DROP DEFAULT
  * }}}
  *
  * Table names are CATALOG-QUALIFIED and resolve through the SAME
  * `spark.sql.catalog.<name>.root` configuration the
  * [[graft.lake.SnapshotCatalog]] reads — one registration serves
  * reads, DML (SnapshotSqlRules) and maintenance. Anything that is not
  * one of these three statements falls through verbatim to Spark's own
  * parser: the interception is a full-match on syntax Spark has no
  * grammar for, so no standard SQL ever changes meaning. Commands
  * return the resulting version as a one-row relation, the Delta
  * convention. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val CloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r
  private val TruncateRe =
    """(?is)^\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*;?\s*$""".r
  private val DeepCloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.]+)\s+DEEP\s+CLONE\s+([\w.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s*;?\s*$""".r
  private val MaintainRe =
    """(?is)^\s*MAINTAIN\s+([\w.]+)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+|'[A-Za-z0-9._-]+')\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+VERSIONS\s*;?\s*$""".r
  private val VacuumDryRe =
    """(?is)^\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+VERSIONS\s+DRY\s+RUN\s*;?\s*$""".r
  private val OptimizeZorderRe =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+ZORDER\s+BY\s*\((.*)\)\s*;?\s*$""".r
  private val VacuumHoursRe =
    """(?is)^\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+HOURS\s*;?\s*$""".r
  private val AlterSpecRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+PARTITION\s+SPEC\s*\((.*)\)\s*;?\s*$""".r
  // ref DDL (the Iceberg Spark-extension ALTER TABLE ref statements):
  // branches/tags create at an explicit version or the current main head
  private val CreateBranchRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+BRANCH\s+([A-Za-z0-9._-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""".r
  private val DropBranchRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+BRANCH\s+([A-Za-z0-9._-]+)\s*;?\s*$""".r
  private val CreateTagRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+TAG\s+([A-Za-z0-9._-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""".r
  private val DropTagRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+TAG\s+([A-Za-z0-9._-]+)\s*;?\s*$""".r
  private val FastForwardRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+FAST\s+FORWARD\s+BRANCH\s+([A-Za-z0-9._-]+)\s*;?\s*$""".r
  // CHECK constraint DDL (the Delta statements): existing data is
  // validated at ADD (refuses naming the violation count), versions
  // below a DROP still carry the constraint — q205's semantics over SQL
  private val AddConstraintRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+([A-Za-z0-9._-]+)\s+CHECK\s*\((.*)\)\s*;?\s*$""".r
  private val DropConstraintRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+CONSTRAINT\s+([A-Za-z0-9._-]+)\s*;?\s*$""".r
  // materialized views (the Databricks statements; the canonical-shape
  // view SQL is validated by graft.lake.MaterializedViews.parseViewSql,
  // whose FROM table is resolved against the SAME catalog confs)
  private val CreateMvRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+(SELECT\s.+)$""".r
  private val RefreshMvRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*;?\s*$""".r
  // column DEFAULT DDL. Spark HAS grammar for these two (V2 ALTER
  // COLUMN), so unlike every other intercept they match only when the
  // catalog is a REGISTERED snapshot catalog and fall through verbatim
  // otherwise — standard SQL against other catalogs keeps its meaning.
  // the Delta idempotent-loader statement: source-identity ledger rides
  // the commit, so a re-run against an unchanged directory loads zero
  private val CopyIntoRe =
    """(?is)^\s*COPY\s+INTO\s+([\w.]+)\s+FROM\s+'([^']+)'(?:\s+FILEFORMAT\s*=\s*PARQUET)?\s*;?\s*$""".r
  // lineage discoverability (the Delta DESCRIBE HISTORY statement).
  // Spark parses `DESCRIBE HISTORY t` as DESCRIBE COLUMN `t` of table
  // `HISTORY`, so like TRUNCATE this matches only under a registered
  // snapshot catalog and falls through verbatim otherwise.
  private val DescribeHistoryRe =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.]+)\s*;?\s*$""".r
  // table statistics discoverability (the Trino SHOW STATS statement):
  // served from the log's manifest rows/sizes and sketch sidecars —
  // zero data scan. Guarded like DESCRIBE HISTORY: only under a
  // registered snapshot catalog.
  private val ShowStatsRe =
    """(?is)^\s*SHOW\s+STATS\s+(?:FOR\s+)?([\w.]+)\s*;?\s*$""".r
  // RESTORE by wall clock — resolved through the same monotone
  // in-commit-timestamp index TIMESTAMP AS OF reads use (q182)
  private val RestoreTsRe =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  // VACUUM retention by wall clock: reclaim versions strictly older
  // than the cutoff (the RETAIN n HOURS arithmetic, explicit instant)
  private val VacuumTsRe =
    """(?is)^\s*VACUUM\s+([\w.]+)\s+BEFORE\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  private val SetDefaultRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*$""".r
  private val DropDefaultRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+DEFAULT\s*;?\s*$""".r

  /** The statement's transform list → the log's transform-encoded spec
    * strings: split at depth-0 commas so `bucket(8, c), days(d)` parses
    * as two entries, then strip ALL whitespace (entry grammar is
    * `\w`-only, so blanks are never load-bearing); `()` declares an
    * EMPTY spec — subsequent writes stop clustering. Entry validity
    * itself is [[Snapshots.setPartitionSpec]]'s job (one validator for
    * SQL and API callers). */
  private def splitSpec(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur += ch
    }
    require(depth == 0, s"unbalanced parentheses in partition spec ($body)")
    out += cur.toString
    out.result().map(_.replaceAll("\\s+", "")).filter(_.nonEmpty)
  }

  /** `cat.ns….name` → `<root>/<ns…>/<name>`, mirroring
    * [[graft.lake.SnapshotCatalog.tablePath]]. */
  private def path(ident: String): String = {
    val parts = ident.split("\\.")
    require(parts.length >= 2,
      s"maintenance SQL needs a catalog-qualified table name, got '$ident'")
    val root = session.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
      .getOrElse(throw new IllegalArgumentException(
        s"'${parts.head}' is not a registered snapshot catalog " +
          s"(spark.sql.catalog.${parts.head}.root is unset)"))
    parts.tail.mkString(s"$root/", "/", "")
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateMvRe(mv, view) =>
      CreateMaterializedViewCommand(path(mv), view.trim)
    case RefreshMvRe(mv) => RefreshMaterializedViewCommand(path(mv))
    case AddConstraintRe(t, n, check) =>
      AddConstraintCommand(path(t), n, check.trim)
    case DropConstraintRe(t, n) => DropConstraintCommand(path(t), n)
    case CloneRe(dst, src, ver) =>
      ShallowCloneCommand(path(src), path(dst), Option(ver).map(_.toInt))
    case DeepCloneRe(dst, src, ver) =>
      DeepCloneCommand(path(src), path(dst), Option(ver).map(_.toInt))
    case TruncateRe(t) if snapshotPath(t).isDefined =>
      TruncateTableCommand(snapshotPath(t).get)
    case OptimizeRe(t) => OptimizeTableCommand(path(t))
    case OptimizeZorderRe(t, cols) =>
      OptimizeZorderCommand(path(t), splitSpec(cols))
    case MaintainRe(t) => MaintainTableCommand(path(t))
    case CopyIntoRe(t, src) => CopyIntoCommand(path(t), src)
    case DescribeHistoryRe(t) if snapshotPath(t).isDefined =>
      DescribeHistoryCommand(snapshotPath(t).get)
    case ShowStatsRe(t) if snapshotPath(t).isDefined =>
      ShowStatsCommand(snapshotPath(t).get)
    case RestoreRe(t, v) => RestoreTableCommand(path(t), v)
    case RestoreTsRe(t, ts) => RestoreTableTimestampCommand(path(t), ts)
    case VacuumTsRe(t, ts) => VacuumBeforeTimestampCommand(path(t), ts)
    case VacuumDryRe(t, n) => VacuumDryRunCommand(path(t), n.toInt)
    case VacuumRe(t, n) => VacuumTableCommand(path(t), n.toInt)
    case VacuumHoursRe(t, n) => VacuumHoursCommand(path(t), n.toInt)
    case AlterSpecRe(t, body) => SetPartitionSpecCommand(path(t), splitSpec(body))
    case CreateBranchRe(t, n, v) =>
      CreateRefCommand(path(t), n, Option(v).map(_.toInt), isTag = false)
    case DropBranchRe(t, n) => DropRefCommand(path(t), n, isTag = false)
    case CreateTagRe(t, n, v) =>
      CreateRefCommand(path(t), n, Option(v).map(_.toInt), isTag = true)
    case DropTagRe(t, n) => DropRefCommand(path(t), n, isTag = true)
    case FastForwardRe(t, n) => FastForwardCommand(path(t), n)
    case SetDefaultRe(t, c, e) if snapshotPath(t).isDefined =>
      SetColumnDefaultCommand(snapshotPath(t).get, c, e)
    case DropDefaultRe(t, c) if snapshotPath(t).isDefined =>
      DropColumnDefaultCommand(snapshotPath(t).get, c)
    case _ => delegate.parsePlan(sqlText)
  }

  /** [[path]] that declines (None) instead of throwing when the name is
    * not catalog-qualified under a registered snapshot catalog — for
    * intercepts of syntax Spark ALSO parses, where a non-match must
    * fall through to the delegate rather than error. */
  private def snapshotPath(ident: String): Option[String] = {
    val parts = ident.split("\\.")
    if (parts.length < 2) None
    else session.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
      .map(root => parts.tail.mkString(s"$root/", "/", ""))
  }

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

private[plans] trait VersionOutput { self: LeafRunnableCommand =>
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** SQL timestamp-literal forms the wall-clock statements accept,
  * normalized to epoch millis: bare digits (epoch millis), an ISO-8601
  * instant (`…Z` / explicit offset), or a local `yyyy-MM-dd[ HH:mm:ss]`
  * read at UTC — the session timezone every graft session pins. */
private[plans] object SqlTimestamps {
  def parseMillis(s: String): Long = {
    val t = s.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else if (t.endsWith("Z") || t.drop(10).exists(c => c == '+')) // offset
      java.time.OffsetDateTime.parse(t.replace(' ', 'T'))
        .toInstant.toEpochMilli
    else if (t.length <= 10)
      java.time.LocalDate.parse(t).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }
}

/** `COPY INTO cat.t FROM '<dir>' [FILEFORMAT = PARQUET]` →
  * [[Snapshots.copyInto]] (the Delta idempotent-loader statement):
  * parquet files under the source directory whose identity (name:size)
  * no LIVE log version recorded are loaded through the normal write
  * path; the loaded identities ride INSIDE the commit object, so data
  * and ledger are one atomic publish and a re-run against an unchanged
  * directory loads ZERO files and burns no version. Returns the serving
  * version and the count of files this run loaded. */
case class CopyIntoCommand(table: String, srcDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, n) = Snapshots.copyInto(spark, table, srcDir)
    Seq(Row(v.toLong, n.toLong))
  }
}

/** `DESCRIBE HISTORY cat.t` → [[Snapshots.history]] (the Delta
  * statement, completing the q315 discoverability pair: SHOW CREATE
  * shows the shape, HISTORY the lineage). One row per version straight
  * from the log's commit records — O(versions) KB driver metadata,
  * never a data scan. */
case class DescribeHistoryCommand(table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Snapshots.HistorySchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(spark: SparkSession): Seq[Row] =
    Snapshots.history(spark, table).collect().toSeq
}

/** `SHOW STATS [FOR] cat.t` → [[Snapshots.showStats]] (the Trino
  * statement): per-declared-column distinct estimates and exact null
  * counts from the q323 sketch sidecars, plus a summary row with the
  * live row count and byte size — all LOG metadata, zero data scan.
  * NULL cells where the log honestly declines. */
case class ShowStatsCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Snapshots.ShowStatsSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(spark: SparkSession): Seq[Row] =
    Snapshots.showStats(spark, table).collect().toSeq
}

/** `RESTORE TABLE cat.t TO TIMESTAMP AS OF '<ts>'` — the wall-clock
  * restore: the instant resolves to the latest main version at or
  * before it through the SAME monotone in-commit-timestamp index
  * `TIMESTAMP AS OF` reads use (strictly increasing commit timestamps
  * make the answer unique), then restores exactly like the version
  * form. Returns the new version. */
case class RestoreTableTimestampCommand(table: String, ts: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val millis = SqlTimestamps.parseMillis(ts)
    val v = Snapshots.versionAtTimestamp(spark, table, millis)
      .getOrElse(throw new IllegalArgumentException(
        s"RESTORE: no version of $table at or before timestamp '$ts'"))
    Seq(Row(Snapshots.restore(spark, table, v).toLong))
  }
}

/** `VACUUM cat.t BEFORE TIMESTAMP AS OF '<ts>'` →
  * [[Snapshots.vacuumOlderThan]] at an explicit instant (the RETAIN n
  * HOURS arithmetic with the cutoff named instead of computed).
  * Returns the cutoff millis used. */
case class VacuumBeforeTimestampCommand(table: String, ts: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val cutoff = SqlTimestamps.parseMillis(ts)
    Snapshots.vacuumOlderThan(spark, table, cutoff)
    Seq(Row(cutoff))
  }
}

/** `RESTORE TABLE cat.t TO VERSION AS OF n|'ref'` →
  * [[Snapshots.restore]] (the Delta RESTORE statement): one
  * metadata-only commit re-publishing the target version's exact
  * content — by number, or by tag/branch name in quotes (the same
  * ref resolution VERSION AS OF reads use). Returns the new version. */
case class RestoreTableCommand(table: String, target: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = target.toIntOption.getOrElse {
      val ref = target.stripPrefix("'").stripSuffix("'")
      Snapshots.tagVersion(spark, table, ref)
        .orElse(Snapshots.branchHead(spark, table, ref))
        .getOrElse(throw new IllegalArgumentException(
          s"RESTORE: '$ref' is neither a tag nor a branch of $table"))
    }
    Seq(Row(Snapshots.restore(spark, table, v).toLong))
  }
}

/** `MAINTAIN cat.t` — apply the table's own declared upkeep policy
  * ([[Snapshots.maintainTable]]: optimize / rewrite-manifests / vacuum
  * as its `graft.maintain.*` properties direct, in dependency order).
  * Returns the count of actions taken — 0 for a table that declared no
  * policy, so a cron can blindly MAINTAIN everything. */
case class MaintainTableCommand(table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_actions", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    // data-table upkeep, then the ANN-index family's declared repair
    // (graft.similarity.Similarity.maintainIndex — empty for a
    // non-index path), so one statement maintains EITHER kind and a
    // cron stays blind to which it is
    Seq(Row((Snapshots.maintainTable(spark, table) ++
      graft.similarity.Similarity.maintainIndex(spark, table))
      .size.toLong))
}

/** `OPTIMIZE cat.t ZORDER BY (c1, c2, …)` → [[Snapshots.optimize]]'s
  * small-file fold laid out along the multi-column Morton curve
  * ([[graft.lake.ZOrder]]), with the z-order columns' tightened
  * intervals recorded for pruning — the Delta OPTIMIZE ZORDER
  * statement. Returns the new version, −1 when nothing was small
  * enough to fold. */
case class OptimizeZorderCommand(table: String, cols: Seq[String])
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    // output sizing comes from table config, like Delta's
    // maxFileSize — the statement names only the layout
    val target = Snapshots.tableProperties(spark, table)
      .get("graft.optimize.targetBytes").flatMap(_.toLongOption)
      .getOrElse(128L << 20)
    Seq(Row(Snapshots.optimizeZorder(spark, table, cols, target)
      .map(_.toLong).getOrElse(-1L)))
  }
}

/** `VACUUM cat.t RETAIN n VERSIONS DRY RUN` →
  * [[Snapshots.vacuumDryRun]]: one row per path a real vacuum at that
  * horizon would reclaim, nothing touched — the look-before-the-
  * irreversible-step statement. */
case class VacuumDryRunCommand(table: String, retain: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference(
    "path", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val latest = Snapshots.latestVersion(spark, table).getOrElse(0)
    val keepFrom = math.max(1, latest - retain + 1)
    Snapshots.vacuumDryRun(spark, table, keepFrom).map(Row(_))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]` →
  * [[Snapshots.shallowClone]]; returns the clone's (always 1) version. */
case class ShallowCloneCommand(src: String, dst: String,
    version: Option[Int]) extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.shallowClone(spark, src, dst, version).toLong))
}

/** `ALTER TABLE t SET PARTITION SPEC (bucket(8, c), days(d))` →
  * [[Snapshots.setPartitionSpec]] — PARTITION-SPEC EVOLUTION as one
  * metadata-only commit (the Iceberg `REPLACE PARTITION FIELD` shape):
  * no data rewritten, old files keep the transform stats of the spec
  * they were written under, subsequent writes cluster by the new spec.
  * Spark has no grammar for this form, so the full-match interception
  * changes no standard ALTER TABLE meaning. Returns the published
  * metadata version. */
case class SetPartitionSpecCommand(table: String, spec: Seq[String])
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.setPartitionSpec(spark, table, spec).toLong))
}

/** `OPTIMIZE t` → [[Snapshots.optimize]] (full live rewrite; the
  * targeted forms stay API-side knobs). Returns the published version,
  * or -1 when the table is empty and nothing was committed. */
case class OptimizeTableCommand(table: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.optimize(spark, table).map(_.toLong).getOrElse(-1L)))
}

/** `ALTER TABLE t CREATE BRANCH|TAG name [AS OF VERSION n]` →
  * [[Snapshots.createBranch]] / [[Snapshots.createTag]] (the Iceberg
  * ref-DDL shape); defaults to the current MAIN head. Returns the
  * version the ref was pinned/rooted at. */
case class CreateRefCommand(table: String, name: String,
    version: Option[Int], isTag: Boolean)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = version.orElse(Snapshots.mainHeadVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot table at $table"))
    if (isTag) Snapshots.createTag(spark, table, name, v)
    else Snapshots.createBranch(spark, table, name, v)
    Seq(Row(v.toLong))
  }
}

/** `ALTER TABLE t DROP BRANCH|TAG name` → [[Snapshots.dropBranch]] /
  * [[Snapshots.dropTag]]. Returns the version the ref last addressed
  * (now unpinned), or -1 if the ref did not exist. */
case class DropRefCommand(table: String, name: String, isTag: Boolean)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val was =
      if (isTag) Snapshots.tagVersion(spark, table, name)
      else Snapshots.branchHead(spark, table, name)
    if (isTag) Snapshots.dropTag(spark, table, name)
    else Snapshots.dropBranch(spark, table, name)
    Seq(Row(was.map(_.toLong).getOrElse(-1L)))
  }
}

/** `ALTER TABLE t FAST FORWARD BRANCH b` → [[Snapshots.fastForwardMain]]
  * (the WAP publish); returns the new main version. */
case class FastForwardCommand(table: String, branch: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.fastForwardMain(spark, table, branch).toLong))
}

/** `ALTER TABLE t ALTER COLUMN c SET DEFAULT expr` →
  * [[Snapshots.setColumnDefault]] (initial-default semantics: rows in
  * files not carrying `c` read `expr`); returns the published version. */
case class SetColumnDefaultCommand(table: String, column: String,
    defaultSql: String) extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.setColumnDefault(spark, table, column,
      defaultSql).toLong))
}

/** `ALTER TABLE t ALTER COLUMN c DROP DEFAULT` →
  * [[Snapshots.dropColumnDefault]]; returns the published version. */
case class DropColumnDefaultCommand(table: String, column: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.dropColumnDefault(spark, table, column).toLong))
}

/** `VACUUM t RETAIN n HOURS` → [[Snapshots.vacuumOlderThan]] (the
  * Delta retention shape over this log's strictly-monotone commit
  * timestamps); returns the cutoff timestamp used. */
case class VacuumHoursCommand(table: String, hours: Int)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val cutoff = System.currentTimeMillis() - hours * 3600L * 1000L
    Snapshots.vacuumOlderThan(spark, table, cutoff)
    Seq(Row(cutoff))
  }
}

/** `VACUUM t RETAIN n VERSIONS` → [[Snapshots.vacuum]] keeping the
  * latest `n` versions; returns the oldest version retained. */
case class VacuumTableCommand(table: String, retain: Int)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    require(retain >= 1, s"RETAIN $retain VERSIONS: must keep at least 1")
    val latest = Snapshots.latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshot table at $table"))
    val keepFrom = math.max(1, latest - retain + 1)
    Snapshots.vacuum(spark, table, keepFrom)
    Seq(Row(keepFrom.toLong))
  }
}

/** `CREATE MATERIALIZED VIEW cat.mv AS SELECT …` →
  * [[graft.lake.MaterializedViews.create]]: the view materializes at
  * the source's current head and its definition pins itself in the
  * MV's table properties. The view SQL's FROM table resolves against
  * the same `spark.sql.catalog.<name>.root` confs the parser uses.
  * Returns the MV's published version. */
case class CreateMaterializedViewCommand(mv: String, viewSql: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] = {
    val d = graft.lake.MaterializedViews.parseViewSql(viewSql)
    val parts = d.srcIdent.split("\\.")
    require(parts.length >= 2, "materialized view sources need a " +
      s"catalog-qualified table name, got '${d.srcIdent}'")
    val root = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
      .getOrElse(throw new IllegalArgumentException(
        s"'${parts.head}' is not a registered snapshot catalog"))
    val src = parts.tail.mkString(s"$root/", "/", "")
    Seq(Row(graft.lake.MaterializedViews
      .create(spark, mv, src, viewSql).toLong))
  }
}

/** `REFRESH MATERIALIZED VIEW cat.mv` →
  * [[graft.lake.MaterializedViews.refresh]]: one change-feed pass over
  * the source versions since the last refresh, folded into the stored
  * view — O(feed + view), never a base recompute. Returns the MV
  * version serving the refreshed state. */
case class RefreshMaterializedViewCommand(mv: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.lake.MaterializedViews.refresh(spark, mv).toLong))
}

/** `ALTER TABLE cat.t ADD CONSTRAINT name CHECK (expr)` →
  * [[Snapshots.addConstraint]] (the Delta statement): existing data is
  * validated first — a violated ADD refuses naming the row count, no
  * version burned. Returns the new version. */
case class AddConstraintCommand(table: String, name: String,
    checkSql: String) extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.addConstraint(spark, table, name, checkSql).toLong))
}

/** `ALTER TABLE cat.t DROP CONSTRAINT name` →
  * [[Snapshots.dropConstraint]]; versions below the drop still carry
  * the constraint (time travel shows the set in force at each
  * version). Returns the new version. */
case class DropConstraintCommand(table: String, name: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.dropConstraint(spark, table, name).toLong))
}

/** `CREATE TABLE dst DEEP CLONE src [VERSION AS OF n]` →
  * [[Snapshots.deepClone]]: a physically independent copy of the live
  * view + the declared metadata that governs future writes — survives
  * the source's deletion entirely (the DR contract a shallow clone
  * cannot give). Returns dst's version. */
case class DeepCloneCommand(src: String, dst: String, version: Option[Int])
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.deepClone(spark, src, dst, version).toLong))
}

/** `TRUNCATE TABLE cat.t` → one METADATA-ONLY commit whose manifest
  * list is empty: zero files touched at any size, the live view goes
  * empty, every prior version stays time-travelable (vacuum reclaims
  * bytes on its own schedule — exactly a DELETE-all without the scan).
  * Spark HAS grammar for TRUNCATE, so like the column-default
  * intercepts this matches only under a registered snapshot catalog.
  * Returns the new version. */
case class TruncateTableCommand(table: String)
    extends LeafRunnableCommand with VersionOutput {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.truncate(spark, table).toLong))
}
