package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained MATERIALIZED VIEWS over snapshot tables —
  * the Databricks/Materialize feature the change feed exists FOR, made
  * first-class (q215 showed the fold by hand; this owns it):
  *
  *   CREATE MATERIALIZED VIEW cat.mv AS
  *     SELECT g1, …, COUNT(*) AS n, SUM(expr) AS s, … FROM cat.src
  *     [WHERE pred] GROUP BY g1, …
  *   REFRESH MATERIALIZED VIEW cat.mv
  *
  * The view definition is pinned in the MV's own table properties
  * (source path, SQL text, last folded source version), so the MV is
  * self-describing and survives any session. REFRESH reads ONE change
  * feed pass over `(lastVersion, current]` ([[Snapshots.changesBetween]],
  * O(changed files), never a base recompute), folds signed deltas —
  * insert adds, delete subtracts, an update's delete/insert pair moves
  * its row across groups — and publishes the merged view as the MV's
  * next version. Net-zero groups drop out; new groups appear. Cost is
  * O(feed + view) at any base-table size.
  *
  * Supported view shape (validated at CREATE, refused otherwise): a
  * single-table GROUP BY with plain-column grouping keys, exactly one
  * COUNT(*) (the liveness counter that drops dead groups), and any
  * number of SUM(expr) aggregates over INTEGRAL/DECIMAL expressions —
  * float sums are refused because subtracting feed deltas in floating
  * point drifts from the recompute, silently. Joins, DISTINCT,
  * AVG/MIN/MAX are out of scope: MIN/MAX are not incrementally
  * maintainable under deletes without per-group state, and AVG is
  * sum/count at read time.
  */
object MaterializedViews {

  val SourceKey = "graft.mv.source"
  val SqlKey = "graft.mv.sql"
  val LastVersionKey = "graft.mv.lastVersion"

  /** The parsed canonical view definition. `groupCols` are plain column
    * names; `sums` are (SUM argument SQL, output name). */
  final case class ViewDef(srcIdent: String, whereSql: Option[String],
      groupCols: Seq[String], countAlias: String,
      sums: Seq[(String, String)])

  private val ShapeRe =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s+GROUP\s+BY\s+(.*?)\s*;?\s*$""".r
  private val CountRe = """(?is)^COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)$""".r
  private val SumRe = """(?is)^SUM\s*\((.*)\)\s+AS\s+(\w+)$""".r
  private val IdentRe = """(?s)^\w+$""".r

  /** Split a select list on TOP-LEVEL commas (parens nest). */
  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur += ch
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse + validate the canonical shape; every refusal names the cure. */
  def parseViewSql(sql: String): ViewDef = sql match {
    case ShapeRe(items, src, where, group) =>
      val groupCols = group.split(",").map(_.trim)
      groupCols.foreach(g => require(IdentRe.matches(g),
        s"materialized views group by plain columns, got '$g' — " +
          "alias the expression in the source table instead"))
      var countAlias: Option[String] = None
      val sums = Seq.newBuilder[(String, String)]
      val plain = Seq.newBuilder[String]
      splitTop(items).foreach {
        case CountRe(a) =>
          require(countAlias.isEmpty, "exactly one COUNT(*) is required")
          countAlias = Some(a)
        case SumRe(e, a) => sums += ((e.trim, a))
        case it if IdentRe.matches(it) => plain += it
        case other => throw new IllegalArgumentException(
          s"unsupported select item '$other' — materialized views take " +
            "group columns, one COUNT(*) AS …, and SUM(expr) AS …")
      }
      require(plain.result().sorted == groupCols.toSeq.sorted,
        "select-list columns must be exactly the GROUP BY columns")
      require(countAlias.nonEmpty,
        "a COUNT(*) AS … aggregate is required (it drops dead groups)")
      ViewDef(src, Option(where).map(_.trim), groupCols.toSeq,
        countAlias.get, sums.result())
    case _ => throw new IllegalArgumentException(
      "materialized view SQL must be SELECT … FROM one-table " +
        "[WHERE …] GROUP BY … (no joins, no HAVING)")
  }

  private def aggColumns(d: ViewDef, sign: Option[Column]): Seq[Column] = {
    val one = sign.getOrElse(lit(1L))
    sum(one).as(d.countAlias) +:
      d.sums.map { case (e, a) => sum(one * expr(e)).as(a) }
  }

  private def viewAt(spark: SparkSession, d: ViewDef, srcPath: String,
      v: Int): DataFrame = {
    val base = Snapshots.readAt(spark, srcPath, v).get
    val filtered = d.whereSql.map(w => base.filter(expr(w))).getOrElse(base)
    val aggs = aggColumns(d, None)
    val out = filtered.groupBy(d.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // float SUM deltas drift from the recompute when subtracted — the
    // whole point of an MV is exact equivalence, so refuse at CREATE
    d.sums.foreach { case (_, a) =>
      out.schema(a).dataType match {
        case ByteType | ShortType | IntegerType | LongType |
            _: DecimalType => ()
        case t => throw new IllegalArgumentException(
          s"SUM AS $a has type ${t.simpleString}: incremental " +
            "maintenance needs an integral/decimal expression " +
            "(aggregate exact cents/units, divide at read time)")
      }
    }
    out
  }

  /** CREATE: materialize the view at the source's CURRENT main head and
    * pin (source, sql, lastVersion) as MV table properties. Returns the
    * MV's published version. */
  def create(spark: SparkSession, mvPath: String, srcPath: String,
      viewSql: String): Int = {
    val d = parseViewSql(viewSql)
    require(Snapshots.latestVersion(spark, mvPath).isEmpty,
      s"materialized view target $mvPath already has versions")
    val v = Snapshots.mainHeadVersion(spark, srcPath).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view source $srcPath has no versions"))
    Snapshots.overwrite(spark, mvPath, viewAt(spark, d, srcPath, v),
      propUpdates = Map(SourceKey -> srcPath, SqlKey -> viewSql.trim,
        LastVersionKey -> v.toString))
  }

  /** REFRESH: fold the change feed `(lastVersion, current]` into the
    * stored view — one O(feed) pass, one O(view) overwrite commit.
    * Returns the MV version serving the refreshed state (unchanged when
    * the source hasn't moved — a no-op refresh publishes nothing). */
  def refresh(spark: SparkSession, mvPath: String): Int = {
    val props = Snapshots.tableProperties(spark, mvPath)
    val srcPath = props.getOrElse(SourceKey, throw new IllegalArgumentException(
      s"$mvPath is not a materialized view (no $SourceKey property)"))
    val d = parseViewSql(props(SqlKey))
    val last = props(LastVersionKey).toInt
    val cur = Snapshots.mainHeadVersion(spark, srcPath).get
    if (cur == last) return Snapshots.latestVersion(spark, mvPath).get
    val feed = Snapshots.changesBetween(spark, srcPath, last, cur).get
    val filtered = d.whereSql.map(w => feed.filter(expr(w))).getOrElse(feed)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val signedAggs = aggColumns(d, Some(sign))
    val delta = filtered.groupBy(d.groupCols.map(col): _*)
      .agg(signedAggs.head, signedAggs.tail: _*)
    val names = d.countAlias +: d.sums.map(_._2)
    val old = Snapshots.readLatest(spark, mvPath).get
    // null-SAFE join on the group keys: a NULL grouping key must match
    // itself across old/delta or the NULL-keyed group splits into a
    // stale old row plus a delta-only row, silently drifting from the
    // recompute the class promises to equal
    val deltaRenamed = delta.select(
      d.groupCols.map(g => col(g).as(s"_d_g_$g")) ++
        names.map(n => col(n).as(s"_d_$n")): _*)
    val joinCond = d.groupCols
      .map(g => old(g) <=> deltaRenamed(s"_d_g_$g")).reduce(_ && _)
    val merged = old.join(deltaRenamed, joinCond, "full_outer")
      .select(d.groupCols.map(g =>
          coalesce(col(g), col(s"_d_g_$g")).as(g)) ++
        names.map(n =>
          (coalesce(col(n), lit(0L)) + coalesce(col(s"_d_$n"), lit(0L)))
            .as(n)): _*)
      .filter(col(d.countAlias) > 0)
    // the refresh frontier advances IN the data commit: a crash can
    // never leave a folded view with a stale frontier (which would
    // re-fold the same feed and double-count on the next refresh)
    Snapshots.overwrite(spark, mvPath, merged,
      propUpdates = Map(LastVersionKey -> cur.toString))
  }
}
