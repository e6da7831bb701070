package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSessionExtensions

/** Whole-operator Catalyst extension: a native as-of (latest-prior) join.
  *
  * The compositional form (`graft.operators.AsOfJoin`: union + keyed
  * time-ordered window carry) is semantically identical, but pays for a
  * union materialization, null padding on both struct sides, and a window
  * operator whose frame machinery is general-purpose. This is the
  * purpose-built physical plan a native engine would run: both sides
  * hash-partitioned on the key and sorted by (key, time), then one
  * streaming merge pass per partition — no buffering beyond a single
  * carried right row, O(|L|+|R|) per partition, and the shuffle/sort is
  * Spark's own exchange machinery (AQE-planned, spillable).
  *
  * Wiring: [[AsOfJoinPlan]] (logical) → [[AsOfJoinStrategy]] (planner
  * strategy, injected via [[GraftExtensions]] /
  * `spark.sql.extensions`) → [[AsOfJoinExec]] (physical merge).
  *
  * Semantics (same contract as the compositional operator): for every left
  * row, attach the right row with the greatest right-time ≤ left-time
  * (inclusive) within the same key; right's key column is dropped from the
  * output; unmatched left rows carry nulls. Multiple right rows sharing
  * (key, time) are the caller's ambiguity — dedupe first.
  */
object NativeAsOfJoin {

  /** Left as-of join via the custom physical operator. Output columns: all
    * of `left`, then `right`'s columns minus the key.
    *
    * `strict = true` matches the latest right row strictly BEFORE the left
    * time (`rt < lt`) instead of at-or-before (`rt <= lt`) — DuckDB's
    * `ASOF JOIN ... ON rt < lt` form. */
  def latestPrior(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      strict: Boolean = false): DataFrame = {
    // Self-healing registration: sessions built via GraftSession get the
    // strategy through spark.sql.extensions; any other session would
    // otherwise die at action time deep in the planner with no hint.
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = GraftSqlBridge.analyzed(left)
    // Re-alias the right side with fresh exprIds so self-joins (left and
    // right derived from the same source) never carry conflicting
    // attribute ids into the join node.
    val rAnalyzed = GraftSqlBridge.analyzed(right)
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"$side column '$name' not in ${out.map(_.name).mkString(", ")}"))
    val rOut = rAliases.map(_.toAttribute)
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan.output, key, "left"), attr(rOut, key, "right"),
        attr(lPlan.output, leftTime, "left"), attr(rOut, rightTime, "right"),
        strict))
  }

  /** As-of join bounded by a tolerance: the matched right row must also
    * satisfy `rightTime >= leftTime - tolerance` (DuckDB has no WITHIN
    * clause, so both engines express the bound the same way: as-of join,
    * then null out matches older than the window). Implemented as a
    * projection over [[latestPrior]] — the right time column survives the
    * join (only the right KEY is dropped), so the bound is a codegen'd
    * row-local `when`, no second join or window. `leftTime`/`rightTime`
    * must be distinct column names (they already must be for the join
    * output to be unambiguous). */
  def latestPriorWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      tolerance: org.apache.spark.sql.Column,
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    // materialize the bound once BEFORE rewriting any right column (the
    // rewrite loop would otherwise change what `rightTime` refers to)
    val flag = "__asof_within"
    val joined = latestPrior(left, right, key, leftTime, rightTime, strict)
      .withColumn(flag, col(rightTime) >= col(leftTime) - tolerance)
    right.columns.filterNot(_ == key).foldLeft(joined)((d, c) =>
        d.withColumn(c, when(col(flag), col(c))))
      .drop(flag)
  }
}

/** Logical as-of join node; constructed already-resolved from analyzed
  * child plans. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    strict: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(_.exprId == rightKey.exprId)
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; everything else passes
  * through untouched. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict) :: Nil
    case _ => Nil
  }
}

/** Session-extensions entry point: registered by default through
  * `spark.sql.extensions=graft.plans.GraftExtensions` (see
  * [[graft.GraftSession]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL maintenance statements (SHALLOW CLONE / OPTIMIZE / VACUUM) —
    // full-match interception, everything else delegates verbatim
    e.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
    // snapshot-log SQL surface: DML statements first (they consume the
    // relation), then merge-on-read/renamed relation lowering
    e.injectResolutionRule(session => SnapshotDmlRewrite(session))
    e.injectResolutionRule(session => SnapshotRelationRewrite(session))
    // the Delta CDF table-valued function (Spark has no TVF hook, so
    // resolution-rule it): SELECT ... FROM table_changes('cat.t', a, b)
    e.injectResolutionRule(session => TableChangesResolution(session))
    // count(*)/min/max from log metadata — optimizer-side so EXPLAIN of
    // the analyzed plan still shows the relation, mirroring Delta
    e.injectOptimizerRule(session => SnapshotMetadataCount(session))
    // log-stats file pruning for filtered catalog scans (data skipping)
    e.injectOptimizerRule(session => SnapshotScanPruning(session))
  }
}

/** Physical as-of join: children hash-clustered on the key and sorted by
  * (key, time) — Spark inserts the exchanges/sorts — then a single forward
  * merge pass per co-partition carrying the latest matching right row. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    strict: Boolean = false) extends BinaryExecNode {

  private def rightValues: Seq[Attribute] =
    right.output.filterNot(_.exprId == rightKey.exprId)

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val rVals = rightValues
    val (lKey, rKey, lTime, rTime) = (leftKey, rightKey, leftTime, rightTime)
    val (keyType, timeType) = (lKey.dataType, lTime.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // built per partition: generated ordering/projection classes are not
      // serializable, only the attributes/dataTypes they derive from are
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lKey), lOut)
      val lTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lTime), lOut)
      val rKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rKey), rOut)
      val rTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rTime), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      // the right-value inputs MUST be bound nullable: unmatched left rows
      // substitute an all-null row, and binding against the children's
      // original nullable=false attributes would skip the generated null
      // checks (null unboxes to 0 for primitives)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rVals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rVals.size)
      // rHead stays valid until the next rIter.next(); carried match state
      // is copied because the sorter reuses row buffers.
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastKey: UnsafeRow = null
      var lastVal: UnsafeRow = null
      // strict (rt < lt) consumes/records only strictly-earlier right rows;
      // an rt == lt row stays buffered for later (larger-lt) left rows
      val timeBound = if (strict) -1 else 0
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        // SQL semantics on NULLs: a NULL never equals anything and a NULL
        // right-time never satisfies rt <= lt, so NULL-keyed left rows
        // can't match, and NULL-keyed or NULL-timed right rows are
        // consumed (they sort first) without ever being recorded.
        val lkNull = lk.isNullAt(0) || lt.isNullAt(0)
        var scanning = rHead != null
        while (scanning) {
          val rk = rKeyProj(rHead)
          val c = keyOrd.compare(rk, lk)
          if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lt) <= timeBound)) {
            if (c == 0 && !lkNull && !rk.isNullAt(0) &&
              !rTimeProj(rHead).isNullAt(0)) {
              lastKey = lk.copy()
              lastVal = rValProj(rHead).copy()
            }
            rHead = if (rIter.hasNext) rIter.next() else null
            scanning = rHead != null
          } else scanning = false
        }
        val matched = !lkNull && lastKey != null &&
          keyOrd.compare(lastKey, lk) == 0
        resultProj(joined(l, if (matched) lastVal else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
