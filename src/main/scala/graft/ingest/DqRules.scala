package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine — the generalization of the
  * reference's single hard-coded business rule (SURVEY D5) into the
  * config-driven check set a lake actually runs per table (the
  * Deequ/Great-Expectations shape): not-null, uniqueness, numeric range,
  * value-set membership, and pattern rules, each reporting its violation
  * count and pass/fail.
  *
  * Scale shape: every predicate rule folds into ONE aggregation pass
  * (conditional sums over a single scan); uniqueness adds a distinct
  * count, which Spark plans into the same job via Expand. No per-rule
  * scans, no driver-side row iteration — the report is a handful of
  * numbers regardless of table size. Pattern rules stay in the regex
  * subset Java and RE2 evaluate identically (character classes + bounded
  * repeats, no lookaround), the repo-wide convention (q40).
  */
object DqRules {

  sealed trait Rule {
    def id: String
    def column: String
    def kind: String
  }
  final case class NotNull(id: String, column: String) extends Rule {
    val kind = "not_null"
  }
  final case class Unique(id: String, column: String) extends Rule {
    val kind = "unique"
  }
  final case class InRange(id: String, column: String, lo: Double, hi: Double)
      extends Rule { val kind = "in_range" }
  final case class InSet(id: String, column: String, values: Seq[String])
      extends Rule { val kind = "in_set" }
  final case class Matches(id: String, column: String, regex: String)
      extends Rule { val kind = "matches" }

  /** Violation predicate for a row-level rule (null counts as a
    * violation for every rule except NotNull's complement — a null
    * can't prove membership/range/pattern). */
  private def violated(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case InRange(_, c, lo, hi) =>
      col(c).isNull || col(c) < lo || col(c) > hi
    case InSet(_, c, vs) => col(c).isNull || !col(c).isInCollection(vs)
    case Matches(_, c, re) => col(c).isNull || !col(c).rlike(re)
    case _: Unique => lit(false) // handled as an aggregate, not per row
  }

  /** Evaluate all rules in one aggregation pass; one output row per rule:
    * (rule_id, kind, column_name, n_violations, pass). */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map {
      case u: Unique =>
        // violations = count(*) - count_distinct(c): the SURPLUS rows — a
        // value occurring k times counts k-1 (the deletions needed to make
        // the column unique), and EVERY null row counts (a null can't prove
        // uniqueness, consistent with `violated` for the other rules)
        (count(lit(1)) - count_distinct(col(u.column)))
          .cast("long").as(u.id)
      case r =>
        sum(when(violated(r), 1L).otherwise(0L)).as(r.id)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per rule
    val stackExpr = rules.map(r =>
      s"'${r.id}', '${r.kind}', '${r.column}', ${r.id}").mkString(", ")
    row.select(expr(
        s"stack(${rules.size}, $stackExpr) AS (rule_id, kind, column_name, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
  }
}
