package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (Deequ-shape, next to
  * [[Profile]]'s descriptive half) — the validation gate a training-data
  * pipeline runs before a source enters a mix: nullability, key
  * uniqueness, numeric ranges, regex shape, categorical domains, and
  * referential integrity, each reported as exact violation counts.
  *
  * Scale design: every scalar rule (not-null / range / regex / in-set)
  * and every uniqueness rule compiles into ONE shared aggregate over ONE
  * scan — conditional sums and Expand-based count-distincts (the q146
  * profiler's plan), so adding rules adds columns, not passes.
  * Referential rules each add one distinct-key anti-join against their
  * (dimension-sized) reference. All counts are exact int64 — the verdict
  * is engine-reproducible at any parallelism. */
object Validate {

  sealed trait Rule
  /** `column` must never be null. */
  final case class NotNull(column: String) extends Rule
  /** `columns` must be row-unique; violations = rows beyond the first
    * per duplicated key. */
  final case class Unique(columns: Seq[String]) extends Rule
  /** Non-null `column` must lie in [lo, hi] (closed; nulls are
    * [[NotNull]]'s business). */
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule
  /** Non-null `column` must fully match `regex` (engine-portable subset:
    * anchors, char classes, counts — the q123 discipline). */
  final case class Matches(column: String, regex: String) extends Rule
  /** Non-null `column` must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule

  private def label(r: Rule): (String, String) = r match {
    case NotNull(c)     => ("not_null", c)
    case Unique(cs)     => ("unique", cs.mkString(","))
    case InRange(c, lo, hi) => (s"in_range[$lo,$hi]", c)
    case Matches(c, re) => (s"matches[$re]", c)
    case InSet(c, vs)   => (s"in_set[${vs.length}]", c)
  }

  private def violations(r: Rule): Column = r match {
    case NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case Unique(cs) =>
      count(lit(1)) - countDistinct(cs.head, cs.tail: _*)
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull &&
        (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
    case Matches(c, re) =>
      sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
    case InSet(c, vs) =>
      sum(when(col(c).isNotNull &&
        !col(c).isin(vs.map(v => v: Any): _*), 1L).otherwise(0L))
  }

  /** Run `rules` against `df` in one scan: one row per rule —
    * (rule, column, n_rows, n_violations, ok). Row order follows the
    * rule list (emit `rule_no` for a stable presentation sort). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one validation rule required")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) => violations(r).as(s"__v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val (rule, column) = label(r)
      struct(lit(i.toLong).as("rule_no"), lit(rule).as("rule"),
        lit(column).as("column"), col("__n").as("n_rows"),
        col(s"__v$i").as("n_violations"),
        (col(s"__v$i") === 0L).cast("long").as("ok"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Referential-integrity check: non-null `df.column` values must
    * exist in `dim.dimColumn`. One row in the [[check]] schema;
    * violations counted over ROWS (a repeated orphan key counts each
    * time). The probe side is the DISTINCT key set anti-joined against
    * the reference, then joined back — at scale both relations stay
    * key-sized. */
  def referencedIn(df: DataFrame, column: String, dim: DataFrame,
      dimColumn: String, ruleNo: Long = 0L): DataFrame = {
    // one pass: per-key row counts (null keys kept — they report into
    // n_rows but are never orphans), left-joined against the distinct
    // reference keys, folded into (n_rows, orphan rows) in one agg
    val keyCounts = df.select(col(column).as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    val dimKeys = dim.select(col(dimColumn).as("__k")).distinct()
      .withColumn("__ok", lit(1))
    keyCounts.join(dimKeys, Seq("__k"), "left")
      .agg(sum(col("__c")).as("__n"),
        sum(when(col("__k").isNotNull && col("__ok").isNull, col("__c"))
          .otherwise(0L)).as("__v"))
      .select(lit(ruleNo).as("rule_no"),
        lit(s"referenced_in[$dimColumn]").as("rule"),
        lit(column).as("column"), col("__n").as("n_rows"),
        col("__v").as("n_violations"),
        (col("__v") === 0L).cast("long").as("ok"))
  }
}
