package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling (the ANALYZE/data-quality-audit step a
  * corpus build runs before trusting a new drop): per-column row count,
  * null count, exact distinct count, and min/max — all from ONE
  * aggregate over one scan. The reference reaches for its scan →
  * groupby surface per question (pyquokka/datastream.py aggregates);
  * this folds every per-column question into a single job.
  *
  * Scale shape: multiple exact DISTINCT aggregates plan as one Expand +
  * two-phase hash aggregate — one corpus scan, map-side partials, and a
  * final single-row reduce that the driver unpivots row-per-column (a
  * bounded, column-count-sized result). At truly open-ended cardinality
  * swap `exact = false` for approx_count_distinct (HLL, fixed state) —
  * same plan minus the Expand; the gate uses the exact path so the
  * oracle equality is total.
  *
  * min/max are reported as strings so one relation can profile mixed
  * column types; callers pick columns whose string form is engine-
  * portable (integers and strings are; see the q146 gate note on
  * doubles). */
object Profile {

  /** One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    * min_s, max_s). `n_distinct` counts non-null values; min/max are
    * null (not "null") for all-null columns. */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to row-per-column: stack is a pure
    // projection of the one-row aggregate — no second scan
    val stackArgs = cols.map { c =>
      s"'$c', __n_$c, __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_s, max_s)")
  }
}
