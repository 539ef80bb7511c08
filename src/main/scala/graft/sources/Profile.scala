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

  /** Equi-width histogram of an integer column in `bins` buckets —
    * the value-distribution half of a profiling pass (skew audits, bin
    * boundaries for range partitioning). Bucket assignment is pure
    * integer arithmetic: bin = (x − min) · bins div (max − min + 1), so
    * edges and counts are bit-reproducible on any engine — no float
    * widths, no rounding-mode drift. Empty bins are materialized with
    * count 0 (a distribution you can chart), nulls are excluded and
    * reported by [[profile]].
    *
    * Scale shape: one min/max aggregate broadcast back (scalar cross
    * join), one hash aggregate on the bin id, and a bins-sized range
    * join-back to surface empties — the data is scanned twice (bounds +
    * counts), the two-pass minimum for data-derived edges.
    *
    * Returns (bin, lo, hi, n): lo/hi are the integer edge labels
    * min + ⌊bin·w/bins⌋ and min + ⌊(bin+1)·w/bins⌋ (w = max−min+1) —
    * consecutive, covering [min, max+1); a value's bin is
    * ⌊(x−min)·bins/w⌋, which for non-divisible widths can differ from
    * its label interval by at most one at the edges. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val vals = df.select(col(c).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val bounds = vals.agg(min(col("__x")).as("__mn"),
      (max(col("__x")) - min(col("__x")) + 1L).as("__w"))
    val counts = vals.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"(__x - __mn) * $bins div __w"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    df.sparkSession.range(bins).toDF("bin")
      .crossJoin(broadcast(bounds))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (col("__mn") + expr(s"bin * __w div $bins")).as("lo"),
        (col("__mn") + expr(s"(bin + 1) * __w div $bins")).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
