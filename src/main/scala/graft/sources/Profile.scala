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
    * Scale shape: the min/max bounds are collected driver-side (one
    * two-long row — bounded metadata, the footer-stats discipline),
    * which both literal-folds the bin arithmetic into the count scan
    * AND lets the int64 overflow precondition (span · bins must fit —
    * Spark's non-ANSI multiply would otherwise wrap values into
    * out-of-range bins that the join-back silently drops) fail loudly
    * before any job; then one hash aggregate on the bin id and a
    * bins-sized join-back to surface empties. Two scans (bounds +
    * counts), the minimum for data-derived edges.
    *
    * Returns (bin, lo, hi, n): lo/hi are the integer edge labels
    * min + ⌊bin·w/bins⌋ and min + ⌊(bin+1)·w/bins⌋ (w = max−min+1) —
    * consecutive, covering [min, max+1); a value's bin is
    * ⌊(x−min)·bins/w⌋, which for non-divisible widths can differ from
    * its label interval by at most one at the edges. An empty (or
    * all-null) column yields bins rows with null edges and n = 0. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    val vals = df.select(col(c).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val b = vals.agg(min(col("__x")), max(col("__x"))).head()
    val frame = spark.range(bins).toDF("bin")
    if (b.isNullAt(0))
      return frame.select(col("bin"), lit(null).cast("long").as("lo"),
        lit(null).cast("long").as("hi"), lit(0L).as("n"))
    val mn = b.getLong(0)
    // the span itself can exceed int64 (e.g. min = Long.MinValue):
    // compute it wide so the overflow guard cannot be fooled by a
    // wrapped-negative width passing the <= check
    val span = BigInt(b.getLong(1)) - BigInt(mn) + 1
    require(span * bins <= BigInt(Long.MaxValue),
      s"value span $span × $bins bins overflows the int64 bin " +
        "arithmetic — reduce bins or pre-scale the column")
    val w = span.toLong
    val counts = vals
      .withColumn("bin", expr(s"(__x - ${mn}L) * $bins div ${w}L"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    frame
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(mn) + expr(s"bin * ${w}L div $bins")).as("lo"),
        (lit(mn) + expr(s"(bin + 1) * ${w}L div $bins")).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** EQUI-DEPTH histogram: `bins` buckets whose boundaries are the
    * exact i/bins percentiles (Spark's `percentile` ≡ DuckDB's
    * `quantile_cont` bit-for-bit — the q53-proven parity), bucket(x) =
    * #{boundaries < x}. The distribution half [[histogram]] doesn't
    * give: equal-POPULATION buckets (ties permitting) instead of
    * equal-width — the optimizer-statistics / quantile-bucketing shape.
    *
    * Scale: one exact-percentile aggregate (distinct-value map — for
    * open-cardinality columns quantize first or use the t-digest tier),
    * boundaries collected as bins-sized driver metadata (the OrderStat
    * picked-rank pattern), then ONE scan assigns buckets via a literal
    * comparison chain (codegen, zero exchange) + a map-combined count.
    *
    * Returns (bucket, lo, hi, n): lo/hi are the bucket's boundary
    * values (bucket 0 starts at min, last ends at max); empty buckets
    * (possible under heavy ties) materialize with n = 0. */
  def histogramEquiDepth(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(c).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val qs = (1 until bins).map(i => i.toDouble / bins)
    val frame = spark.range(bins).toDF("bucket")
    val stats = vals.agg(
      (if (qs.isEmpty) array().cast("array<double>")
       else expr(s"percentile(__x, array(${qs.mkString(", ")}))")).as("__bs"),
      min(col("__x")).as("__mn"), max(col("__x")).as("__mx")).head()
    if (stats.isNullAt(1))
      return frame.select(col("bucket"),
        lit(null).cast("double").as("lo"), lit(null).cast("double").as("hi"),
        lit(0L).as("n"))
    val bs = if (qs.isEmpty) Seq.empty[Double]
             else stats.getSeq[Double](0)
    val (mn, mx) = (stats.getDouble(1), stats.getDouble(2))
    val bucketOf = bs.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__x") > b, 1).otherwise(0)
    }
    val counts = vals.withColumn("bucket", bucketOf.cast("long"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val bounds = (0 until bins).map { i =>
      (i.toLong, if (i == 0) mn else bs(i - 1),
        if (i == bins - 1) mx else bs(i))
    }.toDF("bucket", "lo", "hi")
    frame.join(broadcast(bounds), Seq("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), col("lo"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
