package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the general range-join operator (the
  * reference exposes range semantics only inside its CEP executor,
  * `/root/reference/pyquokka/executors.py` pattern matching; this is
  * the public relational form: sessions × ad slots, trades × quote
  * windows, genomic ranges).
  *
  * A naive inequality join plans as a broadcast-nested-loop — the
  * quadratic shape PlanHygieneSpec forbids catalog-wide. This operator
  * turns overlap into an EQUI join: each interval explodes into the
  * fixed-width buckets it covers, the join runs on (keys…, bucket),
  * and the overlap predicate re-verifies exactly. Every matched pair
  * shares the bucket containing max(start₁, start₂), so emitting ONLY
  * in that bucket makes output exactly-once with no distinct pass.
  *
  * Scale shape (100 TB): shuffle is (keys, bucket)-hashed — co-located
  * and skew-bounded by bucket width; per-interval fanout is
  * ⌈span/width⌉ + 1 (callers size `bucketWidth` near the typical span;
  * a degenerate full-range interval should be split upstream). No
  * BNLJ, no cartesian, no sort. */
object IntervalJoin {

  /** Overlap join on closed intervals [startCol, endCol] under equal
    * `keys`: returns left columns + right columns (overlapping names
    * suffixed). Rows with end < start are empty intervals and drop. */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, bucketWidth: Long,
      suffix: String = "_r"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // floor(x / w) exact on the full signed-long domain: x − pmod(x, w)
    // is divisible by w, so integral `div` truncation IS the floor
    def fdiv(x: Column): Column =
      call_function("div", x.cast("long") - pmod(x.cast("long"), lit(bucketWidth)),
        lit(bucketWidth))
    val rightRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df
      else df.withColumnRenamed(c, c + suffix)
    }
    val (s1, e1) = (col(startCol), col(endCol))
    val (s2, e2) = (col(startCol + suffix), col(endCol + suffix))
    val lb = left.filter(e1 >= s1)
      .withColumn("__bkt", explode(sequence(fdiv(s1), fdiv(e1))))
    val rb = rightRenamed.filter(e2 >= s2)
      .withColumn("__bkt", explode(sequence(fdiv(s2), fdiv(e2))))
    // both sides are corpus-derived (exploded interval relations):
    // force shuffle-hash so a toy-scale auto-broadcast can't mask the
    // plan that must run at 100 TB (q66's confirm-join lesson — the
    // first 10× soak showed exactly that flip as a 3.5× ratio)
    lb.hint("shuffle_hash").join(rb, keys :+ "__bkt")
      .filter(s1 <= e2 && s2 <= e1)
      // exactly-once: both sides cover the bucket of max(s1, s2)
      .filter(col("__bkt") === fdiv(greatest(s1, s2)))
      .drop("__bkt")
  }
}
