package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics via range partitioning — the
  * 100 TB form of `percentile()`.
  *
  * Spark's built-in exact `percentile` aggregates a boxed value→count
  * OpenHashMap per partition and merges them into one final map: on a
  * mostly-distinct double column that map is row-count-sized, the merge
  * is single-threaded, and at corpus scale it simply OOMs (it exists
  * for low-cardinality columns; `approx_percentile` is Spark's answer
  * for the rest). Measured here at sf0.1 it is also 10-30× slower than
  * a single-node columnar engine on the same data.
  *
  * This implementation is the classic distributed selection instead:
  *   1. range-exchange the column (a tie-breaker column splits hot
  *      values across partitions, so a 90%-constant column cannot pin
  *      one reducer — value order across partitions is preserved, and
  *      tie order is irrelevant to a rank query);
  *   2. job 1 counts rows per range partition (no sort needed) —
  *      prefix sums locate each wanted global rank in exactly one
  *      partition;
  *   3. job 2 sorts ONLY the partitions that own a wanted rank and
  *      picks the order statistics; both jobs reuse the same shuffle
  *      output, so the column crosses the wire once.
  * Interpolation replicates Spark's `Percentile.getPercentile`
  * bit-for-bit ((higher-position)*lower + (position-lower)*higher), so
  * results are exchangeable with the built-in — and with DuckDB's
  * `quantile_cont`, which the driver oracles verify.
  *
  * Memory: one range partition of doubles per task (the same "a
  * partition fits in the executor" contract as any Tungsten sort).
  * Driver traffic: one long per partition + one double per requested
  * rank — bounded metadata, not data. */
object OrderStat {

  /** Exact interpolated percentiles of `c` (nulls ignored), one result
    * per entry of `qs`. Runs two jobs over one exchange (see object
    * doc); returns NaN entries when the column has no non-null rows.
    * Call sites that must mirror the built-in `percentile`'s null-on-
    * empty-input contract (round-9 advice: DataStream.exactQuantile)
    * use [[exactPercentilesOpt]], which makes the empty case explicit. */
  def exactPercentiles(df: DataFrame, c: String, qs: Seq[Double]): Array[Double] =
    exactPercentilesOpt(df, c, qs).getOrElse(qs.map(_ => Double.NaN).toArray)

  /** [[exactPercentiles]] with the empty-input case explicit: `None`
    * when the column has no non-null rows (where the built-in
    * `percentile` aggregate returns null), `Some(points)` otherwise. */
  def exactPercentilesOpt(df: DataFrame, c: String, qs: Seq[Double]): Option[Array[Double]] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"percentile points must be in [0, 1], got $qs")
    // tolerate non-numeric conf values (e.g. "auto" on some platforms)
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    // the tie-breaker must be distinct WITHIN a value run for the range
    // partitioner to split hot values; monotonically_increasing_id is
    // partition-local-unique and never leaves this plan
    val ranged = df
      .select(col(c).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__tb", monotonically_increasing_id())
      .repartitionByRange(parts, col("__v"), col("__tb"))
      .rdd
    val counts = ranged
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val n = counts.sum
    if (n == 0L) return None
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = first global rank in partition i
    // Spark Percentile: position = (count - 1) * percentage
    val positions = qs.map(q => (n - 1) * q)
    val wantedRanks = positions
      .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
      .distinct.sorted
    val byPartition: Map[Int, Seq[Long]] = wantedRanks.groupBy { r =>
      // the partition whose [offset(i), offset(i+1)) window holds rank r
      val i = java.util.Arrays.binarySearch(offsets, r)
      if (i >= 0) {
        // r is exactly some offset — skip empty partitions at that rank
        var j = i
        while (counts(j) == 0L) j += 1
        j
      } else -i - 2
    }
    val picked = ranged
      .mapPartitionsWithIndex { (i, it) =>
        byPartition.get(i) match {
          case None => Iterator.empty
          case Some(ranks) =>
            val arr = it.map(_.getDouble(0)).toArray
            java.util.Arrays.sort(arr)
            ranks.iterator.map(r => (r, arr((r - offsets(i)).toInt)))
        }
      }
      .collect().toMap
    Some(positions.map { p =>
      val lower = math.floor(p).toLong
      val higher = math.ceil(p).toLong
      if (higher == lower) picked(lower)
      // Spark's exact interpolation expression, replicated bit-for-bit
      else (higher - p) * picked(lower) + (p - lower) * picked(higher)
    }.toArray)
  }

  /** Per-group EXACT lower weighted median: the smallest value v whose
    * cumulative weight reaches half the group total (2·cumW(v) ≥ W —
    * the textbook integer rule, no interpolation, so with int64
    * weights the pick is pure integer arithmetic and the returned
    * value is an INPUT value, never a computed float). Degenerates to
    * the lower median when every weight is 1.
    *
    * Scale shape: one (group, value) pre-aggregate (map-combined — the
    * exchange carries distinct values per group, not rows), then a
    * per-group cumulative window over that distinct-value relation and
    * a min() reduce. A group's cost is its value cardinality.
    *
    * Returns (groupCol, w_total, weighted_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val vw = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    vw.withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTot))
      .filter(lit(2L) * col("__cum") >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(max(col("__tot")).as("w_total"),
        min(col(valueCol)).as("weighted_median"))
  }

  /** Per-group EXACT interpolated median + MAD (median absolute
    * deviation) — the robust location/scale pair behind outlier cuts
    * that survive heavy tails where mean/σ get dragged (the robust
    * cousin of EventStats' 3σ detector): flag x when
    * |x − median| > k·MAD. Interpolation matches the SQL-standard
    * median (mean of the two middle order statistics for even n), so
    * the value — not just the rank — is engine-reproducible: both
    * halves are picked values and the midpoint is one IEEE add/divide.
    *
    * Scale shape (the q209 discipline): each median pass aggregates to
    * DISTINCT (group, value) with multiplicity first — the window sort
    * runs over the value space, not the row count — then takes the two
    * middle ranks from the cumulative count; MAD repeats the pass on
    * |x − median| after one group-keyed join-back. Two value-space
    * window sorts + two joins total; the exact form's cost contract is
    * q53's (order statistics are worth a sort), with the sketch tier
    * (q54/q96) as the approximate companion.
    *
    * Returns (groupCol, n, median, mad); null values are ignored
    * (SQL aggregate semantics), all-null groups are absent. */
  def groupMedianMad(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    def medianOf(in: DataFrame, out: String): DataFrame = {
      val vc = in.groupBy(col("__g"), col("__v"))
        .agg(count(lit(1)).as("__c"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__g")).orderBy(col("__v"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wTot = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__g"))
      val cum = vc.withColumn("__cum", sum(col("__c")).over(wCum))
        .withColumn("__tot", sum(col("__c")).over(wTot))
      // value at rank k = min value whose cumulative count reaches k
      def atRank(k: String, name: String) =
        cum.filter(col("__cum") >= expr(k))
          .groupBy(col("__g"))
          .agg(min(col("__v")).as(name), max(col("__tot")).as(s"__n$name"))
      atRank("(__tot + 1) div 2", "__lo")
        .join(atRank("(__tot + 2) div 2", "__hi"), Seq("__g"))
        .select(col("__g"),
          ((col("__lo") + col("__hi")) / lit(2.0)).as(out),
          col("__n__lo").as("__n"))
    }
    val med = medianOf(base, "median")
    val dev = base.join(med.select(col("__g"), col("median")), Seq("__g"))
      .select(col("__g"), abs(col("__v") - col("median")).as("__v"))
    val mad = medianOf(dev, "mad").select(col("__g"), col("mad"))
    med.join(mad, Seq("__g"))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("median"), col("mad"))
  }
}
