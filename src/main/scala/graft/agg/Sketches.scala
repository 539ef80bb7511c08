package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency/cardinality sketches — the 100 TB observability
  * toolkit (reference parity-plus: quokka exposes only exact and
  * HLL-approx distinct counts through Polars/DuckDB; count-min and
  * DataSketches HLL add persistable, UNION-mergeable sketch state the
  * incremental-maintenance tier can store next to its snapshots).
  *
  * Both sketches are DETERMINISTIC for a fixed input multiset: CMS
  * counters are sums (merge = counter addition, partition-order free);
  * HLL registers are maxima of per-item hashes (order free). So gate
  * outputs derived from them are engine-reproducible — but their
  * VALUES cannot be mirrored in a SQL oracle, so gates follow q54's
  * rank-bound pattern: emit exact counts plus 0/1 bound flags the
  * oracle states as literal 1s. */
object Sketches {

  /** Count-min sketch over `valueCol`, probed at the exact top-`k`
    * values: (value, exact_count, ok_lower, ok_upper). ok_lower is the
    * CMS structural guarantee est ≥ true (counters only overcount);
    * ok_upper is the probabilistic bound est ≤ true + ⌈eps·N⌉ — with
    * fixed data and seed the outcome is a constant, so the gate is
    * stable once green.
    *
    * Scale shape: the sketch build is ONE map-combined aggregate whose
    * state is eps⁻¹·ln(1/δ) counters regardless of corpus size; the
    * probe reads the collected sketch (bounded metadata) against the
    * exact top-k, which is itself a (value)-keyed aggregate + top-k. */
  def countMinTopK(df: DataFrame, valueCol: String, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // Null rows are excluded from sketch, total, AND top-k alike:
    // CountMinSketch.estimateCount(null) throws, and counting nulls in
    // `total` would loosen the ceil(eps*N) upper-bound slack.
    val vals = df.select(col(valueCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull)
    val bytes = vals
      .agg(expr(s"count_min_sketch(__v, ${eps}d, ${confidence}d, $seed)")
        .as("__cms"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val total = vals.count()
    val slack = math.ceil(eps * total).toLong
    val top = vals.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__v")).limit(k).collect()
    val rows = top.map { r =>
      val (v, c) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(v)
      (v, c, if (est >= c) 1L else 0L, if (est <= c + slack) 1L else 0L)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF(valueCol, "exact_count", "ok_lower", "ok_upper")
  }

  /** Per-group DataSketches-HLL distinct estimate, bound-checked
    * against the exact distinct count: (groupCol, n_exact, ok) with
    * ok = |est − exact| ≤ relErr·exact. Unlike approx_count_distinct's
    * opaque HLL++, the DataSketches sketch is a FIRST-CLASS binary:
    * buildable per partition/day, stored, and UNION-merged later —
    * the gate also re-derives every group estimate through
    * hll_union_agg over per-half-corpus sketches and checks the union
    * path lands on the SAME estimate (merge consistency). */
  def hllDistinctCheck(df: DataFrame, groupCol: String, valueCol: String,
      relErr: Double): DataFrame = {
    val base = df.select(col(groupCol), col(valueCol).as("__v"),
      pmod(hash(col(valueCol)), lit(2)).as("__half"))
    val direct = base.groupBy(col(groupCol))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(__v))").as("__est"),
        countDistinct(col("__v")).as("n_exact"))
    // merge path: sketch each half separately, union, estimate
    val unioned = base.groupBy(col(groupCol), col("__half"))
      .agg(expr("hll_sketch_agg(__v)").as("__sk"))
      .groupBy(col(groupCol))
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__uest"))
    direct.join(unioned, Seq(groupCol))
      .select(col(groupCol), col("n_exact"),
        (abs(col("__est").cast("double") - col("n_exact").cast("double"))
          <= lit(relErr) * col("n_exact").cast("double")).cast("long")
          .as("ok_bound"),
        (col("__est") === col("__uest")).cast("long").as("ok_union"))
  }
}
