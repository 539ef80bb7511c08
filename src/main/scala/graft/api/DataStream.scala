package graft.api

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The engine's lazy relational stream — the user-facing API.
  *
  * Semantics follow the reference `DataStream` (pyquokka/datastream.py:15):
  * a lazy, unordered bag of rows with a Polars/Spark-like method surface.
  * Here it wraps a Spark `DataFrame`, so plan construction, optimization
  * (predicate pushdown, column pruning, join reorder — reference df.py
  * passes 2-7) and execution are all Catalyst/Tungsten; only semantics the
  * reference adds on top (suffix-renaming joins, clip, top-k sugar, ...)
  * live here.
  *
  * All methods are lazy; `collect()`/`compute()` trigger execution
  * (reference datastream.py:75-116).
  */
class DataStream(val df: DataFrame) {
  def spark: SparkSession = df.sparkSession
  def schema: Seq[String] = df.columns.toSeq
  def sparkSchema: StructType = df.schema

  // ---- sinks (reference datastream.py:75-276) -------------------------
  def collect(): Array[Row] = df.collect()
  /** Materialize cluster-wide (reference `compute` → cached DataSet). */
  def compute(): DataStream = { val c = df.persist(); c.count(); new DataStream(c) }
  /** Plan explain; mode "graphviz" prints DOT (reference
    * explain(mode="graphviz"), df.py:993-1027 — there the task graph,
    * here the physical plan DAG). */
  def explain(mode: String = "formatted"): Unit =
    if (mode == "graphviz") println(explainGraphviz())
    else df.explain(mode)

  /** DOT (graphviz) rendering of the physical plan tree, one box per
    * operator, edges child → parent (data-flow direction). AQE wrapper
    * nodes (AdaptiveSparkPlan, query stages) hide their subtree from
    * `children`; descend through them explicitly. */
  def explainGraphviz(): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val sb = new StringBuilder("digraph plan {\n  node [shape=box];\n")
    var id = 0
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def walk(p: SparkPlan): Int = {
      val my = id
      id += 1
      sb.append(s"""  n$my [label="${p.nodeName.replace("\"", "'")}"];""")
        .append('\n')
      kids(p).foreach { c =>
        val ci = walk(c)
        sb.append(s"  n$ci -> n$my;\n")
      }
      my
    }
    walk(df.queryExecution.executedPlan)
    sb.append("}\n")
    sb.toString
  }
  /** Parallel directory-of-files write (reference datastream.py:129-276).
    * `outputLineLimit` maps to Parquet row-group/file sizing. */
  def writeParquet(loc: String, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(loc)
  }
  def writeCsv(loc: String, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite").option("header", "true")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).csv(loc)
  }
  /** ORC sink (parity-plus, see [[graft.api.QContext.readOrc]]). */
  def writeOrc(loc: String, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).orc(loc)
  }
  /** Hive-style partitioned layout (`…/col=value/…`): reads with a filter
    * on the partition columns prune whole directories — the scale path
    * for time/tenant-partitioned corpora. */
  def writeParquetPartitioned(loc: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(loc)
  /** Bucketed + sorted table write: two tables bucketed the same way on
    * the join key join with NO shuffle (SURVEY §2.4 co-located joins —
    * the reference pre-partitions with its hash partitioner; Spark
    * persists the layout in the catalog). */
  def writeBucketed(
      table: String, bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  // ---- projection / filter / per-batch compute (datastream.py:278-903) -
  def filter(cond: Column): DataStream = new DataStream(df.filter(cond))
  /** SQL WHERE predicate (reference `filter_sql`). Catalyst normalizes and
    * pushes down — the reference's CNF machinery (datastream.py:368-390)
    * is built-in here. */
  def filterSql(predicate: String): DataStream = new DataStream(df.filter(expr(predicate)))
  def select(cols: String*): DataStream = new DataStream(df.select(cols.map(col): _*))
  def selectCols(cols: Seq[Column]): DataStream = new DataStream(df.select(cols: _*))
  def drop(cols: String*): DataStream = new DataStream(df.drop(cols: _*))
  def rename(mapping: Map[String, String]): DataStream =
    new DataStream(df.withColumnsRenamed(mapping))
  /** Add N computed columns (reference `with_columns`, datastream.py:1209). */
  def withColumns(cols: Map[String, Column]): DataStream =
    new DataStream(df.withColumns(cols))
  /** SQL flavor with mandatory aliases (reference `with_columns_sql`). */
  def withColumnsSql(exprs: String*): DataStream =
    new DataStream(df.selectExpr("*" +: exprs: _*))
  /** Arbitrary partition-wise UDF — the reference's `transform`
    * (datastream.py:652-739): batch-in/batch-out, any cardinality.
    * Operator fusion ("foldable") is whole-stage codegen territory and
    * automatic. */
  def transform[T: Encoder](f: Iterator[Row] => Iterator[T]): org.apache.spark.sql.Dataset[T] =
    df.mapPartitions(f)
  /** Per-batch SQL — in the reference this is the partial-agg building
    * block (datastream.py:741-815); in Spark partial aggregation is
    * automatic, so this is just selectExpr/groupBy sugar. */
  def transformSql(exprs: Seq[String], groupBy: Seq[String] = Nil): DataStream =
    if (groupBy.isEmpty) new DataStream(df.selectExpr(exprs: _*))
    else new DataStream(df.groupBy(groupBy.map(col): _*).agg(
      expr(exprs.head), exprs.tail.map(expr): _*))
  /** Winsorize in one API hop — the reference's blog pipeline
    * (blog/approxquant.md: per-column approx-quantiles, then clip
    * everything to the readout): [[approximateQuantileWide]]'s single
    * t-digest pass produces the `(lo, hi)` bound per column, and the
    * one readout row (2 doubles per column — bounded driver metadata,
    * the same class as the OrderStat boundary ranks) feeds [[clip]]
    * directly. Two jobs total regardless of width: the sketch pass and
    * whatever consumes the clipped stream. */
  def winsorize(cs: Seq[String], lo: Double = 0.01, hi: Double = 0.99,
      compression: Int = 100): DataStream = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"winsorize needs 0 <= lo < hi <= 1, got ($lo, $hi)")
    val row = graft.agg.WideQuantiles.quantiles(df, cs, Seq(lo, hi),
      compression).head()
    val bounds = cs.zipWithIndex.map { case (c, i) =>
      val q = row.getSeq[Double](i)
      // loud guard: an all-null column sketches to NaN quantiles, and
      // clip's least/greatest would then silently turn EVERY value of
      // that column into NaN (NaN compares greatest) — the same
      // poison-propagation discipline as the kernel's NaN raise
      require(!q.head.isNaN && !q.last.isNaN,
        s"winsorize: column $c has no non-null values — NaN bounds " +
          "would poison the clip")
      c -> ((q.head, q.last))
    }.toMap
    clip(bounds)
  }

  /** [[winsorize]] for the ARRAY layout (r17): per-element bounds from
    * one [[approximateQuantileWideArray]] t-digest pass, then an
    * element-wise clip of the array column in place. The bounds ride
    * into the plan as TWO `typedlit` array literals (one Literal node
    * each — never a width-sized expression tree, so a 10k-feature
    * clip stays codegen-friendly), and the clip itself is a single
    * `transform` over the array. Same all-null NaN-bounds guard as
    * [[winsorize]]. Element type is preserved (float in → float out). */
  def winsorizeArray(arrCol: String, width: Int, lo: Double = 0.01,
      hi: Double = 0.99, compression: Int = 100): DataStream = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"winsorizeArray needs 0 <= lo < hi <= 1, got ($lo, $hi)")
    val row = graft.agg.WideQuantiles.quantilesOfArray(df, arrCol, width,
      Seq(lo, hi), compression).head()
    val bounds = (0 until width).map { j =>
      val q = row.getSeq[Double](j)
      require(!q.head.isNaN && !q.last.isNaN,
        s"winsorizeArray: $arrCol[$j] has no non-null values — NaN " +
          "bounds would poison the clip")
      (q.head, q.last)
    }
    val loLit = typedlit(bounds.map(_._1))
    val hiLit = typedlit(bounds.map(_._2))
    val et = df.select(col(arrCol)).schema.head.dataType match {
      case org.apache.spark.sql.types.ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"winsorizeArray: $arrCol must be an array column, got $other")
    }
    // null elements stay null: greatest/least SKIP nulls, so a bare
    // clip would silently impute lo over missing features
    // fully qualified: DataStream.transform (the batch-UDF operator)
    // shadows functions.transform here
    new DataStream(df.withColumn(arrCol,
      org.apache.spark.sql.functions.transform(col(arrCol), (x, i) =>
        when(x.isNull, lit(null).cast(et)).otherwise(
          least(greatest(x.cast("double"), element_at(loLit, i + 1)),
            element_at(hiLit, i + 1)).cast(et)))))
  }

  /** Clamp values (reference `clip`, datastream.py:867-903). */
  def clip(bounds: Map[String, (Double, Double)]): DataStream =
    new DataStream(df.withColumns(bounds.map { case (c, (lo, hi)) =>
      c -> least(greatest(col(c), lit(lo)), lit(hi))
    }))
  /** Bag union, same schema (reference datastream.py:817-865). */
  def union(other: DataStream): DataStream = new DataStream(df.union(other.df))
  def intersect(other: DataStream): DataStream = new DataStream(df.intersect(other.df))
  def except(other: DataStream): DataStream = new DataStream(df.except(other.df))

  /** Stateful custom operator — the reference's extensibility API
    * (`stateful_transform`, datastream.py:1312-1367): partition by key,
    * order within partition, run a stateful iterator. */
  def statefulTransform[T: Encoder](
      partitionBy: Seq[String],
      orderWithinPartitionBy: Seq[String])(
      f: Iterator[Row] => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(parts, partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy ++ orderWithinPartitionBy).map(col): _*)
      .mapPartitions(f)
  }

  // ---- joins (datastream.py:1420-1603) --------------------------------
  /** Equi-join with the reference's suffix semantics: overlapping non-key
    * right columns get `suffix` appended (datastream.py:1455-1471); the
    * join key appears once. how ∈ inner|left|semi|anti (+right/outer for
    * parity-plus). Broadcast choice is Catalyst/AQE; `broadcastRight`
    * forces the hint (reference's materialized-side broadcast join). */
  def join(
      right: DataStream,
      leftOn: String,
      rightOn: String,
      how: String = "inner",
      suffix: String = "_2",
      broadcastRight: Boolean = false): DataStream = {
    val sparkHow = how match {
      case "semi" => "left_semi"
      case "anti" => "left_anti"
      case h => h
    }
    val l = df
    val overlap = l.columns.toSet.intersect(right.df.columns.toSet) - rightOn
    val r0 = overlap.foldLeft(right.df)((d, c) => d.withColumnRenamed(c, c + suffix))
    val r = if (broadcastRight) broadcast(r0) else r0
    val joined = l.join(r, l(leftOn) === r(rightOn), sparkHow)
    val out = sparkHow match {
      case "left_semi" | "left_anti" => joined
      case _ if leftOn == rightOn => joined.drop(r(rightOn))
      case _ => joined
    }
    new DataStream(out)
  }
  /** Single shared-name key variant; `how` is explicit-by-name only to
    * avoid ambiguity with (leftOn, rightOn). */
  def joinKey(right: DataStream, on: String, how: String = "inner"): DataStream =
    join(right, on, on, how)
  /** Raw-condition join (theta/range residues — reference handles non-equi
    * conjuncts as post-join filters, sql_executors.py:379-450; Catalyst
    * extracts equi parts + residual natively). */
  def joinOn(right: DataStream, cond: Column, how: String = "inner"): DataStream =
    new DataStream(df.join(right.df, cond, how))

  // ---- dedup / distinct (datastream.py:1369-1418) ---------------------
  def distinct(keys: Seq[String] = Nil): DataStream =
    if (keys.isEmpty) new DataStream(df.distinct())
    else new DataStream(df.select(keys.map(col): _*).distinct())
  def dropDuplicates(keys: Seq[String]): DataStream =
    new DataStream(df.dropDuplicates(keys))

  // ---- aggregation (datastream.py:1605-2063) --------------------------
  def groupby(keys: String*): GroupedDataStream = new GroupedDataStream(df, keys)
  /** Global aggregate from a {col → op} spec (reference `agg`). Ops:
    * sum|avg|mean|min|max|count|std|var; key "*" with "count" = row count. */
  def agg(spec: Map[String, String]): DataStream =
    new DataStream(df.agg(GroupedDataStream.specToCols(spec).head,
      GroupedDataStream.specToCols(spec).tail: _*))
  /** Reference call-site alias (`aggregate`, datastream.py:1966). */
  def aggregate(spec: Map[String, String]): DataStream = agg(spec)
  /** Arbitrary SQL aggregation expressions (reference `agg_sql`,
    * datastream.py:1934-1960 — its partial/final decomposition is
    * Catalyst-automatic here). */
  def aggSql(exprs: String*): DataStream =
    new DataStream(df.agg(expr(exprs.head), exprs.tail.map(expr): _*))
  def count(): Long = df.count()
  private def aggAll(cols: Seq[String], op: String): DataStream = {
    val exprs = cols.map(c => expr(s"$op($c)").as(s"${c}_$op"))
    new DataStream(df.agg(exprs.head, exprs.tail: _*))
  }
  def sum(cols: String*): DataStream = aggAll(cols, "sum")
  def max(cols: String*): DataStream = aggAll(cols, "max")
  def min(cols: String*): DataStream = aggAll(cols, "min")
  def mean(cols: String*): DataStream = aggAll(cols, "avg")
  /** Exact distinct count (reference datastream.py:1769-1816; warns OOM —
    * Spark's is shuffle-based and scales). */
  def countDistinct(cols: String*): DataStream =
    new DataStream(df.agg(count_distinct(col(cols.head), cols.tail.map(col): _*)
      .as("count_distinct")))
  /** Scalable approximate variant (reference lacks it; parity-plus). */
  def approxCountDistinct(c: String, rsd: Double = 0.05): DataStream =
    new DataStream(df.agg(approx_count_distinct(col(c), rsd).as("approx_count_distinct")))

  /** Approximate quantiles. The reference does t-digest-per-partition then
    * *mean of per-partition quantiles* (datastream.py:926-930 — an
    * approximation of the approximation); we use Spark's Greenwald-Khanna
    * (`approx_percentile`), which is strictly better-behaved. Documented
    * semantic divergence per SURVEY §7.4. */
  def approximateQuantile(c: String, quantiles: Seq[Double], accuracy: Int = 10000): DataStream =
    new DataStream(df.agg(percentile_approx(col(c),
      array(quantiles.map(lit): _*), lit(accuracy)).as("quantiles")))
  /** Median sugar (reference `approximate_median`, datastream.py:1033). */
  def approximateMedian(c: String, accuracy: Int = 10000): DataStream =
    approximateQuantile(c, Seq(0.5), accuracy)
  /** Multi-column form — one pass, one agg: every column's sketch is a
    * partial-aggregable `approx_percentile`, so N columns is one
    * map-side-combined job, not N jobs. WIDTH LIMIT (measured r15,
    * BASELINE_MEASURED.md): fine to hundreds of columns, but at the
    * reference's 1M×10k winsorization scale (blog/approxquant.md) the
    * per-task QuantileSummaries head buffers (~50k doubles per column)
    * OOM — exactly the failure the reference pins on stock
    * `approxQuantile`. Use [[approximateQuantileWide]] past ~1k
    * columns. */
  def approximateQuantile(cs: Seq[String], quantiles: Seq[Double],
      accuracy: Int): DataStream = {
    require(cs.nonEmpty, "approximateQuantile needs at least one column")
    val exprs = cs.map(c => percentile_approx(col(c),
      array(quantiles.map(lit): _*), lit(accuracy)).as(s"${c}_quantiles"))
    new DataStream(df.agg(exprs.head, exprs.tail: _*))
  }

  /** Extreme-width form — the reference call shape
    * `approximate_quantile(stream.schema, [...])` over ALL columns of a
    * 10k-column stream at once (apps/andy.py:20, the "1M×10k in ~1
    * minute" workload, blog/approxquant.md). Per-partition arrays of
    * compression-bounded merging t-digests via `mapPartitions` —
    * constant task memory in row count AND no N-column expression tree
    * (see [[graft.agg.WideQuantiles]] for the measured failure modes
    * this avoids). Same output shape as [[approximateQuantile]]:
    * one `<col>_quantiles` array column per input column. EAGER like
    * [[exactQuantile]] — the digests reduce at call time. */
  def approximateQuantileWide(cs: Seq[String], quantiles: Seq[Double],
      compression: Int = 100): DataStream =
    new DataStream(graft.agg.WideQuantiles.quantiles(df, cs, quantiles,
      compression))

  /** Per-ELEMENT quantiles over one fixed-width array column — the
    * layout a 10k-feature table should be stored in (single-field
    * parquet schema keeps the vectorized reader engaged where a
    * 10k-column schema falls off at `spark.sql.codegen.maxFields`);
    * see [[graft.agg.WideQuantiles.quantilesOfArray]] (r17). */
  def approximateQuantileWideArray(arrCol: String, width: Int,
      quantiles: Seq[Double], compression: Int = 100,
      namePrefix: String = "f"): DataStream =
    new DataStream(graft.agg.WideQuantiles.quantilesOfArray(df, arrCol,
      width, quantiles, compression, namePrefix))
  /** Reference-parity t-digest quantiles (the reference wraps a native
    * t-digest per partition, datastream.py:957-998; ours MERGES partial
    * digests instead of averaging per-partition quantiles — see
    * graft.agg.TDigestQuantiles). */
  def tdigestQuantile(c: String, quantiles: Seq[Double],
      compression: Int = 100): DataStream = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new graft.agg.TDigestQuantiles(quantiles, compression)
    new DataStream(df.select(col(c).cast("double")).as[Double]
      .select(agg.toColumn.name("quantiles")).toDF())
  }

  /** PER-GROUP merging t-digest quantiles — the grouped approximate
    * companion to the exact per-group order statistics (q219's
    * median/MAD, q53's global selection): one sketch per group, built
    * from mergeable partials (map-combined — a hot group costs one
    * digest per partition, never a buffered sort), `values(i)` aligned
    * with `quantiles(i)`. The open-cardinality scale path when groups ×
    * values outgrow the exact window sorts. */
  def tdigestQuantileBy(groupCol: String, c: String,
      quantiles: Seq[Double], compression: Int = 100): DataStream = {
    val agg = new graft.agg.TDigestQuantiles(quantiles, compression)
    val u = org.apache.spark.sql.functions.udaf(agg,
      org.apache.spark.sql.Encoders.scalaDouble)
    // NULL filter up front: the primitive-Double udaf would decode a
    // NULL as 0.0 and silently fold it into the digest. SQL aggregate
    // semantics ignore nulls; a group whose values are ALL null is
    // dropped (same contract as groupMedianMad).
    new DataStream(df.filter(col(c).isNotNull).groupBy(col(groupCol))
      .agg(u(col(c).cast("double")).as("__qv"))
      .select(col(groupCol), col("__qv.values").as("values")))
  }

  /** Exact interpolated quantiles (oracle-verifiable correctness).
    * EAGER — unlike every other DataStream method: it runs
    * graft.agg.OrderStat's range-exchange selection jobs AT CALL TIME
    * (the scalable exact path — Spark's `percentile` aggregate merges a
    * value→count map that is row-count-sized on distinct doubles) and
    * returns the points as a one-row frame; no later action is needed
    * to trigger the work. Bit-compatible with the built-in `percentile`
    * (same interpolation expression) INCLUDING the empty-input case: a
    * column with no non-null rows yields a NULL array — the built-in's
    * exact shape (not an array of null points). */
  def exactQuantile(c: String, quantiles: Seq[Double]): DataStream = {
    val points = graft.agg.OrderStat.exactPercentilesOpt(df, c, quantiles)
      .map(qs => array(qs.toSeq.map(lit): _*))
      .getOrElse(lit(null).cast("array<double>"))
    new DataStream(df.sparkSession.range(1)
      .select(points.as("quantiles")))
  }

  // ---- sorts / top-k (datastream.py:1702-1767) ------------------------
  /** Global top-k — Spark plans this as TakeOrderedAndProject, i.e. the
    * reference's partial-topk-then-merge (sql_executors.py:45-67) for free. */
  def topK(sortCols: Seq[String], k: Int, descending: Boolean = false): DataStream = {
    val ordering = sortCols.map(c => if (descending) col(c).desc else col(c).asc)
    new DataStream(df.orderBy(ordering: _*).limit(k))
  }
  def sort(sortCols: Seq[String], descending: Boolean = false): DataStream = {
    val ordering = sortCols.map(c => if (descending) col(c).desc else col(c).asc)
    new DataStream(df.orderBy(ordering: _*))
  }

  // ---- ordered / vector entry points ----------------------------------
  /** Declare a sortedness contract, yielding the ordered-operator surface
    * (reference OrderedStream, orderedstream.py:3). */
  def asOrdered(timeCol: String): OrderedStream = new OrderedStream(df, timeCol)

  // ---- vector / ML-adjacent delegates: the reference puts these ON the
  // DataStream (datastream.py gramian:1033 / covariance:1100 /
  // vector_nn_join:1900 / vector_range_join), so a switching user keeps
  // the same call sites; implementations live in graft.vector / graft.dedup.

  /** XᵀX over a column list (reference `gramian`). */
  def gramian(cols: Seq[String], demean: Boolean = false): DataStream =
    new DataStream(graft.vector.VectorOps.gramian(df, cols, demean))

  /** Pairwise population covariance entries (reference `covariance`). */
  def covariance(cols: Seq[String]): DataStream =
    new DataStream(graft.vector.VectorOps.covariance(df, cols))

  /** Brute-force cosine top-k against a broadcast probe set (reference
    * `vector_nn_join`); for large probe sets use graft.vector.Ann. */
  def vectorNnJoin(
      probes: DataStream, vecCol: String, idCol: String,
      probeIdCol: String, k: Int): DataStream =
    new DataStream(graft.vector.VectorOps.nnJoin(
      df, probes.df, vecCol, idCol, probeIdCol, k))

  /** Threshold cosine pairs within a blocking key — the working form of
    * the reference's stubbed `vector_range_join`. */
  def vectorRangeJoin(
      idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataStream =
    new DataStream(graft.dedup.Dedup.embeddingNearDupPairs(
      df, idCol, vecCol, blockCol, threshold))

  // ---- multimodal fingerprint delegates (round 10): perceptual hashes
  // over a binary blob column and the shared hamming near-dup join, so
  // the image/audio/video dedup pipeline reads as DataStream call
  // chains like every other operator family.

  /** 64-bit image dHash per blob row (real decode;
    * graft.multimodal.Multimodal.imagePHash) → (idCol, ok, phash). */
  def imagePHash(idCol: String, blobCol: String): DataStream =
    new DataStream(graft.multimodal.Multimodal.imagePHash(df, idCol, blobCol))

  /** 64-bit audio energy-envelope fingerprint per blob row. */
  def audioPHash(idCol: String, blobCol: String): DataStream =
    new DataStream(graft.multimodal.Multimodal.audioPHash(df, idCol, blobCol))

  /** 64-bit video temporal-brightness fingerprint per blob row. */
  def videoPHash(idCol: String, blobCol: String): DataStream =
    new DataStream(graft.multimodal.Multimodal.videoPHash(df, idCol, blobCol))

  /** Near-dup pairs over a 64-bit hash column via lossless combination
    * hamming banding (graft.dedup.Dedup.hammingNearDupPairs). */
  def hammingNearDup(idCol: String, hashCol: String, maxHamming: Int,
      numBands: Int = 4, maxBucket: Option[Int] = None): DataStream =
    new DataStream(graft.dedup.Dedup.hammingNearDupPairs(
      df, idCol, hashCol, maxHamming, numBands, maxBucket))

  /** Salted inner equi-join for skewed keys. AQE's skew-join split
    * covers sort-merge joins at runtime; this is the manual fallback
    * when one key floods a partition anyway (hash joins, or a skew AQE
    * cannot see). This side gets a salt in [0, salt) from its row
    * position (`monotonically_increasing_id` — deterministic per task,
    * and crucially it spreads DUPLICATE rows too: a hot key made of
    * identical rows is the common skew shape, and a row-content hash
    * would put all of them in one bucket, defeating the salt); the right
    * side is replicated `salt` times, so the hot key spreads over `salt`
    * reducers at the cost of replicating the (smaller) right side.
    * Results equal a plain inner join (spec-checked). */
  def saltedJoin(
      right: DataStream, leftOn: String, rightOn: String,
      salt: Int): DataStream = {
    require(salt > 0, "salt must be positive")
    val l = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val r = right.df
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    new DataStream(
      l.join(r, l(leftOn) === r(rightOn) && l("__salt") === r("__salt"))
        .drop("__salt"))
  }
}

/** Result of `groupby` (reference GroupedDataStream, datastream.py:2066). */
class GroupedDataStream(private val df: DataFrame, val keys: Seq[String]) {
  private def grouped = df.groupBy(keys.map(col): _*)
  /** {col → op} aggregation (reference datastream.py:2125-2160). */
  def agg(spec: Map[String, String]): DataStream = {
    val cols = GroupedDataStream.specToCols(spec)
    new DataStream(grouped.agg(cols.head, cols.tail: _*))
  }
  /** Arbitrary SQL agg expressions (reference grouped `agg_sql`). */
  def aggSql(exprs: String*): DataStream =
    new DataStream(grouped.agg(expr(exprs.head), exprs.tail.map(expr): _*))

  /** Wide transpose per group — one column per pivot value (the reference
    * builds this shape imperatively in apps/rottnest/transpose.py's
    * Builder executor: partition by symbol, emit wide rows). `values`
    * must be enumerated: an implicit pivot runs a distinct-values
    * pre-job, i.e. a second full scan at 100 TB. */
  def pivot(c: String, values: Seq[Any], spec: Map[String, String]): DataStream = {
    val cols = GroupedDataStream.specToCols(spec)
    new DataStream(grouped.pivot(c, values).agg(cols.head, cols.tail: _*))
  }

  /** Two-stage salted aggregation for skewed group keys. Catalyst's
    * partial aggregation already combines map-side, but a key that
    * dominates the data still lands its entire partial stream on ONE
    * reducer; salting splits stage one over (keys, salt) — `salt`
    * reducers share the hot key — and stage two re-combines the salted
    * partials. Supports the decomposable ops (sum/count/min/max and
    * mean via sum+count); results equal `agg` (spec-checked). */
  def aggSalted(spec: Map[String, String], salt: Int): DataStream = {
    require(salt > 0, "salt must be positive")
    // position-based salt, not row-content hash: duplicate hot rows (the
    // common skew shape) must spread across buckets too
    val saltCol = pmod(monotonically_increasing_id(), lit(salt.toLong))
    val stage1 = spec.toSeq.map {
      case ("*", "count") => F.count(lit(1)).as("__p_count")
      case (c, "sum") => sum(col(c)).as(s"__p_${c}_sum")
      case (c, "min") => min(col(c)).as(s"__p_${c}_min")
      case (c, "max") => max(col(c)).as(s"__p_${c}_max")
      case (c, "count") => F.count(col(c)).as(s"__p_${c}_count")
      case (c, "avg" | "mean") => sum(col(c)).as(s"__p_${c}_s")
      case (c, op) => throw new IllegalArgumentException(
        s"aggSalted supports decomposable ops only, got $op($c)")
    } ++ spec.collect { case (c, "avg" | "mean") =>
      F.count(col(c)).as(s"__p_${c}_n")
    }
    val partial = df.groupBy((keys.map(col) :+ saltCol.as("__salt")): _*)
      .agg(stage1.head, stage1.tail: _*)
    val stage2 = spec.toSeq.map {
      case ("*", "count") => sum(col("__p_count")).as("count")
      case (c, "sum") => sum(col(s"__p_${c}_sum")).as(c + "_sum")
      case (c, "min") => min(col(s"__p_${c}_min")).as(c + "_min")
      case (c, "max") => max(col(s"__p_${c}_max")).as(c + "_max")
      case (c, "count") => sum(col(s"__p_${c}_count")).as(c + "_count")
      case (c, "avg" | "mean") =>
        (sum(col(s"__p_${c}_s")) / sum(col(s"__p_${c}_n"))).as(c + "_mean")
      case (c, op) => throw new IllegalArgumentException(op)
    }
    new DataStream(partial.groupBy(keys.map(col): _*)
      .agg(stage2.head, stage2.tail: _*))
  }
  def count(): DataStream = new DataStream(grouped.count())
  def countDistinct(cols: String*): DataStream =
    new DataStream(grouped.agg(count_distinct(col(cols.head), cols.tail.map(col): _*)
      .as("count_distinct")))
  /** Co-partitioned two-input custom operator (reference `cogroup`,
    * datastream.py:2073-2111) — exact analog of KeyValueGroupedDataset.cogroup. */
  def cogroup[K: Encoder, T: Encoder](
      other: GroupedDataStream, keyExtract: Row => K)(
      f: (K, Iterator[Row], Iterator[Row]) => Iterator[T]): org.apache.spark.sql.Dataset[T] =
    df.groupByKey(keyExtract).cogroup(other.df.groupByKey(keyExtract))(f)
}

object GroupedDataStream {
  private[api] def specToCols(spec: Map[String, String]): Seq[Column] =
    spec.toSeq.map {
      case ("*", "count") => count(lit(1)).as("count")
      case (c, "sum") => sum(col(c)).as(c + "_sum")
      case (c, "avg" | "mean") => avg(col(c)).as(c + "_mean")
      case (c, "min") => min(col(c)).as(c + "_min")
      case (c, "max") => max(col(c)).as(c + "_max")
      case (c, "count") => count(col(c)).as(c + "_count")
      case (c, "std") => stddev(col(c)).as(c + "_std")
      case (c, "var") => variance(col(c)).as(c + "_var")
      case (c, op) => expr(s"$op($c)").as(s"${c}_$op")
    }
}
