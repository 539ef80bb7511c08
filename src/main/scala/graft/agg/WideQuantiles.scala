package graft.agg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Extreme-width approximate quantiles — the reference's winsorization
  * headline workload (blog/approxquant.md: per-column quantiles over 1M
  * rows × 10k float columns; its answer was a custom C++ t-digest bound
  * into the engine, "Spark's approxQuantile method always crashes").
  *
  * Why the expression-tier forms fail at this width (measured r15,
  * BASELINE_MEASURED.md): both stock `df.stat.approxQuantile` and a
  * 10k-wide `percentile_approx` aggregate allocate a QuantileSummaries
  * PER COLUMN PER TASK, each with a ~50k-element head buffer before its
  * first compaction — 10k columns × 50k doubles × concurrent tasks is
  * hundreds of GiB of transient buffer, an OOM regardless of data size.
  * The plan layer adds its own wall: a 10k-aggregate expression tree
  * blows past janino's method limits into interpreted mode.
  *
  * This operator is the Spark-first restatement of the reference's
  * design: ONE pass with `mapPartitions`, an array of `compression`-
  * bounded t-digests per task (10k columns × ~100 centroids × 16 B ≈
  * 16 MiB — constant in row count), partials combined by a
  * column-sliced single-shuffle merge. No 10k-column expression tree
  * ever reaches Catalyst;
  * the only plan is the cast projection. Shares [[TDigest]]'s kernel
  * with the typed Aggregator, so narrow and wide paths cannot drift.
  *
  * Contract: nulls are skipped per column (SQL aggregate semantics);
  * NaN raises loudly (a NaN would silently poison the centroid sort —
  * same discipline as centroidDrift/ksDrift). All-null columns emit
  * NaN quantiles. Like the typed Aggregator path (whose partial-agg
  * combine order Spark schedules), the block merge's arrival order is
  * scheduler-dependent: repeated runs yield different-but-equally-valid
  * digests within the sketch's rank bound, not bit-identical values —
  * the established sketch contract (q96/q222 pin rank bounds, never
  * hashes). */
object WideQuantiles {

  /** One row, one `<col>_quantiles` array column per input column,
    * values aligned with `qs`. */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double],
      compression: Int = 100): DataFrame = {
    require(cols.nonEmpty, "wide quantiles need at least one column")
    require(qs.nonEmpty, "wide quantiles need at least one quantile")
    require(compression > 0, s"compression must be positive, got $compression")
    val spark = df.sparkSession
    val nc = cols.length
    // Type-aware projection (r16): a float or double column is read
    // IN PLACE via getFloat/getDouble — casting would rebuild a
    // 10k-field UnsafeRow per input row (an 80 KB copy each) just to
    // widen floats the kernel can widen itself. Only non-fractional
    // types get a per-column cast. For a float parquet source (the
    // reference's own fixture shape, blog/approxquant.md: "10k
    // floating point columns" read from parquet) the scan's pruned
    // columnar rows therefore feed the digests with ZERO per-row copy.
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    // types via the ANALYZER, not StructType.apply (r16 review): a
    // schema lookup is case-sensitive-exact and rejects qualified
    // names the analyzer resolves fine — the select both validates the
    // names under the session's resolution rules and yields the
    // resolved types positionally
    val srcTypes = df.select(cols.map(c => col(c)): _*)
      .schema.map(_.dataType)
    val proj = df.select(cols.zip(srcTypes).map {
      case (c, DoubleType | FloatType) => col(c)
      case (c, _) => col(c).cast("double")
    }: _*)
    // 1 = float, 0 = double (post-projection non-fractionals are double)
    val typeCodes: Array[Int] = cols.indices.map(i =>
      if (srcTypes(i) == FloatType) 1 else 0).toArray
    val colNames = cols.toArray // avoid closing over the DataFrame
    // queryExecution.toRdd, NOT .rdd (r15 verdict item 1): .rdd adds a
    // deserializer that boxes every value into a GenericRow — at the
    // 1M×10k headline that is ~10¹⁰ boxed Doubles and was measured as
    // a ~7× constant factor over the reference. The projected schema
    // is all float/double, so these are fixed-layout UnsafeRows (or
    // columnar-batch row views) and isNullAt/getFloat/getDouble are
    // allocation-free direct reads. Rows may be reused by the runtime
    // between iterations — fine, values are consumed immediately.
    val merged = boundedPartials(proj)
      .mapPartitions { it =>
        // allocation-free per-task kernel (r17 — see WideDigestIngest):
        // bounded raw buffer + in-place centroid store per column
        val ing = new WideDigestIngest(nc, compression)
        it.foreach { row =>
          var i = 0
          while (i < nc) {
            if (!row.isNullAt(i)) {
              val x = if (typeCodes(i) == 1) row.getFloat(i).toDouble
                      else row.getDouble(i)
              if (x != x) throw new IllegalArgumentException(
                s"wide quantiles: NaN in column ${colNames(i)} — filter " +
                  "or impute NaNs first")
              ing.add(i, x)
            }
            i += 1
          }
        }
        Iterator.single(ing.states())
      }
    val values = mergedQuantiles(merged, nc, compression, qs)
    oneRow(spark, cols.map(c => s"${c}_quantiles"), values, qs)
  }

  /** Column-sliced partial combine (r17 — replaced treeAggregate, which
    * was measured as the DOMINANT slice of the 1M×10k headline: 64
    * width-sized partials ≈ 3 GB of centroids shipped through two
    * shuffle levels of Java-serialized case classes, +41 s over the
    * ingest stage). Each task encodes its states into ~2×parallelism
    * contiguous column-block byte blobs (bulk DoubleBuffer puts — a
    * memcpy), ONE shuffle routes each block's partials to a reducer
    * that merges them streamingly (combineByKey, no map-side combine —
    * blobs ship raw), and reducers emit only the final per-column
    * quantile VALUES — the driver receives kilobytes, never centroids,
    * so driver maxResultSize is out of the picture at any width. Merge
    * order within a block is arrival order (scheduler-dependent), the
    * same documented sketch contract treeAggregate had. An empty RDD
    * (zero partitions or zero collected blocks) degrades to the
    * documented NaN row via the prefilled output. */
  private def mergedQuantiles(
      partials: org.apache.spark.rdd.RDD[Array[TDigestState]],
      width: Int, compression: Int, qs: Seq[Double]): Array[Seq[Double]] = {
    val nBlocks =
      math.min(width, 2 * partials.sparkContext.defaultParallelism)
    val starts =
      Array.tabulate(nBlocks + 1)(b => ((b.toLong * width) / nBlocks).toInt)
    val enc = partials.flatMap { states =>
      (0 until nBlocks).iterator.map { b =>
        (b, TDigest.encodeBlock(states, starts(b), starts(b + 1)))
      }
    }
    val qsArr = qs.toArray
    val collected: Array[(Int, Array[Array[Double]])] = enc
      .combineByKey[Array[TDigestState]](
        (bytes: Array[Byte]) => TDigest.decodeBlock(bytes),
        (acc: Array[TDigestState], bytes: Array[Byte]) => {
          val xs = TDigest.decodeBlock(bytes)
          var i = 0
          while (i < acc.length) {
            acc(i) = TDigest.merge(acc(i), xs(i), compression); i += 1
          }
          acc
        },
        (a: Array[TDigestState], b: Array[TDigestState]) => {
          var i = 0
          while (i < a.length) {
            a(i) = TDigest.merge(a(i), b(i), compression); i += 1
          }
          a
        },
        new org.apache.spark.HashPartitioner(nBlocks),
        mapSideCombine = false)
      .map { case (b, states) =>
        (b, states.map(s =>
          TDigest.quantiles(s, qsArr.toSeq, compression).toArray))
      }
      .collect()
    val out = Array.fill[Seq[Double]](width)(qs.map(_ => Double.NaN))
    collected.foreach { case (b, vals) =>
      var i = 0
      while (i < vals.length) { out(starts(b) + i) = vals(i).toSeq; i += 1 }
    }
    out
  }

  /** Partial-size discipline shared by both kernels (measured r17 on
    * the 1M×10k parquet fixture): a partial is WIDTH-sized — ~8 KB of
    * centroids per column, ~84 MB at 10k columns — and one partial is
    * emitted per input partition, so a 300-split parquet scan ships
    * ~25 GB of partials and overflows spark.driver.maxResultSize at
    * the tree's final fan-in. Coalesce the scan to ≤ 2× parallelism
    * (split-merge, no shuffle — each task just reads more splits, and
    * the per-task digest buffers amortize better) so partial count is
    * bounded by the executor count, not the file count. */
  private[graft] def boundedPartials(proj: DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = {
    val rdd = proj.queryExecution.toRdd
    val cap = 2 * proj.sparkSession.sparkContext.defaultParallelism
    if (rdd.getNumPartitions > cap) rdd.coalesce(cap) else rdd
  }

  /** One in-flight columnar batch ≈ 16 MB of elements: the vectorized
    * parquet reader allocates batchRows × width element vectors per
    * task, and the 4096-row default is ~160 MB/task at 10k floats — a
    * heap OOM at 32 concurrent tasks (measured r17). Shared with
    * WideProbe so the probe's floor stages measure the kernel's own
    * scan configuration. */
  private[graft] def columnarBatchCap(width: Int): Int =
    math.max(64, math.min(4096, 4 * 1024 * 1024 / width))

  /** Set + restore the width-aware scan confs around `f`, serialized
    * JVM-wide. Session confs are global, so two concurrent array-path
    * passes could interleave set/restore and hand a 10k-wide scan the
    * 4096-row default batch — the exact OOM the cap prevents (r17
    * review). The lock is held only across the conf-sensitive window:
    * physical planning + read-RDD construction (`toRdd` captures
    * `parquetVectorizedReaderBatchSize` into the scan's reader closure
    * when FileSourceScanExec builds its RDD), NOT across job
    * execution — callers build their RDD inside `f` and run jobs on it
    * after the lock is released. */
  private val confLock = new Object
  private def withWidthScanConf[T](
      spark: org.apache.spark.sql.SparkSession, width: Int)(f: => T): T =
    confLock.synchronized {
      val batchKey = "spark.sql.parquet.columnarReaderBatchSize"
      // the whole point of the array layout is the vectorized NESTED
      // reader (default on in Spark 4.x, but a session that disabled
      // it would silently fall to parquet-mr's row reader — the
      // ~66 ns/value path this layout exists to avoid); pin it
      val nestedKey = "spark.sql.parquet.enableNestedColumnVectorizedReader"
      val priorBatch = spark.conf.getOption(batchKey)
      val priorNested = spark.conf.getOption(nestedKey)
      spark.conf.set(batchKey, columnarBatchCap(width).toString)
      spark.conf.set(nestedKey, "true")
      try f finally {
        priorBatch match {
          case Some(v) => spark.conf.set(batchKey, v)
          case None => spark.conf.unset(batchKey)
        }
        priorNested match {
          case Some(v) => spark.conf.set(nestedKey, v)
          case None => spark.conf.unset(nestedKey)
        }
      }
    }

  /** Array-layout twin of [[quantiles]] (r17, the apples-to-apples
    * winsorize baseline): per-ELEMENT quantiles over ONE
    * `ArrayType(Float|Double)` column of fixed `width`. This is the
    * layout a 10k-feature dataset should be STORED in: a single-field
    * schema keeps Spark's parquet scan on the vectorized reader (a
    * 10k-COLUMN schema falls past `spark.sql.codegen.maxFields` onto
    * the row-at-a-time parquet-mr path — measured r16, ~66 ns/value),
    * and the elements arrive as one contiguous `ArrayData` per row
    * (`ColumnarArray` straight off the column vector — `getFloat(j)`
    * is an allocation-free direct read, no per-field null word or
    * UnsafeRow walk).
    *
    * Contract mirrors [[quantiles]]: null ROWS and null ELEMENTS are
    * skipped (SQL aggregate semantics), NaN raises loudly, all-null
    * positions emit NaN quantiles. A row whose array length ≠ `width`
    * raises loudly — a ragged batch is a corrupt feature table, not
    * data. Output: one row, `<namePrefix><j>_quantiles` per element
    * position, values aligned with `qs`. */
  def quantilesOfArray(df: DataFrame, arrCol: String, width: Int,
      qs: Seq[Double], compression: Int = 100,
      namePrefix: String = "f"): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(qs.nonEmpty, "wide quantiles need at least one quantile")
    require(compression > 0, s"compression must be positive, got $compression")
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val resolved = df.select(col(arrCol))
    val (proj, isFloat) = resolved.schema.head.dataType match {
      case ArrayType(FloatType, _) => (resolved, true)
      case ArrayType(DoubleType, _) => (resolved, false)
      case ArrayType(_, _) =>
        (resolved.select(col(arrCol).cast("array<double>")), false)
      case other => throw new IllegalArgumentException(
        s"quantilesOfArray: $arrCol must be an array column, got $other")
    }
    val colName = arrCol // avoid closing over the DataFrame
    // the RDD (planning + scan-reader construction) is built under the
    // width-aware scan confs; the jobs it runs later carry the
    // captured values
    val merged = withWidthScanConf(spark, width) {
      boundedPartials(proj)
        .mapPartitions { it =>
          val ing = new WideDigestIngest(width, compression)
          it.foreach { row =>
            if (!row.isNullAt(0)) {
              val a = row.getArray(0)
              val n = a.numElements()
              if (n != width) throw new IllegalArgumentException(
                s"wide quantiles: $colName has length $n, expected $width — " +
                  "ragged feature arrays are corrupt input")
              var j = 0
              while (j < width) {
                if (!a.isNullAt(j)) {
                  val x = if (isFloat) a.getFloat(j).toDouble
                          else a.getDouble(j)
                  if (x != x) throw new IllegalArgumentException(
                    s"wide quantiles: NaN at $colName[$j] — filter or " +
                      "impute NaNs first")
                  ing.add(j, x)
                }
                j += 1
              }
            }
          }
          Iterator.single(ing.states())
        }
    }
    val values = mergedQuantiles(merged, width, compression, qs)
    oneRow(spark,
      (0 until width).map(j => s"$namePrefix${j}_quantiles"), values, qs)
  }

  private def oneRow(spark: org.apache.spark.sql.SparkSession,
      names: Seq[String], values: Array[Seq[Double]],
      qs: Seq[Double]): DataFrame = {
    val row = Row.fromSeq(values.toSeq.map(_.toSeq))
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
  }
}
