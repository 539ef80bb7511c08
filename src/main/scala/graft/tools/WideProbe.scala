package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for the winsorization headline
  * (blog/approxquant.md:31 — 1M×10k approx-quantiles in ~60 s on 32
  * vCPUs): splits the engine path into (a) the data-production floor —
  * same projected plan driven through `queryExecution.toRdd` with a
  * no-op consumer, i.e. the cost of merely producing every InternalRow
  * — and (b) the full `WideQuantiles.quantiles` pass, so the t-digest
  * kernel's marginal cost over the scan is measured, not guessed
  * (the r15 verdict's 441 s had no such split, which is how ~10¹⁰
  * boxed Doubles hid in plain sight; the r16 split then showed the
  * remaining 162 s was rand() SYNTHESIS, not the engine at all —
  * the reference reads its 10k-float dataset from parquet).
  *
  * Two modes:
  *   `sbt "runMain graft.tools.WideProbe [cols rows]"` — in-memory
  *     rand() source (generation cost included, floor row shows it);
  *   `sbt "runMain graft.tools.WideProbe cols rows parquetDir"` —
  *     builds a float-column parquet fixture at parquetDir ONCE
  *     (behind a _BUILD_COMPLETE sentinel, untimed — the reference's
  *     own methodology starts from stored parquet), then times the
  *     scan floor and the quantile pass over the stored data. */
object WideProbe {

  /** Build the float parquet fixture if absent. Returns build seconds
    * (0.0 if the sentinel was already present). */
  def ensureFixture(spark: SparkSession, dir: String, wide: Int,
      rows: Long): Double = {
    val sentinel = new java.io.File(dir, "_BUILD_COMPLETE")
    if (sentinel.exists()) return 0.0
    val t0 = System.nanoTime()
    // float columns — the reference's fixture shape ("10k floating
    // point columns"); rand(seed) keeps the build deterministic.
    // Writer tuning for 10k RANDOM-float columns: dictionary encoding
    // would hash-insert every value into a per-column dict before
    // inevitably falling back (10⁹ wasted boxed inserts at build
    // scale), and snappy can't compress random mantissas — both off.
    spark.range(rows).select(
        (0 until wide).map(i => rand(42L + i).cast("float").as(s"f$i")): _*)
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("compression", "uncompressed")
      .parquet(dir)
    require(sentinel.createNewFile(), s"could not stamp $sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Array-layout decomposition (r17): stages over the stored
    * single-column array<float> fixture. The scan/access floors apply
    * the same width-aware columnar batch cap the kernel itself uses —
    * without it the floor stages OOM exactly like the kernel would. */
  private def probeArray(spark: SparkSession, dir: String,
      wide: Int): Unit = {
    // the kernel's OWN cap (shared helper — a tuning change to the
    // kernel formula must move the probe's floors with it)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
      graft.agg.WideQuantiles.columnarBatchCap(wide).toString)
    spark.conf.set(
      "spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
    def data(): DataFrame = spark.read.parquet(dir).select(col("vec"))
    val plan = data().queryExecution.executedPlan.toString
    val batched = plan.linesIterator.find(_.contains("Batched"))
      .getOrElse("").trim.take(200)
    println(s"[wideprobe] array scan: $batched")
    def timed(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[wideprobe] $tag%-28s ${s}%8.2f s  (array[$wide])")
      s
    }
    val fullOnly = sys.env.get("GRAFT_PROBE_STAGES").contains("full")
    val gen = if (fullOnly) 0.0 else timed("scan floor (toRdd, no-op)") {
      data().queryExecution.toRdd.foreachPartition { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        require(n >= 0)
      }
    }
    val acc = if (fullOnly) 0.0 else timed("element access (toRdd, sum)") {
      data().queryExecution.toRdd.foreachPartition { it =>
        var s = 0.0
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) {
            val a = row.getArray(0)
            val n = a.numElements()
            var j = 0
            while (j < n) {
              if (!a.isNullAt(j)) s += a.getFloat(j).toDouble
              j += 1
            }
          }
        }
        require(!s.isNaN)
      }
    }
    // ingest-only: the full per-partition t-digest ingestion with NO
    // treeAggregate — partials die in place. full − ingest ≈ the
    // merge/ship phase (64 width-sized partials through the RDD
    // serializer + the driver-side centroid merges).
    val w = wide
    val ingest = if (fullOnly) 0.0 else timed("ingest only (no merge)") {
      graft.agg.WideQuantiles.boundedPartials(data()).foreachPartition { it =>
        val ing = new graft.agg.WideDigestIngest(w, 100)
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0)) {
            val a = row.getArray(0)
            // same length guard as the kernel: reading past
            // numElements() on a ColumnarArray is NOT bounds-checked
            // and would silently measure a different workload
            require(a.numElements() == w,
              s"fixture width ${a.numElements()} != probe width $w")
            var j = 0
            while (j < w) {
              if (!a.isNullAt(j)) ing.add(j, a.getFloat(j).toDouble)
              j += 1
            }
          }
        }
        require(ing.states().length == w)
      }
    }
    // full mode runs the pass three times (cold + 2) — the same
    // warm+min-of-2 discipline as the BaselineBench row, because this
    // box's page cache barely fits the 38 GB fixture and single runs
    // swing >2× on cache state alone (measured r17)
    val passes = if (fullOnly) 3 else 1
    var full = Double.MaxValue
    var p = 0
    while (p < passes) {
      val t = timed(s"quantilesOfArray pass$p") {
        val row = graft.agg.WideQuantiles.quantilesOfArray(
          data(), "vec", wide, Seq(0.1, 0.9)).head()
        require(row.size == wide)
      }
      if (p > 0 || passes == 1) full = math.min(full, t)
      p += 1
    }
    if (!fullOnly)
      println(f"[wideprobe] kernel marginal cost       ${full - acc}%8.2f s " +
        f"over element access (floor ${gen}%.2f s, access +${acc - gen}%.2f s, " +
        f"ingest ${ingest}%.2f s, merge/ship +${full - ingest}%.2f s)")
  }

  def main(args: Array[String]): Unit = {
    val wide = if (args.length > 0) args(0).toInt else 2000
    val rows = if (args.length > 1) args(1).toLong else 200000L
    val parquetDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // extra confs for A/B runs, ';'-separated k=v
    // (e.g. SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.maxFields=12000")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_WIDE_LAYOUT=array (r17): probe the SHIPPED storage layout —
    // one array<float> column of length `wide` (BaselineBench's
    // apples-to-apples fixture, target/wide_arr_{rows}x{cols}/t.parquet)
    // instead of the 10k-COLUMN schema. Same three stages: scan floor
    // (produce every InternalRow, no consumer), element-access floor
    // (walk every array element, no kernel), full quantile pass.
    if (sys.env.get("GRAFT_WIDE_LAYOUT").contains("array")) {
      val dir = parquetDir.getOrElse(sys.error(
        "array layout probe needs the fixture dir as the third arg"))
      probeArray(spark, dir, wide)
      spark.stop()
      return
    }
    val names = (0 until wide).map(i => s"f$i")

    def data(): DataFrame = parquetDir match {
      case Some(dir) => spark.read.parquet(dir)
      // GRAFT_WIDE_SRC=hash: deterministic uniform columns from
      // xxhash64(id, i) — same distributional shape as rand(seed+i),
      // but deterministic, so whole-stage codegen can compile the
      // 10k-wide projection (rand() is nondeterministic and its
      // interpreted eval dominates the synthesis floor)
      case None if sys.env.get("GRAFT_WIDE_SRC").contains("hash") =>
        spark.range(rows).select((0 until wide).map(i =>
          (pmod(xxhash64(col("id"), lit(i)), lit(1048576L))
            .cast("double") / 1048576.0).as(s"f$i")): _*)
      case None => spark.range(rows).select(
        (0 until wide).map(i => rand(42L + i).as(s"f$i")): _*)
    }

    parquetDir.foreach { dir =>
      val b = ensureFixture(spark, dir, wide, rows)
      if (b > 0) println(f"[wideprobe] fixture build (untimed)    ${b}%8.2f s  -> $dir")
      else println(s"[wideprobe] fixture present: $dir")
    }

    def timed(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[wideprobe] $tag%-28s ${s}%8.2f s  ($wide cols x $rows rows)")
      s
    }

    // GRAFT_PROBE_STAGES=full skips the floor/access stages — a cold
    // single-pass measurement identical to BaselineBench's timed block
    // (the multi-stage decomposition warms JIT between stages and can
    // flatter or distort the later ones)
    val fullOnly = sys.env.get("GRAFT_PROBE_STAGES").contains("full")

    // scan mode: Batched true = vectorized columnar reader
    if (!fullOnly) locally {
      val plan = data().select(names.map(col): _*)
        .queryExecution.executedPlan.toString
      val batched = plan.linesIterator.find(_.contains("Batched"))
        .getOrElse(plan.linesIterator.take(3).mkString(" | ").take(200))
      println(s"[wideprobe] scan: ${batched.trim.take(200)}")
    }

    // (a) data-production floor: the same pruned projection the
    // quantile pass consumes, driven to exhaustion with no consumer
    val gen = if (fullOnly) 0.0 else timed(
      if (parquetDir.isDefined) "scan floor (toRdd, no-op)"
      else "generate (toRdd, no-op)") {
      val proj = data().select(names.map(col): _*)
      proj.queryExecution.toRdd.foreachPartition { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        require(n >= 0)
      }
    }
    // (a') field-access floor: floor + isNullAt/getFloat/getDouble on
    // every field (no kernel) — isolates row-view access cost
    val acc = if (fullOnly) 0.0 else timed("field access (toRdd, sum)") {
      val proj = data().select(names.map(col): _*)
      val types = proj.schema.fields.map(_.dataType ==
        org.apache.spark.sql.types.FloatType)
      val ncc = names.length
      proj.queryExecution.toRdd.foreachPartition { it =>
        var s = 0.0
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < ncc) {
            if (!row.isNullAt(i))
              s += (if (types(i)) row.getFloat(i).toDouble
                    else row.getDouble(i))
            i += 1
          }
        }
        require(!s.isNaN)
      }
    }
    // (b) the full engine pass
    val full = timed("approximateQuantileWide") {
      val row = new graft.api.DataStream(data())
        .approximateQuantileWide(names, Seq(0.1, 0.9)).df.head()
      require(row.size == wide)
    }
    if (!fullOnly)
      println(f"[wideprobe] kernel marginal cost       ${full - acc}%8.2f s " +
        f"over field access (floor ${gen}%.2f s, access +${acc - gen}%.2f s)")
    spark.stop()
  }
}
