package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout half of scan pruning at
  * 100 TB: interleaving the bits of two scan keys makes rows close in
  * BOTH dimensions land close in the sort order, so parquet row-group /
  * file min-max stats stay tight on BOTH columns at once and a reader
  * filtering on either key (or both) skips most of the corpus. A plain
  * sort gives that property to its leading column only; Z-order is what
  * lakehouse engines (Delta OPTIMIZE ZORDER, Iceberg sort orders) use,
  * re-expressed here over the same parquet+footer-stats machinery
  * [[graft.api.QContext]] already reads (the reference's sorted-parquet
  * range checks, pyquokka/ordered_readers.py, are the 1-D special case).
  *
  * Everything is pure integer bit arithmetic — deterministic and
  * engine-portable ([[mortonSql]] emits the identical computation for
  * the oracle). Inputs must be non-negative and fit in `bits` bits;
  * higher bits are silently ignored (codes collide), the standard
  * Z-order contract.
  */
object Zorder {

  /** Morton code of two non-negative longs: bit i of `a` → bit 2i, bit
    * i of `b` → bit 2i+1, for i < bits (≤ 31, so the code fits long).
    * Pure shift/mask arithmetic — stays in whole-stage codegen. */
  def morton(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc + shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** The identical Morton computation as engine-neutral SQL (DuckDB /
    * ANSI bit operators) — single source for the oracle mirror. */
  def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})",
        s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** (input columns, zcode, bucket): bucket = zcode >> bucketShift — a
    * contiguous Z-range, i.e. a rectangle-ish region of the (a, b) key
    * plane. Buckets are the write granularity: co-bucketed rows are
    * close in both keys. */
  private def requireNoClash(df: DataFrame, added: Set[String],
      op: String): Unit = {
    val clash = df.columns.toSet.intersect(added)
    require(clash.isEmpty,
      s"$op adds columns ${clash.mkString(", ")} the input already has " +
        "— rename them first (withColumn would silently overwrite)")
  }

  def zorderBuckets(df: DataFrame, aCol: String, bCol: String, bits: Int,
      bucketShift: Int): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift must be in [0, ${2 * bits}), got $bucketShift")
    requireNoClash(df, Set("zcode", "bucket"), "zorderBuckets")
    df.withColumn("zcode", morton(col(aCol), col(bCol), bits))
      .withColumn("bucket", shiftright(col("zcode"), bucketShift))
  }

  /** (input columns, zcode, bucket) with AT MOST `numRanges` buckets of
    * equal Z-width at ANY data scale: bucket = ⌊zcode·numRanges /
    * (max(zcode)+1)⌋ — the layout planner's file-count control, where
    * [[zorderBuckets]]'s fixed prefix would yield one giant bucket on a
    * small key domain and millions on a large one. The max is a one-row
    * aggregate broadcast back (scalar cross join); all arithmetic is
    * integer, so bucketing is deterministic and engine-portable. */
  def zorderRanges(df: DataFrame, aCol: String, bCol: String, bits: Int,
      numRanges: Int): DataFrame = {
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    // zcode < 2^(2·bits); the bucket multiply must stay inside int64
    // (Spark's non-ANSI long arithmetic would wrap SILENTLY into
    // negative buckets while the oracle mirror errors or disagrees)
    require((BigInt(numRanges) << (2 * bits)) <= (BigInt(1) << 62),
      s"numRanges ($numRanges) × 2^${2 * bits} overflows the int64 " +
        "bucket arithmetic — lower bits or numRanges")
    requireNoClash(df, Set("zcode", "bucket", "__mz"), "zorderRanges")
    val z = df.withColumn("zcode", morton(col(aCol), col(bCol), bits))
    val mx = z.agg(max(col("zcode")).as("__mz"))
    z.crossJoin(broadcast(mx))
      .withColumn("bucket", expr(s"zcode * $numRanges div (__mz + 1)"))
      .drop("__mz")
  }

  /** Write `df` parquet Z-clustered on (aCol, bCol): RANGE-repartition
    * on the Morton code — every output file holds one contiguous,
    * internally-sorted Z-range, so footer min/max stats per file are
    * tight on BOTH key columns (the scan-pruning contract the object
    * doc describes). A hash repartition on Z-buckets was tried first
    * and is WRONG here: hashing coalesces arbitrary, spatially-distant
    * buckets into one file, and a single wrapped file re-widens both
    * extents to the full domain (caught by LayoutProfileSpec). Range
    * boundaries come from Spark's seeded range sampler — deterministic
    * for a fixed input, approximately equal-row files by construction. */
  def writeZordered(df: DataFrame, path: String, aCol: String, bCol: String,
      bits: Int, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    requireNoClash(df, Set("zcode"), "writeZordered")
    df.withColumn("zcode", morton(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("zcode"))
      .sortWithinPartitions(col("zcode"))
      .drop("zcode")
      .write.mode("overwrite").parquet(path)
  }
}
