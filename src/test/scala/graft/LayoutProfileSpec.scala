package graft

import graft.sources.{Profile, Zorder}
import org.apache.spark.sql.functions._

/** Round-10 layout/profiling tier: Morton Z-order clustering and the
  * single-pass column profiler. */
class LayoutProfileSpec extends SparkSpecBase {

  private def scalarMorton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("morton column equals the scalar bit-interleave reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(1 << 15).toLong, rnd.nextInt(1 << 15).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Zorder.morton(col("a"), col("b"), 15).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == scalarMorton(a, b, 15), s"($a,$b)")
    }
  }

  test("z-order buckets are tight on BOTH keys where a sort is not") {
    val s = spark
    import s.implicits._
    // full 64x64 grid: every bucket's extent is measurable exactly
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val ranges = Zorder.zorderRanges(grid.toDF("a", "b"), "a", "b",
        bits = 6, numRanges = 16)
      .groupBy("bucket")
      .agg((max("a") - min("a")).as("spanA"),
        (max("b") - min("b")).as("spanB"), count(lit(1)).as("n"))
      .collect()
    assert(ranges.length == 16 && ranges.map(_.getAs[Long]("n")).sum == 4096)
    // equal Z-ranges of a full grid are 16x16 quadrant blocks: span 15
    // on BOTH axes (vs 63 for a b-span under an a-sorted 256-row cut)
    assert(ranges.forall(r => r.getAs[Long]("spanA") <= 15 &&
      r.getAs[Long]("spanB") <= 15))
  }

  test("writeZordered files carry tight footer extents on both keys") {
    val s = spark
    import s.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Zorder.writeZordered(grid.toDF("a", "b"), dir, "a", "b",
      bits = 6, numFiles = 16)
    // per-file spans via re-read (footer stats mirror file content)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.nonEmpty)
    val spans = files.flatMap { f =>
      val r = spark.read.parquet(f)
        .agg(count(lit(1)), max("a") - min("a"), max("b") - min("b")).head()
      if (r.getLong(0) == 0L) None else Some((r.getLong(1), r.getLong(2)))
    }
    assert(spans.nonEmpty)
    // 16 contiguous Z-ranges of a 64x64 grid ≈ 16x16 blocks; sampled
    // range boundaries may straddle a block edge, but every file must
    // stay FAR below the 63 global extent on both axes — the property
    // a single-column sort cannot give the second key (its b-span is
    // 63 for every file)
    assert(spans.forall { case (sa, sb) => sa < 56 && sb < 56 },
      spans.mkString(", "))
    val avg = spans.map { case (sa, sb) => sa + sb }.sum.toDouble / (2 * spans.size)
    assert(avg <= 24.0, s"avg span $avg")
  }

  test("profile counts rows, nulls, distincts, and min/max per column") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (None, Some("a")), (Some(3L), Some("c"))).toDF("x", "y")
    val got = Profile.profile(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("x") == ((4L, 1L, 2L, "1", "3")))
    assert(got("y") == ((4L, 1L, 3L, "a", "c")))
  }

  test("histogram matches a scalar reference, materializing empty bins") {
    val s = spark
    import s.implicits._
    // values 3..17 skipping the middle: empty bins + non-divisible width
    val xs = Seq(3L, 3L, 4L, 17L, 17L, 17L, 5L, 16L)
    val bins = 4
    val (mn, w) = (xs.min, xs.max - xs.min + 1) // w = 15: 4 uneven bins
    val expect = (0L until bins).map { b =>
      (b, mn + b * w / bins, mn + (b + 1) * w / bins,
        xs.count(x => (x - mn) * bins / w == b).toLong)
    }.toSet
    val got = graft.sources.Profile.histogram(xs.toDF("x"), "x", bins)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expect)
    assert(got.exists(_._4 == 0L)) // the gap bins really are materialized
    assert(got.toSeq.map(_._4).sum == xs.size)
  }

  test("histogram refuses overflowing spans; empty input yields null-edge bins") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      graft.sources.Profile.histogram(
        Seq(0L, Long.MaxValue - 1).toDF("x"), "x", 8)
    }
    assert(e.getMessage.contains("overflows"))
    // span wider than int64 itself: the guard must compute the span
    // wide, not let it wrap negative and slip through the <= check
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Profile.histogram(
        Seq(Long.MinValue, 1L).toDF("x"), "x", 4)
    }
    assert(e2.getMessage.contains("overflows"))
    val empty = graft.sources.Profile.histogram(
        Seq(Option.empty[Long]).toDF("x"), "x", 4)
      .collect()
    assert(empty.length == 4 &&
      empty.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.getLong(3) == 0L))
  }

  test("zorderRanges refuses bucket arithmetic that overflows int64") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      Zorder.zorderRanges(Seq((1L, 2L)).toDF("a", "b"), "a", "b",
        bits = 31, numRanges = 64)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("profile handles an all-null column and the approx path") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("x", "y")
    val got = Profile.profile(df, Seq("y")).collect().head
    assert(got.getLong(2) == 2L && got.getLong(3) == 0L &&
      got.isNullAt(4) && got.isNullAt(5))
    // approx path: exact on 2 distinct values, same shape
    val ap = Profile.profile(df, Seq("x"), exact = false).collect().head
    assert(ap.getLong(3) == 2L)
  }

  test("equi-depth histogram: quantile boundaries, tie skew, empty input") {
    val s = spark; import s.implicits._
    import graft.sources.Profile
    // 1..100 uniform: 4 buckets of 25 each, boundaries at 25.75/50.5/75.25
    val u = (1L to 100L).toDF("v")
    val rows = Profile.histogramEquiDepth(u, "v", 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._4).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(rows.head._2 == 1.0 && rows.last._3 == 100.0)
    assert(rows(0)._3 == rows(1)._2) // contiguous boundaries
    // heavy ties: one dominant value makes populations unequal but the
    // total is preserved and buckets stay materialized
    val skew = ((1L to 80L).map(_ => 5L) ++ Seq(1L, 2L, 9L, 10L)).toDF("v")
    val sk = Profile.histogramEquiDepth(skew, "v", 4)
      .orderBy("bucket").collect()
    assert(sk.length == 4 && sk.map(_.getLong(3)).sum == 84L)
    // empty input: bins rows with null edges, zero counts
    val e = Profile.histogramEquiDepth(u.filter(col("v") < 0), "v", 3)
      .orderBy("bucket").collect()
    assert(e.length == 3 && e.forall(r => r.isNullAt(1) && r.getLong(3) == 0L))
    // single bucket degenerates to (min, max, n)
    val one = Profile.histogramEquiDepth(u, "v", 1).collect()
    assert(one.length == 1 && one.head.getDouble(1) == 1.0 &&
      one.head.getDouble(2) == 100.0 && one.head.getLong(3) == 100L)
  }
}
