package graft

import graft.ts.Resample
import org.apache.spark.sql.functions._

/** Hand-built irregular streams through the regular-grid resampler —
  * exact expectations for bucketing, span bounds, LOCF carry, linear
  * interpolation, in-bucket last-pick determinism, and key isolation. */
class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // key 1: observations at minutes 0, 1 (same bucket) and minute 30;
  // key 2: single observation (degenerate one-bucket span)
  private lazy val df = Seq(
    (1L, 0L, 1L, 10.0), // bucket 0
    (1L, 60L, 2L, 20.0), // bucket 0 too (later ts wins the bucket)
    (1L, 1800L, 3L, 50.0), // bucket 3 (600s buckets)
    (2L, 1200L, 4L, 7.0)
  ).map { case (k, s, id, v) => (k, ts(s), id, v) }
    .toDF("k", "t", "id", "v")

  test("locf: grid spans min..max bucket per key, gaps carry forward") {
    val out = Resample.locf(df, "k", "t", "v", widthSec = 600L,
        tieBreak = Seq("id"))
      .orderBy("k", "bucket")
      .select(col("k"), (unix_micros(col("bucket")) / 1000000L).cast("long"),
        col("n_obs"), col("value"), col("filled"))
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 2L, 20.0, 0L), // last-in-bucket by (ts,id) = 20.0
      (1L, 600L, 0L, 20.0, 1L), // gap: carried
      (1L, 1200L, 0L, 20.0, 1L),
      (1L, 1800L, 1L, 50.0, 0L),
      (2L, 1200L, 1L, 7.0, 0L))) // one-bucket span: no gaps
  }

  test("interp: gap values are the exact linear blend; ends observed") {
    val out = Resample.interp(df, "k", "t", "v", widthSec = 600L,
        tieBreak = Seq("id"))
      .orderBy("k", "bucket")
      .select(col("k"), (unix_micros(col("bucket")) / 1000000L).cast("long"),
        col("value"), col("filled"))
      .as[(Long, Long, Double, Long)].collect().toSeq
    // buckets 0 (v=20) .. 3 (v=50): gaps at 1,2 → 30, 40 exactly
    assert(out === Seq(
      (1L, 0L, 20.0, 0L), (1L, 600L, 30.0, 1L),
      (1L, 1200L, 40.0, 1L), (1L, 1800L, 50.0, 0L),
      (2L, 1200L, 7.0, 0L)))
  }

  test("in-bucket tie on ts resolves by the tie-break column") {
    val tied = Seq((1L, ts(0L), 5L, 1.0), (1L, ts(0L), 9L, 2.0),
      (1L, ts(0L), 7L, 9.0)).toDF("k", "t", "id", "v")
    val out = Resample.locf(tied, "k", "t", "v", 600L, Seq("id"))
      .select("value").as[Double].collect().toSeq
    assert(out === Seq(2.0)) // max id (9) wins, not max value
  }

  test("width must be positive") {
    intercept[IllegalArgumentException] {
      Resample.locf(df, "k", "t", "v", 0L)
    }
  }

  test("trailingCounts: window membership, dedup, zeros, clipping") {
    import graft.ts.Trailing
    // buckets (60s): u1 twice in b0, once in b3; u2 in b0. Window = 2.
    val ev = Seq((1L, 5L), (1L, 50L), (2L, 10L), (1L, 190L))
      .map { case (u, s) => (u, ts(s)) }.toDF("u", "t")
    val out = Trailing.trailingCounts(ev, "t", "u", widthSec = 60L,
        nBuckets = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 3L), // u1×2 + u2×1 in b0
      (1L, 2L, 3L), // trailing {b0,b1}: same events
      (2L, 0L, 0L), // gap: nothing in {b1,b2}
      (3L, 1L, 1L))) // u1 in b3; b4 clipped (past stream end)
    // stride 2 (sparse monitoring grid): only even buckets materialize,
    // with the SAME values as the full grid on those buckets — and the
    // filter sits before the distinct agg, so it shrinks the exchange
    val s2 = Trailing.trailingCounts(ev, "t", "u", widthSec = 60L,
        nBuckets = 2, stride = 2L)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(s2 === Seq((0L, 2L, 3L), (2L, 0L, 0L)))
    // strideOffset shifts the lattice (r14): the ODD residue class,
    // same values as the full grid on those buckets
    val s2o = Trailing.trailingCounts(ev, "t", "u", widthSec = 60L,
        nBuckets = 2, stride = 2L, strideOffset = 1L)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(s2o === Seq((1L, 2L, 3L), (3L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Trailing.trailingCounts(ev, "t", "u", 60L, 2, stride = 2L,
        strideOffset = 2L)
    }
  }

  test("ewma: gap decay, horizon truncation, key isolation, layout invariance") {
    import graft.ts.Resample
    // key a: v=8 at b0, v=4 at b1, gap, v=2 at b3 (60s buckets)
    //   b0: 8; b1: 4 + 8/2 = 8; b3: 2 + 4/4 + 8/8 = 4
    // key b: single obs — isolated from a's history
    val ev = Seq(
      ("a", 5L, 8.0), ("a", 70L, 4.0), ("a", 190L, 2.0),
      ("b", 10L, 16.0))
      .map { case (k, s, v) => (k, ts(s), v) }.toDF("k", "t", "v")
    val out = Resample.ewma(ev, "k", "t", "v", widthSec = 60L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out(("a", 0L)) == 8.0)
    assert(out(("a", 1L)) == 8.0)
    assert(out(("a", 3L)) == 4.0)
    assert(out(("b", 0L)) == 16.0)
    // horizon truncation: an observation exactly horizon+1 buckets back
    // contributes NOTHING (the truncated sum is the semantics)
    val far = Seq(("k", 0L, 1024.0), ("k", 60L * 3, 1.0))
      .map { case (k, s, v) => (k, ts(s), v) }.toDF("k", "t", "v")
    val cut = Resample.ewma(far, "k", "t", "v", widthSec = 60L, horizon = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(cut(3L) == 1.0) // 1024 at distance 3 > horizon 2: dropped
    // multiple events in one bucket sum first (dsum), then decay
    val multi = Seq(("k", 1L, 1.5), ("k", 2L, 2.5), ("k", 61L, 0.0))
      .map { case (k, s, v) => (k, ts(s), v) }.toDF("k", "t", "v")
    val m = Resample.ewma(multi, "k", "t", "v", widthSec = 60L)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(m(0L) == 4.0 && m(1L) == 2.0)
    // layout invariance (dsum bucket seed + ordered fold)
    val again = Resample.ewma(ev.repartition(7), "k", "t", "v", 60L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(again == out)
  }

  test("approxTrailingCounts: agrees with exact at small cardinality, exact n_events") {
    import graft.ts.Trailing
    // same fixture as the exact test — Datasketches HLL is exact far
    // below 2^lgK entries, so every estimate must equal the exact count
    val ev = Seq((1L, 5L), (1L, 50L), (2L, 10L), (1L, 190L))
      .map { case (u, s) => (u, ts(s)) }.toDF("u", "t")
    val out = Trailing.approxTrailingCounts(ev, "t", "u", widthSec = 60L,
        nBuckets = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 3L), (1L, 2L, 3L), (2L, 0L, 0L), (3L, 1L, 1L)))
    // determinism under layout: sketches merge associatively
    val again = Trailing.approxTrailingCounts(ev.repartition(7), "t", "u",
        widthSec = 60L, nBuckets = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(again === out)
    // the structural claim: the cover expansion must NOT key on ids —
    // its exchange carries one row per (source bucket, target), so the
    // pre-union aggregate keyed on __b alone must appear in the plan
    val plan = Trailing.approxTrailingCounts(ev, "t", "u", 60L, 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("hll_sketch_agg") && plan.contains("hll_union_agg"))
  }
}
