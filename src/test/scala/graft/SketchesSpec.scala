package graft

import graft.agg.Sketches
import org.apache.spark.sql.functions._

/** Count-min / DataSketches-HLL wrappers and session assignment. */
class SketchesSpec extends SparkSpecBase {

  private def skewed() = {
    val s = spark
    import s.implicits._
    // zipf-ish: "a" dominates, long tail of singletons
    (Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(10)("c") ++
      (1 to 30).map(i => s"t$i"))
      .toDF("tok")
  }

  test("countMinTopK: structural lower bound always holds, slack bound at sane eps") {
    val out = Sketches.countMinTopK(skewed(), "tok", 5,
        eps = 0.01, confidence = 0.99, seed = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length == 5)
    val byTok = out.map(t => t._1 -> t).toMap
    assert(byTok("a")._2 == 100L && byTok("b")._2 == 40L && byTok("c")._2 == 10L)
    // est >= true is structural (counters only overcount): must be 1
    // for every row at ANY eps; the eps-slack bound holds at this width
    out.foreach { t => assert(t._3 == 1L && t._4 == 1L, s"flags: $t") }
    // deliberately tiny sketch (width ~6): collisions everywhere, the
    // lower bound STILL holds — that's the structural guarantee
    val tiny = Sketches.countMinTopK(skewed().repartition(7), "tok", 5,
        eps = 0.4, confidence = 0.6, seed = 7)
      .collect().map(r => (r.getLong(2)))
    tiny.foreach(l => assert(l == 1L))
  }

  test("countMinTopK: null values excluded from sketch, total, and top-k") {
    val s = spark
    import s.implicits._
    // null-heavy: 50 nulls would crash estimateCount(null) and inflate
    // the eps*N slack if counted (round-11 ADVICE regression)
    val df = (Seq.fill(50)(null: String) ++ Seq.fill(8)("a") ++
      Seq.fill(3)("b")).toDF("tok")
    val out = Sketches.countMinTopK(df, "tok", 5,
        eps = 0.01, confidence = 0.99, seed = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSet == Set("a", "b"), out.toSeq.toString)
    val byTok = out.map(t => t._1 -> t).toMap
    assert(byTok("a")._2 == 8L && byTok("b")._2 == 3L)
    out.foreach { t => assert(t._3 == 1L && t._4 == 1L, s"flags: $t") }
  }

  test("hllDistinctCheck: exact at small cardinality, union path consistent") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    for (rep <- Seq(1, 7)) {
      val out = Sketches.hllDistinctCheck(df.repartition(rep), "g", "v", 0.05)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1)
      assert(out.map(t => (t._1, t._2)).toSeq ==
        Seq(("g0", 100L), ("g1", 100L), ("g2", 100L)))
      out.foreach { t => assert(t._3 == 1L && t._4 == 1L, s"flags: $t") }
    }
  }

  test("anomalousHours: n²-cleared 3σ flags exactly the hand-computed set") {
    val s = spark
    import s.implicits._
    // user 1: 20 baseline hours of 1 event + one 10-event spike.
    // n=21, S=30, Q=120; spike: dev=180, dev²=32400 > 9(21·120−900)=14580
    // baseline: dev=21−30 < 0 — high-side only.
    // user 2: constant 3 events over 3 hours — zero variance, zero flags.
    val rows =
      (0 until 20).map(h => (1L, h.toLong, 1)) ++ Seq((1L, 20L, 10)) ++
        (0 until 3).map(h => (2L, h.toLong, 3))
    val ev = rows.flatMap { case (u, h, c) =>
      (0 until c).map(j => (u, h * 3600L + j)) }
      .toDF("user_id", "tsn")
      .withColumn("ts", timestamp_seconds(col("tsn")))
    for (rep <- Seq(1, 7)) {
      val out = graft.ts.EventStats.anomalousHours(
          ev.repartition(rep), "user_id", "ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq((1L, 20L, 10L, 21L, 30L)), s"rep=$rep: ${out.toSeq}")
    }
  }

  test("sessionize: gap boundaries, tie immunity, per-user isolation") {
    val s = spark
    import s.implicits._
    // user 1: events at 0s, 10s, TIE at 10s, 2000s (gap > 1800 -> new
    // session), 2100s; user 2: single event
    val base = Seq(
      (1L, 0L, 100L), (1L, 10L, 101L), (1L, 10L, 102L),
      (1L, 2000L, 103L), (1L, 2100L, 104L),
      (2L, 5L, 200L))
    for (order <- Seq(base, base.reverse)) {
      val ev = order.toDF("user_id", "tsn", "event_id")
        .withColumn("ts", timestamp_seconds(col("tsn")))
      val out = graft.ts.Funnel.sessionize(ev, "user_id", "ts",
          "event_id", gapSeconds = 1800L)
        .select("event_id", "session_n").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(100L -> 1L, 101L -> 1L, 102L -> 1L,
        103L -> 2L, 104L -> 2L, 200L -> 1L), s"order $order")
    }
  }
}
