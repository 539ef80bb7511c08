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
