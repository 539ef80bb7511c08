package graft

import graft.dedup.EntityResolution
import org.apache.spark.sql.functions._

/** Hand-built record sets through the blocked-Levenshtein linker —
  * exact expectations for edge generation, blocking isolation, the
  * distance threshold, transitive entity closure, hot-block capping,
  * and the canonical pick. */
class EntityResolutionSpec extends SparkSpecBase {
  import spark.implicits._

  // block "aa": a chain 1–2 (dist 1) and 2–3 (dist 2), 1–3 at dist 3
  // (linked only transitively); 4 unmatched. block "bb": 5–6 identical
  // strings (dist 0). Cross-block twins (7 in "cc" equals 1's string)
  // must NOT link.
  private lazy val recs = Seq(
    (1L, "aa", "kitten"), (2L, "aa", "mitten"), (3L, "aa", "mittens!"),
    (4L, "aa", "zzzzzzzz"), (5L, "bb", "same"), (6L, "bb", "same"),
    (7L, "cc", "kitten")
  ).toDF("id", "b", "s")

  test("matchPairs: threshold, ordering, block isolation") {
    val p = EntityResolution.matchPairs(recs, "id", "s", Seq("b"), 2)
      .orderBy("id_1", "id_2")
      .as[(Long, Long, Int)].collect().toSeq
    // 1-3 is dist 3 (> 2): no direct edge; 1-7 blocked apart
    assert(p === Seq((1L, 2L, 1), (2L, 3L, 2), (5L, 6L, 0)))
  }

  test("resolve: transitive closure, min-id canonical, sizes") {
    val r = EntityResolution.resolve(recs, "id", "s", Seq("b"), 2)
      .orderBy("id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(r === Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true), (5L, 5L, 2L, true), (6L, 5L, 2L, false),
      (7L, 7L, 1L, true)))
  }

  test("maxBlock cap drops oversized blocks but keeps their records") {
    val r = EntityResolution.resolve(recs, "id", "s", Seq("b"), 2,
        maxBlock = Some(2)) // block aa (4 members) is over the cap
      .orderBy("id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(r.filter(_._1 <= 4).forall(t => t._2 == t._1 && t._3 == 1L))
    assert(r.filter(t => t._1 == 5L || t._1 == 6L)
      .map(t => (t._2, t._3)).toSet === Set((5L, 2L)))
  }

  test("length prefilter never drops a legal match (insert-heavy pair)") {
    val d = Seq((1L, "x", "ab"), (2L, "x", "abcd")).toDF("id", "b", "s")
    val p = EntityResolution.matchPairs(d, "id", "s", Seq("b"), 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(p === Seq((1L, 2L, 2)))
  }

  test("blocking keys are required") {
    intercept[IllegalArgumentException] {
      EntityResolution.matchPairs(recs, "id", "s", Nil, 2)
    }
  }
}
