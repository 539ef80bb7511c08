package graft

import graft.dedup.EdJoin
import org.apache.spark.sql.functions._

/** EdJoin (PassJoin segment pigeonhole) — LOSSLESS contract: the pair
  * set must equal the quadratic brute force exactly, including indel
  * shifts, short strings, and identical strings. */
class EdJoinSpec extends SparkSpecBase {

  private def brute(recs: Seq[(Long, String)], tau: Int) = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- recs; (i2, s2) <- recs
      if i1 < i2
      d = lev(s1, s2) if d <= tau
    } yield (i1, i2, d.toLong)).toSet
  }

  private def engine(recs: Seq[(Long, String)], tau: Int) = {
    val s = spark; import s.implicits._
    EdJoin.matchPairs(recs.toDF("id", "s"), "id", "s", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2).toLong)).toSet
  }

  test("matches brute force: substitutions, indel shifts, dist values") {
    val recs = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumps",   // identical -> dist 0
      3L -> "the quick brawn fox jumps",   // 1 substitution
      4L -> "the quick brown fx jumps",    // 1 deletion (shifted tail)
      5L -> "thee quick brown fox jumps",  // 1 insertion (shifted tail)
      6L -> "xx quick brown fox jumpss",   // 3+ edits from 1
      7L -> "a completely different doc",
      8L -> "the quick brown fox jump",    // tail deletion
      9L -> "qt he uick brown fox jumps")  // transposition-ish, 2 edits
    assert(engine(recs, 2) == brute(recs, 2))
  }

  test("short strings: both-short always pairs, short-long via segments") {
    val recs = Seq(
      1L -> "", 2L -> "a", 3L -> "ab",   // all pairwise <= 2 edits
      4L -> "abc", 5L -> "abcd",         // long side: segments exist
      6L -> "zzzz")                      // unrelated long
    assert(engine(recs, 2) == brute(recs, 2))
    // tau = 0: exact-duplicate join only
    val dup = Seq(1L -> "same", 2L -> "same", 3L -> "diff")
    assert(engine(dup, 0) == brute(dup, 0))
  }

  test("lossless on a collision-rich corpus (shared prefixes + typos)") {
    // many strings sharing long prefixes: the segment join must not
    // over- or under-generate under heavy key collisions
    val recs = (1L to 40L).map { i =>
      val base = s"document number with shared prefix $i"
      i -> (if (i % 3 == 0) base.updated(5, 'X') else base)
    } ++ Seq(100L -> "document number with shared prefix 7x")
    assert(engine(recs, 2) == brute(recs, 2))
  }

  test("layout invariance: repartitioned input yields the identical set") {
    val s = spark; import s.implicits._
    val recs = Seq(1L -> "alpha beta", 2L -> "alpha betta",
      3L -> "alpha bet", 4L -> "gamma delta")
    val a = engine(recs, 2)
    val b = EdJoin.matchPairs(recs.toDF("id", "s").repartition(7),
        "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2).toLong)).toSet
    assert(a == b && a == brute(recs, 2))
  }
}
