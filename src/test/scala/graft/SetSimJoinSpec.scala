package graft

import graft.dedup.{Dedup, SetSimJoin}
import org.apache.spark.sql.functions._

/** Exact prefix-filtered set-similarity join: losslessness vs the
  * brute-force all-pairs scan, integer threshold edges, stop-shingle
  * robustness. */
class SetSimJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame,
      tauNum: Int, tauDen: Int) =
    Dedup.blockedJaccardPairs(df.withColumn("__blk", lit(1)),
        "doc_id", "text", "__blk")
      .filter(lit(tauDen) * col("jaccard") * lit(1.0) >= lit(tauNum) * lit(1.0) &&
        col("jaccard") > 0.0)
      .select(col("id_1"), col("id_2"), col("jaccard"))

  test("returns exactly the brute-force pairs on the fixture corpus") {
    val docs = graft.queries.Tables.documents(spark, sf())
    val got = SetSimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 2)
      .select("id_1", "id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(docs, 1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must contain a J >= 1/2 pair")
  }

  test("tau = 1 keeps only identical shingle sets") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),            // identical
      (3L, "a b c d e f g"),          // superset — J < 1
      (4L, "x y z w v u")
    ).toDF("doc_id", "text")
    val got = SetSimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("a corpus-wide stop-shingle creates no false positives") {
    // every doc shares the leading trigram; only 1<->2 are real near-dups
    val docs = Seq(
      (1L, "zz zz zz p q r s t u v w"),
      (2L, "zz zz zz p q r s t u v x"),
      (3L, "zz zz zz k l m n o aa bb cc"),
      (4L, "zz zz zz dd ee ff gg hh ii jj")
    ).toDF("doc_id", "text")
    val got = SetSimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(docs, 1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("sizes and intersection are stated exactly") {
    val docs = Seq(
      (1L, "a b c d e"),   // shingles: abc bcd cde  (3)
      (2L, "a b c d f")    // shingles: abc bcd bdf? -> abc bcd cdf (3)
    ).toDF("doc_id", "text")
    val rows = SetSimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 3)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L) // n_1, n_2
    assert(r.getLong(4) == 2L)                       // inter: abc, bcd
    assert(r.getDouble(5) == 2.0 / 4.0)
  }

  /** Quadratic truth over the ENGINE's shingle layer (that layer has
    * its own oracle gates — this spec pins the JOIN logic, so candidate
    * generation must reproduce an all-pairs scan of the same sets). */
  private def bruteContainment(recs: Seq[(Long, String)], tauNum: Int,
      tauDen: Int): Set[(Long, Long, Long)] = {
    val sets = recs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.text.TextOps.shingleHashes(col("text"), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toSeq
    (for {
      (ia, a) <- sets; (ib, b) <- sets
      if ia != ib
      inter = (a & b).size
      if a.nonEmpty && inter > 0 &&
        tauDen.toLong * inter >= tauNum.toLong * a.size
    } yield (ia, ib, inter.toLong)).toSet
  }

  test("containment join: asymmetric pairs, quote-in-page, brute-force equality") {
    val page = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr"
    val docs = Seq(
      1L -> "cc dd ee ff gg",          // 3 shingles, ALL inside page
      2L -> page,                      // the containing page
      3L -> "cc dd ee zz ww vv",       // partial overlap, below tau
      4L -> "xx yy uu tt ss rr qq")    // different content
    val got = engineContainment(docs, 4, 5)
    val want = bruteContainment(docs, 4, 5)
    assert(got.map(t => (t._1, t._2, t._3)) == want)
    // the quote is contained in the page; the page is NOT contained in
    // the quote (asymmetry is the operator's whole point)
    assert(got.exists(t => t._1 == 1L && t._2 == 2L))
    assert(!got.exists(t => t._1 == 2L && t._2 == 1L))
  }

  test("containment join: lossless vs brute force on the fixture corpus") {
    val docs = graft.queries.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val got = engineContainment(docs, 4, 5).map(t => (t._1, t._2, t._3))
    val want = bruteContainment(docs, 4, 5)
    assert(got == want)
    assert(want.nonEmpty, "fixture must contain a containment >= 4/5 pair")
  }

  private def engineContainment(recs: Seq[(Long, String)], tauNum: Int,
      tauDen: Int): Set[(Long, Long, Long)] = {
    SetSimJoin.prefixContainmentJoin(recs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum, tauDen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
  }
}
