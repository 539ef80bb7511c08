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
}
