package graft

import graft.text.{CorpusOps, TextIndex}
import org.apache.spark.sql.functions._

/** Persistent inverted text index: build/search/append/time-travel, the
  * bucket-pruned scan, and index-path ≡ corpus-path BM25. */
class TextIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs() = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta gamma delta"),
    (3L, "alpha gamma"),
    (4L, "delta epsilon"),
    (5L, "alpha beta gamma delta epsilon")
  ).toDF("doc_id", "text")

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"textidx_$tag").toString

  test("AND search answers membership from the index alone") {
    val dir = tmp("and")
    TextIndex.build(docs(), "doc_id", "text", dir, nBuckets = 4)
    val got = TextIndex.searchAnd(spark, dir, Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (5L, 2L)))
    // single term degenerates to a membership list
    val one = TextIndex.searchAnd(spark, dir, Seq("delta"))
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(2L, 4L, 5L))
    // absent term: empty, not an error
    assert(TextIndex.searchAnd(spark, dir, Seq("zeta")).count() == 0)
  }

  test("append indexes only the batch; time travel pins the old version") {
    val dir = tmp("append")
    val base = docs().filter(col("doc_id") <= 3)
    TextIndex.build(base, "doc_id", "text", dir, nBuckets = 4)
    TextIndex.append(docs().filter(col("doc_id") > 3), "doc_id", "text", dir)
    val head = TextIndex.searchAnd(spark, dir, Seq("delta"))
      .collect().map(_.getLong(0)).toSet
    assert(head == Set(2L, 4L, 5L))
    // pinned to v1: the appended docs don't exist yet
    val v1 = TextIndex.searchAnd(spark, dir, Seq("delta"), Some(1L))
      .collect().map(_.getLong(0)).toSet
    assert(v1 == Set(2L))
  }

  test("search scan carries a bucket partition filter (directory pruning)") {
    val dir = tmp("prune")
    TextIndex.build(docs(), "doc_id", "text", dir, nBuckets = 4)
    val plan = TextIndex.searchAnd(spark, dir, Seq("alpha"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"expected a bucket partition filter in:\n$plan")
  }

  test("index-backed BM25 is bit-identical to the corpus-scan BM25") {
    val dir = tmp("bm25")
    val d = docs()
    TextIndex.build(d, "doc_id", "text", dir, nBuckets = 4)
    val terms = Seq("alpha", "delta")
    val fromIndex = TextIndex.searchBm25(spark, dir, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val fromCorpus = CorpusOps.bm25TopK(d, "doc_id", "text", terms, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // exact tuple equality including the doubles — same integer stats,
    // same association order, so the scores must match to the last bit
    assert(fromIndex.toSeq == fromCorpus.toSeq)
    assert(fromIndex.nonEmpty)
  }

  test("driver-side bucket hash matches the codegen'd portable_hash") {
    val terms = Seq("alpha", "z", "", "mixedCase", "née")
    val viaExpr = terms.toDF("t")
      .select(graft.text.TextOps.portableHash(col("t")))
      .collect().map(_.getLong(0))
    val viaScala = terms.map(TextIndex.portableHashOf)
    assert(viaExpr.toSeq == viaScala)
  }

  test("diverged index tables fail loudly") {
    val dir = tmp("diverge")
    TextIndex.build(docs(), "doc_id", "text", dir, nBuckets = 4)
    // advance postings on its own — the next append must detect the skew
    graft.sources.Snapshots.write(
      Seq((0, "x", 99L, 1)).toDF("bucket", "tok", "doc_id", "tf"),
      s"$dir/postings", mode = "append", partitionBy = Seq("bucket"))
    val ex = intercept[IllegalArgumentException] {
      TextIndex.append(docs().limit(1), "doc_id", "text", dir)
    }
    assert(ex.getMessage.contains("diverged"))
  }

  test("compact folds commits into one; pinned old snapshots still work") {
    val dir = tmp("compact")
    TextIndex.build(docs().filter(col("doc_id") <= 3), "doc_id", "text",
      dir, nBuckets = 4)
    TextIndex.append(docs().filter(col("doc_id") > 3), "doc_id", "text", dir)
    val before = TextIndex.searchAnd(spark, dir, Seq("gamma"))
      .collect().map(_.getLong(0)).toSet
    val cId = TextIndex.compact(spark, dir)
    val after = TextIndex.searchAnd(spark, dir, Seq("gamma"))
      .collect().map(_.getLong(0)).toSet
    assert(after == before && after.nonEmpty)
    // the compacted snapshot reads from ONE commit dir per table
    import graft.sources.Snapshots
    val hist = Snapshots.history(spark, s"$dir/postings")
      .orderBy(col("snapshot_id").desc).collect()
    assert(hist.head.getLong(0) == cId)
    assert(hist.head.getAs[Int]("n_data_dirs") == 1 &&
      hist(1).getAs[Int]("n_data_dirs") == 2)
    // a reader pinned BEFORE compaction still sees the appended state
    val pinned = TextIndex.searchAnd(spark, dir, Seq("gamma"), Some(2L))
      .collect().map(_.getLong(0)).toSet
    assert(pinned == before)
  }
}
