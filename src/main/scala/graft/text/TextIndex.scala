package graft.text

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT inverted text index — the stored-index half of the
  * reference's full-text direction (apps/rottnest + blog/time.md: build
  * a token index over lake files once, answer keyword queries from the
  * index without re-scanning the corpus; q75 covers the *algorithm*
  * inline, this persists it). Mirrors [[graft.vector.IvfIndex]]'s
  * design: the index is Snapshots tables under one directory, so
  * rebuilds/appends are snapshot versions, searches can pin a version
  * (time travel), and build-vs-search races ride the proven commit
  * protocol.
  *
  * {{{
  *   <dir>/meta/      (nbuckets int)                     — 1 row
  *   <dir>/postings/  (tok string, doc_id long, tf int)  PARTITIONED BY bucket
  *   <dir>/doclens/   (doc_id long, n_toks long)
  * }}}
  *
  * Scale design: the corpus is tokenized ONCE at build; every search
  * computes its terms' buckets driver-side (a literal hash over the
  * query terms — bounded metadata, no corpus access), filters
  * `bucket IN (…)`, and Spark prunes the non-probed buckets'
  * directories at planning — a q-term search reads at most q/nbuckets
  * of the index bytes no matter the corpus size, and never touches the
  * document table at all. Postings are (token, id, tf) triples — the
  * exchange carries ids and small ints, never text. [[append]] indexes
  * only the new batch (cost ∝ batch) and commits append snapshots to
  * all three tables atomically enough for readers (HEAD moves last).
  */
object TextIndex {

  /** Driver-side twin of the codegen'd portable_hash expression
    * (functions/PortableHash.scala: fold of h*31+codepoint mod 1e9+7)
    * — search-time bucket computation for literal query terms must land
    * in the same partition the build wrote. */
  private[graft] def portableHashOf(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * TextOps.B + cp) % TextOps.P
      i += Character.charCount(cp)
    }
    h
  }

  private[graft] def bucketOf(term: String, nBuckets: Int): Int =
    (portableHashOf(term) % nBuckets).toInt // hash ∈ [0, P), never negative

  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("__t"))
    toks.select(col("doc_id"), explode(col("__t")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("int").as("tf"))
      .withColumn("bucket",
        pmod(TextOps.portableHash(col("tok")), lit(nBuckets)).cast("int"))
  }

  private def doclensOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_toks"))

  /** Tokenize the corpus and persist one index version. Returns the
    * snapshot id (identical across the tables — enforced). */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      nBuckets: Int = 64): Long = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val mId = Snapshots.write(Seq(nBuckets).toDF("nbuckets"), s"$dir/meta")
    val pId = Snapshots.write(postingsOf(docs, idCol, textCol, nBuckets),
      s"$dir/postings", partitionBy = Seq("bucket"))
    val lId = Snapshots.write(doclensOf(docs, idCol, textCol),
      s"$dir/doclens")
    require(mId == pId && pId == lId,
      s"index tables diverged under $dir (meta v$mId, postings v$pId, " +
        s"doclens v$lId) — rebuild the index directory")
    pId
  }

  /** Incrementally index a batch: tokenize ONLY `newDocs` (the standing
    * corpus is not re-read) and commit append snapshots. Ids already in
    * the index are the caller's contract to avoid (same as the
    * reference's append-only lake files). */
  def append(newDocs: DataFrame, idCol: String, textCol: String,
      dir: String): Long = {
    val spark = newDocs.sparkSession
    val nb = readNBuckets(spark, dir)
    val pId = Snapshots.write(postingsOf(newDocs, idCol, textCol, nb),
      s"$dir/postings", mode = "append", partitionBy = Seq("bucket"))
    val lId = Snapshots.write(doclensOf(newDocs, idCol, textCol),
      s"$dir/doclens", mode = "append")
    require(pId == lId,
      s"index tables diverged under $dir (postings v$pId, doclens " +
        s"v$lId) — rebuild the index directory")
    pId
  }

  /** Maintenance rewrite: fold the accumulated append commits into ONE
    * fresh overwrite commit per table (same rows, same bucketing) — the
    * small-files compaction a long-lived incrementally-maintained index
    * needs. Searches see identical results before and after; old
    * commit dirs stay on disk (append-only storage), so a reader
    * pinned to a pre-compaction snapshot keeps working. Returns the
    * new snapshot id (identical across tables — enforced). */
  def compact(spark: SparkSession, dir: String): Long = {
    // meta is static config (append never bumps it) — only the two
    // data tables move in lockstep
    val pId = Snapshots.write(Snapshots.read(spark, s"$dir/postings"),
      s"$dir/postings", partitionBy = Seq("bucket"))
    val lId = Snapshots.write(Snapshots.read(spark, s"$dir/doclens"),
      s"$dir/doclens")
    require(pId == lId,
      s"index tables diverged under $dir (postings v$pId, doclens " +
        s"v$lId) — rebuild the index directory")
    pId
  }

  private def readNBuckets(spark: SparkSession, dir: String): Int =
    Snapshots.read(spark, s"$dir/meta").head().getInt(0)

  /** Conjunctive (AND) keyword search answered ENTIRELY from the index:
    * (doc_id, n_terms) for documents containing every query term.
    * `snapshotId` pins an index version (time travel). */
  def searchAnd(spark: SparkSession, dir: String, terms: Seq[String],
      snapshotId: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "searchAnd needs at least one term")
    // dedupe up front: a repeated term must not inflate the AND arity
    // (countDistinct could never reach a duplicated terms.size)
    val ts = terms.distinct
    val nb = readNBuckets(spark, dir)
    val buckets = ts.map(bucketOf(_, nb)).distinct
    Snapshots.read(spark, s"$dir/postings", snapshotId)
      .filter(col("bucket").isin(buckets.map(Int.box): _*) &&
        col("tok").isin(ts: _*))
      .groupBy("doc_id")
      // countDistinct (not count): append-mode re-index of an id stays
      // a membership test instead of inflating the term tally
      .agg(countDistinct(col("tok")).as("n_terms"))
      .filter(col("n_terms") === ts.size)
      .select("doc_id", "n_terms")
  }

  /** Ranked search from the index: BM25 top-`k` computed ENTIRELY from
    * the persisted postings (tf) + doclens (dl, and via one aggregate
    * N, L) — never the corpus. This is the exact index-backed twin of
    * [[CorpusOps.bm25TopK]] (q157): the SAME rational
    * transcendental-free score expression over the SAME integer stats
    * in the SAME association order, so the two paths are
    * bit-interchangeable and share one oracle. Output
    * (doc_id, dl, tf_<term>…, score), score-descending, doc-id
    * tie-break, score > 0 only.
    *
    * Scale shape: postings prune to the terms' buckets (directory
    * pruning, q/nbuckets of the index bytes); per-term tf columns come
    * from a terms-wide conditional aggregate over those hits (ids +
    * small ints, no text); corpus constants (N, L) are a one-row
    * broadcast from doclens; df per term folds out of the same hit
    * aggregate. The top-k is TakeOrderedAndProject. */
  def searchBm25(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int, snapshotId: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "searchBm25 needs at least one term")
    require(terms.distinct.size == terms.size,
      s"searchBm25 terms must be distinct (duplicates would alias-clash): $terms")
    require(k > 0, s"k must be positive, got $k")
    val nb = readNBuckets(spark, dir)
    val buckets = terms.map(bucketOf(_, nb)).distinct
    val lens = Snapshots.read(spark, s"$dir/doclens", snapshotId)
      .select(col("doc_id"), col("n_toks").as("dl"))
    // terms-wide tf pivot over the pruned hits: internal columns are
    // named by term INDEX (tf_0, tf_1, …) — a raw term containing '.',
    // a space, or a backtick would mis-resolve in col() — and aliased
    // back to tf_<term> only in the final select (as() never parses).
    // tf_i = stored tf for the (doc, term_i) posting, 0 when the doc
    // lacks the term — exactly the per-doc counters bm25TopK computes
    // scan-side. Docs with no query term never enter (score > 0
    // excludes them anyway).
    val ti = terms.zipWithIndex
    val tfAggs = ti.map { case (t, i) =>
      sum(when(col("tok") === t, col("tf").cast("long")).otherwise(0L))
        .as(s"tf_$i")
    }
    val hits = Snapshots.read(spark, s"$dir/postings", snapshotId)
      .filter(col("bucket").isin(buckets.map(Int.box): _*) &&
        col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(tfAggs.head, tfAggs.tail: _*)
    // df_t = docs with tf_t > 0: identical over hits and over the full
    // corpus (absent docs contribute tf = 0). N and L come from doclens
    // so they count EVERY document, matching bm25TopK's stats row.
    val dfAggs = ti.map { case (_, i) =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_tf_$i")
    }
    val stats = hits.agg(dfAggs.head, dfAggs.tail: _*)
      .crossJoin(lens.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_len")))
    val nD = col("n_docs").cast("double")
    val lD = col("total_len").cast("double")
    val score = ti.map { case (_, i) =>
      val tf = col(s"tf_$i").cast("double")
      val dfv = col(s"df_tf_$i").cast("double")
      val idf = (nD - dfv + lit(1.0)) / (dfv + lit(1.0))
      val sat = (lit(22.0) * tf * lD) /
        (lit(10.0) * tf * lD + lit(3.0) * lD +
          lit(9.0) * col("dl").cast("double") * nD)
      idf * sat
    }.reduce(_ + _)
    hits.join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id") +: col("dl") +:
        ti.map { case (t, i) => col(s"tf_$i").as(s"tf_$t") } :+
        col("score"): _*)
  }
}
