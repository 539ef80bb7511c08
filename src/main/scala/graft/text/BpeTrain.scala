package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the tokenizer-TRAINING half of the
  * BPE story (the counting half, applying a GIVEN merge table, is the
  * codegen'd `graft.functions.BpeCount` behind q106). The reference
  * leaves tokenizer training to external tools; a 100 TB corpus build
  * wants it in-engine, over the same token layer everything else uses.
  *
  * Algorithm (Sennrich-style word-internal BPE):
  * 1. Compress the corpus to a (word, freq) table — vocabulary-sized,
  *    typically 10⁵–10⁷ rows regardless of corpus bytes. THIS is what
  *    makes distributed BPE training cheap: every later iteration
  *    touches word types, never corpus tokens.
  * 2. Each word starts as its character sequence. Per round: count
  *    adjacent symbol pairs weighted by word freq (map-combined sum —
  *    one partial row per partition per pair), take the arg-max pair
  *    (count desc, then lexicographic — ties can never reach the
  *    engine), and rewrite every word by merging leftmost
  *    non-overlapping occurrences. `localCheckpoint` truncates the
  *    per-round lineage exactly as in `Clusters`' pointer-jumping loop.
  *
  * Driver coordination per round is ONE collected row (the arg-max
  * pair) — bounded metadata, same transfer class as OrderStat.
  *
  * Determinism: pair counts are exact int64 sums of word frequencies;
  * the arg-max key (count, left, right) is injective; the merge rewrite
  * is a pure per-row fold. Same corpus ⇒ identical merge table at any
  * parallelism. */
object BpeTrain {

  /** Merge leftmost non-overlapping (a, b) occurrences inside a symbol
    * array: fold with (result, carry) state — carry `a` matched by a
    * following `b` emits the merged symbol and clears, so "a a a"
    * under (a,a) becomes ["aa", "a"], never ["aa", "aa"]. */
  private def mergePair(tokens: Column, a: String, b: String): Column = {
    val merged = a + b
    val empty = array().cast("array<string>")
    aggregate(
      tokens,
      struct(empty.as("res"), lit(null).cast("string").as("carry")),
      (st, x) =>
        when(st.getField("carry") === a && x === b,
          struct(concat(st.getField("res"), array(lit(merged))).as("res"),
            lit(null).cast("string").as("carry")))
        .otherwise(
          struct(
            when(st.getField("carry").isNull, st.getField("res"))
              .otherwise(concat(st.getField("res"),
                array(st.getField("carry")))).as("res"),
            x.as("carry"))),
      st =>
        when(st.getField("carry").isNull, st.getField("res"))
          .otherwise(concat(st.getField("res"), array(st.getField("carry")))))
  }

  /** Learn up to `numMerges` merges from the corpus text; returns the
    * merge table (rank, left, right, merged, pair_count) — rank 1 is
    * the first (most frequent) merge. Stops early when no adjacent
    * pair remains. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    // corpus -> (word, freq): the one corpus-sized pass
    val words = df
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    // each word starts as its character (codepoint) sequence
    var state = words.select(col("__f"),
      expr("transform(sequence(1, char_length(__w)), i -> substring(__w, i, 1))")
        .as("__t"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val top = state
        .filter(size(col("__t")) >= 2)
        .select(col("__f"), explode(
          expr("transform(sequence(1, size(__t) - 1), " +
            "i -> struct(__t[i - 1] AS l, __t[i] AS r))")).as("__p"))
        .groupBy(col("__p.l").as("__l"), col("__p.r").as("__r"))
        .agg(sum(col("__f")).as("__c"))
        .orderBy(col("__c").desc, col("__l"), col("__r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l, r, l + r, c))
        // localCheckpoint truncates the per-round lineage; dead rounds'
        // blocks are reclaimed by ContextCleaner after the reassignment
        // (same lifecycle as Clusters' pointer-jumping loop)
        state = state
          .select(col("__f"), mergePair(col("__t"), l, r).as("__t"))
          .localCheckpoint(true)
        round += 1
      }
    }
    import spark.implicits._
    merges.toSeq
      .toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("merged"), col("pair_count"))
  }
}
