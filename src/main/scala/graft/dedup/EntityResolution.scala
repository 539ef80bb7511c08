package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): records whose
  * strings are within `maxDist` Levenshtein edits — compared only
  * inside caller-chosen blocking keys, never all-pairs — become match
  * edges; connected components over the match graph resolve entities;
  * the minimum record id is each entity's canonical id. The classic
  * Fellegi–Sunter blocking shape, re-expressed on the engine's existing
  * pair-graph machinery ([[Clusters.connectedComponents]] — the same
  * pipeline that resolves LSH/phash/embedding duplicate families).
  *
  * Scale shape (100 TB): the self-join keys on the blocking columns
  * (one shuffle each side, identical children so the exchange is
  * computed once), `maxBlock` caps degenerate blocks exactly like the
  * LSH tier's hot-bucket cap (a block that big means the blocking key
  * is wrong — linkage quality is already gone; the cap keeps the cost
  * bounded and the drop observable), a cheap length prefilter runs
  * before the DP distance (|len(a)−len(b)| > maxDist can never match),
  * and the distance itself is Spark's codegen'd bounded `levenshtein`
  * (threshold form: the DP band is (2·maxDist+1)-wide, O(maxDist·n)
  * per pair, and bails out early at -1). Edges carry two ids + one int. */
object EntityResolution {

  /** Match edges: (id_1, id_2, dist), id_1 < id_2, dist ≤ maxDist.
    * Records whose block exceeds `maxBlock` members are dropped from
    * pairing (they stay singleton entities in [[resolve]]). */
  def matchPairs(df: DataFrame, idCol: String, recordCol: String,
      blockCols: Seq[String], maxDist: Int,
      maxBlock: Option[Int] = Some(10000)): DataFrame = {
    require(blockCols.nonEmpty,
      "entity resolution without blocking keys is all-pairs — block first")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val recs0 = df.select(
      (col(idCol) +: col(recordCol) +: blockCols.map(col)) :+
        length(col(recordCol)).as("__len"): _*)
    val recs = maxBlock.fold(recs0) { cap =>
      val w = Window.partitionBy(blockCols.map(col): _*)
      recs0.withColumn("__bn", count(lit(1)).over(w))
        .filter(col("__bn") <= cap).drop("__bn")
    }
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    recs.as("a").hint("shuffle_hash").join(recs.as("b"),
        blockEq && col(s"a.$idCol") < col(s"b.$idCol") &&
          abs(col("a.__len") - col("b.__len")) <= maxDist)
      // exact char-frequency count filter (r18, lossless: one edit
      // moves the frequency-vector L1 distance by ≤ 2) — prunes most
      // in-block pairs before they pay the banded Levenshtein DP
      .filter(call_function("ed_freq_gate", col(s"a.$recordCol"),
        col(s"b.$recordCol"), lit(2 * maxDist)))
      .withColumn("dist",
        levenshtein(col(s"a.$recordCol"), col(s"b.$recordCol"), maxDist))
      .filter(col("dist") >= 0)
      .select(col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"),
        col("dist"))
  }

  /** Full resolution: every input record labelled with its entity.
    * Output: idCol, `entity_id` (min id in the match component),
    * `n_members`, `is_canonical`. Unmatched records are their own
    * entity with n_members = 1. */
  def resolve(df: DataFrame, idCol: String, recordCol: String,
      blockCols: Seq[String], maxDist: Int,
      maxBlock: Option[Int] = Some(10000)): DataFrame = {
    val pairs = matchPairs(df, idCol, recordCol, blockCols, maxDist,
      maxBlock)
    val cc = Clusters.connectedComponents(pairs, "id_1", "id_2",
      df.select(col(idCol)), idCol)
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id").as("entity_id"),
        col("n_members"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }
}
