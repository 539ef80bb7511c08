package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs/PPJoin
  * family) — the lossless complement to the LSH (q66, probabilistic
  * recall) and capped posting-list (q68, `maxDf` drops hot shingles)
  * near-dup paths: every pair with Jaccard ≥ τ is returned, none
  * missed, with candidate generation still far below all-pairs.
  *
  * Principle (prefix filter): order every doc's shingle set by ONE
  * global total order (rare-first: ascending document frequency, then
  * hash). If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and two sets
  * with overlap ≥ ⌈τ·|x|⌉ must collide within their first
  * |x| − ⌈τ·|x|⌉ + 1 elements — so joining on PREFIX tokens only is
  * lossless, and because prefixes hold each doc's RAREST shingles,
  * posting lists in the candidate join are the short ones (a hot
  * stop-shingle is ranked last and never enters a prefix unless τ is
  * tiny). τ is a rational num/den and every filter is integer
  * arithmetic — no float threshold can flip a pair cross-engine.
  *
  * Scale shape (100 TB): per-doc size and per-shingle df are window
  * counts on the exchanges the pipeline needs anyway (the
  * sparseJaccardPairs discipline); the candidate join carries
  * (h, id, n) longs; verification co-counts only candidate pairs —
  * never the corpus². Worst case remains adversarial (τ→0 with a
  * stop-shingle corpus degrades toward all-pairs — that is inherent to
  * EXACT similarity join; the capped/LSH operators are the escape
  * hatch when approximate recall is acceptable). */
object SetSimJoin {

  /** All pairs with Jaccard(shingles(a), shingles(b)) ≥ tauNum/tauDen,
    * exactly. Returns (id_1, id_2, n_1, n_2, inter, jaccard) with
    * id_1 < id_2; jaccard is the IEEE quotient of exact integers. */
  def prefixJaccardJoin(df: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int, shingleK: Int = 3): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"threshold must be a rational in (0,1], got $tauNum/$tauDen")
    // slim checkpointed base: (id, shingle-hash array, n). Three
    // consumers (the posting explode + both verify sides) read it
    // instead of re-running the tokenize per subtree.
    val base = df
      .select(col(idCol).as("__id"),
        TextOps.shingleHashes(col(textCol), shingleK).as("__sh"))
      .withColumn("n", size(col("__sh")).cast("long"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    val wHash = Window.partitionBy(col("h"))
    val wRank = Window.partitionBy(col("__id"))
      .orderBy(col("df").asc, col("h").asc)
    val posting = base
      .select(col("__id"), col("n"), explode(col("__sh")).as("h"))
      .withColumn("df", count(lit(1)).over(wHash))
      .withColumn("rk", row_number().over(wRank).cast("long"))
    // prefix length p = n − ⌈τ·n⌉ + 1, in exact integers (`div` is
    // SQL integer division — n and the τ terms are nonnegative longs)
    val prefixLen =
      expr(s"n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1")
    val prefix = posting.filter(col("rk") <= prefixLen)
      .select(col("__id"), col("h"), col("n"), col("rk"))
    // candidates need THREE simultaneous facts (all exact integers):
    //  - a rare-prefix collision (the prefix theorem: the SMALLEST
    //    common shingle of a J ≥ τ pair lies in BOTH prefixes);
    //  - the τ size-ratio bound (J ≥ τ ⇒ τ·max(n₁,n₂) ≤ min(n₁,n₂));
    //  - PPJoin's position filter: past that smallest common shingle
    //    (positions rk_a/rk_b in the shared rare-first order) at most
    //    min(n₁−rk_a, n₂−rk_b)+1 common shingles can remain, which
    //    must reach the overlap bound α = ⌈num·(n₁+n₂)/(num+den)⌉ —
    //    late-prefix-only collisions die here instead of in verify
    //    (sf0.1: 310k candidates → far fewer reach the intersect).
    // DISTINCT because a pair may collide on several prefix shingles.
    val alpha = expr(s"($tauNum * (a.n + b.n) + ${tauNum + tauDen - 1})" +
      s" div ${tauNum + tauDen}")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.__id") < col("b.__id") &&
          lit(tauNum.toLong) * greatest(col("a.n"), col("b.n")) <=
            lit(tauDen.toLong) * least(col("a.n"), col("b.n")) &&
          least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) +
            lit(1L) >= alpha)
      .select(col("a.__id").as("id_1"), col("b.__id").as("id_2"),
        col("a.n").as("n_1"), col("b.n").as("n_2"))
      .distinct()
    // exact verification: per candidate pair, ONE codegen'd sorted-set
    // intersect over the docs' shingle arrays — never an exploded
    // (pair × shingle) co-count shuffle (the first cut aggregated 21M
    // rows at sf0.1 and dominated the runtime). The id-keyed array
    // relation broadcasts while it fits; past that it degrades to a
    // pair-bounded shuffle join on id — still never corpus².
    val arrays1 = base.select(col("__id").as("id_1"), col("__sh").as("__sh1"))
    val arrays2 = base.select(col("__id").as("id_2"), col("__sh").as("__sh2"))
    cand
      .join(arrays1, "id_1")
      .join(arrays2, "id_2")
      .withColumn("inter",
        size(array_intersect(col("__sh1"), col("__sh2"))).cast("long"))
      .filter(lit(tauDen.toLong) * col("inter") >=
        lit(tauNum.toLong) * (col("n_1") + col("n_2") - col("inter")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_1") + col("n_2") - col("inter")).cast("double"))
      .select(col("id_1"), col("id_2"), col("n_1"), col("n_2"),
        col("inter"), col("jaccard"))
  }

  /** EXACT asymmetric CONTAINMENT join: every ORDERED pair (a, b),
    * a ≠ b, with |shingles(a) ∩ shingles(b)| ≥ ⌈τ·|shingles(a)|⌉ —
    * "a's content is ≥τ contained in b", the quote/mirror/boilerplate-
    * wrap detector Jaccard cannot express (a 50-shingle quote inside a
    * 5000-shingle page has J ≈ 0.01 but containment 1.0).
    *
    * Same prefix-filter discipline as [[prefixJaccardJoin]], adapted to
    * the one-sided bound: with α(a) = ⌈τ·n_a⌉ common shingles required,
    * the SMALLEST common shingle (rare-first global order) lies within
    * a's first n_a − α(a) + 1 shingles AND within b's first
    * n_b − α(a) + 1 — so the a-side explodes only its prefix while the
    * b-side keeps full rank-annotated postings (b's bound depends on
    * a's size, unknowable at explode time) and the b-position filter
    * runs in the join condition instead. All thresholds are exact
    * integer arithmetic on a rational τ; verification is the same
    * one-intersect-per-candidate kernel. LOSSLESS by the same theorem.
    *
    * Scale shape: identical exchanges to the Jaccard form — the only
    * asymmetry is b's unpruned posting side, whose hot shingles meet
    * only a-prefixes (rare-first: a stop-shingle enters an a-prefix
    * only for a document made almost entirely of stop-shingles, the
    * inherent worst case of any exact containment join).
    *
    * Returns (id_a, id_b, n_a, n_b, inter, containment), containment
    * the IEEE quotient inter/n_a. */
  def prefixContainmentJoin(df: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int, shingleK: Int = 3): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"threshold must be a rational in (0,1], got $tauNum/$tauDen")
    val base = df
      .select(col(idCol).as("__id"),
        TextOps.shingleHashes(col(textCol), shingleK).as("__sh"))
      .withColumn("n", size(col("__sh")).cast("long"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    val wHash = Window.partitionBy(col("h"))
    val wRank = Window.partitionBy(col("__id"))
      .orderBy(col("df").asc, col("h").asc)
    val posting = base
      .select(col("__id"), col("n"), explode(col("__sh")).as("h"))
      .withColumn("df", count(lit(1)).over(wHash))
      .withColumn("rk", row_number().over(wRank).cast("long"))
    // α(a) = ⌈τ·n_a⌉; a-prefix length = n_a − α(a) + 1
    val alphaA = s"(($tauNum * a.n + ${tauDen - 1}) div $tauDen)"
    val prefixA = posting
      .filter(col("rk") <=
        expr(s"n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1"))
      .select(col("__id"), col("h"), col("n"), col("rk"))
    val cand = prefixA.as("a")
      .join(posting.select(col("__id"), col("h"), col("n"), col("rk"))
          .as("b"),
        col("a.h") === col("b.h") && col("a.__id") =!= col("b.__id") &&
          // both remaining-suffix bounds must still reach α(a)
          (col("a.n") - col("a.rk") + lit(1L)) >= expr(alphaA) &&
          (col("b.n") - col("b.rk") + lit(1L)) >= expr(alphaA))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("__sha")),
        "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("__shb")),
        "id_b")
      .withColumn("inter",
        size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .filter(lit(tauDen.toLong) * col("inter") >=
        lit(tauNum.toLong) * col("n_a"))
      .withColumn("containment",
        col("inter").cast("double") / col("n_a").cast("double"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("inter"), col("containment"))
  }
}
