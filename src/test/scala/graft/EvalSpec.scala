package graft

import graft.agg.Eval
import org.apache.spark.sql.functions._

/** agg.Eval vs brute force: the tie-corrected Mann–Whitney AUC must
  * equal the all-pairs definition on randomized fixtures, and the
  * confusion counts must match direct counting. */
class EvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Long)]): (Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (num2, 2L * pos.size * neg.size)
  }

  test("aucExact equals the all-pairs definition (ties included)") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      // small score domain → heavy ties
      val rows = Seq.fill(60)((rnd.nextInt(8).toLong, rnd.nextInt(2).toLong))
      val (num2, den2) = bruteAuc(rows)
      val got = Eval.aucExact(rows.toDF("s", "y"), "s", "y")
        .select("n_pos", "n_neg", "auc_num2", "auc_den2")
        .as[(Long, Long, Long, Long)].head()
      assert((got._3, got._4) === (num2, den2))
      assert(got._1 === rows.count(_._2 == 1L).toLong)
    }
  }

  test("aucExact: perfect, inverted, and null-row exclusion") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
    val g = Eval.aucExact(perfect.toDF("s", "y"), "s", "y")
      .select("auc").as[Double].head()
    assert(g === 1.0)
    val inv = Eval.aucExact(perfect.map { case (s, y) => (s, 1L - y) }
      .toDF("s", "y"), "s", "y").select("auc").as[Double].head()
    assert(inv === 0.0)
    val withNulls = Seq((Some(10L), Some(1L)), (None, Some(0L)),
      (Some(1L), None), (Some(2L), Some(0L))).toDF("s", "y")
    val r = Eval.aucExact(withNulls, "s", "y")
      .select("n_pos", "n_neg").as[(Long, Long)].head()
    assert(r === ((1L, 1L)))
  }

  test("aucExact rejects non-binary labels") {
    val e = intercept[Exception] {
      Eval.aucExact(Seq((1L, 2L)).toDF("s", "y"), "s", "y").collect()
    }
    assert(e.getMessage.contains("must be 0/1"))
  }

  test("confusionAt: counts and quotients") {
    val df = Seq((10L, 1L), (9L, 0L), (5L, 1L), (1L, 0L)).toDF("s", "y")
    val r = Eval.confusionAt(df, "s", "y", threshold = 6.0).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 1L, 1L, 1L)))
    assert(r.getDouble(4) === 0.5 && r.getDouble(5) === 0.5)
    assert(r.getDouble(6) === 0.5) // 2·1/(2+1+1)
  }

  test("rougeN: multiplicity clipping, zero overlap, short/empty texts") {
    val s = spark; import s.implicits._
    val pairs = Seq(
      // cand bigrams: (a b)x2, (b a); ref bigrams: (a b), (b c) -> clipped overlap 1
      (1L, "a b a b", "a b c"),
      // identical -> full overlap 3
      (2L, "x y z w", "x y z w"),
      // disjoint -> 0
      (3L, "p q r", "s t u"),
      // too short for a bigram on one side
      (4L, "only", "a b c"),
      (5L, "", "a b")
    ).toDF("id", "cand", "ref")
    val out = graft.agg.Eval.rougeN(pairs, "id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // pair 1: cand has (a,b) twice but ref once -> clip to 1; (b,a) unmatched
    assert(out(1L) == ((3L, 2L, 1L, 1.0 / 2.0, 1.0 / 3.0, 2.0 / 5.0)))
    assert(out(2L) == ((3L, 3L, 3L, 1.0, 1.0, 1.0)))
    assert(out(3L) == ((2L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(out(4L) == ((0L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(out(5L) == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("rougeN is partition-order invariant") {
    val s = spark; import s.implicits._
    val pairs = (1L to 40L).map(i =>
      (i, s"w$i a b c d w${i % 7}", s"a b c z w${i % 5} d")).toDF("id", "cand", "ref")
    val one = graft.agg.Eval.rougeN(pairs.coalesce(1), "id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val many = graft.agg.Eval.rougeN(pairs.repartition(7), "id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(one == many)
  }

  test("rouge_overlap kernel equals the relational explode/count/min form") {
    val s = spark; import s.implicits._
    val pairs = (1L to 60L).map(i =>
      (i, s"a b c w${i % 9} a b w${i % 4} e", s"b c a b w${i % 6} e e"))
      .toDF("id", "cand", "ref")
    val viaKernel = graft.agg.Eval.rougeN(pairs, "id", "cand", "ref", 2)
      .select("pair_id", "n_cand", "n_ref", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // relational reference over the ngram_hashes multiset kernel
    val base = pairs.select(col("id"),
      graft.text.TextOps.ngramHashesOf(col("cand"), 2).as("cg"),
      graft.text.TextOps.ngramHashesOf(col("ref"), 2).as("rg"))
    val cc = base.select(col("id"), explode(col("cg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c_c"))
    val rc = base.select(col("id"), explode(col("rg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c_r"))
    val ov = cc.join(rc, Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("c_c"), col("c_r"))).as("ov"))
    val viaRel = base.join(ov, Seq("id"), "left")
      .select(col("id"), size(col("cg")).cast("long"),
        size(col("rg")).cast("long"),
        coalesce(col("ov"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaKernel == viaRel)
  }

  test("chiSquareDrift: hand-computed contribs, one-sided category, null drop") {
    val s = spark; import s.implicits._
    // A: x x x y   (Na=4)   B: x y y y (Nb=4)
    // x: D = 3*4 - 1*4 = 8, contrib = 64 / (4*4*4) = 1.0
    // y: D = 1*4 - 3*4 = -8, contrib = 64 / (4*4*4) = 1.0
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val out = graft.agg.Eval.chiSquareDrift(a, b, "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("x") == ((3L, 1L, 1.0)))
    assert(out("y") == ((1L, 3L, 1.0)))
    // a category absent on one side surfaces with count 0 (maximum
    // drift signal); nulls are ignored entirely
    val a2 = Seq(Some("x"), Some("x"), None).toDF("c")
    val b2 = Seq(Some("z"), Some("z")).toDF("c")
    val o2 = graft.agg.Eval.chiSquareDrift(a2, b2, "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // x: D = 2*2 - 0*2 = 4 -> 16/(2*2*2) = 2.0; z symmetric
    assert(o2("x") == ((2L, 0L, 2.0)))
    assert(o2("z") == ((0L, 2L, 2.0)))
    // identical distributions -> zero drift everywhere
    val same = graft.agg.Eval.chiSquareDrift(a, a, "c")
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0))
    // layout invariance (counts are exact integers)
    val again = graft.agg.Eval.chiSquareDrift(a.repartition(5),
        b.repartition(3), "c")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again == out.map { case (k, v) => k -> v._3 })
  }

  test("retrievalMetrics: hits, first-relevant rank, zero-rel and no-result queries") {
    val s = spark; import s.implicits._
    // q1: rel {10, 11, 12}; top-3 results hit 11 at rank 2 and 12 at
    //   rank 3 -> n_hit 2, p@3 = 2/3, r@3 = 2/3, rr = 1/2
    // q2: rel {20}; results never hit -> rr 0, r@3 0
    // q3: results but NO judged docs -> n_rel 0, r@3 0 (not dropped)
    // q4: judged but NO results -> zero hits row
    val results = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 10L, 4L),
      (2L, 98L, 1L), (2L, 97L, 2L),
      (3L, 96L, 1L)
    ).toDF("q", "d", "r")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (4L, 40L))
      .toDF("q", "d")
    val out = graft.agg.Eval.retrievalMetrics(results, qrels, "q", "d",
        "r", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(1L) == ((3L, 2L, 2.0 / 3.0, 2.0 / 3.0, 0.5)))
    assert(out(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0, 0.0, 0.0)))
    assert(out(4L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    // rank-4 relevant doc 10 is outside k=3 everywhere above; at k=5
    // it counts and q1's hits rise to 3
    val k5 = graft.agg.Eval.retrievalMetrics(results, qrels, "q", "d",
        "r", k = 5)
      .filter($"q" === 1L).head()
    assert(k5.getLong(2) == 3L && k5.getDouble(5) == 0.5)
    // duplicate qrel rows must not double-count
    val dupQ = qrels.union(qrels)
    val dup = graft.agg.Eval.retrievalMetrics(results, dupQ, "q", "d",
        "r", k = 3)
      .filter($"q" === 1L).head()
    assert(dup.getLong(1) == 3L && dup.getLong(2) == 2L)
  }

  test("ndcgAtK: hand-computed grades, ideal reordering, edge queries") {
    val s = spark; import s.implicits._
    val d = graft.agg.Eval.ndcgDiscounts(3)
    // q1 retrieves (doc, rank): (9,1) unjudged, (11,2) grade 2,
    //   (10,3) grade 3 -> dcg = 0 + 3*d2 + 7*d3
    //   ideal: grades [3, 2] -> idcg = 7*d1 + 3*d2
    // q2: judged {20: 1} but retrieves nothing judged -> ndcg 0
    // q3: results, NO positive judgments -> idcg null, ndcg null
    // q4: judged only, no results -> dcg 0
    val results = Seq(
      (1L, 9L, 1L), (1L, 11L, 2L), (1L, 10L, 3L),
      (2L, 98L, 1L), (3L, 96L, 1L)
    ).toDF("q", "d", "r")
    val qrels = Seq((1L, 10L, 3L), (1L, 11L, 2L), (2L, 20L, 1L),
      (3L, 96L, 0L), (4L, 40L, 2L)).toDF("q", "d", "g")
    val out = graft.agg.Eval.ndcgAtK(results, qrels, "q", "d", "r", "g",
        k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val dcg1 = 0.0 + 3.0 * d(1) + 7.0 * d(2)
    val idcg1 = 0.0 + 7.0 * d(0) + 3.0 * d(1)
    assert(out(1L) == ((2L, dcg1, Some(idcg1), Some(dcg1 / idcg1))))
    assert(out(2L) == ((1L, 0.0, Some(1.0 * d(0)), Some(0.0))))
    assert(out(3L) == ((0L, 0.0, None, None)))
    assert(out(4L)._1 == 1L && out(4L)._4 == Some(0.0))
    // negative grade raises loudly
    val bad = Seq((1L, 10L, -1L)).toDF("q", "d", "g")
    val e = intercept[Exception] {
      graft.agg.Eval.ndcgAtK(results, bad, "q", "d", "r", "g", 3)
        .collect()
    }
    assert(e.getMessage.contains("negative grade") ||
      Option(e.getCause).exists(_.getMessage.contains("negative grade")))
    // ideal top-k cut: 4 judged docs, k=2 -> idcg uses the best two
    val many = Seq((5L, 1L, 1L), (5L, 2L, 3L), (5L, 3L, 2L), (5L, 4L, 3L))
      .toDF("q", "d", "g")
    val row5 = graft.agg.Eval.ndcgAtK(
      Seq((5L, 2L, 1L)).toDF("q", "d", "r"), many, "q", "d", "r", "g", 2)
      .head()
    val d2 = graft.agg.Eval.ndcgDiscounts(2)
    assert(row5.getLong(1) == 2L)
    assert(row5.getDouble(3) == 0.0 + 7.0 * d2(0) + 7.0 * d2(1))
    // grade >= 63 raises (2^grade gain would wrap the 64-bit shift)
    val huge = Seq((1L, 10L, 63L)).toDF("q", "d", "g")
    val e2 = intercept[Exception] {
      graft.agg.Eval.ndcgAtK(results, huge, "q", "d", "r", "g", 3)
        .collect()
    }
    assert(e2.getMessage.contains("exceeds 62") ||
      Option(e2.getCause).exists(_.getMessage.contains("exceeds 62")))
    // duplicate rank (two DIFFERENT docs both at rank 1) raises
    val dupRank = Seq((1L, 9L, 1L), (1L, 10L, 1L)).toDF("q", "d", "r")
    val e3 = intercept[Exception] {
      graft.agg.Eval.ndcgAtK(dupRank, qrels, "q", "d", "r", "g", 3)
        .collect()
    }
    assert(e3.getMessage.contains("duplicate rank") ||
      Option(e3.getCause).exists(_.getMessage.contains("duplicate rank")))
    // ...but the SAME doc listed twice still collapses to best rank
    // (the documented dedup) rather than raising
    val dupDoc = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("q", "d", "r")
    val okRow = graft.agg.Eval.ndcgAtK(dupDoc, qrels, "q", "d", "r", "g", 3)
      .filter($"q" === 1L).head()
    assert(okRow.getDouble(2) == 7.0 * d(0))
  }

  test("apAtK: hand-computed precisions, truncated denominator, edges") {
    val s = spark; import s.implicits._
    // q1: ranks 1..4, relevant at 1 and 3 of 3 judged
    //   AP@3(k=3) over judged {10,11,12}: hits at r1 (cum 1) and r3
    //   (cum 2) -> (1/1 + 2/3) / min(3,3)
    val results = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L),
      (2L, 98L, 1L), // q2: nothing judged retrieved
      (3L, 96L, 1L)  // q3: no qrels at all -> NULL
    ).toDF("q", "d", "r")
    val qrels = Seq((1L, 10L, 0), (1L, 11L, 0), (1L, 12L, 0),
      (2L, 20L, 0)).toDF("q", "d", "g").select($"q", $"d")
    val out = graft.agg.Eval.apAtK(results, qrels, "q", "d", "r", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) == ((3L, Some((1.0 / 1.0 + 2.0 / 3.0) / 3.0))))
    assert(out(2L) == ((1L, Some(0.0))))
    assert(out(3L) == ((0L, None)))
    // q4: judged only, no results -> ap 0.0
    assert(graft.agg.Eval.apAtK(results,
        Seq((4L, 40L)).toDF("q", "d"), "q", "d", "r", 3)
      .filter($"q" === 4L).head().getDouble(2) == 0.0)
    // truncation: 5 judged, k=2, perfect top-2 -> AP = 1.0
    val perfect = graft.agg.Eval.apAtK(
      Seq((5L, 1L, 1L), (5L, 2L, 2L)).toDF("q", "d", "r"),
      (1L to 5L).map(i => (5L, i)).toDF("q", "d"), "q", "d", "r", 2)
      .head()
    assert(perfect.getDouble(2) == 1.0)
    // duplicate rank raises loudly
    val e = intercept[Exception] {
      graft.agg.Eval.apAtK(Seq((1L, 9L, 1L), (1L, 8L, 1L)).toDF("q", "d", "r"),
        qrels, "q", "d", "r", 3).collect()
    }
    assert(e.getMessage.contains("duplicate rank") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate rank")))
  }

  test("ksDrift: hand rational, empty sides, layout invariance") {
    val a = Seq(1.0, 2.0, 3.0).toDF("value")
    val b = Seq(3.0, 4.0).toDF("value")
    // distinct values 1,2,3,4 → |i·nb − j·na| = 2,4,3,0 → max 4
    val r = Eval.ksDrift(a, b, "value").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 6L)
    assert(r.getDouble(4) == 4.0 / 6.0)
    assert(r.getInt(5) == 0) // 1e6·16 < 1844164·5·6
    // layout invariance: the cumulative pass is over distinct values
    val again = Eval.ksDrift(a.repartition(5), b.repartition(3), "value")
      .head()
    assert(again.toSeq == r.toSeq)
    // identical sides → KS = 0
    val same = Eval.ksDrift(a, a, "value").head()
    assert(same.getLong(2) == 0L && same.getInt(5) == 0)
    // one empty side → zero rational, flag 0, no divide-by-zero
    val e1 = Eval.ksDrift(a, b.filter($"value" < 0), "value").head()
    assert(e1.getLong(0) == 3L && e1.getLong(1) == 0L &&
      e1.getLong(2) == 0L && e1.isNullAt(4) && e1.getInt(5) == 0)
    // both empty → ONE row of zeros (the readout never vanishes)
    val e2 = Eval.ksDrift(a.filter($"value" < 0), b.filter($"value" < 0),
      "value").collect()
    assert(e2.length == 1 && e2.head.getLong(0) == 0L &&
      e2.head.getInt(5) == 0)
    // a gross shift IS significant: 30 low values vs 30 high values
    val lo = (1 to 30).map(_.toDouble).toDF("value")
    val hi = (31 to 60).map(_.toDouble).toDF("value")
    val sig = Eval.ksDrift(lo, hi, "value").head()
    assert(sig.getDouble(4) == 1.0 && sig.getInt(5) == 1)
  }

  test("chiSquareDriftByGroup: per-group rows equal the two-sample form vs rest") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)((Seq("a", "b", "c")(rnd.nextInt(3)),
      Seq("x", "y", "z", "w")(rnd.nextInt(4))))
    val df = rows.toDF("g", "c")
    val byGroup = Eval.chiSquareDriftByGroup(df, "c", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    Seq("a", "b", "c").foreach { g =>
      val two = Eval.chiSquareDrift(
          df.filter($"g" === g).select($"c".as("cat")),
          df.filter($"g" =!= g).select($"c".as("cat")), "cat")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      two.foreach { case (cat, exp) =>
        assert(byGroup((g, cat)) == exp,
          s"($g,$cat): ${byGroup((g, cat))} != $exp")
      }
    }
    // a category one group never takes still materializes with n_in 0
    val skew = (rows ++ Seq.fill(40)(("a", "only_a"))).toDF("g", "c")
    val sk = Eval.chiSquareDriftByGroup(skew, "c", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sk(("b", "only_a")) == 0L && sk(("a", "only_a")) == 40L)
  }

  test("ksDriftByGroup: each group's row equals the two-sample form vs rest") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((Seq("a", "b", "c")(rnd.nextInt(3)),
      rnd.nextInt(20).toDouble + (if (rnd.nextBoolean()) 100 else 0)))
    val df = rows.toDF("g", "v")
    val byGroup = Eval.ksDriftByGroup(df, "v", "g").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(byGroup.keySet == Set("a", "b", "c"))
    Seq("a", "b", "c").foreach { g =>
      val two = Eval.ksDrift(df.filter($"g" === g).select($"v".as("value")),
        df.filter($"g" =!= g).select($"v".as("value")), "value").head()
      assert(byGroup(g) == two.toSeq,
        s"group $g: ${byGroup(g)} != two-sample ${two.toSeq}")
    }
    // a planted gross shift IS flagged for exactly the shifted group
    val shifted = (rows.map { case (g, v) => (g, v) } ++
      Seq.fill(150)(("z", 9999.0 + rnd.nextInt(5)))).toDF("g", "v")
    val z = Eval.ksDriftByGroup(shifted, "v", "g").collect()
      .map(r => r.getString(0) -> r.getInt(6)).toMap
    assert(z("z") == 1)
  }

  test("calibration: hand bins, empty-bin zeros, contract violations raise") {
    val rows = Seq((50L, 0L), (149L, 1L), (950L, 1L), (1000L, 1L),
      (1000L, 0L)).toDF("a", "y")
    val out = Eval.calibration(rows, "a", "y", bins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    val bin0 = out(0); val bin1 = out(1); val bin9 = out(9)
    assert(bin0.getLong(1) == 1L && bin0.getLong(2) == 0L &&
      bin0.getLong(3) == 50L && bin0.getLong(6) == 50L)
    assert(bin1.getLong(3) == 149L && bin1.getLong(6) == 851L)
    // a=1000 closes into the top bin; gap = |2·1000 − 2950|
    assert(bin9.getLong(1) == 3L && bin9.getLong(2) == 2L &&
      bin9.getLong(3) == 2950L && bin9.getLong(6) == 950L)
    assert(bin9.getDouble(4) == 2.0 / 3.0 &&
      bin9.getDouble(5) == 2950.0 / 3000.0)
    // empty bins materialize as zeros with null acc/conf
    assert(out(5).getLong(1) == 0L && out(5).isNullAt(4))
    // out-of-range score and non-binary label raise loudly
    intercept[Exception] {
      Eval.calibration(Seq((1001L, 0L)).toDF("a", "y"), "a", "y").collect()
    }
    intercept[Exception] {
      Eval.calibration(Seq((10L, 2L)).toDF("a", "y"), "a", "y").collect()
    }
  }

  test("fractional inputs raise instead of truncating (r13 advice)") {
    // a raw probability 0.9 used to cast("long") → 0 and pass every
    // range check — every integral contract must now raise on it
    intercept[Exception] {
      Eval.calibration(Seq((0.9, 0L)).toDF("a", "y"), "a", "y").collect()
    }
    intercept[Exception] {
      Eval.brierExact(Seq((0.9, 0L)).toDF("a", "y"), "a", "y").collect()
    }
    // fractional LABELS likewise: 0.9 truncated to 0 and passed isin(0,1)
    intercept[Exception] {
      Eval.calibration(Seq((10L, 0.9)).toDF("a", "y"), "a", "y").collect()
    }
    intercept[Exception] {
      Eval.aucExact(Seq((1L, 0.9)).toDF("s", "y"), "s", "y").collect()
    }
    intercept[Exception] {
      Eval.confusionAt(Seq((1L, 0.9)).toDF("s", "y"), "s", "y", 0.5)
        .collect()
    }
    // confusionAt now also rejects non-binary integer labels (it had
    // NO label check before r14 — label 2 doubled into tp)
    intercept[Exception] {
      Eval.confusionAt(Seq((1L, 2L)).toDF("s", "y"), "s", "y", 0.5)
        .collect()
    }
    // integral DOUBLES still pass every contract (1.0 == 1L exactly)
    val ok = Eval.brierExact(Seq((1000.0, 1.0)).toDF("a", "y"), "a", "y")
      .head()
    assert(ok.getLong(0) == 1L && ok.getLong(1) == 0L)
  }

  test("quantize: clamped monotone bucket indices, nulls pass through") {
    val s = spark; import s.implicits._
    val out = Seq(Some(-5.0), Some(0.0), Some(0.999), Some(1.0),
        Some(999.9), Some(1500.0), None).toDF("x")
      .select(Eval.quantize(col("x"), 0.0, 1000.0, 1000).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(0L), Some(0L), Some(0L), Some(1L),
      Some(999L), Some(999L), None))
    // NaN raises loudly — floor(NaN).toLong would otherwise land it
    // silently in bucket 0 (and DuckDB clamps NaN to the TOP bucket:
    // a cross-engine divergence on top of the skew)
    intercept[Exception] {
      Seq(Double.NaN).toDF("x")
        .select(Eval.quantize(col("x"), 0.0, 1000.0, 1000)).collect()
    }
  }

  test("quantizeByRank: equal-frequency buckets, skew-proof, null/NaN contract") {
    val s = spark; import s.implicits._
    // heavy tail: equal-width would put 90% in bucket 0 — rank buckets
    // spread the mass ~evenly
    val skew = ((1 to 90).map(_.toDouble / 100) ++
      Seq(1e6, 2e6, 3e6, 4e6, 5e6, 6e6, 7e6, 8e6, 9e6, 1e7)).toDF("x")
    val out = Eval.quantizeByRank(skew, "x", buckets = 4, outCol = "b")
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(n => n >= 20 && n <= 30), s"skewed: $out")
    // null passes through; NaN raises
    val withNull = Seq(Some(1.0), None).toDF("x")
    val r = Eval.quantizeByRank(withNull, "x", 4, "b")
      .orderBy("x").collect()
    assert(!r(1).isNullAt(1) && r(0).isNullAt(1))
    intercept[Exception] {
      Eval.quantizeByRank(Seq(1.0, Double.NaN).toDF("x"), "x", 4, "b")
        .collect()
    }
    // empty input: all-null buckets, no crash
    val e = Eval.quantizeByRank(skew.filter($"x" < 0), "x", 4, "b")
    assert(e.count() == 0L)
    // buckets = 1: trivial single bucket, no boundary fit (r14 review)
    val one = Eval.quantizeByRank(skew, "x", 1, "b")
      .select("b").distinct().collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(0L))
    // all-NaN column raises — must not silently null through the
    // no-boundary branch (r14 review)
    intercept[Exception] {
      Eval.quantizeByRank(Seq(Double.NaN, Double.NaN).toDF("x"),
        "x", 4, "b").collect()
    }
  }

  test("chiSquareDriftByGroupFromCounts: equals the row form; bad counts raise") {
    val s = spark; import s.implicits._
    val rows = Seq(("d1", "a"), ("d1", "a"), ("d1", "b"), ("d2", "b"),
      ("d2", "c")).toDF("g", "c")
    val viaRows = Eval.chiSquareDriftByGroup(rows, "c", "g")
      .orderBy("g", "c").collect().map(_.toSeq)
    val counts = rows.groupBy("g", "c").count()
    val viaCounts = Eval.chiSquareDriftByGroupFromCounts(counts, "g",
        "c", "count")
      .orderBy("g", "c").collect().map(_.toSeq)
    assert(viaCounts.toSeq == viaRows.toSeq)
    // duplicate (group, category) rows sum
    val dup = Eval.chiSquareDriftByGroupFromCounts(
        counts.unionByName(counts.limit(0)).unionByName(
          Seq(("d1", "a", 0L)).toDF("g", "c", "count")),
        "g", "c", "count")
      .orderBy("g", "c").collect().map(_.toSeq)
    assert(dup.toSeq == viaRows.toSeq)
    // negative and null counts raise loudly
    intercept[Exception] {
      Eval.chiSquareDriftByGroupFromCounts(
        Seq(("d1", "a", -1L)).toDF("g", "c", "n"), "g", "c", "n")
        .collect()
    }
    intercept[Exception] {
      Eval.chiSquareDriftByGroupFromCounts(
        Seq(("d1", "a", Option.empty[Long])).toDF("g", "c", "n"),
        "g", "c", "n").collect()
    }
  }

  test("aucExact/aucByGroup: one-class input yields null auc, not NaN") {
    val s = spark; import s.implicits._
    val onlyPos = Seq((1L, 1L), (2L, 1L)).toDF("s", "y")
    val r = Eval.aucExact(onlyPos, "s", "y").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L &&
      r.getLong(3) == 0L && r.isNullAt(4))
  }

  test("distinct-value guards raise before the single-partition pass (r14)") {
    val s = spark; import s.implicits._
    val a = spark.range(100).select(($"id" + 0.5).as("value"))
    val b = spark.range(100).select(($"id" * 2 + 0.25).as("value"))
    // over-cardinality ksDrift raises and names the quantizer
    val e = intercept[Exception] {
      Eval.ksDrift(a, b, "value", maxDistinct = 10).collect()
    }
    assert(e.getMessage.contains("quantize"),
      s"guard message must name the quantizer: ${e.getMessage}")
    // quantized to <= maxDistinct buckets, the same inputs pass the
    // same guard and match the directly-computed rational
    def q(df: org.apache.spark.sql.DataFrame) =
      df.select(Eval.quantize($"value", 0.0, 200.0, 10).as("value"))
    val r = Eval.ksDrift(q(a), q(b), "value", maxDistinct = 10).head()
    val full = Eval.ksDrift(q(a), q(b), "value").head()
    assert(r.toSeq == full.toSeq)
    // aucExact: same guard, same shape
    val scored = spark.range(100).select(($"id" + 0.5).as("s"),
      ($"id" % 2).cast("long").as("y"))
    val e2 = intercept[Exception] {
      Eval.aucExact(scored, "s", "y", maxDistinct = 10).collect()
    }
    assert(e2.getMessage.contains("quantize"))
    // per-group KS: the grid would explode groups-fold — same guard
    val e3 = intercept[Exception] {
      Eval.ksDriftByGroup(a.withColumn("g", $"value" > 50), "value",
        "g", maxDistinct = 10).collect()
    }
    assert(e3.getMessage.contains("quantize"))
    val qs = scored.select(Eval.quantize($"s", 0.0, 100.0, 10).as("s"),
      $"y")
    val ok = Eval.aucExact(qs, "s", "y", maxDistinct = 10).head()
    assert(ok.getLong(0) == 50L && ok.getLong(1) == 50L)
  }

  test("clusterPairCounts: hand contingency, identity and degenerate clusterings") {
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"),
      ("b", "y")).toDF("p", "c")
    val r = Eval.clusterPairCounts(rows, "p", "c").head()
    // cells C(2,2)+C(1,2)+C(2,2)=2; pred 3+1=4; truth 1+3=4; tot C(5,2)=10
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((5L, 2L, 2L, 2L, 4L)))
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5 &&
      r.getDouble(7) == 0.5 && r.getDouble(8) == 0.6)
    // perfect clustering: pred == truth → FP = FN = 0, Rand = 1
    val perfect = Eval.clusterPairCounts(
      rows.select(col("c").as("p"), col("c")), "p", "c").head()
    assert(perfect.getLong(2) == 0L && perfect.getLong(3) == 0L &&
      perfect.getDouble(8) == 1.0)
    // all-singletons prediction: TP = FP = 0, precision null, recall 0
    val s = spark; import s.implicits._
    val single = Eval.clusterPairCounts(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("p", "c"), "p", "c")
      .head()
    assert(single.getLong(1) == 0L && single.getLong(2) == 0L &&
      single.isNullAt(5) && single.getDouble(6) == 0.0)
    // empty input: one row of zeros, null ratios — never vanishes
    val e = Eval.clusterPairCounts(rows.filter(col("p") === "zz"),
      "p", "c").head()
    assert(e.getLong(0) == 0L && e.getLong(4) == 0L && e.isNullAt(8))
    // layout invariance
    val again = Eval.clusterPairCounts(rows.repartition(7), "p", "c")
      .head()
    assert(again.toSeq == r.toSeq)
  }

  test("aucByGroup equals per-slice aucExact; one-class groups null") {
    val s = spark; import s.implicits._
    val rows = Seq(("a", 1L, 0L), ("a", 2L, 1L), ("a", 2L, 0L),
      ("a", 3L, 1L), ("b", 5L, 1L), ("b", 1L, 0L), ("b", 2L, 0L),
      ("c", 7L, 1L), ("c", 9L, 1L)) // c: positives only → null auc
      .toDF("g", "sc", "y")
    val byG = Eval.aucByGroup(rows, "sc", "y", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      val slice = Eval.aucExact(rows.filter($"g" === g), "sc", "y")
        .head().toSeq
      assert(byG(g).toSeq.drop(1) == slice, s"group $g")
    }
    assert(byG("c").getLong(2) == 0L && byG("c").isNullAt(5))
    // the same cardinality guard as the two-sample form
    intercept[Exception] {
      Eval.aucByGroup(spark.range(100).select(lit("g").as("g"),
          ($"id" + 0.5).as("sc"), ($"id" % 2).cast("long").as("y")),
        "sc", "y", "g", maxDistinct = 10).collect()
    }
  }

  test("calibrationByGroup/brierByGroup equal the per-slice two-sample forms") {
    val s = spark; import s.implicits._
    val rows = Seq(("a", 50L, 0L), ("a", 149L, 1L), ("a", 950L, 1L),
      ("b", 1000L, 1L), ("b", 1000L, 0L), ("b", 10L, 1L))
      .toDF("g", "a", "y")
    val byG = Eval.calibrationByGroup(rows, "a", "y", "g", bins = 10)
    // every (group, bin) cell materializes — including all-zero bins
    assert(byG.count() == 20L)
    Seq("a", "b").foreach { g =>
      val slice = Eval.calibration(rows.filter($"g" === g), "a", "y",
        bins = 10).orderBy("bin").collect().map(_.toSeq)
      val got = byG.filter($"g" === g).orderBy("bin")
        .drop("g").collect().map(_.toSeq)
      assert(got.toSeq == slice.toSeq, s"group $g calibration mismatch")
      val bs = Eval.brierExact(rows.filter($"g" === g), "a", "y")
        .head().toSeq
      val bg = Eval.brierByGroup(rows, "a", "y", "g")
        .filter($"g" === g).drop("g").head().toSeq
      assert(bg == bs, s"group $g brier mismatch")
    }
    // contract violations raise with the per-group names
    intercept[Exception] {
      Eval.calibrationByGroup(Seq(("a", 0.9, 0L)).toDF("g", "a", "y"),
        "a", "y", "g").collect()
    }
    intercept[Exception] {
      Eval.brierByGroup(Seq(("a", 1001L, 0L)).toDF("g", "a", "y"),
        "a", "y", "g").collect()
    }
  }

  test("brierExact: hand sum, empty input row") {
    val rows = Seq((50L, 0L), (149L, 1L), (950L, 1L), (1000L, 1L),
      (1000L, 0L)).toDF("a", "y")
    val r = Eval.brierExact(rows, "a", "y").head()
    // 50² + 851² + 50² + 0² + 1000² = 1729201
    assert(r.getLong(0) == 5L && r.getLong(1) == 1729201L)
    assert(r.getDouble(2) == 1729201.0 / 5000000.0)
    val e = Eval.brierExact(rows.filter($"a" < 0), "a", "y").head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(2))
  }
}
