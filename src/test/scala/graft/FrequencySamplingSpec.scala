package graft

import graft.agg.HeavyHitters
import graft.text.{CorpusOps, Curation}
import org.apache.spark.sql.functions._

/** Round-10 corpus-frequency tier: exact φ-heavy-hitters (Misra-Gries
  * sketch + verify), τ=0.5 temperature stratum sampling, and sliding-
  * window duplicated-substring spans. */
class FrequencySamplingSpec extends SparkSpecBase {

  // ---- Misra-Gries kernel ---------------------------------------------

  test("misraGries survivor superset: count > n/(cap+1) always survives") {
    // n = 9, capacity 2: "a" (5 > 9/3 = 3) must survive any adversarial
    // interleaving of the four singletons
    val stream = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a")
    val out = HeavyHitters.misraGries(stream.iterator, 2).toSet
    assert(out.contains("a"))
  }

  test("misraGries decrement-all cancels an even split exactly") {
    // cap 2: a:1, b:1, then c hits a full summary and decrements both
    // away (c itself is not inserted) — the classic empty-summary case
    val out = HeavyHitters.misraGries(Iterator("a", "b", "c"), 2).toSet
    assert(out.isEmpty)
  }

  test("misraGries keeps exact counts while under capacity") {
    val out = HeavyHitters.misraGries(
      Iterator("x", "y", "x", "x", "y"), 8).toSet
    assert(out == Set("x", "y"))
  }

  // ---- exact heavy hitters --------------------------------------------

  private def skewedItems(seed: Int) = {
    val s = spark
    import s.implicits._
    // item i appears 3*i+1 times (i in 0..39): heavy tail + many lights,
    // shuffled deterministically and spread over 7 partitions so the
    // per-partition sketches genuinely saturate (capacity 16 < 40)
    val rows = (0 until 40).flatMap(i => Seq.fill(3 * i + 1)(s"it$i"))
    new scala.util.Random(seed).shuffle(rows).toDF("item").repartition(7)
  }

  test("exactHeavyHitters is bit-identical to the full exact groupBy") {
    val items = skewedItems(42)
    val n = items.count()
    // N = 2380, φ⁻¹ = 30 → threshold 79: items 26..39 qualify, the rest
    // don't; capacity 32 < 40 distinct so the sketches genuinely evict
    val threshold = math.max(1L, n / 30L)
    val exact = items.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.exactHeavyHitters(items, "item", 30L, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size == 14 && got == exact)
  }

  test("exactHeavyHitters ignores nulls and keeps the caller's column name") {
    val s = spark
    import s.implicits._
    val items = (Seq.fill(30)(Some("hot")) ++ Seq.fill(5)(Some("cold")) ++
      Seq.fill(10)(None)).toDF("tok")
    // N = 35 non-null, phiInverse 3 -> threshold 11: only "hot"
    val out = HeavyHitters.exactHeavyHitters(items, "tok", 3L, 8)
    assert(out.columns.toSeq == Seq("tok", "n"))
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("hot" -> 30L))
  }

  test("exactHeavyHitters rejects a capacity below phiInverse") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(skewedItems(1), "item", 30L, 16)
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("exactHeavyHitters rejects the non-strict guarantee boundary") {
    // review counterexample: phiInverse = capacity = 3, N = 8 →
    // threshold 2 == N/(capacity+1): MG may decrement a count-2 item
    // away entirely, so the runtime guard must refuse rather than
    // silently drop a qualifying item
    val s = spark
    import s.implicits._
    val items = Seq("a", "a", "b", "c", "d", "e", "f", "g").toDF("item")
      .coalesce(1)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(items, "item", 3L, 3)
    }
    assert(e.getMessage.contains("cannot guarantee"))
  }

  // ---- integer square root --------------------------------------------

  test("intSqrt is exact across boundaries and huge inputs") {
    val s = spark
    import s.implicits._
    val xs = ((0L to 5000L) ++
      Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 62) - 1, 1L << 62,
        999999999999L, 4611686014132420608L)).toDF("x")
    val bad = xs.select(col("x"), Curation.intSqrt(col("x")).as("s"))
      .collect().filter { r =>
        val (x, sq) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)))
        !(sq * sq <= x && (sq + 1) * (sq + 1) > x)
      }
    assert(bad.isEmpty)
  }

  // ---- sqrt temperature sampling --------------------------------------

  private def strataDf() = {
    val s = spark
    import s.implicits._
    ((1L to 100L).map(i => (i, "big")) ++
      (101L to 110L).map(i => (i, "small"))).toDF("id", "grp")
  }

  test("sqrtTemperatureSample keeps ⌊√(n·m)⌋ of big strata, all of small") {
    val out = Curation.sqrtTemperatureSample(strataDf(), "grp", "id", 16L, "t")
      .collect()
    val byGrp = out.groupBy(_.getAs[String]("grp")).view.mapValues(_.length)
    // big: isqrt(1600) = 40 of 100; small: isqrt(160) = 12 >= 10 -> all
    assert(byGrp("big") == 40 && byGrp("small") == 10)
    assert(out.filter(_.getAs[String]("grp") == "small")
      .forall(_.getAs[Long]("k_target") == 10L))
  }

  test("sqrtTemperatureSample is seed-deterministic and seed-sensitive") {
    def ids(seed: String) =
      Curation.sqrtTemperatureSample(strataDf(), "grp", "id", 16L, seed)
        .collect().map(_.getAs[Long]("id")).toSet
    assert(ids("t") == ids("t"))
    assert(ids("t") != ids("u"))
  }

  // ---- duplicated-substring spans -------------------------------------

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dupSubstringSpans merges a shared run into one maximal span") {
    // docs 1 and 2 share a 7-token run at different offsets; width 5 ->
    // 3 flagged windows each, merging to one span of len 7
    val shared = "c1 c2 c3 c4 c5 c6 c7"
    val out = Curation.dupSubstringSpans(docs(
        1L -> s"a1 a2 $shared a3",
        2L -> s"$shared b1 b2 b3 b4",
        3L -> "u1 u2 u3 u4 u5 u6 u7 u8"), "doc_id", "text", 5, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // (doc, span_i, start, len, n_windows)
    assert(out == Set((1L, 1L, 2L, 7L, 3L), (2L, 1L, 0L, 7L, 3L)))
  }

  test("contaminationSpans flags only spans present in the test side") {
    val leak = "l1 l2 l3 l4 l5 l6"
    val train = docs(
      1L -> s"t1 t2 $leak t3",          // contaminated: 6-token leak
      2L -> "t4 t5 t6 t7 t8 t9")        // clean
    val test = docs(
      10L -> s"e1 $leak e2",
      11L -> "e3 e4 e3 e4 e3 e4 e3 e4") // test-internal repeats: irrelevant
    val out = graft.text.Curation.contaminationSpans(
        train, test, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set((1L, 1L, 2L, 6L, 2L)))
  }

  test("tfIdfKeywords ranks by integer tf/df score with token tie-break") {
    val out = CorpusOps.tfIdfKeywords(docs(
        1L -> "a a a b c",  // a: 3/2, c: 1/1, b: 1/2
        2L -> "a d d",      // d: 2/1, a: 1/2
        3L -> "b b",        // b: 2/2
        4L -> "x y"),       // tie at 1/1 -> token asc
        "doc_id", "text", 2)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getAs[Long]("kw_rank"))
        .map(_.getAs[String]("token")).toSeq).toMap
    assert(out == Map(
      1L -> Seq("a", "c"), 2L -> Seq("d", "a"),
      3L -> Seq("b"), 4L -> Seq("x", "y")))
  }

  test("dupSubstringSpans separates disjoint islands and skips short docs") {
    val s1 = "p1 p2 p3 p4 p5"
    val s2 = "q1 q2 q3 q4 q5"
    val out = Curation.dupSubstringSpans(docs(
        1L -> s"$s1 x1 x2 $s2",        // two disjoint 5-token islands
        2L -> s"$s2 y1 y2 y3 $s1",
        3L -> "p1 p2 p3"),             // shorter than the window: ignored
        "doc_id", "text", 5, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set((1L, 1L, 0L, 5L), (1L, 2L, 7L, 5L),
      (2L, 1L, 0L, 5L), (2L, 2L, 8L, 5L)))
  }
}
