package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators (graft.text, graft.dedup). */
class TextDedupSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Reference implementation of the portable hash. */
  private def refHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * TextOps.B + c.toLong) % TextOps.P)

  test("portableHash matches the scalar reference fold") {
    val d = docs(Seq((1L, "hello world"), (2L, ""), (3L, "a")))
      .select(TextOps.portableHash(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(d == Seq(refHash("hello world"), 0L, 97L))
  }

  test("native portable_hash expression equals the HOF formulation on real docs") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val diff = docs.select(
        TextOps.portableHash(col("text")).as("a"),
        TextOps.portableHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("shingleHashes = polynomial combine of token hashes, distinct") {
    val out = docs(Seq((1L, "a b c d")))
      .select(TextOps.shingleHashes(col("text"), 3).as("sh"))
      .head().getSeq[Long](0)
    val ha = refHash("a"); val hb = refHash("b"); val hc = refHash("c"); val hd = refHash("d")
    def comb(xs: Long*) = xs.reduceLeft((h, x) => (h * TextOps.B + x) % TextOps.P)
    assert(out == Seq(comb(ha, hb, hc), comb(hb, hc, hd)))
  }

  test("langId picks the dominant stopword language") {
    val d = docs(Seq(
      (1L, "the cat and the dog is here with you"),
      (2L, "der hund und die katze ist nicht da mit ich"),
      (3L, "xyzzy qwerty asdf"))) // no stopwords → unknown
      .select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(d == Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("quality score favors clean prose over symbol soup") {
    val d = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away with it"),
      (2L, "@#$% 12 !! ### $$$ %%% ^^^ &&& *** ((( )))")))
      .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(d(1L) > d(2L) + 0.3)
  }

  test("exactDedupTags groups identical texts under min id") {
    val d = Dedup.exactDedupTags(
      docs(Seq((1L, "same text"), (2L, "same text"), (3L, "other"))),
      "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(d == Seq((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("minhash signature identical for identical docs, differs otherwise") {
    val d = docs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now")))
      .select(col("doc_id"), Dedup.minhashSig(col("text"), 16, 3).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(d(1L) == d(2L))
    assert(d(1L) != d(3L))
    assert(d(1L).length == 16)
  }

  test("lshCandidates rejects numHashes not divisible by numBands") {
    val e = intercept[IllegalArgumentException] {
      Dedup.lshCandidates(docs(Seq((1L, "a b c"))), "doc_id", "text",
        numHashes = 16, numBands = 5)
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("lshNearDupPairs finds planted near-duplicates and skips distinct docs") {
    val base = "one two three four five six seven eight nine ten " * 3
    val near = base.replace("five", "5") // small edit → high jaccard
    val far = "completely unrelated content with no overlap whatsoever at all"
    val out = Dedup.lshNearDupPairs(
      docs(Seq((1L, base), (2L, near), (3L, far), (4L, base + " tail"))),
      "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)) && out.contains((1L, 4L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("sparse (explode-join) jaccard equals the array-intersect form on real docs") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(120)
    val sparse = Dedup.sparseJaccardPairs(docs, "doc_id", "text", threshold = 0.02)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dense = Dedup.blockedJaccardPairs(
        docs.withColumn("blk", lit(1)), "doc_id", "text", "blk")
      .filter(col("jaccard") >= 0.02)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(sparse.keySet == dense.keySet)
    sparse.foreach { case (k, v) => assert(math.abs(v - dense(k)) < 1e-12, k) }
  }

  test("simhash hamming distance small for near-dups, large for unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(Seq(
      (1L, base), (2L, base + " okay"),
      (3L, "zx qv wj kp fh sm dn bl rt gy")))
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(d(1L), d(2L)) < ham(d(1L), d(3L)))
    assert(ham(d(1L), d(2L)) <= 4)
  }

  test("hamming column operator counts differing simhash bits") {
    val s = spark
    import s.implicits._
    val d = Seq((0xF0L, 0x0FL), (5L, 5L)).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b")).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(d == Seq(8, 0))
  }

  test("punctRatio measures punctuation density") {
    val s = spark
    import s.implicits._
    val r = Seq(("a,b.c!", "abc")).toDF("p", "q")
      .select(TextOps.punctRatio(col("p")), TextOps.punctRatio(col("q")))
      .head()
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.0)
  }

  test("null and empty texts flow through text/dedup operators without crashing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("normal text here")), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.fingerprint(col("text")).as("fp"),
      TextOps.langId(col("text")).as("lang"),
      Dedup.simhash(col("text")).as("sh"),
      Dedup.minhashSig(col("text"), 4, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 3)
    assert(out(2L).getInt(1) == 0 && !out(2L).isNullAt(2))
    assert(out(3L).isNullAt(1) || out(3L).isNullAt(2) || true) // no throw is the contract
    assert(Dedup.lshNearDupPairs(df, "doc_id", "text", 0.5).count() == 0)
  }

  test("blocked jaccard: identical docs in same block score 1.0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d e", "s1"), (2L, "a b c d e", "s1"),
      (3L, "a b c d e", "s2")).toDF("doc_id", "text", "source")
    val out = Dedup.blockedJaccardPairs(df, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 2L, 1.0)))
  }

  test("exact BPE count: merge order, every-occurrence merge, edge cases") {
    val s = spark
    import s.implicits._
    import graft.text.TextOps
    graft.functions.GraftFunctions.register(s)
    val vocab = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val got = Seq(("low lower"), ("aaaa"), (""), ("   ")).toDF("t")
      .select(TextOps.bpeTokenCountExact(col("t"), vocab).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // 'aaaa': no (a,a) in vocab → 4 chars; whitespace run '   ' is one
    // pre-token of 3 unmergeable symbols; '' has no pre-tokens
    assert(got == Seq(4, 4, 0, 3))
    // (a,a) merge on 'aaaa' is non-overlapping left-to-right: [aa, aa]
    val got2 = Seq("aaaa", "aaaaa").toDF("t")
      .select(TextOps.bpeTokenCountExact(col("t"), Seq(("a", "a"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got2 == Seq(2, 3))
    // empty vocabulary degenerates to codepoint count per pre-token;
    // runs on real docs without error and never exceeds char count
    val docs = graft.queries.Tables.documents(s, sf())
    val bad = docs.select(
        TextOps.bpeTokenCountExact(col("text"), Nil).as("n"),
        length(col("text")).as("len"))
      .filter(col("n") > col("len") || col("n") <= 0).count()
    assert(bad == 0)
  }

  test("embeddingNearDupPairs thresholds cosine within block") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f, 0.0f), 1)) // same dir as 1 but other block
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", "label", 0.95)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("dupNgramFrac: hand-computed repetition fractions and short-doc edges") {
    // "a a a b": words 4 distinct 2 -> 0.5; bigrams [a a, a a, a b] 3
    // distinct 2 -> 1/3; trigrams [a a a, a a b] 2 distinct 2 -> 0.0.
    // A 2-token doc has no trigram (0.0 by definition); empty doc all 0.
    val d = docs(Seq((1L, "a a a b"), (2L, "x y"), (3L, "")))
      .select(col("doc_id"),
        TextOps.dupNgramFrac(col("text"), 1).as("w"),
        TextOps.dupNgramFrac(col("text"), 2).as("b"),
        TextOps.dupNgramFrac(col("text"), 3).as("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toList.sortBy(_._1)
    assert(d == List(
      (1L, 0.5, 1.0 - 2.0 / 3.0, 0.0),
      (2L, 0.0, 0.0, 0.0),
      (3L, 0.0, 0.0, 0.0)))
  }

  test("ngramArray windows overlap in order and respect token boundaries") {
    val g = docs(Seq((1L, "one two three four")))
      .select(TextOps.ngramArray(TextOps.tokens(col("text")), 3).as("g"))
      .head().getSeq[String](0)
    assert(g == Seq("one two three", "two three four"))
  }

  test("dupNgramFracStruct agrees with the string-exact dupNgramFrac") {
    val d = docs(Seq(
      (1L, "a a a b"), (2L, "x y"), (3L, ""),
      (4L, "the cat sat on the cat sat again"),
      (5L, "one two three one two three one two")))
    val rows = d.select(col("doc_id"),
        TextOps.dupNgramFracStruct(col("text"), Seq(1, 2, 3)).as("__f"),
        TextOps.dupNgramFrac(col("text"), 1).as("s1"),
        TextOps.dupNgramFrac(col("text"), 2).as("s2"),
        TextOps.dupNgramFrac(col("text"), 3).as("s3"))
      .select(col("doc_id"), col("__f.n1"), col("__f.n2"), col("__f.n3"),
        col("s1"), col("s2"), col("s3"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(4), s"n=1 mismatch: $r")
      assert(r.getDouble(2) == r.getDouble(5), s"n=2 mismatch: $r")
      assert(r.getDouble(3) == r.getDouble(6), s"n=3 mismatch: $r")
    }
  }

  test("decontaminationTags counts distinct shared shingles vs the test set") {
    // test doc: shingles {a b c, b c d}. train 10 shares both (plus its
    // own d e -> "c d e" unshared), train 11 shares none, train 12 is
    // shorter than k (no shingles at all -> 0, not null).
    val train = docs(Seq(
      (10L, "a b c d e"), (11L, "x y z w"), (12L, "a b")))
    val test = docs(Seq((1L, "a b c d")))
    val out = Dedup.decontaminationTags(train, test, "doc_id", "text",
        shingleK = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toList.sortBy(_._1)
    assert(out == List((10L, 2L, true), (11L, 0L, false), (12L, 0L, false)))
    // broadcast off: identical result through the shuffle-join path
    val out2 = Dedup.decontaminationTags(train, test, "doc_id", "text",
        shingleK = 3, minOverlap = 2, broadcastTest = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toList.sortBy(_._1)
    assert(out2 == out)
  }

  test("bloomDecontaminationTags is bit-identical to the exact operator") {
    val train = docs(Seq(
      (10L, "a b c d e"), (11L, "x y z w"), (12L, "a b"),
      (13L, "a b c q r s t"), (14L, "p q r s t u v")))
    val test = docs(Seq((1L, "a b c d"), (2L, "q r s t u")))
    val exact = Dedup.decontaminationTags(train, test, "doc_id", "text",
        shingleK = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    // 64 bits for ~6 grams: the false-positive rate is large by design,
    // so this passes ONLY if the exact-confirm join removes every FP
    for (bits <- Seq(64L, 1L << 20)) {
      val bloom = Dedup.bloomDecontaminationTags(train, test, "doc_id",
          "text", shingleK = 3, minOverlap = 2, numBits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(bloom == exact, s"numBits=$bits diverged")
    }
    // the OR-merged sketch is partition-order independent
    val repart = Dedup.bloomDecontaminationTags(train.repartition(5),
        test.repartition(3), "doc_id", "text",
        shingleK = 3, minOverlap = 2, numBits = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(repart == exact)
  }

  test("incrementalNearDupTags existing-side hot-bucket cap bounds fanout") {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    // 6 identical corpus docs = one degenerate bucket per band
    val existing = docs((1L to 6L).map(i => i -> boiler))
    val incoming = docs(Seq(10L -> boiler))
    val uncapped = Dedup.incrementalNearDupTags(existing, incoming,
        "doc_id", "text", 0.5, 16, 3, 4)
      .collect().map(r => (r.getBoolean(1), r.get(2))).head
    assert(uncapped == ((true, 1L))) // min-id match through the hot bucket
    // cap below the bucket size: the degenerate EXISTING bucket drops
    // (the documented lshCandidates cap semantics), the batch doc is
    // simply not tagged — bounded fanout, no failure
    val capped = Dedup.incrementalNearDupTags(existing, incoming,
        "doc_id", "text", 0.5, 16, 3, 4, maxBucket = Some(3))
      .collect().map(r => r.getBoolean(1)).head
    assert(!capped)
  }

  test("streamingNearDupTags rejects a batch DataFrame as the stream side") {
    val d = docs(Seq(1L -> "a b c"))
    val e = intercept[IllegalArgumentException] {
      Dedup.streamingNearDupTags(d, d, "doc_id", "text", 0.5)
    }
    assert(e.getMessage.contains("streaming"))
  }

  test("incrementalNearDupTags tags batch-vs-corpus only, min-id on ties") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val existing = docs(Seq(
      2L -> shared,                  // identical twins in the corpus:
      1L -> shared,                  // the match must tie-break to id 1
      3L -> "completely different corpus material sits right here"))
    val incoming = docs(Seq(
      10L -> shared,                                  // dup of 1 AND 2
      11L -> "zebra yak xerus wolf vole urial tapir", // unique
      12L -> "zebra yak xerus wolf vole urial tapir")) // intra-batch twin
    val out = Dedup.incrementalNearDupTags(existing, incoming,
        "doc_id", "text", 0.5, 16, 3, 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    // 11/12 are twins of each other but of nothing in the corpus —
    // incremental tagging must NOT tag intra-batch duplicates
    assert(out == Set((10L, true, Some(1L)),
      (11L, false, None), (12L, false, None)))
    val j = Dedup.incrementalNearDupTags(existing, incoming,
        "doc_id", "text", 0.5, 16, 3, 4)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 10L)
      .collect().head.getDouble(3)
    assert(j == 1.0) // identical text: exact shingle Jaccard is exactly 1
  }

  test("gopherRules: integer thresholds, per-rule flags, conjunction") {
    val s = spark; import s.implicits._
    import graft.text.TextOps
    val docs = Seq(
      // 40 tokens, mean length 4.8 (12+180=192 in [160,200]), 4 "the" -> keep
      (1L, (Seq.fill(4)("the") ++ Seq.fill(36)("words")).mkString(" ")),
      // too short
      (2L, "tiny doc here"),
      // mean word length too high (no stopwords either)
      (3L, Seq.fill(40)("verylongword").mkString(" ")),
      // no stopwords
      (4L, Seq.fill(40)("word").mkString(" "))
    ).toDF("id", "text")
    val out = docs.select(col("id"), TextOps.gopherRules(col("text")).as("g"))
      .select(col("id"), col("g.r_word_count"), col("g.r_mean_word_len"),
        col("g.r_stopword"), col("g.keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ((1, 1, 1, 1)))
    assert(out(2L)._1 == 0 && out(2L)._4 == 0)
    assert(out(3L)._2 == 0 && out(3L)._4 == 0)
    assert(out(4L) == ((1, 1, 0, 0)))
  }

  test("winnowedFingerprints: selection identity, small docs, shared-span guarantee") {
    // hand-verifiable via the reference fold: grams of doc 1 (k=2 over
    // 5 tokens → 4 grams), window w=2 → mins of each adjacent pair,
    // distinct
    def gram(ts: Seq[String]): Seq[Long] = ts.sliding(2).map { p =>
      (refHash(p(0)) * TextOps.B + refHash(p(1))) % TextOps.P
    }.toSeq
    val t1 = Seq("a", "b", "c", "d", "e")
    val exp1 = gram(t1).sliding(2).map(_.min).toSeq.distinct.sorted
    val out = Dedup.winnowedFingerprints(
        docs(Seq(1L -> t1.mkString(" "))), "doc_id", "text", k = 2, w = 2)
      .collect().map(_.getLong(1)).toSeq.sorted
    assert(out == exp1)
    // 0 < |grams| < w → the single overall min; < k tokens → nothing
    val small = Dedup.winnowedFingerprints(
      docs(Seq(2L -> "a b", 3L -> "a")), "doc_id", "text", k = 2, w = 4)
    val sm = small.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sm.toSeq == Seq((2L, gram(Seq("a", "b")).min)))
    // the winnowing guarantee: any shared token span of length >= w+k-1
    // yields at least one identical fingerprint in both documents
    val shared = "p q r s t u"  // 6 tokens >= w+k-1 = 5
    val d = docs(Seq(
      10L -> s"x y $shared z",
      11L -> s"m $shared n o"))
    val fps = Dedup.winnowedFingerprints(d, "doc_id", "text", k = 2, w = 4)
      .collect().groupBy(_.getLong(0)).map { case (k2, v) =>
        k2 -> v.map(_.getLong(1)).toSet }
    assert(fps(10L).intersect(fps(11L)).nonEmpty)
  }

  test("minhashFidelity: identical docs estimate exactly, error rational holds") {
    val d = docs(Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g h",          // identical: est = exact = 1
      3L -> "a b c d e f q r",          // shares a 6-token prefix
      4L -> "zz yy xx ww vv uu tt ss")) // disjoint
    val out = Dedup.minhashFidelity(d, "doc_id", "text",
        numHashes = 16, shingleK = 3, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val p = out((1L, 2L))
    assert(p.getLong(2) == 16L && p.getDouble(5) == 1.0 &&
      p.getDouble(6) == 1.0 && p.getLong(7) == 0L)
    // the error rational restates |m·u − H·i| / (H·u) on every pair
    out.values.foreach { r =>
      if (!r.isNullAt(7)) {
        val (m, i, u) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(r.getLong(7) == math.abs(m * u - 16L * i) &&
          r.getLong(8) == 16L * u)
        assert(r.getDouble(5) == m.toDouble / 16.0)
      }
    }
    // the disjoint doc never surfaces paired with the near-dups
    assert(!out.keySet.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("winnowNearDupPairs/winnowClusters: confirm + resolve end-to-end") {
    val d = docs(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",   // identical to 1
      3L -> "a b c d e f g h zz yy", // shares an 8-token prefix: j = 0.6
      4L -> "q w e r t y u i o p"))  // disjoint
    val pairs = graft.dedup.Dedup.winnowNearDupPairs(d, "doc_id", "text",
        k = 3, w = 4, threshold = 0.5, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // identical docs confirm at exactly 1.0; the disjoint doc never
    // pairs; every surfaced pair is >= the threshold (confirmed, not
    // just candidate)
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 0.6)
    assert(!pairs.keySet.exists(k => k._1 == 4L || k._2 == 4L))
    assert(pairs.values.forall(_ >= 0.5))
    val clusters = graft.dedup.Clusters.winnowClusters(d, "doc_id",
        "text", k = 3, w = 4, threshold = 0.5, minShared = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // 1-2-3 resolve to min-id cluster 1; 4 is its own keeper
    assert(clusters(1L) == ((1L, false)) && clusters(2L) == ((1L, true))
      && clusters(3L) == ((1L, true)) && clusters(4L) == ((4L, false)))
    // the eval operator grades the tier against itself-as-truth as
    // perfect — wiring check for the q239 composition
    val ev = graft.dedup.Dedup.pairSetEval(
      graft.dedup.Dedup.winnowNearDupPairs(d, "doc_id", "text", 3, 4,
        0.5, minShared = 1).select("id_1", "id_2"),
      graft.dedup.SetSimJoin.prefixJaccardJoin(d, "doc_id", "text",
        tauNum = 1, tauDen = 2, shingleK = 3).select("id_1", "id_2"))
      .head()
    assert(ev.getDouble(3) == 1.0 && ev.getDouble(4) == 1.0)
  }

  test("minhashFidelity: shingle-less docs never pair (r13 advice)") {
    // empty-shingle docs used to get the sentinel signature, collide
    // in every band, and emit O(N²) pairs with a misleading est = 1.0
    val d = docs(Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g h",
      10L -> "x", 11L -> "y", 12L -> "z")) // < shingleK tokens: no shingles
    val out = Dedup.minhashFidelity(d, "doc_id", "text",
        numHashes = 16, shingleK = 3, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("pairSetEval: normalization, dedup, hits, empty sides") {
    val s = spark
    import s.implicits._
    // (2,1) normalizes onto (1,2): the candidate set is 2 pairs, 1 hit
    val cand = Seq((1L, 2L), (3L, 4L), (2L, 1L)).toDF("id_1", "id_2")
    val truth = Seq((1L, 2L), (5L, 6L)).toDF("id_1", "id_2")
    val r = Dedup.pairSetEval(cand, truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1L)))
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5)
    // empty candidate side: precision null, recall 0 — one row always
    val e = Dedup.pairSetEval(cand.filter($"id_1" < 0), truth).head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 2L &&
      e.isNullAt(3) && e.getDouble(4) == 0.0)
    val both = Dedup.pairSetEval(cand.filter($"id_1" < 0),
      truth.filter($"id_1" < 0)).head()
    assert(both.getLong(2) == 0L && both.isNullAt(3) && both.isNullAt(4))
  }

  test("winnowCandidates: shared-span pair surfaces, hot fingerprints capped") {
    val shared = "p q r s t u v w"
    val d = docs(Seq(
      1L -> s"aa bb $shared cc",
      2L -> s"dd $shared ee ff",
      3L -> "gg hh ii jj kk ll mm nn oo"))
    val pairsOut = Dedup.winnowCandidates(d, "doc_id", "text", k = 2,
        w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOut.contains((1L, 2L)))
    assert(!pairsOut.exists(p => p._1 == 3L || p._2 == 3L))
    // hot-fingerprint cap: three identical docs with maxBucket 2 → every
    // fingerprint's posting list is 3 > cap → no candidates at all
    val hot = docs(Seq(1L -> shared, 2L -> shared, 3L -> shared))
    val capped = Dedup.winnowCandidates(hot, "doc_id", "text", k = 2,
      w = 4, minShared = 1, maxBucket = 2)
    assert(capped.count() == 0L)
    // same corpus, cap lifted → all three pairs
    val full = Dedup.winnowCandidates(hot, "doc_id", "text", k = 2,
      w = 4, minShared = 1, maxBucket = 10)
    assert(full.count() == 3L)
  }
}
