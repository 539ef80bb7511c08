package graft

import graft.text.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compiled text kernels (TokensOf, ShingleHashes, TextMetrics,
  * SimhashHash, DupNgramFracs, FingerprintHash, MinhashFromHashes)
  * replaced higher-order-function Column forms whose semantics the
  * DuckDB oracles mirror. The driver fixture is pure ASCII, so the
  * kernels' inline UTF-8 decoding and codepoint counting would
  * otherwise ship untested on multibyte input — this spec pins
  * kernel == HOF equality on unicode (2/3/4-byte sequences,
  * supplementary plane), mixed ASCII whitespace, and empty/edge
  * strings. */
class TextKernelSpec extends SparkSpecBase {

  private val docs = Seq(
    "héllo wörld héllo",                       // 2-byte sequences
    "漢字 テスト 漢字 の",                        // 3-byte sequences
    "mixed ascii héllo 漢字 𝔘nicode", // 4-byte supplementary
    "tabs\tand\nnewlines seps\r here",   // every Java \s class
    "  leading and trailing  ",
    "UPPER Case MiXeD",
    "single",
    " ",
    "")

  private def df = {
    val s = spark
    import s.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
  }

  // ---- the original HOF forms, rebuilt inline as the reference -------

  private def hofTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private def hofTokenHashes(text: Column): Column =
    transform(hofTokens(text), TextOps.portableHash(_))

  private def hofShingleHashes(text: Column, k: Int): Column =
    TextOps.bindOnce(hofTokenHashes(text)) { hs =>
      when(size(hs) < k, array().cast("array<bigint>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(hs) - (k - 1)),
          j => (0 until k).map(r => element_at(hs, j + r))
            .reduceLeft((h, x) => (h * TextOps.B + x) % TextOps.P))))
    }

  test("tokens_of equals the split+filter HOF on unicode input") {
    val out = df.select(
      TextOps.tokens(col("text")).as("a"), hofTokens(col("text")).as("b"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("shingle_hashes equals the HOF pipeline on unicode input") {
    for (k <- Seq(1, 2, 3)) {
      val out = df.select(TextOps.shingleHashes(col("text"), k).as("a"),
        hofShingleHashes(col("text"), k).as("b")).collect()
      out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k"))
    }
  }

  test("text_metrics fields equal the regex/HOF formulas on unicode input") {
    val toks = hofTokens(col("text"))
    val all = TextOps.langStopwords.flatMap(_._2)
    val out = df.select(
      TextOps.metrics(col("text")).as("m"),
      length(col("text")).as("len"),
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).as("alpha"),
      length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("punct"),
      size(toks).as("ntok"),
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
        (a, x) => a + x).as("sumlen"),
      TextOps.stopwordHits(toks, all).as("nstop"))
      .collect()
    out.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getAs[Int]("n_chars") == r.getInt(1))
      assert(m.getAs[Int]("n_alpha") == r.getInt(2))
      assert(m.getAs[Int]("n_punct") == r.getInt(3))
      assert(m.getAs[Int]("n_tok") == r.getInt(4))
      assert(m.getAs[Long]("sum_tok_len") == r.getLong(5))
      assert(m.getAs[Int]("n_stop") == r.getInt(6))
    }
  }

  test("simhash/fingerprint/minhash kernels equal HOF forms on unicode") {
    val numBits = 24
    val hofSimhash = TextOps.bindOnce(hofTokenHashes(col("text"))) { hs =>
      (0 until numBits).map { j =>
        when(size(filter(hs, h => shiftright(h, j) % 2 === 1)) * 2 > size(hs),
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val hofFp = aggregate(hofTokenHashes(col("text")), lit(0L),
      (f, h) => (f * TextOps.B + h) % TextOps.P)
    val hofSig = TextOps.bindOnce(hofShingleHashes(col("text"), 2)) { sh =>
      array(graft.functions.TextHashImpl.hashCoeffs(8).map { case (a, b) =>
        coalesce(array_min(transform(sh, h => (lit(a) * h + lit(b)) % TextOps.P)),
          lit(TextOps.P))
      }: _*)
    }
    val out = df.select(
      graft.dedup.Dedup.simhash(col("text"), numBits).as("s1"),
      hofSimhash.as("s2"),
      TextOps.fingerprint(col("text")).as("f1"), hofFp.as("f2"),
      graft.dedup.Dedup.minhashSigFromHashes(
        TextOps.shingleHashes(col("text"), 2), 8).as("m1"),
      hofSig.as("m2"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getSeq[Long](4) == r.getSeq[Long](5))
    }
  }

  test("dup_ngram_fracs equals the HOF fractions on unicode input") {
    def hofFrac(n: Int) =
      TextOps.bindOnce(TextOps.ngramHashes(hofTokenHashes(col("text")), n)) { g =>
        when(size(g) === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(g)).cast("double") /
            size(g).cast("double"))
      }
    val out = df.select(
      TextOps.dupNgramFracStruct(col("text"), Seq(1, 2, 3)).as("a"),
      hofFrac(1).as("f1"), hofFrac(2).as("f2"), hofFrac(3).as("f3"))
      .collect()
    out.foreach { r =>
      val a = r.getStruct(0)
      assert(a.getDouble(0) == r.getDouble(1))
      assert(a.getDouble(1) == r.getDouble(2))
      assert(a.getDouble(2) == r.getDouble(3))
    }
  }

  test("nfc_normalize composes decomposed sequences and is idempotent") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "caf\u0065\u0301"),        // e + combining acute -> \u00e9
      (2L, "caf\u00e9"),               // already composed
      (3L, "plain ascii"),              // NFC-invariant fast path
      (4L, "\u0041\u030a"),           // A + combining ring -> \u00c5
      (5L, "\u1e69"),                  // s + dot-below + dot-above, composed
      (6L, ""),                         // empty
      (7L, null.asInstanceOf[String]))  // null flows through
      .toDF("id", "text")
    val out = rows.select(col("id"),
        TextOps.nfcNormalize(col("text")).as("n"),
        TextOps.nfcNormalize(TextOps.nfcNormalize(col("text"))).as("nn"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out(1L)._1 == "caf\u00e9")
    assert(out(2L)._1 == "caf\u00e9")
    assert(out(3L)._1 == "plain ascii")
    assert(out(4L)._1 == "\u00c5")
    assert(out(5L)._1 == "\u1e69")
    assert(out(6L)._1 == "")
    assert(out(7L)._1 == null)
    // idempotence: NFC(NFC(x)) == NFC(x) for every row
    out.values.foreach { case (n, nn) => assert(n == nn) }
    // the normalized spellings now collide under the dedup hash
    val h = rows.filter(col("id").isin(1L, 2L))
      .select(TextOps.portableHash(TextOps.nfcNormalize(col("text"))))
      .collect().map(_.getLong(0)).toSet
    assert(h.size == 1)
  }

  test("normalize_doc_text equals the two-regex reference composition") {
    // the unicode/whitespace/edge fixtures above, plus the digit and
    // punctuation-run shapes the dedup normalization exists for
    val s = spark
    import s.implicits._
    val extra = (docs ++ Seq(
      "Hello, World!! 42 -- foo_bar",
      "a..b..c  1;2;3",
      "...!!!???",                 // all separators → empty
      "é漢𝔘",                     // only multibyte → empty
      "x", "X ", " 9 "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = extra.select(
        TextOps.normalizeText(col("text")).as("a"),
        TextOps.normalizeTextRef(col("text")).as("b"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel '${r.getString(0)}' != regex '${r.getString(1)}'"))
    // and on the real corpus: byte-identical across every document
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(TextOps.normalizeText(col("text")).as("a"),
        TextOps.normalizeTextRef(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(corpus == 0L)
  }

  test("winnow_fingerprints kernel equals the HOF slice/min composition") {
    import graft.dedup.Dedup
    // unicode/whitespace/edge fixtures + the real corpus, across k/w
    // shapes incl. m<w (single-min) and m==0 (empty)
    for ((k, w) <- Seq((2, 2), (3, 4), (1, 3))) {
      val a = Dedup.winnowedFingerprints(df, "id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = Dedup.winnowedFingerprintsRef(df, "id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(a == b, s"kernel != HOF at k=$k w=$w")
    }
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .limit(200).select(col("doc_id").as("id"), col("text"))
    val a = graft.dedup.Dedup.winnowedFingerprints(corpus, "id", "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = graft.dedup.Dedup.winnowedFingerprintsRef(corpus, "id", "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
