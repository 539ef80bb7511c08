package graft.dedup

import graft.text.TextOps
import graft.text.TextOps.{B, P}
import graft.vector.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §7.2
  * step 9 parity-plus): exact (hash-groupBy), MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant shuffles *keys/signatures*, never
  * document text —
  *  - exact dedup shuffles a 128-bit md5 key;
  *  - MinHash shuffles `numHashes` longs per doc, and the LSH band join
  *    shuffles (band, bucket, id) triples, so candidate generation is a
  *    hash join on small rows; only confirmed candidates re-read shingles;
  *  - SimHash shuffles one long per doc.
  * All signature math is codegen'd higher-order expressions over the
  * portable hash ([[TextOps.portableHash]]) so the DuckDB oracle verifies
  * signatures bit-for-bit.
  */
object Dedup {

  // ---- exact dedup (hash-groupBy) -------------------------------------

  /** Tag every row with its content key and canonical (minimum) id among
    * rows sharing the key. `is_dup` marks rows a dedup pass would drop.
    * Keeping it as a tagging operator (rather than a filter) makes it
    * verifiable and composable; `.filter(!col("is_dup"))` dedups.
    *
    * The md5 projection runs BEFORE the window's shuffle and everything
    * else is dropped, so only (id, 128-bit key) ever crosses the wire —
    * at corpus scale the documents themselves stay put (round-9: the
    * previous form let `textCol` ride through the content_key exchange). */
  def exactDedupTags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_key"))
    df.select(col(idCol), TextOps.md5Hex(col(textCol)).as("content_key"))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
  }

  // ---- MinHash --------------------------------------------------------

  /** Universal-hash coefficients (aᵢ, bᵢ) — fixed constants so Spark and
    * the SQL oracle agree (single source: the compiled kernel). */
  def hashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    graft.functions.TextHashImpl.hashCoeffs(numHashes)

  /** MinHash signature from a shingle-hash array column. Compiled
    * (`graft.functions.MinhashFromHashes`): one pass over the shingle
    * array instead of numHashes interpreted min-fold transforms. */
  def minhashSigFromHashes(sh: Column, numHashes: Int): Column =
    call_function("minhash_from_hashes", sh, lit(numHashes))

  /** MinHash signature column: sigᵢ = min over shingle hashes of
    * (aᵢ·H+bᵢ) mod P. Docs with no shingles (shorter than k tokens) get
    * sentinel P. The shingle-hash array is bound once per row
    * ([[TextOps.bindOnce]]) so tokenize+hash run once, not numHashes
    * times. */
  def minhashSig(text: Column, numHashes: Int, shingleK: Int): Column =
    TextOps.bindOnce(TextOps.shingleHashes(text, shingleK))(
      sh => minhashSigFromHashes(sh, numHashes))

  /** LSH band bucket hashes: fold of each `rowsPerBand`-slice of the
    * signature, (h·31 + sig) mod P. Returns array of numBands longs. */
  def lshBandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      (0 until rowsPerBand).foldLeft(lit(0L): Column) { (h, r) =>
        (h * B + element_at(sig, b * rowsPerBand + r + 1)) % P
      }
    }: _*)

  /** Candidate near-dup pairs via MinHash-LSH: shingle → minhash → band →
    * bucket-join. Returns distinct (id_1, id_2) with id_1 < id_2 that
    * collide in ≥1 band. The join shuffles only (band, bucket, id). */
  /** (id, sh) shingle-hash relation — the shared first stage. Kept as a
    * separate projection so downstream multi-reference stages don't
    * re-tokenize (CollapseProject declines to inline a non-cheap alias
    * referenced more than once). */
  private def shingleRel(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    df.select(col(idCol),
      TextOps.shingleHashes(col(textCol), shingleK).as("sh"))

  private def bandedRel(sh: DataFrame, idCol: String,
      numHashes: Int, numBands: Int): DataFrame = {
    require(numHashes % numBands == 0,
      s"numHashes ($numHashes) must be divisible by numBands ($numBands); " +
        "otherwise trailing signature hashes would be silently ignored")
    val rowsPerBand = numHashes / numBands
    val sigs = sh.select(col(idCol),
      minhashSigFromHashes(col("sh"), numHashes).as("sig"))
    sigs.select(col(idCol),
      posexplode(lshBandHashes(col("sig"), numBands, rowsPerBand))
        .as(Seq("band", "bucket")))
  }

  def lshCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleK: Int = 3, numBands: Int = 4,
      maxBucket: Option[Int] = None): DataFrame =
    lshCandidatesFrom(shingleRel(df, idCol, textCol, shingleK), idCol,
      numHashes, numBands, maxBucket)

  /** Optional hot-bucket cap, shared by every banding path (minhash
    * buckets, hamming bit-keys, the incremental probe side): a (band,
    * key) group of M rows emits M² candidate pairs, so bound
    * boilerplate-identical populations the way sparseJaccardPairs caps
    * stop-shingles. */
  private def capHotBuckets(banded: DataFrame, keyCol: String,
      maxBucket: Option[Int]): DataFrame =
    maxBucket.fold(banded) { cap =>
      val w = Window.partitionBy(col("band"), col(keyCol))
      banded.withColumn("__bn", count(lit(1)).over(w))
        .filter(col("__bn") <= cap).drop("__bn")
    }

  /** [[lshCandidates]] over a pre-computed (id, sh) shingle relation —
    * lets [[lshNearDupPairs]] share one materialized shingle pass between
    * candidate generation and Jaccard confirmation. */
  private def lshCandidatesFrom(
      sh: DataFrame, idCol: String,
      numHashes: Int, numBands: Int,
      maxBucket: Option[Int]): DataFrame = {
    val banded = capHotBuckets(
      bandedRel(sh, idCol, numHashes, numBands), "bucket", maxBucket)
    // true self-join (same plan subtree on both sides) with a shuffle
    // join forced: both sides exchange on (band, bucket) with identical
    // children, so ReuseExchange computes the signature pipeline ONCE
    // (a broadcast plan would rebuild it for the build side).
    banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        col(s"a.band") === col(s"b.band") &&
        col(s"a.bucket") === col(s"b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"))
      .distinct()
  }

  /** Exact shingle-set Jaccard similarity between two distinct-element
    * arrays: |A∩B| / (|A|+|B|-|A∩B|) — one intersect (bound once), no
    * union materialization. */
  def jaccard(sa: Column, sb: Column): Column =
    TextOps.bindOnce(size(array_intersect(sa, sb)).cast("double")) { i =>
      val u = size(sa).cast("double") + size(sb).cast("double") - i
      when(u === 0.0, lit(0.0)).otherwise(i / u)
    }

  /** MinHash-LSH near-dup pairs, Jaccard-confirmed: candidates from
    * [[lshCandidates]], then exact n-gram Jaccard ≥ `threshold` computed by
    * joining the (small) candidate set back to shingles. */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 16, shingleK: Int = 3, numBands: Int = 4,
      maxBucket: Option[Int] = None): DataFrame = {
    // Caching the shingle ARRAYS is a net loss (columnar-cache decode of
    // array<long> costs more than recompute), so the confirm joins below
    // recompute shingles and rely on runtime exchange reuse: the bucket
    // self-join inside lshCandidatesFrom shuffles the identical banded
    // subtree on (band, bucket), so ReuseExchange runs the signature
    // pipeline once. (An explicit persist of the banded relation was
    // tried and measured ~2× slower end-to-end at sf0.1 — the cache
    // write/read cost exceeds what exchange reuse already saves — and it
    // pinned storage for the SparkContext lifetime.)
    val sh = shingleRel(df, idCol, textCol, shingleK)
    val cands = lshCandidatesFrom(sh, idCol, numHashes, numBands, maxBucket)
    confirmJaccardPairs(cands, sh, idCol, threshold)
  }

  /** The exact-Jaccard CONFIRM stage shared by every candidate
    * generator ([[lshNearDupPairs]], [[winnowNearDupPairs]]): join the
    * (small, pruned) candidate pair set back to the shingle relation
    * and keep pairs at Jaccard ≥ `threshold`. Confirm joins are
    * SHUFFLE-hash on the id (round-9): Catalyst's size estimate used
    * to pick broadcast with the shingle relation as build side — a
    * corpus-derived relation that is only broadcastable by accident at
    * toy scale (at sf1 its repeated broadcast builds dominated the
    * soak; at 100 TB it would OOM outright). The candidate set is the
    * small side and streams into the hash join. */
  private def confirmJaccardPairs(cands: DataFrame, sh: DataFrame,
      idCol: String, threshold: Double): DataFrame =
    cands
      .join(sh.select(col(idCol).as("id_1"), col("sh").as("sh_1"))
        .hint("shuffle_hash"), "id_1")
      .join(sh.select(col(idCol).as("id_2"), col("sh").as("sh_2"))
        .hint("shuffle_hash"), "id_2")
      .withColumn("jaccard", jaccard(col("sh_1"), col("sh_2")))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")

  /** Incremental near-dup tagging: tag each `incoming` document that is
    * a Jaccard-confirmed near-duplicate of ANY `existing`-corpus
    * document — the production shape of corpus maintenance at scale: a
    * new batch is tagged against the standing corpus WITHOUT re-running
    * dedup over the world (the batch-vs-corpus band join replaces the
    * corpus self-join; cost is proportional to the batch, not the
    * corpus². A real deployment keeps the existing side's banded
    * signature relation materialized between batches — here it derives
    * from text so the operator is self-contained; the shape on the wire
    * is identical).
    *
    * Scale shape: both sides reduce to (id, band, bucket) triples; the
    * asymmetric band join shuffles on (band, bucket); confirmation joins
    * the candidate pairs (small, LSH-pruned) back to shingles with
    * shuffle-hash joins on id exactly like [[lshNearDupPairs]]. Best
    * match per incoming doc is tie-proof: max Jaccard, then min existing
    * id (two-step join-back, no order-dependent arg-max).
    *
    * Returns one row per incoming doc: (idCol, is_dup, match_id,
    * match_jaccard); non-dups carry nulls. */
  def incrementalNearDupTags(
      existing: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      numHashes: Int = 16, shingleK: Int = 3, numBands: Int = 4,
      maxBucket: Option[Int] = None): DataFrame = {
    val shE = shingleRel(existing, idCol, textCol, shingleK)
    val shI = shingleRel(incoming, idCol, textCol, shingleK)
    // hot-bucket cap on the EXISTING side only: a boilerplate bucket of
    // M corpus docs fans every colliding batch doc out M ways; the
    // incoming batch is the bounded side and stays uncapped
    val bandedE = capHotBuckets(
      bandedRel(shE, idCol, numHashes, numBands), "bucket", maxBucket)
    val bandedI = bandedRel(shI, idCol, numHashes, numBands)
    val cands = bandedI.as("i").hint("shuffle_hash").join(bandedE.as("e"),
        col("i.band") === col("e.band") && col("i.bucket") === col("e.bucket"))
      .select(col(s"i.$idCol").as("in_id"), col(s"e.$idCol").as("ex_id"))
      .distinct()
    val confirmed = cands
      .join(shI.select(col(idCol).as("in_id"), col("sh").as("sh_i"))
        .hint("shuffle_hash"), "in_id")
      .join(shE.select(col(idCol).as("ex_id"), col("sh").as("sh_e"))
        .hint("shuffle_hash"), "ex_id")
      .withColumn("jaccard", jaccard(col("sh_i"), col("sh_e")))
      .filter(col("jaccard") >= threshold)
      .select("in_id", "ex_id", "jaccard")
    val best = confirmed.groupBy(col("in_id"))
      .agg(max(col("jaccard")).as("match_jaccard"))
    val matched = confirmed.join(best, Seq("in_id"))
      .filter(col("jaccard") === col("match_jaccard"))
      .groupBy(col("in_id"), col("match_jaccard"))
      .agg(min(col("ex_id")).as("match_id"))
    incoming.select(col(idCol))
      .join(matched.withColumnRenamed("in_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        col("match_id").isNotNull.as("is_dup"),
        col("match_id"), col("match_jaccard"))
  }

  /** Streaming near-dup tagging: the Structured Streaming form of
    * [[incrementalNearDupTags]] — documents are tagged against the
    * standing corpus AS THEY ARRIVE, emitting every Jaccard-confirmed
    * (incoming id, corpus id, jaccard) match in append mode. `incoming`
    * must be a streaming DataFrame; `existing` is static.
    *
    * Streaming shape: shingling/minhash/banding are stateless per-row
    * projections; the band probe and the shingle confirm are
    * STREAM-STATIC joins (no stream-stream state); the single stateful
    * operator is the dropDuplicates that collapses multi-band collisions
    * of the same pair. Without an event-time column that dedup state is
    * unbounded — the operator targets the bounded tag-this-batch run
    * (AvailableNow); a forever-run should feed an arrival-time column
    * and dropDuplicatesWithinWatermark. The per-incoming best-match fold
    * is deliberately left to the batch operator: chaining a second
    * stateful aggregate after the dedup is exactly the multi-stateful
    * pattern Structured Streaming restricts, and the confirmed-pair
    * stream already carries everything a downstream batch fold needs. */
  def streamingNearDupTags(
      incoming: DataFrame, existing: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      numHashes: Int = 16, shingleK: Int = 3, numBands: Int = 4): DataFrame = {
    require(incoming.isStreaming, "incoming must be a streaming DataFrame")
    require(numHashes % numBands == 0,
      s"numHashes ($numHashes) must be divisible by numBands ($numBands)")
    val rowsPerBand = numHashes / numBands
    val shE = shingleRel(existing, idCol, textCol, shingleK)
    val bandedE = bandedRel(shE, idCol, numHashes, numBands)
      .select(col(idCol).as("match_id"), col("band"), col("bucket"))
    // the incoming side carries its shingle array through the band
    // explode so the confirm step needs no join back into the stream
    val bandedI = shingleRel(incoming, idCol, textCol, shingleK)
      .select(col(idCol), col("sh"),
        minhashSigFromHashes(col("sh"), numHashes).as("sig"))
      .select(col(idCol), col("sh"),
        posexplode(lshBandHashes(col("sig"), numBands, rowsPerBand))
          .as(Seq("band", "bucket")))
    bandedI.join(bandedE, Seq("band", "bucket"))
      .select(col(idCol), col("match_id"), col("sh"))
      .dropDuplicates(idCol, "match_id")
      .join(shE.select(col(idCol).as("match_id"), col("sh").as("sh_e")),
        Seq("match_id"))
      .withColumn("jaccard", jaccard(col("sh"), col("sh_e")))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol), col("match_id"), col("jaccard"))
  }

  /** MinHash FIDELITY readout — per LSH-candidate pair, the signature's
    * Jaccard estimate against the exact shingle Jaccard, as EXACT
    * rationals: with m matching signature positions out of H hashes and
    * exact (inter, union), the estimation error is
    * |m/H − inter/union| = |m·union − H·inter| / (H·union) — per-pair
    * int64 numerator/denominator plus the two IEEE quotients. Where
    * [[pairSetEval]] (q231) grades the BANDING's recall, this grades
    * the SIGNATURE's accuracy — together they are the evidence for a
    * (numHashes, numBands) choice before running the tier on the world.
    *
    * One row per candidate pair: (id_1, id_2, sig_matches, inter,
    * union, est, exact_jaccard, err_num, err_den). Shingle-less
    * documents are EXCLUDED from the candidate relation before
    * banding (r13 advice): an empty shingle set carries no similarity
    * evidence, yet its sentinel signature would collide every empty
    * doc into every band — N empty docs would emit O(N²) pairs all
    * carrying a misleading est = 1.0 with null exact_jaccard.
    *
    * Scale shape: [[lshCandidates]]' banded join + the same two
    * shuffle-hash confirm joins as [[lshNearDupPairs]] — candidate-
    * sized, never all-pairs. */
  def minhashFidelity(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleK: Int = 3, numBands: Int = 4,
      maxBucket: Option[Int] = None): DataFrame = {
    val rel = df.select(col(idCol),
      TextOps.bindOnce(TextOps.shingleHashes(col(textCol), shingleK)) {
        sh => struct(sh.as("sh"), minhashSigFromHashes(sh, numHashes)
          .as("sig"))
      }.as("__r"))
      .select(col(idCol), col("__r.sh").as("sh"), col("__r.sig").as("sig"))
      // see scaladoc: empty shingle sets never enter the banding
      .filter(size(col("sh")) > 0)
    val cands = lshCandidatesFrom(rel.select(col(idCol), col("sh")),
      idCol, numHashes, numBands, maxBucket)
    val m = size(filter(zip_with(col("sig_1"), col("sig_2"),
      (a, b) => a === b), x => x))
    val inter = size(array_intersect(col("sh_1"), col("sh_2")))
    cands
      .join(rel.select(col(idCol).as("id_1"), col("sh").as("sh_1"),
        col("sig").as("sig_1")).hint("shuffle_hash"), "id_1")
      .join(rel.select(col(idCol).as("id_2"), col("sh").as("sh_2"),
        col("sig").as("sig_2")).hint("shuffle_hash"), "id_2")
      .withColumn("sig_matches", m.cast("long"))
      .withColumn("inter", inter.cast("long"))
      .withColumn("union",
        (size(col("sh_1")) + size(col("sh_2"))).cast("long") - col("inter"))
      .select(col("id_1"), col("id_2"), col("sig_matches"), col("inter"),
        col("union"),
        (col("sig_matches").cast("double") / numHashes.toDouble).as("est"),
        when(col("union") > 0L, col("inter").cast("double") /
          col("union").cast("double")).as("exact_jaccard"),
        when(col("union") > 0L, abs(col("sig_matches") * col("union") -
          lit(numHashes.toLong) * col("inter"))).as("err_num"),
        when(col("union") > 0L, lit(numHashes.toLong) * col("union"))
          .as("err_den"))
  }

  /** PAIR-SET evaluation — grades one candidate-pair generator against a
    * truth pair set (LSH candidates vs the exact PPJoin, winnowing
    * candidates vs exact edit-distance pairs, any approximate tier vs
    * its lossless sibling): pairs are normalized to unordered (min, max)
    * and deduped on both sides, then ONE full-outer key join + one
    * reduce yields (n_cand, n_true, n_hit) with precision/recall as
    * IEEE quotients. This is how a 100 TB pipeline decides its banding
    * parameters: measure recall on a slice against the exact operator,
    * then run the approximate tier on the world.
    *
    * Scale shape: two distincts + one (id, id)-keyed join — pair-sized
    * exchanges, no text, no all-pairs. Empty inputs keep the one-row
    * readout (null ratios, never a divide error). */
  def pairSetEval(cand: DataFrame, truth: DataFrame): DataFrame = {
    Seq(("cand", cand), ("truth", truth)).foreach { case (n, df) =>
      require(df.columns.contains("id_1") && df.columns.contains("id_2"),
        s"pairSetEval: $n side needs (id_1, id_2) columns, " +
          s"got ${df.columns.mkString(", ")}")
    }
    // null or self pairs are contract violations, not data — least/
    // greatest would silently fold (42, NULL) into the degenerate
    // self-pair (42, 42) and deflate precision (r13 review)
    def norm(df: DataFrame, flag: String) = df.select(
        when(col("id_1").isNull || col("id_2").isNull ||
            col("id_1") === col("id_2"),
          raise_error(concat(lit("pairSetEval: null or self pair ("),
            coalesce(col("id_1").cast("string"), lit("null")), lit(", "),
            coalesce(col("id_2").cast("string"), lit("null")), lit(")"))))
          .otherwise(least(col("id_1"), col("id_2"))).as("id_1"),
        greatest(col("id_1"), col("id_2")).as("id_2"))
      .distinct().withColumn(flag, lit(1L))
    norm(cand, "__c").join(norm(truth, "__t"), Seq("id_1", "id_2"),
        "full_outer")
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_cand"),
        coalesce(sum(col("__t")), lit(0L)).as("n_true"),
        coalesce(sum(col("__c") * col("__t")), lit(0L)).as("n_hit"))
      .select(col("n_cand"), col("n_true"), col("n_hit"),
        when(col("n_cand") > 0, col("n_hit").cast("double") /
          col("n_cand").cast("double")).as("cand_precision"),
        when(col("n_true") > 0, col("n_hit").cast("double") /
          col("n_true").cast("double")).as("recall"))
  }

  // ---- Winnowing (MOSS fingerprints) ------------------------------------

  /** WINNOWED document fingerprints — Schleimer/Wilkerson/Aiken's
    * winnowing (SIGMOD 2003, the MOSS algorithm): over the document's
    * positional k-gram hashes, every window of `w` consecutive grams
    * contributes its MINIMUM hash, and the distinct selected values are
    * the fingerprint set. The guarantee the min-selection buys over
    * "every j-th gram": any shared substring of length ≥ w+k−1 tokens
    * between two documents yields at least one IDENTICAL fingerprint in
    * both — local, position-insensitive, and ~|grams|/w selected values
    * per document (w-fold smaller than the full shingle set MinHash
    * reduces, while staying EXACT about shared spans).
    *
    * Tie/robustness note: classic winnowing breaks min-ties by
    * position; this form keeps selected VALUES distinct instead, which
    * is order-deterministic on any engine and preserves the guarantee
    * (the shared window's minimum VALUE is selected in both documents).
    * Documents with 0 < |grams| < w contribute their single overall
    * minimum; gram-less documents contribute nothing.
    *
    * Returns exploded (idCol, fp) rows. Scale shape: a pure codegen'd
    * per-document projection (token hashes → gram hashes → window mins,
    * no string materialization) + one explode — scan-linear, zero
    * exchange; downstream candidate generation is [[winnowCandidates]]. */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(w > 0, s"w must be positive, got $w")
    // compiled kernel (monotonic-deque window mins, O(grams)): the HOF
    // slice-per-window form ([[winnowedFingerprintsRef]]) ran
    // interpreted at ~330 µs/doc — 15 s at sf0.1 — and is kept only as
    // the spec cross-check
    df.select(col(idCol),
      explode(call_function("winnow_fingerprints", col(textCol),
        lit(k), lit(w))).as("fp"))
  }

  /** Pure-built-in HOF form of [[winnowedFingerprints]] — identical
    * output (TextKernelSpec pins kernel == HOF on unicode/edge input);
    * the oracle states this composition in SQL. */
  def winnowedFingerprintsRef(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val fps = TextOps.bindOnce(
      TextOps.ngramHashes(TextOps.tokenHashes(col(textCol)), k)) { g =>
      when(size(g) >= w,
          array_distinct(transform(sequence(lit(1), size(g) - (w - 1)),
            i => array_min(slice(g, i, lit(w))))))
        .when(size(g) > 0, array(array_min(g)))
        .otherwise(array().cast("array<bigint>"))
    }
    df.select(col(idCol), explode(fps).as("fp"))
  }

  /** Candidate near-dup pairs from shared winnowed fingerprints: the
    * banded-join shape of the LSH tier over [[winnowedFingerprints]] —
    * pairs sharing ≥ `minShared` fingerprints, with hot fingerprints
    * (posting list > `maxBucket`, the stop-gram analog: boilerplate
    * shared by everything) dropped BEFORE the self-join so no bucket
    * goes quadratic. Returns (id_1 < id_2, n_shared). Candidates, not
    * verdicts — confirm with exact Jaccard/edit distance like the LSH
    * path. Exchanges carry (fp, id) longs only. */
  def winnowCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    require(minShared > 0, s"minShared must be positive, got $minShared")
    require(maxBucket > 1, s"maxBucket must exceed 1, got $maxBucket")
    val fps = winnowedFingerprints(df, idCol, textCol, k, w)
    val sized = fps.groupBy(col("fp")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBucket)
    val pruned = fps.join(sized.select("fp"), Seq("fp"))
    pruned.alias("a")
      .join(pruned.alias("b"), col(s"a.fp") === col(s"b.fp") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Winnow-CONFIRMED near-dup pairs — the winnowing tier's analog of
    * [[lshNearDupPairs]]: [[winnowCandidates]]' capped shared-
    * fingerprint pairs confirmed by exact shingle Jaccard ≥
    * `threshold`. Output contract (id_1 < id_2, jaccard) matches the
    * LSH path exactly, so the two tiers are drop-in siblings a
    * pipeline grades against each other with [[pairSetEval]] (q239
    * does: winnowing's deterministic shared-span guarantee vs
    * banding's probabilistic recall, on the same exact truth).
    *
    * Scale shape: the capped fingerprint-bucket join (hot posting
    * lists dropped BEFORE the self-join) + the same two shuffle-hash
    * confirm joins on id as the LSH path — candidate-sized exchanges,
    * never all-pairs, no text on the wire. */
  def winnowNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, threshold: Double, minShared: Int = 2,
      maxBucket: Int = 1000, shingleK: Int = 3): DataFrame = {
    val cands = winnowCandidates(df, idCol, textCol, k, w, minShared,
      maxBucket).select("id_1", "id_2")
    val sh = shingleRel(df, idCol, textCol, shingleK)
    confirmJaccardPairs(cands, sh, idCol, threshold)
  }

  // ---- SimHash --------------------------------------------------------

  /** Bits of the SimHash (bits 0..numBits-1 of the portable token hash;
    * P < 2^30 so ≤30 informative bits). Bit j is set iff a strict
    * majority of tokens have bit j set in their hash. Compiled
    * (`graft.functions.SimhashHash`): one pass instead of numBits
    * interpreted filter passes over the token-hash array. */
  def simhash(text: Column, numBits: Int = 24): Column =
    call_function("simhash_hash", text, lit(numBits))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs over any 64-bit hash column (image dHash —
    * [[graft.multimodal.Multimodal.imagePHash]] — audio/video
    * fingerprints, or a 64-bit simhash) by COMBINATION hamming-LSH
    * banding: split the hash into `numBands` contiguous bit bands and
    * bucket-join on every (numBands − maxHamming)-subset of bands,
    * each subset's band values packed into one long key. LOSSLESS
    * candidate generation by pigeonhole — `maxHamming` flipped bits
    * disturb at most `maxHamming` bands, leaving ≥ numBands − maxHamming
    * bands intact, so at least one join subset matches in full
    * (enforced, not probabilistic like MinHash banding). Confirm is
    * `bit_count(xor)` on the hashes riding the banded rows — no
    * join-back.
    *
    * WHY combinations, not single bands (round-10 soak finding): a
    * single-band join keys on 64/numBands bits, so random non-dup
    * hashes collide at a birthday rate of N²/2^(64/B) per band — at 4
    * bands that is N²/2^16, a QUADRATIC candidate term that dominated
    * the 10× soak (q135 ratio 4.8). Subset keys carry
    * (numBands − maxHamming)·(64/B) bits — 32 for hamming ≤ 2 on 4
    * bands — pushing the birthday term to N²/2^32: negligible into the
    * billions of rows. Cost: C(numBands, numBands − maxHamming) rows
    * per hash (6 at B=4, m=2) instead of numBands — linear, and the
    * right trade at any corpus size.
    *
    * Scale shape (100 TB of images): only (subset id, key, id, hash) —
    * four longs — ever shuffles, C(B, B−m) rows per image; the
    * self-join's two sides are the identical exchange so ReuseExchange
    * hashes each image once. `maxBucket` caps degenerate buckets
    * (identical boilerplate images collide on every subset) exactly
    * like [[lshCandidates]] — the production answer to duplicate
    * FAMILIES, whose within-bucket pair count no key width can fix.
    *
    * Hash-width contract: the column must carry FULL-WIDTH 64-bit
    * fingerprints (the modality hashes here do). A narrow hash — e.g.
    * the 24-bit [[simhash]], whose width the DuckDB-portable token hash
    * caps — leaves the high bands identically zero, so every row
    * collides on any subset touching them and the join degenerates;
    * text near-dup's scale path is MinHash-LSH ([[lshNearDupPairs]]),
    * not banded simhash. */
  def hammingNearDupPairs(
      df: DataFrame, idCol: String, hashCol: String, maxHamming: Int,
      numBands: Int = 4, maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 1,
      s"maxHamming ($maxHamming) must be >= 1 — use exact dedup for " +
        "identical hashes")
    require(numBands > maxHamming,
      s"numBands ($numBands) must exceed maxHamming ($maxHamming) — the " +
        "pigeonhole recall guarantee needs one undisturbed band subset")
    require(64 % numBands == 0,
      s"numBands ($numBands) must divide 64 (contiguous equal-width bands)")
    val bandBits = 64 / numBands
    val mask = (1L << bandBits) - 1L
    val joinBands = numBands - maxHamming
    require(joinBands * bandBits <= 63,
      s"subset keys need $joinBands x $bandBits bits — must fit one long")
    val subsets = (0 until numBands).combinations(joinBands).toSeq
    def bandOf(b: Int) =
      shiftrightunsigned(col("__h"), b * bandBits).bitwiseAND(lit(mask))
    val banded0 = df
      .select(col(idCol), col(hashCol).cast("long").as("__h"))
      .where(col("__h").isNotNull)
      .select(col(idCol), col("__h"),
        posexplode(array(subsets.map(s =>
          s.foldLeft(lit(0L): Column)((acc, b) =>
            shiftleft(acc, bandBits).bitwiseOR(bandOf(b)))): _*))
          .as(Seq("band", "bits")))
    val banded = capHotBuckets(banded0, "bits", maxBucket)
    banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bits") === col("b.bits") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"),
        hamming(col("a.__h"), col("b.__h")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- n-gram Jaccard (blocked) ---------------------------------------

  /** All-pairs n-gram Jaccard within a blocking key (e.g. source):
    * (block, id_1, id_2, jaccard). Blocking bounds the quadratic
    * comparison; use [[lshNearDupPairs]] when no natural block exists. */
  def blockedJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleK: Int = 3): DataFrame = {
    val sh = df.select(col(blockCol),
      col(idCol), TextOps.shingleHashes(col(textCol), shingleK).as("sh"))
    val a = sh.select(col(blockCol), col(idCol).as("id_1"), col("sh").as("sh_1"))
    val b = sh.select(col(blockCol), col(idCol).as("id_2"), col("sh").as("sh_2"))
    a.join(b, Seq(blockCol))
      .filter(col("id_1") < col("id_2"))
      .withColumn("jaccard", jaccard(col("sh_1"), col("sh_2")))
      .select(col(blockCol), col("id_1"), col("id_2"), col("jaccard"))
  }

  /** Block-scoped sparse Jaccard: [[sparseJaccardPairs]]' posting-list
    * formulation with the co-count join additionally keyed by a blocking
    * column. Produces exactly the nonzero-Jaccard pairs of
    * [[blockedJaccardPairs]]. Ids need only be unique within a block:
    * sizes are computed per (block, id) and joined on both keys. */
  def sparseBlockedJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleK: Int = 3): DataFrame = {
    // Single-pass formulation, no cache: per-doc set sizes ride along as
    // a window count over the posting list (shingle hashes are distinct
    // per doc, so |sh| = posting count per (block, id); docs with no
    // shingles drop out of posting, but they share no hash with
    // anything, so no pair is lost). The self-join's two sides are then
    // the IDENTICAL windowed subtree partitioned on (block, h) — the
    // partitioning the join itself needs — so ReuseExchange runs the
    // shingle pipeline exactly once and the join adds no exchange.
    val wDoc = Window.partitionBy(col(blockCol), col(idCol))
    val posting = df
      .select(col(blockCol), col(idCol),
        explode(TextOps.shingleHashes(col(textCol), shingleK)).as("h"))
      .withColumn("n", count(lit(1)).over(wDoc))
      .repartition(col(blockCol), col("h"))
    posting.as("a")
      .join(posting.as("b").hint("shuffle_hash"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$blockCol").as(blockCol),
        col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"),
        col("a.n").as("n_1"), col("b.n").as("n_2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_1") + col("n_2") - col("inter")).cast("double"))
      .select(col(blockCol), col("id_1"), col("id_2"), col("jaccard"))
  }

  /** Corpus-scale all-pairs Jaccard: explode (shingle, id) pairs,
    * self-join on the shingle hash to co-count, and derive Jaccard from
    * set sizes. Shuffle volume is linear in total shingles (then
    * quadratic only within a shingle's posting list), vs. quadratic in
    * documents for [[blockedJaccardPairs]] — the 100 TB formulation.
    * Pairs sharing no shingle (Jaccard 0) are never materialized.
    * `maxDf` drops stop-shingles whose posting lists exceed it (a hot
    * shingle in M docs would emit M² candidate rows — classic skew cap;
    * dropped shingles make the estimate conservative, as in standard
    * near-dup practice). */
  def sparseJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleK: Int = 3, maxDf: Int = 1000): DataFrame = {
    // Single-pass formulation, no cache (see
    // [[sparseBlockedJaccardPairs]]): per-doc set sizes are a window
    // count over the posting list keyed by id (computed BEFORE the
    // stop-shingle cap, so dropped hot shingles shrink only the
    // intersection estimate, never the set sizes), and the stop-shingle
    // document frequency is a second window count on the (h)
    // partitioning the self-join needs anyway. One shingle compute,
    // three exchanges, no side joins.
    val wDoc = Window.partitionBy(col(idCol))
    val wHash = Window.partitionBy(col("h"))
    val posting = df
      .select(col(idCol),
        explode(TextOps.shingleHashes(col(textCol), shingleK)).as("h"))
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("df", count(lit(1)).over(wHash))
      .filter(col("df") <= maxDf && col("df") >= 2)
    posting.as("a")
      .join(posting.as("b").hint("shuffle_hash"), col("a.h") === col("b.h") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_1"), col(s"b.$idCol").as("id_2"),
        col("a.n").as("n_1"), col("b.n").as("n_2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_1") + col("n_2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")
  }

  // ---- embedding near-dup ---------------------------------------------

  /** For every vector, its single most-similar (cosine) neighbor within
    * the block — the near-dup *report* shape when no absolute threshold is
    * known. Ties broken by neighbor id. */
  def blockNearestNeighbor(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String): DataFrame = {
    val v = df.select(col(blockCol), col(idCol),
      VectorOps.normalized(col(vecCol).cast("array<double>")).as("__v"))
    val a = v.select(col(blockCol), col(idCol).as("id_1"), col("__v").as("v_1"))
    val b = v.select(col(blockCol), col(idCol).as("id_2"), col("__v").as("v_2"))
    val w = Window.partitionBy(col("id_1"))
      .orderBy(col("cos_sim").desc, col("id_2"))
    a.join(b, Seq(blockCol))
      .filter(col("id_1") =!= col("id_2"))
      .withColumn("cos_sim", VectorOps.dot(col("v_1"), col("v_2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(blockCol), col("id_1"), col("id_2"), col("cos_sim"))
  }

  /** Train/test decontamination (the n-gram overlap protocol used to
    * scrub eval benchmarks out of pretraining corpora): tag every
    * training document with the number of distinct hashed k-gram
    * shingles it shares with ANY test document, and a `contaminated`
    * flag at `minOverlap`.
    *
    * Scale shape: an eval suite is megabytes against a 100 TB corpus, so
    * the test side reduces to a distinct shingle-hash set and broadcasts
    * (`broadcastTest=false` degrades to a plain shuffle join on the
    * 8-byte gram hash for a genuinely large test side). The train side
    * is one scan → explode → join → groupBy(id): no exchange ever
    * carries document text, and the output is id-sized. */
  def decontaminationTags(
      train: DataFrame, test: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, minOverlap: Int = 1,
      broadcastTest: Boolean = true): DataFrame = {
    val testGrams0 = test
      .select(explode(TextOps.shingleHashes(col(textCol), shingleK)).as("__g"))
      .distinct()
    val testGrams = if (broadcastTest) broadcast(testGrams0) else testGrams0
    // shingleHashes is distinct per document, so post-join count(*) is
    // exactly the distinct-gram overlap — no second distinct needed
    val overlaps = train
      .select(col(idCol), explode(TextOps.shingleHashes(col(textCol), shingleK)).as("__g"))
      .join(testGrams, "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** [[decontaminationTags]] with a bloom-filter prefilter — the form
    * that survives a test corpus too large to broadcast as an exact
    * distinct-hash set. The held-out side's distinct shingle hashes
    * feed Spark's distributed bloom-filter aggregate (per-partition
    * sketches OR-merged into one binary, so the built filter is
    * partition-order independent); the corpus streams past the probe
    * expression (codegen'd, inside the scan stage) and only the
    * candidate grams — true overlaps plus the bounded false-positive
    * residue — reach the exact-confirm join. The confirm join removes
    * every false positive, so the output is BIT-IDENTICAL to the exact
    * operator at any `numBits`, including adversarially tiny filters.
    *
    * Scale shape (100 TB): an exact distinct-hash broadcast costs
    * 8 bytes per distinct test gram (gigabytes for a large benchmark
    * suite); the bloom sketch is `numBits/8` bytes FLAT regardless of
    * test-set size, and the join that remains is candidate-sized, not
    * corpus-sized. This is the GPT-3-scale decontamination shape.
    *
    * Same contract as [[decontaminationTags]]: (idCol, n_overlap,
    * contaminated) for every train row. */
  def bloomDecontaminationTags(
      train: DataFrame, test: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, minOverlap: Int = 1,
      numBits: Long = 1L << 22): DataFrame = {
    require(numBits > 0, s"numBits must be positive, got $numBits")
    val testGrams = test
      .select(explode(TextOps.shingleHashes(col(textCol), shingleK)).as("__g"))
      .distinct()
    // Distributed build, then ONE binary scalar (numBits/8 bytes — the
    // same bounded-metadata driver transfer as OrderStat's per-partition
    // counts) collected and re-shipped as a constant: `might_contain`
    // requires a constant/scalar-subquery filter so it can deserialize
    // the sketch once, not per row. estimatedNumItems only tunes the
    // hash count; it never affects correctness (the confirm join is
    // exact either way). Eager like exactQuantile: the build jobs run
    // at call time.
    val bf = testGrams.agg(call_function("bloom_agg",
      col("__g"), lit(numBits / 16), lit(numBits)).as("__bf"))
      .head.getAs[Array[Byte]](0)
    val candidates = train
      .select(col(idCol), explode(TextOps.shingleHashes(col(textCol), shingleK)).as("__g"))
      .filter(call_function("bloom_might_contain", lit(bf), col("__g")))
    val overlaps = candidates
      .join(testGrams, "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key
    * (label/cluster/LSH bucket): cosine ≥ threshold, id_1 < id_2. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(blockCol), col(idCol),
      VectorOps.normalized(col(vecCol).cast("array<double>")).as("__v"))
    val a = v.select(col(blockCol), col(idCol).as("id_1"), col("__v").as("v_1"))
    val b = v.select(col(blockCol), col(idCol).as("id_2"), col("__v").as("v_2"))
    a.join(b, Seq(blockCol))
      .filter(col("id_1") < col("id_2"))
      .withColumn("cos_sim", VectorOps.dot(col("v_1"), col("v_2")))
      .filter(col("cos_sim") >= threshold)
      .select(col(blockCol), col("id_1"), col("id_2"), col("cos_sim"))
  }
}
