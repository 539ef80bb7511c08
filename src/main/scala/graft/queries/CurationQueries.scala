package graft.queries

import graft.dedup.Clusters
import graft.text.{CorpusOps, Curation, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation completion operators (round 9): near-dup cluster
  * resolution (q121), sequence packing (q122), PII redaction (q123),
  * deterministic training-order shuffling (q124), per-domain caps
  * (q125), leakage-safe split assignment over near-dup clusters (q126)
  * and token-budget corpus mixing (q127) — the steps between
  * "pairs/scores computed" and "training batches written" that a 100 TB
  * corpus build runs after the q60-q75 scoring/dedup stages.
  */
object CurationQueries {
  import Tables._
  import TextDedupQueries.{toksSql, jacSql, sigCtes, bandSql, sigSql,
    hitsSql, langCases, qualitySql, numHashes, numBands, shingleK,
    jaccardThreshold}

  type Q = (SparkSession, String) => DataFrame

  private val packShards = 8
  private val packBudget = 256L
  private val shuffleSeed = "r9"
  private val shuffleShards = 8
  // q125: 15 of each source's 25 docs survive — both branches exercised
  private val domainCap = 15
  // q127 token budgets (sf0.01 totals: en 11757, zh 4143, others ~3.5-4k):
  // zh's budget exceeds its total (keep-all branch), the rest are capped
  private val mixBudgets = Seq("en" -> 6000.0, "zh" -> 5000.0)
  private val mixDefaultBudget = 2000.0
  // q129: 4-token spans in ≥2 docs are dropped (sf0.01: 341 of 6544
  // distinct spans are frequent, 771 of ~7300 chunks drop — both
  // branches exercised, and most docs keep a non-empty rebuild)
  private val spanDedupTokens = 4
  private val spanDedupMinDf = 2L
  // q130: the fixture vocabulary is 31 tokens; K=20 leaves real OOV mass
  private val vocabK = 20
  // q132: 8-token chunks, 3-token overlap (stride 5) — ~50-token docs
  // yield ~10 chunks incl. short tails, and sub-chunk docs exist
  private val chunkTokens = 8
  private val chunkOverlap = 3
  // q133: 5 docs per language (languages have ~100 docs at sf0.01)
  private val evalK = 5
  // q140: φ = 1/30 of the token stream (~905 at sf0.01 — the 31-token
  // fixture vocabulary straddles it, so both branches are exercised at
  // every sf); capacity 64 ≥ φ⁻¹ gives the exactness guarantee
  private val hhPhiInverse = 30L
  private val hhCapacity = 64
  // q141: multiplier 16 — languages with ≤16 docs keep all (exercised at
  // sf0.001), larger ones keep ⌊√(16n)⌋ (en 218 → 59 at sf0.01)
  private val sqrtMixMultiplier = 16L
  // q142: 5-token sliding windows in ≥2 docs; the fixture's repeated
  // phrases give flagged windows that merge into multi-window spans
  private val dupSpanWidth = 5
  private val dupSpanMinDf = 2L
  // q144: top-3 keywords — the 31-token vocabulary makes df spread wide
  // enough that score ties exist AND break deterministically by token
  private val keywordK = 3
  // q157: one rare term ('dup': df ~5% of docs at every sf) against two
  // common ones — the rational idf spread is what the ranking exercises
  private[queries] val bm25Terms = Seq("dup", "spark", "scan")
  private[queries] val bm25K = 10
  // q158: 2^10 buckets — collisions exist at the fixture vocabulary
  // size, exercising the hash-bucket path, and keep splits both ways
  private val classifierBuckets = 1024

  // q244: q201's default stopword rule (ns ≥ nt/20) keeps only 70 docs
  // at sf0.01 and starves the downstream dedup of families; 1/50 keeps
  // 227 with 9 multi-member near-dup clusters — every stage both
  // filters AND passes (production pipelines tune exactly this knob
  // per corpus)
  private val q244StopDen = 50

  val queries: Map[String, Q] = Map(
    // q244: the end-to-end curation COMPOSITION gate (r14 verdict item
    // 4): nfcNormalize → langId → gopherRules keep → LSH near-dup
    // pairs → connected components → keepBestPerCluster (quality
    // keeper) → leakage-safe cluster-hash split → packSequences, as
    // ONE query over the final packed output. The per-operator gates
    // (q180/q61/q201/q65/q121/q126/q122) pin each stage in isolation;
    // this pins the composition — a lost exchange reuse, a re-analysis
    // barrier, or an accidental second scan of the text column shows
    // up here (and in PlanHygieneSpec's scan pin), never in a
    // per-stage gate. The kept projection is localCheckpoint'd once
    // (the q127 discipline): three consumers read it (the shingle
    // pipeline, the CC node list, the keeper-quality join), and lazily
    // each would re-run the scan + NFC + metrics kernel — the
    // expensive part at corpus scale. Scale shape: everything
    // downstream of the checkpoint moves id-sized rows only; the text
    // column never crosses an exchange.
    "q244_curation_pipeline" -> { (s, d) =>
      val kept = documents(s, d)
        .select(col("doc_id"), TextOps.nfcNormalize(col("text")).as("text"))
        .select(col("doc_id"), col("text"),
          TextOps.langId(col("text")).as("lang"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.gopherRules(col("text"), stopDen = q244StopDen)
            .getField("keep").as("__keep"))
        .filter(col("__keep") === 1).drop("__keep")
        .localCheckpoint(true)
      val clusters = Clusters.nearDupClusters(kept, "doc_id", "text",
        jaccardThreshold, numHashes, shingleK, numBands)
      val members = clusters.select(col("doc_id"), col("cluster_id"))
        .join(kept.select(col("doc_id"), col("lang"), col("q"),
          col("n_tokens")), Seq("doc_id"))
      val keepers = Clusters.keepBestPerCluster(members, "doc_id",
        "cluster_id", "q").filter(col("is_keeper"))
      val bucket = pmod(TextOps.portableHash(
        concat(lit("split:"), col("cluster_id").cast("string"))), lit(10L))
      // checkpointed like `kept`: the packer consumes it keyed by shard
      // and the final label join keyed by doc_id — different keys, so
      // without truncation BOTH sides would re-run the keeper pipeline
      // (id-sized rows, but twice the cluster-join work at corpus scale)
      // split and its numeric shard derive from the SAME bucket
      // expression here (r15 review: mapping the split string back to
      // 0/1/2 downstream duplicated the boundary logic in two places)
      val assigned = keepers.select(col("doc_id"), col("lang"),
        col("cluster_id"), col("n_tokens"),
        when(bucket <= 7, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"),
        when(bucket <= 7, 0L).when(bucket === 8, 1L)
          .otherwise(2L).as("__shard"))
        .localCheckpoint(true)
      val packed = Curation.packSequences(
        assigned.select(col("__shard"), col("doc_id"), col("n_tokens")),
        "__shard", "doc_id", "n_tokens", packBudget)
      assigned.join(packed.select(col("doc_id"), col("seq_id"),
          col("tok_offset")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("cluster_id"),
          col("split"), col("n_tokens"), col("seq_id"), col("tok_offset"))
        .orderBy("doc_id")
    },

    // deterministic stratified k-fold CV assignment: per-language
    // salted-md5 rank mod 5 — fold sizes within a stratum differ by at
    // most one, membership a pure function of (seed, corpus).
    "q211_kfold_assign" -> { (s, d) =>
      Curation.kFoldAssign(documents(s, d).select("doc_id", "lang"),
        "lang", "doc_id", k = 5, seed = "r11")
        .orderBy("doc_id")
    },

    // per-group quantile transform: n_chars percentile-rank normalized
    // to [0,1] per language — (rank-1)/(n-1) with id tie-break, an
    // IEEE quotient of exact integers.
    "q212_quantile_transform" -> { (s, d) =>
      Curation.quantileTransform(
        documents(s, d).select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", "doc_id")
        .orderBy("doc_id")
    },

    // EXACT-count split assignment: largest-remainder (Hamilton)
    // apportionment of 80/10/10 over the corpus count — split SIZES
    // are the exact apportioned integers (q126's hash split is a rate,
    // this is a count), membership a pure function of (seed, corpus)
    // via the salted-md5 rank.
    "q206_apportioned_split" -> { (s, d) =>
      Curation.apportionedSplit(documents(s, d).select("doc_id"),
        "doc_id", Seq("train" -> 80L, "val" -> 10L, "test" -> 10L),
        seed = "r11", numShards = 8)
        .orderBy("doc_id")
    },

    // fractional-EPOCH upsampling (the "2.5 epochs of source X"
    // training-mix step): floor(e) copies + a salted-hash-chosen
    // extra for the fractional part — a reproducible SET, not a rate.
    "q207_epoch_upsample" -> { (s, d) =>
      val ppm = when(col("lang") === "en", 2500000L)
        .when(col("lang") === "zh", 1000000L).otherwise(500000L)
      Curation.epochUpsample(
        documents(s, d).select(col("doc_id"), ppm.as("__ppm")),
        "doc_id", col("__ppm"), seed = "r11")
        .orderBy("doc_id", "copy_n")
    },

    // Weighted PPS systematic sampling (Curation.ppsSystematicSample):
    // rows picked where their n_chars weight interval on a salted-hash
    // number line contains a multiple of floor(total/k) — deterministic
    // exact-integer weighted sampling, two-phase prefix sum (no global
    // window). The oracle states the SAME picks from one global cumsum
    // over the identical (shard, hash, id) order.
    "q194_pps_sample" -> { (s, d) =>
      Curation.ppsSystematicSample(
        documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 37, seed = "r11", numShards = 8)
        .orderBy("doc_id")
    },

    // ROUGE-2 overlap eval (agg/Eval.rougeN): clipped bigram overlap as
    // exact integers, recall/precision/F1 as IEEE quotients. Pairs =
    // each doc (candidate) vs the next doc in its source (reference) —
    // organically overlapping word-soup, both zero- and high-overlap
    // pairs present at every sf.
    "q193_rouge_overlap" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val pairs = documents(s, d)
        .withColumn("ref", lead(col("text"), 1).over(w))
        .filter(col("ref").isNotNull)
      graft.agg.Eval.rougeN(pairs, "doc_id", "text", "ref", n = 2)
        .orderBy("pair_id")
    },

    // URL canonicalization + registered-domain extraction (web-corpus
    // curation: the dedup/grouping key for crawled pages). The fixture
    // synthesizes URLs deterministically from doc fields — uppercase
    // scheme/host, a default :443 on the https half and a non-default
    // :8080 on the http half, a .co.uk multi-suffix third, tracking
    // params first/mid/last, a fragment — then both engines normalize
    // with the mirrored chain. Pure codegen'd projection, zero exchange.
    "q192_url_normalize" -> { (s, d) =>
      val id = col("doc_id").cast("string")
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://WWW."))
          .otherwise(lit("http://")),
        col("source"),
        when(col("doc_id") % 3 === 0, lit(".CO.UK"))
          .otherwise(lit(".Example.COM")),
        when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":8080")),
        lit("/Path/"), id,
        lit("?utm_source=news&Id="), id,
        when(col("doc_id") % 5 === 0, lit("&ref=tw&q=1"))
          .otherwise(lit("&utm_campaign=x")),
        lit("#Frag"))
      documents(s, d).select(col("doc_id"), url.as("__url"))
        .select(col("doc_id"),
          Curation.urlNormalize(col("__url")).as("url_norm"),
          Curation.registeredDomain(col("__url")).as("domain"))
        .orderBy("doc_id")
    },

    // near-dup clusters: LSH pairs → connected components → canonical
    // keeper per cluster. Chains (A~B~C with A≁C) collapse to one
    // cluster — the property per-pair tagging cannot provide.
    "q121_neardup_clusters" -> { (s, d) =>
      Clusters.nearDupClusters(documents(s, d), "doc_id", "text",
        jaccardThreshold, numHashes, shingleK, numBands)
        .orderBy("doc_id")
    },

    // deterministic sequence packing: shard by hashed id, order by id,
    // greedy fill to the token budget. One exchange; no text moves.
    "q122_seq_packing" -> { (s, d) =>
      val withShard = documents(s, d).select(
        pmod(TextOps.portableHash(
          concat(lit("pack:"), col("doc_id").cast("string"))),
          lit(packShards.toLong)).as("shard"),
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packSequences(withShard, "shard", "doc_id", "n_tokens",
        packBudget)
        .orderBy("shard", "doc_id")
    },

    // PII scrub: deterministic planted PII (so both match classes and
    // clean rows are exercised), per-class counts + redacted digest.
    // Pure projection — scan-parallel at any corpus size.
    "q123_pii_scrub" -> { (s, d) =>
      val id = col("doc_id")
      val planted = concat(col("text"),
        when(id % 3 === 1, concat(lit(" mail u"), id.cast("string"),
          lit("@ex-"), (id % 7).cast("string"), lit(".org"))).otherwise(lit("")),
        when(id % 3 === 2, concat(lit(" from 10."), (id % 200).cast("string"),
          lit(".3."), (id % 250).cast("string"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" call +1 555-01"),
          lpad((id % 100).cast("string"), 2, "0"))).otherwise(lit("")))
      val df = documents(s, d).withColumn("__t", planted)
      val (ne, nip, nph) = Curation.piiCounts(col("__t"))
      df.select(id,
          ne.cast("long").as("n_emails"),
          nip.cast("long").as("n_ips"),
          nph.cast("long").as("n_phones"),
          TextOps.md5Hex(Curation.piiRedact(col("__t"))).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // deterministic training-order shuffle: seeded md5 order key within
    // hash shards — same seed ⇒ byte-identical batch order on any
    // cluster; new seed ⇒ independent permutation.
    "q124_train_shuffle" -> { (s, d) =>
      Curation.trainOrderShuffle(documents(s, d), "doc_id", shuffleSeed,
        shuffleShards)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    },

    // per-domain caps: no single source may contribute more than K docs
    // — rank within source by quality (best first) and keep rank <= K.
    // One hash exchange (the window's partitionBy); quality doubles are
    // bit-identical cross-engine (q62 proves the expression), so the
    // rank order is exactly reproducible.
    "q125_domain_caps" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("q").desc, col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("q"))
        .withColumn("q_rank", row_number().over(w).cast("long"))
        .filter(col("q_rank") <= domainCap)
        .select("doc_id", "source", "q_rank")
        .orderBy("doc_id")
    },

    // leakage-safe split assignment: hash the near-dup CLUSTER id, not
    // the doc id, so every member of a duplicate family lands in the
    // same train/val/test split — hashing doc ids would leak near-dup test
    // rows into train. Composition of q121's clusters + q119's
    // deterministic hash-split.
    "q126_leakage_safe_split" -> { (s, d) =>
      val clusters = Clusters.nearDupClusters(documents(s, d), "doc_id",
        "text", jaccardThreshold, numHashes, shingleK, numBands)
      val bucket = pmod(TextOps.portableHash(
        concat(lit("split:"), col("cluster_id").cast("string"))), lit(10L))
      clusters
        .select(col("doc_id"), col("cluster_id"),
          when(bucket <= 7, "train").when(bucket === 8, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // token-budget corpus mixing: per-language keep rates chosen so the
    // sampled corpus hits a target token budget per language (the data-
    // mixing step of a corpus build). Per-language totals are a tiny
    // aggregate that broadcasts back; the keep decision is a pure
    // hash-of-id filter — the corpus itself is touched by one scan.
    "q127_corpus_mixing" -> { (s, d) =>
      // materialize the slim (doc_id, lang, n) projection ONCE: both the
      // totals aggregate and the filter probe consume it, and in a lazy
      // diamond Spark would execute the text scan + tokenize (the
      // expensive part at corpus scale) once per consumer — exactly what
      // a production pipeline avoids by checkpointing the projection
      val base = documents(s, d).select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n"))
        .localCheckpoint(true)
      val budget = mixBudgets.foldRight(lit(mixDefaultBudget)) {
        case ((l, b), acc) => when(col("lang") === l, b).otherwise(acc)
      }
      val totals = base.groupBy("lang").agg(sum(col("n")).as("tot"))
        .withColumn("rate_ppm",
          floor(least(lit(1.0), budget / col("tot").cast("double")) * 1e6)
            .cast("long"))
      base.join(broadcast(totals), "lang")
        .filter(pmod(TextOps.portableHash(
          concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000000L))
          < col("rate_ppm"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("n")).as("tokens_kept"),
          first(col("rate_ppm")).as("rate_ppm"))
        .orderBy("lang")
    },

    // C4/CCNet cross-document span dedup: drop 4-token spans that occur
    // verbatim in ≥2 documents, rebuild the survivors. The frequency
    // aggregate shuffles (md5, doc_id) pairs; the rebuild is one hash
    // exchange on doc id — span text crosses the wire exactly once.
    "q129_span_dedup" -> { (s, d) =>
      Curation.spanDedup(documents(s, d), "doc_id", "text",
        spanDedupTokens, spanDedupMinDf)
        .orderBy("doc_id")
    },

    // tokenizer vocabulary induction + per-doc OOV: top-K corpus tokens
    // (ties broken by token text so the vocabulary is engine-exact),
    // broadcast back over the token stream for per-document coverage.
    "q130_vocab_oov" -> { (s, d) =>
      val docs = documents(s, d)
      CorpusOps.oovRates(docs, "doc_id", "text",
        CorpusOps.topKVocab(docs, "text", vocabK))
        .orderBy("doc_id")
    },

    // retrieval/RAG chunking: overlapping fixed-token windows, pure
    // per-row array build + explode — zero exchange at any corpus size.
    "q132_doc_chunking" -> { (s, d) =>
      Curation.chunkDocuments(documents(s, d), "doc_id", "text",
        chunkTokens, chunkOverlap)
        .orderBy("doc_id", "chunk_i")
    },

    // exact-k per-stratum sampling (eval-set construction): salted-hash
    // rank within each language, keep the k smallest — reproducible
    // across engines/cluster sizes, unlike a rate sample (q119).
    "q133_eval_sample" -> { (s, d) =>
      Curation.exactKPerStratum(
        documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", evalK, "r9")
        .orderBy("doc_id")
    },

    // held-out bigram-LM fluency scoring (CCNet's LM-quality axis):
    // train add-one-smoothed bigram counts on the %10≠0 split, score
    // the held-out docs by mean transition probability. Ratio-of-
    // integers arithmetic only (no transcendentals), so the score is
    // bit-identical across engines; the per-doc mean is Det.dsum'd.
    "q131_bigram_lm" -> { (s, d) =>
      val docs = documents(s, d)
      CorpusOps.bigramLmScore(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // exact φ-heavy-hitters: per-partition Misra-Gries candidates +
    // exact verify pass — the groupBy-free way to find every token at
    // ≥ N/30 frequency when the distinct-token universe dwarfs memory.
    "q140_heavy_hitters" -> { (s, d) =>
      graft.agg.HeavyHitters.exactHeavyHitters(
        documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("token")),
        "token", hhPhiInverse, hhCapacity)
        .orderBy("token")
    },

    // τ=0.5 temperature rebalancing: each stratum keeps min(n, ⌊√(16n)⌋)
    // docs by salted-hash rank — integer-exact targets, reproducible set.
    "q141_sqrt_temp_sample" -> { (s, d) =>
      Curation.sqrtTemperatureSample(
        documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", sqrtMixMultiplier, "r10")
        .select("doc_id", "lang", "n_docs", "k_target", "sample_rank")
        .orderBy("doc_id")
    },

    // suffix-style substring dedup: sliding 5-token windows duplicated
    // across ≥2 docs, merged per doc into maximal spans (q129 catches
    // only tile-aligned repeats; this catches every alignment).
    "q142_substring_dup" -> { (s, d) =>
      Curation.dupSubstringSpans(documents(s, d), "doc_id", "text",
        dupSpanWidth, dupSpanMinDf)
        .orderBy("doc_id", "span_i")
    },

    // span-level decontamination: maximal spans of train docs whose
    // sliding windows appear verbatim in the held-out split — q120
    // counts contamination, this locates it for redaction.
    "q143_contamination_spans" -> { (s, d) =>
      val docs = documents(s, d)
      Curation.contaminationSpans(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", dupSpanWidth)
        .orderBy("doc_id", "span_i")
    },

    // integer-exact tf-idf keyword extraction: ⌊tf·10¹²/df⌋ score (rank-
    // equivalent to tf·N/df, transcendental-free), top-3 per doc.
    "q144_tfidf_keywords" -> { (s, d) =>
      CorpusOps.tfIdfKeywords(documents(s, d), "doc_id", "text", keywordK)
        .orderBy("doc_id", "kw_rank")
    },

    // distribution-cut quality filter: keep each language's top 40% by
    // quality score, the cut at an EXACT per-language 0.6-percentile
    // (q125 caps by count; this cuts by score distribution).
    "q153_quality_cut" -> { (s, d) =>
      Curation.percentileThresholdFilter(
        documents(s, d).select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("q")),
        "lang", "q", 0.6)
        .select("doc_id", "lang", "q", "threshold")
        .orderBy("doc_id")
    },

    // quality-canonical dedup: q121's clusters, but the keeper is the
    // highest-QUALITY member (tie: min id), not the minimum id — the
    // keep-the-cleanest-copy action plus the delete list with
    // replacement pointers an index rewrite needs.
    "q156_cluster_canonical" -> { (s, d) =>
      val docs = documents(s, d)
      val scored = Clusters.nearDupClusters(docs, "doc_id", "text",
          jaccardThreshold, numHashes, shingleK, numBands)
        .join(docs.select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("q")), Seq("doc_id"))
      Clusters.keepBestPerCluster(scored, "doc_id", "cluster_id", "q")
        .select("doc_id", "cluster_id", "keeper_id", "is_keeper",
          "n_members")
        .orderBy("doc_id")
    },

    // BM25 retrieval (rational idf, transcendental-free): top-10 docs
    // for a fixed query-term set — one rare term against two common
    // ones exercises the idf spread.
    "q157_bm25" -> { (s, d) =>
      CorpusOps.bm25TopK(documents(s, d), "doc_id", "text", bm25Terms,
        bm25K)
        .orderBy("doc_id")
    },

    // fastText-shape hashed linear classifier: unigram+bigram feature
    // hashing mod 1024, deterministic stand-in weight table, exact
    // int64 dot product, keep = score >= 0.
    "q158_quality_classifier" -> { (s, d) =>
      CorpusOps.hashedLinearScore(documents(s, d), "doc_id", "text",
        classifierBuckets)
        .orderBy("doc_id")
    },

    // Unicode NFC normalization — the step before any hash-keyed dedup
    // so composed (é) and decomposed (e+U+0301) spellings collide. The
    // fixture text is appended a suffix that alternates decomposed /
    // precomposed "café" by doc parity, so both the changed and the
    // already-NFC branch are exercised at every sf; the post-NFC hash
    // proves both engines composed to identical bytes.
    "q161_nfc_normalize" -> { (s, d) =>
      val raw = concat(col("text"),
        when(col("doc_id") % 2 === 0, lit(" cafe\u0301")) // decomposed: e + combining acute
          .otherwise(lit(" caf\u00e9"))) // precomposed é
      documents(s, d)
        .select(col("doc_id"), raw.as("__raw"),
          TextOps.nfcNormalize(raw).as("__nfc"))
        .select(col("doc_id"),
          length(col("__raw")).cast("long").as("n_raw"),
          length(col("__nfc")).cast("long").as("n_nfc"),
          (col("__raw") =!= col("__nfc")).as("changed"),
          TextOps.portableHash(col("__nfc")).as("h"))
        .orderBy("doc_id")
    },

    // per-source distribution drift: integer-exact total-variation
    // distance over the corpus's top-20 tokens — the crawl-health
    // audit run before a source enters a training mix.
    "q163_source_drift" -> { (s, d) =>
      CorpusOps.sourceDrift(documents(s, d), "source", "text", vocabK)
        .orderBy("source")
    },

    // distributed BPE tokenizer TRAINING (merge learning): 12 merges
    // over the word-frequency-compressed corpus, hash-gated against an
    // unrolled 12-round DuckDB trainer (see bpeTrainOracle); bit-level
    // correctness is additionally pinned by the spec's brute-force
    // reference (CurationSpec) and the q106 counting kernel consumes
    // tables of exactly this shape.
    "q166_bpe_train" -> { (s, d) =>
      graft.text.BpeTrain.learnMerges(documents(s, d), "text", 12)
        .orderBy("rank")
    },

    // count-min sketch over the token stream, probed at the exact
    // top-20: sketch state is eps⁻¹·ln(1/δ) counters FLAT regardless
    // of corpus size; the q54-style bound flags (est ≥ true;
    // est ≤ true + ⌈eps·N⌉) are what a SQL oracle can state.
    "q167_count_min" -> { (s, d) =>
      val toks = documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      graft.agg.Sketches.countMinTopK(toks, "tok", 20,
          eps = 0.001, confidence = 0.99, seed = 42)
        .orderBy("tok")
    },

    // DataSketches HLL per-source distinct docs: bound flag vs exact,
    // plus MERGE consistency — per-half sketches hll_union_agg'd must
    // land on the same estimate as the direct build (the property that
    // makes sketch columns storable next to snapshots and unionable
    // across days).
    "q168_hll_distinct" -> { (s, d) =>
      graft.agg.Sketches.hllDistinctCheck(documents(s, d), "source",
          "doc_id", relErr = 0.05)
        .orderBy("source")
    },

    // blocked Levenshtein entity resolution (dedup/EntityResolution):
    // the record corpus is every doc's 24-char prefix plus a typo'd
    // variant (char 10 → 'q') for every third doc — so the match graph
    // has real multi-member entities AND organic prefix collisions.
    // Blocking on the 4-char prefix (stable under the char-10 typo),
    // edges at ≤ 2 edits via the bounded codegen'd levenshtein, CC via
    // the shared pointer-jumping pipeline, min-id canonical. Oracle:
    // the same pairs + a recursive-closure CTE.
    "q179_entity_resolution" -> { (s, d) =>
      val base = documents(s, d).select(col("doc_id").as("id"),
        lower(substring(col("text"), 1, 24)).as("s"))
      val variants = base.filter(col("id") % 3 === 0)
        .select((col("id") + 500000000L).as("id"),
          concat(substring(col("s"), 1, 9), lit("q"),
            expr("substring(s, 11)")).as("s"))
      val recs = base.unionByName(variants)
        .withColumn("b", substring(col("s"), 1, 4))
      graft.dedup.EntityResolution
        .resolve(recs, "id", "s", Seq("b"), maxDist = 2)
        .orderBy("id")
    },

    // two-sample χ² drift readout: lang distribution of the even-id
    // half vs the odd-id half of the corpus — per-category exact-D²
    // contributions (decimal(38) numerator, one IEEE division), the
    // transcendental-free stand-in for PSI drift monitors.
    "q223_chi2_drift" -> { (s, d) =>
      val docs = documents(s, d)
      graft.agg.Eval.chiSquareDrift(
        docs.filter(col("doc_id") % 2 === 0).select(col("lang")),
        docs.filter(col("doc_id") % 2 === 1).select(col("lang")),
        "lang")
        .orderBy("lang")
    },

    // blocking-FREE exact edit-distance join (dedup/EdJoin, the
    // PassJoin segment pigeonhole): same corpus as q179 but no caller
    // blocking key — candidates come from 8-char segment-key equality,
    // so the pair set is the LOSSLESS quadratic truth (a strict
    // superset of q179's block-limited edges when near pairs straddle
    // prefix blocks). Oracle = the exhaustive O(n²) scan.
    "q215_edjoin" -> { (s, d) =>
      val base = documents(s, d).select(col("doc_id").as("id"),
        lower(substring(col("text"), 1, 24)).as("s"))
      val variants = base.filter(col("id") % 3 === 0)
        .select((col("id") + 500000000L).as("id"),
          concat(substring(col("s"), 1, 9), lit("q"),
            expr("substring(s, 11)")).as("s"))
      graft.dedup.EdJoin
        .matchPairs(base.unionByName(variants), "id", "s", maxDist = 2)
        .orderBy("id_1", "id_2")
    },

    // exact tie-corrected ROC-AUC (agg/Eval.scala): n_chars scoring
    // lang='en' — heavy score ties, so the gate exercises the tie term;
    // the rational (num2, den2) is exact integers, `auc` their IEEE
    // quotient, all stated verbatim by the oracle's cumulative window.
    "q185_auc_exact" -> { (s, d) =>
      val df = documents(s, d).select(col("n_chars"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.aucExact(df, "n_chars", "y")
    },

    // confusion matrix + precision/recall/F1 at threshold 150 over the
    // same scorer — exact counts, IEEE quotients of exact integers.
    "q186_confusion" -> { (s, d) =>
      val df = documents(s, d).select(col("n_chars"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.confusionAt(df, "n_chars", "y", threshold = 150.0)
    },

    // collocation mining (CorpusOps.collocations): corpus top-20
    // bigrams by the integer-scaled PMI argument (log-free ranking —
    // q144's discipline), minCount 3 against the hapax degenerate top.
    "q184_collocations" -> { (s, d) =>
      CorpusOps.collocations(documents(s, d), "doc_id", "text",
          k = 20, minCount = 3L)
        .orderBy(col("score").desc, col("w1"), col("w2"))
    },

    // HTML boilerplate strip (Curation.htmlToText): each doc wrapped in
    // a deterministic page — script with an embedded '<' in its code,
    // style, comment carrying the doc id, heading, all five entities —
    // then stripped back to visible text. The wrap AND the strip chain
    // are mirrored verbatim in the oracle, so the md5 gates every
    // pattern in the chain. Pure projection: the scan-linear floor.
    "q180_html_to_text" -> { (s, d) =>
      val html = concat(
        lit("<html><head><script type=\"text/x\">var a = 1 < 2;" +
          "</script><style>.x{color:red}</style></head><body><!-- doc "),
        col("doc_id").cast("string"), lit(" --><h1>"), col("source"),
        lit("</h1><p class=\"m\">"), col("text"),
        lit("</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s" +
          "&nbsp;end</div></body></html>"))
      documents(s, d)
        .select(col("doc_id"), Curation.htmlToText(html).as("__t"))
        .select(col("doc_id"), length(col("__t")).as("n_chars"),
          md5(col("__t")).as("t_md5"),
          substring(col("__t"), 1, 32).as("head"))
        .orderBy("doc_id")
    },

    // chunk-level exact dedup + reassembly (r13): variants re-emit each
    // %5 doc's first 32 tokens under a higher id, so their 16-token
    // chunks exactly duplicate the source's — the min-(id, idx) keeper
    // must keep every original intact and gut the variants.
    "q225_chunk_dedup" -> { (s, d) =>
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 300000000L).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 32), " ")
            .as("text"))
      Curation.chunkDedup(docs.unionByName(variants), "doc_id", "text",
          chunkTokens = 16)
        .orderBy("doc_id")
    },

    // winnowed (MOSS) fingerprints, exploded — every window of w=4
    // consecutive 3-gram hashes contributes its min; the oracle
    // restates the identical selection over the portable-hash grams.
    "q226_winnow_fingerprints" -> { (s, d) =>
      graft.dedup.Dedup.winnowedFingerprints(documents(s, d), "doc_id",
          "text", k = 3, w = 4)
        .orderBy("doc_id", "fp")
    },

    // calibration bins (r13): n_chars capped at 1000 read as a
    // milli-probability score for lang='en' — per-bin exact integer
    // counts, IEEE acc/conf quotients, and the exact ECE numerator.
    "q227_calibration_bins" -> { (s, d) =>
      val df = documents(s, d).select(
        least(col("n_chars"), lit(1000L)).as("a"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.calibration(df, "a", "y", bins = 10).orderBy("bin")
    },

    // exact Brier score over the same milli-probability contract.
    "q228_brier" -> { (s, d) =>
      val df = documents(s, d).select(
        least(col("n_chars"), lit(1000L)).as("a"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.brierExact(df, "a", "y")
    },

    // winnowing candidate pairs (r13): q226's fingerprints bucket-joined
    // with hot posting lists (> 40 docs) dropped BEFORE the self-join —
    // the cap must bite at this corpus (word-soup shares grams) so the
    // oracle proves the drop, not just the join.
    "q229_winnow_candidates" -> { (s, d) =>
      graft.dedup.Dedup.winnowCandidates(documents(s, d), "doc_id",
          "text", k = 3, w = 4, minShared = 2, maxBucket = 40)
        .orderBy("id_1", "id_2")
    },

    // pair-counting clustering eval (Rand-index family): lang read as a
    // predicted clustering of the truth classes source — TP/FP/FN/TN
    // from pure contingency combinatorics, never a materialized pair.
    "q230_cluster_pair_eval" -> { (s, d) =>
      graft.agg.Eval.clusterPairCounts(
        documents(s, d).select(col("lang"), col("source")),
        "lang", "source")
    },

    // per-group χ² drift (r13): every source's lang distribution vs the
    // rest of the corpus in one job — the categorical sibling of q232.
    "q233_chi2_by_group" -> { (s, d) =>
      graft.agg.Eval.chiSquareDriftByGroup(
          documents(s, d).select(col("lang"), col("source")),
          "lang", "source")
        .orderBy("source", "lang")
    },

    // per-SOURCE calibration (r14): q227's bins × the bounded
    // group-directory grid — per-source calibration drift is what a
    // training pipeline actually monitors; unused (source, bin) cells
    // materialize with zeros.
    "q236_calibration_by_group" -> { (s, d) =>
      val df = documents(s, d).select(col("source"),
        least(col("n_chars"), lit(1000L)).as("a"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.calibrationByGroup(df, "a", "y", "source",
          bins = 10)
        .orderBy("source", "bin")
    },

    // per-SOURCE exact Brier over the same milli-probability contract.
    "q237_brier_by_group" -> { (s, d) =>
      val df = documents(s, d).select(col("source"),
        least(col("n_chars"), lit(1000L)).as("a"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.brierByGroup(df, "a", "y", "source")
        .orderBy("source")
    },

    // per-SOURCE exact AUC (r14): q185's tie-corrected rational keyed
    // by source with GROUP-PARTITIONED cumulative windows (every group
    // sorts in parallel — no single-task funnel), completing the
    // per-group eval tier (KS q232, χ² q233, calibration q236, Brier
    // q237). One-class groups emit null auc.
    "q240_auc_by_group" -> { (s, d) =>
      val df = documents(s, d).select(col("source"), col("n_chars"),
        (col("lang") === "en").cast("long").as("y"))
      graft.agg.Eval.aucByGroup(df, "n_chars", "y", "source")
        .orderBy("source")
    },

    // winnowing tier closed end-to-end (r14 verdict item 3): q229's
    // capped candidates → exact shingle-Jaccard confirm → the shared
    // pointer-jumping CC — the q121 analog on MOSS fingerprints, same
    // per-doc (cluster_id, is_dup) contract.
    "q238_winnow_dedup" -> { (s, d) =>
      Clusters.winnowClusters(documents(s, d), "doc_id", "text",
          k = 3, w = 4, threshold = jaccardThreshold, minShared = 2,
          maxBucket = 40)
        .orderBy("doc_id")
    },

    // the winnowing tier grading ITSELF with the r13 eval operator:
    // winnow-CONFIRMED pairs vs q190's lossless PPJoin truth at the
    // same τ=1/2. Precision is 1 by construction (both sides carry the
    // exact confirm); recall measures what the w=4 min-selection +
    // minShared=2 + hot-list cap miss — the number a pipeline reads
    // before choosing (k, w) on a slice.
    "q239_winnow_eval" -> { (s, d) =>
      val docs = documents(s, d)
      val cand = graft.dedup.Dedup.winnowNearDupPairs(docs, "doc_id",
        "text", k = 3, w = 4, threshold = jaccardThreshold,
        minShared = 2, maxBucket = 40).select("id_1", "id_2")
      val truth = graft.dedup.SetSimJoin.prefixJaccardJoin(docs,
          "doc_id", "text", tauNum = 1, tauDen = 2, shingleK = shingleK)
        .select("id_1", "id_2")
      graft.dedup.Dedup.pairSetEval(cand, truth)
    }
  )

  // ---- oracles --------------------------------------------------------

  /** q66's confirmed-pair pipeline verbatim, then min-label reachability
    * as a recursive closure — exactly the fixpoint the pointer-jumping
    * Spark iteration converges to. Shared by q121 and q126. */
  /** q229's winnowing pipeline (k=3, w=4, maxBucket=40, minShared=2)
    * as shared CTE text ending in `wcand(id_1, id_2, n_shared)` —
    * stated once, consumed by the q229/q238/q239 oracles. */
  private val winnowCtes =
    s"""toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
       |hs AS (SELECT doc_id, list_transform(t,
       |    x -> ${TextOps.portableHashSql("x")}) AS hs FROM toks),
       |g AS (SELECT doc_id, ${TextOps.ngramHashesSql("hs", 3)} AS g
       |  FROM hs),
       |f AS (SELECT doc_id, CASE
       |    WHEN len(g) >= 4 THEN list_distinct(list_transform(
       |      range(1, len(g) - 4 + 2), i -> list_min(g[i:i+3])))
       |    WHEN len(g) > 0 THEN [list_min(g)]
       |    ELSE []::BIGINT[] END AS fps FROM g),
       |fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       |ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 40),
       |pr AS (SELECT fp.doc_id, fp.fp FROM fp JOIN ok USING (fp)),
       |wcand AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |  FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** The exact-Jaccard confirm leg over [[winnowCtes]]' candidates
    * (shingle relation `wsh`, confirmed pairs `wconf`) — the oracle
    * restatement of Dedup.winnowNearDupPairs' confirm joins. */
  private val winnowConfCtes =
    s"""wsh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
       |wconf AS (SELECT id_1, id_2 FROM (
       |  SELECT wcand.id_1, wcand.id_2, ${jacSql("s1.sh", "s2.sh")} AS j
       |  FROM wcand JOIN wsh s1 ON wcand.id_1 = s1.doc_id
       |    JOIN wsh s2 ON wcand.id_2 = s2.doc_id)
       |  WHERE j >= $jaccardThreshold)""".stripMargin

  private val closureCtes =
    s"""${sigCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs),
       |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
       |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       |  FROM bx a JOIN bx b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id),
       |conf AS (SELECT id_1, id_2 FROM (
       |  SELECT cand.id_1, cand.id_2, ${jacSql("s1.sh", "s2.sh")} AS j
       |  FROM cand JOIN sh s1 ON cand.id_1 = s1.doc_id
       |    JOIN sh s2 ON cand.id_2 = s2.doc_id)
       |  WHERE j >= $jaccardThreshold),
       |sym AS (SELECT id_1 AS a, id_2 AS b FROM conf
       |  UNION ALL SELECT id_2, id_1 FROM conf),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a)""".stripMargin

  /** Unrolled `numMerges`-round DuckDB BPE trainer (round-11: replaces
    * q166's rows-only gate with a full cross-engine hash gate). Each
    * word's symbol sequence is ONE string: a single chr(31) at the word
    * edges and a double chr(31) between symbols. Tokens are
    * whitespace-split so symbol text can never contain the separator,
    * which makes `replace(s, SEP||l||SEP||SEP||r||SEP, SEP||l||r||SEP)`
    * exactly the engine's leftmost-non-overlapping merge fold (DuckDB
    * replace scans left-to-right and resumes AFTER each match, so
    * "a a a" under (a,a) yields ["aa","a"], and back-to-back pairs
    * re-match because the shared boundary keeps one of its two
    * separators). MATERIALIZED is load-bearing: s(k-1) is referenced
    * twice per round, so inlined CTEs would re-expand 2^numMerges
    * times (the prototype ran >120 s inlined, 0.3 s materialized). */
  private def bpeTrainOracle(numMerges: Int): String = {
    val sep = "chr(31)"
    val base =
      s"""toks AS MATERIALIZED (SELECT unnest(${toksSql("text")}) AS w FROM documents),
         |w0 AS MATERIALIZED (SELECT w, count(*) AS f FROM toks GROUP BY 1),
         |s0 AS MATERIALIZED (SELECT $sep || array_to_string(list_transform(range(1, length(w) + 1), i -> w[i]), $sep||$sep) || $sep AS s, f FROM w0)""".stripMargin
    val rounds = (1 to numMerges).map { k =>
      val pair = s"p$k AS MATERIALIZED (SELECT p.l AS l, p.r AS r, CAST(sum(f) AS BIGINT) AS c FROM (\n" +
        s"  SELECT f, unnest(list_transform(range(1, len(toks)), i -> {'l': toks[i], 'r': toks[i + 1]})) AS p\n" +
        s"  FROM (SELECT f, string_split(trim(s, $sep), $sep||$sep) AS toks FROM s${k - 1})) GROUP BY 1, 2),\n" +
        s"m$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1)"
      if (k == numMerges) pair // the last rewrite is never read
      else pair + ",\n" +
        s"s$k AS MATERIALIZED (SELECT replace(s, $sep||m.l||$sep||$sep||m.r||$sep, $sep||m.l||m.r||$sep) AS s, f FROM s${k - 1} CROSS JOIN m$k m)"
    }
    val sel = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right", l || r AS merged, c AS pair_count FROM m$k"""
    }.mkString("\nUNION ALL\n")
    "WITH " + (base +: rounds).mkString(",\n") + "\n" + sel + "\nORDER BY rank"
  }

  /** q244 oracle: the full composed pipeline restated in DuckDB — the
    * q201 integer gopher rules, q61's stopword-hit langid, the q121
    * recursive LSH+CC closure and q62's quality formula over the KEPT
    * subset, q126's cluster-hash split, and q122's recursive greedy
    * packer over the keepers. NFC normalization is identity on the
    * ASCII fixture (q180 pins the kernel itself on planted non-ASCII),
    * so the oracle states raw text. */
  private val q244Oracle: String = {
    val stopAll = TextOps.langStopwords.flatMap(_._2)
    s"""WITH RECURSIVE m0 AS (SELECT doc_id, text, ${toksSql("text")} AS t FROM documents),
       |m AS (SELECT doc_id, text, t, CAST(len(t) AS BIGINT) AS nt,
       |  CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS BIGINT) AS sl,
       |  CAST(${hitsSql("t", stopAll)} AS BIGINT) AS ns FROM m0),
       |kept AS (SELECT doc_id, text, t, nt FROM m
       |  WHERE nt >= 30 AND nt <= 90 AND sl >= 4 * nt AND sl <= 5 * nt
       |    AND $q244StopDen * ns >= nt),
       |langhits AS (SELECT doc_id,
       |  ${TextOps.langStopwords.map { case (l, ws) => s"${hitsSql("t", ws)} AS h_$l" }.mkString(",\n  ")}
       |  FROM kept),
       |lng AS (SELECT doc_id, $langCases AS lang FROM langhits),
       |qual AS (SELECT doc_id, $qualitySql AS q FROM kept),
       |hs AS (SELECT doc_id, list_transform(t, x -> ${TextOps.portableHashSql("x")}) AS hs FROM kept),
       |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
       |sigs AS (SELECT doc_id, ${sigSql("sh").mkString("[", ", ", "]")} AS sig FROM sh),
       |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs),
       |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
       |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       |  FROM bx a JOIN bx b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id),
       |conf AS (SELECT id_1, id_2 FROM (
       |  SELECT cand.id_1, cand.id_2, ${jacSql("s1.sh", "s2.sh")} AS j
       |  FROM cand JOIN sh s1 ON cand.id_1 = s1.doc_id
       |    JOIN sh s2 ON cand.id_2 = s2.doc_id)
       |  WHERE j >= $jaccardThreshold),
       |sym AS (SELECT id_1 AS a, id_2 AS b FROM conf
       |  UNION ALL SELECT id_2, id_1 FROM conf),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM kept
       |  UNION
       |  SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a),
       |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
       |keeper AS (SELECT doc_id, cluster_id FROM (
       |    SELECT cl.doc_id, cl.cluster_id,
       |      row_number() OVER (PARTITION BY cl.cluster_id
       |        ORDER BY q.q DESC, cl.doc_id) AS rn
       |    FROM cl JOIN qual q USING (doc_id)) WHERE rn = 1),
       |spl AS (SELECT doc_id, cluster_id,
       |    ${TextOps.portableHashSql("(concat('split:', CAST(cluster_id AS VARCHAR)))")} % 10 AS bkt
       |  FROM keeper),
       |asg AS (SELECT doc_id, cluster_id,
       |    CASE WHEN bkt <= 7 THEN 'train' WHEN bkt = 8 THEN 'val'
       |      ELSE 'test' END AS split,
       |    CAST(CASE WHEN bkt <= 7 THEN 0 WHEN bkt = 8 THEN 1
       |      ELSE 2 END AS BIGINT) AS shard
       |  FROM spl),
       |base AS (SELECT a.shard, a.doc_id, k.nt AS n
       |  FROM asg a JOIN kept k USING (doc_id)),
       |b2 AS (SELECT shard, doc_id, n,
       |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM base),
       |pack(shard, rn, doc_id, n, seq, off) AS (
       |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b.shard, b.rn, b.doc_id, b.n,
       |    CAST(CASE WHEN p.off + p.n + b.n > $packBudget THEN p.seq + 1 ELSE p.seq END AS BIGINT),
       |    CAST(CASE WHEN p.off + p.n + b.n > $packBudget THEN 0 ELSE p.off + p.n END AS BIGINT)
       |  FROM pack p JOIN b2 b ON b.shard = p.shard AND b.rn = p.rn + 1)
       |SELECT p.doc_id, l.lang, a.cluster_id, a.split,
       |  p.n AS n_tokens, p.seq AS seq_id, p.off AS tok_offset
       |FROM pack p JOIN asg a USING (doc_id) JOIN lng l USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  lazy val oracles: Map[String, String] = Map(
    "q244_curation_pipeline" -> q244Oracle,

    // same md5 order, same rank-mod-k arithmetic.
    "q211_kfold_assign" ->
      """SELECT doc_id, lang,
        |  CAST((row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(concat('fold:r11:', CAST(doc_id AS VARCHAR))),
        |      doc_id) - 1) % 5 AS BIGINT) AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same (value, id) rank and (rank-1)/(n-1) quotient.
    "q212_quantile_transform" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS q_rank,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, q_rank,
        |  CASE WHEN n = 1 THEN 0.0
        |    ELSE (q_rank - 1)::DOUBLE / (n - 1)::DOUBLE END AS quantile
        |FROM r ORDER BY doc_id""".stripMargin,

    // the same largest-remainder arithmetic in SQL over the same
    // (shard, md5, id) global order.
    "q206_apportioned_split" -> {
      val shard = TextOps.portableHashSql(
        "(concat('apps:r11:', CAST(doc_id AS VARCHAR)))") + " % 8"
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w(name, wt, ord) AS (VALUES ('train', 80, 0), ('val', 10, 1),
         |  ('test', 10, 2)),
         |b AS (SELECT name, ord, (nn.n * wt) // 100 AS base,
         |  (nn.n * wt) % 100 AS rem FROM w, nn),
         |lv AS (SELECT (SELECT n FROM nn) - sum(base) AS leftover FROM b),
         |a AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, ord) AS rr
         |  FROM b),
         |t AS (SELECT name, ord, base + CASE WHEN rr <=
         |  (SELECT leftover FROM lv) THEN 1 ELSE 0 END AS target FROM a),
         |c AS (SELECT name, ord, sum(target) OVER (ORDER BY ord) AS hi,
         |  sum(target) OVER (ORDER BY ord) - target AS lo FROM t),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY shard, ok, doc_id)
         |    - 1 AS rk FROM
         |  (SELECT doc_id, $shard AS shard,
         |     md5(concat('appo:r11:', CAST(doc_id AS VARCHAR))) AS ok
         |   FROM documents))
         |SELECT r.doc_id, c.name AS split FROM r
         |JOIN c ON r.rk >= c.lo AND r.rk < c.hi
         |ORDER BY r.doc_id""".stripMargin
    },

    // same floor + salted-hash fractional copy arithmetic.
    "q207_epoch_upsample" -> {
      val h = TextOps.portableHashSql(
        "(concat('epoch:r11:', CAST(doc_id AS VARCHAR)))")
      s"""WITH e AS (SELECT doc_id,
         |  CASE WHEN lang = 'en' THEN 2500000
         |       WHEN lang = 'zh' THEN 1000000 ELSE 500000 END AS ppm
         |  FROM documents),
         |c AS (SELECT doc_id, ppm // 1000000 +
         |  CASE WHEN ($h) % 1000000 < ppm % 1000000 THEN 1 ELSE 0 END
         |  AS copies FROM e)
         |SELECT doc_id, CAST(unnest(range(copies)) AS BIGINT) AS copy_n
         |FROM c WHERE copies > 0 ORDER BY doc_id, copy_n""".stripMargin
    },

    // one global cumsum over the same salted (shard, hash, id) order —
    // must equal the engine's two-phase shard-offset prefix sum exactly.
    "q194_pps_sample" -> {
      val shard = TextOps.portableHashSql(
        "(concat('pps:r11:', CAST(doc_id AS VARCHAR)))") + " % 8"
      val ok = TextOps.portableHashSql(
        "(concat('ppso:r11:', CAST(doc_id AS VARCHAR)))")
      s"""WITH b AS (SELECT doc_id, n_chars AS w, $shard AS shard, $ok AS ok
         |  FROM documents WHERE n_chars > 0),
         |c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY shard, ok, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS aft FROM b),
         |t AS (SELECT sum(w) AS total FROM b),
         |p AS (SELECT doc_id, w, CAST(aft - w AS BIGINT) AS pos,
         |  CAST((aft // (total // 37)) - ((aft - w) // (total // 37)) AS BIGINT)
         |    AS n_hits
         |  FROM c, t)
         |SELECT doc_id, w AS n_chars, pos, n_hits FROM p
         |WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
    },

    // mirrors Eval.rougeN: same token hashes, same multiset bigram
    // combine, clipped min-count overlap, same fixed-shape quotients.
    "q193_rouge_overlap" -> {
      val h = graft.text.TextOps.portableHashSql("x")
      s"""WITH base AS (SELECT doc_id, text,
         |    lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS ref
         |  FROM documents),
         |p AS (SELECT doc_id AS pair_id, text AS cand, ref FROM base
         |  WHERE ref IS NOT NULL),
         |g AS (SELECT pair_id,
         |  ${TextOps.ngramHashesSql(
             s"list_transform(${toksSql("cand")}, x -> $h)", 2)} AS cgl,
         |  ${TextOps.ngramHashesSql(
             s"list_transform(${toksSql("ref")}, x -> $h)", 2)} AS rgl
         |  FROM p),
         |cc AS (SELECT pair_id, gg, count(*) AS c_c FROM
         |  (SELECT pair_id, unnest(cgl) AS gg FROM g) GROUP BY 1, 2),
         |rc AS (SELECT pair_id, gg, count(*) AS c_r FROM
         |  (SELECT pair_id, unnest(rgl) AS gg FROM g) GROUP BY 1, 2),
         |ov AS (SELECT pair_id, CAST(sum(least(c_c, c_r)) AS BIGINT) AS overlap
         |  FROM cc JOIN rc USING (pair_id, gg) GROUP BY 1),
         |sz AS (SELECT pair_id, CAST(len(cgl) AS BIGINT) AS n_cand,
         |  CAST(len(rgl) AS BIGINT) AS n_ref FROM g)
         |SELECT sz.pair_id, n_cand, n_ref,
         |  coalesce(overlap, 0) AS overlap,
         |  CASE WHEN n_ref = 0 THEN 0.0 ELSE
         |    coalesce(overlap, 0)::DOUBLE / n_ref::DOUBLE END AS rouge_recall,
         |  CASE WHEN n_cand = 0 THEN 0.0 ELSE
         |    coalesce(overlap, 0)::DOUBLE / n_cand::DOUBLE END AS rouge_precision,
         |  CASE WHEN n_cand + n_ref = 0 THEN 0.0 ELSE
         |    coalesce(overlap, 0)::DOUBLE * 2.0 / (n_cand + n_ref)::DOUBLE END AS rouge_f1
         |FROM sz LEFT JOIN ov USING (pair_id)
         |ORDER BY pair_id""".stripMargin
    },

    "q192_url_normalize" -> {
      val id = "CAST(doc_id AS VARCHAR)"
      val url = "concat(" +
        "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END, " +
        "source, " +
        "CASE WHEN doc_id % 3 = 0 THEN '.CO.UK' ELSE '.Example.COM' END, " +
        "CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8080' END, " +
        s"'/Path/', $id, '?utm_source=news&Id=', $id, " +
        "CASE WHEN doc_id % 5 = 0 THEN '&ref=tw&q=1' ELSE '&utm_campaign=x' END, " +
        "'#Frag')"
      s"""WITH u AS (SELECT doc_id, $url AS url FROM documents)
         |SELECT doc_id, ${Curation.urlNormalizeSql("url")} AS url_norm,
         |  ${Curation.registeredDomainSql("url")} AS domain
         |FROM u ORDER BY doc_id""".stripMargin
    },

    "q166_bpe_train" -> bpeTrainOracle(12),

    "q121_neardup_clusters" ->
      s"""$closureCtes
         |SELECT v AS doc_id, min(r) AS cluster_id, min(r) <> v AS is_dup
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,

    // the packer's greedy scan as a recursive one-row-per-step CTE.
    "q122_seq_packing" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |base AS (SELECT
         |  ${TextOps.portableHashSql("(concat('pack:', CAST(doc_id AS VARCHAR)))")} % $packShards AS shard,
         |  doc_id, len(t) AS n FROM toks),
         |b2 AS (SELECT shard, doc_id, n,
         |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM base),
         |pack(shard, rn, doc_id, n, seq, off) AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM b2 WHERE rn = 1
         |  UNION ALL
         |  SELECT b.shard, b.rn, b.doc_id, b.n,
         |    CAST(CASE WHEN p.off + p.n + b.n > $packBudget THEN p.seq + 1 ELSE p.seq END AS BIGINT),
         |    CAST(CASE WHEN p.off + p.n + b.n > $packBudget THEN 0 ELSE p.off + p.n END AS BIGINT)
         |  FROM pack p JOIN b2 b ON b.shard = p.shard AND b.rn = p.rn + 1)
         |SELECT shard, doc_id, n AS n_tokens, seq AS seq_id, off AS tok_offset
         |FROM pack ORDER BY shard, doc_id""".stripMargin,

    "q123_pii_scrub" ->
      s"""WITH p AS (SELECT doc_id, concat(text,
         |  CASE WHEN doc_id % 3 = 1 THEN concat(' mail u', CAST(doc_id AS VARCHAR), '@ex-', CAST(doc_id % 7 AS VARCHAR), '.org') ELSE '' END,
         |  CASE WHEN doc_id % 3 = 2 THEN concat(' from 10.', CAST(doc_id % 200 AS VARCHAR), '.3.', CAST(doc_id % 250 AS VARCHAR)) ELSE '' END,
         |  CASE WHEN doc_id % 5 = 0 THEN concat(' call +1 555-01', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) ELSE '' END) AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '${Curation.emailPattern}')) AS n_emails,
         |  len(regexp_extract_all(t, '${Curation.ipv4Pattern}')) AS n_ips,
         |  len(regexp_extract_all(t, '${Curation.phonePattern}')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${Curation.emailPattern}', '<EMAIL>', 'g'),
         |    '${Curation.ipv4Pattern}', '<IP>', 'g'),
         |    '${Curation.phonePattern}', '<PHONE>', 'g')) AS redacted_md5
         |FROM p ORDER BY doc_id""".stripMargin,

    "q124_train_shuffle" ->
      s"""WITH s AS (SELECT doc_id,
         |  ${TextOps.portableHashSql(s"(concat('shard:$shuffleSeed:', CAST(doc_id AS VARCHAR)))")} % $shuffleShards AS shard,
         |  md5(concat('$shuffleSeed:', CAST(doc_id AS VARCHAR))) AS k
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) - 1 AS pos
         |FROM s ORDER BY doc_id""".stripMargin,

    // q62's quality formula verbatim, ranked per source
    "q125_domain_caps" ->
      s"""WITH toks AS (SELECT doc_id, source, text, ${toksSql("text")} AS t FROM documents),
         |scored AS (SELECT doc_id, source, $qualitySql AS q FROM toks),
         |ranked AS (SELECT doc_id, source, q,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS BIGINT) AS q_rank
         |  FROM scored)
         |SELECT doc_id, source, q_rank FROM ranked
         |WHERE q_rank <= $domainCap ORDER BY doc_id""".stripMargin,

    // q121's recursive closure, then the hash split of the cluster id
    "q126_leakage_safe_split" ->
      s"""$closureCtes,
         |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |b AS (SELECT doc_id, cluster_id,
         |  ${TextOps.portableHashSql("(concat('split:', CAST(cluster_id AS VARCHAR)))")} % 10 AS bkt
         |  FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bkt <= 7 THEN 'train' WHEN bkt = 8 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "q127_corpus_mixing" -> {
      val budgetSql = mixBudgets.foldRight(mixDefaultBudget.toString) {
        case ((l, b), acc) => s"CASE WHEN lang = '$l' THEN $b ELSE $acc END"
      }
      s"""WITH toks AS (SELECT doc_id, lang, ${toksSql("text")} AS t FROM documents),
         |base AS (SELECT doc_id, lang, len(t) AS n FROM toks),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM base GROUP BY lang),
         |r AS (SELECT lang, tot,
         |  CAST(floor(least(1.0, ($budgetSql) / CAST(tot AS DOUBLE)) * 1000000.0) AS BIGINT) AS rate_ppm
         |  FROM tot),
         |kept AS (SELECT b.lang, b.n, r.rate_ppm FROM base b JOIN r USING (lang)
         |  WHERE ${TextOps.portableHashSql("(concat('mix:', CAST(doc_id AS VARCHAR)))")} % 1000000 < r.rate_ppm)
         |SELECT lang, count(*) AS n_kept, CAST(sum(n) AS BIGINT) AS tokens_kept,
         |  any_value(rate_ppm) AS rate_ppm
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Mirrors Curation.spanDedup exactly: same chunking (1-based slice,
    // short last chunk), same md5 frequency key, same single-space
    // rebuild in chunk order.
    "q129_span_dedup" -> {
      val w = spanDedupTokens
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |chunks AS (SELECT doc_id, c.i AS chunk_i,
         |    array_to_string(t[(c.i*$w+1):((c.i+1)*$w)], ' ') AS span
         |  FROM toks, LATERAL (SELECT unnest(range((len(t)+${w - 1})//$w)) AS i) c),
         |freq AS (SELECT md5(span) AS h FROM chunks
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= $spanDedupMinDf),
         |marked AS (SELECT ch.doc_id, ch.chunk_i, ch.span,
         |    (f.h IS NOT NULL) AS dup
         |  FROM chunks ch LEFT JOIN freq f ON md5(ch.span) = f.h),
         |agg AS (SELECT doc_id, count(*) AS n_spans,
         |    count(*) FILTER (dup) AS n_dropped,
         |    coalesce(string_agg(span, ' ' ORDER BY chunk_i) FILTER (NOT dup), '') AS clean_text
         |  FROM marked GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  coalesce(a.n_spans, 0) AS n_spans, coalesce(a.n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "q130_vocab_oov" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
         |vocab AS (SELECT token FROM cnt ORDER BY n DESC, token ASC LIMIT $vocabK),
         |per AS (SELECT doc_id, count(*) AS n_tokens,
         |    count(*) FILTER (token NOT IN (SELECT token FROM vocab)) AS n_oov
         |  FROM tok GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
         |  coalesce(p.n_oov, 0) AS n_oov,
         |  CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
         |    ELSE p.n_oov::DOUBLE / p.n_tokens::DOUBLE END AS oov_rate
         |FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Mirrors Curation.chunkDocuments: same chunk-count formula
    // (integer-floor division), same 1-based inclusive slices, same
    // single-space rebuild.
    "q132_doc_chunking" -> {
      val (ch, ov) = (chunkTokens, chunkOverlap)
      val st = ch - ov
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |par AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         |k AS (SELECT doc_id, t, n,
         |    greatest(1, (n - $ov + ${st - 1}) // $st) AS nc FROM par),
         |ch AS (SELECT doc_id, c.i AS chunk_i, (c.i*$st) AS tok_start,
         |    least(n - c.i*$st, $ch) AS n_chunk_tokens,
         |    array_to_string(t[(c.i*$st+1):(c.i*$st + least(n - c.i*$st, $ch))], ' ') AS chunk_text
         |  FROM k, LATERAL (SELECT unnest(range(nc)) AS i) c)
         |SELECT doc_id, chunk_i, tok_start, n_chunk_tokens, chunk_text
         |FROM ch ORDER BY doc_id, chunk_i""".stripMargin
    },

    // Mirrors Curation.exactKPerStratum: md5 of the salted id string,
    // rank within stratum, keep k.
    "q133_eval_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5(concat('evalk:r9:', CAST(doc_id AS VARCHAR))), doc_id)
         |      AS sample_rank
         |  FROM documents)
         |SELECT doc_id, lang, sample_rank FROM r
         |WHERE sample_rank <= $evalK ORDER BY doc_id""".stripMargin,

    // Mirrors CorpusOps.bigramLmScore: add-one smoothing, prefix counts
    // derived from the bigram counts, ratio-of-integers probabilities
    // (no transcendentals — cross-engine bit-exact), Det-decimal mean.
    "q131_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |train AS (SELECT * FROM toks WHERE doc_id % 10 <> 0),
         |sco AS (SELECT * FROM toks WHERE doc_id % 10 = 0),
         |tb AS (SELECT doc_id, t[b.i+1] AS w1, t[b.i+2] AS w2
         |  FROM train, LATERAL (SELECT unnest(range(len(t)-1)) AS i) b),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tb GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |v AS (SELECT count(DISTINCT token) AS v
         |  FROM (SELECT unnest(t) AS token FROM train)),
         |sb AS (SELECT doc_id, t[b.i+1] AS w1, t[b.i+2] AS w2
         |  FROM sco, LATERAL (SELECT unnest(range(len(t)-1)) AS i) b),
         |p AS (SELECT sb.doc_id,
         |    (coalesce(c2.c2, 0) + 1)::DOUBLE / (coalesce(c1.c1, 0) + v.v)::DOUBLE AS p
         |  FROM sb LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v),
         |agg AS (SELECT doc_id, count(*) AS n_bigrams,
         |    ${graft.functions.Det.dsumSql("p", 12)} / count(*) AS mean_p
         |  FROM p GROUP BY doc_id)
         |SELECT s.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
         |  coalesce(a.mean_p, 0.0) AS mean_p
         |FROM sco s LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // The sketch-then-verify output is bit-identical to the plain exact
    // groupBy with the derived threshold — that equivalence IS the
    // operator's contract, so the oracle is the full aggregate.
    "q140_heavy_hitters" ->
      s"""WITH toks AS (SELECT ${toksSql("text")} AS t FROM documents),
         |tok AS (SELECT unnest(t) AS token FROM toks),
         |tot AS (SELECT count(*) AS nn FROM tok)
         |SELECT token, count(*) AS n FROM tok GROUP BY token
         |HAVING count(*) >= (SELECT greatest(1, nn // $hhPhiInverse) FROM tot)
         |ORDER BY token""".stripMargin,

    // Mirrors Curation.sqrtTemperatureSample: the guarded-⌊√x⌋ target,
    // the salted md5 rank of q133's pattern.
    "q141_sqrt_temp_sample" -> {
      val m = sqrtMixMultiplier
      s"""WITH t AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         |s0 AS (SELECT lang, n_docs, n_docs * $m AS x,
         |    CAST(floor(sqrt(CAST(n_docs * $m AS DOUBLE))) AS BIGINT) AS s0 FROM t),
         |s1 AS (SELECT lang, n_docs, x,
         |    CASE WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS s1 FROM s0),
         |k AS (SELECT lang, n_docs, least(n_docs,
         |    CASE WHEN (s1+1)*(s1+1) <= x THEN s1 + 1 ELSE s1 END) AS k_target FROM s1),
         |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY md5(concat('sqrtmix:r10:', CAST(doc_id AS VARCHAR))), doc_id)
         |    AS sample_rank FROM documents)
         |SELECT r.doc_id, r.lang, k.n_docs, k.k_target, r.sample_rank
         |FROM r JOIN k USING (lang) WHERE sample_rank <= k_target
         |ORDER BY doc_id""".stripMargin
    },

    // Mirrors Curation.dupSubstringSpans: sliding width-token windows,
    // distinct-doc frequency, gaps-and-islands merge (starts are unique
    // per doc so the running sum's frame is unambiguous).
    "q142_substring_dup" -> {
      val (w, d) = (dupSpanWidth, dupSpanMinDf)
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |par AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= $w),
         |win AS (SELECT doc_id, i AS s, array_to_string(t[(i+1):(i+$w)], ' ') AS span
         |  FROM par, LATERAL (SELECT unnest(range(n - $w + 1)) AS i)),
         |dup AS (SELECT span FROM win GROUP BY span
         |  HAVING count(DISTINCT doc_id) >= $d),
         |fl AS (SELECT doc_id, s FROM win WHERE span IN (SELECT span FROM dup)),
         |m AS (SELECT doc_id, s, max(s + $w) OVER (PARTITION BY doc_id ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM fl),
         |isl AS (SELECT doc_id, s, sum(CASE WHEN pe IS NULL OR s > pe
         |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s
         |    ROWS UNBOUNDED PRECEDING) AS g FROM m),
         |sp AS (SELECT doc_id, g, min(s) AS span_start,
         |    max(s) + $w - min(s) AS span_len, count(*) AS n_windows
         |  FROM isl GROUP BY doc_id, g)
         |SELECT doc_id, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY span_start) AS span_i,
         |  span_start, span_len, n_windows
         |FROM sp ORDER BY doc_id, span_i""".stripMargin
    },

    // q142's window/island mirror with the flag condition swapped to
    // "window content present in the held-out split".
    "q143_contamination_spans" -> {
      val w = dupSpanWidth
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |par AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= $w),
         |win AS (SELECT doc_id, i AS s, array_to_string(t[(i+1):(i+$w)], ' ') AS span
         |  FROM par, LATERAL (SELECT unnest(range(n - $w + 1)) AS i)),
         |winT AS (SELECT * FROM win WHERE doc_id % 10 <> 0),
         |winE AS (SELECT DISTINCT span FROM win WHERE doc_id % 10 = 0),
         |fl AS (SELECT doc_id, s FROM winT
         |  WHERE span IN (SELECT span FROM winE)),
         |m AS (SELECT doc_id, s, max(s + $w) OVER (PARTITION BY doc_id ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM fl),
         |isl AS (SELECT doc_id, s, sum(CASE WHEN pe IS NULL OR s > pe
         |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s
         |    ROWS UNBOUNDED PRECEDING) AS g FROM m),
         |sp AS (SELECT doc_id, g, min(s) AS span_start,
         |    max(s) + $w - min(s) AS span_len, count(*) AS n_windows
         |  FROM isl GROUP BY doc_id, g)
         |SELECT doc_id, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY span_start) AS span_i,
         |  span_start, span_len, n_windows
         |FROM sp ORDER BY doc_id, span_i""".stripMargin
    },

    // Mirrors CorpusOps.tfIdfKeywords: df derived from the (id, token)
    // tf relation, integer-floor score, token-ascending tie-break.
    "q144_tfidf_keywords" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         |    (tf.tf * 1000000000000) // dfq.df AS score
         |  FROM tf JOIN dfq USING (token)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, token ASC) AS kw_rank FROM sc)
         |SELECT doc_id, kw_rank, token, tf, df, score FROM r
         |WHERE kw_rank <= $keywordK ORDER BY doc_id, kw_rank""".stripMargin,

    // Mirrors Curation.percentileThresholdFilter: q62's bit-identical
    // quality expression, quantile_cont cut (== Spark's exact
    // percentile bit-for-bit — the q53-proven pairing), >= keep.
    "q153_quality_cut" ->
      s"""WITH toks AS (SELECT doc_id, lang, text, ${toksSql("text")} AS t FROM documents),
         |sc AS (SELECT doc_id, lang, $qualitySql AS q FROM toks),
         |t AS (SELECT lang, quantile_cont(q, 0.6) AS threshold
         |  FROM sc GROUP BY 1)
         |SELECT sc.doc_id, sc.lang, sc.q, t.threshold
         |FROM sc JOIN t USING (lang) WHERE sc.q >= t.threshold
         |ORDER BY doc_id""".stripMargin,

    // q121's recursive closure + q62's quality expression; the keeper
    // window (q DESC, doc_id ASC) mirrors max_by's injective
    // (q, -id) arg-max exactly.
    "q156_cluster_canonical" ->
      s"""$closureCtes,
         |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |tq AS (SELECT doc_id, text, ${toksSql("text")} AS t FROM documents),
         |sc AS (SELECT doc_id, $qualitySql AS q FROM tq),
         |m AS (SELECT cl.doc_id, cl.cluster_id, sc.q
         |  FROM cl JOIN sc USING (doc_id)),
         |r1 AS (SELECT doc_id, cluster_id, q,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY q DESC, doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY cluster_id) AS nm FROM m),
         |k AS (SELECT cluster_id, doc_id AS keeper_id FROM r1 WHERE rn = 1)
         |SELECT r1.doc_id, r1.cluster_id, k.keeper_id,
         |  r1.doc_id = k.keeper_id AS is_keeper,
         |  CAST(r1.nm AS BIGINT) AS n_members
         |FROM r1 JOIN k USING (cluster_id) ORDER BY doc_id""".stripMargin,

    // Mirrors CorpusOps.bm25TopK: identical fixed-association double
    // expression over integer-valued stats (exact below 2^53), rational
    // idf (N-df+1)/(df+1), 10L-cleared saturation, doc-id tie-break.
    "q157_bm25" -> {
      val tfSelects = bm25Terms.map(t =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$t")
      val dfSelects = bm25Terms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_tf_$t")
      val termSql = bm25Terms.map { t =>
        s"((CAST(n_docs AS DOUBLE) - CAST(df_tf_$t AS DOUBLE) + 1.0) / " +
          s"(CAST(df_tf_$t AS DOUBLE) + 1.0)) * " +
          s"((22.0 * CAST(tf_$t AS DOUBLE) * CAST(total_len AS DOUBLE)) / " +
          s"(10.0 * CAST(tf_$t AS DOUBLE) * CAST(total_len AS DOUBLE) + " +
          s"3.0 * CAST(total_len AS DOUBLE) + " +
          s"9.0 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)))"
      }.mkString(" + ")
      val tfCols = bm25Terms.map(t => s"tf_$t").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         |  ${tfSelects.mkString(",\n  ")} FROM toks),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dl) AS BIGINT) AS total_len,
         |  ${dfSelects.mkString(",\n  ")} FROM base),
         |scored AS (SELECT doc_id, dl, $tfCols,
         |  $termSql AS score FROM base, stats)
         |SELECT doc_id, dl, $tfCols, score FROM scored
         |WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
    },

    // Mirrors CorpusOps.hashedLinearScore: same portable unigram hashes,
    // same polynomial bigram combine, same stand-in weight table — the
    // int64 sum is exact so keep is bit-reproducible.
    "q158_quality_classifier" -> {
      val P = graft.text.TextOps.P
      val B = graft.text.TextOps.B
      val halfP = P / 2
      val M = classifierBuckets
      val A = 2654435761L
      val C = 12345L
      def w(h: String) = s"(($h % $M) * $A + $C) % $P - $halfP"
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${graft.text.TextOps.portableHashSql("x")}) AS hs FROM toks),
         |s AS (SELECT doc_id,
         |  CAST(len(hs) + greatest(len(hs) - 1, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(list_sum(list_transform(hs, h -> ${w("h")})), 0)
         |   + CASE WHEN len(hs) < 2 THEN 0
         |     ELSE coalesce(list_sum(list_transform(range(1, len(hs)),
         |       i -> ${w(s"((hs[i] * $B + hs[i+1]) % $P)")})), 0) END
         |   AS BIGINT) AS score
         |  FROM hs)
         |SELECT doc_id, n_feats, score, score >= 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // DuckDB's nfc_normalize implements the same Unicode-specified
    // composition; the post-NFC portable hash proves byte-identity.
    // chr(769) = U+0301 combining acute, chr(233) = precomposed é.
    "q161_nfc_normalize" ->
      s"""WITH r AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769)
         |         ELSE ' caf' || chr(233) END AS raw FROM documents),
         |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM r)
         |SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
         |  CAST(length(nfc) AS BIGINT) AS n_nfc,
         |  raw <> nfc AS changed,
         |  ${graft.text.TextOps.portableHashSql("nfc")} AS h
         |FROM n ORDER BY doc_id""".stripMargin,

    // Mirrors CorpusOps.sourceDrift: same top-K vocab (count desc,
    // token asc), zeros materialized via the source×vocab grid, all
    // int64 (DuckDB's HUGEINT sums cast back); // is floor-div on the
    // positive domain, matching Spark's `div`.
    "q163_source_drift" ->
      s"""WITH toks AS (SELECT source, unnest(${toksSql("text")}) AS t FROM documents),
         |st AS (SELECT source, t, count(*) AS o FROM toks GROUP BY 1, 2),
         |gc AS (SELECT t, sum(o) AS c FROM st GROUP BY 1),
         |vocab AS (SELECT t, c FROM gc ORDER BY c DESC, t LIMIT $vocabK),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
         |grid AS (SELECT s.source, v.t, CAST(v.c AS BIGINT) AS c
         |  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN vocab v),
         |j AS (SELECT g.source, g.c, CAST(coalesce(st.o, 0) AS BIGINT) AS o
         |  FROM grid g LEFT JOIN st ON g.source = st.source AND g.t = st.t),
         |rs AS (SELECT source, CAST(sum(o) AS BIGINT) AS r_vocab
         |  FROM j GROUP BY 1),
         |d AS (SELECT j.source, max(rs.r_vocab) AS r_vocab,
         |    CAST(sum(abs(j.o * nn.n - rs.r_vocab * j.c)) AS BIGINT)
         |      AS drift_num
         |  FROM j JOIN rs USING (source) CROSS JOIN nn GROUP BY 1)
         |SELECT d.source, nn.n AS n_vocab_instances, d.r_vocab,
         |  d.drift_num,
         |  CASE WHEN d.r_vocab > 0
         |    THEN (d.drift_num * 1000000) // (2 * nn.n * d.r_vocab) END
         |    AS tv_millionths
         |FROM d CROSS JOIN nn ORDER BY source""".stripMargin,

    // the oracle states the exact top-20 and the guarantees as literal
    // 1s (q54's rank-bound pattern — sketch values themselves have no
    // SQL mirror).
    "q167_count_min" ->
      s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS exact_count FROM toks
         |  GROUP BY 1 ORDER BY exact_count DESC, tok LIMIT 20)
         |SELECT tok, exact_count, CAST(1 AS BIGINT) AS ok_lower,
         |  CAST(1 AS BIGINT) AS ok_upper
         |FROM c ORDER BY tok""".stripMargin,

    "q168_hll_distinct" ->
      """SELECT source, count(DISTINCT doc_id) AS n_exact,
        |  CAST(1 AS BIGINT) AS ok_bound, CAST(1 AS BIGINT) AS ok_union
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    // same record construction, same blocked pairs (the length
    // prefilter is implied by lev ≤ 2, so the oracle omits it), and the
    // q121-style recursive min-reachability closure
    "q179_entity_resolution" ->
      """WITH RECURSIVE base AS (SELECT doc_id AS id,
        |    lower(substring(text, 1, 24)) AS s FROM documents),
        |recs AS (SELECT id, s FROM base
        |  UNION ALL
        |  SELECT id + 500000000,
        |    concat(substring(s, 1, 9), 'q', substring(s, 11))
        |  FROM base WHERE id % 3 = 0),
        |blk AS (SELECT id, s, substring(s, 1, 4) AS b FROM recs),
        |pairs AS (SELECT a.id AS id_1, b.id AS id_2
        |  FROM blk a JOIN blk b ON a.b = b.b AND a.id < b.id
        |  WHERE levenshtein(a.s, b.s) <= 2),
        |sym AS (SELECT id_1 AS a, id_2 AS bb FROM pairs
        |  UNION ALL SELECT id_2, id_1 FROM pairs),
        |reach(v, r) AS (SELECT id, id FROM recs
        |  UNION SELECT reach.v, sym.bb FROM reach JOIN sym ON reach.r = sym.a),
        |ent AS (SELECT v AS id, min(r) AS entity_id FROM reach GROUP BY v),
        |sz AS (SELECT entity_id, count(*) AS n_members FROM ent GROUP BY 1)
        |SELECT ent.id, ent.entity_id, sz.n_members,
        |  ent.id = ent.entity_id AS is_canonical
        |FROM ent JOIN sz USING (entity_id) ORDER BY ent.id""".stripMargin,

    // the same D² rational in HUGEINT (DuckDB's int128 ≈ decimal(38)),
    // one double division — identical IEEE result.
    "q223_chi2_drift" ->
      """WITH a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_a
        |  FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
        |  GROUP BY 1),
        |b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_b
        |  FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL
        |  GROUP BY 1),
        |j AS (SELECT coalesce(a.lang, b.lang) AS lang,
        |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM a FULL OUTER JOIN b ON a.lang = b.lang),
        |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
        |SELECT lang, n_a, n_b,
        |  ((n_a::HUGEINT * tb::HUGEINT - n_b::HUGEINT * ta::HUGEINT)
        |    * (n_a::HUGEINT * tb::HUGEINT - n_b::HUGEINT * ta::HUGEINT)
        |  )::DOUBLE
        |  / (ta::HUGEINT * tb::HUGEINT * (n_a + n_b)::HUGEINT)::DOUBLE
        |  AS contrib
        |FROM j, t ORDER BY lang""".stripMargin,

    // exhaustive quadratic brute force — the lossless contract the
    // segment-pigeonhole candidates must reproduce exactly.
    "q215_edjoin" ->
      """WITH base AS (SELECT doc_id AS id,
        |    lower(substring(text, 1, 24)) AS s FROM documents),
        |recs AS (SELECT id, s FROM base
        |  UNION ALL
        |  SELECT id + 500000000,
        |    concat(substring(s, 1, 9), 'q', substring(s, 11))
        |  FROM base WHERE id % 3 = 0)
        |SELECT a.id AS id_1, b.id AS id_2,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM recs a JOIN recs b
        |  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2 ORDER BY 1, 2""".stripMargin,

    "q185_auc_exact" ->
      """WITH s AS (SELECT n_chars AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |g AS (SELECT sc, CAST(sum(y) AS BIGINT) AS p,
        |    CAST(sum(1 - y) AS BIGINT) AS n FROM s GROUP BY 1),
        |c AS (SELECT p, n, CAST(coalesce(sum(n) OVER (ORDER BY sc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS nb FROM g)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(n) AS BIGINT) AS n_neg,
        |  CAST(sum(p * nb) * 2 + sum(p * n) AS BIGINT) AS auc_num2,
        |  CAST(sum(p) * sum(n) * 2 AS BIGINT) AS auc_den2,
        |  CASE WHEN sum(p) * sum(n) > 0 THEN
        |    CAST(sum(p * nb) * 2 + sum(p * n) AS BIGINT)::DOUBLE /
        |      CAST(sum(p) * sum(n) * 2 AS BIGINT)::DOUBLE END AS auc
        |FROM c""".stripMargin,

    "q186_confusion" ->
      """WITH s AS (SELECT n_chars AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN sc >= 150 THEN y ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN sc >= 150 THEN 1 - y ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN sc < 150 THEN y ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN sc < 150 THEN 1 - y ELSE 0 END) AS BIGINT) AS tn
        |  FROM s)
        |SELECT tp, fp, fn, tn,
        |  tp::DOUBLE / (tp + fp)::DOUBLE AS precision,
        |  tp::DOUBLE / (tp + fn)::DOUBLE AS recall,
        |  tp::DOUBLE * 2.0 / (tp * 2 + fp + fn)::DOUBLE AS f1
        |FROM a""".stripMargin,

    "q184_collocations" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |tb AS (SELECT t[b.i+1] AS w1, t[b.i+2] AS w2
         |  FROM toks, LATERAL (SELECT unnest(range(len(t)-1)) AS i) b),
         |bg AS (SELECT w1, w2, count(*) AS c_xy FROM tb GROUP BY 1, 2
         |  HAVING count(*) >= 3),
         |uni AS (SELECT unnest(t) AS w FROM toks),
         |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
         |n AS (SELECT count(*) AS nn FROM uni)
         |SELECT bg.w1, bg.w2, bg.c_xy, x.c AS c_x, y.c AS c_y,
         |  CAST(bg.c_xy * n.nn * 1000000 // (x.c * y.c) AS BIGINT) AS score
         |FROM bg JOIN uc x ON bg.w1 = x.w JOIN uc y ON bg.w2 = y.w
         |  CROSS JOIN n
         |ORDER BY score DESC, bg.w1, bg.w2 LIMIT 20""".stripMargin,

    "q180_html_to_text" ->
      s"""WITH h AS (SELECT doc_id, concat(
         |  '<html><head><script type="text/x">var a = 1 < 2;</script>',
         |  '<style>.x{color:red}</style></head><body><!-- doc ',
         |  CAST(doc_id AS VARCHAR), ' --><h1>', source,
         |  '</h1><p class="m">', text,
         |  '</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s',
         |  '&nbsp;end</div></body></html>') AS html FROM documents),
         |t AS (SELECT doc_id, ${Curation.htmlToTextSql("html")} AS tt
         |  FROM h)
         |SELECT doc_id, length(tt) AS n_chars, md5(tt) AS t_md5,
         |  substring(tt, 1, 32) AS head
         |FROM t ORDER BY doc_id""".stripMargin,

    // q132's chunking CTE (overlap 0, width 16) + md5-keyed keeper
    // (row_number over (doc_id, chunk_i) ≡ the engine's min-struct) +
    // ordered string_agg reassembly.
    "q225_chunk_dedup" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 300000000,
         |    array_to_string((${toksSql("text")})[1:32], ' ')
         |  FROM documents WHERE doc_id % 5 = 0),
         |toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM base),
         |par AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         |k AS (SELECT doc_id, t, n, greatest(1, (n + 15) // 16) AS nc
         |  FROM par),
         |ch AS (SELECT doc_id, c.i AS chunk_i,
         |    least(n - c.i*16, 16) AS n_chunk_tokens,
         |    array_to_string(t[(c.i*16+1):(c.i*16 + least(n - c.i*16, 16))],
         |      ' ') AS chunk_text
         |  FROM k, LATERAL (SELECT unnest(range(nc)) AS i) c),
         |keyed AS (SELECT *, md5(chunk_text) AS kk FROM ch),
         |dec AS (SELECT *, row_number() OVER (PARTITION BY kk
         |    ORDER BY doc_id, chunk_i) = 1 AS keep FROM keyed)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN keep THEN chunk_text END, ' '
         |    ORDER BY chunk_i), '') AS kept_text,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dropped,
         |  CAST(sum(CASE WHEN keep THEN n_chunk_tokens ELSE 0 END)
         |    AS BIGINT) AS n_kept_tokens
         |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the identical winnowing selection over portable-hash 3-grams:
    // per-window list_min, distinct values, small-doc single-min case.
    "q226_winnow_fingerprints" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t,
         |    x -> ${TextOps.portableHashSql("x")}) AS hs FROM toks),
         |g AS (SELECT doc_id, ${TextOps.ngramHashesSql("hs", 3)} AS g
         |  FROM hs),
         |f AS (SELECT doc_id, CASE
         |    WHEN len(g) >= 4 THEN list_distinct(list_transform(
         |      range(1, len(g) - 4 + 2), i -> list_min(g[i:i+3])))
         |    WHEN len(g) > 0 THEN [list_min(g)]
         |    ELSE []::BIGINT[] END AS fps FROM g)
         |SELECT doc_id, unnest(fps) AS fp FROM f
         |ORDER BY doc_id, fp""".stripMargin,

    // per-bin exact integers + IEEE quotients + the exact ECE numerator
    // |1000·Σy − Σa| per bin; empty bins ride the grid join as zeros.
    "q227_calibration_bins" ->
      """WITH s AS (SELECT least(n_chars, 1000) AS a,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE lang IS NOT NULL),
        |agg AS (SELECT least(a // 100, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(a) AS BIGINT) AS sum_a
        |  FROM s GROUP BY 1),
        |grid AS (SELECT unnest(range(10)) AS bin)
        |SELECT g.bin, coalesce(n, 0) AS n, coalesce(sum_y, 0) AS sum_y,
        |  coalesce(sum_a, 0) AS sum_a,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN sum_y::DOUBLE / n::DOUBLE END AS acc,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN sum_a::DOUBLE / (n * 1000)::DOUBLE END AS conf,
        |  abs(coalesce(sum_y, 0) * 1000 - coalesce(sum_a, 0)) AS gap_num
        |FROM grid g LEFT JOIN agg USING (bin) ORDER BY bin""".stripMargin,

    // Σ(a − 1000y)² exactly, one IEEE division.
    "q228_brier" ->
      """WITH s AS (SELECT least(n_chars, 1000) AS a,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE lang IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum((a - 1000*y)*(a - 1000*y)), 0) AS BIGINT)
        |    AS brier_num,
        |  CASE WHEN count(*) > 0 THEN
        |    sum((a - 1000*y)*(a - 1000*y))::DOUBLE
        |      / (count(*) * 1000000)::DOUBLE END AS brier
        |FROM s""".stripMargin,

    // q226's winnowing CTE + posting-list cap + the capped self-join.
    "q229_winnow_candidates" ->
      s"""WITH $winnowCtes
         |SELECT id_1, id_2, n_shared FROM wcand
         |ORDER BY id_1, id_2""".stripMargin,

    // winnow candidates + the double-form Jaccard confirm + the same
    // recursive min-label closure as q121's oracle.
    "q238_winnow_dedup" ->
      s"""WITH RECURSIVE $winnowCtes,
         |$winnowConfCtes,
         |sym AS (SELECT id_1 AS a, id_2 AS b FROM wconf
         |  UNION ALL SELECT id_2, id_1 FROM wconf),
         |reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a)
         |SELECT v AS doc_id, min(r) AS cluster_id, min(r) <> v AS is_dup
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,

    // winnow-confirmed pairs vs the q190 brute-force rational truth:
    // the q231-shaped eval readout.
    "q239_winnow_eval" ->
      s"""WITH $winnowCtes,
         |$winnowConfCtes,
         |tp AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  CAST(len(a.sh) AS BIGINT) AS n_1, CAST(len(b.sh) AS BIGINT) AS n_2,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
         |  FROM wsh a JOIN wsh b ON a.doc_id < b.doc_id),
         |truth AS (SELECT id_1, id_2 FROM tp
         |  WHERE inter > 0 AND 2 * inter >= 1 * (n_1 + n_2 - inter)),
         |m AS (SELECT
         |  (SELECT count(*) FROM wconf) AS n_cand,
         |  (SELECT count(*) FROM truth) AS n_true,
         |  (SELECT count(*) FROM wconf JOIN truth USING (id_1, id_2))
         |    AS n_hit)
         |SELECT CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
         |  CASE WHEN n_cand > 0 THEN n_hit::DOUBLE / n_cand::DOUBLE END
         |    AS cand_precision,
         |  CASE WHEN n_true > 0 THEN n_hit::DOUBLE / n_true::DOUBLE END
         |    AS recall
         |FROM m""".stripMargin,

    // the same contingency combinatorics in HUGEINT: C(n,2) sums over
    // cells/marginals, TN by complement, IEEE quotients.
    "q230_cluster_pair_eval" ->
      """WITH r AS (SELECT lang AS p, source AS c FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (SELECT CAST(coalesce(sum(m*(m-1)//2), 0) AS BIGINT) AS tp
        |  FROM (SELECT count(*)::HUGEINT AS m FROM r GROUP BY p, c)),
        |pm AS (SELECT CAST(coalesce(sum(m*(m-1)//2), 0) AS BIGINT) AS tpfp
        |  FROM (SELECT count(*)::HUGEINT AS m FROM r GROUP BY p)),
        |cm AS (SELECT CAST(coalesce(sum(m*(m-1)//2), 0) AS BIGINT) AS tpfn
        |  FROM (SELECT count(*)::HUGEINT AS m FROM r GROUP BY c)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*)::HUGEINT * (count(*)::HUGEINT - 1) // 2
        |      AS BIGINT) AS all_pairs FROM r),
        |j AS (SELECT n, tp, tpfp - tp AS fp, tpfn - tp AS fn,
        |    all_pairs - tpfp - (tpfn - tp) AS tn, all_pairs
        |  FROM tot, cells, pm, cm)
        |SELECT n, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp)::DOUBLE END
        |    AS pair_precision,
        |  CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn)::DOUBLE END
        |    AS pair_recall,
        |  CASE WHEN 2*tp + fp + fn > 0 THEN (2*tp)::DOUBLE
        |    / (2*tp + fp + fn)::DOUBLE END AS pair_f1,
        |  CASE WHEN all_pairs > 0 THEN (tp + tn)::DOUBLE
        |    / all_pairs::DOUBLE END AS rand_index
        |FROM j""".stripMargin,

    // the per-group D² rational on the (groups × categories) grid.
    "q233_chi2_by_group" ->
      """WITH r AS (SELECT source AS g, lang AS c FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |gc AS (SELECT g, c, CAST(count(*) AS BIGINT) AS a
        |  FROM r GROUP BY 1, 2),
        |cats AS (SELECT c, CAST(count(*) AS BIGINT) AS nc FROM r GROUP BY 1),
        |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS ng FROM r GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
        |grid AS (SELECT gs.g, gs.ng, cats.c, cats.nc,
        |    coalesce(gc.a, 0) AS a, (SELECT n FROM tot) - gs.ng AS rest
        |  FROM gs CROSS JOIN cats LEFT JOIN gc USING (g, c))
        |SELECT g AS source, c AS lang, a AS n_in, nc - a AS n_rest,
        |  CASE WHEN nc = 0 OR ng = 0 OR rest = 0 THEN 0.0 ELSE
        |    ((a::HUGEINT * rest::HUGEINT - (nc - a)::HUGEINT * ng::HUGEINT)
        |     * (a::HUGEINT * rest::HUGEINT - (nc - a)::HUGEINT * ng::HUGEINT)
        |    )::DOUBLE / (ng::HUGEINT * rest::HUGEINT * nc::HUGEINT)::DOUBLE
        |  END AS contrib
        |FROM grid ORDER BY source, lang""".stripMargin,

    // q185's rational with the cumulative window partitioned by source.
    "q240_auc_by_group" ->
      """WITH s AS (SELECT source AS g, n_chars AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        |    AND source IS NOT NULL),
        |gs AS (SELECT g, sc, CAST(sum(y) AS BIGINT) AS p,
        |    CAST(sum(1 - y) AS BIGINT) AS n FROM s GROUP BY 1, 2),
        |c AS (SELECT g, p, n, CAST(coalesce(sum(n) OVER (PARTITION BY g
        |    ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS nb FROM gs)
        |SELECT g AS source, CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(n) AS BIGINT) AS n_neg,
        |  CAST(sum(p * nb) * 2 + sum(p * n) AS BIGINT) AS auc_num2,
        |  CAST(sum(p) * sum(n) * 2 AS BIGINT) AS auc_den2,
        |  CASE WHEN sum(p) * sum(n) > 0 THEN
        |    CAST(sum(p * nb) * 2 + sum(p * n) AS BIGINT)::DOUBLE /
        |      CAST(sum(p) * sum(n) * 2 AS BIGINT)::DOUBLE END AS auc
        |FROM c GROUP BY g ORDER BY source""".stripMargin,

    // q227's bins on the (source directory × bins) grid — unused
    // cells as zeros with null acc/conf.
    "q236_calibration_by_group" ->
      """WITH s AS (SELECT source AS g, least(n_chars, 1000) AS a,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |agg AS (SELECT g, least(a // 100, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(a) AS BIGINT) AS sum_a
        |  FROM s GROUP BY 1, 2),
        |grid AS (SELECT DISTINCT g, b.bin FROM s
        |  CROSS JOIN (SELECT unnest(range(10)) AS bin) b)
        |SELECT g AS source, grid.bin, coalesce(n, 0) AS n,
        |  coalesce(sum_y, 0) AS sum_y, coalesce(sum_a, 0) AS sum_a,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN sum_y::DOUBLE / n::DOUBLE END AS acc,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN sum_a::DOUBLE / (n * 1000)::DOUBLE END AS conf,
        |  abs(coalesce(sum_y, 0) * 1000 - coalesce(sum_a, 0)) AS gap_num
        |FROM grid LEFT JOIN agg USING (g, bin)
        |ORDER BY source, bin""".stripMargin,

    // q228's exact Σ(a − 1000y)² keyed by source.
    "q237_brier_by_group" ->
      """WITH s AS (SELECT source, least(n_chars, 1000) AS a,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum((a - 1000*y)*(a - 1000*y)), 0) AS BIGINT)
        |    AS brier_num,
        |  CASE WHEN count(*) > 0 THEN
        |    sum((a - 1000*y)*(a - 1000*y))::DOUBLE
        |      / (count(*) * 1000000)::DOUBLE END AS brier
        |FROM s GROUP BY source ORDER BY source""".stripMargin
  )
}
