package graft.queries

import graft.dedup.Dedup
import graft.text.TextOps
import graft.text.TextOps.{B, P}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operator coverage: text analysis (q60-q63),
  * deduplication (q64-q68), embedding near-dup (q69) — all over the
  * `documents`/`embeddings` tables with exact DuckDB oracles.
  *
  * The oracle SQL below is *generated from the same constants* as the
  * Spark expressions (hash coefficients, stopword lists, band layout), so
  * MinHash signatures, SimHash values and fingerprints are verified
  * bit-for-bit, not just shape-checked.
  */
object TextDedupQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- DuckDB fragments mirroring TextOps/Dedup -----------------------

  /** tokens: lower → whitespace split → drop empties. */
  private[queries] def toksSql(text: String) =
    s"""list_filter(regexp_split_to_array(lower($text), '\\s+'), t -> length(t) > 0)"""

  private def hashSql(s: String) = TextOps.portableHashSql(s)

  private[queries] def litList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private[queries] def hitsSql(t: String, ws: Seq[String]) =
    s"len(list_filter($t, t -> list_contains(${litList(ws)}, t)))"

  /** jaccard over two distinct-element lists — mirrors Dedup.jaccard:
    * i / (|a|+|b|-i). */
  private[queries] def jacSql(a: String, b: String) = {
    val i = s"len(list_intersect($a, $b))::DOUBLE"
    s"CASE WHEN len($a)::DOUBLE + len($b)::DOUBLE - $i = 0.0 THEN 0.0 ELSE " +
      s"$i / (len($a)::DOUBLE + len($b)::DOUBLE - $i) END"
  }

  private[queries] val numHashes = 16
  private[queries] val shingleK = 3
  private[queries] val numBands = 4
  private[queries] val rowsPerBand = numHashes / numBands
  private[queries] val jaccardThreshold = 0.5
  private val cosineThreshold = 0.9
  // q152: the embeddings fixture is noise (max within-block cosine
  // ~0.47); 0.35 admits a sparse edge set so components really form
  private val embClusterThreshold = 0.35
  private val simhashBits = 24
  // q120: ≥5 shared trigram-shingle hashes marks a train doc contaminated
  // (splits the sf0.01 fixture 236/450 — exercises both flag values)
  private val decontamMinOverlap = 5

  /** sigᵢ expression over a shingle-hash list column `sh`. */
  private[queries] def sigSql(sh: String): Seq[String] =
    Dedup.hashCoeffs(numHashes).map { case (a, b) =>
      s"coalesce(list_min(list_transform($sh, h -> ($a * h + $b) % $P)), $P)"
    }

  /** band-b bucket hash over a sig list column. */
  private[queries] def bandSql(sig: String, b: Int): String =
    (0 until rowsPerBand).foldLeft("0") { (h, r) =>
      s"(($h) * $B + $sig[${b * rowsPerBand + r + 1}]) % $P"
    }

  /** q62/q74/q125's composite quality formula over a relation exposing
    * (text, t) — ONE definition so the oracles cannot desynchronize
    * from each other (the Spark side is TextOps.qualityScore). */
  private[queries] val qualitySql = {
    val stopAll = TextOps.langStopwords.flatMap(_._2)
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)::DOUBLE END * 0.5" +
      " + least(1.0, len(t)::DOUBLE / 100.0) * 0.3" +
      s" + least(1.0, (CASE WHEN len(t) = 0 THEN 0.0 ELSE ${hitsSql("t", stopAll)}::DOUBLE / len(t)::DOUBLE END) * 10.0) * 0.2"
  }

  /** Shared CTE prefix: toks → hs (token hashes) → sh (hashed shingles)
    * → sigs, mirroring TextOps.shingleHashes/Dedup.minhashSig exactly. */
  private[queries] val sigCtes =
    s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
       |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
       |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
       |sigs AS (SELECT doc_id, ${sigSql("sh").mkString("[", ", ", "]")} AS sig FROM sh)""".stripMargin

  // ---- persistent text index fixtures (q187-q189) ---------------------

  /** Terms whose AND-set is nonempty at every sf (word-soup corpus). */
  private[queries] val idxTerms = Seq("table", "batch", "merge")

  /** q187/q189 fixture: the persisted inverted index over the full
    * documents table, built ONCE per (JVM, fixture dir) — the q171
    * discipline: every gate pass and bench rep probes snapshot v1. */
  private val textIdxDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtTextIndex(s: SparkSession, d: String): String =
    textIdxDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q187_textidx").toString
      GateQueries.sweepAtExit.add(dir)
      graft.text.TextIndex.build(documents(s, d), "doc_id", "text", dir,
        nBuckets = 16)
      dir
    })

  /** q188 fixture: base index (doc_id >= 10) + one incremental append
    * (doc_id < 10) — search must see the union. */
  private val textIdxAppendDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtTextAppendIndex(s: SparkSession, d: String): String =
    textIdxAppendDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q188_textidx_append").toString
      GateQueries.sweepAtExit.add(dir)
      val docs = documents(s, d)
      graft.text.TextIndex.build(docs.filter(col("doc_id") >= 10),
        "doc_id", "text", dir, nBuckets = 16)
      graft.text.TextIndex.append(docs.filter(col("doc_id") < 10),
        "doc_id", "text", dir)
      dir
    })

  /** q200 fixture: base + append + COMPACT (all commits folded into one
    * fresh overwrite per table) — built ONCE per (JVM, fixture dir). */
  private val textIdxCompactDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtTextCompactIndex(s: SparkSession, d: String): String =
    textIdxCompactDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q200_textidx_compact").toString
      GateQueries.sweepAtExit.add(dir)
      val docs = documents(s, d)
      graft.text.TextIndex.build(docs.filter(col("doc_id") >= 10),
        "doc_id", "text", dir, nBuckets = 16)
      graft.text.TextIndex.append(docs.filter(col("doc_id") < 10),
        "doc_id", "text", dir)
      graft.text.TextIndex.compact(s, dir)
      dir
    })

  // ---- queries --------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // Persistent inverted text index (the reference's Rottnest
    // direction: index lake files once, answer keyword queries from the
    // index): conjunctive search answered WITHOUT touching documents —
    // the postings table prunes to the query terms' hash buckets
    // (directory pruning, like q173's IVF cells) and ships only
    // (doc_id, tok) hits. Oracle recomputes membership from raw text.
    "q187_text_index_search" -> { (s, d) =>
      val dir = builtTextIndex(s, d)
      graft.text.TextIndex.searchAnd(s, dir, idxTerms).orderBy("doc_id")
    },

    // Incremental index maintenance: a base index plus one appended
    // batch (only the batch was tokenized — cost ∝ batch, the lake
    // append shape); search sees the union, gated against the oracle
    // over ALL documents.
    "q188_text_index_append" -> { (s, d) =>
      val dir = builtTextAppendIndex(s, d)
      graft.text.TextIndex.searchAnd(s, dir, idxTerms).orderBy("doc_id")
    },

    // Index maintenance: COMPACTION folds the accumulated append
    // commits into one fresh commit per table; search from the
    // compacted HEAD must still state exactly the raw-text membership
    // (and the pre-compaction snapshots keep working — spec-pinned).
    "q200_text_index_compact" -> { (s, d) =>
      val dir = builtTextCompactIndex(s, d)
      graft.text.TextIndex.searchAnd(s, dir, idxTerms).orderBy("doc_id")
    },

    // Index-backed BM25: the q157 ranking computed ENTIRELY from the
    // persisted postings + doclens (same rational idf, same fixed
    // association) — gated by the LITERAL q157 oracle, so this proves
    // index path ≡ corpus path bit-for-bit, not just shape.
    "q189_index_bm25" -> { (s, d) =>
      val dir = builtTextIndex(s, d)
      graft.text.TextIndex.searchBm25(s, dir,
        CurationQueries.bm25Terms, CurationQueries.bm25K)
        .orderBy("doc_id")
    },

    // EXACT set-similarity join (AllPairs/PPJoin prefix filtering):
    // every pair with shingle-Jaccard ≥ 1/2, none missed — the lossless
    // complement to LSH (q66, probabilistic) and the capped posting
    // list (q68, drops hot shingles). Candidates come only from
    // rare-first prefix collisions; all thresholds are integer
    // arithmetic on a rational τ. Oracle is the all-pairs brute force.
    "q190_setsim_join" -> { (s, d) =>
      graft.dedup.SetSimJoin.prefixJaccardJoin(documents(s, d),
        "doc_id", "text", tauNum = 1, tauDen = 2, shingleK = shingleK)
        .orderBy("id_1", "id_2")
    },

    // the dedup tier grading ITSELF (r13): q66's raw LSH band
    // candidates measured against q190's lossless PPJoin truth at the
    // same τ=1/2 — candidate precision says how selective the banding
    // is, recall says what the bands miss. The parameter-tuning readout
    // a 100 TB pipeline runs on a slice before committing to a banding.
    "q231_lsh_eval" -> { (s, d) =>
      val docs = documents(s, d)
      val cand = Dedup.lshCandidates(docs, "doc_id", "text",
        numHashes, shingleK, numBands)
      val truth = graft.dedup.SetSimJoin.prefixJaccardJoin(docs,
          "doc_id", "text", tauNum = 1, tauDen = 2, shingleK = shingleK)
        .select("id_1", "id_2")
      Dedup.pairSetEval(cand, truth)
    },

    // MinHash fidelity (r13): per LSH-candidate pair, the signature's
    // Jaccard estimate vs the exact shingle Jaccard — estimation error
    // as the exact rational |m·union − H·inter| / (H·union). q231
    // grades the banding's recall; this grades the signature itself.
    "q234_minhash_fidelity" -> { (s, d) =>
      Dedup.minhashFidelity(documents(s, d), "doc_id", "text",
          numHashes, shingleK, numBands)
        .orderBy("id_1", "id_2")
    },

    // asymmetric containment join (quote/mirror detection): every
    // ORDERED pair with |sh(a) ∩ sh(b)| ≥ ⌈0.8·|sh(a)|⌉ — the
    // one-sided bound Jaccard cannot express. Exhaustive quadratic
    // oracle like q190's.
    "q216_containment_join" -> { (s, d) =>
      graft.dedup.SetSimJoin.prefixContainmentJoin(documents(s, d),
        "doc_id", "text", tauNum = 4, tauDen = 5, shingleK = shingleK)
        .orderBy("id_a", "id_b")
    },

    // Gopher/MassiveText NAMED rule filter: per-rule 0/1 flags + the
    // keep conjunction, all exact integer arithmetic (ratio thresholds
    // cross-multiplied). Fixture thresholds chosen so every rule
    // splits the corpus both ways at each sf.
    "q201_gopher_rules" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextOps.gopherRules(col("text")).as("__g"))
        .select(col("doc_id"), col("__g.n_words").as("n_words"),
          col("__g.r_word_count").as("r_word_count"),
          col("__g.r_mean_word_len").as("r_mean_word_len"),
          col("__g.r_stopword").as("r_stopword"),
          col("__g.keep").as("keep"))
        .orderBy("doc_id")
    },

    // token counting: whitespace + BPE-ish regex (TextOps §token counting).
    "q60_token_counts" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("len_chars"))
        .orderBy("doc_id")
    },

    // language ID (stopword-hit heuristic).
    "q61_langid" -> { (s, d) =>
      documents(s, d).select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    },

    // quality scoring: length/punct/stopword ratios + composite.
    "q62_quality" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        TextOps.alphaRatio(col("text")).as("alpha_ratio"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"),
        TextOps.meanTokenLen(col("text")).as("mean_tok_len"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // rolling-hash document fingerprint.
    "q63_fingerprint" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // exact dedup: md5 content key + canonical id tagging.
    "q64_exact_dedup" -> { (s, d) =>
      Dedup.exactDedupTags(documents(s, d), "doc_id", "text").orderBy("doc_id")
    },

    // minhash signatures, exploded (doc_id, hash_idx, sig) — verified
    // value-exact against the oracle's identical hash arithmetic.
    "q65_minhash" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        posexplode(Dedup.minhashSig(col("text"), numHashes, shingleK))
          .as(Seq("hash_idx", "sig")))
        .orderBy("doc_id", "hash_idx")
    },

    // MinHash → LSH band bucket join → exact-Jaccard confirm.
    "q66_lsh_near_dup" -> { (s, d) =>
      Dedup.lshNearDupPairs(documents(s, d), "doc_id", "text",
        jaccardThreshold, numHashes, shingleK, numBands)
        .orderBy("id_1", "id_2")
    },

    // incremental corpus maintenance: tag the new batch (doc_id%3==0)
    // against the standing corpus (%3<>0) — a batch-vs-corpus band join
    // (cost ∝ batch), never a corpus self-join; best match is tie-proof
    // (max jaccard, then min existing id via two-step join-back).
    "q145_incremental_neardup" -> { (s, d) =>
      val docs = documents(s, d)
      Dedup.incrementalNearDupTags(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", jaccardThreshold, numHashes, shingleK, numBands)
        .orderBy("doc_id")
    },

    // simhash per document.
    "q67_simhash" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        Dedup.simhash(col("text"), simhashBits).as("simhash"))
        .orderBy("doc_id")
    },

    // blocked all-pairs n-gram Jaccard, top-100 most similar. Sparse
    // posting-list formulation: only nonzero-Jaccard pairs materialize,
    // which cannot change a top-100 that is all-nonzero (it is on this
    // data; blockedJaccardPairs is the dense equivalent, spec-checked).
    "q68_ngram_jaccard" -> { (s, d) =>
      Dedup.sparseBlockedJaccardPairs(documents(s, d), "doc_id", "text",
        "source", shingleK)
        .orderBy(col("jaccard").desc, col("id_1"), col("id_2"))
        .limit(100)
    },

    // embedding-cosine near-dup: most-similar within-label neighbor per
    // vector (the threshold variant, Dedup.embeddingNearDupPairs, is
    // spec-tested — this synthetic data has no planted near-dups, so a
    // fixed threshold would be vacuous).
    "q69_embedding_neardup" -> { (s, d) =>
      Dedup.blockNearestNeighbor(embeddings(s, d), "vec_id", "embedding", "label")
        .orderBy("id_1")
    },

    // triangle enumeration over the near-dup pair graph — the density
    // signal that distinguishes tight duplicate cliques from loose
    // chains before cluster collapse. Ordered-adjacency join (id_1 <
    // id_2 edges, so each triangle materializes exactly once); at
    // corpus scale the standard refinement orders vertices by degree,
    // and the edge set is already capped by the LSH banding caps.
    "q155_neardup_triangles" -> { (s, d) =>
      val e = Dedup.lshNearDupPairs(documents(s, d), "doc_id", "text",
          jaccardThreshold, numHashes, shingleK, numBands)
        .select(col("id_1").as("a"), col("id_2").as("b"))
      val w = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
        .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
      val z = e.select(col("a").as("za"), col("b").as("zb"))
      w.join(z, col("a") === col("za") && col("c") === col("zb"))
        .select("a", "b", "c")
        .orderBy("a", "b", "c")
    },

    // cross-source duplicate-overlap matrix: which crawl sources
    // duplicate each other, from the confirmed near-dup pair graph —
    // the provenance audit a corpus build runs before deciding which
    // source to drop. Pairs are id-pairs; the source lookup is two
    // hash joins against the (id, source) projection; the matrix agg
    // is map-side combined on a canonically-ordered source pair.
    "q159_source_overlap" -> { (s, d) =>
      val docs = documents(s, d)
      val src = docs.select(col("doc_id").as("__sid"), col("source"))
      Dedup.lshNearDupPairs(docs, "doc_id", "text",
          jaccardThreshold, numHashes, shingleK, numBands)
        .join(src.select(col("__sid"), col("source").as("__s1")),
          col("id_1") === col("__sid")).drop("__sid")
        .join(src.select(col("__sid"), col("source").as("__s2")),
          col("id_2") === col("__sid")).drop("__sid")
        .groupBy(least(col("__s1"), col("__s2")).as("source_a"),
          greatest(col("__s1"), col("__s2")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },

    // embedding-cosine cluster resolution — the vector twin of q121
    // (text) and q139 (image): threshold pairs within the label block →
    // pointer-jumping connected components → canonical keeper. The
    // fixture's vectors are noise (max within-block cosine ~0.47), so
    // the 0.35 threshold yields a sparse arbitrary graph — exactly what
    // exercises closure semantics; retrieval quality is q50/q55's job.
    "q152_embedding_clusters" -> { (s, d) =>
      val emb = embeddings(s, d)
      graft.dedup.Clusters.connectedComponents(
          Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", "label",
            embClusterThreshold).select("id_1", "id_2"),
          "id_1", "id_2", emb.select(col("vec_id")), "vec_id")
        .withColumn("is_dup", col("vec_id") =!= col("cluster_id"))
        .orderBy("vec_id")
    },

    // multimodal plumbing, SQL side: opaque binary column + stats that
    // stay in codegen (graft.multimodal.Multimodal).
    "q70_multimodal_blob" -> { (s, d) =>
      graft.multimodal.Multimodal.blobStats(
        graft.multimodal.Multimodal.withBlob(documents(s, d), "text"),
        "doc_id", "blob").orderBy("doc_id")
    },

    // multimodal plumbing, decode side: partition-wise typed metadata
    // extraction through the stubbed codec (mapPartitions + Encoder).
    "q71_multimodal_meta" -> { (s, d) =>
      graft.multimodal.Multimodal.decodeMeta(
        graft.multimodal.Multimodal.withBlob(documents(s, d), "text"),
        "doc_id", "blob").toDF().orderBy("id")
    },

    // multimodal feature extraction end-to-end: blob → 16-bin byte
    // histogram embedding (the stubbed model-inference stage), emitted as
    // columns. The corpus is ASCII (verified) so the byte-level stub and
    // the oracle's code-point histogram agree exactly.
    "q82_multimodal_features" -> { (s, d) =>
      val fe = graft.multimodal.Multimodal.featureExtract(
        graft.multimodal.Multimodal.withBlob(documents(s, d), "text"),
        "doc_id", "blob")
      fe.select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("embedding"), i + 1).as(s"h$i")): _*)
        .orderBy("doc_id")
    },

    // classic wordcount (the reference benchmarks it standalone,
    // benchmark/spark/wordcount.py): tokenize → explode → count, top-50.
    "q72_wordcount" -> { (s, d) =>
      documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(50)
    },

    // near-exact dedup on NORMALIZED text (case/punct/whitespace
    // canonicalization before hashing).
    "q73_normalized_dedup" -> { (s, d) =>
      val docs = documents(s, d)
        .withColumn("norm", TextOps.normalizeText(col("text")))
      Dedup.exactDedupTags(docs, "doc_id", "norm").orderBy("doc_id")
    },

    // end-to-end curation pipeline: quality gate → exact dedup (keep
    // canonical) → per-language corpus accounting. The composition shape
    // a training-data build runs at 100 TB.
    "q74_curation_pipeline" -> { (s, d) =>
      val docs = documents(s, d)
        .withColumn("q", TextOps.qualityScore(col("text")))
        .filter(col("q") >= 0.5)
      // everything the rollup needs is computed BEFORE any join/exchange
      // (round-9: the previous form joined back to the full docs subtree,
      // whose text column was broadcast at sf0.1 and would shuffle the
      // corpus itself the moment the broadcast threshold breaks at scale)
      // — so no exchange anywhere in this plan ever carries text
      val slim = docs.select(col("doc_id"), col("lang"), col("q"),
        TextOps.tokenCount(col("text")).cast("long").as("n_toks"))
      val kept = Dedup.exactDedupTags(docs.select(col("doc_id"), col("text")),
          "doc_id", "text")
        .filter(!col("is_dup"))
        .join(slim, "doc_id")
      kept.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        // order-independent mean (scale 9: scores are in [0,1]) — a raw
        // avg of computed doubles drifts at the last ulp with partition
        // order, which a hash gate turns into a coin flip.
        graft.functions.Det.davg(col("q"), 9).as("mean_quality"))
        .orderBy("lang")
    },

    // Inverted-index full-text search (the reference's Rottnest
    // direction, blog/time.md + apps/rottnest: token posting lists with
    // AND semantics). The Spark side builds the posting list and
    // AND-matches by counting distinct hit terms per doc — the form that
    // scales (the index is a reusable DataFrame; here it is built
    // inline), while the oracle states the per-row membership test.
    "q75_fulltext" -> { (s, d) =>
      val terms = Seq("join", "scan")
      documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).as("n_terms"))
        .filter(col("n_terms") === terms.size)
        .select("doc_id", "n_terms")
        .orderBy("doc_id")
    },

    // MassiveText/Gopher repetition signals: duplicate-n-gram fractions
    // (n = 1, 2, 3) per document, computed over HASHED n-grams in one
    // projection (TextOps.dupNgramFracStruct — one tokenization, integer
    // math, no n-gram strings; the string form benched 50 s here). Pure
    // per-row compute — at 100 TB this is scan-parallel with zero
    // exchange (the orderBy is the gate's presentation sort only).
    "q118_repetition" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          TextOps.dupNgramFracStruct(col("text"), Seq(1, 2, 3)).as("__f"))
        .select(col("doc_id"),
          col("__f.n1").as("dup_word_frac"),
          col("__f.n2").as("dup_bigram_frac"),
          col("__f.n3").as("dup_trigram_frac"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling: keep a per-language percentage
    // chosen by hashing a salted document id — reproducible across
    // reruns/retries/engines (no RNG), and a pure narrow filter, so at
    // 100 TB it samples during the scan with zero exchange. The salt
    // decorrelates this sample from any other hash-of-id use.
    "q119_stratified_sample" -> { (s, d) =>
      val pct = when(col("lang") === "en", 50)
        .when(col("lang") === "zh", 20).otherwise(10)
      documents(s, d)
        .filter(TextOps.portableHash(
          concat(lit("sample1:"), col("doc_id").cast("string"))) % 100 < pct)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // train/test decontamination: a held-out split (doc_id % 10 = 0)
    // stands in for the eval benchmark; its distinct shingle-hash set
    // broadcasts and the corpus streams past it — the GPT-3-style
    // n-gram scrub at its 100 TB shape (Dedup.decontaminationTags).
    "q120_decontaminate" -> { (s, d) =>
      val docs = documents(s, d)
      Dedup.decontaminationTags(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleK, minOverlap = decontamMinOverlap)
        .orderBy("doc_id")
    },

    // bloom-accelerated decontamination: the q120 semantics through
    // Spark's distributed bloom-filter build + codegen'd probe, with an
    // exact-confirm join that removes every false positive — the form
    // whose test-side broadcast stays numBits/8 bytes FLAT when the
    // benchmark suite outgrows an exact distinct-hash set. numBits is
    // deliberately tiny (2^14 ≈ 2 KiB for ~6.5k grams at sf0.01, FP
    // rate ~50%+) so the confirm join provably does its job: the
    // output must still be BIT-IDENTICAL to q120's oracle.
    "q160_bloom_decontaminate" -> { (s, d) =>
      val docs = documents(s, d)
      Dedup.bloomDecontaminationTags(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleK, minOverlap = decontamMinOverlap,
        numBits = 1L << 14)
        .orderBy("doc_id")
    }
  )

  // ---- oracles --------------------------------------------------------

  private[queries] val langCases = {
    val hits = TextOps.langStopwords.map { case (l, _) => s"h_$l" }
    val best = s"greatest(${hits.mkString(", ")})"
    val whens = TextOps.langStopwords.map { case (l, _) =>
      s"WHEN h_$l = $best AND $best > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'unknown' END"
  }

  lazy val oracles: Map[String, String] = Map(
    // membership stated from raw text — the index is invisible to the
    // oracle, which is the point: the stored structure must reproduce
    // exactly what a corpus scan would say.
    "q187_text_index_search" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, CAST(${idxTerms.size} AS BIGINT) AS n_terms
         |FROM toks
         |WHERE ${idxTerms.map(t => s"list_contains(t, '$t')").mkString(" AND ")}
         |ORDER BY doc_id""".stripMargin,

    "q188_text_index_append" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, CAST(${idxTerms.size} AS BIGINT) AS n_terms
         |FROM toks
         |WHERE ${idxTerms.map(t => s"list_contains(t, '$t')").mkString(" AND ")}
         |ORDER BY doc_id""".stripMargin,

    "q200_text_index_compact" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, CAST(${idxTerms.size} AS BIGINT) AS n_terms
         |FROM toks
         |WHERE ${idxTerms.map(t => s"list_contains(t, '$t')").mkString(" AND ")}
         |ORDER BY doc_id""".stripMargin,

    // integer restatement of every rule from the token list: the same
    // cross-multiplied thresholds over len(t) / Σ length / stop hits.
    "q201_gopher_rules" -> {
      val stopAll = TextOps.langStopwords.flatMap(_._2)
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
         |  CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS BIGINT) AS sl,
         |  CAST(${hitsSql("t", stopAll)} AS BIGINT) AS ns FROM toks)
         |SELECT doc_id, nt AS n_words,
         |  CAST(CASE WHEN nt >= 30 AND nt <= 90 THEN 1 ELSE 0 END AS INT) AS r_word_count,
         |  CAST(CASE WHEN sl >= 4 * nt AND sl <= 5 * nt THEN 1 ELSE 0 END AS INT) AS r_mean_word_len,
         |  CAST(CASE WHEN 20 * ns >= nt THEN 1 ELSE 0 END AS INT) AS r_stopword,
         |  CAST(CASE WHEN nt >= 30 AND nt <= 90 AND sl >= 4 * nt
         |    AND sl <= 5 * nt AND 20 * ns >= nt THEN 1 ELSE 0 END AS INT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q60_token_counts" ->
      s"""WITH toks AS (SELECT doc_id, text, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, len(t) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '${TextOps.bpePattern}')) AS n_bpe_tokens,
         |  length(text) AS len_chars
         |FROM toks ORDER BY doc_id""".stripMargin,

    "q61_langid" ->
      s"""WITH toks AS (SELECT doc_id, lang, ${toksSql("text")} AS t FROM documents),
         |hits AS (SELECT doc_id, lang,
         |  ${TextOps.langStopwords.map { case (l, ws) => s"${hitsSql("t", ws)} AS h_$l" }.mkString(",\n  ")}
         |  FROM toks)
         |SELECT doc_id, lang, $langCases AS pred_lang FROM hits ORDER BY doc_id""".stripMargin,

    "q62_quality" ->
      s"""WITH toks AS (SELECT doc_id, text, ${toksSql("text")} AS t FROM documents),
         |m AS (SELECT doc_id,
         |  CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)::DOUBLE END AS alpha_ratio,
         |  CASE WHEN len(t) = 0 THEN 0.0 ELSE ${hitsSql("t", TextOps.langStopwords.flatMap(_._2))}::DOUBLE / len(t)::DOUBLE END AS stop_ratio,
         |  CASE WHEN len(t) = 0 THEN 0.0 ELSE list_reduce(list_prepend(0::BIGINT, list_transform(t, x -> length(x)::BIGINT)), (a, x) -> a + x)::DOUBLE / len(t)::DOUBLE END AS mean_tok_len,
         |  least(1.0, len(t)::DOUBLE / 100.0) AS len_score
         |  FROM toks)
         |SELECT doc_id, alpha_ratio, stop_ratio, mean_tok_len,
         |  alpha_ratio * 0.5 + len_score * 0.3 + least(1.0, stop_ratio * 10.0) * 0.2 AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "q63_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
         |  list_transform(t, x -> ${hashSql("x")})), (f, h) -> (f * $B + h) % $P) AS fp
         |FROM toks ORDER BY doc_id""".stripMargin,

    "q64_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_key,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q65_minhash" ->
      s"""$sigCtes
         |SELECT doc_id, i - 1 AS hash_idx, sig[i] AS sig
         |FROM sigs CROSS JOIN (SELECT unnest(range(1, ${numHashes + 1})) AS i)
         |ORDER BY doc_id, hash_idx""".stripMargin,

    "q66_lsh_near_dup" ->
      s"""$sigCtes,
         |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs),
         |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
         |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         |  FROM bx a JOIN bx b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id)
         |SELECT id_1, id_2, ${jacSql("s1.sh", "s2.sh")} AS jaccard
         |FROM cand JOIN sh s1 ON cand.id_1 = s1.doc_id
         |  JOIN sh s2 ON cand.id_2 = s2.doc_id
         |WHERE ${jacSql("s1.sh", "s2.sh")} >= $jaccardThreshold
         |ORDER BY id_1, id_2""".stripMargin,

    // q66's signature/band machinery with the self-join replaced by the
    // batch-vs-corpus asymmetric join and the tie-proof best-match fold.
    "q145_incremental_neardup" ->
      s"""$sigCtes,
         |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs),
         |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
         |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
         |cand AS (SELECT DISTINCT i.doc_id AS in_id, e.doc_id AS ex_id
         |  FROM bx i JOIN bx e ON i.band = e.band AND i.bucket = e.bucket
         |  WHERE i.doc_id % 3 = 0 AND e.doc_id % 3 <> 0),
         |conf AS (SELECT in_id, ex_id, j FROM (
         |  SELECT cand.in_id, cand.ex_id, ${jacSql("s1.sh", "s2.sh")} AS j
         |  FROM cand JOIN sh s1 ON cand.in_id = s1.doc_id
         |    JOIN sh s2 ON cand.ex_id = s2.doc_id)
         |  WHERE j >= $jaccardThreshold),
         |best AS (SELECT in_id, max(j) AS match_jaccard FROM conf GROUP BY 1),
         |m AS (SELECT conf.in_id, best.match_jaccard,
         |    min(conf.ex_id) AS match_id
         |  FROM conf JOIN best ON conf.in_id = best.in_id
         |    AND conf.j = best.match_jaccard
         |  GROUP BY 1, 2)
         |SELECT d.doc_id, m.match_id IS NOT NULL AS is_dup,
         |  m.match_id, m.match_jaccard
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |LEFT JOIN m ON d.doc_id = m.in_id ORDER BY doc_id""".stripMargin,

    "q67_simhash" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks)
         |SELECT doc_id, ${(0 until simhashBits).map(j =>
             s"CASE WHEN 2 * len(list_filter(hs, h -> (h >> $j) & 1 = 1)) > len(hs) THEN ${1L << j} ELSE 0 END")
             .mkString(" + ")} AS simhash
         |FROM hs ORDER BY doc_id""".stripMargin,

    "q68_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, source, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, source, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |sh AS (SELECT doc_id, source, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs)
         |SELECT a.source AS source, a.doc_id AS id_1, b.doc_id AS id_2,
         |  ${jacSql("a.sh", "b.sh")} AS jaccard
         |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |ORDER BY jaccard DESC, id_1, id_2 LIMIT 100""".stripMargin,

    // q66's confirmed-pair pipeline + the canonically-ordered source
    // pair aggregate.
    "q159_source_overlap" ->
      s"""$sigCtes,
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
         |p AS (SELECT least(d1.source, d2.source) AS source_a,
         |    greatest(d1.source, d2.source) AS source_b
         |  FROM conf JOIN documents d1 ON conf.id_1 = d1.doc_id
         |    JOIN documents d2 ON conf.id_2 = d2.doc_id)
         |SELECT source_a, source_b, count(*) AS n_pairs FROM p
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q66's confirmed-pair pipeline + the ordered 3-way triangle join.
    "q155_neardup_triangles" ->
      s"""$sigCtes,
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
         |e AS (SELECT id_1 AS a, id_2 AS b FROM conf)
         |SELECT x.a AS a, x.b AS b, y.b AS c
         |FROM e x JOIN e y ON x.b = y.a
         |  JOIN e z ON x.a = z.a AND y.b = z.b
         |ORDER BY 1, 2, 3""".stripMargin,

    // q121's recursive-closure oracle over the cosine pair graph: the
    // min-reachable fixpoint IS what pointer jumping converges to.
    "q152_embedding_clusters" ->
      s"""WITH RECURSIVE ne2 AS (SELECT label, vec_id,
         |    ${VectorQueries.duckNorm("embedding")} AS nv FROM embeddings),
         |conf AS (SELECT a.vec_id AS id_1, b.vec_id AS id_2
         |  FROM ne2 a JOIN ne2 b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${VectorQueries.duckDot("a.nv", "b.nv")} >= $embClusterThreshold),
         |sym AS (SELECT id_1 AS a, id_2 AS b FROM conf
         |  UNION ALL SELECT id_2, id_1 FROM conf),
         |reach(v, r) AS (SELECT vec_id, vec_id FROM embeddings
         |  UNION SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a)
         |SELECT v AS vec_id, min(r) AS cluster_id, min(r) <> v AS is_dup
         |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin,

    "q69_embedding_neardup" -> {
      s"""WITH ne AS (SELECT label, vec_id, ${VectorQueries.duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT a.label AS label, a.vec_id AS id_1, b.vec_id AS id_2,
         |    ${VectorQueries.duckDot("a.nv", "b.nv")} AS cos_sim
         |  FROM ne a JOIN ne b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id_1
         |    ORDER BY cos_sim DESC, id_2) AS rn FROM sims)
         |SELECT label, id_1, id_2, cos_sim FROM ranked WHERE rn = 1
         |ORDER BY id_1""".stripMargin
    },

    "q70_multimodal_blob" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors Multimodal.featureExtract: 16-bin high-nibble byte
    // histogram / length; ASCII corpus → code point = byte, bins 8-15
    // vacant, so only h0..h7 are emitted.
    "q82_multimodal_features" ->
      """WITH chars AS (
        |  SELECT doc_id, ord(ch) // 16 AS bin FROM (
        |    SELECT doc_id, unnest(str_split(text, '')) AS ch
        |    FROM documents)),
        |hist AS (
        |  SELECT doc_id, bin, count(*)::DOUBLE AS c
        |  FROM chars GROUP BY 1, 2),
        |n AS (SELECT doc_id, greatest(length(text), 1)::DOUBLE AS len
        |      FROM documents)
        |SELECT n.doc_id,
        |  sum(CASE WHEN h.bin = 0 THEN h.c ELSE 0 END) / any_value(n.len) AS h0,
        |  sum(CASE WHEN h.bin = 1 THEN h.c ELSE 0 END) / any_value(n.len) AS h1,
        |  sum(CASE WHEN h.bin = 2 THEN h.c ELSE 0 END) / any_value(n.len) AS h2,
        |  sum(CASE WHEN h.bin = 3 THEN h.c ELSE 0 END) / any_value(n.len) AS h3,
        |  sum(CASE WHEN h.bin = 4 THEN h.c ELSE 0 END) / any_value(n.len) AS h4,
        |  sum(CASE WHEN h.bin = 5 THEN h.c ELSE 0 END) / any_value(n.len) AS h5,
        |  sum(CASE WHEN h.bin = 6 THEN h.c ELSE 0 END) / any_value(n.len) AS h6,
        |  sum(CASE WHEN h.bin = 7 THEN h.c ELSE 0 END) / any_value(n.len) AS h7
        |FROM n LEFT JOIN hist h ON n.doc_id = h.doc_id
        |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,

    // mirrors Multimodal.decodeStub arithmetic (texts are ASCII, so
    // byte 0/1 = codepoint 0/1).
    "q71_multimodal_meta" ->
      """WITH b AS (SELECT doc_id AS id, octet_length(encode(text)) AS byte_len,
        |  CASE WHEN length(text) >= 1 THEN unicode(text[1]) ELSE 0 END AS b0,
        |  CASE WHEN length(text) >= 2 THEN unicode(text[2]) ELSE 0 END AS b1
        |  FROM documents)
        |SELECT id, byte_len,
        |  CASE WHEN b0 % 3 = 0 THEN 'img' WHEN b0 % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |  16 + (b0 % 64) AS width, 16 + (b1 % 64) AS height,
        |  1 + (byte_len % 30) AS n_frames
        |FROM b ORDER BY id""".stripMargin,

    "q72_wordcount" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(${toksSql("text")}) AS word FROM documents)
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin,

    "q73_normalized_dedup" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS content_key,
        |  min(doc_id) OVER (PARTITION BY md5(norm)) AS canonical_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(norm)) AS is_dup
        |FROM n ORDER BY doc_id""".stripMargin,

    "q74_curation_pipeline" -> {
      s"""WITH toks AS (SELECT doc_id, lang, text, ${toksSql("text")} AS t FROM documents),
         |scored AS (SELECT doc_id, lang, text, len(t) AS n_toks,
         |  $qualitySql AS q
         |  FROM toks),
         |gated AS (SELECT * FROM scored WHERE q >= 0.5),
         |kept AS (SELECT * FROM (SELECT *,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
         |  FROM gated) WHERE doc_id = canonical_id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |  ${graft.functions.Det.davgSql("q", 9)} AS mean_quality
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
    },

    // the index-backed BM25 must reproduce the corpus-scan BM25
    // bit-for-bit — its oracle IS q157's.
    "q189_index_bm25" -> CurationQueries.oracles("q157_bm25"),

    // all-pairs brute force: the prefix-filtered join must return
    // EXACTLY the pairs the exhaustive quadratic scan finds (inter > 0
    // mirrors the operator's shared-shingle candidate requirement; a
    // J ≥ τ > 0 pair always shares a shingle).
    "q190_setsim_join" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
         |pairs AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  CAST(len(a.sh) AS BIGINT) AS n_1, CAST(len(b.sh) AS BIGINT) AS n_2,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_1, id_2, n_1, n_2, inter,
         |  inter::DOUBLE / (n_1 + n_2 - inter)::DOUBLE AS jaccard
         |FROM pairs
         |WHERE inter > 0 AND 2 * inter >= 1 * (n_1 + n_2 - inter)
         |ORDER BY id_1, id_2""".stripMargin,

    // q66's band-candidate CTE vs q190's brute-force truth: counts +
    // IEEE quotients.
    "q231_lsh_eval" ->
      s"""$sigCtes,
         |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs),
         |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
         |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         |  FROM bx a JOIN bx b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |tp AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  CAST(len(a.sh) AS BIGINT) AS n_1, CAST(len(b.sh) AS BIGINT) AS n_2,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |truth AS (SELECT id_1, id_2 FROM tp
         |  WHERE inter > 0 AND 2 * inter >= 1 * (n_1 + n_2 - inter)),
         |m AS (SELECT
         |  (SELECT count(*) FROM cand) AS n_cand,
         |  (SELECT count(*) FROM truth) AS n_true,
         |  (SELECT count(*) FROM cand JOIN truth USING (id_1, id_2))
         |    AS n_hit)
         |SELECT CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
         |  CASE WHEN n_cand > 0 THEN n_hit::DOUBLE / n_cand::DOUBLE END
         |    AS cand_precision,
         |  CASE WHEN n_true > 0 THEN n_hit::DOUBLE / n_true::DOUBLE END
         |    AS recall
         |FROM m""".stripMargin,

    // per-candidate-pair sig-match count + exact Jaccard + the exact
    // error rational, from the shared signature CTEs. Shingle-less
    // docs are excluded before banding (engine contract — no-op on
    // these fixtures, every doc has >= shingleK tokens).
    "q234_minhash_fidelity" ->
      s"""$sigCtes,
         |rel AS (SELECT s.doc_id, s.sh, g.sig FROM sh s
         |  JOIN sigs g USING (doc_id) WHERE len(s.sh) > 0),
         |bands AS (SELECT doc_id, ${(0 until numBands).map(b => bandSql("sig", b)).mkString("[", ", ", "]")} AS bh FROM sigs
         |  WHERE doc_id IN (SELECT doc_id FROM rel)),
         |bx AS (SELECT doc_id, i AS band, bh[i] AS bucket
         |  FROM bands CROSS JOIN (SELECT unnest(range(1, ${numBands + 1})) AS i)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         |  FROM bx a JOIN bx b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |p AS (SELECT c.id_1, c.id_2,
         |    CAST(len(list_filter(range(1, ${numHashes + 1}),
         |      i -> a.sig[i] = b.sig[i])) AS BIGINT) AS sig_matches,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
         |    CAST(len(a.sh) + len(b.sh)
         |      - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS u
         |  FROM cand c JOIN rel a ON c.id_1 = a.doc_id
         |    JOIN rel b ON c.id_2 = b.doc_id)
         |SELECT id_1, id_2, sig_matches, inter, u AS "union",
         |  sig_matches::DOUBLE / $numHashes.0 AS est,
         |  CASE WHEN u > 0 THEN inter::DOUBLE / u::DOUBLE END
         |    AS exact_jaccard,
         |  CASE WHEN u > 0
         |    THEN abs(sig_matches * u - $numHashes * inter) END AS err_num,
         |  CASE WHEN u > 0 THEN $numHashes * u END AS err_den
         |FROM p ORDER BY id_1, id_2""".stripMargin,

    // exhaustive ORDERED-pair brute force with the one-sided bound.
    "q216_containment_join" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(a.sh) AS BIGINT) AS n_a, CAST(len(b.sh) AS BIGINT) AS n_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
         |SELECT id_a, id_b, n_a, n_b, inter,
         |  inter::DOUBLE / n_a::DOUBLE AS containment
         |FROM pairs
         |WHERE inter > 0 AND 5 * inter >= 4 * n_a
         |ORDER BY id_a, id_b""".stripMargin,

    "q75_fulltext" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents)
         |SELECT doc_id, CAST(2 AS BIGINT) AS n_terms
         |FROM toks
         |WHERE list_contains(t, 'join') AND list_contains(t, 'scan')
         |ORDER BY doc_id""".stripMargin,

    "q118_repetition" -> {
      // mirrors dupNgramFracStruct: hashed n-grams (same polynomial
      // combine as the Spark side), frac = 1 - distinct/total
      def frac(g: String) =
        s"CASE WHEN len($g) = 0 THEN 0.0 ELSE 1.0 - len(list_distinct($g))::DOUBLE / len($g)::DOUBLE END"
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs0 AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |g AS (SELECT doc_id, ${TextOps.ngramHashesSql("hs", 1)} AS g1,
         |  ${TextOps.ngramHashesSql("hs", 2)} AS g2,
         |  ${TextOps.ngramHashesSql("hs", 3)} AS g3 FROM hs0)
         |SELECT doc_id, ${frac("g1")} AS dup_word_frac,
         |  ${frac("g2")} AS dup_bigram_frac,
         |  ${frac("g3")} AS dup_trigram_frac
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q119_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hashSql("(concat('sample1:', CAST(doc_id AS VARCHAR)))")} % 100 <
         |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 20 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,

    "q120_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
         |testg AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 10 = 0),
         |traing AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 10 <> 0),
         |ov AS (SELECT doc_id, count(*) AS n_overlap FROM traing
         |  JOIN testg USING (g) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap,
         |  coalesce(ov.n_overlap, 0) >= $decontamMinOverlap AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
         |LEFT JOIN ov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the bloom path is a pure accelerator: its exact-confirm join
    // makes the output bit-identical to the exact operator, so the
    // oracle IS q120's exact-decontamination SQL.
    "q160_bloom_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, list_transform(t, x -> ${hashSql("x")}) AS hs FROM toks),
         |sh AS (SELECT doc_id, ${TextOps.shingleHashesSql("hs", shingleK)} AS sh FROM hs),
         |testg AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 10 = 0),
         |traing AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 10 <> 0),
         |ov AS (SELECT doc_id, count(*) AS n_overlap FROM traing
         |  JOIN testg USING (g) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap,
         |  coalesce(ov.n_overlap, 0) >= $decontamMinOverlap AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
         |LEFT JOIN ov USING (doc_id)
         |ORDER BY doc_id""".stripMargin
  )
}
