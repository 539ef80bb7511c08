package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond scoring/dedup: sequence
  * packing, PII redaction, and deterministic training-order shuffling.
  * These complete the corpus-build story the reference's pipeline
  * pieces (scans → transforms → groupbys, `pyquokka/datastream.py`)
  * are used for — every one is a narrow, scan-parallel shape or a
  * single keyed exchange, so each survives 100 TB unchanged.
  */
object Curation {

  // ---- sequence packing -----------------------------------------------

  /** Pack documents into fixed-token-budget training sequences.
    *
    * Deterministic contract (reproducible across engines, retries and
    * cluster sizes — the property a training run needs so a re-run
    * materializes byte-identical batches): within each shard, documents
    * are taken in ascending id order; a document starts a new sequence
    * exactly when appending it would exceed `budget` tokens; a document
    * longer than `budget` occupies a sequence alone (placed at offset 0,
    * overflowing by fiat — truncation is the trainer's policy choice,
    * not the packer's).
    *
    * Scale shape: one hash exchange on the shard key, then a sorted
    * per-partition scan (the `stateful_transform` shape —
    * reference executors consume per-channel sorted batches the same
    * way, `pyquokka/executors.py`). State is three longs per shard; no
    * text moves — callers pack (shard, id, n_tokens) and join the
    * assignment back to content by id if needed.
    *
    * Returns (shard, doc_id, n_tokens, seq_id, tok_offset), one row per
    * input document: seq_id numbers sequences within the shard from 0,
    * tok_offset is the document's first-token position in its sequence.
    */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
      nTokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("long"), col(idCol).cast("long"),
        col(nTokCol).cast("long"))
      .as[(Long, Long, Long)]
      .repartition(col(shardCol))
      .sortWithinPartitions(shardCol, idCol)
      .mapPartitions { it =>
        // multiple shards can share a partition; state resets on the
        // shard boundary (rows arrive sorted by shard, then id)
        var shard = Long.MinValue
        var seq = 0L
        var fill = 0L
        var first = true
        it.map { case (sh, id, n) =>
          if (first || sh != shard) {
            shard = sh; seq = 0L; fill = n; first = false
            (sh, id, n, 0L, 0L)
          } else if (fill + n > budget) {
            seq += 1; fill = n
            (sh, id, n, seq, 0L)
          } else {
            val off = fill
            fill += n
            (sh, id, n, seq, off)
          }
        }
      }
      .toDF(shardCol, idCol, nTokCol, "seq_id", "tok_offset")
  }

  // ---- cross-document span dedup (C4 / CCNet paragraph dedup) ----------

  /** Remove every fixed-width token span whose exact text occurs in at
    * least `minDocFreq` DISTINCT documents, then rebuild each document
    * from its surviving spans — the C4 "duplicated three-sentence span"
    * / CCNet paragraph-level dedup step, expressed over fixed token
    * windows (the corpus here has no sentence boundaries; a caller with
    * real paragraphs passes them pre-split the same way). Doc-internal
    * repeats alone don't trigger removal (df counts documents, not
    * occurrences) — that's q118's repetition signal, a different axis.
    *
    * Determinism: spans are tokenizer-exact chunks (TextOps.tokens,
    * `spanTokens` per chunk, last chunk short), the rebuild joins kept
    * spans in chunk order with single spaces — byte-identical across
    * engines and reruns.
    *
    * Scale shape: the frequency aggregate shuffles (md5(span), doc_id)
    * — 128-bit keys, never span text; the frequent-span set (df ≥
    * threshold) is tiny by Zipf and broadcasts (`broadcastFrequent =
    * false` switches to a shuffle join for adversarial corpora where it
    * isn't); the rebuild is ONE hash exchange on doc id. The exploded
    * chunk projection has two consumers (frequency agg, rebuild) — at
    * corpus scale either persist `df` upstream or accept the second
    * scan; tokenization is recomputed, the shuffle runs once per
    * consumer either way.
    *
    * Returns (idCol, clean_text, n_spans, n_dropped). */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocFreq: Long,
      broadcastFrequent: Boolean = true): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    require(minDocFreq > 1, s"minDocFreq must be > 1, got $minDocFreq")
    // compiled chunk build (graft.functions.TokenWindows, width ==
    // stride == spanTokens → disjoint chunks, short last chunk)
    val chunks = df.select(col(idCol),
        explode(call_function("token_windows", col(textCol),
          lit(spanTokens), lit(spanTokens))).as("c"))
      .select(col(idCol), col("c.chunk_i").as("chunk_i"),
        col("c.span").as("span"),
        md5(col("c.span").cast("binary")).as("__h"))
    val frequent0 = chunks
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("span_df"))
      .filter(col("span_df") >= minDocFreq)
      .select(col("__h"), lit(true).as("__dup"))
    val frequent = if (broadcastFrequent) broadcast(frequent0) else frequent0
    // one groupBy computes totals, drop counts AND the rebuild:
    // collect_list skips the nulls the `when` leaves for dropped spans
    val rebuilt = chunks.join(frequent, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__dup").isNull,
              struct(col("chunk_i"), col("span"))))),
            s => s.getField("span")),
          " ").as("clean_text"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  // ---- retrieval-corpus chunking ---------------------------------------

  /** Split documents into overlapping fixed-token windows — the
    * retrieval/RAG corpus-preparation step (and the context-window
    * pre-split of long documents before packing). Chunk i covers tokens
    * [i·stride, i·stride + chunkTokens) with stride = chunkTokens −
    * overlapTokens; the number of chunks is ceil((nTok − overlap) /
    * stride) (min 1 for any non-empty doc), so no trailing chunk is
    * fully contained in its predecessor. Deterministic: pure arithmetic
    * over the token array, byte-identical rebuilds across engines.
    *
    * Scale shape: a narrow per-row array build + explode — zero
    * exchange at any corpus size (the output is bigger than the input
    * by ~chunk/stride; that's the operator's contract, not a shuffle).
    *
    * Returns (idCol, chunk_i, tok_start, n_chunk_tokens, chunk_text);
    * empty documents yield no chunks. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    // compiled window build (graft.functions.TokenWindows — the K =
    // max(1, ceil((nTok − overlap)/stride)) contract lives there)
    df.select(col(idCol),
        explode(call_function("token_windows", col(textCol),
          lit(chunkTokens), lit(stride))).as("c"))
      .select(col(idCol), col("c.chunk_i").as("chunk_i"),
        col("c.tok_start").as("tok_start"),
        col("c.n_tokens").as("n_chunk_tokens"),
        col("c.span").as("chunk_text"))
  }

  /** CHUNK-level exact dedup + reassembly — the sub-document form of
    * exact dedup (Dolma/RefinedWeb-style): boilerplate repeated across
    * documents (headers, license blocks, navigation) survives doc-level
    * dedup because the *documents* differ; deduping fixed-token chunks
    * removes the repeated spans while keeping each document's unique
    * remainder. Chunks come from [[chunkDocuments]] (overlap 0, so
    * every token belongs to exactly one chunk and reassembly is
    * lossless-modulo-dedup); a chunk instance is KEPT iff it is the
    * lexicographically-first occurrence of its content —
    * min(doc_id, chunk_i) over the md5 content key — so output is
    * deterministic on any layout and the earliest document keeps its
    * text intact.
    *
    * Returns one row per input document (empty-token documents drop
    * with their chunks): (idCol, kept_text — surviving chunks in
    * original order, space-joined normalized tokens, '' when everything
    * was dropped —, n_chunks, n_dropped, n_kept_tokens).
    *
    * Scale shape: the keeper decision is a map-combined min-struct
    * aggregate on the 128-bit content key (skew-proof: a million-way
    * repeated chunk reduces map-side — deliberately NOT a per-key
    * window sort) + one key-equi join; reassembly is one doc-keyed
    * aggregate. Text crosses two exchanges because the OUTPUT is text;
    * the dedup decision itself moves only (key, id, idx). */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, chunkTokens,
        overlapTokens = 0)
      .select(col(idCol), col("chunk_i"), col("n_chunk_tokens"),
        col("chunk_text"),
        md5(col("chunk_text").cast("binary")).as("__k"))
    val keeper = chunks.groupBy(col("__k"))
      .agg(min(struct(col(idCol).as("__kid"), col("chunk_i").as("__kidx")))
        .as("__m"))
    chunks.join(keeper, Seq("__k"))
      .withColumn("__keep", col(idCol) === col("__m.__kid") &&
        col("chunk_i") === col("__m.__kidx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("__keep"), col("n_chunk_tokens")).otherwise(0L))
          .as("n_kept_tokens"),
        // collect_list drops the nulls of non-kept chunks; array_sort
        // on (chunk_i, text) structs restores document order
        array_join(transform(array_sort(collect_list(when(col("__keep"),
            struct(col("chunk_i"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("kept_text"))
      .select(col(idCol), col("kept_text"), col("n_chunks"),
        col("n_dropped"), col("n_kept_tokens"))
  }

  // ---- exact-k per-stratum sampling ------------------------------------

  /** Deterministic exact-k sample per stratum — eval/holdout-set
    * construction, where "about p%" (q119's rate sampler) isn't enough
    * and the set must be reproducible: rows are ranked inside each
    * stratum by a salted hash of their id (uncorrelated with any other
    * hash-of-id use) and the k smallest are kept. Same seed ⇒ the same
    * k rows on any cluster size or engine.
    *
    * Scale shape: one hash exchange on the stratum key + a per-stratum
    * window — the q125 domain-cap shape with a hash rank instead of a
    * quality rank. Returns the input columns plus `sample_rank`
    * (1-based within the stratum). */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val clash = df.columns.toSet.intersect(Set("sample_rank", "__sk"))
    require(clash.isEmpty,
      s"exactKPerStratum adds columns ${clash.mkString(", ")} the input " +
        "already has — rename them first")
    val key = TextOps.md5Hex(
      concat(lit(s"evalk:$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__sk"), col(idCol))
    df.withColumn("__sk", key)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__sk")
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * for each anchor, the k pool rows with a DIFFERENT label whose
    * salted pair-hash is smallest. A pure function of (seed, anchor id,
    * candidate id) — the same negatives on any cluster size or engine,
    * and changing the seed draws an independent set (the property rate
    * samplers can't give a pair-mining pipeline).
    *
    * Scale shape: the anchor batch is the CALLER-bounded side (the q50
    * probe contract — mine negatives per training batch, not for the
    * whole corpus at once) and broadcasts; candidates stream past it
    * scan-linear, and the per-anchor window reduces to k rows. For very
    * large pools, pre-filtering candidates to `pair-hash <
    * threshold` is loss-free as long as ≥ k survivors remain per anchor
    * (the k smallest hashes all clear any such threshold) — that knob
    * stays with the caller because only the caller knows pool × batch.
    *
    * Output: (`anchor_id`, `neg_id`, `neg_rank` 1-based). */
  def negativeSample(pool: DataFrame, idCol: String, labelCol: String,
      anchors: DataFrame, k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = anchors.select(col(idCol).as("anchor_id"),
      col(labelCol).as("__albl"))
    val key = TextOps.md5Hex(concat(lit(s"neg:$seed:"),
      col("anchor_id").cast("string"), lit(":"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("__nk"), col(idCol))
    pool.select(col(idCol), col(labelCol))
      .join(broadcast(a), col(labelCol) =!= col("__albl"))
      .withColumn("__nk", key)
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("anchor_id"), col(idCol).as("neg_id"), col("neg_rank"))
  }

  // ---- PII redaction ---------------------------------------------------

  /** PII patterns written to the portable common subset of Java regex
    * (Spark's engine) and RE2 (the oracle's): character classes, bounded
    * repetition and ASCII word boundaries only — no backreferences or
    * lookaround, so both engines match identical spans and the operator
    * is exactly verifiable. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Simple international-ish form: +<cc> <3 digits> <4 digits>. */
  val phonePattern = "\\+\\d[- ]\\d{3}[- ]\\d{4}"

  /** Count of PII matches per class — pure per-row compute, stays in
    * whole-stage codegen, zero exchange at any corpus size. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(emailPattern)),
     regexp_count(text, lit(ipv4Pattern)),
     regexp_count(text, lit(phonePattern)))

  /** Redact all PII classes, applied in a fixed order (email → IPv4 →
    * phone) so the output is deterministic under class overlap. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  // ---- HTML boilerplate extraction --------------------------------------

  /** HTML→text patterns, constrained to the Java-regex ∩ RE2 common
    * subset (no backreferences, explicit whitespace class instead of
    * `\s` whose definition differs between the engines) so the exact
    * chain mirrors into DuckDB oracle SQL. Script/style lose their
    * CONTENT (it is code, not prose); comments and tags drop; the five
    * standard entities decode with `&amp;` LAST (so `&amp;lt;` decodes
    * to the literal `&lt;`, not `<` — no double decode). */
  val scriptPattern = "(?is)<script[^>]*>.*?</script>"
  val stylePattern = "(?is)<style[^>]*>.*?</style>"
  val commentPattern = "(?s)<!--.*?-->"
  val tagPattern = "<[^>]*>"
  val wsRunPattern = "[ \\t\\r\\n]+"
  /** (search, replacement) entity decodes, in application order. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extract visible text from HTML: drop script/style bodies, comments
    * and tags (tags become spaces so adjacent block elements don't fuse
    * words), decode the standard entities, collapse whitespace runs,
    * trim. Pure per-row compute — a chain of codegen'd regexp_replace /
    * replace, zero exchange at any corpus size. Not a parser: good for
    * boilerplate-strip curation, not for DOM-aware extraction. */
  def htmlToText(html: Column): Column = {
    val noCode = regexp_replace(
      regexp_replace(html, scriptPattern, " "), stylePattern, " ")
    val noTags = regexp_replace(
      regexp_replace(noCode, commentPattern, " "), tagPattern, " ")
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (s, r)) =>
      replace(c, lit(s), lit(r))
    }
    trim(regexp_replace(decoded, wsRunPattern, " "))
  }

  /** DuckDB mirror of [[htmlToText]] — the same chain, same order, over
    * the given SQL expression. */
  def htmlToTextSql(e: String): String = {
    def rr(inner: String, pat: String) =
      s"regexp_replace($inner, '$pat', ' ', 'g')"
    val noTags = rr(rr(rr(rr(e, scriptPattern), stylePattern),
      commentPattern), tagPattern)
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (s, r)) =>
      s"replace($c, '$s', '${r.replace("'", "''")}')"
    }
    s"trim(regexp_replace($decoded, '$wsRunPattern', ' ', 'g'))"
  }

  // ---- URL canonicalization (web-corpus curation) ----------------------

  /** Tracking query parameters stripped by [[urlNormalize]]. */
  val trackParamPattern = "(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)"
  /** Two-label public suffixes that push the registered domain to three
    * labels (a pragmatic subset of the public-suffix list — the full
    * list is data, swap it into this alternation). */
  val multiSuffixPattern =
    "(co[.]uk|org[.]uk|ac[.]uk|gov[.]uk|com[.]au|net[.]au|co[.]jp|" +
      "com[.]br|co[.]in|com[.]cn)"
  private val schemePattern = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Canonicalize an absolute http(s) URL for dedup/grouping keys:
    * lowercase scheme and host, drop a default port (:80 http /
    * :443 https), drop the fragment, strip tracking query parameters
    * ([[trackParamPattern]]) wherever they sit in the query string, and
    * drop a left-over dangling `?`/`&`. Path and query VALUE case are
    * preserved (they are significant). Non-http(s) input passes through
    * trimmed and untouched. Pure per-row compute in the Java-regex ∩
    * RE2 portable subset (no group refs in replacements — Java `$1` vs
    * RE2 `\1` differ), zero exchange at any corpus size — same
    * discipline as [[htmlToText]], mirrored by [[urlNormalizeSql]]. */
  def urlNormalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, s"($schemePattern)", 1))
    val rest = regexp_replace(u, schemePattern, "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]+)", 1))
    val tail0 = regexp_replace(rest, "^[^/?#]+", "")
    val host = when(scheme === "http://",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https://", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val noFrag = regexp_replace(tail0, "#.*$", "")
    // strip order matters: non-first tracking params (with their `&`),
    // then a first tracking param with a successor (keep the `?`), then
    // a lone first tracking param, then a dangling separator
    val t1 = regexp_replace(noFrag, s"&$trackParamPattern=[^&#]*", "")
    val t2 = regexp_replace(t1, s"[?]$trackParamPattern=[^&#]*&", "?")
    val t3 = regexp_replace(t2, "[?]" + trackParamPattern + "=[^&#]*$", "")
    val t4 = regexp_replace(t3, "[?&]$", "")
    when(scheme === "http://" || scheme === "https://",
      concat(scheme, host, t4)).otherwise(u)
  }

  /** DuckDB mirror of [[urlNormalize]] — same chain, same order. The
    * input expression is repeated, so feed it a (CTE) column, not a
    * computation. */
  def urlNormalizeSql(e: String): String = {
    def rr(inner: String, pat: String, rep: String) =
      s"regexp_replace($inner, '$pat', '$rep', 'g')"
    val u = s"trim($e)"
    val scheme = s"lower(regexp_extract($u, '($schemePattern)', 1))"
    val rest = rr(u, schemePattern, "")
    val hostport = s"lower(regexp_extract($rest, '^([^/?#]+)', 1))"
    val tail0 = rr(rest, "^[^/?#]+", "")
    val host = s"CASE WHEN $scheme = 'http://' THEN " +
      rr(hostport, ":80$", "") +
      s" WHEN $scheme = 'https://' THEN " + rr(hostport, ":443$", "") +
      s" ELSE $hostport END"
    val noFrag = rr(tail0, "#.*$", "")
    val t1 = rr(noFrag, s"&$trackParamPattern=[^&#]*", "")
    val t2 = rr(t1, s"[?]$trackParamPattern=[^&#]*&", "?")
    val t3 = rr(t2, "[?]" + trackParamPattern + "=[^&#]*$", "")
    val t4 = rr(t3, "[?&]$", "")
    s"CASE WHEN $scheme IN ('http://', 'https://') THEN " +
      s"concat($scheme, $host, $t4) ELSE $u END"
  }

  /** Lowercased host of an absolute URL, any port stripped. */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(regexp_replace(trim(url), schemePattern, ""),
        "^([^/?#]+)", 1)),
      ":[0-9]+$", "")

  /** Registered (pay-level) domain of a URL: the last two host labels,
    * or three when the two-label suffix is in [[multiSuffixPattern]] —
    * the per-domain-cap / domain-mix key for web corpora (q125's
    * `source` generalized to real URLs). Empty when the host has no
    * dot. Mirrored by [[registeredDomainSql]]. */
  def registeredDomain(url: Column): Column = {
    val h = urlHost(url)
    val three = regexp_extract(h, s"([^.]+[.]$multiSuffixPattern)$$", 1)
    val two = regexp_extract(h, "([^.]+[.][^.]+)$", 1)
    when(length(three) > 0, three).otherwise(two)
  }

  /** DuckDB mirror of [[registeredDomain]]. */
  def registeredDomainSql(e: String): String = {
    val h = s"regexp_replace(lower(regexp_extract(" +
      s"regexp_replace(trim($e), '$schemePattern', '', 'g'), " +
      s"'^([^/?#]+)', 1)), ':[0-9]+$$', '', 'g')"
    val three = s"regexp_extract($h, '([^.]+[.]$multiSuffixPattern)$$', 1)"
    val two = s"regexp_extract($h, '([^.]+[.][^.]+)$$', 1)"
    s"CASE WHEN length($three) > 0 THEN $three ELSE $two END"
  }

  // ---- deterministic training-order shuffle ----------------------------

  /** Deterministic global shuffle for training-data ordering: every row
    * is assigned a shard and a dense position within the shard, both
    * pure functions of (seed, id) — rerunning with the same seed on any
    * cluster size reproduces the exact order, and changing the seed
    * draws an independent permutation (md5 of the seeded id is the
    * order key, so the order is uncorrelated with id order and with any
    * other hash-of-id use in the pipeline).
    *
    * Scale shape: shard assignment is a narrow projection; the single
    * exchange is a hash repartition on the shard key and the per-shard
    * ranking is a window partitioned by shard — fully parallel across
    * shards, no global single-partition window anywhere. numShards is
    * the parallelism knob: size it so a shard is one training stream.
    *
    * Returns the input columns plus (shard, pos). */
  def trainOrderShuffle(df: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val clash = df.columns.toSet.intersect(Set("shard", "pos", "__key"))
    require(clash.isEmpty,
      s"trainOrderShuffle adds columns ${clash.mkString(", ")} that the " +
        "input already has — rename them first (withColumn would silently " +
        "overwrite the originals)")
    val idStr = col(idCol).cast("string")
    val key = TextOps.md5Hex(concat(lit(s"$seed:"), idStr))
    val shard = pmod(
      TextOps.portableHash(concat(lit(s"shard:$seed:"), idStr)),
      lit(numShards.toLong))
    // no explicit repartition: the window's partitionBy inserts the
    // identical hash exchange on shard
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__key")
  }

  // ---- temperature-rebalanced stratum sampling -------------------------

  /** Exact integer square root as a Column: ⌊√x⌋ for any long (negatives
    * map to 0). `sqrt` is IEEE-correctly-rounded (identical in every
    * engine) and lands within ±1 of ⌊√x⌋ for every int64; the integer
    * guards repair that — the result is exact, so any engine computing
    * exact ⌊√x⌋ by its own route agrees bit-for-bit. The clamp at
    * ⌊√Long.MaxValue⌋ = 3037000499 keeps both guard squares inside
    * int64 (3037000500² overflows; no long has a larger root). */
  private[graft] def intSqrt(x: Column): Column = {
    val lim = 3037000499L
    val s0 = least(floor(sqrt(x.cast("double"))).cast("long"), lit(lim))
    val s1 = when(s0 * s0 > x, s0 - 1L).otherwise(s0)
    val s2 = when(s1 < lim && (s1 + 1L) * (s1 + 1L) <= x, s1 + 1L)
      .otherwise(s1)
    when(x <= 0L, lit(0L)).otherwise(s2)
  }

  /** Temperature-rebalanced per-stratum sampling (the multilingual
    * τ = 0.5 mixing rule: sample sizes proportional to √n flatten a
    * skewed stratum distribution so large strata stop drowning small
    * ones). Each stratum keeps exactly k = min(n, ⌊√(n·multiplier)⌋)
    * rows — pure integer arithmetic ([[intSqrt]]), so the target sizes
    * and the sampled SET are bit-reproducible on any engine or cluster
    * size. `multiplier` is the scale knob: strata with n ≤ multiplier
    * keep everything, larger strata keep √(n·multiplier) (e.g. m = 16:
    * n = 1024 → 128 kept, n = 16 → all 16).
    *
    * Which k rows: the salted-hash rank of [[exactKPerStratum]] — a
    * deterministic uniform draw uncorrelated with any other hash-of-id
    * use in the pipeline.
    *
    * Scale shape: stratum sizes are a tiny aggregate broadcast back; the
    * rank is one hash exchange on the stratum key + a per-stratum window
    * — the q125/q133 shape with a data-derived k.
    *
    * Returns the input columns plus (n_docs, k_target, sample_rank). */
  def sqrtTemperatureSample(df: DataFrame, stratumCol: String, idCol: String,
      multiplier: Long, seed: String): DataFrame = {
    require(multiplier > 0, s"multiplier must be positive, got $multiplier")
    val clash = df.columns.toSet
      .intersect(Set("n_docs", "k_target", "sample_rank", "__sk"))
    require(clash.isEmpty,
      s"sqrtTemperatureSample adds columns ${clash.mkString(", ")} the " +
        "input already has — rename them first")
    val totals = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("k_target",
        least(col("n_docs"), intSqrt(col("n_docs") * lit(multiplier))))
    val key = TextOps.md5Hex(
      concat(lit(s"sqrtmix:$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__sk"), col(idCol))
    df.withColumn("__sk", key)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(totals), Seq(stratumCol))
      .filter(col("sample_rank") <= col("k_target"))
      .drop("__sk")
  }

  /** Weighted (probability-proportional-to-size) SYSTEMATIC sampling:
    * lay every row's weight on a deterministic number line, pick the
    * rows whose weight interval contains a multiple of the step
    * S = ⌊total / k⌋ — the classic PPS design (sample docs proportional
    * to their token/byte count) with NO randomness: the line order is a
    * salted-hash total order (shard, hash, id), so the picked SET is a
    * pure function of (seed, corpus), reproducible across engines,
    * cluster sizes and reruns, and every arithmetic step is exact
    * int64 (no float inclusion probability can round differently).
    *
    * A row with w > S is picked with certainty; `n_hits` counts the
    * multiples inside the interval (its with-replacement multiplicity;
    * Σ n_hits = ⌊total/S⌋ — exactly k whenever total ≥ k², the
    * practical regime for corpus-sized totals).
    *
    * Scale shape: NO global single-partition window — the prefix sum is
    * two-phase: a per-shard window cumsum (one hash exchange on the
    * shard key) plus per-shard offsets from a numShards-row aggregate
    * collected driver-side (bounded metadata, the OrderStat picked-rank
    * pattern) and broadcast back. An engine stating ONE global cumsum
    * over the same (shard, hash, id) order produces identical
    * positions — that equivalence is what the oracle checks.
    *
    * Returns (idCol, weightCol, pos, n_hits) for picked rows, pos =
    * exclusive start of the row's weight interval. */
  def ppsSystematicSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String, numShards: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val idStr = col(idCol).cast("string")
    val base = df
      .select(col(idCol), col(weightCol).cast("long").as("__w"),
        pmod(TextOps.portableHash(concat(lit(s"pps:$seed:"), idStr)),
          lit(numShards.toLong)).cast("int").as("__shard"),
        TextOps.portableHash(concat(lit(s"ppso:$seed:"), idStr))
          .as("__ok"))
      .filter(col("__w") > 0)
    val wSh = Window.partitionBy(col("__shard"))
      .orderBy(col("__ok"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__cum", sum(col("__w")).over(wSh))
    // shard totals: numShards rows of bounded metadata
    val totals = base.groupBy(col("__shard"))
      .agg(sum(col("__w")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = totals.values.sum
    require(total >= k,
      s"total weight $total < k=$k — every unit is already a pick")
    val step = total / k
    val offsets = (0 until numShards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s, 0L)
    }
    import spark.implicits._
    val offDf = (0 until numShards).map(s => (s, offsets(s)))
      .toDF("__shard", "__off")
    local.join(broadcast(offDf), "__shard")
      .withColumn("__after", col("__off") + col("__cum"))
      .withColumn("pos", col("__after") - col("__w"))
      .withColumn("n_hits",
        expr(s"(__after div $step) - (pos div $step)"))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("__w").as(weightCol), col("pos"),
        col("n_hits"))
  }

  /** EXACT-COUNT stratless split assignment by largest-remainder
    * (Hamilton) apportionment: the corpus is divided into named splits
    * whose SIZES are exactly the apportioned integers (⌊n·wᵢ/W⌋ plus
    * one for the largest remainders — ties by split order), not
    * hash-rate approximations (q126's hash split gives each row an
    * independent 80% chance; this gives EXACTLY the 80% count). Rows
    * rank on a salted md5 order, so membership is a pure function of
    * (seed, corpus) — reproducible across engines and cluster sizes.
    *
    * Scale shape: the global rank is the ppsSystematicSample two-phase
    * shape — per-shard window rank + numShards-row offset metadata —
    * never a global single-partition window; targets come from ONE
    * count (driver scalar) and the weights list.
    *
    * Returns (idCol, split). */
  def apportionedSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Long)], seed: String,
      numShards: Int = 64): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    import spark.implicits._
    val wSum = weights.map(_._2).sum
    val idStr = col(idCol).cast("string")
    val base = df.select(col(idCol),
      pmod(TextOps.portableHash(concat(lit(s"apps:$seed:"), idStr)),
        lit(numShards.toLong)).cast("int").as("__shard"),
      TextOps.md5Hex(concat(lit(s"appo:$seed:"), idStr)).as("__ok"))
    val wSh = Window.partitionBy(col("__shard"))
      .orderBy(col("__ok"), col(idCol))
    val ranked = base.withColumn("__r", row_number().over(wSh).cast("long"))
    val shardCounts = base.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = shardCounts.values.sum
    // largest-remainder targets, then cumulative [lo, hi) rank ranges
    val quots = weights.map { case (name, w) => (name, n * w / wSum, (n * w) % wSum) }
    val leftover = n - quots.map(_._2).sum
    val bump = quots.zipWithIndex
      .sortBy { case ((_, _, rem), i) => (-rem, i) }
      .take(leftover.toInt).map(_._2).toSet
    val targets = quots.zipWithIndex.map { case ((name, b, _), i) =>
      name -> (b + (if (bump(i)) 1L else 0L))
    }
    val bounds = targets.scanLeft(("", 0L)) { case ((_, hi), (name, t)) =>
      (name, hi + t)
    }.sliding(2).map { case Seq((_, lo), (name, hi)) => (name, lo, hi) }.toSeq
    val offsets = (0 until numShards).scanLeft(0L) { (acc, s) =>
      acc + shardCounts.getOrElse(s, 0L)
    }
    val offDf = (0 until numShards).map(s => (s, offsets(s)))
      .toDF("__shard", "__off")
    val globalRank = col("__off") + col("__r") - 1L
    val split = bounds.foldRight(lit(null).cast("string")) {
      case ((name, lo, hi), acc) =>
        when(globalRank >= lo && globalRank < hi, name).otherwise(acc)
    }
    ranked.join(broadcast(offDf), "__shard")
      .select(col(idCol), split.as("split"))
  }

  /** Deterministic STRATIFIED K-FOLD assignment (cross-validation
    * folds): within each stratum, rows rank on a salted md5 order and
    * fold = rank mod k — fold sizes within a stratum differ by at most
    * one (exact balance, not hash-rate approximation), and the
    * assignment is a pure function of (seed, corpus). One hash
    * exchange on the stratum key + a per-stratum window — the
    * q125/q133 shape.
    *
    * Returns the input columns plus `fold` ∈ [0, k). */
  def kFoldAssign(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val clash = df.columns.toSet.intersect(Set("fold", "__fk"))
    require(clash.isEmpty,
      s"kFoldAssign adds columns ${clash.mkString(", ")} the input " +
        "already has — rename them first")
    val key = TextOps.md5Hex(
      concat(lit(s"fold:$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__fk"), col(idCol))
    df.withColumn("__fk", key)
      .withColumn("fold",
        pmod(row_number().over(w).cast("long") - 1L, lit(k.toLong)))
      .drop("__fk")
  }

  /** Per-group QUANTILE TRANSFORM (percentile-rank normalization, the
    * feature-engineering step that maps any distribution to [0, 1]):
    * each value maps to (rank − 1) / (n − 1) with `rank` its 1-based
    * position in the group's (value, id) order — an IEEE quotient of
    * exact integers, endpoints exactly 0 and 1, singleton groups 0.
    * Ties break by id so the rank — and the quotient — is
    * engine-reproducible (the averaged-tie variant is a different
    * contract; this one keeps the map injective per row).
    *
    * One hash exchange + per-group window. Returns the input columns
    * plus (q_rank, quantile). */
  def quantileTransform(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("q_rank", "quantile", "__n"))
    require(clash.isEmpty,
      s"quantileTransform adds columns ${clash.mkString(", ")} the " +
        "input already has — rename them first")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("q_rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("quantile",
        when(col("__n") === 1, 0.0)
          .otherwise((col("q_rank") - 1L).cast("double") /
            (col("__n") - 1L).cast("double")))
      .drop("__n")
  }

  /** Fractional-EPOCH upsampling (training-mix staple: "2.5 epochs of
    * source X"): each row replicates ⌊e⌋ times plus one more for a
    * deterministic hash-chosen fraction of rows — so 2.5 epochs means
    * every row twice and exactly the salted-hash half a third time
    * (reproducible SET, not a random rate). Epochs are per-row values
    * in parts-per-million (pure integers).
    *
    * Scale shape: one narrow projection + posexplode — zero exchange;
    * output rows carry (id, copy_n) so downstream shuffles dedupe
    * nothing silently. */
  def epochUpsample(df: DataFrame, idCol: String, epochsPpm: Column,
      seed: String): DataFrame = {
    val idStr = col(idCol).cast("string")
    val frac = pmod(TextOps.portableHash(
      concat(lit(s"epoch:$seed:"), idStr)), lit(1000000L))
    val copies = (epochsPpm.cast("long") / lit(1000000L)).cast("long") +
      when(frac < pmod(epochsPpm.cast("long"), lit(1000000L)), 1L)
        .otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .select(col(idCol),
        explode(expr("sequence(0, __copies - 1)")).as("copy_n"))
  }

  // ---- percentile-threshold quality filtering --------------------------

  /** Keep each stratum's top (1−p) quantile by `valueCol` — the "drop
    * the worst 60% per language by quality score" curation step, with
    * the cut at an EXACT per-stratum percentile so the kept set is
    * engine-reproducible (q125's rank-cap takes a count; this takes a
    * score distribution cut). Exactness chain: the quality doubles are
    * bit-identical cross-engine (q62), Spark's exact `percentile`
    * matches quantile_cont bit-for-bit (q53), and >= of identical
    * doubles is then deterministic.
    *
    * Scale shape: the input (by contract a SLIM scored projection —
    * ids, stratum, score) is materialized once via localCheckpoint:
    * both the percentile aggregate and the keep filter consume it, and
    * in a lazy diamond Spark would run the upstream scan + score
    * expression (the expensive part at corpus scale) once per consumer
    * — the q127 corpus-mixing rationale. Per-stratum thresholds are a
    * tiny aggregate broadcast back; the filter is then one scan of the
    * checkpointed projection. The builtin exact percentile holds a
    * distinct-value map per stratum — for a stratum whose value
    * cardinality rivals memory, run [[graft.agg.OrderStat]] per stratum
    * instead (the q29 parallel-selection pattern); strata here are
    * languages, a handful of groups.
    *
    * Returns the input rows that survive, plus the stratum threshold. */
  def percentileThresholdFilter(df: DataFrame, stratumCol: String,
      valueCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val clash = df.columns.toSet.intersect(Set("threshold"))
    require(clash.isEmpty,
      "percentileThresholdFilter adds column threshold — rename the " +
        "input's first")
    val scored = df.localCheckpoint(true)
    val thr = scored.groupBy(col(stratumCol))
      .agg(expr(s"percentile($valueCol, $p)").as("threshold"))
    scored.join(broadcast(thr), Seq(stratumCol))
      .filter(col(valueCol) >= col("threshold"))
  }

  // ---- cross-document duplicated-substring spans -----------------------

  /** Find maximal duplicated substring spans: every `widthTokens`-token
    * SLIDING window (stride 1, so duplicates are caught at any token
    * alignment — the property [[spanDedup]]'s disjoint tiling gives up)
    * is hashed; windows whose content appears in ≥ `minDocFreq` distinct
    * documents are flagged; per document, overlapping flagged windows
    * merge into maximal spans. This is the fixed-width form of
    * suffix-style training-data dedup ("drop any ≥ W-token substring
    * that repeats across the corpus"): a duplicated run of L ≥ W tokens
    * produces L − W + 1 flagged windows that merge back into exactly the
    * [start, start+L) span.
    *
    * Scale shape: the window explode is scan-local and linear in token
    * count (one row per token position, each (id, start, 16-byte md5) —
    * span text never leaves the scan); the frequency aggregate shuffles
    * those narrow triples; the flagged-hash set is Zipf-tiny and
    * broadcasts (`broadcastFrequent = false` for adversarial corpora);
    * the merge is one hash exchange on doc id + an ordered window.
    *
    * Returns (idCol, span_i, span_start, span_len, n_windows): span_i
    * numbers a document's spans by position from 1, span_len counts
    * tokens, n_windows the flagged windows the span merged. Documents
    * with no duplicated window produce no rows. */
  def dupSubstringSpans(df: DataFrame, idCol: String, textCol: String,
      widthTokens: Int, minDocFreq: Long,
      broadcastFrequent: Boolean = true): DataFrame = {
    require(widthTokens > 0, s"widthTokens must be positive, got $widthTokens")
    require(minDocFreq > 1, s"minDocFreq must be > 1, got $minDocFreq")
    val wins = slidingWindowHashes(df, idCol, textCol, widthTokens)
    val dup0 = wins.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__h"))
    val dup = if (broadcastFrequent) broadcast(dup0) else dup0
    mergeWindowIslands(wins.join(dup, Seq("__h"), "left_semi"),
      idCol, widthTokens)
  }

  /** Span-level train/test decontamination: flag every maximal span of a
    * `train` document whose `widthTokens`-token sliding windows appear
    * verbatim anywhere in `test` — the positional form of [[graft.dedup.Dedup.decontaminationTags]]
    * (which only counts overlaps): knowing WHERE the contamination sits
    * lets a pipeline redact the span instead of dropping the document.
    *
    * Scale shape: the test side reduces to a distinct window-hash set
    * and broadcasts (`broadcastTest = false` degrades to a shuffle join
    * on the 16-byte hash for an outsized test corpus); the train side is
    * the [[dupSubstringSpans]] shape — scan-local window hashing, narrow
    * triples on every exchange, island merge on one doc-id exchange.
    *
    * Returns (idCol, span_i, span_start, span_len, n_windows) — same
    * contract as [[dupSubstringSpans]]; clean documents produce no rows. */
  def contaminationSpans(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, widthTokens: Int,
      broadcastTest: Boolean = true): DataFrame = {
    require(widthTokens > 0, s"widthTokens must be positive, got $widthTokens")
    val testWins0 = slidingWindowHashes(test, idCol, textCol, widthTokens)
      .select(col("__h")).distinct()
    val testWins = if (broadcastTest) broadcast(testWins0) else testWins0
    val flagged = slidingWindowHashes(train, idCol, textCol, widthTokens)
      .join(testWins, Seq("__h"), "left_semi")
    mergeWindowIslands(flagged, idCol, widthTokens)
  }

  /** (idCol, s, __h): every full-width sliding token window as
    * (start, md5-of-span) — the compiled TokenWindows build at stride 1.
    * Sub-width documents emit one short window — dropped, they cannot
    * contain a width-token substring. Scan-local; span text never
    * leaves the projection. */
  private def slidingWindowHashes(df: DataFrame, idCol: String,
      textCol: String, widthTokens: Int): DataFrame =
    df.select(col(idCol),
        explode(call_function("token_windows", col(textCol),
          lit(widthTokens), lit(1))).as("c"))
      .filter(col("c.n_tokens") === widthTokens)
      .select(col(idCol), col("c.tok_start").cast("long").as("s"),
        md5(col("c.span").cast("binary")).as("__h"))

  /** Gaps-and-islands merge of flagged (idCol, s) windows into maximal
    * [span_start, span_start + span_len) spans: a window starts a new
    * span iff it begins past every earlier window's end (starts are
    * unique per doc, so the running sum's default frame is
    * deterministic). One hash exchange on doc id; all three windows
    * reuse that partitioning. */
  private def mergeWindowIslands(flagged: DataFrame, idCol: String,
      widthTokens: Int): DataFrame = {
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("s"))
    val prevEnd = max(col("s") + lit(widthTokens.toLong))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    flagged
      .withColumn("__new",
        when(prevEnd.isNull || col("s") > prevEnd, 1L).otherwise(0L))
      .withColumn("__g", sum(col("__new")).over(wOrd))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("s")).as("span_start"),
        (max(col("s")) + lit(widthTokens.toLong) - min(col("s"))).as("span_len"),
        count(lit(1)).as("n_windows"))
      .withColumn("span_i", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("span_start"))).cast("long"))
      .select(col(idCol), col("span_i"), col("span_start"),
        col("span_len"), col("n_windows"))
  }
}
