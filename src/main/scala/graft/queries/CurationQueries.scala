package graft.queries

import graft.dedup.Clusters
import graft.text.{Curation, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation completion operators (round 9): near-dup cluster
  * resolution (q121), sequence packing (q122), PII redaction (q123) and
  * deterministic training-order shuffling (q124) — the steps between
  * "pairs/scores computed" and "training batches written" that a 100 TB
  * corpus build runs after the q60-q75 scoring/dedup stages.
  */
object CurationQueries {
  import Tables._
  import TextDedupQueries.{toksSql, jacSql, sigCtes, bandSql,
    numHashes, numBands, shingleK, jaccardThreshold}

  type Q = (SparkSession, String) => DataFrame

  private val packShards = 8
  private val packBudget = 256L
  private val shuffleSeed = "r9"
  private val shuffleShards = 8

  val queries: Map[String, Q] = Map(
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
    }
  )

  // ---- oracles --------------------------------------------------------

  val oracles: Map[String, String] = Map(
    // q66's confirmed-pair pipeline verbatim, then min-label reachability
    // as a recursive closure — exactly the fixpoint the pointer-jumping
    // Spark iteration converges to.
    "q121_neardup_clusters" ->
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
         |  SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a)
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
         |FROM s ORDER BY doc_id""".stripMargin
  )
}
