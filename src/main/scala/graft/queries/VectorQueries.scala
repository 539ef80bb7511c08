package graft.queries

import graft.api.DataStream
import graft.functions.Det
import graft.vector.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector/numeric operator coverage (SURVEY §2.10 + §2.5 quantiles). */
object VectorQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** q171 fixture: the persisted IVF index, built ONCE per (JVM,
    * fixture dir) — both probe passes and every bench rep share
    * snapshot v1 (the buildMorTable discipline); swept at JVM exit. */
  private val ivfDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtIvfIndex(s: SparkSession, d: String): String =
    ivfDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q171_ivf").toString
      GateQueries.sweepAtExit.add(dir)
      graft.vector.IvfIndex.build(embeddings(s, d), "embedding", "vec_id",
        dir, nlist = 8, seed = 42L)
      dir
    })

  /** q174 fixture: base index (vec_id >= 5) + one incremental append
    * (vec_id < 5) — built ONCE per (JVM, fixture dir). */
  private val ivfAppendDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtIvfAppendIndex(s: SparkSession, d: String): String =
    ivfAppendDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q174_ivf_append").toString
      GateQueries.sweepAtExit.add(dir)
      val emb = embeddings(s, d)
      graft.vector.IvfIndex.build(emb.filter(col("vec_id") >= 5),
        "embedding", "vec_id", dir, nlist = 8, seed = 42L)
      graft.vector.IvfIndex.append(emb.filter(col("vec_id") < 5),
        "embedding", "vec_id", dir)
      dir
    })

  /** q176 fixture: the IVF_PQ index, built ONCE per (JVM, fixture). */
  private val pqDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtPqIndex(s: SparkSession, d: String): String =
    pqDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q176_pq").toString
      GateQueries.sweepAtExit.add(dir)
      graft.vector.PqIndex.build(embeddings(s, d), "embedding", "vec_id",
        dir, nlist = 8, m = 16, dim = 64, seed = 42L)
      dir
    })

  /** DuckDB mirror of VectorOps.normalized: unit-scaled double list. */
  private[queries] def duckNorm(v: String): String =
    s"list_transform($v, x -> x::DOUBLE / " +
      s"sqrt(list_sum(list_transform(range(1, 65), i -> $v[i]::DOUBLE * $v[i]::DOUBLE))))"

  /** Dot of two pre-normalized list columns (= cosine). */
  private[queries] def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"

  /** Per-probe multiset equality of (vec_id, rank): signed tags sum to
    * zero in every group iff the two sides agree — shared by the
    * q171/q173 consistency flags. */
  private def probeSetEq(x: DataFrame, y: DataFrame, flag: String): DataFrame =
    x.withColumn("__s", lit(1)).unionByName(y.withColumn("__s", lit(-1)))
      .groupBy(col("probe_id"), col("vec_id"), col("rank"))
      .agg(sum(col("__s")).as("__d"))
      .groupBy(col("probe_id"))
      .agg((max(abs(col("__d"))) === 0).cast("long").as(flag))

  val queries: Map[String, Q] = Map(
    // hybrid retrieval: reciprocal-rank fusion of the q157 BM25 lexical
    // ranking with the q50 cosine vector ranking, per probe — the
    // integer-exact `scale div (K + rank)` RRF score makes the fused
    // value itself cross-engine-reproducible, not just the order.
    "q213_hybrid_rrf" -> { (s, d) =>
      val C = 50
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 3)
        .withColumnRenamed("vec_id", "probe_id")
      val vecTop = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = C)
        .select(col("probe_id"), col("vec_id").as("doc_id"), col("rank"))
      // the lexical list is global (fixed query-term set) and top-C
      // bounded; rank it once, then fan it out to the probes with a pure
      // projection — the probe ids are a bounded driver set (the q50
      // probe-batch contract), so explode(lit(ids)) replaces any join
      val txtRank = graft.text.CorpusOps.bm25TopK(Tables.documents(s, d),
          "doc_id", "text", CurationQueries.bm25Terms, C)
        .select(col("doc_id"), row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id").asc)).as("rank"))
      val probeIds: Array[Long] = probes.select(col("probe_id"))
        .distinct().collect().map(_.getLong(0)).sorted
      val txtPerProbe = txtRank.select(
        explode(lit(probeIds)).as("probe_id"), col("doc_id"), col("rank"))
      graft.text.CorpusOps.rrfFuse(vecTop, txtPerProbe, "probe_id",
          "doc_id", "rank", k = 10)
        .withColumnRenamed("r_a", "r_vec").withColumnRenamed("r_b", "r_txt")
        .orderBy(col("probe_id"), col("rank"))
    },

    // brute-force cosine top-k nn join (reference vector_nn_join,
    // datastream.py:396-476); probes = first 5 vectors of the table.
    "q50_vector_nn" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      VectorOps.nnJoin(emb, probes, "embedding", "vec_id", "probe_id", k = 10)
        .orderBy(col("probe_id"), col("rank"))
    },

    // LSH-bucketed ANN variant of q50 (graft.vector.Ann): sign-LSH
    // pruning, then within-bucket cosine top-k.
    "q55_ann_lsh" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      graft.vector.Ann.annJoin(emb, probes, "embedding", "vec_id", "probe_id",
        k = 10, numBits = 4)
        .orderBy(col("probe_id"), col("rank"))
    },

    // Sign-random-projection (JL) dimensionality reduction: 64 → 8
    // dims through a hash-derived ±1 matrix (no RNG — both engines
    // build the identical matrix from the seed). Pure codegen'd
    // projection, zero exchange; the oracle states the same fixed
    // left-associated sum chain with the same literal signs.
    "q199_jl_projection" -> { (s, d) =>
      VectorOps.signRandomProjection(embeddings(s, d), "vec_id",
        "embedding", inDim = 64, outDim = 8, seed = "jl11")
        .orderBy("vec_id")
    },

    // int8-quantized ANN: the q50 plan on symmetric-quantized vectors —
    // the quantized dot is integer-exact (127²·64 ≪ 2⁵³), so unlike
    // the float cosine the score itself is engine-reproducible with no
    // tolerance; 4-byte dims become 1 byte at the storage boundary.
    "q165_quantized_nn" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      VectorOps.quantizedNnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .orderBy(col("probe_id"), col("rank"))
    },

    // PERSISTENT IVF index (vector.IvfIndex over the Snapshots layer —
    // the stored-index half of the reference's Lance IVF_PQ pushdown,
    // df.py:1264-1318): the index is BUILT ONCE (memoized per fixture;
    // both probe passes and every bench rep reuse snapshot v1), probed
    // twice, and cross-checked against the per-query-refit ivfJoin and
    // the exact brute force. KMeans cells have no SQL mirror, so the
    // gate is q54's bound-flag pattern: the oracle states the flags as
    // literal 1s while the engine computes them from real comparisons —
    // probe-twice stability, stored-vs-refit row equality, self-match
    // in top-k (a probe's own cell is by construction its rank-1 cell),
    // recall ≥ 0.4 vs brute force, and index version pinned at 1 (a
    // second build would bump HEAD and fail ok_version).
    "q171_ivf_persistent" -> { (s, d) =>
      val dir = builtIvfIndex(s, d)
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      def stored() = graft.vector.IvfIndex
        .probe(probes, "embedding", "probe_id", dir, k = 10, nprobe = 3)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"))
      val s1 = stored(); val s2 = stored()
      val rebuilt = graft.vector.Ann.ivfJoin(emb, probes, "embedding",
          "vec_id", "probe_id", k = 10, nlist = 8, nprobe = 3, seed = 42L)
        .select(col("probe_id"), col("vec_id"), col("rank"))
      val exact = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"))
      val stable = probeSetEq(s1, s2, "ok_stable")
      val refit = probeSetEq(s1, rebuilt, "ok_refit")
      val self = s1.groupBy(col("probe_id"))
        .agg(max(when(col("vec_id") === col("probe_id"), 1L).otherwise(0L))
          .as("ok_self"))
      val recall = exact.join(
          s1.select(col("probe_id"), col("vec_id")).withColumn("__hit", lit(1L)),
          Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) * 10L >=
          count(lit(1)) * 4L).cast("long").as("ok_recall"))
      val okVersion =
        if (graft.vector.IvfIndex.currentVersion(dir).contains(1L)) 1L else 0L
      stable.join(refit, "probe_id").join(self, "probe_id")
        .join(recall, "probe_id")
        .select(col("probe_id"), lit(okVersion).as("ok_version"),
          col("ok_stable"), col("ok_refit"), col("ok_self"), col("ok_recall"))
        .orderBy("probe_id")
    },

    // per-label embedding CENTROID drift (r14): the vector-column
    // member of the drift tier — per (label, dim) exact-decimal mean
    // vs the global mean, Det.davg keeping the float sums
    // order-independent; which dimensions moved is the readout.
    "q241_embedding_drift" -> { (s, d) =>
      VectorOps.centroidDriftByGroup(embeddings(s, d), "embedding",
          "label")
        .orderBy("label", "dim")
    },

    // retrieval evaluation (precision@k / recall@k / reciprocal rank)
    // of the engine's own search surface: q50's cosine top-10 graded
    // against label-match relevance (same-label docs, self excluded).
    // Exact-integer counts, single-IEEE-quotient ratios — NDCG's log2
    // discount is deliberately out of the catalog's exactness bar.
    "q221_retrieval_eval" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      val results = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"), col("rank"))
      val qrels = probes.select(col("probe_id"), col("label").as("__pl"))
        .join(emb.select(col("vec_id"), col("label")),
          col("label") === col("__pl") && col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"))
      graft.agg.Eval.retrievalMetrics(results, qrels, "probe_id",
          "vec_id", "rank", k = 10)
        .orderBy("probe_id")
    },

    // GRADED nDCG@10 (Eval.ndcgAtK, r15): the standard ranking metric
    // q221's binary P@k/MRR can't express. Graded relevance = label
    // proximity (grade 3 same label, 2/1 at distance 1/2, self
    // excluded) over the same q50 probe pipeline. The discount table
    // is a shared-literal contract (Eval.ndcgDiscounts) and every
    // per-query sum a sorted-array left fold, so the oracle restates
    // the identical IEEE arithmetic — a hash gate on a log-based
    // metric.
    "q246_ndcg" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      val results = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"), col("rank"))
      val qrels = probes.select(col("probe_id"), col("label").as("__pl"))
        .join(emb.select(col("vec_id"), col("label")),
          col("vec_id") =!= col("probe_id") &&
            abs(col("label") - col("__pl")) <= 2)
        .select(col("probe_id"), col("vec_id"),
          (lit(3) - abs(col("label") - col("__pl"))).as("grade"))
      graft.agg.Eval.ndcgAtK(results, qrels, "probe_id", "vec_id",
          "rank", "grade", k = 10)
        .orderBy("probe_id")
    },

    // Average precision @10 (Eval.apAtK, r16 — the MAP family): the
    // last standard retrieval metric q221 (P@k/MRR) and q246 (nDCG)
    // don't cover — rank-position-sensitive like nDCG but on binary
    // relevance, so it pairs with q221's same-label qrels. Each P@r
    // contribution is an IEEE quotient of small exact integers summed
    // in rank order by the sorted left fold — a full hash gate.
    "q249_map_eval" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      val results = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"), col("rank"))
      val qrels = probes.select(col("probe_id"), col("label").as("__pl"))
        .join(emb.select(col("vec_id"), col("label")),
          col("label") === col("__pl") && col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"))
      graft.agg.Eval.apAtK(results, qrels, "probe_id", "vec_id",
          "rank", k = 10)
        .orderBy("probe_id")
    },

    // ARRAY-layout wide quantiles (r17, the winsorize baseline's
    // apples-to-apples storage layout): per-element t-digest quantiles
    // over the embeddings table's 64-dim float arrays in ONE pass —
    // the single-field schema that keeps a 10k-feature parquet scan on
    // the vectorized reader where a 10k-COLUMN schema falls off at
    // spark.sql.codegen.maxFields (WideQuantiles.quantilesOfArray).
    // Gate = q245's CDF rank-band flags at three element positions ×
    // three quantiles, evaluated against the ORIGINAL array elements.
    "q250_wide_quantiles_array" -> { (s, d) =>
      val emb = embeddings(s, d)
      val ps = Seq(0.1, 0.5, 0.9)
      val qdf = new DataStream(emb)
        .approximateQuantileWideArray("embedding", 64, ps).df
      def ok(j: Int)(i: Int) =
        GateQueries.cdfFlag(element_at(col("embedding"), j + 1),
          element_at(col(s"f${j}_quantiles"), i + 1), ps(i), 0.02,
          s"ok_e${j}_q${(ps(i) * 100).toInt}")
      emb.join(broadcast(qdf))
        .agg(ok(0)(0), ok(0)(1), ok(0)(2),
          ok(31)(0), ok(31)(1), ok(31)(2),
          ok(63)(0), ok(63)(1), ok(63)(2))
    },

    // winsorizeArray end-to-end (r17 — the array twin of q247's
    // composition gate): ONE API hop from the per-element t-digest
    // pass to the element-wise clip, gated against the ORIGINAL
    // elements. Flags per sampled position (0/31/63): (a) the clipped
    // extremes ARE the sketch bounds — min/max of the clipped element
    // sits at the 0.1/0.9 CDF rank of the original distribution
    // (±0.02, the q245/q250 band); (b) winsorizing strictly reduces
    // per-element var_pop (20% of mass is clipped — far beyond sketch
    // error). The q250 gate pins the QUANTILE readout; this one pins
    // the CLIP that consumes it.
    "q251_winsorize_array" -> { (s, d) =>
      val emb = embeddings(s, d)
      val clipped = new DataStream(emb)
        .winsorizeArray("embedding", 64, 0.1, 0.9).df
      val poss = Seq(0, 31, 63)
      def el(j: Int) = element_at(col("embedding"), j + 1).cast("double")
      val mm = clipped.agg(
        poss.flatMap(j => Seq(
          min(el(j)).as(s"lo_$j"), max(el(j)).as(s"hi_$j"))).head,
        poss.flatMap(j => Seq(
          min(el(j)).as(s"lo_$j"), max(el(j)).as(s"hi_$j"))).tail: _*)
      val varC = clipped.agg(
        poss.map(j => var_pop(el(j)).as(s"vc_$j")).head,
        poss.map(j => var_pop(el(j)).as(s"vc_$j")).tail: _*)
      val varR = emb.agg(
        poss.map(j => var_pop(el(j)).as(s"vr_$j")).head,
        poss.map(j => var_pop(el(j)).as(s"vr_$j")).tail: _*)
      val flags =
        poss.flatMap { j =>
          Seq(
            GateQueries.cdfFlag(el(j), col(s"lo_$j"), 0.1, 0.02,
              s"ok_lo_$j"),
            GateQueries.cdfFlag(el(j), col(s"hi_$j"), 0.9, 0.02,
              s"ok_hi_$j"),
            (min(col(s"vc_$j")) < min(col(s"vr_$j")))
              .cast("int").as(s"ok_var_$j"))
        }
      emb.join(broadcast(mm)).join(broadcast(varC)).join(broadcast(varR))
        .agg(flags.head, flags.tail: _*)
    },

    // FILTERED vector search (predicate-constrained ANN — the
    // vector-DB `search(filter=...)` feature on the stored q171 index):
    // top-k among the even-label ids only, PRE-filter semantics (the
    // allowed-id semi-join runs before the top-k cut, so the probe
    // still fills k valid results). Flags: every result satisfies the
    // predicate, result stable across probes, recall ≥ 40% vs the
    // exact FILTERED brute force; n_res pins the k-fill (a post-filter
    // implementation would return < k and break the hash).
    "q218_ivf_filtered" -> { (s, d) =>
      val dir = builtIvfIndex(s, d)
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      val allowed = emb.filter(col("label") % 2 === 0).select(col("vec_id"))
      def f() = graft.vector.IvfIndex
        .probeFiltered(probes, "embedding", "probe_id", dir, k = 10,
          allowed, nprobe = 3)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"))
      val f1 = f(); val f2 = f()
      val stable = probeSetEq(f1, f2, "ok_stable")
      val pred = f1
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("probe_id"))
        .agg((max(pmod(col("label"), lit(2))) === 0).cast("long")
          .as("ok_pred"))
      val exactF = VectorOps.nnJoin(emb.filter(col("label") % 2 === 0),
          probes, "embedding", "vec_id", "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"))
      val recall = exactF.join(
          f1.select(col("probe_id"), col("vec_id"))
            .withColumn("__hit", lit(1L)),
          Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) * 10L >=
          count(lit(1)) * 4L).cast("long").as("ok_recall"))
      val nres = f1.groupBy(col("probe_id")).agg(count(lit(1)).as("n_res"))
      stable.join(pred, "probe_id").join(recall, "probe_id")
        .join(nres, "probe_id")
        .select(col("probe_id"), col("n_res"), col("ok_stable"),
          col("ok_pred"), col("ok_recall"))
        .orderBy("probe_id")
    },

    // q171's index probed through the cell-PARTITION-PRUNED scan path:
    // assignments are hive-partitioned by cell, the probe collects its
    // (bounded: nprobe × |probes|) cell union and filters BEFORE the
    // join, so Spark prunes the non-probed cells' directories at
    // planning — a probe touching p of nlist cells reads p/nlist of
    // the index bytes at any corpus size. Gated on (a) row equality
    // with the unpruned plan per probe, (b) the executed plan actually
    // carrying a cell partition filter (flag computed from the plan at
    // build, q172's pattern).
    "q173_ivf_pruned" -> { (s, d) =>
      val dir = builtIvfIndex(s, d)
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      def run(prune: Boolean) = graft.vector.IvfIndex
        .probe(probes, "embedding", "probe_id", dir, k = 10, nprobe = 3,
          prunePartitions = prune)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"))
      val pruned = run(true)
      val plan = pruned.queryExecution.executedPlan.toString
      val okPlanPruned =
        if ("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined)
          1L else 0L
      probeSetEq(pruned, run(false), "ok_same_unpruned")
        .select(col("probe_id"), lit(okPlanPruned).as("ok_plan_pruned"),
          col("ok_same_unpruned"))
        .orderBy("probe_id")
    },

    // INCREMENTAL index maintenance (the Lance append semantics): the
    // fixture builds on vec_id >= 5 and APPENDS the vec_id < 5 batch —
    // assigned to the existing centroids with the probe side's own
    // cell ranking (so a fresh vector's cell IS its probe's rank-1
    // cell), committed as an append snapshot: batch-sized write, no
    // refit, no table rewrite. Gated on: appended vectors self-found
    // at HEAD, ABSENT from pinned v1 (time travel), version == 2, and
    // the exactly-once invariant n_index == count(embeddings) — a real
    // value the oracle states from the source table.
    "q174_ivf_append" -> { (s, d) =>
      val dir = builtIvfAppendIndex(s, d)
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      def probeAt(v: Long) = graft.vector.IvfIndex
        .probe(probes, "embedding", "probe_id", dir, k = 5, nprobe = 2,
          snapshotId = Some(v))
        .select(col("probe_id"), col("id").as("vec_id"))
      def selfFlag(df: DataFrame, flag: String, expect: Long) =
        df.groupBy(col("probe_id"))
          .agg((max(when(col("vec_id") === col("probe_id"), 1L)
            .otherwise(0L)) === expect).cast("long").as(flag))
      val okVersion =
        if (graft.vector.IvfIndex.currentVersion(dir).contains(2L)) 1L else 0L
      val nIndex = graft.sources.Snapshots
        .read(s, s"$dir/assignments", Some(2L)).count()
      selfFlag(probeAt(2L), "ok_self_head", 1L)
        .join(selfFlag(probeAt(1L), "ok_absent_v1", 0L), "probe_id")
        .select(col("probe_id"), lit(okVersion).as("ok_version"),
          col("ok_self_head"), col("ok_absent_v1"),
          lit(nIndex).as("n_index"))
        .orderBy("probe_id")
    },

    // IVF_PQ (vector.PqIndex — the PQ half that completes the
    // reference's Lance IVF_PQ shape): 16 per-subspace 16-code
    // codebooks pack every 64-dim vector into ONE int64 (32×
    // compression at the storage boundary — the only payload the probe
    // join moves besides ids), probed by asymmetric-distance tables
    // precomputed once per probe row on the broadcast side, over the
    // cell-pruned partition layout. KMeans codebooks have no SQL
    // mirror → q54-pattern flags: probe-twice stability, per-probe
    // recall ≥ 0.2 vs exact brute force at k=10/nprobe=4, version
    // pinned at 1, the one-long-per-vector storage property, and the
    // exactly-once code count as a REAL value stated from the source.
    "q176_ivf_pq" -> { (s, d) =>
      val dir = builtPqIndex(s, d)
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "probe_id")
      def stored() = graft.vector.PqIndex
        .probe(probes, "embedding", "probe_id", dir, k = 10, nprobe = 4)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"))
      val s1 = stored()
      val exact = VectorOps.nnJoin(emb, probes, "embedding", "vec_id",
          "probe_id", k = 10)
        .select(col("probe_id"), col("vec_id"))
      val stable = probeSetEq(s1, stored(), "ok_stable")
      val recall = exact.join(
          s1.select(col("probe_id"), col("vec_id")).withColumn("__hit", lit(1L)),
          Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) * 10L >=
          count(lit(1)) * 2L).cast("long").as("ok_recall"))
      val codes = graft.sources.Snapshots.read(s, s"$dir/codes", Some(1L))
      val okVersion =
        if (graft.vector.PqIndex.currentVersion(dir).contains(1L)) 1L else 0L
      val okOneLong =
        if (codes.schema("code").dataType ==
          org.apache.spark.sql.types.LongType) 1L else 0L
      val nCodes = codes.count()
      stable.join(recall, "probe_id")
        .select(col("probe_id"), lit(okVersion).as("ok_version"),
          lit(okOneLong).as("ok_one_long"), col("ok_stable"),
          col("ok_recall"), lit(nCodes).as("n_codes"))
        .orderBy("probe_id")
    },

    // gramian over numeric columns (reference datastream.py:1033).
    // detScale=4: every product here is an (at most) 4-decimal grid
    // value, so the rounding is exact and the decimal sum is order-
    // independent — deterministic at any parallelism.
    "q51_gramian" -> { (s, d) =>
      VectorOps.gramian(lineitem(s, d), Seq("l_quantity", "l_discount", "l_tax"),
        detScale = Some(4))
    },

    // pairwise covariance (reference datastream.py:1100); detScale=4
    // keeps price² rows under the 2^53/10^scale exactness cap.
    "q52_covariance" -> { (s, d) =>
      VectorOps.covariance(lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"), detScale = Some(4))
    },

    // exact interpolated quantiles (oracle-verifiable; the approximate
    // path is q54), via OrderStat's range-exchange selection — the
    // scale path. The previous `percentile(col, array(...))` shared one
    // value-count map across the four points (itself 4× faster than
    // four scalar calls) but still merged a row-count-sized boxed map:
    // 1.8 s at sf0.1 vs ~0.5 s for the order-statistics form, and an
    // executor OOM at corpus scale.
    "q53_exact_quantile" -> { (s, d) =>
      val qs = graft.agg.OrderStat.exactPercentiles(
        lineitem(s, d), "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.95))
      s.range(1).select(lit(qs(0)).as("q25"), lit(qs(1)).as("q50"),
        lit(qs(2)).as("q75"), lit(qs(3)).as("q95"))
    },

    // approximate quantiles (reference approximate_quantile,
    // datastream.py:905-1031 — t-digest there, Greenwald-Khanna here).
    // The approximation itself can't be value-compared across engines
    // (algorithms differ by design), so the gate emits integer BOUND
    // CHECKS: for each p, the achieved rank fraction count(x <= q̂)/n
    // must sit within p ± ε (ε = 1/accuracy rank error, plus tie slack)
    // — an exact 0/1 the DuckDB oracle states as literal 1s. This turns
    // the previously ungated headline operator into a hard oracle gate
    // while still allowing any valid sketch.
    "q54_approx_quantile" -> { (s, d) =>
      val li = lineitem(s, d)
      val qs = li.agg(
        expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("q25"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("q50"),
        expr("approx_percentile(l_extendedprice, 0.75, 10000)").as("q75"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("q95"))
      def ok(p: Double, qcol: String) =
        GateQueries.cdfFlag(col("l_extendedprice"), col(qcol), p, 5e-4,
          s"ok_$qcol")
      li.join(broadcast(qs))
        .agg(ok(0.25, "q25"), ok(0.5, "q50"), ok(0.75, "q75"), ok(0.95, "q95"))
    },

    // deterministic contrastive negative mining (Curation
    // .negativeSample): for each of the 20 anchor vectors, the 5
    // different-label pool rows with the smallest salted pair-hash —
    // a pure function of (seed, anchor, candidate), stated verbatim by
    // the oracle's window. Anchors broadcast (the q50 bounded-batch
    // contract); candidates stream scan-linear.
    "q182_negative_sampling" -> { (s, d) =>
      val emb = embeddings(s, d).select(col("vec_id"), col("label"))
      graft.text.Curation.negativeSample(emb, "vec_id", "label",
          emb.filter(col("vec_id") < 20), k = 5, seed = "r11")
        .orderBy(col("anchor_id"), col("neg_rank"))
    }
  )

  lazy val oracles: Map[String, String] = Map(
    // RRF hybrid fusion: the q50 cosine-rank CTE (probes = vec_id < 3,
    // top-50) + the q157 rational-BM25 CTE (top-50, score > 0) fused by
    // the integer-exact `scale // (60 + rank)` contribution, sentinel 0
    // for a missing side, rrf-desc/doc-id tie-break, top-10 cut.
    "q213_hybrid_rrf" -> {
      val terms = CurationQueries.bm25Terms
      val tfSelects = terms.map(t =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$t")
      val dfSelects = terms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_tf_$t")
      val termSql = terms.map { t =>
        s"((CAST(n_docs AS DOUBLE) - CAST(df_tf_$t AS DOUBLE) + 1.0) / " +
          s"(CAST(df_tf_$t AS DOUBLE) + 1.0)) * " +
          s"((22.0 * CAST(tf_$t AS DOUBLE) * CAST(total_len AS DOUBLE)) / " +
          s"(10.0 * CAST(tf_$t AS DOUBLE) * CAST(total_len AS DOUBLE) + " +
          s"3.0 * CAST(total_len AS DOUBLE) + " +
          s"9.0 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)))"
      }.mkString(" + ")
      s"""WITH ne AS (SELECT vec_id, ${duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT p.vec_id AS probe_id, e.vec_id AS doc_id,
         |    ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM ne e CROSS JOIN (SELECT * FROM ne WHERE vec_id < 3) p),
         |vrank AS (
         |  SELECT probe_id, doc_id, CAST(rnk AS BIGINT) AS r_vec
         |  FROM (SELECT probe_id, doc_id,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY sim DESC, doc_id) AS rnk FROM sims)
         |  WHERE rnk <= 50),
         |toks AS (SELECT doc_id, ${TextDedupQueries.toksSql("text")} AS t FROM documents),
         |tbase AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         |  ${tfSelects.mkString(",\n  ")} FROM toks),
         |tstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dl) AS BIGINT) AS total_len,
         |  ${dfSelects.mkString(",\n  ")} FROM tbase),
         |tscored AS (SELECT doc_id, $termSql AS score FROM tbase, tstats),
         |trank AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |    AS BIGINT) AS r_txt
         |  FROM (SELECT doc_id, score FROM tscored WHERE score > 0.0
         |        ORDER BY score DESC, doc_id LIMIT 50)),
         |tp AS (SELECT p.probe_id, t.doc_id, t.r_txt
         |  FROM (SELECT DISTINCT vec_id AS probe_id FROM embeddings
         |        WHERE vec_id < 3) p CROSS JOIN trank t),
         |fused AS (SELECT coalesce(v.probe_id, t.probe_id) AS probe_id,
         |    coalesce(v.doc_id, t.doc_id) AS doc_id,
         |    coalesce(v.r_vec, 0) AS r_vec, coalesce(t.r_txt, 0) AS r_txt
         |  FROM vrank v FULL OUTER JOIN tp t
         |    ON v.probe_id = t.probe_id AND v.doc_id = t.doc_id),
         |sc AS (SELECT probe_id, doc_id, r_vec, r_txt,
         |    CAST(CASE WHEN r_vec > 0 THEN 1000000000000 // (60 + r_vec)
         |          ELSE 0 END
         |      + CASE WHEN r_txt > 0 THEN 1000000000000 // (60 + r_txt)
         |          ELSE 0 END AS BIGINT) AS rrf
         |  FROM fused)
         |SELECT probe_id, doc_id, r_vec, r_txt, rrf, CAST(rnk AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY rrf DESC, doc_id) AS rnk FROM sc)
         |WHERE rnk <= 10 ORDER BY probe_id, rank""".stripMargin
    },

    // the same ±1 matrix (generated from the shared jlSign constants,
    // the Dedup.hashCoeffs precedent) over the same left-assoc chain.
    "q199_jl_projection" -> {
      val dims = (0 until 8).map { i =>
        (0 until 64).map { j =>
          s"(embedding[${j + 1}]::DOUBLE * ${VectorOps.jlSign("jl11", i, j)}.0)"
        }.mkString("(", " + ", s") AS r$i")
      }.mkString(",\n  ")
      s"""SELECT vec_id,
         |  $dims
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    // q54's rank-bound pattern: the oracle states the engine-computed
    // consistency flags as literal 1s (KMeans cells have no SQL mirror)
    "q171_ivf_persistent" ->
      """SELECT vec_id AS probe_id, CAST(1 AS BIGINT) AS ok_version,
        |  CAST(1 AS BIGINT) AS ok_stable, CAST(1 AS BIGINT) AS ok_refit,
        |  CAST(1 AS BIGINT) AS ok_self, CAST(1 AS BIGINT) AS ok_recall
        |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin,

    // per-(label, dim) exact-decimal means via the shared dsum oracle
    // form; DuckDB zips the two unnests positionally.
    "q241_embedding_drift" ->
      s"""WITH r AS (SELECT label AS g,
         |    unnest(range(len(embedding))) AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings
         |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
         |p AS (SELECT g, dim, CAST(count(v) AS BIGINT) AS n,
         |    ${Det.davgSql("v", 6)} AS mean FROM r GROUP BY 1, 2),
         |gl AS (SELECT dim, ${Det.davgSql("v", 6)} AS global_mean
         |  FROM r GROUP BY 1)
         |SELECT p.g AS label, p.dim, p.n, p.mean, gl.global_mean,
         |  p.mean - gl.global_mean AS gap
         |FROM p JOIN gl USING (dim) ORDER BY label, dim""".stripMargin,

    // q50's ranked CTE + the label-match relevance set + the exact
    // count/quotient metric arithmetic, restated directly.
    "q221_retrieval_eval" ->
      s"""WITH ne AS (SELECT vec_id, ${duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT p.vec_id AS probe_id, e.vec_id, ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM ne e CROSS JOIN (SELECT * FROM ne WHERE vec_id < 5) p),
         |res AS (SELECT probe_id, vec_id, rank FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
         |    FROM sims) WHERE rank <= 10),
         |rel AS (SELECT p.vec_id AS probe_id, e.vec_id
         |  FROM embeddings e JOIN embeddings p
         |    ON p.vec_id < 5 AND e.label = p.label AND e.vec_id <> p.vec_id),
         |nr AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM rel GROUP BY 1),
         |h AS (SELECT res.probe_id,
         |    CAST(sum(CASE WHEN rel.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_hit_k,
         |    min(CASE WHEN rel.vec_id IS NOT NULL THEN res.rank END) AS fr
         |  FROM res LEFT JOIN rel
         |    ON res.probe_id = rel.probe_id AND res.vec_id = rel.vec_id
         |  GROUP BY 1)
         |SELECT coalesce(nr.probe_id, h.probe_id) AS probe_id,
         |  coalesce(n_rel, 0) AS n_rel, coalesce(n_hit_k, 0) AS n_hit_k,
         |  coalesce(n_hit_k, 0)::DOUBLE / 10.0 AS p_at_k,
         |  CASE WHEN coalesce(n_rel, 0) = 0 THEN 0.0
         |    ELSE coalesce(n_hit_k, 0)::DOUBLE / n_rel::DOUBLE END AS r_at_k,
         |  CASE WHEN fr IS NULL THEN 0.0
         |    ELSE 1.0 / fr::DOUBLE END AS rr
         |FROM nr FULL OUTER JOIN h ON nr.probe_id = h.probe_id
         |ORDER BY probe_id""".stripMargin,

    "q246_ndcg" -> {
      // the SAME quantized-rational discounts the Spark side uses,
      // stated as integer/2^40 (exact in both engines — decimal text
      // is NOT a contract: DuckDB's parser landed an ulp off on the
      // rank-5 value), and the same sorted left-fold add order — see
      // Eval.ndcgAtK / ndcgDiscounts
      val nums = graft.agg.Eval.ndcgDiscountNums(10)
      val den = graft.agg.Eval.ndcgDiscountDen
      def disc(rankExpr: String) = nums.zipWithIndex
        .map { case (n, i) =>
          s"WHEN $rankExpr = ${i + 1} THEN CAST($n AS DOUBLE) / ${den.toLong}.0" }
        .mkString("CASE ", " ", " ELSE 0.0 END")
      def fold(cExpr: String, ordExpr: String) =
        s"list_reduce(list_prepend(0.0::DOUBLE, list($cExpr ORDER BY $ordExpr)), (a, x) -> a + x)"
      s"""WITH ne AS (SELECT vec_id, ${duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT p.vec_id AS probe_id, e.vec_id, ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM ne e CROSS JOIN (SELECT * FROM ne WHERE vec_id < 5) p),
         |res AS (SELECT probe_id, vec_id, rank FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
         |    FROM sims) WHERE rank <= 10),
         |rel AS (SELECT p.vec_id AS probe_id, e.vec_id,
         |    CAST(3 - abs(e.label - p.label) AS BIGINT) AS grade
         |  FROM embeddings e JOIN embeddings p
         |    ON p.vec_id < 5 AND e.vec_id <> p.vec_id
         |      AND abs(e.label - p.label) <= 2),
         |dcg AS (SELECT res.probe_id,
         |    ${fold(s"CAST((1 << coalesce(rel.grade, 0)) - 1 AS DOUBLE) * ${disc("res.rank")}", "res.rank")} AS dcg_at_k
         |  FROM res LEFT JOIN rel
         |    ON res.probe_id = rel.probe_id AND res.vec_id = rel.vec_id
         |  GROUP BY 1),
         |ip AS (SELECT probe_id, grade, pos FROM (
         |    SELECT probe_id, grade, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY grade DESC, vec_id) AS pos
         |    FROM rel WHERE grade > 0) WHERE pos <= 10),
         |ideal AS (SELECT probe_id,
         |    ${fold(s"CAST((1 << grade) - 1 AS DOUBLE) * ${disc("pos")}", "pos")} AS idcg_at_k,
         |    CAST(count(*) AS BIGINT) AS n_judged_k
         |  FROM ip GROUP BY 1)
         |SELECT coalesce(dcg.probe_id, ideal.probe_id) AS probe_id,
         |  coalesce(n_judged_k, 0) AS n_judged_k,
         |  coalesce(dcg_at_k, 0.0) AS dcg_at_k, idcg_at_k,
         |  CASE WHEN idcg_at_k IS NULL THEN NULL
         |    ELSE coalesce(dcg_at_k, 0.0) / idcg_at_k END AS ndcg_at_k
         |FROM dcg FULL OUTER JOIN ideal ON dcg.probe_id = ideal.probe_id
         |ORDER BY probe_id""".stripMargin
    },

    "q249_map_eval" -> {
      // the same prepend-0.0 left fold in rank order as q246 — the
      // contributions cum/r are IEEE quotients of small exact ints, so
      // pinning the add order makes ap_at_k hash-exact cross-engine
      s"""WITH ne AS (SELECT vec_id, ${duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT p.vec_id AS probe_id, e.vec_id, ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM ne e CROSS JOIN (SELECT * FROM ne WHERE vec_id < 5) p),
         |res AS (SELECT probe_id, vec_id, rank FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
         |    FROM sims) WHERE rank <= 10),
         |rel AS (SELECT p.vec_id AS probe_id, e.vec_id
         |  FROM embeddings e JOIN embeddings p
         |    ON p.vec_id < 5 AND e.label = p.label AND e.vec_id <> p.vec_id),
         |nr AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM rel GROUP BY 1),
         |c AS (SELECT res.probe_id, res.rank,
         |    CASE WHEN rel.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
         |    sum(CASE WHEN rel.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY res.probe_id ORDER BY res.rank) AS cum
         |  FROM res LEFT JOIN rel
         |    ON res.probe_id = rel.probe_id AND res.vec_id = rel.vec_id),
         |s AS (SELECT probe_id,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list(cum::DOUBLE / rank::DOUBLE ORDER BY rank)
         |        FILTER (WHERE hit = 1)), (a, x) -> a + x) AS ap_sum
         |  FROM c GROUP BY 1)
         |SELECT coalesce(nr.probe_id, s.probe_id) AS probe_id,
         |  coalesce(n_rel, 0) AS n_rel,
         |  CASE WHEN coalesce(n_rel, 0) = 0 THEN NULL
         |    ELSE coalesce(ap_sum, 0.0) /
         |      least(n_rel, 10)::DOUBLE END AS ap_at_k
         |FROM nr FULL OUTER JOIN s ON nr.probe_id = s.probe_id
         |ORDER BY probe_id""".stripMargin
    },

    "q250_wide_quantiles_array" ->
      """SELECT 1 AS ok_e0_q10, 1 AS ok_e0_q50, 1 AS ok_e0_q90,
        |  1 AS ok_e31_q10, 1 AS ok_e31_q50, 1 AS ok_e31_q90,
        |  1 AS ok_e63_q10, 1 AS ok_e63_q50, 1 AS ok_e63_q90""".stripMargin,

    "q251_winsorize_array" ->
      """SELECT 1 AS ok_lo_0, 1 AS ok_hi_0, 1 AS ok_var_0,
        |  1 AS ok_lo_31, 1 AS ok_hi_31, 1 AS ok_var_31,
        |  1 AS ok_lo_63, 1 AS ok_hi_63, 1 AS ok_var_63""".stripMargin,

    "q218_ivf_filtered" ->
      """SELECT vec_id AS probe_id, CAST(10 AS BIGINT) AS n_res,
        |  CAST(1 AS BIGINT) AS ok_stable, CAST(1 AS BIGINT) AS ok_pred,
        |  CAST(1 AS BIGINT) AS ok_recall
        |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin,

    "q173_ivf_pruned" ->
      """SELECT vec_id AS probe_id, CAST(1 AS BIGINT) AS ok_plan_pruned,
        |  CAST(1 AS BIGINT) AS ok_same_unpruned
        |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin,

    "q176_ivf_pq" ->
      """SELECT vec_id AS probe_id, CAST(1 AS BIGINT) AS ok_version,
        |  CAST(1 AS BIGINT) AS ok_one_long, CAST(1 AS BIGINT) AS ok_stable,
        |  CAST(1 AS BIGINT) AS ok_recall,
        |  (SELECT count(*) FROM embeddings) AS n_codes
        |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin,

    // flags plus ONE real value: the exactly-once assignment count,
    // stated directly from the source table
    "q174_ivf_append" ->
      """SELECT vec_id AS probe_id, CAST(1 AS BIGINT) AS ok_version,
        |  CAST(1 AS BIGINT) AS ok_self_head,
        |  CAST(1 AS BIGINT) AS ok_absent_v1,
        |  (SELECT count(*) FROM embeddings) AS n_index
        |FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""".stripMargin,

    "q50_vector_nn" ->
      s"""WITH ne AS (SELECT vec_id, ${duckNorm("embedding")} AS nv FROM embeddings),
         |sims AS (
         |  SELECT p.vec_id AS probe_id, e.vec_id, ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM ne e
         |  CROSS JOIN (SELECT * FROM ne WHERE vec_id < 5) p),
         |ranked AS (
         |  SELECT probe_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY sim DESC, vec_id) AS rank
         |  FROM sims)
         |SELECT probe_id, vec_id, sim, rank FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin,

    // literal mirror of VectorOps.quantizeInt8 (one multiply, one
    // divide, floor — deterministic IEEE) + integer-exact dot.
    "q165_quantized_nn" ->
      s"""WITH mm AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
         |  FROM embeddings),
         |qq AS (SELECT vec_id,
         |    list_transform(embedding, x -> CASE WHEN m = 0.0 THEN 0.0
         |      ELSE sign(x::DOUBLE) * floor(abs(x::DOUBLE) * 127.0 / m)
         |      END) AS qv
         |  FROM mm),
         |sims AS (SELECT p.vec_id AS probe_id, e.vec_id,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> e.qv[i] * p.qv[i])) AS BIGINT) AS qdot
         |  FROM qq e CROSS JOIN (SELECT * FROM qq WHERE vec_id < 5) p),
         |ranked AS (SELECT probe_id, vec_id, qdot,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY qdot DESC, vec_id) AS rank
         |  FROM sims)
         |SELECT probe_id, vec_id, qdot, rank FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin,
    "q55_ann_lsh" -> {
      val b = graft.vector.Ann.bucketSql("embedding", 4, 64)
      s"""WITH be AS (SELECT vec_id, $b AS bucket, ${duckNorm("embedding")} AS nv FROM embeddings),
         |probes AS (SELECT vec_id AS probe_id, nv, bucket FROM be WHERE vec_id < 5),
         |sims AS (
         |  SELECT p.probe_id, e.vec_id, ${duckDot("e.nv", "p.nv")} AS sim
         |  FROM be e JOIN probes p ON e.bucket = p.bucket),
         |ranked AS (
         |  SELECT probe_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY sim DESC, vec_id) AS rank
         |  FROM sims)
         |SELECT probe_id, vec_id, sim, rank FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin
    },

    "q51_gramian" ->
      s"""SELECT ${Det.dsumSql("l_quantity * l_quantity", 4)} AS g_0_0,
        |  ${Det.dsumSql("l_quantity * l_discount", 4)} AS g_0_1,
        |  ${Det.dsumSql("l_quantity * l_tax", 4)} AS g_0_2,
        |  ${Det.dsumSql("l_discount * l_discount", 4)} AS g_1_1,
        |  ${Det.dsumSql("l_discount * l_tax", 4)} AS g_1_2,
        |  ${Det.dsumSql("l_tax * l_tax", 4)} AS g_2_2
        |FROM lineitem""".stripMargin,
    "q52_covariance" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      def s1(c: String) = Det.dsumSql(c, 4)
      def cov(x: String, y: String) =
        s"(($n * ${Det.dsumSql(s"$x * $y", 4)} - ${s1(x)} * ${s1(y)}) / ($n * $n))"
      s"""SELECT ${cov("l_quantity", "l_quantity")} AS c_0_0,
        |  ${cov("l_quantity", "l_extendedprice")} AS c_0_1,
        |  ${cov("l_quantity", "l_discount")} AS c_0_2,
        |  ${cov("l_extendedprice", "l_extendedprice")} AS c_1_1,
        |  ${cov("l_extendedprice", "l_discount")} AS c_1_2,
        |  ${cov("l_discount", "l_discount")} AS c_2_2
        |FROM lineitem""".stripMargin
    },
    "q53_exact_quantile" ->
      """SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
        |  quantile_cont(l_extendedprice, 0.5) AS q50,
        |  quantile_cont(l_extendedprice, 0.75) AS q75,
        |  quantile_cont(l_extendedprice, 0.95) AS q95
        |FROM lineitem""".stripMargin,
    // q54 emits rank-bound 0/1 flags (see the query comment): any valid
    // ε-approximate sketch yields all-1s, which the oracle states exactly.
    "q54_approx_quantile" ->
      """SELECT 1 AS ok_q25, 1 AS ok_q50, 1 AS ok_q75, 1 AS ok_q95""".stripMargin,

    "q182_negative_sampling" ->
      """WITH a AS (SELECT vec_id AS anchor_id, label AS al
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT a.anchor_id, e.vec_id AS neg_id,
        |    md5(concat('neg:r11:', CAST(a.anchor_id AS VARCHAR), ':',
        |      CAST(e.vec_id AS VARCHAR))) AS h
        |  FROM a JOIN embeddings e ON e.label <> a.al),
        |r AS (SELECT anchor_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY h, neg_id) AS BIGINT) AS neg_rank
        |  FROM c)
        |SELECT anchor_id, neg_id, neg_rank FROM r WHERE neg_rank <= 5
        |ORDER BY anchor_id, neg_rank""".stripMargin
  )
}
