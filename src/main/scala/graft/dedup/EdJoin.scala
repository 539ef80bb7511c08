package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join WITHOUT caller blocking —
  * the PassJoin segment-pigeonhole scheme (Li, Deng, Feng: "PassJoin: a
  * partition-based method for similarity joins", VLDB 2012; public
  * algorithm, re-expressed relationally): every pair of strings within
  * `maxDist` Levenshtein edits, found from segment-key equality joins
  * instead of block-quadratic pairing.
  *
  * Pigeonhole: partition a string y into τ+1 contiguous segments. Any
  * single edit touches at most one segment, so with ed(x, y) ≤ τ at
  * least one segment of y is untouched and survives in x as an EXACT
  * substring, shifted by the net insertions/deletions before it —
  * bounded by ±τ. Hence the candidate generator:
  *   - segment role: each record emits its τ+1 segments keyed by
  *     (segment index, own length, segment text);
  *   - probe role: each record emits, for every target length
  *     l' ∈ [len−τ, len+τ] (l' ≥ τ+1) and segment index i, its own
  *     substrings of segment-i-of-l' length at start positions within
  *     ±τ of that segment's start — keyed identically.
  * A probe↔segment key match is the ONLY way an ed ≤ τ pair can exist
  * (both orientations are generated, so one match suffices); candidates
  * are then verified with the codegen'd bounded `levenshtein(…, τ)`.
  * LOSSLESS: no sampling, no caps, no hashing — the output is exactly
  * the brute-force pair set (oracle- and spec-pinned).
  *
  * Degenerate lengths: a pair where BOTH sides are shorter than τ+1 has
  * ed ≤ max(len) ≤ τ unconditionally — those records pair in a single
  * "short" bucket (the distinct short VALUES are bounded by the
  * alphabet, the bucket is only as hot as the short-string population;
  * mixed short×long pairs are still found through the long side's
  * segments). Both engines count code points over the test alphabet
  * identically.
  *
  * Scale shape (100 TB): per record the probe fan-out is bounded by
  * (2τ+1)²·(τ+1) small rows (≤ 45 at τ = 2, deduped) carrying an id +
  * a ≤⌈len/(τ+1)⌉-char key — never the full string; the join is an
  * equi-join on those keys, so shuffle volume is fan-out-linear in the
  * corpus. Candidates are verify-joined back to the (id, string)
  * relation by id. A popular segment value (shared prefix boilerplate)
  * makes its key hot exactly like a hot LSH bucket — that is data skew
  * the AQE skew-join split absorbs, not a plan defect; unlike
  * [[EntityResolution.matchPairs]] there is no lossy cap because the
  * contract here is exactness. */
object EdJoin {

  /** Match pairs: (id_1, id_2, dist) with id_1 < id_2 and
    * dist = levenshtein ≤ maxDist. */
  def matchPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val tau = maxDist
    val nSeg = tau + 1
    val recs = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).cast("int").as("__l"))
      // every candidate verify re-reads (id, s): keep the tokenless
      // relation materialized once (the q144/bm25 checkpoint rationale)
      .localCheckpoint(true)

    // ---- long records (len >= tau+1): segment + probe roles --------
    val long = recs.filter(col("__l") >= nSeg)
    // segment start of index i for a string of length l (0-based):
    // floor(i*l/(tau+1)) via integer `div` (SQL `/` is double division);
    // even partition, identical in both roles
    def segStart(i: String, l: String) =
      s"CAST((($i) * ($l)) div $nSeg AS INT)"
    def segLen(i: String, l: String) =
      s"(${segStart(s"$i + 1", l)} - ${segStart(i, l)})"
    // segment role: (key_i, key_l, key_sub, id)
    val segs = long.select(col("__id").as("__sid"),
      explode(expr(
        s"""transform(sequence(0, $tau), i -> named_struct(
           |  'i', i, 'l', __l,
           |  'sub', substring(__s, ${segStart("i", "__l")} + 1,
           |                   ${segLen("i", "__l")})))""".stripMargin))
        .as("__k"))
      .select(col("__sid"), col("__k.i").as("__ki"),
        col("__k.l").as("__kl"), col("__k.sub").as("__ksub"))
    // probe role: for each viable target length l' and segment index i,
    // own substrings of that segment's length at starts within +-tau of
    // that segment's start. EVERY record probes (a short record can
    // still match a long record's segments — only the segment role
    // needs len >= tau+1); the target-length sequence is floored at
    // tau+1 and empty when even len+tau falls below it. sequence() is
    // guarded (empty array when the window is infeasible) because
    // Spark's sequence(a, b) DESCENDS for a > b instead of returning
    // empty.
    val probes = recs.select(col("__id").as("__pid"), col("__s"),
      explode(expr(
        s"""flatten(flatten(
           |  transform(CASE WHEN __l + $tau < $nSeg THEN array()
           |            ELSE sequence(greatest($nSeg, __l - $tau),
           |                          __l + $tau) END,
           |    lp -> transform(sequence(0, $tau), i ->
           |      CASE WHEN greatest(0, ${segStart("i", "lp")} - $tau) >
           |                least(__l - ${segLen("i", "lp")},
           |                      ${segStart("i", "lp")} + $tau)
           |        THEN array()
           |        ELSE transform(
           |          sequence(greatest(0, ${segStart("i", "lp")} - $tau),
           |            least(__l - ${segLen("i", "lp")},
           |                  ${segStart("i", "lp")} + $tau)),
           |          p -> named_struct('i', i, 'l', lp,
           |            'sub', substring(__s, p + 1, ${segLen("i", "lp")})))
           |      END))))""".stripMargin)).as("__k"))
      .select(col("__pid"), col("__k.i").as("__ki"),
        col("__k.l").as("__kl"), col("__k.sub").as("__ksub"))
      .distinct()
    val longCand = probes.join(segs,
        Seq("__ki", "__kl", "__ksub"))
      .filter(col("__pid") =!= col("__sid"))
      .select(least(col("__pid"), col("__sid")).as("id_1"),
        greatest(col("__pid"), col("__sid")).as("id_2"))
      .distinct()

    // ---- both-short pairs (both len <= tau): always within tau ------
    // joined on a constant equi key (one bucket, hash join — never a
    // planned cartesian): the bucket holds ONLY sub-(tau+1)-char
    // records, a population that exact-dedups to at most |alphabet|^tau
    // distinct values; dedup upstream if short strings dominate a corpus
    // pmod(id, 1) is identically 0 but not constant-foldable, so the
    // equi-key survives optimization and the join stays a hash join
    val shorts = recs.filter(col("__l") < nSeg)
      .select(col("__id"), pmod(col("__id").cast("long"), lit(1L)).as("__k"))
    val shortCand = shorts.as("a").join(shorts.as("b"),
        col("a.__k") === col("b.__k") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_1"), col("b.__id").as("id_2"))

    // ---- verify: bounded banded DP over the candidate ids -----------
    val cand = longCand.unionByName(shortCand).distinct()
    cand
      .join(recs.select(col("__id").as("id_1"), col("__s").as("__s1"),
        col("__l").as("__l1")), "id_1")
      .join(recs.select(col("__id").as("id_2"), col("__s").as("__s2"),
        col("__l").as("__l2")), "id_2")
      .filter(abs(col("__l1") - col("__l2")) <= tau)
      // exact char-frequency count filter before the DP (r18 — same
      // lossless prune as EntityResolution.matchPairs')
      .filter(call_function("ed_freq_gate", col("__s1"), col("__s2"),
        lit(2 * tau)))
      .withColumn("dist", levenshtein(col("__s1"), col("__s2"), tau))
      .filter(col("dist") >= 0)
      .select(col("id_1"), col("id_2"), col("dist"))
  }
}
