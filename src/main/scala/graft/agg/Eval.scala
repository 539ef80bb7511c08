package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation aggregates — the measurement half of
  * the quality-classifier tier (q158 trains/applies a scorer; these
  * grade one). Everything is exact integer arithmetic until a final
  * IEEE division, so results are bit-identical on every engine and
  * partition layout — the catalog's Det discipline applied to eval
  * metrics.
  *
  * Scale shape: both metrics reduce the corpus with ONE map-combined
  * aggregate keyed on the score (AUC) or nothing (confusion); the AUC's
  * ordered cumulative pass runs over DISTINCT scores — score-cardinality
  * sized, not corpus sized (int/quantized scores keep it tiny; a
  * continuous score column should be quantized first, which real eval
  * pipelines do anyway). */
object Eval {

  private def decOf(c: Column) = c.cast("decimal(38,0)")

  /** Exact int64 emission of a DECIMAL(38,0) value: the decimal-overflow
    * guards elsewhere only fire when the DECIMAL itself nulls — a value
    * that fits decimal(38) but not int64 would otherwise wrap (ANSI
    * throw aside) or null silently through cast(long) (r13 review). */
  private def asLongExact(v: Column, what: String): Column =
    when(v.isNull || abs(v) > decOf(lit(Long.MaxValue)),
      raise_error(lit(s"$what exceeds int64 — subsample the input")))
      .otherwise(v.cast("long"))

  /** The α=0.05 two-sample KS rejection as a pure integer comparison:
    * KS > 1.358·√((N_a+N_b)/(N_a·N_b)) squared into
    * 10⁶·num² > 1844164·(N_a+N_b)·N_a·N_b in DECIMAL(38,0). Exact range
    * (r13 advice corrected the old "~5·10⁸ rows/side" claim): num can
    * reach KS·N_a·N_b, so the left side overflows decimal(38) once
    * num ≳ 10¹⁶ — i.e. the bound depends on the STATISTIC, roughly
    * KS·N_a·N_b ≤ ~10¹⁶ (at 5·10⁸ rows/side any KS ≥ ~0.04 raises);
    * overflow raises LOUDLY, never nulls. Shared by [[ksDrift]] and
    * [[ksDriftByGroup]] so the critical constant has one home. */
  private def ksSignificant(num: Column, na: Column, nb: Column): Column = {
    val num2 = decOf(lit(1000000L)) * num * num
    val crit = decOf(lit(1844164L)) * decOf(na + nb) * decOf(na) * decOf(nb)
    when(na === 0L || nb === 0L, lit(0))
      .when(num2.isNull || crit.isNull,
        raise_error(lit("ks drift: decimal(38) overflow — side totals " +
          "exceed the exact range; subsample the sides")))
      .otherwise((num2 > crit).cast("int"))
  }

  /** Loudly-integral long cast: a fractional input must RAISE, never
    * truncate — `cast("long")` alone would silently floor a raw
    * probability 0.9 to 0 and sail through every downstream range
    * check with a green-but-garbage readout (r13 advice). Non-numeric
    * garbage (cast → null on a non-null input) raises here too. */
  private def integralLong(c: Column, fname: String,
      cname: String): Column = {
    val raw = c.cast("long")
    when(c.isNotNull && (raw.isNull ||
        c.cast("double") =!= raw.cast("double")),
      raise_error(concat(lit(s"$fname: $cname must be integral, got "),
        c.cast("string")))).otherwise(raw)
  }

  /** The 0/1 label contract shared by every binary-label metric here:
    * integral (0.9 must not truncate to 0 — see [[integralLong]]) and
    * in {0, 1}, violations raise with the caller's name. */
  private def binaryLabel(c: Column, fname: String,
      cname: String): Column = {
    val y = integralLong(c, fname, cname)
    when(y.isin(0L, 1L), y).otherwise(raise_error(concat(
      lit(s"$fname: $cname must be 0/1, got "),
      coalesce(c.cast("string"), lit("null")))))
  }

  /** The integer milli-probability contract shared by [[calibration]]
    * and [[brierExact]]: an INTEGRAL value in [0, 1000], violations
    * raise with the caller's name (fractional inputs raise instead of
    * truncating — r13 advice). */
  private def milliScore(c: Column, fname: String, cname: String): Column = {
    val raw = integralLong(c, fname, cname)
    when(raw.isNull || raw < 0L || raw > 1000L,
      raise_error(concat(lit(s"$fname: $cname must be an integer " +
        "milli-probability in [0, 1000], got "),
        coalesce(raw.cast("string"), lit("null"))))).otherwise(raw)
  }

  /** Default ceiling for the distinct-value guards on [[ksDrift]] /
    * [[aucExact]]: past this, the single-partition ordered reduction
    * those operators run over DISTINCT values stops being "tiny by
    * construction" and the operator raises instead of silently
    * funneling an open-cardinality column through one task (r13
    * verdict: this was the catalog's last documented-only scale
    * contract — every other contract raises loudly). 2²⁰ distinct
    * values sort in one task in well under a second; an un-quantized
    * double column at 100 TB would blow far past it. */
  val DefaultMaxDistinct: Int = 1 << 20

  /** Equal-width quantizer — the SHIPPED companion of the
    * distinct-value guards (the guard's error message names it):
    * maps a numeric column to its bucket index over [lo, hi) with
    * `buckets` equal widths (long, 0..buckets−1; out-of-range values
    * clamp to the end buckets, nulls pass through). The map is
    * MONOTONE, so [[ksDrift]]/[[aucExact]] on the quantized column are
    * the standard binned statistic — bounded cardinality by
    * construction, pure codegen'd arithmetic, zero extra passes. */
  def quantize(c: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / buckets
    // explicit null passthrough: greatest/least SKIP nulls (greatest
    // (null, 0) = 0), so without the when a null would quantize to
    // bucket 0 instead of staying null. NaN raises LOUDLY (r14 review):
    // floor(NaN).toLong is 0 in Spark — a NaN would otherwise land
    // silently in the BOTTOM bucket while DuckDB's least/greatest
    // clamp it to the TOP one, a cross-engine divergence on top of the
    // silent skew.
    when(c.isNotNull,
      when(isnan(c.cast("double")),
        raise_error(lit("quantize: NaN input — filter or impute NaNs " +
          "before bucketing")))
        .otherwise(least(greatest(floor((c - lit(lo)) / lit(w)), lit(0L)),
          lit(buckets - 1L)))).cast("long")
  }

  /** Equal-FREQUENCY (rank) quantizer — the skew-proof companion of
    * the equal-width [[quantize]]: a heavy-tailed column under
    * equal-width bucketing collapses into one bucket and the binned KS
    * goes blind; here the boundaries are EXACT percentiles
    * (`OrderStat.exactPercentiles` — the distributed range-exchange
    * selection, never the value→count-map builtin that OOMs at open
    * cardinality), so every bucket holds ~1/buckets of the mass.
    * Assignment = count of boundaries strictly below the value — the
    * q196 equi-depth contract, bit-compatible with DuckDB's
    * `quantile_cont`. Returns `df` plus `outCol` (long in
    * [0, buckets); null values stay null; NaN raises loudly, same as
    * [[quantize]]). The boundary collect is (buckets − 1) doubles —
    * bounded metadata, never data. */
  def quantizeByRank(df: DataFrame, c: String, buckets: Int,
      outCol: String): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val x = col(c).cast("double")
    // the NaN raise applies on EVERY path — including the no-boundary
    // ones — so an all-NaN column raises instead of silently nulling
    // (r14 review)
    def guarded(idx: Column) = when(x.isNotNull,
      when(isnan(x), raise_error(lit("quantizeByRank: NaN input — " +
        "filter or impute NaNs before bucketing")))
        .otherwise(idx))
    if (buckets == 1) // no boundaries to fit: everything is bucket 0
      return df.withColumn(outCol, guarded(lit(0L)))
    val qs = (1 until buckets).map(_.toDouble / buckets)
    OrderStat.exactPercentilesOpt(
      df.select(x.as("__q")).filter(!isnan(col("__q"))), "__q", qs) match {
      case None => // no non-NaN rows: null buckets (all-NaN still raises)
        df.withColumn(outCol, guarded(lit(null).cast("long")))
      case Some(bs) =>
        // boundaries as ONE array literal + a HOF count — constant
        // plan size at any bucket count (r14 review: the when-chain
        // fold grew a ~(buckets−1)-node expression per reference,
        // exactly at the 1000-bucket counts the maxDistinct guard
        // steers users toward); same strictly-below assignment as the
        // oracle's list_filter and q196's equi-depth contract
        val idx = size(filter(typedlit(bs.toSeq), b => x > b))
          .cast("long")
        df.withColumn(outCol, guarded(idx))
    }
  }

  /** The enforcement half of the quantize-first contract: `distinct`
    * is the one-row cardinality about to size an ordered pass or grid;
    * past `maxDistinct` the guarded column RAISES (map-side, before
    * the funnel's exchange — the projection sits below the window's
    * shuffle) instead of letting the sort silently eat the
    * cardinality. `noun` names WHAT is being counted so each
    * operator's error describes its own funnel (single-partition pass,
    * per-group partition, grid axis). */
  private def cardinalityGuard(guarded: Column, distinct: Column,
      maxDistinct: Int, fname: String,
      noun: String = "distinct values in the single-partition " +
        "ordered pass"): Column =
    when(distinct > maxDistinct.toLong,
      raise_error(concat(lit(s"$fname: "), distinct.cast("string"),
        lit(s" $noun exceed maxDistinct = $maxDistinct — quantize " +
          "the column first (Eval.quantize) or raise maxDistinct"))))
      .otherwise(guarded)

  /** Exact ROC-AUC via the tie-corrected Mann–Whitney statistic:
    * AUC = (#concordant pairs + ½·#tied pairs) / (n_pos·n_neg),
    * returned as the exact rational (`auc_num2`, `auc_den2`) =
    * (2·wins + ties, 2·n_pos·n_neg) plus their IEEE quotient `auc`.
    * One row: (n_pos, n_neg, auc_num2, auc_den2, auc).
    *
    * `labelCol` must be 0/1 (checked); rows with a null score or label
    * are excluded (scoreless rows can't be ranked). The quantize-first
    * contract is ENFORCED (r14): past `maxDistinct` distinct scores the
    * operator raises map-side, naming [[quantize]], instead of
    * silently funneling an open-cardinality score column through the
    * one-task ordered pass. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    val rows = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("__s"),
        binaryLabel(col(labelCol), "aucExact", labelCol).as("__y"))
    val g0 = rows.groupBy(col("__s"))
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__n"))
    // distinct-score cardinality guard: the 1×1 broadcast crossJoin is
    // directory-sized; the guarded projection sits BELOW the window's
    // single-partition exchange, so the raise fires before the funnel.
    // The count references g0's aggregate columns (greatest of two
    // non-null sums — always counted) so column pruning can't shrink
    // this branch into a DIFFERENT subtree: kept identical, its
    // exchange is REUSED and the input is scanned once, not twice.
    val nv = g0.agg(count(greatest(col("__p"), col("__n"))).as("__nv"))
    val g = g0.crossJoin(broadcast(nv))
      .withColumn("__p", cardinalityGuard(col("__p"), col("__nv"),
        maxDistinct, "aucExact"))
      .drop("__nv")
    // negatives strictly below this score: an ordered cumulative pass
    // over DISTINCT scores (one row per score value, single partition by
    // design — see the object doc)
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // pair products run in DECIMAL(38,0) and emit through asLongExact
    // (r14 review): raw int64 multiplies wrap silently past ~3·10⁹
    // rows/class in non-ANSI mode — the same failure class the KS
    // rationals were hardened against in r13
    g.withColumn("__nb", coalesce(sum(col("__n")).over(w), lit(0L)))
      .agg(coalesce(sum(col("__p")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__n")), lit(0L)).as("n_neg"),
        coalesce(sum(decOf(col("__p")) * decOf(col("__nb"))) * 2L +
          sum(decOf(col("__p")) * decOf(col("__n"))),
          decOf(lit(0L))).as("__num2"))
      .select(col("n_pos"), col("n_neg"),
        asLongExact(col("__num2"), "aucExact: auc_num2").as("auc_num2"),
        asLongExact(decOf(col("n_pos")) * decOf(col("n_neg")) * 2L,
          "aucExact: auc_den2").as("auc_den2"))
      // one-class input ranks nothing: auc is null, not 0/0 = NaN
      // (matches aucByGroup's contract — r14 review)
      .withColumn("auc", when(col("auc_den2") > 0L,
        col("auc_num2").cast("double") / col("auc_den2").cast("double")))
  }

  /** Per-GROUP exact AUC — [[aucExact]] keyed by `groupCol` (per-source
    * or per-model-version ranking quality, the multi-group form the
    * eval tier's KS/χ²/calibration monitors already have): the same
    * tie-corrected Mann–Whitney rational per group, with the cumulative
    * pass GROUP-PARTITIONED so every group sorts in parallel (the
    * [[ksDriftByGroup]] shape — no single-task funnel). Groups with one
    * class only emit auc = null (n_pos·n_neg = 0 ranks nothing).
    *
    * One row per group: (groupCol, n_pos, n_neg, auc_num2, auc_den2,
    * auc). Scale shape: one (group, score) map-combined agg +
    * group-partitioned cumulative windows. The funnel here is the
    * LARGEST GROUP's window partition, so the guard measures max
    * per-group distinct scores (r14 review — a global (group, score)
    * count would spuriously raise on 2000 well-quantized models while
    * missing one group with 2³⁰ raw scores); past `maxDistinct` it
    * raises naming [[quantize]]. */
  def aucByGroup(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String,
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    val rows = df.filter(col(scoreCol).isNotNull &&
        col(labelCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(scoreCol).as("__s"),
        binaryLabel(col(labelCol), "aucByGroup", labelCol).as("__y"))
    val g0 = rows.groupBy(col("__g"), col("__s"))
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__n"))
    // max per-group distinct scores — the size of the biggest window
    // partition; counting nullable sums keeps the branch's (g, s)
    // exchange identical to the main one (reused, single scan)
    val nv = g0.groupBy(col("__g"))
      .agg(count(greatest(col("__p"), col("__n"))).as("__c"))
      .agg(max(col("__c")).as("__nv"))
    val g = g0.crossJoin(broadcast(nv))
      .withColumn("__p", cardinalityGuard(col("__p"), col("__nv"),
        maxDistinct, "aucByGroup",
        noun = "distinct scores in the largest group's ordered pass"))
      .drop("__nv")
    val w = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // DECIMAL(38,0) pair products + asLongExact emission, the aucExact
    // overflow discipline (r14 review)
    g.withColumn("__nb", coalesce(sum(col("__n")).over(w), lit(0L)))
      .groupBy(col("__g"))
      .agg(coalesce(sum(col("__p")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__n")), lit(0L)).as("n_neg"),
        coalesce(sum(decOf(col("__p")) * decOf(col("__nb"))) * 2L +
          sum(decOf(col("__p")) * decOf(col("__n"))),
          decOf(lit(0L))).as("__num2"))
      .select(col("__g").as(groupCol), col("n_pos"), col("n_neg"),
        asLongExact(col("__num2"), "aucByGroup: auc_num2").as("auc_num2"),
        asLongExact(decOf(col("n_pos")) * decOf(col("n_neg")) * 2L,
          "aucByGroup: auc_den2").as("auc_den2"))
      .withColumn("auc", when(col("auc_den2") > 0L,
        col("auc_num2").cast("double") / col("auc_den2").cast("double")))
  }

  /** Confusion counts at a threshold (score ≥ t ⇒ predicted positive),
    * plus precision/recall/F1 as exact rationals' IEEE quotients.
    * One row: (tp, fp, fn, tn, precision, recall, f1). */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val y = binaryLabel(col(labelCol), "confusionAt", labelCol)
    val pred = (col(scoreCol) >= threshold).cast("long")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(sum(pred * y).as("tp"), sum(pred * (lit(1L) - y)).as("fp"),
        sum((lit(1L) - pred) * y).as("fn"),
        sum((lit(1L) - pred) * (lit(1L) - y)).as("tn"))
      .withColumn("precision",
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
      .withColumn("recall",
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
      .withColumn("f1", col("tp").cast("double") * 2.0 /
        (col("tp") * 2L + col("fp") + col("fn")).cast("double"))
  }

  /** ROUGE-N per (candidate, reference) pair: clipped n-gram overlap
    * Σ_g min(count_cand(g), count_ref(g)) over hashed word n-grams WITH
    * multiplicity, plus recall (/ref grams), precision (/cand grams)
    * and F1 — the generation-eval / corpus-overlap metric as exact
    * integers with IEEE-quotient scores (2·o/(n_c+n_r) for F1, one
    * fixed expression, engine-portable).
    *
    * Scale shape: the whole metric is ONE codegen'd per-row kernel
    * (`rouge_overlap` — hash both sides' n-grams, count-map clip, in a
    * single pass; no n-gram strings, no exploded (pair, gram) shuffle:
    * the first cut's explode → count → min-sum relational form soaked
    * at 3.3× per 10× data purely on exchange volume, this form is the
    * scan-linear floor). Pairs are independent rows — any corpus of
    * pairs parallelizes flat with zero exchange.
    *
    * Returns (pair_id, n_cand, n_ref, overlap, rouge_recall,
    * rouge_precision, rouge_f1). */
  def rougeN(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val oD = col("overlap").cast("double")
    pairs
      .select(col(pairIdCol).as("pair_id"),
        call_function("rouge_overlap", col(candCol), col(refCol), lit(n))
          .as("__r"))
      .select(col("pair_id"), col("__r.n_cand").as("n_cand"),
        col("__r.n_ref").as("n_ref"), col("__r.overlap").as("overlap"))
      .withColumn("rouge_recall", when(col("n_ref") === 0, 0.0)
        .otherwise(oD / col("n_ref").cast("double")))
      .withColumn("rouge_precision", when(col("n_cand") === 0, 0.0)
        .otherwise(oD / col("n_cand").cast("double")))
      .withColumn("rouge_f1",
        when(col("n_cand") + col("n_ref") === 0, 0.0)
          .otherwise(oD * 2.0 /
            (col("n_cand") + col("n_ref")).cast("double")))
  }

  /** Two-sample χ² DRIFT readout over a categorical column — the
    * distribution-shift monitor a pipeline runs between corpus slices
    * (yesterday vs today, source A vs source B) before trusting a new
    * batch. PSI's ln() is transcendental, so the catalog's exactness
    * bar picks the χ² statistic instead: per category i with counts
    * (aᵢ, bᵢ) and side totals (N_a, N_b),
    *   contribᵢ = Dᵢ² / (N_a · N_b · (aᵢ + bᵢ)),  Dᵢ = aᵢ·N_b − bᵢ·N_a
    * (the algebraic collapse of Σ (obs−exp)²/exp over both sides) —
    * Dᵢ² runs in DECIMAL(38,0) (N up to ~3·10⁹ before precision loss)
    * and the final quotient is one deterministic IEEE division, so the
    * per-category readout is engine-reproducible with no tolerance.
    * Σ contribᵢ ~ χ²(k−1) under no-drift; the per-category rows ARE
    * the actionable output (which categories moved), the caller sums
    * for the omnibus test.
    *
    * Categories absent on one side carry count 0 there (full-outer
    * union) — the strongest drift signal must not silently drop.
    *
    * Scale shape: two map-combined category counts + two one-row
    * totals broadcast back; the exchange is category-sized. */
  def chiSquareDrift(a: DataFrame, b: DataFrame,
      catCol: String): DataFrame = {
    def side(df: DataFrame, n: String) = df
      .filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("__c"))
      .agg(count(lit(1)).as(n))
    val ca = side(a, "n_a"); val cb = side(b, "n_b")
    val joined = ca.join(cb, Seq("__c"), "full_outer")
      .select(col("__c"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val d = dec(col("n_a")) * dec(col("__tb")) -
      dec(col("n_b")) * dec(col("__ta"))
    val d2 = d * d
    val den = dec(col("__ta")) * dec(col("__tb")) *
      dec(col("n_a") + col("n_b"))
    joined.crossJoin(broadcast(tot))
      // same loud guard as EventStats.abTest: beyond ~3e9 rows/side the
      // decimal(38,0) multiply overflows — ANSI throws, non-ANSI yields
      // NULL; never let the contribution silently null out.
      .withColumn("contrib",
        when(d2.isNull || den.isNull,
          raise_error(lit("chiSquareDrift: decimal(38) overflow — " +
            "side totals exceed the exact range; subsample the sides")))
          .otherwise(d2.cast("double") / den.cast("double")))
      .select(col("__c").as(catCol), col("n_a"), col("n_b"),
        col("contrib"))
  }

  /** Two-sample Kolmogorov–Smirnov DRIFT readout over a NUMERIC column —
    * the continuous-distribution companion of [[chiSquareDrift]] (which
    * monitors categorical columns): KS = max over x of |F_a(x) − F_b(x)|
    * compares whole CDFs, catching location/shape shifts that category
    * counts can't see.
    *
    * Exact by construction: with per-side cumulative counts (i, j) at
    * each distinct value, F_a − F_b = i/N_a − j/N_b = (i·N_b − j·N_a) /
    * (N_a·N_b) — so the statistic is the integer rational
    * (`ks_num`, `ks_den`) = (max |i·N_b − j·N_a|, N_a·N_b) with ONE IEEE
    * division for the `ks` readout. The α=0.05 rejection
    * KS > 1.358·√((N_a+N_b)/(N_a·N_b)) squares into the pure integer
    * comparison 10⁶·ks_num² > 1844164·(N_a+N_b)·N_a·N_b, run in
    * DECIMAL(38,0) (exact while KS·N_a·N_b ≲ 10¹⁶ — see
    * [[ksSignificant]]; overflow raises LOUDLY — same contract as
    * abTest/chiSquareDrift — subsample beyond).
    *
    * One row: (n_a, n_b, ks_num, ks_den, ks, significant).
    *
    * Scale shape: two map-combined per-value counts + one ordered
    * cumulative pass over DISTINCT values — value-cardinality sized,
    * not corpus sized (same single-partition-by-design contract as
    * [[aucExact]]). The quantize-first contract is ENFORCED (r14):
    * past `maxDistinct` distinct values the operator raises map-side,
    * naming [[quantize]], instead of silently funneling an
    * open-cardinality column through the one-task cumulative pass. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String,
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    def side(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as(n))
    val joined0 = side(a, "__ca").join(side(b, "__cb"), Seq("__v"),
        "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // distinct-value cardinality guard (same shape as aucExact's): the
    // raise fires in the projection below the single-partition window
    // exchange — before the funnel, not after the sort. The counted
    // expression must reference both side-count columns through a
    // NON-foldable nullable form: count(greatest(__ca,__cb)) over the
    // non-null coalesced counts gets rewritten to count(1) and the
    // branch pruned into a DIFFERENT subtree — this form keeps the
    // per-side aggregates identical to the main branch's, so their
    // exchanges are REUSED and the inputs are scanned once, not twice
    // (plan-pinned in PlanHygieneSpec).
    val nv = joined0.agg(count(when(
      greatest(col("__ca"), col("__cb")) >= 0L, 1L)).as("__nv"))
    val joined = joined0.crossJoin(broadcast(nv))
      .withColumn("__ca", cardinalityGuard(col("__ca"), col("__nv"),
        maxDistinct, "ksDrift"))
      .drop("__nv")
    val cumW = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cum = joined
      .withColumn("__i", sum(col("__ca")).over(cumW))
      .withColumn("__j", sum(col("__cb")).over(cumW))
      .withColumn("__ta", sum(col("__ca")).over(allW))
      .withColumn("__tb", sum(col("__cb")).over(allW))
    val red = cum.agg(
      max(abs(dec(col("__i")) * dec(col("__tb")) -
        dec(col("__j")) * dec(col("__ta")))).as("__num"),
      max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"))
    // empty-input discipline (same as abTest): the readout must never
    // vanish or go null-count — an all-empty reduce yields one row of
    // zeros with a null ks (0/0 has no value; the flag is 0, not an
    // ANSI divide-by-zero error). ks_num/ks_den emit through the exact
    // int64 gate (a wrapping long multiply would corrupt the rational
    // silently in non-ANSI mode — r13 review).
    val emptyish = coalesce(col("n_a"), lit(0L)) === 0L ||
      coalesce(col("n_b"), lit(0L)) === 0L
    red.select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(emptyish, lit(0L))
          .otherwise(asLongExact(col("__num"), "ksDrift: ks_num"))
          .as("ks_num"),
        when(emptyish, lit(0L))
          .otherwise(asLongExact(dec(col("n_a")) * dec(col("n_b")),
            "ksDrift: ks_den")).as("ks_den"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("__num").cast("double") /
            (dec(col("n_a")) * dec(col("n_b"))).cast("double")).as("ks"),
        ksSignificant(col("__num"), coalesce(col("n_a"), lit(0L)),
          coalesce(col("n_b"), lit(0L))).as("significant"))
  }

  /** Per-GROUP χ² drift — every group's CATEGORY distribution against
    * the rest of the data in one job: the multi-group form of
    * [[chiSquareDrift]] (as [[ksDriftByGroup]] is of [[ksDrift]]).
    * For group g and category c with count a = n_gc, the other side is
    * b = n_c − a against totals (N_g, N − N_g); contrib is the same
    * exact D²/(N_a·N_b·(a+b)) rational with one IEEE division.
    * Categories a group never takes still contribute (a = 0 is the
    * strongest drift signal) — the grid is the bounded group directory
    * × the category directory, both broadcast.
    *
    * One row per (group, category): (groupCol, catCol, n_in, n_rest,
    * contrib); Σ contrib per group ~ χ²(k−1) under no drift.
    *
    * Scale shape: one (group, category) count + two directory
    * aggregates; the grid is groups × categories — monitoring
    * dimensions, never data-sized. No windows at all. */
  def chiSquareDriftByGroup(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    chiSquareDriftByGroupFromCounts(
      df.select(col(groupCol), col(catCol), lit(1L).as("__one")),
      groupCol, catCol, "__one")

  /** [[chiSquareDriftByGroup]] over a PRE-AGGREGATED (group, category,
    * count) relation — the form a monitor composes with counts it
    * already maintains: q243 drains WATERMARKED per-window streaming
    * counts and grades each window's category mix against the rest of
    * the stream with exactly this math (drift-on-arrival); any rollup
    * table works the same way. Duplicate (group, category) rows sum;
    * negative counts raise loudly; same grid shape and overflow guard
    * as the row form (which delegates here with count 1). */
  def chiSquareDriftByGroupFromCounts(counts: DataFrame,
      groupCol: String, catCol: String, nCol: String): DataFrame = {
    val n0 = col(nCol).cast("long")
    // negative or NULL counts raise (a null in a rollup is a broken
    // rollup, not data) — the same loud-contract bar as every other
    // operator here
    val rows = counts
      .filter(col(catCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(catCol).as("__c"),
        when(n0.isNull || n0 < 0L, raise_error(concat(
          lit(s"chiSquareDriftByGroupFromCounts: negative or null count "),
          coalesce(n0.cast("string"), lit("null")))))
          .otherwise(n0).as("__n0"))
    val gc = rows.groupBy(col("__g"), col("__c"))
      .agg(sum(col("__n0")).as("__a"))
    val cats = rows.groupBy(col("__c")).agg(sum(col("__n0")).as("__nc"))
    val groups = rows.groupBy(col("__g")).agg(sum(col("__n0")).as("__ng"))
    val tot = rows.agg(sum(col("__n0")).as("__n"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = cats.join(broadcast(groups), lit(true))
      .join(gc, Seq("__g", "__c"), "left")
      .join(broadcast(tot), lit(true))
      .withColumn("__a", coalesce(col("__a"), lit(0L)))
      .withColumn("__b", col("__nc") - col("__a"))
      .withColumn("__rest", col("__n") - col("__ng"))
    val d = dec(col("__a")) * dec(col("__rest")) -
      dec(col("__b")) * dec(col("__ng"))
    val d2 = d * d
    val den = dec(col("__ng")) * dec(col("__rest")) * dec(col("__nc"))
    grid.select(col("__g").as(groupCol), col("__c").as(catCol),
      col("__a").as("n_in"), col("__b").as("n_rest"),
      when(col("__nc") === 0L || col("__ng") === 0L || col("__rest") === 0L,
          lit(0.0))
        .when(d2.isNull || den.isNull,
          raise_error(lit("chiSquareDriftByGroup: decimal(38) overflow — " +
            "totals exceed the exact range; subsample")))
        .otherwise(d2.cast("double") / den.cast("double")).as("contrib"))
  }

  /** Per-GROUP two-sample KS — every group's value CDF against the REST
    * of the data in one job (per-source drift, per-model-version score
    * shift): the multi-group form of [[ksDrift]], with the same exact
    * integer rational per group. F_g and F_rest must be compared at
    * EVERY global distinct value (the supremum can sit at a value the
    * group never takes), so the evaluation grid is (groups × distinct
    * values), built by broadcasting the group DIRECTORY (bounded by
    * group cardinality — a monitoring dimension, never data-sized)
    * across the distinct-value relation.
    *
    * One row per group: (groupCol, n, n_rest, ks_num, ks_den, ks,
    * significant) — ks_num = max over values of
    * |i_g·(N−n_g) − (J−i_g)·n_g|, ks_den = n_g·(N−n_g), significance
    * squared into the DECIMAL(38,0) integer compare (loud overflow
    * guard; exact while KS·n_g·(N−n_g) ≲ 10¹⁶ — see [[ksSignificant]]).
    *
    * Scale shape: one (group, value) count + one global value count,
    * then group-PARTITIONED cumulative windows over the grid — unlike
    * [[ksDrift]]'s single ordered pass, every group sorts in parallel;
    * cost is groups × distinct values. The quantize-first contract is
    * ENFORCED like the two-sample form's (r14): past `maxDistinct`
    * distinct values the grid would explode groups-fold — the operator
    * raises naming [[quantize]] instead (same exchange-reused count
    * branch). */
  def ksDriftByGroup(df: DataFrame, valueCol: String,
      groupCol: String,
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
    val pv = rows.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val gv0 = rows.groupBy(col("__v")).agg(count(lit(1)).as("__cv"))
    val nv = gv0.agg(count(when(col("__cv") >= 0L, 1L)).as("__nv"))
    val gv = gv0.crossJoin(broadcast(nv))
      .withColumn("__cv", cardinalityGuard(col("__cv"), col("__nv"),
        maxDistinct, "ksDriftByGroup"))
      .drop("__nv")
    val groups = rows.groupBy(col("__g")).agg(count(lit(1)).as("__ng"))
    val tot = rows.agg(count(lit(1)).as("__n"))
    // grid: every (group, value) — group directory broadcast (bounded)
    val grid = gv.join(broadcast(groups), lit(true))
    val cum = grid
      .join(pv, Seq("__g", "__v"), "left")
      .withColumn("__i", sum(coalesce(col("__c"), lit(0L))).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__j", sum(col("__cv")).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val red = cum.join(broadcast(tot), lit(true))
      .withColumn("__rest", col("__n") - col("__ng"))
      .groupBy(col("__g"), col("__ng"), col("__rest"))
      .agg(max(abs(dec(col("__i")) * dec(col("__rest")) -
        dec(col("__j") - col("__i")) * dec(col("__ng")))).as("__num"))
    // emission through the shared exact-int64 gate + the shared α=0.05
    // rational (one home for the critical constant — r13 review)
    val emptyish = col("__ng") === 0L || col("__rest") === 0L
    red.select(col("__g").as(groupCol), col("__ng").as("n"),
      col("__rest").as("n_rest"),
      when(emptyish, lit(0L))
        .otherwise(asLongExact(col("__num"), "ksDriftByGroup: ks_num"))
        .as("ks_num"),
      when(emptyish, lit(0L))
        .otherwise(asLongExact(dec(col("__ng")) * dec(col("__rest")),
          "ksDriftByGroup: ks_den")).as("ks_den"),
      when(col("__ng") > 0L && col("__rest") > 0L,
        col("__num").cast("double") /
          (dec(col("__ng")) * dec(col("__rest"))).cast("double")).as("ks"),
      ksSignificant(col("__num"), col("__ng"), col("__rest"))
        .as("significant"))
  }

  /** Retrieval evaluation at cutoff `k` — the ranked-list metrics that
    * grade the engine's own search surfaces (ANN probes, BM25, hybrid
    * RRF) against a relevance set: per query,
    *   - `n_rel`: relevant docs (judged set size),
    *   - `n_hit_k`: relevant docs among the top-k results,
    *   - `p_at_k` = n_hit_k / k,  `r_at_k` = n_hit_k / n_rel,
    *   - `rr` = 1 / rank of the FIRST relevant result (0 when none) —
    *     the reciprocal-rank each query contributes to MRR.
    * All counts are exact integers; the ratios are single IEEE
    * quotients (the catalog's transcendental-free eval discipline —
    * NDCG is deliberately out: its log2 discount cannot be made
    * engine-exact). Macro-averaging is one `avg` away and is left to
    * the caller so the per-query readout stays inspectable.
    *
    * Queries with results but no judged-relevant docs report
    * n_rel = 0, r_at_k = 0, rr = 0 (not dropped — a silent drop would
    * inflate the macro mean). Queries in `qrels` with NO results at
    * all likewise surface with zero hits.
    *
    * Scale shape: one left join of top-k results against qrels on
    * (query, doc) — both relations id-sized — plus one map-combined
    * per-query aggregate and one qrels-size aggregate joined back;
    * no windows, no per-query buffering. */
  /** The per-rank DCG discount table: 1/log₂(r+1) QUANTIZED to 40
    * fractional bits — i.e. the RATIONAL round(2⁴⁰/log₂(r+1))/2⁴⁰
    * (relative error < 1e-12, far inside any ranking-metric use).
    * Irrational discounts are the one place nDCG can't be
    * exact-integer; the quantization makes the whole readout
    * engine-reproducible: the numerator is an exact ≤2⁴⁰ integer and
    * the divisor a power of two, so `CAST(n AS DOUBLE) / 2^40` yields
    * bit-identical doubles in any IEEE engine. (The first cut shared
    * shortest-round-trip decimal TEXT instead — and DuckDB's literal
    * parser landed one ulp off on the rank-5 value, a measured
    * hash-gate miss. Decimal text is not a cross-engine contract;
    * integer-over-power-of-two is.) */
  val ndcgDiscountDen: Double = 1099511627776.0 // 2^40
  def ndcgDiscountNums(k: Int): Seq[Long] =
    (1 to k).map(r => math.rint(
      ndcgDiscountDen / (math.log(r + 1.0) / math.log(2.0))).toLong)
  def ndcgDiscounts(k: Int): Seq[Double] =
    ndcgDiscountNums(k).map(_.toDouble / ndcgDiscountDen)

  /** Graded nDCG@k — the standard ranking metric [[retrievalMetrics]]'s
    * binary P@k/MRR can't express (TREC exponential gain 2^grade − 1,
    * discount 1/log₂(rank+1)). `qrels` carries (query, doc, grade ≥ 0)
    * with grade an exact small integer (checked loudly; grade 0 rows
    * are allowed and contribute nothing). Unjudged retrieved docs gain
    * 0. IDCG@k is the ideal ordering of the query's judged grades
    * (grade desc, doc asc — the doc tie-break pins WHICH equal-grade
    * doc occupies each discounted position, making the fold
    * engine-reproducible); `ndcg_at_k` is NULL when a query has no
    * positive-grade judgments (0/0), 0.0 when it retrieved none of
    * them.
    *
    * CONTRACT (stricter since r16): ranks must be distinct per query
    * within the top-k — two different docs sharing a rank raise at
    * runtime rather than silently double-counting the position's
    * discount. Inputs with rank()/dense_rank()-style ties must break
    * them (e.g. row_number) before calling; duplicate (query, doc)
    * rows still collapse to best rank as before.
    *
    * Determinism: every per-query sum is a left fold over a sorted
    * array (`array_sort` → `aggregate`), so the IEEE add order is
    * pinned — same discipline as the q63 fingerprint fold — and the
    * discounts come from [[ndcgDiscounts]]'s shared literals.
    *
    * Scale shape: top-k results join qrels on (query, doc) — id-sized;
    * per-query folds touch ≤ k elements (results) and the judged set
    * capped to k after an id-sized sort window. One window over qrels
    * (grade-desc top-k per query) + two map-combined collect folds;
    * no data-sized windows. */
  def ndcgAtK(results: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val discounts = ndcgDiscounts(k)
    def discountOf(rank: Column): Column =
      discounts.zipWithIndex.foldRight(lit(0.0): Column) {
        case ((d, i), acc) => when(rank === (i + 1), lit(d)).otherwise(acc)
      }
    // shiftleft via call_function: the Scala helper's signature takes a
    // literal Int shift, not a Column
    def gain(grade: Column): Column =
      (call_function("shiftleft", lit(1L), grade.cast("int")) - lit(1L))
        .cast("double")
    def foldSum(pos: Column, contrib: Column): Column =
      aggregate(
        array_sort(collect_list(struct(pos.as("p"), contrib.as("c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("c"))
    val res = dedupTopK(results, queryCol, docCol, rankCol, k, "ndcgAtK")
    // the negative-grade guard sits ABOVE the dedup aggregate, not in a
    // filter on the input: a filter predicate would push down into the
    // caller's qrels-building join and evaluate on pairs the join
    // condition hadn't pruned yet (burned here: a |Δlabel| ≤ 2 theta
    // join raised on the unpruned |Δ| = 5 pairs). min(__g) < 0 over the
    // agg catches every negative input row, and nothing below an
    // aggregate is reorderable past it.
    val rel = qrels
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        integralLong(col(gradeCol), "ndcgAtK", gradeCol).as("__g"))
      .groupBy(col("__q"), col("__d"))
      .agg(max(col("__g")).as("__g"), min(col("__g")).as("__gmin"))
      .select(col("__q"), col("__d"),
        when(col("__gmin") < 0, raise_error(lit(
          s"ndcgAtK: negative grade in $gradeCol")))
          // gain is 2^grade − 1 via shiftleft(1L, grade), which wraps
          // the shift mod 64 — a grade ≥ 63 would silently yield a
          // zero/negative gain. Raise like the negative-grade guard;
          // graded relevance scales top out at single digits, so 62
          // is a sanity bound, not a real restriction.
          .when(col("__g") > 62, raise_error(lit(
            s"ndcgAtK: grade in $gradeCol exceeds 62 — 2^grade gain " +
              "would overflow the 64-bit shift")))
          .otherwise(col("__g")).as("__g"))
    val dcg = res.join(rel, Seq("__q", "__d"), "left")
      .select(col("__q"),
        (gain(coalesce(col("__g"), lit(0L))) * discountOf(col("__r")))
          .as("__c"), col("__r"))
      .groupBy(col("__q")).agg(foldSum(col("__r"), col("__c")).as("dcg_at_k"))
    val ideal = rel.filter(col("__g") > 0)
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__q"))
          .orderBy(col("__g").desc, col("__d").asc)))
      .filter(col("__pos") <= k)
      .select(col("__q"),
        (gain(col("__g")) * discountOf(col("__pos"))).as("__c"),
        col("__pos"))
      .groupBy(col("__q"))
      .agg(foldSum(col("__pos"), col("__c")).as("idcg_at_k"),
        count(lit(1)).as("n_judged_k"))
    dcg.join(ideal, Seq("__q"), "full_outer")
      .select(col("__q").as(queryCol),
        coalesce(col("n_judged_k"), lit(0L)).as("n_judged_k"),
        coalesce(col("dcg_at_k"), lit(0.0)).as("dcg_at_k"),
        col("idcg_at_k"),
        when(col("idcg_at_k").isNull, lit(null).cast("double"))
          .otherwise(coalesce(col("dcg_at_k"), lit(0.0)) /
            col("idcg_at_k")).as("ndcg_at_k"))
  }

  /** Shared ranking-input normalization for the position-sensitive
    * metrics (ndcgAtK, apAtK): ranks validated integral and cut to
    * [1, k]; duplicate (query, doc) rows collapse to best rank; then
    * duplicate RANKS raise loudly — two DIFFERENT docs both at rank 1
    * would each receive the rank-1 discount/precision and silently
    * inflate the metric, and a real ranking never assigns one position
    * twice. The count(*) window sits above the dedup aggregate so it
    * sees every surviving row. (retrievalMetrics keeps its guard-less
    * dedup: its hit COUNTS are rank-position-insensitive.) */
  private def dedupTopK(results: DataFrame, queryCol: String,
      docCol: String, rankCol: String, k: Int, caller: String): DataFrame =
    results
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        integralLong(col(rankCol), caller, rankCol).as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
      .groupBy(col("__q"), col("__d")).agg(min(col("__r")).as("__r"))
      .withColumn("__nr", count(lit(1)).over(
        Window.partitionBy(col("__q"), col("__r"))))
      .select(col("__q"), col("__d"),
        when(col("__nr") > 1, raise_error(lit(
          s"$caller: duplicate rank in $rankCol — ranks must be " +
            "distinct per query within the top-k")))
          .otherwise(col("__r")).as("__r"))

  /** Average precision at k per query — the MAP family's per-query
    * row (mean over queries is a trivial avg the caller takes):
    * AP@k = Σ_{relevant results at rank r ≤ k} P@r / min(n_rel, k),
    * with P@r = cum_hits(r)/r over the deduped ranking. The min(n_rel,
    * k) denominator is the standard trec_eval truncation — a query
    * with 100 judged docs can still score 1.0 from a perfect top-k.
    * `ap_at_k` is NULL when the query has no judged docs (0/0), 0.0
    * when it retrieved none of them. Duplicate (query, doc) rows
    * collapse to best rank (retrievalMetrics' contract); duplicate
    * RANKS raise loudly (ndcgAtK's guard — P@r is ill-defined when one
    * position holds two docs).
    *
    * Determinism: each contribution cum/r is an IEEE quotient of small
    * exact integers, summed in rank order via the sorted-array left
    * fold (the q63/q246 discipline), so an oracle restates the
    * identical adds — a full hash gate on a ranking metric.
    *
    * Scale shape: id-sized (query, doc) join; per-query state ≤ k rows
    * through one rank window + one collect fold — no data-sized
    * windows. */
  def apAtK(results: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val res = dedupTopK(results, queryCol, docCol, rankCol, k, "apAtK")
    val rel = qrels
      .select(col(queryCol).as("__q"), col(docCol).as("__d")).distinct()
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    val cum = res
      .join(rel.withColumn("__rel", lit(1L)), Seq("__q", "__d"), "left")
      .withColumn("__cum", sum(coalesce(col("__rel"), lit(0L))).over(
        Window.partitionBy(col("__q")).orderBy(col("__r"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    // non-hits contribute 0.0 INSIDE the fold rather than being
    // filtered out: a query whose top-k holds no judged doc must still
    // surface (n_rel 0 → NULL, judged-but-missed → 0.0) — the
    // retrievalMetrics no-silent-drop contract. Adding 0.0 between the
    // rational adds is bitwise-exact, so the oracle may equivalently
    // FILTER its fold list to hits only.
    val sums = cum
      .select(col("__q"), col("__r"),
        when(col("__rel") === 1L,
          col("__cum").cast("double") / col("__r").cast("double"))
          .otherwise(lit(0.0)).as("__c"))
      .groupBy(col("__q"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__r").as("p"),
          col("__c").as("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("__sum"))
    nRel.join(sums, Seq("__q"), "full_outer")
      .select(col("__q").as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L,
          lit(null).cast("double"))
          .otherwise(coalesce(col("__sum"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"))
          .as("ap_at_k"))
  }

  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // Ranks are 1-based (rank 0 would make rr = 1/0); rows outside
    // [1, k] are out of scope by definition. Duplicate (query, doc)
    // rows within the top-k (a retrieval surface that returns the same
    // doc twice) collapse to their best rank so n_hit_k counts DOCS,
    // never rows — p_at_k can't exceed 1.
    val res = results
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        integralLong(col(rankCol), "retrievalMetrics", rankCol).as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
      .groupBy(col("__q"), col("__d")).agg(min(col("__r")).as("__r"))
    val rel = qrels
      .select(col(queryCol).as("__q"), col(docCol).as("__d")).distinct()
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    val hits = res.join(rel.withColumn("__rel", lit(1L)),
        Seq("__q", "__d"), "left")
      .groupBy(col("__q"))
      .agg(sum(coalesce(col("__rel"), lit(0L))).as("n_hit_k"),
        min(when(col("__rel") === 1L, col("__r"))).as("__first"))
    // full outer: queries with no results and queries with no judged
    // docs both surface
    nRel.join(hits, Seq("__q"), "full_outer")
      .select(col("__q").as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hit_k"), lit(0L)).as("n_hit_k"),
        col("__first"))
      .withColumn("p_at_k", col("n_hit_k").cast("double") / lit(k.toDouble))
      .withColumn("r_at_k", when(col("n_rel") === 0, 0.0)
        .otherwise(col("n_hit_k").cast("double") / col("n_rel").cast("double")))
      .withColumn("rr", when(col("__first").isNull, 0.0)
        .otherwise(lit(1.0) / col("__first").cast("double")))
      .drop("__first")
  }

  /** CALIBRATION readout over integer milli-probability scores — does a
    * classifier's confidence mean what it says? Scores come in as
    * integers in [0, 1000] (milli-probability: real eval pipelines
    * quantize scores anyway, and the integer contract is what makes the
    * readout exact — checked loudly). Per equal-width confidence bin b
    * (`bins` of width 1000/bins, top bin closed):
    *   - `n`: rows, `sum_y`: positives, `sum_a`: Σ milli-scores,
    *   - `acc` = sum_y/n and `conf` = sum_a/(1000·n) (IEEE quotients),
    *   - `gap_num` = |1000·sum_y − sum_a| — the EXACT integer numerator
    *     of n·|acc − conf|·1000: ECE = Σ_b gap_num / (1000·N), so the
    *     caller sums one int64 column and divides once (same
    *     rows-are-the-readout contract as [[chiSquareDrift]]).
    * Empty bins materialize with zeros — a confidence region the model
    * never uses is itself a finding.
    *
    * Scale shape: ONE map-combined aggregate over `bins` keys + a
    * bins-sized grid join; int64 is exact to ~9·10¹⁵ rows/bin. */
  def calibration(df: DataFrame, milliCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0 && 1000 % bins == 0,
      s"bins must divide 1000, got $bins")
    val width = 1000 / bins
    val a = milliScore(col(milliCol), "calibration", milliCol)
    val rows = df.filter(col(labelCol).isNotNull)
      .select(a.as("__a"),
        binaryLabel(col(labelCol), "calibration", labelCol).as("__y"))
    val agg = rows
      .groupBy(least(expr(s"__a div $width"), lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("sum_y"),
        sum(col("__a")).as("sum_a"))
    val grid = df.sparkSession.range(bins).select(col("id").as("bin"))
    grid.join(agg, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_y"), lit(0L)).as("sum_y"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"))
      .withColumn("acc", when(col("n") > 0,
        col("sum_y").cast("double") / col("n").cast("double")))
      .withColumn("conf", when(col("n") > 0,
        col("sum_a").cast("double") / (col("n") * 1000L).cast("double")))
      .withColumn("gap_num", abs(col("sum_y") * 1000L - col("sum_a")))
  }

  /** Per-GROUP calibration — [[calibration]] × the bounded
    * group-directory grid of [[ksDriftByGroup]]/[[chiSquareDriftByGroup]]:
    * per-model-version or per-source calibration drift is the form a
    * training pipeline actually monitors (a scorer can be calibrated
    * on the pooled corpus while badly mis-calibrated on one source).
    * One row per (group, bin) with the same exact integer columns as
    * the two-sample form; bins a group never uses materialize with
    * zeros (a confidence region one source never hits is itself a
    * finding). Per-group ECE = Σ_b gap_num / (1000·n_g) — one grouped
    * int64 sum away, left to the caller so the per-bin rows stay
    * inspectable.
    *
    * Scale shape: ONE map-combined (group, bin) aggregate + the
    * (group directory × bins) broadcast grid — monitoring dimensions,
    * never data-sized; no windows. */
  def calibrationByGroup(df: DataFrame, milliCol: String,
      labelCol: String, groupCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0 && 1000 % bins == 0,
      s"bins must divide 1000, got $bins")
    val width = 1000 / bins
    val rows = df.filter(col(labelCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        milliScore(col(milliCol), "calibrationByGroup", milliCol)
          .as("__a"),
        binaryLabel(col(labelCol), "calibrationByGroup", labelCol)
          .as("__y"))
    val agg = rows
      .groupBy(col("__g"),
        least(expr(s"__a div $width"), lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("sum_y"),
        sum(col("__a")).as("sum_a"))
    // group directory from the AGGREGATE, not the raw rows (r14
    // review): every surviving row lands in some bin, so agg's __g set
    // is exactly the directory — and deriving it from agg's subtree
    // reuses the (group, bin) exchange instead of scanning the input a
    // second time
    val grid = agg.select(col("__g")).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(bins).select(col("id").as("bin"))))
    grid.join(agg, Seq("__g", "bin"), "left")
      .select(col("__g").as(groupCol), col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_y"), lit(0L)).as("sum_y"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"))
      .withColumn("acc", when(col("n") > 0,
        col("sum_y").cast("double") / col("n").cast("double")))
      .withColumn("conf", when(col("n") > 0,
        col("sum_a").cast("double") / (col("n") * 1000L).cast("double")))
      .withColumn("gap_num", abs(col("sum_y") * 1000L - col("sum_a")))
  }

  /** Per-GROUP exact Brier — [[brierExact]] keyed by `groupCol`: one
    * row per group (groupCol, n, brier_num, brier). Groups come from
    * the data itself (no grid — a group with no rows has no score);
    * ONE map-combined aggregate, scan-linear. */
  def brierByGroup(df: DataFrame, milliCol: String, labelCol: String,
      groupCol: String): DataFrame = {
    val a = milliScore(col(milliCol), "brierByGroup", milliCol)
    val d = a - lit(1000L) * binaryLabel(col(labelCol), "brierByGroup",
      labelCol)
    df.filter(col(labelCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(d * d), lit(0L)).as("brier_num"))
      .withColumn("brier", when(col("n") > 0,
        col("brier_num").cast("double") /
          (col("n") * 1000000L).cast("double")))
  }

  /** PAIR-COUNTING clustering evaluation — grades a cluster assignment
    * against ground-truth labels (dedup clusters vs known duplicates,
    * embedding clusters vs class labels) without ever materializing a
    * pair: with contingency counts n_pc (rows in predicted cluster p ∧
    * truth class c), row/column marginals n_p / n_c and total n, the
    * pair counts are pure combinatorics —
    *   TP = Σ C(n_pc,2),  TP+FP = Σ C(n_p,2),  TP+FN = Σ C(n_c,2),
    *   TN = C(n,2) − TP − FP − FN
    * giving pair-precision/recall/F1 and the Rand index as IEEE
    * quotients of exact int64 (exact to ~4·10⁹ rows; C(n,2) runs in
    * n·(n−1)/2 with the multiply in DECIMAL(38,0) and a loud overflow
    * guard). Rows with a null on either side are excluded (they belong
    * to no pair). One row: (n, tp, fp, fn, tn, pair_precision,
    * pair_recall, pair_f1, rand_index).
    *
    * Scale shape: THREE map-combined aggregates (cells, two marginals)
    * — never all-pairs; the cell key space is (clusters × classes). */
  def clusterPairCounts(df: DataFrame, predCol: String,
      truthCol: String): DataFrame = {
    val rows = df.filter(col(predCol).isNotNull && col(truthCol).isNotNull)
      .select(col(predCol).as("__p"), col(truthCol).as("__c"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    def choose2(c: Column): Column = {
      val v = dec(c) * dec(c - 1L) / lit(2L)
      // asLongExact: a C(n,2) that fits decimal(38) but not int64 would
      // otherwise null through cast(long) and silently vanish from the
      // sum in non-ANSI mode (r13 review)
      when(c.isNull, lit(0L))
        .when(v.isNull, raise_error(lit("clusterPairCounts: decimal(38) " +
          "overflow — group sizes exceed the exact range")))
        .otherwise(asLongExact(v, "clusterPairCounts: pair count"))
    }
    val cells = rows.groupBy(col("__p"), col("__c"))
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(choose2(col("__n"))), lit(0L)).as("tp"))
    val predM = rows.groupBy(col("__p")).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(choose2(col("__n"))), lit(0L)).as("tpfp"))
    val truthM = rows.groupBy(col("__c")).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(choose2(col("__n"))), lit(0L)).as("tpfn"))
    val tot = rows.agg(count(lit(1)).as("n"))
      .withColumn("all_pairs", choose2(col("n")))
    // four one-row aggregates — the crossJoins are 1×1 by construction
    val j = tot.crossJoin(broadcast(cells)).crossJoin(broadcast(predM))
      .crossJoin(broadcast(truthM))
      .withColumn("fp", col("tpfp") - col("tp"))
      .withColumn("fn", col("tpfn") - col("tp"))
      .withColumn("tn", col("all_pairs") - col("tpfp") - col("fn"))
    j.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0, col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double")).as("pair_precision"),
      when(col("tp") + col("fn") > 0, col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double")).as("pair_recall"),
      when(col("tp") * 2L + col("fp") + col("fn") > 0,
        (col("tp") * 2L).cast("double") /
          (col("tp") * 2L + col("fp") + col("fn")).cast("double"))
        .as("pair_f1"),
      when(col("all_pairs") > 0, (col("tp") + col("tn")).cast("double") /
        col("all_pairs").cast("double")).as("rand_index"))
  }

  /** Exact BRIER score over the same integer milli-probability contract
    * as [[calibration]]: with a = 1000·p and y ∈ {0,1},
    * (p − y)² = (a − 1000·y)²/10⁶, so Σ(a−1000y)² is an exact int64
    * (to ~9·10¹² rows) and the score is one IEEE division. One row:
    * (n, brier_num, brier); empty input yields (0, 0, null) — the
    * readout never vanishes. */
  def brierExact(df: DataFrame, milliCol: String,
      labelCol: String): DataFrame = {
    val a = milliScore(col(milliCol), "brierExact", milliCol)
    val d = a - lit(1000L) * binaryLabel(col(labelCol), "brierExact",
      labelCol)
    df.filter(col(labelCol).isNotNull)
      .agg(count(lit(1)).as("n"), coalesce(sum(d * d), lit(0L)).as("brier_num"))
      .withColumn("brier", when(col("n") > 0,
        col("brier_num").cast("double") /
          (col("n") * 1000000L).cast("double")))
  }
}
