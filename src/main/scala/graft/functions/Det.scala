package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, bround, concat, count, lit,
  raise_error, sum, when}

/** Deterministic float aggregation for hash-gated / cross-engine-compared
  * outputs.
  *
  * A parallel double sum drifts at the last ulp with partition/merge
  * order; on a 1000-executor cluster the order is run-dependent, so any
  * exact comparison over a raw `sum(double)` is a coin flip (tpch09
  * flaked green→red across rounds on exactly this). The fix: round each
  * row to a fixed decimal (a pure function of the row — deterministic in
  * both engines), sum exactly in decimal (integer arithmetic, order-
  * independent), and cast the single exact result back to double.
  * Oracle SQL mirrors the same cast chain, so both engines produce the
  * bit-identical double every run at every parallelism.
  *
  * The per-row rounding must ALSO agree across engines at exact ties:
  * division-derived values (e.g. a min-unit-price supplycost) can land
  * exactly on a .5e-6 boundary (observed: 57780.8715625), where
  * DuckDB's double→decimal cast rounds half-even (`nearbyint` on the
  * ×10^scale double) while Spark's rounds HALF_UP. So the Spark side
  * emulates DuckDB's cast bit-for-bit: `bround(v*10^s, 0)` rounds the
  * identical IEEE-scaled double with the identical half-even tie rule,
  * and the oracle states the plain `CAST(v AS DECIMAL(25,s))` it
  * mirrors. Row magnitudes must stay under 2^53/10^scale (money rows
  * are ~1e5 at scale 6; use scale 4 for squared prices); the decimal
  * SUM itself has ~1e29 headroom. */
object Det {
  /** Debug mode (round-7 verdict item 7): when the system property
    * `graft.dsum.checked` or env var `GRAFT_DSUM_CHECKED` is `1`/`true`,
    * every [[dsum]]/[[davg]] call site builds the CHECKED variant, so a
    * magnitude violation anywhere in the catalog surfaces as a hard
    * error in CI instead of a silent precision lapse in production.
    * Read per-call (Columns are built driver-side), so a spec can
    * toggle it with `sys.props`. Text forms ([[dsumSparkSql]]) are SQL
    * strings and stay unchecked — their call sites state magnitudes by
    * construction. */
  private def checkedMode: Boolean =
    sys.props.get("graft.dsum.checked")
      .orElse(sys.env.get("GRAFT_DSUM_CHECKED"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
  /** [[dsum]] body without the debug-mode redirect ([[dsumChecked]]
    * builds on this — keeps the pair non-recursive). The exact integer
    * sum runs in [[DSum128]] (int128 in two long lanes, codegen'd) —
    * same integer result as the previous `sum(DECIMAL(25,0))` form at
    * 3× its aggregation speed; the oracle's decimal-sum SQL is
    * unchanged because the value is identical. Requires
    * [[GraftFunctions.register]] (every entry point + Tables.t do). */
  private def dsumRaw(c: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    org.apache.spark.sql.functions.call_function(
      "dsum128", bround(c * p, 0).cast("long")).cast("double") / p
  }
  /** Order-independent sum of a double expression (see object doc):
    * per-row half-even round to `scale` decimals as an exact integer,
    * exact decimal sum, single double division at the end. */
  def dsum(c: Column, scale: Int = 6): Column =
    if (checkedMode) dsumChecked(c, scale) else dsumRaw(c, scale)
  /** Order-independent mean: exact decimal sum over non-null count. */
  def davg(c: Column, scale: Int = 6): Column = dsum(c, scale) / count(c)
  /** The exact DECIMAL(38,0) INTEGER sum behind [[dsum]] (values
    * half-even-rounded to `scale` decimals, summed exactly) — for
    * callers that must RE-AGGREGATE partials without losing exactness:
    * decimal adds are associative, so `sum(dsumInt(...))` over partials
    * equals one global [[dsum]] bit-for-bit once divided back by
    * 10^scale, where a re-sum of the double view would round. Keep the
    * decimal INTERNAL (divide/cast before emitting — the catalog emits
    * no DECIMAL columns). */
  def dsumInt(c: Column, scale: Int = 6): Column = {
    val p = lit(math.pow(10, scale))
    org.apache.spark.sql.functions.call_function(
      "dsum128", bround(c * p, 0).cast("long"))
  }
  /** [[dsum]] with the magnitude contract ENFORCED per row: a |value|
    * above 2^53/10^scale has no exact scaled-integer representation, so
    * plain [[dsum]] would round it silently and the "deterministic"
    * guarantee would quietly lapse. This variant raises instead — use it
    * in specs/debug runs (and anywhere the data's magnitude isn't known
    * by construction) to turn the documented cap into a checked one. */
  def dsumChecked(c: Column, scale: Int = 6): Column = {
    val cap = lit(math.pow(2, 53) / math.pow(10, scale))
    dsumRaw(when(abs(c) > cap,
      raise_error(concat(
        lit(s"Det.dsum magnitude overflow: |value| > 2^53/1e$scale at "),
        c.cast("string"),
        lit(" — exact scaled-integer representation impossible; " +
          "lower the scale or pre-aggregate")))).otherwise(c), scale)
  }
  /** Weighted [[dsum]]: exactly the integer total that summing `w`
    * copies of each value would produce — per-row half-even round to
    * `scale` decimals, multiply by the (long) weight in exact integer
    * arithmetic, int128 sum. Lets a call site pre-aggregate duplicate
    * rows to (value, multiplicity) and keep the result BIT-IDENTICAL to
    * the per-instance form (long multiply is exact while
    * |value|·10^scale · w < 2^63 — at scale 12 that is w ≲ 9.2e6 per
    * distinct |value| ≤ 1 row, far above any per-key repeat factor). */
  def dsumWeighted(c: Column, w: Column, scale: Int = 6): Column =
    if (checkedMode) dsumWeightedChecked(c, w, scale)
    else dsumWeightedRaw(c, w, scale)
  private def dsumWeightedRaw(c: Column, w: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    org.apache.spark.sql.functions.call_function(
      "dsum128", bround(c * p, 0).cast("long") * w.cast("long"))
      .cast("double") / p
  }
  /** [[dsumWeighted]] with BOTH exactness contracts enforced per row
    * (mirrors [[dsumChecked]] under checked mode, which plain
    * dsumWeighted previously bypassed — round-10 review): the value must
    * have an exact scaled-integer representation, and the scaled-integer
    * × weight product must fit a signed 64-bit long or the multiply
    * would wrap silently in non-ANSI Spark. The product test runs in
    * double (exact enough for a guardrail two orders below the wrap). */
  def dsumWeightedChecked(c: Column, w: Column, scale: Int = 6): Column = {
    val p = math.pow(10, scale)
    val valCap = lit(math.pow(2, 53) / p)
    val bad = abs(c) > valCap ||
      abs(c) * lit(p) * abs(w.cast("double")) > lit(9.0e18)
    dsumWeightedRaw(when(bad,
      raise_error(concat(
        lit(s"Det.dsumWeighted overflow at scale $scale: value "),
        c.cast("string"), lit(" x weight "), w.cast("string"),
        lit(" — exact weighted scaled-integer sum impossible; lower " +
          "the scale or pre-split the weight")))).otherwise(c), w, scale)
  }
  /** Window-safe [[dsum]] half: a bare aggregate (no trailing cast /
    * divide) so `.over(w)` applies; finish with [[dwinFinish]]. */
  def dsumWin(c: Column): Column =
    sum(bround(c * lit(1e6), 0).cast("decimal(25,0)"))
  /** Finishing projection for a [[dsumWin]] window column. */
  def dwinFinish(c: Column): Column = c.cast("double") / lit(1e6)
  /** Oracle-SQL mirror of [[dsum]] (DuckDB's native cast IS the
    * half-even scaled-double round that [[dsum]] emulates). ORACLE TEXT
    * ONLY: run through Spark, CAST(x AS DECIMAL) rounds HALF_UP and
    * diverges from the oracle on exact ties — Spark-side SQL strings
    * must use [[dsumSparkSql]] instead. */
  def dsumSql(e: String, scale: Int = 6): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(25,$scale))) AS DOUBLE)"
  /** Oracle-SQL mirror of [[davg]] (oracle text only — see [[dsumSql]]). */
  def davgSql(e: String, scale: Int = 6): String =
    s"(${dsumSql(e, scale)} / count($e))"
  /** SPARK-side SQL form of [[dsum]] for aggSql/sql call sites: the
    * bround half-even rounding [[dsum]] uses, as SQL text, pairing with
    * a [[dsumSql]] oracle. Routes through the registered [[DSum128]]
    * aggregate like the Column form — identical integer, 3× the
    * decimal-sum speed (Q1's seven money aggs were still paying the
    * BigDecimal buffer after the Column form switched). */
  def dsumSparkSql(e: String, scale: Int = 6): String = {
    val p = s"1.0E$scale"
    s"(CAST(dsum128(CAST(bround(($e) * $p, 0) AS BIGINT)) AS DOUBLE) / $p)"
  }
  /** SPARK-side SQL form of [[davg]], pairing with a [[davgSql]] oracle. */
  def davgSparkSql(e: String, scale: Int = 6): String =
    s"(${dsumSparkSql(e, scale)} / count($e))"
}
