package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — the app-tier
  * conversion query (view → click → purchase) that sits next to cohort
  * retention (q154) in the reference's application repertoire
  * (reference surface: the groupby-aggregate app shapes in
  * `/root/reference/apps/`; funnel is their canonical composition).
  *
  * Semantics: a user enters step 1 at their MINIMUM step-1 event time;
  * they enter step i > 1 at their minimum step-i event time STRICTLY
  * AFTER their step-(i−1) entry. Strict ordering means a click at the
  * exact instant of the view does not convert — and makes the result a
  * pure function of the event multiset (min is tie-free), so the
  * funnel is engine-exact with no tie-break columns needed.
  */
object Funnel {

  /** Per-user funnel entry times: (userCol, step_ts_1..step_ts_k,
    * max_step). Rows exist only for users who reached step 1; later
    * step columns are null once a step is missed (nulls are suffix-
    * closed by construction).
    *
    * Scale shape (100 TB of events): each step is a type-filtered
    * map-combined MIN aggregate keyed on user — a hot user (bot)
    * contributes one partial row per partition, never a sorted
    * per-user buffer — plus one user-keyed hash join against the
    * previous step's (user, ts) relation, which is user-count-sized,
    * not event-count-sized. No windows, no arrays, no skew cliff. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct == steps, s"steps must be distinct, got $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts_1"))
    val all = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (st, i)) =>
        val next = events.filter(col(typeCol) === st)
          .select(col(userCol), col(tsCol))
          .join(acc.select(col(userCol), col(s"step_ts_$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"step_ts_$i"))
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as(s"step_ts_${i + 1}"))
        acc.join(next, Seq(userCol), "left")
    }
    // nulls are suffix-closed, so reached-step count == deepest step
    val depth = steps.indices.map(i =>
      when(col(s"step_ts_${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    all.withColumn("max_step", depth)
  }

  /** Session ASSIGNMENT (the per-event complement of the session-window
    * aggregate `Windows`/q46): each event gets its user's running
    * session index, a new session opening when the gap to the previous
    * event exceeds `gapSeconds`. The event order is (tsCol, idCol) —
    * the id tie-break makes the lag, and therefore every boundary,
    * deterministic on fixtures with tied timestamps (tied events have
    * gap 0 and can never split, so the INDEX each event receives is
    * tie-order-free too).
    *
    * One exchange (the window's partitionBy key); state per row is a
    * lag and a running sum — no buffering beyond Spark's window sort. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val boundary = when(
      us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_n",
      sum(boundary).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)) + 1L)
  }
}

/** Event-stream health statistics. */
object EventStats {

  /** INTEGER-EXACT high-side 3σ anomaly detection over per-(user, hour)
    * event counts — the bot/incident detector a pipeline runs before
    * trusting engagement data. The z-score test (c − μ) > 3σ is
    * normally float territory; multiplying through by n² turns it into
    * pure int64 arithmetic over the user's active hours:
    * μ = S/n, σ² = (nQ − S²)/n²  ⇒  flag ⟺ n·c − S > 0 and
    * (n·c − S)² > 9·(n·Q − S²), with n = active hours, S = Σc, Q = Σc².
    * Every engine lands on the identical flag set — no epsilon, no
    * libm. (int64 headroom: needs n·c < ~3·10⁹, i.e. per-user-hour
    * counts × active hours — satisfied by ~any real event stream;
    * widen to decimal(38) beyond.)
    *
    * Scale shape: two map-combined aggregates (hour counts, then
    * per-user moments) + one user-keyed join — a hot user costs
    * partials per partition, never a buffered window.
    *
    * Returns only the flagged rows: (userCol, hr, c, n_hours, total). */
  /** A/B experiment readout with an INTEGER-EXACT two-proportion test:
    * users assigned to variants by salted hash (deterministic,
    * reproducible — the assignment IS the experiment's audit trail),
    * conversion = the user emitted `convType`. The pooled two-
    * proportion z² statistic clears its floats by cross-multiplying:
    *   z² = (c₁n₂ − c₂n₁)²·(n₁+n₂) / (n₁n₂·c·(n−c))
    * with n = n₁+n₂, c = c₁+c₂ — an exact rational computed in
    * DECIMAL(38,0) (128-bit), so significance at a rational threshold
    * (z² ≥ 3841/1000 ≈ the two-sided 5% χ²₁ cut) is a pure integer
    * comparison no engine can flip. Headroom: the worst-case bound
    * (|c₁n₂−c₂n₁| at its n₁n₂ maximum, i.e. p̂₁=1 ∧ p̂₂=0) keeps all
    * products inside 38 digits for n ≲ 1.7·10⁷ total users; in the
    * realistic regime (|p̂₁−p̂₂| ≤ 0.1) the binding term is
    * z2Num·n₁n₂·c·(n−c) and exactness holds to n ≈ 8·10⁸. Beyond,
    * the readout is LOUD, never wrong: under ANSI the decimal multiply
    * throws; under non-ANSI the null-guard raises an explicit error
    * instead of emitting a silently-wrapped flag.
    *
    * Scale shape: one distinct-(user, converted) aggregate (map-
    * combined) then ONE unconditional single-row reduction — both arms
    * come from conditional sums, so an empty arm (or an empty event
    * set) still yields the one readout row with n=0 and null rates,
    * never zero rows.
    *
    * Returns one row: (n_a, c_a, n_b, c_b, rate_a, rate_b, z2_num,
    * z2_den, significant); z2_num/z2_den are computed in DECIMAL(38,0)
    * (and `significant` decided on the exact decimals) but EMITTED as
    * DOUBLE for cross-engine representation stability. */
  def abTest(events: DataFrame, userCol: String, convType: String,
      typeCol: String, seed: String,
      z2Num: Long = 3841L, z2Den: Long = 1000L): DataFrame = {
    val users = events.groupBy(col(userCol))
      .agg(max((col(typeCol) === convType).cast("long")).as("__conv"))
      .withColumn("__v", pmod(graft.text.TextOps.portableHash(
        concat(lit(s"ab:$seed:"), col(userCol).cast("string"))), lit(2L)))
    def armSum(v: Int, e: org.apache.spark.sql.Column) =
      coalesce(sum(when(col("__v") === v, e)), lit(0L))
    val row = users.agg(
      armSum(0, lit(1L)).as("n_a"), armSum(0, col("__conv")).as("c_a"),
      armSum(1, lit(1L)).as("n_b"), armSum(1, col("__conv")).as("c_b"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val diff = dec(col("c_a")) * dec(col("n_b")) -
      dec(col("c_b")) * dec(col("n_a"))
    val num = diff * diff * dec(col("n_a") + col("n_b"))
    val den = dec(col("n_a")) * dec(col("n_b")) *
      dec(col("c_a") + col("c_b")) *
      dec(col("n_a") + col("n_b") - col("c_a") - col("c_b"))
    val lhs = dec(lit(z2Den)) * col("__z2_num")
    val rhs = dec(lit(z2Num)) * col("__z2_den")
    row
      .withColumn("rate_a", when(col("n_a") > 0,
        col("c_a").cast("double") / col("n_a").cast("double")))
      .withColumn("rate_b", when(col("n_b") > 0,
        col("c_b").cast("double") / col("n_b").cast("double")))
      .withColumn("__z2_num", num)
      .withColumn("__z2_den", den)
      .withColumn("significant",
        when(col("__z2_num").isNull || col("__z2_den").isNull ||
            lhs.isNull || rhs.isNull,
          raise_error(lit("abTest: decimal(38) overflow — arm sizes " +
            "exceed the exact range; subsample or widen the test")))
          .otherwise((col("__z2_den") > 0 && lhs >= rhs).cast("int")))
      // The exactness contract lives in `significant` (the DECIMAL
      // comparison above); the emitted statistic columns are DOUBLE so
      // the result representation is engine-stable (a DECIMAL output
      // column is the one type whose canonical text differs between
      // engines' hashers — learned the hard way in round 12).
      .withColumn("z2_num", col("__z2_num").cast("double"))
      .withColumn("z2_den", col("__z2_den").cast("double"))
      .select("n_a", "c_a", "n_b", "c_b", "rate_a", "rate_b",
        "z2_num", "z2_den", "significant")
  }

  /** Event-type TRANSITION MATRIX (first-order Markov chain of user
    * behavior): per user in (ts, event id) order, count each adjacent
    * (from → to) event-type pair; row-normalized probability is the
    * IEEE quotient of the exact counts. Tie-broken by event id, so the
    * sequence — and every count — is engine-reproducible.
    *
    * Scale shape: one user-keyed window (lead) + a map-combined pair
    * count + a from-type marginal join — the exchange carries
    * (user, type, ts) then (from, to) pairs. Hot users cost a window
    * partition sort, not a cross product.
    *
    * Returns (from_type, to_type, n, n_from, p). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val marg = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(marg, Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
  }

  def anomalousHours(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val hc = events
      .select(col(userCol),
        expr(s"unix_micros($tsCol) div 3600000000").as("hr"))
      .groupBy(col(userCol), col("hr"))
      .agg(count(lit(1)).as("c"))
    val stats = hc.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("__q"))
    val dev = col("n_hours") * col("c") - col("total")
    hc.join(stats, Seq(userCol))
      .filter(dev > 0 && dev * dev >
        lit(9L) * (col("n_hours") * col("__q") - col("total") * col("total")))
      .select(col(userCol), col("hr"), col("c"), col("n_hours"),
        col("total"))
  }
}
