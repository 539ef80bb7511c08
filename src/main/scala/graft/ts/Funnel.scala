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
