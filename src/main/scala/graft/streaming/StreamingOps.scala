package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the windowed/stateful operators
  * (SURVEY §2.9 parity-plus — the reference only runs *bounded* streams,
  * with sortedness as its watermark, pyquokka/ts_executors.py; here the
  * same operator surface runs on true unbounded sources with event-time
  * watermarks).
  *
  * These functions transform a streaming DataFrame (from `readStream`)
  * into a streaming result; callers pick sink/trigger via `writeStream`.
  * At scale: state is keyed by (key, window) in the state store, watermark
  * bounds state size, and the aggregations are the same partial/final
  * hash-aggs as batch.
  */
object StreamingOps {

  /** Hopping (size, hop) or tumbling (size == hop) event-time window agg
    * with watermark — the OnCompletionTrigger analog: a window emits once
    * the watermark passes its end (append mode). */
  def windowedAgg(
      df: DataFrame,
      timeCol: String,
      key: String,
      size: String,
      hop: String,
      watermarkDelay: String,
      aggs: Map[String, Column]): DataFrame =
    df.withWatermark(timeCol, watermarkDelay)
      .groupBy(col(key), window(col(timeCol), size, hop))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.as(n) }.toSeq: _*)
      .select(Seq(col(key), col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++
        aggs.keys.toSeq.map(col): _*)

  /** Session windows with gap timeout (reference SessionWindow,
    * windowtypes.py:78) via the built-in `session_window`. */
  def sessionAgg(
      df: DataFrame,
      timeCol: String,
      key: String,
      gap: String,
      watermarkDelay: String,
      aggs: Map[String, Column]): DataFrame =
    df.withWatermark(timeCol, watermarkDelay)
      .groupBy(col(key), session_window(col(timeCol), gap))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.as(n) }.toSeq: _*)
      .select(Seq(col(key), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end")) ++
        aggs.keys.toSeq.map(col): _*)

  /** Streaming exact dedup on key columns — the reference's incremental
    * DistinctExecutor (sql_executors.py:517-554) with bounded state:
    * watermark expires seen-keys. */
  def streamingDistinct(
      df: DataFrame, timeCol: String, watermarkDelay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(timeCol, watermarkDelay)
      .dropDuplicates(keys :+ timeCol)

  /** Per-key state for [[streamingAsof]]: buffered quotes/trades not yet
    * past the watermark. */
  case class AsofState(
      quotes: List[(Long, Double)],  // (epochMicros, value)
      trades: List[(Long, Double)])

  /** Epoch MICROS of a Timestamp — `getTime` alone is ms-truncated
    * (the nanos field carries the full fractional second), and fixture
    * event times are µs-precision: buffering ms would silently reorder
    * same-ms events and emit truncated times the oracle compare would
    * only pass under float tolerance. Ripeness/trim compare in MICROS
    * against `wm * 1000` (round-8 fix): Spark's late filter drops
    * exactly `eventTimeMicros <= wmMs * 1000`, so a future event always
    * has `t > wm * 1000` — an ms-truncated ripeness test (`t/1000 <= wm`)
    * wrongly ripens a trade with a sub-ms offset inside the watermark's
    * ms, while a same-ms quote with a larger sub-ms offset can still
    * legally arrive. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000
  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(java.lang.Math.floorDiv(us, 1000L))
    t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** True streaming backward as-of join — beyond the reference, which
    * only processes *bounded* sorted streams (its sortedness contract is
    * the watermark, SURVEY §2.9): here both sides are unbounded and
    * unordered within the watermark delay.
    *
    * Union-tag the two sides, group by symbol, and run a
    * flatMapGroupsWithState machine per key: buffer both sides, and once
    * the event-time watermark passes a trade, emit it joined to the
    * latest quote at-or-before it. State is trimmed to quotes newer than
    * the single latest one at-or-before the watermark — exactly the
    * reference's streaming trim (SortedAsofExecutor,
    * ts_executors.py:359-376) driven by a real watermark instead of
    * sortedness.
    *
    * Typed shape (key, ts, value) — the generic-schema batch operator is
    * `graft.ts.AsofJoin`. Output: (key, ts, value, quote_ts, quote_value),
    * quote fields null when no quote precedes the trade. */
  def streamingAsof(
      trades: DataFrame,   // columns: key, ts (timestamp), value
      quotes: DataFrame,   // columns: key, ts (timestamp), value
      watermarkDelay: String): DataFrame = {
    val spark = trades.sparkSession
    import spark.implicits._
    val tagged = trades.select(col("key").cast("string"), col("ts"),
        col("value").cast("double"), lit(1).as("side"))
      .unionByName(quotes.select(col("key").cast("string"), col("ts"),
        col("value").cast("double"), lit(0).as("side")))
      .withWatermark("ts", watermarkDelay)
      // keep the watermarked ts column itself through to the stateful op
      // (projecting it away would detach the watermark)
      .as[(String, java.sql.Timestamp, Double, Int)]

    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState,
        (String, java.sql.Timestamp, Double, Option[java.sql.Timestamp], Option[Double])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (key, rows, state) =>
        // invoked with new rows OR on event-time timeout (watermark passed
        // a pending trade — without the timeout a quiet key would never
        // flush its ripe trades)
        val s0 = state.getOption.getOrElse(AsofState(Nil, Nil))
        var quotes = s0.quotes
        var trades = s0.trades
        rows.foreach { case (_, t, v, side) =>
          val us = micros(t)
          if (side == 0) quotes = (us, v) :: quotes else trades = (us, v) :: trades
        }
        val wm = state.getCurrentWatermarkMs()
        val wmUs = wm * 1000
        val qSorted = quotes.sortBy(_._1)
        // ripe in MICROS: a trade is complete iff tus <= wm*1000 — any
        // not-yet-arrived quote is strictly later than wm*1000 (Spark
        // late-drops eventTimeMicros <= wm*1000), so no future quote can
        // precede a ripe trade. An ms-truncated test would wrongly ripen
        // a sub-ms-offset trade whose matching same-ms quote is still
        // legally in flight.
        val (ripe, pending) = trades.sortBy(_._1).partition(_._1 <= wmUs)
        val out = ripe.map { case (tus, tv) =>
          val m = qSorted.takeWhile(_._1 <= tus).lastOption
          (key, toTs(tus), tv, m.map(q => toTs(q._1)), m.map(_._2))
        }
        // trim (same µs predicate): the latest quote at-or-before the
        // watermark still serves future trades (every pending trade is
        // strictly after wm*1000, as is every future quote); older ones
        // never match again.
        val (past, future) = qSorted.partition(_._1 <= wmUs)
        state.update(AsofState(past.takeRight(1) ++ future, pending))
        // wake at tus/1000 + 1: the first ms whose watermark ripens a
        // sub-ms-pending trade (wake at tus/1000 would fire with
        // wm*1000 < tus and re-pend forever)
        pending.headOption.foreach { case (tus, _) =>
          state.setTimeoutTimestamp(math.max(tus / 1000 + 1, wm + 1))
        }
        out.iterator
      }
      .toDF("key", "ts", "value", "quote_ts", "quote_value")
  }

  /** True streaming FORWARD as-of: each left row (alpha signal) fills at
    * the earliest right row (tick) with tick.ts >= alpha.ts — the
    * streaming form of the reference backtester's unfilled-alpha carry
    * (apps/rottnest/backtester.py:62-64 prepends unexecuted alphas for
    * the next batch; here they are keyed state).
    *
    * Emission is watermark-correct: a fill (alpha t, candidate tick c) is
    * emitted only once the watermark passes c.ts (µs-exact: ripe iff
    * c.us <= wm*1000, since any future tick is strictly later) — before
    * that, a not-yet-arrived tick inside (t, c.ts) could still be the
    * true first match. State trim: only the candidate ticks still
    * reachable by pending/future alphas are kept (same µs predicate);
    * unfilled alphas persist indefinitely by default (reference
    * behavior: the backtester carries unexecuted alphas forward).
    *
    * `alphaTtlMs` (round-7 verdict item 5, default off = -1): at 100 TB a
    * dead symbol otherwise accumulates unfilled-alpha state with no
    * escape hatch. When set, an unfilled alpha older than
    * `watermark - alphaTtlMs` is evicted (it can then never emit — the
    * deployable trade-off a caller opts into knowingly). Output:
    * (key, ts, value, fill_ts, fill_value), append mode. */
  def streamingAsofForward(
      alphas: DataFrame,   // columns: key, ts (timestamp), value
      ticks: DataFrame,    // columns: key, ts (timestamp), value
      watermarkDelay: String,
      alphaTtlMs: Long = -1L): DataFrame = {
    val spark = alphas.sparkSession
    import spark.implicits._
    val tagged = alphas.select(col("key").cast("string"), col("ts"),
        col("value").cast("double"), lit(1).as("side"))
      .unionByName(ticks.select(col("key").cast("string"), col("ts"),
        col("value").cast("double"), lit(0).as("side")))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, Double, Int)]

    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState,
        (String, java.sql.Timestamp, Double, java.sql.Timestamp, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (key, rows, state) =>
        val s0 = state.getOption.getOrElse(AsofState(Nil, Nil))
        var tickBuf = s0.quotes
        var alphaBuf = s0.trades
        rows.foreach { case (_, t, v, side) =>
          val us = micros(t)
          if (side == 0) tickBuf = (us, v) :: tickBuf
          else alphaBuf = (us, v) :: alphaBuf
        }
        val wm = state.getCurrentWatermarkMs()
        val wmUs = wm * 1000
        val tSorted = tickBuf.sortBy(_._1)
        // candidate = earliest tick at-or-after the alpha (µs-exact);
        // ripe in MICROS once the watermark has passed the candidate —
        // any not-yet-arrived tick is strictly later than wm*1000
        // (Spark late-drops eventTimeMicros <= wm*1000), so no future
        // tick can beat a ripe candidate
        val withCand = alphaBuf.sortBy(_._1).map { case (aus, av) =>
          ((aus, av), tSorted.find(_._1 >= aus))
        }
        val (ripe, pending) = withCand.partition {
          case (_, Some((cus, _))) => cus <= wmUs
          case _ => false
        }
        val out = ripe.map { case ((aus, av), Some((cus, cv))) =>
          (key, toTs(aus), av, toTs(cus), cv)
        }
        // optional TTL: evict unfilled alphas the watermark has left
        // more than alphaTtlMs behind (off by default — reference carry)
        val kept = if (alphaTtlMs < 0) pending
          else pending.filter { case ((aus, _), _) =>
            aus > wmUs - alphaTtlMs * 1000
          }
        state.update(AsofState(
          tSorted.filter(_._1 > wmUs), kept.map(_._1)))
        // wake at cus/1000 + 1: the first ms whose watermark ripens the
        // earliest sub-ms-pending candidate
        kept.flatMap(_._2.map(_._1)).minOption.foreach { cus =>
          state.setTimeoutTimestamp(math.max(cus / 1000 + 1, wm + 1))
        }
        out.iterator
      }
      .toDF("key", "ts", "value", "fill_ts", "fill_value")
  }

  /** Custom keyed state machine — the reference's `stateful_transform`
    * extension point in streaming form: running count + sum per key via
    * flatMapGroupsWithState. */
  def runningTotals(
      df: DataFrame, key: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(key).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (k: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator((k, n, s))
      }
      .toDF(key, "n", "total")
  }
}
