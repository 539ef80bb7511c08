package graft.ts

import graft.api.OrderedStream
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Declarative time-window specs over ordered streams — the reference's
  * windowtypes.py:6-97 surface. Sizes are in the time column's native
  * units (seconds for timestamp columns, raw units for numeric columns).
  */
sealed trait WindowSpec
/** Fixed windows [k*size, (k+1)*size) (windowtypes.py:67). */
final case class TumblingWindow(size: Double) extends WindowSpec
/** Overlapping windows, start every `hop`, length `size` (windowtypes.py:59). */
final case class HoppingWindow(hop: Double, size: Double) extends WindowSpec
/** Per-event trailing window (t - sizeBefore, t] (windowtypes.py:71). */
final case class SlidingWindow(sizeBefore: Double) extends WindowSpec
/** Gap-based sessions: new session when t - prev_t > timeout
  * (windowtypes.py:78; executor semantics ts_executors.py:225-230). */
final case class SessionWindow(timeout: Double) extends WindowSpec

sealed trait WindowTrigger
/** Emit one row per completed window (windowtypes.py:84-97; executor
  * carry-over semantics ts_executors.py:39-58 — automatic here, batch
  * boundaries don't exist in a Spark plan). */
case object OnCompletionTrigger extends WindowTrigger
/** Emit a running aggregate per event (ts_executors.py:64-98). */
case object OnEventTrigger extends WindowTrigger

/** Batch implementations of windowed aggregation per SURVEY §2.9. Keyed by
  * `by`; `aggs` maps output name → aggregate Column over the window rows.
  * All formulations are single-shuffle (hash on `by` / groupBy keys) and
  * stay inside whole-stage codegen.
  */
object Windows {

  def apply(
      os: OrderedStream,
      spec: WindowSpec,
      by: String,
      aggs: Map[String, Column],
      trigger: WindowTrigger = OnCompletionTrigger): OrderedStream = {
    val t = col(os.timeCol).cast(DoubleType)
    val df = os.df
    val out = (spec, trigger) match {

      case (TumblingWindow(size), OnCompletionTrigger) =>
        groupedWindow(df, by, floor(t / size) * size, size, aggs)

      case (HoppingWindow(hop, size), OnCompletionTrigger) =>
        // Row at time t belongs to every window start in
        // (t - size, t] aligned to hop: explode the (bounded) list.
        val nHops = math.ceil(size / hop).toLong
        val starts = sequence(lit(0L), lit(nHops - 1)).cast("array<double>")
        val exploded = df
          .withColumn("__j", explode(starts))
          .withColumn("__wstart", (floor(t / hop) - col("__j")) * hop)
          .filter(col("__wstart") > t - size && col("__wstart") <= t)
        groupedWindow(exploded, by, col("__wstart"), size, aggs)

      case (SlidingWindow(before), OnCompletionTrigger | OnEventTrigger) =>
        // Trailing window per event — inherently per-event emission
        // (ts_executors.py:147-194, groupby_rolling semantics). Range
        // frames take Long offsets, so order on microseconds.
        val tUs = (t * 1e6).cast("long")
        val w = W.partitionBy(col(by)).orderBy(tUs)
          .rangeBetween(-math.round(before * 1e6), 0)
        df.withColumns(aggs.map { case (n, a) => n -> a.over(w) })

      case (SessionWindow(gap), trig) =>
        val wseq = W.partitionBy(col(by)).orderBy(t)
        val withSession = df
          .withColumn("__gap",
            when(t - lag(t, 1).over(wseq) > gap, 1).otherwise(0))
          .withColumn("__session", sum(col("__gap")).over(
            wseq.rowsBetween(W.unboundedPreceding, 0)))
        trig match {
          case OnCompletionTrigger =>
            withSession.groupBy(col(by), col("__session"))
              .agg(min(t).as("session_start"),
                aggs.map { case (n, a) => a.as(n) }.toSeq ++
                  Seq(max(t).as("session_end")): _*)
              .drop("__session")
          case OnEventTrigger =>
            // RANGE, not ROWS (round-10 tie-proofing): a ROWS frame
            // gives time-TIED events arbitrary partition-internal
            // running totals; RANGE includes peers, so tied events see
            // each other and the result is fixture-order-independent
            val wrun = W.partitionBy(col(by), col("__session")).orderBy(t)
              .rangeBetween(W.unboundedPreceding, W.currentRow)
            withSession
              .withColumns(aggs.map { case (n, a) => n -> a.over(wrun) })
              .drop("__gap", "__session")
        }

      case (TumblingWindow(size), OnEventTrigger) =>
        runningInWindow(df, by, t, floor(t / size) * size, aggs)

      case (HoppingWindow(hop, size), OnEventTrigger) =>
        // Per-event running agg in *each* live window: explode as above
        // then run within (key, window) ordered by time.
        val nHops = math.ceil(size / hop).toLong
        val starts = sequence(lit(0L), lit(nHops - 1)).cast("array<double>")
        val exploded = df
          .withColumn("__j", explode(starts))
          .withColumn("__wstart", (floor(t / hop) - col("__j")) * hop)
          .filter(col("__wstart") > t - size && col("__wstart") <= t)
        runningInWindow(exploded.drop("__j"), by, t, col("__wstart"), aggs)
    }
    new OrderedStream(out, if (out.columns.contains(os.timeCol)) os.timeCol
      else "window_start")
  }

  private def groupedWindow(
      df: DataFrame, by: String, wstart: Column, size: Double,
      aggs: Map[String, Column]): DataFrame =
    df.groupBy(col(by), wstart.as("window_start"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.as(n) }.toSeq: _*)
      .withColumn("window_end", col("window_start") + size)

  private def runningInWindow(
      df: DataFrame, by: String, t: Column, windowId: Column,
      aggs: Map[String, Column]): DataFrame = {
    val tagged = df.withColumn("__wid", windowId)
    // RANGE, not ROWS (round-10 tie-proofing): time-tied events include
    // each other as frame peers, so the per-event running totals are
    // deterministic on any fixture instead of shuffle-order-dependent
    val w = W.partitionBy(col(by), col("__wid")).orderBy(t)
      .rangeBetween(W.unboundedPreceding, W.currentRow)
    tagged.withColumns(aggs.map { case (n, a) => n -> a.over(w) })
      .withColumnRenamed("__wid", "window_start")
  }
}
