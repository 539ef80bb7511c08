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
