package graft.ts

import graft.api.OrderedStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Complex-event pattern recognition (MATCH_RECOGNIZE-lite) — the
  * reference's `pattern_recognize` (orderedstream.py:37-53, executors
  * cep_executors.py:13-178).
  *
  * A pattern is an ordered list of named events `(name, predicate)`;
  * later predicates may reference earlier events' columns with
  * `name.column` syntax (e.g. `"b.value > a.value"`). A match is a
  * strictly time-increasing tuple of rows, one per event, same `by` key,
  * with `last.time <= first.time + maxSpan`. All matches are emitted
  * (the reference's DFS enumerates all candidate tuples).
  *
  * Implementation: declarative iterative join instead of the reference's
  * string-substituted per-row DFS —
  *   1. each event's self-referencing conjuncts prefilter its stream
  *      (the reference's pushed OR-prefilter, cep_executors.py:34-84,
  *      done per-event which is strictly tighter);
  *   2. events are joined left-to-right on (same key, strictly later
  *      time, within maxSpan of the first event) — a range join Catalyst
  *      plans with the time bound as join condition;
  *   3. cross-event conjuncts are evaluated as join filters.
  * Everything stays in DataFrame land: pushdown, AQE and codegen apply.
  */
object Cep {

  /** Rewrite `name.column` references to the flattened `name_column`. */
  private[ts] def rewrite(pred: String): String =
    pred.replaceAll("""\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)""", "$1_$2")

  /** Names referenced by a predicate (the `x` of `x.col`). */
  private[ts] def referenced(pred: String): Set[String] =
    """\b([A-Za-z_]\w*)\.""".r.findAllMatchIn(pred).map(_.group(1)).toSet

  def patternRecognize(
      os: OrderedStream,
      events: Seq[(String, String)],
      maxSpan: Double,
      by: String): DataFrame = {
    require(events.nonEmpty)
    val t = os.timeCol
    val payload = os.df.columns.toSeq.filterNot(_ == by)

    // Per-event stream: payload columns prefixed name_, key kept as-is.
    def eventDf(name: String, pred: String): DataFrame = {
      val renamed = os.df.select(
        col(by) +: payload.map(c => col(c).as(s"${name}_$c")): _*)
      if (referenced(pred).subsetOf(Set(name)))
        renamed.filter(expr(rewrite(pred)))  // pure self-predicate: prefilter
      else renamed
    }

    val (n0, p0) = events.head
    var acc = eventDf(n0, p0)
    if (!referenced(p0).subsetOf(Set(n0)))
      acc = acc.filter(expr(rewrite(p0)))
    var prevName = n0

    for ((name, pred) <- events.tail) {
      val next = eventDf(name, pred)
      val cond =
        col(s"${name}_$t").cast(DoubleType) > col(s"${prevName}_$t").cast(DoubleType) &&
        col(s"${name}_$t").cast(DoubleType) <=
          col(s"${n0}_$t").cast(DoubleType) + maxSpan
      var joined = acc.join(next, Seq(by)).filter(cond)
      if (!referenced(pred).subsetOf(Set(name)))
        joined = joined.filter(expr(rewrite(pred)))
      acc = joined
      prevName = name
    }
    acc
  }
}
