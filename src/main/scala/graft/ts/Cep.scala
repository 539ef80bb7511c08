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

  /** NFA formulation (reference `nfa_cep`, cep_executors.py:196-272):
    * one time-ordered pass per key, maintaining partial-match states.
    * Linear in events × live-states where the join formulation is a
    * k-way join — the right shape when the pattern is long or
    * selective prefilters don't exist. Predicates are Scala functions
    * (current row, matched prefix by event name) → Boolean, the typed
    * analog of the reference's string-substituted predicates. Emits one
    * row per complete match: key + per-event times, same shape as
    * [[patternRecognize]]'s (by, name_t...) columns.
    *
    * Scale: groupByKey on `by` (one shuffle), per-key sorted scan with
    * state bounded by live partial matches within maxSpan.
    *
    * `maxLiveStatesPerKey` is the blow-up guard: all-matches semantics
    * keep every partial match alive within `maxSpan`, so a dense burst
    * (many rows matching every predicate inside one span) grows the live
    * set — and the output — combinatorially (reference hits the same
    * wall, its DFS enumerates the identical tuples,
    * cep_executors.py:86-178). Exceeding the cap throws with a clear
    * message instead of OOM-killing the executor: fail fast, then the
    * caller tightens predicates/maxSpan or raises the cap knowingly. */
  def nfaPatternRecognize(
      os: OrderedStream,
      events: Seq[(String, org.apache.spark.sql.Row => Boolean, (org.apache.spark.sql.Row, Map[String, org.apache.spark.sql.Row]) => Boolean)],
      maxSpan: Double,
      by: String,
      maxLiveStatesPerKey: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    require(events.nonEmpty)
    val df = os.df
    val tIdx = df.columns.indexOf(os.timeCol)
    val keyIdx = df.columns.indexOf(by)
    val names = events.map(_._1)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema(by).copy(nullable = false) +:
        names.map(n => org.apache.spark.sql.types.StructField(
          s"${n}_t", org.apache.spark.sql.types.DoubleType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    implicit val kEnc: Encoder[String] = Encoders.STRING
    df.groupByKey((r: Row) => String.valueOf(r.get(keyIdx)))
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(r =>
          r.get(tIdx).asInstanceOf[Number].doubleValue())
        // partial state: matched rows so far, by event name, in order
        var live = List.empty[Vector[(String, Row)]]
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        def t(r: Row) = r.get(tIdx).asInstanceOf[Number].doubleValue()
        for (r <- rows) {
          val now = t(r)
          live = live.filter(s => now <= t(s.head._2) + maxSpan)
          // extend every live state whose next event matches (all-matches
          // semantics, like the reference's DFS); then try starting fresh
          val extended = live.flatMap { s =>
            val (name, self, cross) = events(s.length)
            val ctx = s.toMap
            if (self(r) && cross(r, ctx) && now > t(s.last._2)) {
              val ns = s :+ (name -> r)
              if (ns.length == events.length) {
                out += Row.fromSeq(r.get(keyIdx) +: ns.map(p => t(p._2)))
                None
              } else Some(ns)
            } else None
          }
          val (n0, self0, _) = events.head
          val fresh =
            if (!self0(r)) Nil
            else if (events.length == 1) {
              out += Row.fromSeq(r.get(keyIdx) +: Seq(now)); Nil
            } else List(Vector(n0 -> r))
          live = live ++ extended ++ fresh
          if (live.length > maxLiveStatesPerKey)
            throw new IllegalStateException(
              s"CEP live-state blow-up: > $maxLiveStatesPerKey partial " +
              s"matches for one '$by' key inside maxSpan=$maxSpan (all-" +
              "matches semantics are combinatorial on dense bursts). " +
              "Tighten event predicates or maxSpan, or raise " +
              "maxLiveStatesPerKey explicitly.")
        }
        out.iterator
      }.toDF(by +: names.map(n => s"${n}_t"): _*)
  }

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
