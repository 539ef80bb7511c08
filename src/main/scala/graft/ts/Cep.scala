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
    * Scale: ONE shuffle (repartition by `by`) + sortWithinPartitions
    * (key, time) + a streaming mapPartitions with key-change detection —
    * the statefulTransform shape. A key's rows are NEVER materialized:
    * input streams through, matches emit incrementally (per-row pending
    * queue, bounded by the live set), so a hot key with 10⁸ rows holds
    * only its live partial states in memory.
    *
    * `maxLiveStatesPerKey` is the blow-up guard on LIVE PARTIAL STATES:
    * all-matches semantics keep every partial match alive within
    * `maxSpan`, so a dense burst (many rows matching every predicate
    * inside one span) grows the live set combinatorially (reference hits
    * the same wall, its DFS enumerates the identical tuples,
    * cep_executors.py:86-178). Exceeding it throws with a clear message
    * instead of OOM-killing the executor: fail fast, then the caller
    * tightens predicates/maxSpan or raises the cap knowingly.
    *
    * Complete matches now STREAM OUT instead of buffering per key, so
    * output volume no longer threatens executor memory and is not
    * counted against the live cap (pre-round-8 behavior conflated the
    * two). `maxMatchesPerKey` (off by default, <= 0) is a separate
    * optional sanity bound for callers who want runaway output to fail
    * fast rather than fill the sink. */
  def nfaPatternRecognize(
      os: OrderedStream,
      events: Seq[(String, org.apache.spark.sql.Row => Boolean, (org.apache.spark.sql.Row, Map[String, org.apache.spark.sql.Row]) => Boolean)],
      maxSpan: Double,
      by: String,
      maxLiveStatesPerKey: Int = 1 << 20,
      maxMatchesPerKey: Long = -1L): DataFrame = {
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
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(parts, col(by))
      .sortWithinPartitions(col(by), col(os.timeCol))
      .mapPartitions { rows =>
        new Iterator[Row] {
          // per-row output queue: at most (live states completing on this
          // row + 1) matches — bounded by the live cap, never by key size
          private val pending = scala.collection.mutable.Queue.empty[Row]
          private var curKey: Any = null
          private var started = false
          // partial state: matched rows so far, by event name, in order;
          // liveN tracks live's length (List.length is O(n) per call)
          private var live = List.empty[Vector[(String, Row)]]
          private var liveN = 0
          private var matchesForKey = 0L
          private def t(r: Row) =
            r.get(tIdx).asInstanceOf[Number].doubleValue()
          private def emit(r: Row, times: Seq[Double]): Unit = {
            matchesForKey += 1
            if (maxMatchesPerKey > 0 && matchesForKey > maxMatchesPerKey)
              throw new IllegalStateException(
                s"CEP match blow-up: > $maxMatchesPerKey complete matches " +
                s"for one '$by' key inside maxSpan=$maxSpan (all-matches " +
                "semantics are combinatorial on dense bursts). Tighten " +
                "event predicates or maxSpan, or raise maxMatchesPerKey.")
            pending.enqueue(Row.fromSeq(r.get(keyIdx) +: times))
          }
          private def process(r: Row): Unit = {
            val k = r.get(keyIdx)
            if (!started || !java.util.Objects.equals(k, curKey)) {
              curKey = k; started = true
              live = Nil; liveN = 0; matchesForKey = 0L
            }
            val now = t(r)
            val keep = List.newBuilder[Vector[(String, Row)]]
            var keepN = 0
            live.foreach { s =>
              if (now <= t(s.head._2) + maxSpan) { keep += s; keepN += 1 }
            }
            live = keep.result(); liveN = keepN
            // extend every live state whose next event matches (all-
            // matches semantics, like the reference's DFS); then try
            // starting fresh
            var extN = 0
            val extended = live.flatMap { s =>
              val (name, self, cross) = events(s.length)
              val ctx = s.toMap
              if (self(r) && cross(r, ctx) && now > t(s.last._2)) {
                val ns = s :+ (name -> r)
                if (ns.length == events.length) {
                  emit(r, ns.map(p => t(p._2))); None
                } else { extN += 1; Some(ns) }
              } else None
            }
            val (n0, self0, _) = events.head
            val fresh =
              if (!self0(r)) Nil
              else if (events.length == 1) { emit(r, Seq(now)); Nil }
              else List(Vector(n0 -> r))
            live = extended ::: fresh ::: live
            liveN += extN + fresh.length
            if (liveN > maxLiveStatesPerKey)
              throw new IllegalStateException(
                s"CEP state blow-up: > $maxLiveStatesPerKey live partial " +
                s"matches for one '$by' key inside maxSpan=$maxSpan " +
                "(all-matches semantics are combinatorial on dense " +
                "bursts). Tighten event predicates or maxSpan, or raise " +
                "maxLiveStatesPerKey explicitly.")
          }
          def hasNext: Boolean = {
            while (pending.isEmpty && rows.hasNext) process(rows.next())
            pending.nonEmpty
          }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("empty iterator")
            pending.dequeue()
          }
        }
      }.toDF(by +: names.map(n => s"${n}_t"): _*)
  }

  /** Join-form pattern recognition. `maxCandidatesPerKey` is the dense-
    * burst guard the NFA form has natively: before joining, one cheap
    * aggregation job upper-bounds the candidate tuples any single
    * (key, maxSpan-bucket) can emit — first-event rows in the bucket ×
    * Π(later-event rows in the bucket and the next one; a match spans at
    * most two buckets since every event lies within maxSpan of the
    * first). Self-predicates prefilter the counts; cross-event conjuncts
    * can only shrink the true number, so the estimate stays an upper
    * bound. Exceeding the cap fails fast with a pointer to the NFA form
    * (whose live-state cap handles dense data incrementally) instead of
    * materializing O(n^k) join tuples. Pass `maxCandidatesPerKey <= 0`
    * to skip the pre-check (and its extra scan) when density is known. */
  def patternRecognize(
      os: OrderedStream,
      events: Seq[(String, String)],
      maxSpan: Double,
      by: String,
      maxCandidatesPerKey: Long = 1L << 24): DataFrame = {
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

    if (maxCandidatesPerKey > 0 && events.length > 1) {
      val k = events.length
      // (key, bucket, event) → row count; later events also credited to
      // the previous bucket (starts there can still use them).
      val tagged = events.zipWithIndex.map { case ((nm, pr), i) =>
        val base = eventDf(nm, pr).select(col(by).as("__k"),
          floor(col(s"${nm}_$t").cast(DoubleType) / lit(maxSpan))
            .cast("long").as("__w"),
          lit(i).as("__e"))
        if (i == 0) base
        else base.select(col("__k"),
          explode(array(col("__w"), col("__w") - 1)).as("__w"), col("__e"))
      }.reduce(_ unionByName _)
      // log2 of the per-(key, bucket) product bound — products of counts
      // overflow long fast, their logs never do.
      val bound = tagged.groupBy("__k", "__w", "__e")
        .agg(count(lit(1)).as("__n"))
        .groupBy("__k", "__w").agg(
          sum(when(col("__e") === 0, col("__n")).otherwise(lit(0))).as("__c0"),
          sum(when(col("__e") > 0, log2(col("__n")))).as("__ls"),
          countDistinct(when(col("__e") > 0, col("__e"))).as("__ne"))
        .filter(col("__c0") > 0 && col("__ne") === (k - 1))
        .agg(max(log2(col("__c0")) + col("__ls"))).head()
      val maxLog =
        if (bound.isNullAt(0)) Double.NegativeInfinity else bound.getDouble(0)
      if (maxLog > math.log(maxCandidatesPerKey.toDouble) / math.log(2))
        throw new IllegalStateException(
          f"CEP join-form candidate blow-up: a single ('$by', maxSpan-" +
          f"bucket) group could emit ~2^$maxLog%.1f > $maxCandidatesPerKey " +
          "candidate tuples through the k-way range join. Use " +
          "nfaPatternRecognize (incremental, live-state-capped), tighten " +
          "event predicates or maxSpan, or raise maxCandidatesPerKey " +
          "explicitly.")
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
