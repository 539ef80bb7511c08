package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Centroid set of a merging t-digest. `means`/`weights` are parallel
  * arrays kept sorted by mean; `buffer` holds unmerged raw values. */
case class TDigestState(
    means: Array[Double], weights: Array[Double], buffer: Array[Double])

/** Output row of [[TDigestQuantiles]]: one value per requested quantile. */
case class QuantileValues(values: Seq[Double])

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", arXiv:1902.04023) as a typed Spark
  * `Aggregator` — the reference engine's quantile sketch
  * (pyquokka/datastream.py:957-998 wraps a native t-digest per partition
  * and then *averages per-partition quantiles*, datastream.py:926-930;
  * here partial digests MERGE, which preserves the sketch's error bound
  * instead of compounding it — the semantic divergence is documented in
  * SURVEY §7.4).
  *
  * Scale shape: per-partition partial digests of O(compression)
  * centroids, tree-merged by Spark's partial aggregation — constant
  * memory per task regardless of row count, the property that makes
  * 10k-column winsorization feasible where exact sort-based percentile
  * is not.
  */
class TDigestQuantiles(quantiles: Seq[Double], compression: Int = 100)
    extends Aggregator[Double, TDigestState, QuantileValues] {

  private val bufCap = compression * 4

  def zero: TDigestState =
    TDigestState(Array.empty, Array.empty, Array.empty)

  def reduce(s: TDigestState, x: Double): TDigestState = {
    val buf = s.buffer :+ x
    if (buf.length >= bufCap) TDigest.compress(s.means, s.weights, buf,
      compression)
    else TDigestState(s.means, s.weights, buf)
  }

  def merge(a: TDigestState, b: TDigestState): TDigestState =
    TDigest.merge(a, b, compression)

  def finish(s: TDigestState): QuantileValues =
    QuantileValues(TDigest.quantiles(s, quantiles, compression))

  def bufferEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
  def outputEncoder: Encoder[QuantileValues] = Encoders.product[QuantileValues]
}

/** The t-digest kernel shared by [[TDigestQuantiles]] (the typed
  * Aggregator) and [[WideQuantiles]] (the 10k-column per-partition
  * path) — ONE implementation so the two surfaces cannot drift.
  * Extracted verbatim from the round-6 Aggregator (same operation
  * order; existing gate hashes unchanged). */
object TDigest {

  def merge(a: TDigestState, b: TDigestState,
      compression: Int): TDigestState = {
    // both centroid sets are compress outputs, hence sorted: pre-merge
    // the two runs (stable, a-before-b on ties — the order the old
    // concat+stable-sort produced) so compress takes its linear
    // sorted-input path instead of re-sorting
    val (means, weights) = mergeSortedRuns(
      a.means, a.weights, b.means, b.weights)
    val buf = a.buffer ++ b.buffer
    compress(means, weights, buf, compression)
  }

  /** Stable linear merge of two mean-sorted centroid runs (a wins
    * ties) — primitive arrays, no boxing. */
  private def mergeSortedRuns(
      am: Array[Double], aw: Array[Double],
      bm: Array[Double], bw: Array[Double]): (Array[Double], Array[Double]) = {
    val n = am.length + bm.length
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (i < am.length && j < bm.length) {
      if (am(i) <= bm(j)) { m(o) = am(i); w(o) = aw(i); i += 1 }
      else { m(o) = bm(j); w(o) = bw(j); j += 1 }
      o += 1
    }
    while (i < am.length) { m(o) = am(i); w(o) = aw(i); i += 1; o += 1 }
    while (j < bm.length) { m(o) = bm(j); w(o) = bw(j); j += 1; o += 1 }
    (m, w)
  }

  /** Final readout: fold any remaining buffer, then interpolate each
    * requested quantile between centroid-midpoint cumulative weights. */
  def quantiles(s: TDigestState, qs: Seq[Double],
      compression: Int): Seq[Double] = {
    val c = compress(s.means, s.weights, s.buffer, compression)
    if (c.means.isEmpty) return qs.map(_ => Double.NaN)
    val n = c.means.length
    val total = c.weights.sum
    // cumulative weight at each centroid's midpoint
    val cum = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      cum(i) = acc + c.weights(i) / 2.0
      acc += c.weights(i)
      i += 1
    }
    qs.map { q =>
      val target = q * total
      if (target <= cum(0)) c.means(0)
      else if (target >= cum(n - 1)) c.means(n - 1)
      else {
        val j = cum.indexWhere(_ >= target)
        val (c0, c1) = (cum(j - 1), cum(j))
        val frac = if (c1 == c0) 0.0 else (target - c0) / (c1 - c0)
        c.means(j - 1) + frac * (c.means(j) - c.means(j - 1))
      }
    }
  }

  /** Fold buffer into centroids and re-cluster to the size bound: sorted
    * sweep merging adjacent points while the growing cluster stays within
    * the k-scale bound (k1 spline: centroids near the median absorb more
    * than the tails — that asymmetry is what keeps tail quantiles
    * accurate). */
  def compress(
      means: Array[Double], weights: Array[Double],
      buffer: Array[Double], compression: Int): TDigestState = {
    val nm = means.length
    val n = nm + buffer.length
    if (n == 0) return TDigestState(Array.empty, Array.empty, Array.empty)
    // Hot path (r16, the winsorization headline's constant factor):
    // every call site feeds centroids that are a compress/merge output
    // and therefore already mean-sorted, so instead of boxing n
    // (mean, weight) tuples for a generic stable sort — one tuple per
    // ingested VALUE at 1M×10k — sort the unit-weight buffer with a
    // primitive Arrays.sort and stable-merge it with the sorted
    // centroid run (centroid wins ties, exactly the order the old
    // centroids-first stable sortBy produced; equal buffer values are
    // interchangeable at weight 1). A defensive O(n) sortedness check
    // keeps the public contract for direct unsorted constructions.
    // NaN-safe negated form (r17 ADVICE): `means(s-1) > means(s)` is
    // false for NaN, so a directly-constructed state containing NaN
    // means would pass as "sorted" and corrupt the fast merge; treat
    // any NaN as unsorted so it routes to the generic fallback.
    var runSorted = true
    var s = 1
    while (runSorted && s < nm) {
      if (!(means(s - 1) <= means(s))) runSorted = false
      s += 1
    }
    val (sm, sw) =
      if (runSorted) {
        val sb = java.util.Arrays.copyOf(buffer, buffer.length)
        java.util.Arrays.sort(sb)
        val m = new Array[Double](n)
        val w = new Array[Double](n)
        var i = 0; var j = 0; var o = 0
        while (i < nm && j < sb.length) {
          if (means(i) <= sb(j)) { m(o) = means(i); w(o) = weights(i); i += 1 }
          else { m(o) = sb(j); w(o) = 1.0; j += 1 }
          o += 1
        }
        while (i < nm) { m(o) = means(i); w(o) = weights(i); i += 1; o += 1 }
        while (j < sb.length) { m(o) = sb(j); w(o) = 1.0; j += 1; o += 1 }
        (m, w)
      } else {
        val pts = new Array[(Double, Double)](n)
        var i = 0
        while (i < nm) { pts(i) = (means(i), weights(i)); i += 1 }
        var j = 0
        while (j < buffer.length) { pts(i + j) = (buffer(j), 1.0); j += 1 }
        val sorted = pts.sortBy(_._1)
        (sorted.map(_._1), sorted.map(_._2))
      }
    val out = new Clusters(n)
    sweep(sm, sw, n, compression, out)
    TDigestState(java.util.Arrays.copyOf(out.m, out.len),
      java.util.Arrays.copyOf(out.w, out.len), Array.empty)
  }

  /** Flat binary encoding of a contiguous block of flushed digest
    * states — the wide-path combine's wire format. A 64-partial 10k-
    * column pass ships ~3 GB of centroids; as 640k case-class instances
    * through the RDD serializer that cost ~41 s (measured r17, the
    * dominant slice of the whole winsorize pass), while one
    * `DoubleBuffer` bulk put per column is a memcpy. Layout:
    * [ncols:int][len_i:int × ncols][means_i ++ weights_i : double]. */
  private[graft] def encodeBlock(states: Array[TDigestState], from: Int,
      until: Int): Array[Byte] = {
    var doubles = 0
    var i = from
    while (i < until) {
      require(states(i).buffer.isEmpty,
        "encodeBlock expects flushed states (empty raw buffer)")
      doubles += 2 * states(i).means.length
      i += 1
    }
    val n = until - from
    val bb = java.nio.ByteBuffer.allocate(4 + 4 * n + 8 * doubles)
    bb.putInt(n)
    i = from
    while (i < until) { bb.putInt(states(i).means.length); i += 1 }
    val db = bb.asDoubleBuffer() // view starts at current position
    i = from
    while (i < until) {
      db.put(states(i).means)
      db.put(states(i).weights)
      i += 1
    }
    bb.array()
  }

  private[graft] def decodeBlock(bytes: Array[Byte]): Array[TDigestState] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val lens = Array.fill(n)(bb.getInt)
    val db = bb.asDoubleBuffer()
    Array.tabulate(n) { i =>
      val m = new Array[Double](lens(i))
      val w = new Array[Double](lens(i))
      db.get(m); db.get(w)
      TDigestState(m, w, Array.empty)
    }
  }

  /** The k-scale cluster sweep shared by [[compress]] (allocating, one
    * holder per call) and [[WideDigestIngest]] (in-place, one reused
    * holder per column — the winsorization hot path, where per-flush
    * allocation was measured r17 as the dominant cost: ~15 KB × 25M
    * flushes ≈ 375 GB of churn at the 1M×10k headline). Reads the
    * mean-sorted runs `sm`/`sw[0,n)`, resets `out`, emits clusters.
    * Arithmetic and operation order are exactly the former inline
    * sweep's, so emitted digests are value-identical. */
  private[agg] def sweep(sm: Array[Double], sw: Array[Double], n: Int,
      compression: Int, out: Clusters): Unit = {
    var total = 0.0
    var t = 0
    while (t < n) { total += sw(t); t += 1 }
    out.len = 0
    var curMean = sm(0)
    var curW = sw(0)
    var done = 0.0 // weight fully emitted so far
    var k = 1
    while (k < n) {
      val m = sm(k)
      val w = sw(k)
      val qMid = (done + (curW + w) / 2.0) / total
      val limit = 4.0 * total * qMid * (1.0 - qMid) / compression
      if (curW + w <= math.max(limit, 1.0)) {
        val nw = curW + w
        curMean += (m - curMean) * w / nw
        curW = nw
      } else {
        out.add(curMean, curW); done += curW
        curMean = m; curW = w
      }
      k += 1
    }
    out.add(curMean, curW)
  }
}

/** Growable primitive (mean, weight) cluster store — the sweep's output
  * buffer. Reused across flushes on the hot path; growth (rare — the
  * steady-state cluster count is O(compression)) doubles in place. */
private[agg] final class Clusters(initCap: Int) {
  var m: Array[Double] = new Array[Double](math.max(initCap, 8))
  var w: Array[Double] = new Array[Double](math.max(initCap, 8))
  var len: Int = 0
  def add(mean: Double, weight: Double): Unit = {
    if (len == m.length) {
      m = java.util.Arrays.copyOf(m, m.length * 2)
      w = java.util.Arrays.copyOf(w, w.length * 2)
    }
    m(len) = mean; w(len) = weight; len += 1
  }
}

/** Per-task, allocation-free wide ingestion: `width` parallel t-digests,
  * each a bounded raw buffer plus an in-place centroid store. This is
  * the winsorization headline's hot kernel (blog/approxquant.md — 1M
  * rows × 10k floats = 10¹⁰ values): the previous shape flushed through
  * [[TDigest.compress]], which allocates a buffer copy, two merged-run
  * arrays and two builders PER FLUSH — harmless for the typed
  * Aggregator, but ~375 GB of transient allocation at headline scale,
  * measured r17 as ~3× the arithmetic cost. Here a flush sorts the
  * column's buffer IN PLACE, merges it with the column's centroids into
  * task-shared scratch, and runs the shared [[TDigest.sweep]] back into
  * the column's reused holder — zero steady-state allocation. Operation
  * order matches compress's sorted fast path exactly, so the states a
  * task emits are value-identical to the old path's.
  *
  * Not thread-safe; one instance per task (Spark tasks are
  * single-threaded over their iterator). */
private[graft] final class WideDigestIngest(width: Int, compression: Int) {
  private val bufCap = compression * 4
  private val bufs = Array.fill(width)(new Array[Double](bufCap))
  private val fill = new Array[Int](width)
  private val cols = Array.fill(width)(new Clusters(2 * compression))
  // task-shared merge scratch, grown to the widest (centroids + buffer)
  private var sm = new Array[Double](2 * compression + bufCap)
  private var sw = new Array[Double](2 * compression + bufCap)

  /** Ingest one non-null, non-NaN value for column `j`. */
  def add(j: Int, x: Double): Unit = {
    val b = bufs(j)
    b(fill(j)) = x
    fill(j) += 1
    if (fill(j) == bufCap) flush(j)
  }

  private def flush(j: Int): Unit = {
    val nb = fill(j)
    if (nb == 0) return
    val buf = bufs(j)
    java.util.Arrays.sort(buf, 0, nb)
    val c = cols(j)
    val nc = c.len
    val n = nc + nb
    if (n > sm.length) {
      sm = new Array[Double](n * 2)
      sw = new Array[Double](n * 2)
    }
    // stable merge, centroid wins ties — same order as compress's
    // sorted fast path
    val cm = c.m; val cw = c.w
    var i = 0; var k = 0; var o = 0
    while (i < nc && k < nb) {
      if (cm(i) <= buf(k)) { sm(o) = cm(i); sw(o) = cw(i); i += 1 }
      else { sm(o) = buf(k); sw(o) = 1.0; k += 1 }
      o += 1
    }
    while (i < nc) { sm(o) = cm(i); sw(o) = cw(i); i += 1; o += 1 }
    while (k < nb) { sm(o) = buf(k); sw(o) = 1.0; k += 1; o += 1 }
    TDigest.sweep(sm, sw, n, compression, c)
    fill(j) = 0
  }

  /** Flush every column and emit the per-column states (one array copy
    * per column — once per task, not per flush). */
  def states(): Array[TDigestState] = {
    var j = 0
    while (j < width) { flush(j); j += 1 }
    Array.tabulate(width) { jj =>
      val c = cols(jj)
      TDigestState(java.util.Arrays.copyOf(c.m, c.len),
        java.util.Arrays.copyOf(c.w, c.len), Array.empty)
    }
  }
}
