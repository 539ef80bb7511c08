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
    var total = 0.0
    var t = 0
    while (t < n) { total += sw(t); t += 1 }

    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
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
        outM += curMean; outW += curW; done += curW
        curMean = m; curW = w
      }
      k += 1
    }
    outM += curMean; outW += curW
    TDigestState(outM.result(), outW.result(), Array.empty)
  }
}
