package graft.agg

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact φ-heavy-hitters via the two-pass sketch-then-verify pattern:
  * a bounded-memory Misra–Gries summary per partition proposes a small
  * candidate superset, then one exact aggregation restricted to the
  * candidates recovers the precise answer — the standard way to find
  * "every token with frequency ≥ N/φ⁻¹" over a corpus whose distinct-key
  * cardinality is far too large to group exactly (the reference reaches
  * for the same scan → groupby surface, pyquokka/datastream.py, which at
  * 100 TB would shuffle every distinct key; this shuffles only candidates).
  *
  * Exactness argument: per-partition Misra–Gries with `capacity` counters
  * undercounts any item by at most n_p/(capacity+1) within partition p, so
  * an item surviving NO partition has total count ≤ Σ n_p/(capacity+1) =
  * N/(capacity+1). The guarantee therefore needs the STRICT inequality
  * threshold > N/(capacity+1) — checked at runtime once N is known
  * (capacity ≥ φ⁻¹ alone is not strict at the boundary; see the inline
  * counterexample). Under that check the sketch cannot drop a true heavy
  * hitter, the verify pass counts candidates exactly, and the output is
  * byte-identical to the full groupBy — deterministic under any
  * partitioning.
  */
object HeavyHitters {

  /** One Misra–Gries pass over a partition: at most `capacity` live
    * counters; a new item arriving at a full summary decrements every
    * counter (dropping zeros) instead of being inserted. Returns the
    * surviving keys. Amortized O(1) per item: each decrement-all pass
    * removes `capacity` units of counter mass and mass grows by ≤ 1 per
    * item, so there are ≤ n/capacity passes of O(capacity) work. */
  private[graft] def misraGries(it: Iterator[String], capacity: Int): Iterator[String] = {
    val counts = new scala.collection.mutable.HashMap[String, Long](capacity * 2, 0.75)
    while (it.hasNext) {
      val x = it.next()
      counts.get(x) match {
        case Some(c) => counts.update(x, c + 1L)
        case None =>
          if (counts.size < capacity) counts.update(x, 1L)
          else {
            val entries = counts.toArray
            var i = 0
            while (i < entries.length) {
              val (k, c) = entries(i)
              if (c == 1L) counts.remove(k) else counts.update(k, c - 1L)
              i += 1
            }
          }
      }
    }
    counts.keysIterator
  }

  /** All items of `itemCol` whose exact frequency is ≥ max(1, ⌊N/phiInverse⌋)
    * where N is the total (non-null) item count — returned as (item, n)
    * with the exact count, bit-identical to the full groupBy answer.
    *
    * Scale shape: pass 1 scans once with `capacity` counters per partition
    * and emits ≤ capacity survivors + one partition-total row each (a
    * P×capacity-row relation, localCheckpointed so its two tiny consumers
    * don't rescan the corpus); pass 2 broadcast-semi-joins the candidate
    * set and exact-counts only matching items — the only full-width
    * aggregation key set is the candidates, never the distinct-item
    * universe. Two corpus scans total, the two-pass minimum.
    *
    * `capacity ≥ phiInverse` is required — it is what makes the candidate
    * set a provable superset (see object doc); more capacity only shrinks
    * false positives. */
  def exactHeavyHitters(items: DataFrame, itemCol: String, phiInverse: Long,
      capacity: Int): DataFrame = {
    require(phiInverse >= 2, s"phiInverse must be >= 2, got $phiInverse")
    require(capacity >= phiInverse,
      s"Misra-Gries needs capacity >= phiInverse for the superset " +
        s"guarantee, got capacity=$capacity < phiInverse=$phiInverse")
    val strs = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    // sketch pass: survivors as (item, null) + one (null, n_p) total row
    // per partition, so N comes out of the same single scan
    val sketch = strs.as(Encoders.STRING)
      .mapPartitions { it =>
        var np = 0L
        val counted = it.map { x => np += 1L; x }
        val survivors = misraGries(counted, capacity).map(x => (x, 0L)).toArray
        (survivors.iterator ++ Iterator((null: String, np)))
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("item", "np")
      .localCheckpoint(true)
    // coalesce: a zero-partition input emits no per-partition total rows
    val n = sketch.filter(col("item").isNull)
      .agg(coalesce(sum(col("np")), lit(0L))).head().getLong(0)
    val threshold = math.max(1L, n / phiInverse)
    // The superset guarantee is threshold > N/(capacity+1) — the static
    // capacity >= phiInverse check alone is NOT strict at the boundary
    // (e.g. phiInverse = capacity = 3, N = 8: threshold 2 == N/(cap+1),
    // and an item with count exactly 2 can be fully decremented away).
    // N is known here, so enforce the exact condition and fail loudly
    // instead of silently dropping a qualifying item.
    // division form of threshold·(capacity+1) > n — overflow-free for
    // any N and capacity (the product form wraps for huge capacities
    // and would spuriously reject a valid configuration)
    require(n / (capacity + 1L) < threshold,
      s"capacity $capacity cannot guarantee exactness for N=$n at " +
        s"phiInverse=$phiInverse (threshold $threshold <= N/(capacity+1)) " +
        "— raise capacity")
    val candidates = sketch.filter(col("item").isNotNull)
      .select(col("item")).distinct()
    strs.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col("item").as(itemCol), col("n"))
  }
}
