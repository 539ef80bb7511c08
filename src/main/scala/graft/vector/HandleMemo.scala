package graft.vector

/** Bounded open-index-handle memo shared by [[IvfIndex]] and [[PqIndex]]
  * (r17). The r16 memos were JVM-lifetime ConcurrentHashMaps keyed
  * (dir, snapshot id, commit nonce); every appendTo/prune writes a NEW
  * snapshot id, so an append-heavy long-lived service that probes after
  * each commit accumulated one full centroid (and, for PQ, codebook)
  * set per version with no eviction — a slow memory leak. This is the
  * fix: an access-ordered LRU capped at `capacity` handles. Versions
  * are immutable, so eviction is always safe — a re-probe of an evicted
  * version just re-pays the bounded collect the memo was built to skip.
  *
  * An LRU (rather than latest-per-dir) keeps time-travel probes cheap:
  * a caller alternating between a pinned old snapshot and the current
  * one holds both handles instead of thrashing.
  */
private[vector] final class HandleMemo[V <: AnyRef](capacity: Int = 64) {
  private val map =
    new java.util.LinkedHashMap[(String, Long, String), V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, String), V]): Boolean =
        size() > capacity
    }

  /** Return the cached handle for `key`, computing (outside the lock —
    * the compute is a Spark collect) and inserting on miss. A racing
    * duplicate compute is benign: versions are immutable, both racers
    * produce the same value and one wins the insert. */
  def getOrCompute(key: (String, Long, String))(f: => V): V = {
    val hit = map.synchronized(map.get(key))
    if (hit != null) return hit
    val v = f
    map.synchronized {
      val again = map.get(key)
      if (again != null) again
      else { map.put(key, v); v }
    }
  }

  /** Current number of cached handles (test hook). */
  def size: Int = map.synchronized(map.size())
}
