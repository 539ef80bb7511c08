package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** Bounded open-index-handle memo (r17 ADVICE fix): eviction, access
  * ordering, and compute-once behavior. Pure JVM — no Spark session. */
class HandleMemoSpec extends AnyFunSuite {

  private def k(i: Int): (String, Long, String) = (s"/d$i", i.toLong, s"n$i")

  test("capacity bounds the map; eldest-by-access evicted") {
    val m = new HandleMemo[java.lang.Integer](capacity = 4)
    (1 to 4).foreach(i => m.getOrCompute(k(i))(Int.box(i)))
    assert(m.size == 4)
    // touch k(1) so it becomes most-recently-used
    var computed = false
    m.getOrCompute(k(1)) { computed = true; Int.box(-1) }
    assert(!computed, "hot entry must not recompute")
    // insert a 5th: k(2) (now eldest by access) evicts, k(1) survives
    m.getOrCompute(k(5))(Int.box(5))
    assert(m.size == 4)
    m.getOrCompute(k(1)) { computed = true; Int.box(-1) }
    assert(!computed, "recently-touched entry survived the eviction")
    m.getOrCompute(k(2)) { computed = true; Int.box(2) }
    assert(computed, "eldest entry was evicted and recomputes")
  }

  test("append-heavy pattern stays bounded (the r16 leak shape)") {
    val m = new HandleMemo[Array[Array[Double]]](capacity = 8)
    // simulate 1000 commits, each a new (id, nonce) at the same dir
    (1 to 1000).foreach { i =>
      m.getOrCompute(("/idx", i.toLong, s"nonce$i"))(
        Array.fill(4)(Array.fill(8)(i.toDouble)))
    }
    assert(m.size == 8)
  }

  test("same key computes once across repeated lookups") {
    val m = new HandleMemo[java.lang.Integer](capacity = 4)
    var n = 0
    (1 to 10).foreach(_ => m.getOrCompute(k(7)) { n += 1; Int.box(7) })
    assert(n == 1)
  }
}
