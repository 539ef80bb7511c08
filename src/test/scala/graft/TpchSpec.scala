package graft

import graft.queries.TpchQueries

/** TPC-H suite sanity (reference apps/tpc-h/tpch.py:76-560): every query
  * runs at sf0.001, the result-shaping queries return rows, and the
  * plans carry the scale properties the file's Scaladoc promises —
  * pushed-down scan filters, broadcast dimension joins, and top-k
  * planning as TakeOrderedAndProject (never a global sort). The
  * value-level gate is the DuckDB oracle (Verify + tools/check.py);
  * these assertions are the plan-quality complement.
  */
class TpchSpec extends SparkSpecBase {

  private def q(name: String) = TpchQueries.queries(name)(spark, sf())

  test("all 22 queries execute and the dense ones return rows") {
    val counts = TpchQueries.queries.keys.toSeq.sorted.map { name =>
      name -> q(name).count()
    }.toMap
    assert(counts.size == 22)
    // Aggregate-report queries are non-empty at every SF; the highly
    // selective ones (tpch20-22) may legitimately thin out at sf0.001.
    Seq("tpch01", "tpch03", "tpch04", "tpch05", "tpch06", "tpch07",
      "tpch08", "tpch09", "tpch10", "tpch12", "tpch13", "tpch14",
      "tpch15", "tpch16", "tpch17", "tpch18", "tpch19").foreach { name =>
      assert(counts(name) > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle") {
    assert(TpchQueries.queries.keySet == TpchQueries.oracles.keySet)
  }

  test("tpch06 pushes the date/discount/quantity filters to the scan") {
    val plan = q("tpch06").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected pushed shipdate filter:\n$plan")
  }

  test("tpch03 top-10 plans as TakeOrderedAndProject, not a global sort") {
    val plan = q("tpch03").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("tpch05 broadcasts the nation/region dimension side") {
    val plan = q("tpch05").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"plan:\n$plan")
  }

  test("tpch01 aggregates inside whole-stage codegen") {
    // AQE hides codegen stages until the final plan materializes;
    // collect() executes THIS plan (count() would build a new one).
    val df = q("tpch01")
    df.collect()
    // In the finalized adaptive plan's toString, "*(n) " prefixes mark
    // WholeStageCodegen stages.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"plan:\n$plan")
  }

  test("tpch21 lateness semantics: every reported supplier was the sole late one") {
    // Brute-force re-derivation of the adapted Q21 on the small SF:
    // late lines on finished orders, >60 days after order date, supplier
    // in NATION_19, order touched by another supplier, and no OTHER
    // supplier late on the same order.
    import org.apache.spark.sql.functions.col
    import java.time.{LocalDateTime, ZoneOffset}
    def epoch(x: Any): Double =
      x.asInstanceOf[LocalDateTime].toEpochSecond(ZoneOffset.UTC).toDouble
    val li = queries.Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), epoch(r.get(2))))
    val ord = queries.Tables.orders(spark, sf())
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), epoch(r.get(1)))).toMap
    // Per-LINE lateness: a supplier with two late lines on one order is
    // counted twice (the query groups the late lineitem rows).
    val lateLines = li.collect { case (ok, sk, ship)
      if ord.get(ok).exists(od => ship > od + 60.0 * 86400.0) => (ok, sk) }
    val late = lateLines.toSet
    val bySupplier = lateLines
      .filter { case (ok, sk) =>
        li.exists(l => l._1 == ok && l._2 != sk) &&
        !late.exists(p => p._1 == ok && p._2 != sk)
      }
      .groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val suppNation = queries.Tables.supplier(spark, sf())
      .join(queries.Tables.nation(spark, sf()),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .filter(org.apache.spark.sql.functions.col("n_name") === "NATION_19")
      .select("s_suppkey", "s_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = bySupplier.collect {
      case (sk, n) if suppNation.contains(sk) => suppNation(sk) -> n
    }.toMap
    val got = q("tpch21").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
