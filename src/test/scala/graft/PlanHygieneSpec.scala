package graft

/** Catalog-wide plan hygiene: no query in the driver catalog may plan an
  * accidental cartesian product or a non-scalar nested-loop join — at
  * 100 TB either is a query that never finishes. Queries that join a
  * ONE-ROW scalar aggregate (winsorization bounds, thresholds, maxima)
  * legitimately plan as BroadcastNestedLoopJoin over that single row and
  * are allow-listed by name; everything else must be hash/merge joins.
  */
class PlanHygieneSpec extends SparkSpecBase {

  /** Queries whose plan intentionally crosses with a one-row scalar
    * aggregate (the broadcast side is a single row by construction), plus
    * the brute-force vector NN baseline, whose broadcast side is the
    * bounded probe set by design (the LSH/IVF variants q55 et al. are the
    * scale path and must NOT nested-loop). */
  private val scalarCrossJoins = Set(
    "q26_scalar_max", "q28_winsorize", "q29_multi_winsorize",
    "q23_corr_subquery", "q27_not_exists_avg",
    "tpch11", "tpch15", "tpch22",
    "q50_vector_nn", "q78_kmeans",
    // rank-bound gates: each crosses the fact table with its own one-row
    // sketch aggregate (approx/t-digest quantiles, Welford state)
    "q54_approx_quantile", "q95_welford_udaf", "q96_tdigest")

  /** Built once and shared by both tests — several catalog queries do
    * eager work (sink writes, collects) at construction time, so planning
    * the whole catalog twice would double that cost. */
  private lazy val plans: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf()).queryExecution.executedPlan.toString
    }

  test("no query plans a cartesian product") {
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins appear only under one-row scalar broadcasts") {
    val offenders = plans.collect {
      case (name, plan) if !scalarCrossJoins(name) &&
        plan.contains("BroadcastNestedLoopJoin") => name
    }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }
}
