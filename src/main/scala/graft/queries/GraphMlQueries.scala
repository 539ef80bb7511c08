package graft.queries

import graft.graph.GraphOps
import graft.vector.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph / ML workloads from the reference's app layer
  * (SURVEY §2.10 "k-means / search apps" + apps/unstable):
  * PageRank-by-SpMV (apps/unstable/pagerank.py), COO sparse matmul
  * (apps/unstable/matmul.py), seeded Lloyd's k-means
  * (apps/vectors/kmeans.py). The graph is the nation-level trade network
  * derived from the TPC-H-ish tables: an edge (c_nation → s_nation)
  * weighted by lineitem count — the edge build is the data-scale part
  * (O(lineitem) with broadcast dims), the iteration state is O(nodes).
  */
object GraphMlQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Customer-nation → supplier-nation trade edges, weight = lineitem
    * count. Dimension sides broadcast; the only shuffles are
    * lineitem⋈orders and the final (≤25×25)-group aggregate. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))

  /** DuckDB mirror of [[tradeEdges]]. */
  private val edgesSql: String =
    """edges AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
      |         count(*)::DOUBLE AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2)""".stripMargin

  /** One unrolled PageRank step over `prev` → named CTE `next` (inflow
    * mirrors GraphOps.pagerank's detScale=12 decimal-exact sum). */
  private def prStepSql(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT nn.n_nationkey AS id,
       |         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |           / (SELECT cnt FROM n)
       |           + 0.85 * coalesce(f.inflow, 0.0) AS pr
       |  FROM nation nn LEFT JOIN (
       |    SELECT t.dst, ${graft.functions.Det.dsumSql("t.p * r.pr", 12)} AS inflow
       |    FROM trans t JOIN $prev r ON t.src = r.id
       |    GROUP BY t.dst) f
       |  ON nn.n_nationkey = f.dst)""".stripMargin

  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"

  val queries: Map[String, Q] = Map(
    // PageRank over the nation trade graph: 3 iterations of SpMV with
    // damping 0.85 (reference apps/unstable/pagerank.py's SpMVExecutor
    // loop, declarative). All 25 nations emitted — no float-threshold
    // row-membership risk.
    "q77_pagerank" -> { (s, d) =>
      GraphOps.pagerank(tradeEdges(s, d), "src", "dst", "w",
          nation(s, d).select(col("n_nationkey")), "n_nationkey",
          iterations = 3, detScale = Some(12))
        .select(col("id").as("n_nationkey"), col("pr"))
        .orderBy(col("n_nationkey"))
    },

    // Sparse matmul: square the trade matrix — C(i,j) = two-hop trade
    // volume i→·→j (reference apps/unstable/matmul.py's MatMulExecutor
    // as a join-contraction). Integer-valued doubles → exact sums.
    // The contraction self-joins the edges on DIFFERENT keys (a.dst vs
    // b.src), so ReuseExchange can never dedup the two sides and the
    // O(lineitem) 4-table edge build would execute twice. The edge
    // relation itself is ≤ |nations|² rows — materialize it once
    // (eager localCheckpoint severs the duplicated subtree; at scale
    // this is the pagerank pattern: heavy build, tiny state), then
    // contract the materialized table.
    "q79_matmul" -> { (s, d) =>
      val a = tradeEdges(s, d).localCheckpoint(true)
      val b = a.select(col("src").as("b_src"), col("dst").as("b_dst"),
        col("w").as("b_w"))
      GraphOps.matmul(a, "src", "dst", "w", b, "b_src", "b_dst", "b_w")
        .orderBy(col("i"), col("j"))
    },

    // Seeded Lloyd's k-means on the embeddings table: k=4 seeds = vectors
    // 0..3, one update round, emit final integer assignments (reference
    // apps/vectors/kmeans.py). Ties break toward the lowest centroid id
    // on both engines.
    "q78_kmeans" -> { (s, d) =>
      val emb = embeddings(s, d)
      val init = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
      KMeans.lloyd(emb, "vec_id", "embedding", init, "cid", "cv", rounds = 1)
        .orderBy(col("vec_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q77_pagerank" ->
      s"""WITH $edgesSql,
         |trans AS (
         |  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p
         |  FROM edges),
         |n AS (SELECT count(*)::DOUBLE AS cnt FROM nation),
         |r0 AS (SELECT n_nationkey AS id, 1.0 / (SELECT cnt FROM n) AS pr
         |       FROM nation),
         |${prStepSql("r0", "r1")},
         |${prStepSql("r1", "r2")},
         |${prStepSql("r2", "r3")}
         |SELECT id AS n_nationkey, pr FROM r3 ORDER BY n_nationkey""".stripMargin,

    "q79_matmul" ->
      s"""WITH $edgesSql
         |SELECT a.src AS i, b.dst AS j, sum(a.w * b.w) AS val
         |FROM edges a JOIN edges b ON a.dst = b.src
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors KMeans.lloyd exactly: same ‖x‖²+‖c‖²−2x·c distance with
    // per-side norms, same (dist, cid) tie-break, same per-dim means.
    "q78_kmeans" ->
      s"""WITH pts AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |pn AS (SELECT vec_id, v, ${duckDot("v", "v")} AS nv FROM pts),
         |c0 AS (SELECT vec_id AS cid, v AS cv, nv AS nc FROM pn
         |       WHERE vec_id < 4),
         |a1 AS (
         |  SELECT vec_id, cid AS cluster FROM (
         |    SELECT p.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |        p.nv + c.nc - 2 * ${duckDot("p.v", "c.cv")}, c.cid) AS rn
         |    FROM pn p CROSS JOIN c0 c) WHERE rn = 1),
         |m1 AS (
         |  SELECT a.cluster, t.i, avg(p.v[t.i]) AS m
         |  FROM a1 a JOIN pts p ON a.vec_id = p.vec_id, range(1, 65) t(i)
         |  GROUP BY 1, 2),
         |c1 AS (
         |  SELECT cluster AS cid, list(m ORDER BY i) AS cv FROM m1
         |  GROUP BY 1),
         |c1n AS (SELECT cid, cv, ${duckDot("cv", "cv")} AS nc FROM c1)
         |SELECT vec_id, cluster FROM (
         |  SELECT p.vec_id, c.cid AS cluster,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      p.nv + c.nc - 2 * ${duckDot("p.v", "c.cv")}, c.cid) AS rn
         |  FROM pn p CROSS JOIN c1n c) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin
  )
}
