package graft.queries

import graft.api.{DataStream, QContext}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.3-2.8): each entry is a
  * library-API query paired with DuckDB oracle SQL in `oracles`. */
object RelationalQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // §2.5 agg_sql / groupby-agg decomposition — TPC-H Q1 shape
    // (reference apps/tpc-h/tpch.py:106-120).
    "q1_agg" -> { (s, d) =>
      new DataStream(lineitem(s, d))
        .filterSql("l_shipdate <= timestamp '1998-09-02 00:00:00'")
        .groupby("l_returnflag", "l_linestatus")
        .aggSql(
          "sum(l_quantity) as sum_qty",
          "sum(l_extendedprice) as sum_base_price",
          "sum(l_extendedprice * (1 - l_discount)) as sum_disc_price",
          "sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge",
          "avg(l_quantity) as avg_qty",
          "avg(l_extendedprice) as avg_price",
          "avg(l_discount) as avg_disc",
          "count(*) as count_order")
        .sort(Seq("l_returnflag", "l_linestatus")).df
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
