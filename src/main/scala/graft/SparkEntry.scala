package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; this object aggregates them. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
    graft.queries.AdvancedRelationalQueries.queries ++
    graft.queries.FunctionQueries.queries ++
    graft.queries.TimeSeriesQueries.queries ++
    graft.queries.VectorQueries.queries ++
    graft.queries.TextDedupQueries.queries ++
    graft.queries.CurationQueries.queries ++
    graft.queries.GraphMlQueries.queries ++
    graft.queries.RottnestQueries.queries ++
    graft.queries.ExtensionQueries.queries ++
    graft.queries.GateQueries.queries ++
    graft.queries.TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
    graft.queries.AdvancedRelationalQueries.oracles ++
    graft.queries.FunctionQueries.oracles ++
    graft.queries.TimeSeriesQueries.oracles ++
    graft.queries.VectorQueries.oracles ++
    graft.queries.TextDedupQueries.oracles ++
    graft.queries.CurationQueries.oracles ++
    graft.queries.GraphMlQueries.oracles ++
    graft.queries.RottnestQueries.oracles ++
    graft.queries.ExtensionQueries.oracles ++
    graft.queries.GateQueries.oracles ++
    graft.queries.TpchQueries.oracles
}
