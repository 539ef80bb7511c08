package graft.queries

import graft.api.DataStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface coverage (SURVEY §2.8): the reference's
  * Expression `.str` / `.dt` namespaces (expression.py:188-388) and
  * `filter_sql` predicate surface (sql_utils.py:86-223), re-expressed as
  * Spark built-ins. All row-wise, codegen'd, no UDFs. */
object FunctionQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // .str namespace: upper/lower/contains/starts/ends/length/substring
    // (reference expression.py:188-287).
    "q30_string_funcs" -> { (s, d) =>
      new DataStream(documents(s, d))
        .withColumns(Map(
          "up" -> upper(col("source")),
          "lo" -> lower(col("source")),
          "has_join" -> col("text").contains("join"),
          "starts_the" -> col("text").startsWith("the"),
          "ends_scan" -> col("text").endsWith("scan"),
          "txt_len" -> length(col("text")),
          "sub" -> substring(col("text"), 1, 12),
          "cat" -> concat(col("lang"), lit(":"), col("source"))))
        .select("doc_id", "up", "lo", "has_join", "starts_the", "ends_scan",
          "txt_len", "sub", "cat")
        .sort(Seq("doc_id")).df
    },

    // LIKE shapes + regexp predicate + CASE WHEN (sql_utils.py:131-168).
    "q31_like_regex" -> { (s, d) =>
      new DataStream(documents(s, d))
        .filterSql("text like '%join%' and lang in ('en', 'de', 'es')")
        .withColumnsSql(
          "text rlike 'jo[ai]n (fast|merge)' as re_hit",
          "case when lang = 'en' then 1 else 0 end as is_en",
          "regexp_replace(source, '[0-9]+', '#') as src_norm",
          "substring(text, 5, 10) as sub5")
        .select("doc_id", "re_hit", "is_en", "src_norm", "sub5")
        .sort(Seq("doc_id")).df
    },

    // .dt namespace (expression.py:289-388): hour/minute/second/weekday/
    // week/month/year + EXTRACT equivalence.
    "q32_datetime_funcs" -> { (s, d) =>
      new DataStream(events(s, d))
        .withColumns(Map(
          "yr" -> year(col("ts")),
          "mo" -> month(col("ts")),
          "dy" -> dayofmonth(col("ts")),
          "hr" -> hour(col("ts")),
          "mi" -> minute(col("ts")),
          "sec" -> second(col("ts")),
          "dow" -> dayofweek(col("ts")),       // 1=Sunday..7=Saturday
          "wk" -> weekofyear(col("ts")),       // ISO week
          "msec" -> (col("ts").cast("double") * 1000 % 1000).cast("long")))
        .select("event_id", "yr", "mo", "dy", "hr", "mi", "sec", "dow", "wk", "msec")
        .sort(Seq("event_id")).df
    },

    // dt.offset_by (expression.py:357-378) → interval arithmetic; also
    // date_trunc and strftime/date_format.
    "q33_date_offset" -> { (s, d) =>
      new DataStream(events(s, d))
        .withColumnsSql(
          "ts + interval 90 day as ts_plus90d",
          "ts - interval 3 hour as ts_minus3h",
          "date_trunc('DAY', ts) as day_start",
          "date_format(ts, 'yyyy-MM-dd HH') as fmt")
        .select("event_id", "ts_plus90d", "ts_minus3h", "day_start", "fmt")
        .sort(Seq("event_id")).df
    },

    // str.json_extract (expression.py:252-271) → get_json_object.
    "q34_json_extract" -> { (s, d) =>
      new DataStream(events(s, d))
        .withColumns(Map(
          "k_val" -> get_json_object(col("props"), "$.k").cast("long")))
        .filter(col("k_val") > 50)
        .groupby("event_type")
        .aggSql("count(*) as n", "sum(k_val) as k_sum", "avg(k_val) as k_avg")
        .sort(Seq("event_type")).df
    },

    // hash/abs/round/floor/ceil/power/mod arithmetic surface
    // (expression.py:30-178 operator overloads).
    "q35_arithmetic" -> { (s, d) =>
      new DataStream(lineitem(s, d))
        .filterSql("l_orderkey % 500 = 0")
        .withColumnsSql(
          "abs(l_discount - 0.05) as abs_d",
          "round(l_quantity / 2.0, 0) as half_q",
          "floor(l_quantity / 7) as q7",
          "ceil(l_tax * 100) as tax_pct",
          "power(l_quantity, 2) as q_sq",
          "l_orderkey % 7 as key_mod")
        .select("l_orderkey", "l_linenumber", "abs_d", "half_q", "q7",
          "tax_pct", "q_sq", "key_mod")
        .sort(Seq("l_orderkey", "l_linenumber")).df
    }
  )

  val oracles: Map[String, String] = Map(
    "q30_string_funcs" ->
      """SELECT doc_id, upper(source) AS up, lower(source) AS lo,
        |  contains(text, 'join') AS has_join,
        |  starts_with(text, 'the') AS starts_the,
        |  ends_with(text, 'scan') AS ends_scan,
        |  length(text) AS txt_len,
        |  substring(text, 1, 12) AS sub,
        |  lang || ':' || source AS cat
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_like_regex" ->
      """SELECT doc_id,
        |  regexp_matches(text, 'jo[ai]n (fast|merge)') AS re_hit,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
        |  regexp_replace(source, '[0-9]+', '#', 'g') AS src_norm,
        |  substring(text, 5, 10) AS sub5
        |FROM documents
        |WHERE text LIKE '%join%' AND lang IN ('en', 'de', 'es')
        |ORDER BY doc_id""".stripMargin,
    "q32_datetime_funcs" ->
      """SELECT event_id,
        |  year(ts) AS yr, month(ts) AS mo, day(ts) AS dy,
        |  hour(ts) AS hr, minute(ts) AS mi, second(ts) AS sec,
        |  dayofweek(ts) + 1 AS dow,
        |  weekofyear(ts) AS wk,
        |  cast(floor(epoch_ms(ts) % 1000) AS BIGINT) AS msec
        |FROM events ORDER BY event_id""".stripMargin,
    "q33_date_offset" ->
      """SELECT event_id,
        |  ts + INTERVAL 90 DAY AS ts_plus90d,
        |  ts - INTERVAL 3 HOUR AS ts_minus3h,
        |  date_trunc('day', ts) AS day_start,
        |  strftime(ts, '%Y-%m-%d %H') AS fmt
        |FROM events ORDER BY event_id""".stripMargin,
    "q34_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k_val) AS BIGINT) AS k_sum, avg(k_val) AS k_avg
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |      FROM events)
        |WHERE k_val > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q35_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_d,
        |  round(l_quantity / 2.0, 0) AS half_q,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS q7,
        |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
        |  power(l_quantity, 2) AS q_sq,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey % 500 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
