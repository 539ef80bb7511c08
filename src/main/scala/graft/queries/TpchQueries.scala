package graft.queries

import graft.api.DataStream
import graft.functions.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's full TPC-H application suite (reference
  * apps/tpc-h/tpch.py:76-560, `do_1` … `do_22`), re-expressed Spark-first.
  * A user of the reference runs exactly these 22 queries; this file is the
  * "switch to this library and keep running them" surface.
  *
  * Adaptations to the driver-provided schema (TESTDATA.md) — the driver
  * tables are TPC-H-ish but reduced, so canonical columns that do not
  * exist are substituted with the nearest present equivalent, keeping
  * every query's operator STRUCTURE (join graph, subquery shape,
  * aggregate set) intact:
  *  - `partsupp` does not exist → derived from lineitem as the distinct
  *    (l_partkey, l_suppkey) pairs with ps_supplycost := min unit price
  *    and ps_availqty := total shipped quantity. Deterministic and
  *    mirrored exactly in the DuckDB oracle (tpch02/09/11/16/20).
  *  - l_commitdate/l_receiptdate absent → "late" := shipped after (Q4,
  *    Q12) or >60 days after (Q21) o_orderdate.
  *  - l_shipmode/p_container/c_phone/o_comment absent → the filter or
  *    grouping moves to a present column (noted per query).
  *  - Date constants shift from the canonical 1992-1998 window into the
  *    generated 1995-2001 window.
  *
  * Scale notes: region/nation are broadcast at any SF; part/supplier/
  * derived-partsupp joins are left to Catalyst+AQE (they scale with SF,
  * so hard broadcasts would be wrong at 100 TB); scalar aggregates
  * (thresholds, maxima) ARE broadcast — they are one row by
  * construction. Every scan carries its filter and projection (pushdown
  * verified via .explain in the specs).
  */
object TpchQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Oracle-side derived partsupp (see file Scaladoc): one row per
    * (part, supplier) pair observed in lineitem. The Spark side derives
    * the same relation inline per query, pushing each query's per-part /
    * per-supplier restriction BELOW the groupBy (a semi join before the
    * aggregation) — the oracle states the unrestricted form because the
    * downstream joins apply the same restriction relationally. */
  private val partsuppSql =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost,
      |         sum(CAST(l_quantity AS BIGINT)) AS ps_availqty
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Q1: pricing summary report (tpch.py do_1/do_1_sql:76-120).
    "tpch01" -> { (s, d) =>
      new DataStream(lineitem(s, d))
        .filterSql("l_shipdate <= timestamp '2000-09-02 00:00:00'")
        .groupby("l_returnflag", "l_linestatus")
        .aggSql(
          "sum(l_quantity) as sum_qty",
          s"${Det.dsumSparkSql("l_extendedprice")} as sum_base_price",
          s"${Det.dsumSparkSql("l_extendedprice * (1 - l_discount)")} as sum_disc_price",
          s"${Det.dsumSparkSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} as sum_charge",
          "avg(l_quantity) as avg_qty",
          s"${Det.davgSparkSql("l_extendedprice")} as avg_price",
          s"${Det.davgSparkSql("l_discount")} as avg_disc",
          "count(*) as count_order")
        .sort(Seq("l_returnflag", "l_linestatus")).df
    },

    // Q2: minimum-cost supplier (do_2:122-146). partsupp derived;
    // p_type = 'STANDARD' stands in for the '%BRASS' suffix filter.
    "tpch02" -> { (s, d) =>
      val euroNat = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val euroSupp = supplier(s, d)
        .join(broadcast(euroNat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val p = part(s, d)
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select("p_partkey")
      // The part filter is a per-part restriction, and min_cost is a
      // per-part aggregate — so the filter pushes BELOW the partsupp
      // derivation (semi join before the groupBy shrinks the aggregated
      // fact rows by the filter's selectivity without changing any
      // surviving part's minimum).
      val ps = lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val eps = ps.join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
      // Per-part minimum as a window over eps, not a min-subquery join:
      // the join form plans the whole eps pipeline (lineitem semi +
      // groupBy + supplier join) TWICE — the keyed join-back infers
      // isnotnull filters one copy lacks, so the exchanges never
      // canonicalize equal and no reuse fires (same disease as tpch15,
      // measured round 9: every input scanned twice). The window
      // shuffles eps once by ps_partkey; min is exact, so results are
      // bit-identical.
      eps.withColumn("min_cost", min(col("ps_supplycost"))
          .over(Window.partitionBy("ps_partkey")))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "ps_partkey", "ps_supplycost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("ps_partkey"))
        .limit(100)
    },

    // Q3: shipping priority (do_3:147-175); o_orderpriority stands in
    // for the absent o_shippriority.
    "tpch03" -> { (s, d) =>
      val cust = new DataStream(customer(s, d))
        .filterSql("c_mktsegment = 'BUILDING'")
      val ord = new DataStream(orders(s, d))
        .filterSql("o_orderdate < timestamp '1996-03-15 00:00:00'")
      val li = new DataStream(lineitem(s, d))
        .filterSql("l_shipdate > timestamp '1996-03-15 00:00:00'")
      cust.join(ord, "c_custkey", "o_custkey")
        .join(li, "o_orderkey", "l_orderkey")
        .groupby("l_orderkey", "o_orderdate", "o_orderpriority")
        .aggSql(s"${Det.dsumSparkSql("l_extendedprice * (1 - l_discount)")} as revenue")
        .df.orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // Q4: order priority checking (do_4:177-199). "Late" := any line
    // shipped after the order date (no commit/receipt dates).
    "tpch04" -> { (s, d) =>
      val ord = new DataStream(orders(s, d))
        .filterSql("o_orderdate >= timestamp '1996-07-01 00:00:00' and " +
          "o_orderdate < timestamp '1996-10-01 00:00:00'")
      val li = new DataStream(lineitem(s, d).hint("shuffle_hash"))
      ord.joinOn(li, ord.df("o_orderkey") === li.df("l_orderkey") &&
          li.df("l_shipdate") > ord.df("o_orderdate"), "left_semi")
        .groupby("o_orderpriority")
        .aggSql("count(*) as order_count")
        .sort(Seq("o_orderpriority")).df
    },

    // Q5: local supplier volume (do_5:201-236).
    "tpch05" -> { (s, d) =>
      val asiaNat = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = customer(s, d)
        .join(broadcast(asiaNat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val ord = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q6: forecasting revenue change (do_6:238-247).
    "tpch06" -> { (s, d) =>
      new DataStream(lineitem(s, d))
        .filterSql("l_shipdate >= timestamp '1996-01-01 00:00:00' and " +
          "l_shipdate < timestamp '1997-01-01 00:00:00' and " +
          "l_discount between 0.05 and 0.07 and l_quantity < 24")
        .aggSql(s"${Det.dsumSparkSql("l_extendedprice * l_discount")} as revenue").df
    },

    // Q7: volume shipping between two nations (do_7:249-285).
    "tpch07" -> { (s, d) =>
      val nat = broadcast(nation(s, d).select("n_nationkey", "n_name"))
      val custNat = customer(s, d)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_13", "NATION_24"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val d1 = orders(s, d).join(custNat, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "cust_nation")
      val suppNat = supplier(s, d)
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_13", "NATION_24"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val d2 = lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("supp_nation"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      d1.join(d2, col("o_orderkey") === col("l_orderkey"))
        .filter((col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_24") ||
          (col("supp_nation") === "NATION_24" && col("cust_nation") === "NATION_13"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(Det.dsum(col("volume")).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Q8: national market share (do_8:287-307). p_type = 'ECONOMY'
    // stands in for 'ECONOMY ANODIZED STEEL'; NATION_3's share of
    // AMERICA-region consumption.
    "tpch08" -> { (s, d) =>
      val amNat = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("am_nationkey"))
      val amCust = customer(s, d)
        .join(broadcast(amNat), col("c_nationkey") === col("am_nationkey"))
        .select("c_custkey")
      val amOrd = orders(s, d)
        .filter(col("o_orderdate").between(
          lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .join(amCust, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
      val p = part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey")
      val suppNat = supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(amOrd, col("l_orderkey") === col("o_orderkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
          col("supp_nation"))
        .groupBy(col("o_year"))
        .agg((Det.dsum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / Det.dsum(col("volume"))).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Q9: product type profit (do_9:309-326). Profit uses the derived
    // ps_supplycost; p_name like '%widget%' stands in for '%green%'.
    "tpch09" -> { (s, d) =>
      val p = part(s, d).filter(col("p_name").like("%widget%"))
        .select("p_partkey")
      val suppNat = supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      // The derived ps_supplycost (per-pair min over widget parts'
      // lines) comes from a window over the SAME part-filtered detail
      // the outer query reads — the old derive-then-join-back form
      // scanned and shuffled lineitem twice for rows the window gets
      // from one pass (the keyed join-back blocks exchange reuse, same
      // disease as tpch15; measured round 9). min is exact, so the
      // profit column is bit-identical.
      lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("ps_supplycost",
          min(col("l_extendedprice") / col("l_quantity"))
            .over(Window.partitionBy("l_partkey", "l_suppkey")))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("nation"), year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("ps_supplycost") * col("l_quantity")).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(Det.dsum(col("amount")).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q10: returned item reporting (do_10:328-340); customer contact
    // columns absent from the schema are dropped from the grouping.
    "tpch10" -> { (s, d) =>
      val natC = customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
      val ord = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      natC.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q11: important stock identification (do_11:342-349) over the
    // derived partsupp; value threshold 0.0001 of the nation total.
    "tpch11" -> { (s, d) =>
      val natSupp = supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_15")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      // Per-supplier restriction pushed below the partsupp derivation
      // (see tpch02): only the nation's suppliers' pairs aggregate.
      val ps = lineitem(s, d)
        .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
          sum(col("l_quantity").cast("long")).as("ps_availqty"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
      // The nation total needed for the threshold is the sum of the
      // per-part values — so compute per-part EXACT-DECIMAL partials
      // once and take the global total as a window sum over them,
      // instead of aggregating the ps pipeline a second time and
      // cross-joining the one-row result (two full lineitem scans).
      // Decimal partial sums are associative integers, so
      // sum-of-partials == Det.dsum over all rows bit-for-bit, and the
      // window moves only O(#parts) 16-byte rows through one task.
      ps.groupBy(col("ps_partkey")).agg(Det.dsumWin(col("v")).as("vdec"))
        .withColumn("value", Det.dwinFinish(col("vdec")))
        .withColumn("threshold",
          Det.dwinFinish(sum(col("vdec")).over(Window.partitionBy())) *
            lit(0.0001))
        .filter(col("value") > col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // Q12: shipping mode / priority (do_12:351-375). No l_shipmode →
    // group by l_returnflag; "late" as in tpch04.
    "tpch12" -> { (s, d) =>
      val li = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag", "l_shipdate")
      li.join(orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // Q13: customer distribution (do_13:377-383); the o_comment
    // exclusion filter has no present column and is dropped.
    "tpch13" -> { (s, d) =>
      // Pre-aggregate orders per custkey BELOW the join (round-10: the
      // naive left-join-then-group form shuffled every order row and
      // was the catalog's worst 10× soak ratio at 2.2-2.7 for two
      // rounds; Catalyst does not push partial aggregation through a
      // join on its own). The exchange now carries map-side-combined
      // (custkey, n) pairs — one row per customer, not per order — and
      // the join probes a relation ~10× smaller. count(o_orderkey)
      // (non-null keys) ≡ coalesce(n, 0) for no-order customers.
      val perCust = orders(s, d).select("o_custkey")
        .groupBy("o_custkey").agg(count(lit(1)).as("__n"))
      customer(s, d).select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("__n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14: promotion effect (do_14:385-394).
    "tpch14" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(part(s, d).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          Det.dsum(when(col("p_type").like("PROMO%"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))) /
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("promo_revenue"))
    },

    // Q15: top supplier (do_15:396-409): revenue view + max. Global
    // window over the AGGREGATED revenue view instead of a max-subquery
    // join — the subquery form computes the lineitem scan+aggregate
    // twice (inferred join-side isnotnull blocks exchange/stage reuse;
    // see q26_scalar_max), while the window runs on the per-supplier
    // rows the global max collapses to one partition anyway.
    "tpch15" -> { (s, d) =>
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val best = rev
        .withColumn("max_rev", max(col("total_revenue"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .filter(col("total_revenue") === col("max_rev"))
      supplier(s, d).select("s_suppkey", "s_name")
        .join(best, col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(col("s_suppkey"))
    },

    // Q16: parts/supplier relationship (do_16:411-420) over derived
    // partsupp; "complaint" suppliers := negative account balance.
    "tpch16" -> { (s, d) =>
      val bad = supplier(s, d).filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey").as("bad_suppkey"))
      val p = part(s, d)
        .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      // Distinct (part, supplier) pairs only — the full partsupp
      // aggregates are unused here, and the per-part restriction pushes
      // below the distinct (see tpch02).
      lineitem(s, d)
        .join(p.select("p_partkey"), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .join(bad, col("ps_suppkey") === col("bad_suppkey"), "left_anti")
        .join(p, col("ps_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q17: small-quantity-order revenue (do_17:422-432); p_size = 7
    // stands in for the absent p_container = 'MED BOX'.
    "tpch17" -> { (s, d) =>
      val p = part(s, d)
        .filter(col("p_brand") === "Brand#23" && col("p_size") === 7)
        .select("p_partkey")
      // The correlated avg is per-part and the part filter is per-part,
      // so the avg over the PART-FILTERED join equals the avg over all
      // of lineitem for every surviving part — computed as a window, it
      // shuffles only the ~1/1000 filtered rows, where the old derived-
      // aggregate join built per-part avgs for the ENTIRE fact table
      // (a full extra scan + a shuffle of every partkey) and threw
      // 99.9% of them away at the join.
      lineitem(s, d).select("l_partkey", "l_quantity", "l_extendedprice")
        .join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("avg_quantity",
          lit(0.2) * avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
        .filter(col("l_quantity") < col("avg_quantity"))
        .agg((Det.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // Q18: large volume customers (do_18:434-442), threshold 300.
    "tpch18" -> { (s, d) =>
      // Aggregate-first: the outer per-order sum IS the HAVING
      // subquery's sum (orders and customer are key-unique, so the
      // joins add no fan-out) — so compute it once, filter, and join
      // the surviving handful of orders outward. The old semi-join
      // form scanned and shuffled lineitem twice (once for the HAVING,
      // once to re-derive the same sums after the join) for identical
      // output. The >300 filter leaves so few orders that AQE
      // broadcasts them against orders and customer.
      val totals = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_quantity"))
        .filter(col("total_quantity") > 300)
      orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice")
        .join(totals, col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_quantity"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    // Q19: discounted revenue, disjunctive predicates (do_19:444-477).
    // The brand/size/quantity DNF survives; shipmode/container clauses
    // have no present column.
    "tpch19" -> { (s, d) =>
      val li = lineitem(s, d)
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    },

    // Q20: potential part promotion (do_20:479-491) over derived
    // partsupp; p_name like 'small%' stands in for 'forest%'.
    "tpch20" -> { (s, d) =>
      val fparts = part(s, d).filter(col("p_name").like("small%"))
        .select("p_partkey")
      // availqty (all lines) and the 1996-shipped half-quantity are
      // aggregates over the SAME 'small%'-part (part, supplier) groups
      // differing only in a row predicate — one conditional-aggregation
      // pass computes both, where the old derive-twice-and-join form
      // scanned and shuffled lineitem twice. A pair with no 1996
      // shipments sums the when() to null and drops at the comparison,
      // exactly as the old inner join dropped it.
      val excess = lineitem(s, d)
        .join(fparts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("ps_availqty"),
          (lit(0.5) * sum(when(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
            col("l_quantity")))).as("half_qty"))
        .filter(col("ps_availqty") > col("half_qty"))
        .select(col("l_suppkey").as("ps_suppkey"))
      supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_18")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy(col("s_name"))
    },

    // Q21: suppliers who kept orders waiting (do_21/do_21_sql:493-536).
    // "Late" := shipped >60 days after the order date; the multi-
    // supplier EXISTS / sole-late-supplier NOT EXISTS structure is
    // preserved exactly.
    "tpch21" -> { (s, d) =>
      // The EXISTS / NOT EXISTS pair re-expressed as per-order
      // distinct-supplier cardinality facts computed in ONE pass:
      // join lineitem to F-orders once, then a single conditional
      // aggregate per order derives both predicates —
      //  * EXISTS another-supplier line  <=>  the order's lines span
      //    >= 2 distinct suppliers  <=>  min(l_suppkey) != max;
      //  * NOT EXISTS another late supplier  <=>  the late lines span
      //    exactly one supplier  <=>  min == max over the late-only
      //    conditional (null when on time), and then every late line
      //    belongs to l1's supplier, so the late count IS l1's row
      //    count (sum it instead of re-joining at line grain).
      // lineitem and orders are each scanned ONCE (the literal form
      // read them 3x/2x), the groupBy reuses the join's hash
      // partitioning on the order key (no second exchange), and there
      // are no windows — a window formulation measured 2.3x slower
      // than even the triple-scan literal at sf0.1 because window exec
      // sorts every partition, while this aggregate collapses in the
      // hash map. Measured 1.7x faster than the literal form at sf0.1
      // AND strictly less I/O + shuffle at scale.
      val lines = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late_supp",
          when(col("l_shipdate") > col("o_orderdate") + expr("interval 60 day"),
            col("l_suppkey")))
      val perOrder = lines.groupBy(col("l_orderkey"))
        .agg(min(col("l_suppkey")).as("any_mn"),
          max(col("l_suppkey")).as("any_mx"),
          min(col("late_supp")).as("late_mn"),
          max(col("late_supp")).as("late_mx"),
          count(col("late_supp")).as("nlate"))
        .filter(col("late_mn") === col("late_mx") &&
          col("any_mn") =!= col("any_mx"))
        .select(col("late_mn").as("l_suppkey"), col("nlate"))
      val natSupp = supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      perOrder.join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("nlate")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // Q22: global sales opportunity (do_22:538-556). No c_phone →
    // cntrycode := c_nationkey % 10; same positive-balance average
    // threshold. Every generated customer has at least one order, so
    // the no-orders anti join is against orders placed since 1999
    // ("lapsed customers") to keep the clause non-vacuous.
    "tpch22" -> { (s, d) =>
      val c = customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          (col("c_nationkey") % 10).as("cntrycode"))
        .filter(col("cntrycode").isin(1, 3, 5, 7, 9))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(Det.davg(col("c_acctbal")).as("avg_bal"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), Det.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }
  )

  val oracles: Map[String, String] = Map(
    "tpch01" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  ${Det.davgSql("l_extendedprice")} AS avg_price,
        |  ${Det.davgSql("l_discount")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch02" -> (partsuppSql +
      """,
        |eps AS (
        |  SELECT ps.*, s_acctbal, s_name, n_name
        |  FROM partsupp ps, supplier, nation, region
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, ps_partkey, ps_supplycost
        |FROM eps JOIN part ON ps_partkey = p_partkey
        |WHERE p_size = 15 AND p_type = 'STANDARD'
        |  AND ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eps e2
        |                       WHERE e2.ps_partkey = eps.ps_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey LIMIT 100""".stripMargin),
    "tpch03" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "tpch04" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch05" ->
      s"""SELECT n_name, ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch06" ->
      s"""SELECT ${Det.dsumSql("l_extendedprice * l_discount")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "tpch07" ->
      s"""SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS volume
        |FROM customer, orders, lineitem, supplier,
        |  nation n1, nation n2
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND c_nationkey = n1.n_nationkey AND s_nationkey = n2.n_nationkey
        |  AND ((n2.n_name = 'NATION_13' AND n1.n_name = 'NATION_24')
        |    OR (n2.n_name = 'NATION_24' AND n1.n_name = 'NATION_13'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |    AND TIMESTAMP '1996-12-31 00:00:00'
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch08" ->
      s"""SELECT year(o_orderdate) AS o_year,
        |  ${Det.dsumSql("CASE WHEN n2.n_name = 'NATION_3' " +
          "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} /
        |    ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS mkt_share
        |FROM part, lineitem, orders, customer, supplier,
        |  nation n1, nation n2, region
        |WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |    AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND p_type = 'ECONOMY'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "tpch09" -> (partsuppSql +
      s"""
        |SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount) - " +
          "ps_supplycost * l_quantity")} AS sum_profit
        |FROM part, lineitem, partsupp, supplier, nation, orders
        |WHERE p_partkey = l_partkey AND p_name LIKE '%widget%'
        |  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin),
    "tpch10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM customer, nation, orders, lineitem
        |WHERE c_nationkey = n_nationkey AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch11" -> (partsuppSql +
      s""",
        |nat_ps AS (
        |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_15')
        |SELECT ps_partkey, ${Det.dsumSql("v")} AS value
        |FROM nat_ps
        |GROUP BY ps_partkey
        |HAVING ${Det.dsumSql("v")} > (SELECT ${Det.dsumSql("v")} * 0.0001 FROM nat_ps)
        |ORDER BY value DESC, ps_partkey""".stripMargin),
    "tpch12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "tpch13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch14" ->
      s"""SELECT 100.0 * ${Det.dsumSql("CASE WHEN p_type LIKE 'PROMO%' " +
          "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} /
        |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,
    "tpch15" ->
      s"""WITH revenue AS (
        |  SELECT l_suppkey,
        |    ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch16" -> (partsuppSql +
      """
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
        |  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "tpch17" ->
      s"""SELECT ${Det.dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23' AND p_size = 7
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS total_quantity
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "tpch19" ->
      s"""SELECT ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch20" -> (partsuppSql +
      """
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_18'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * sum(l_quantity) FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin),
    "tpch21" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |  JOIN supplier ON l1.l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "tpch22" ->
      s"""WITH c AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
        |  FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9))
        |SELECT cntrycode, count(*) AS numcust, ${Det.dsumSql("c_acctbal")} AS totacctbal
        |FROM c
        |WHERE c_acctbal > (SELECT ${Det.davgSql("c_acctbal")} FROM c WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  )
}
