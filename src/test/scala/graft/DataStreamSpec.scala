package graft

import graft.api.{DataStream, QContext}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Relational DataStream surface (SURVEY §2.3-§2.7). */
class DataStreamSpec extends SparkSpecBase {
  import org.apache.spark.sql.Encoders

  private def ds(rows: Seq[(Int, String, Double)]): DataStream = {
    val s = spark
    import s.implicits._
    new DataStream(rows.toDF("id", "name", "v"))
  }

  test("join applies suffix to overlapping non-key right columns") {
    val l = ds(Seq((1, "a", 1.0), (2, "b", 2.0)))
    val r = ds(Seq((1, "x", 10.0), (3, "y", 30.0)))
    val j = l.join(r, "id", "id")
    assert(j.schema == Seq("id", "name", "v", "name_2", "v_2"))
    assert(j.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("semi and anti joins prune to left schema") {
    val l = ds(Seq((1, "a", 1.0), (2, "b", 2.0)))
    val r = ds(Seq((1, "x", 10.0)))
    assert(l.join(r, "id", "id", how = "semi").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(l.join(r, "id", "id", how = "anti").collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(l.join(r, "id", "id", how = "semi").schema == Seq("id", "name", "v"))
  }

  test("clip clamps into bounds") {
    val out = ds(Seq((1, "a", -5.0), (2, "b", 99.0), (3, "c", 0.5)))
      .clip(Map("v" -> (0.0, 1.0))).df
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(0.0, 1.0, 0.5))
  }

  test("winsorize: one-hop quantile clip; all-null column raises") {
    val d = ds((1 to 100).map(i => (i, s"n$i", i.toDouble)))
    val out = d.winsorize(Seq("v"), 0.1, 0.9).df
    val (mn, mx) = {
      val r = out.agg(org.apache.spark.sql.functions.min("v"),
        org.apache.spark.sql.functions.max("v")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // bounds land near the 10th/90th percentile of 1..100; everything
    // outside is clamped TO them
    assert(mn > 5.0 && mn < 15.0, s"lo=$mn")
    assert(mx > 85.0 && mx < 95.0, s"hi=$mx")
    assert(out.count() == 100)
    // an all-null column must raise loudly, not NaN-poison the clip
    val s = spark
    import s.implicits._
    val nulls = Seq[(Int, java.lang.Double)]((1, null), (2, null))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      new graft.api.DataStream(nulls).winsorize(Seq("v"), 0.1, 0.9)
    }
    assert(e.getMessage.contains("no non-null values"))
  }

  test("topK equals sort-then-limit") {
    val d = ds((1 to 50).map(i => (i, s"n$i", (i * 37 % 50).toDouble)))
    val a = d.topK(Seq("v"), 5, descending = true).df.collect().map(_.getDouble(2)).toSeq
    val b = d.sort(Seq("v"), descending = true).df.limit(5).collect().map(_.getDouble(2)).toSeq
    assert(a == b)
  }

  test("agg spec map and sugar agree") {
    val d = ds(Seq((1, "a", 2.0), (2, "b", 4.0)))
    val m = d.agg(Map("v" -> "sum")).collect()(0).getDouble(0)
    val s = d.sum("v").collect()(0).getDouble(0)
    assert(m == 6.0 && s == 6.0)
  }

  test("groupby agg + countDistinct") {
    val d = ds(Seq((1, "a", 1.0), (1, "a", 2.0), (2, "b", 3.0)))
    val g = d.groupby("id").agg(Map("v" -> "sum")).df.orderBy("id").collect()
    assert(g.map(r => (r.getInt(0), r.getDouble(1))).toSeq == Seq((1, 3.0), (2, 3.0)))
    assert(d.countDistinct("id").collect()(0).getLong(0) == 2L)
  }

  test("approxCountDistinct is near exact on moderate cardinality") {
    val d = ds((1 to 500).map(i => (i % 97, s"n$i", 1.0)))
    val approx = d.approxCountDistinct("id").collect()(0).getLong(0)
    assert(math.abs(approx - 97) <= 10)
  }

  test("union / intersect / except") {
    val a = ds(Seq((1, "a", 1.0), (2, "b", 2.0)))
    val b = ds(Seq((2, "b", 2.0), (3, "c", 3.0)))
    assert(a.union(b).count() == 4)
    assert(a.intersect(b).collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(a.except(b).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("statefulTransform runs per-partition ordered state machine") {
    // running count per key over ordered rows — key-partitioned, so all
    // rows of one key land in one partition in order.
    val d = ds(Seq((1, "a", 3.0), (1, "a", 1.0), (2, "b", 2.0), (1, "a", 2.0)))
    implicit val enc = Encoders.product[(Int, Double, Int)]
    val out = d.statefulTransform(Seq("id"), Seq("v")) { it =>
      var lastKey = Int.MinValue; var n = 0
      it.map { r =>
        val k = r.getInt(0)
        if (k != lastKey) { lastKey = k; n = 0 }
        n += 1
        (k, r.getDouble(2), n)
      }
    }.collect().sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1, 1.0, 1), (1, 2.0, 2), (1, 3.0, 3), (2, 2.0, 1)))
  }

  test("transformSql grouped partial-agg sugar") {
    val d = ds(Seq((1, "a", 1.0), (1, "a", 2.0), (2, "b", 4.0)))
    val out = d.transformSql(Seq("sum(v) as s"), groupBy = Seq("id"))
      .df.orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(3.0, 4.0))
  }

  test("saltedJoin equals plain inner join on skewed keys") {
    // key 1 floods the left side — the manual-salt fallback must still
    // produce exactly the plain inner join's row multiset.
    val l = ds((1 to 200).map(i => (if (i % 10 == 0) i else 1, s"n$i", i.toDouble)))
    val r = ds(Seq((1, "hot", 0.0), (10, "ten", 0.0), (20, "twenty", 0.0)))
    val salted = l.saltedJoin(r, "id", "id", salt = 8).df
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val plain = l.df.join(r.df, l.df("id") === r.df("id")).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("aggSalted equals plain grouped agg for decomposable ops") {
    val d = ds((1 to 300).map(i =>
      (if (i % 7 == 0) i % 3 else 0, s"n$i", (i % 13).toDouble)))
    val spec = Map("v" -> "sum", "*" -> "count")
    def rows(s: DataStream) = s.df.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(rows(d.groupby("id").aggSalted(spec, salt = 6)) ==
      rows(d.groupby("id").agg(spec)))
    val m = d.groupby("id").aggSalted(Map("v" -> "mean"), salt = 4).df
      .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val m0 = d.groupby("id").agg(Map("v" -> "mean")).df
      .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(m.map(_._1) == m0.map(_._1))
    m.zip(m0).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
    intercept[IllegalArgumentException] {
      d.groupby("id").aggSalted(Map("v" -> "median"), salt = 4)
    }
  }

  test("cogroup merges two grouped streams per key") {
    val s = spark
    import s.implicits._
    val a = new DataStream(Seq((1, 10), (1, 11), (2, 20)).toDF("k", "x"))
    val b = new DataStream(Seq((1, 100), (3, 300)).toDF("k", "y"))
    val out = a.groupby("k").cogroup(b.groupby("k"), (r: Row) => r.getInt(0)) {
      (k, la, lb) => Iterator((k, la.size, lb.size))
    }.collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, 2, 1), (2, 1, 0), (3, 0, 1)))
  }
}

/** Source/sink veneer (SURVEY §2.1-§2.2). */
class SourcesSinksSpec extends SparkSpecBase {
  private val tmp = "target/test-io"

  test("csv write/read roundtrip with maxRecordsPerFile") {
    val qc = new QContext(spark)
    val d = qc.readParquet(sf() + "/nation.parquet")
    d.writeCsv(s"$tmp/nation_csv", maxRecordsPerFile = 10)
    val back = qc.readCsv(s"$tmp/nation_csv")
    assert(back.count() == d.count())
    val files = new java.io.File(s"$tmp/nation_csv").listFiles()
      .count(f => f.getName.endsWith(".csv"))
    assert(files >= 3) // 25 rows / 10-per-file
  }

  test("parquet write/read roundtrip preserves schema") {
    val qc = new QContext(spark)
    val d = qc.readParquet(sf() + "/region.parquet")
    d.writeParquet(s"$tmp/region_pq")
    val back = qc.readParquet(s"$tmp/region_pq")
    assert(back.sparkSchema == d.sparkSchema && back.count() == d.count())
  }

  test("partitioned write prunes partitions on filtered read") {
    val qc = new QContext(spark)
    val d = qc.readParquet(sf() + "/orders.parquet")
    d.writeParquetPartitioned(s"$tmp/orders_part", Seq("o_orderpriority"))
    val dirs = new java.io.File(s"$tmp/orders_part").listFiles()
      .count(_.getName.startsWith("o_orderpriority="))
    assert(dirs >= 3)
    val back = qc.readParquet(s"$tmp/orders_part")
      .filterSql("o_orderpriority = '1-URGENT'")
    val expected = d.filterSql("o_orderpriority = '1-URGENT'").count()
    assert(back.count() == expected)
    // the partition filter must reach the scan, not a post-scan filter
    val plan = back.df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderpriority"))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val qc = new QContext(spark)
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"target/test-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val o = qc.readParquet(sf() + "/orders.parquet")
    o.writeBucketed("orders_b", Seq("o_custkey"), 4)
    qc.readParquet(sf() + "/customer.parquet")
      .writeBucketed("customer_b", Seq("c_custkey"), 4)
    val j = spark.table("orders_b").join(spark.table("customer_b"),
      col("o_custkey") === col("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(j.count() > 0)
  }

  test("readParquet nameColumn adds source file") {
    val qc = new QContext(spark)
    val d = qc.readParquet(sf() + "/region.parquet", nameColumn = Some("src"))
    assert(d.df.select("src").head().getString(0).contains("region.parquet"))
  }

  test("readFiles streams binary blobs with metadata") {
    val qc = new QContext(spark)
    val d = qc.readFiles(sf() + "/region.parquet")
    val r = d.df.select("path", "length", "content").head()
    assert(r.getString(0).contains("region.parquet") && r.getLong(1) > 0)
  }

  test("readJson reads JSON lines written by Spark") {
    val qc = new QContext(spark)
    qc.readParquet(sf() + "/region.parquet").df
      .write.mode("overwrite").json(s"$tmp/region_json")
    assert(qc.readJson(s"$tmp/region_json").count() == 5)
  }

  test("sql entry point runs native SQL") {
    val qc = new QContext(spark)
    qc.readParquet(sf() + "/region.parquet").df.createOrReplaceTempView("t_region")
    assert(qc.sql("SELECT count(*) AS n FROM t_region").df.head().getLong(0) == 5)
  }

  test("mingle runs an N-input stateful operator over tagged sorted streams") {
    val s = spark
    import s.implicits._
    val quotes = Seq(("A", 1.0, 10.0), ("A", 3.0, 11.0), ("B", 1.0, 5.0))
      .toDF("sym", "t", "v")
    val trades = Seq(("A", 2.0, 0.0), ("A", 4.0, 0.0), ("B", 2.0, 0.0))
      .toDF("sym", "t", "v")
    val qc = new QContext(spark)
    // mini build-probe: fill each trade (stream 1) with the latest quote
    // (stream 0) seen so far for its symbol
    val out = qc.mingle(Map(0 -> quotes, 1 -> trades), Seq("sym"), Seq("t")) { it =>
      var lastQ = Double.NaN
      var lastSym = ""
      it.flatMap { case (sid, r) =>
        val sym = r.getString(0)
        if (sym != lastSym) { lastQ = Double.NaN; lastSym = sym }
        if (sid == 0) { lastQ = r.getDouble(2); Iterator.empty }
        else Iterator.single((sym, r.getDouble(1), lastQ))
      }
    }.collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("A", 2.0, 10.0), ("A", 4.0, 11.0), ("B", 2.0, 5.0)))
  }

  test("pivot yields one column per enumerated value; absent combos are null") {
    val s = spark
    import s.implicits._
    val ds = new DataStream(
      Seq(("a", "x", 1.0), ("a", "y", 2.0), ("a", "x", 4.0), ("b", "x", 3.0))
        .toDF("k", "p", "v"))
    val out = ds.groupby("k").pivot("p", Seq("x", "y"), Map("v" -> "sum")).df
    assert(out.columns.toSeq == Seq("k", "x", "y"))
    val rows = out.orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq(("a", 5.0, Some(2.0)), ("b", 3.0, None)))
  }

  test("explainGraphviz renders the plan DAG as DOT") {
    val s = spark
    import s.implicits._
    val l = new DataStream(Seq((1, "a"), (2, "b")).toDF("id", "name"))
    val r = new DataStream(Seq((1, "x")).toDF("id", "tag"))
    val dot = l.join(r, "id", "id")
      .groupby("name").aggSql("count(*) as n").explainGraphviz()
    assert(dot.startsWith("digraph plan {"))
    assert(dot.contains("->"), "DOT output must contain edges")
    assert(dot.contains("HashAggregate") || dot.contains("Aggregate"),
      s"expected an aggregate node in:\n$dot")
    assert(dot.trim.endsWith("}"))
  }
}
