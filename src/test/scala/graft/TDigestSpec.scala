package graft

import graft.agg.TDigestQuantiles
import org.apache.spark.sql.functions._

/** t-digest Aggregator: accuracy vs exact quantiles across partitioned
  * (merge-exercising) execution. */
class TDigestSpec extends SparkSpecBase {

  test("t-digest quantiles within 1% of exact on skewed data, merged across partitions") {
    val s = spark
    import s.implicits._
    // lognormal-ish skew: the case mean-of-partition-quantiles handles worst
    val rnd = new scala.util.Random(7)
    val xs = (1 to 20000).map(_ => math.exp(rnd.nextGaussian() * 1.5))
    val ds = s.createDataset(xs).repartition(8)
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)
    val agg = new TDigestQuantiles(qs, compression = 200)
    val got = ds.select(agg.toColumn).head().values
    val sorted = xs.sorted
    qs.zip(got).foreach { case (q, est) =>
      // rank error: the estimate's position in the sorted data vs q
      val rank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(rank - q) < 0.01, s"q=$q est=$est rank=$rank")
    }
  }

  test("t-digest on lineitem matches exact percentile closely") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val s = spark
    import s.implicits._
    val agg = new TDigestQuantiles(Seq(0.5), compression = 100)
    val got = li.select(col("l_extendedprice").cast("double")).as[Double]
      .select(agg.toColumn).head().values.head
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(math.abs(got - exact) / exact < 0.02, s"got=$got exact=$exact")
  }

  test("multi-column approximate_quantile: one agg, one row, per-column arrays") {
    val li = new graft.api.DataStream(
      spark.read.parquet(sf("sf0.001") + "/lineitem.parquet"))
    val out = li.approximateQuantile(
      Seq("l_quantity", "l_extendedprice", "l_discount"), Seq(0.1, 0.9), 10000)
    val row = out.df.head()
    assert(out.df.columns.toSeq == Seq("l_quantity_quantiles",
      "l_extendedprice_quantiles", "l_discount_quantiles"))
    val q = row.getSeq[Double](0)
    assert(q.size == 2 && q(0) <= q(1))
  }

  test("t-digest handles empty and single-value inputs") {
    val s = spark
    import s.implicits._
    val agg = new TDigestQuantiles(Seq(0.5))
    val empty = s.createDataset(Seq.empty[Double]).select(agg.toColumn).head()
    assert(empty.values.head.isNaN)
    val one = s.createDataset(Seq(42.0)).select(agg.toColumn).head()
    assert(one.values.head == 42.0)
  }

  test("grouped t-digest: per-group sketches, close to exact, layout invariant") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // two groups with disjoint ranges: the sketches must not bleed
    val rows = (1 to 2000).map(i => ("lo", i.toDouble)) ++
      (1 to 2000).map(i => ("hi", 100000.0 + i))
    val df = rows.toDF("g", "v")
    val out = new graft.api.DataStream(df)
      .tdigestQuantileBy("g", "v", Seq(0.25, 0.5, 0.75)).df
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("lo").forall(q => q >= 1.0 && q <= 2000.0))
    assert(out("hi").forall(q => q >= 100001.0 && q <= 102000.0))
    // within 1% of the exact per-group quantiles
    for ((g, lo) <- Seq(("lo", 0.0), ("hi", 100000.0)); (p, i) <- Seq(
        (0.25, 0), (0.5, 1), (0.75, 2))) {
      val exact = lo + 2000.0 * p
      assert(math.abs(out(g)(i) - exact) <= 20.0,
        s"$g q$p: ${out(g)(i)} vs $exact")
    }
    // partial-merge layout invariance: same data, different partitions
    val again = new graft.api.DataStream(df.repartition(13))
      .tdigestQuantileBy("g", "v", Seq(0.25, 0.5, 0.75)).df
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for (g <- Seq("lo", "hi"); i <- 0 to 2)
      assert(math.abs(again(g)(i) - out(g)(i)) <= 20.0)
  }
}
