package graft

import graft.agg.OrderStat
import org.apache.spark.sql.functions._
import scala.util.Random

/** OrderStat.exactPercentiles vs Spark's built-in exact `percentile`:
  * the range-exchange selection must be bit-identical to the aggregate
  * it replaces (same order statistics, same interpolation expression),
  * on real data, on hot-value (tie-heavy) data, and at the q=0/q=1
  * edges. */
class OrderStatSpec extends SparkSpecBase {

  private def builtin(df: org.apache.spark.sql.DataFrame, c: String,
      qs: Seq[Double]): Array[Double] =
    df.agg(expr(s"percentile($c, array(${qs.mkString(",")}))"))
      .head().getSeq[Double](0).toArray

  test("matches built-in percentile on lineitem prices") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val qs = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = OrderStat.exactPercentiles(li, "l_extendedprice", qs)
    val exp = builtin(li, "l_extendedprice", qs)
    assert(got.toSeq == exp.toSeq) // bit-exact, no tolerance
  }

  test("matches built-in on 90%-constant data (hot value spans partitions)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // one value owns 90% of rows: a range partitioner without the
    // tie-breaker would pin it to one partition; with it the runs split
    // and the rank arithmetic must still find the right statistics
    val vals = (1 to 20000).map(i =>
      if (i % 10 == 0) rnd.nextDouble() * 100 else 42.0)
    val df = vals.toDF("v").repartition(8)
    val qs = Seq(0.01, 0.049, 0.5, 0.9, 0.951)
    assert(OrderStat.exactPercentiles(df, "v", qs).toSeq ==
      builtin(df, "v", qs).toSeq)
  }

  test("single row, empty input, and null handling") {
    val s = spark
    import s.implicits._
    val one = Seq(3.5).toDF("v")
    assert(OrderStat.exactPercentiles(one, "v", Seq(0.0, 0.3, 1.0)).toSeq ==
      Seq(3.5, 3.5, 3.5))
    val empty = Seq.empty[Double].toDF("v")
    assert(OrderStat.exactPercentiles(empty, "v", Seq(0.5))
      .forall(_.isNaN))
    // nulls ignored, like the built-in
    val withNulls = Seq(Some(1.0), None, Some(2.0), None, Some(3.0))
      .toDF("v")
    assert(OrderStat.exactPercentiles(withNulls, "v", Seq(0.5)).toSeq ==
      Seq(2.0))
  }

  test("weightedMedian: cumulative-weight rule, unit-weight degeneration, groups") {
    val s = spark; import s.implicits._
    import graft.agg.OrderStat
    // g1: values 1..4 with weights 1,1,5,1 -> total 8, median = 3
    // (cum at 3 is 7 >= 4); g2 unit weights over 1..4 -> lower median 2
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 2.0, 1L), ("g1", 3.0, 5L), ("g1", 4.0, 1L),
      ("g2", 1.0, 1L), ("g2", 2.0, 1L), ("g2", 3.0, 1L), ("g2", 4.0, 1L)
    ).toDF("g", "v", "w")
    val out = OrderStat.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("g1") == ((8L, 3.0)))
    assert(out("g2") == ((4L, 2.0)))
    // a dominant weight pins the median to its value
    val dom = Seq(("g", 10.0, 1L), ("g", 99.0, 100L), ("g", 500.0, 1L))
      .toDF("g", "v", "w")
    assert(OrderStat.weightedMedian(dom, "g", "v", "w")
      .head().getDouble(2) == 99.0)
    // duplicate values pool their weights; nulls drop
    val dup = Seq(("g", 5.0, 2L), ("g", 5.0, 2L), ("g", 1.0, 3L))
      .toDF("g", "v", "w")
    assert(OrderStat.weightedMedian(dup, "g", "v", "w")
      .head().getDouble(2) == 5.0)
  }

  test("groupMedianMad: interpolation, MAD, nulls, ties, layout invariance") {
    val s = spark; import s.implicits._
    import graft.agg.OrderStat
    // odd: {1,3,10} -> med 3, devs {2,0,7} -> mad 2
    // even: {1,2,4,10} -> med (2+4)/2 = 3, devs {2,1,1,7} sorted
    //   {1,1,2,7} -> mad (1+2)/2 = 1.5
    // const: all equal -> mad 0; null: ignored
    val df = Seq(
      ("odd", Some(1.0)), ("odd", Some(3.0)), ("odd", Some(10.0)),
      ("even", Some(1.0)), ("even", Some(2.0)), ("even", Some(4.0)),
      ("even", Some(10.0)),
      ("const", Some(7.0)), ("const", Some(7.0)), ("const", Some(7.0)),
      ("odd", None)
    ).toDF("g", "v")
    val out = OrderStat.groupMedianMad(df, "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("odd") == ((3L, 3.0, 2.0)))
    assert(out("even") == ((4L, 3.0, 1.5)))
    assert(out("const") == ((3L, 7.0, 0.0)))
    // tied values pool multiplicity: {2,2,2,9} -> med 2, mad 0 (devs
    // {0,0,0,7}, middle two both 0)
    val tied = Seq(("g", 2.0), ("g", 2.0), ("g", 2.0), ("g", 9.0))
      .toDF("g", "v")
    val t = OrderStat.groupMedianMad(tied, "g", "v").head()
    assert(t.getDouble(2) == 2.0 && t.getDouble(3) == 0.0)
    // layout invariance
    val again = OrderStat.groupMedianMad(df.repartition(7), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(again == out)
  }
}
