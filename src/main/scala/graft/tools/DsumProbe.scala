package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: cost of Det.dsum's decimal(25,0) sum vs plain double sum
  * vs candidate cheaper deterministic forms, on the q26 aggregation. */
object DsumProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val li = graft.queries.Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1995-07-01").cast("timestamp_ntz"))
    val v = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val variants: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "plain_double" -> sum(v),
      "dsum128_now" -> graft.functions.Det.dsum(v),
      "dec25_old" -> (sum(bround(v * lit(1e6), 0).cast("decimal(25,0)")).cast("double") / lit(1e6)),
      "dec18" -> (sum(bround(v * lit(1e6), 0).cast("decimal(18,0)")).cast("double") / lit(1e6)),
      "long_sum" -> (sum(bround(v * lit(1e6), 0).cast("long")).cast("double") / lit(1e6)),
      "round_only" -> sum(bround(v * lit(1e6), 0))
    )
    for ((name, agg) <- variants; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.Bench.force(li.groupBy("l_suppkey").agg(agg.as("x")))
      println(f"$name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    // value check: new dsum vs the old decimal form, bit-exact
    val a = li.groupBy("l_suppkey").agg(graft.functions.Det.dsum(v).as("x"))
    val b = li.groupBy("l_suppkey").agg(
      (sum(bround(v * lit(1e6), 0).cast("decimal(25,0)")).cast("double") / lit(1e6)).as("x"))
    val diff = a.join(b, Seq("l_suppkey"))
      .filter(a("x") =!= b("x")).count()
    println(s"value_mismatches: $diff")
    spark.stop()
  }
}
