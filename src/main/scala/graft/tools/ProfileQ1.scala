package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: decompose tpch01's wall time into scan / raw-sum /
  * dsum128 components at sf0.1. Throwaway harness, not a driver surface. */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    println("rows: " + li.count())
    time("scan-only") { force(li.select("l_extendedprice", "l_discount", "l_tax",
      "l_quantity", "l_shipdate", "l_returnflag", "l_linestatus")) }
    val fil = li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
    time("raw-sums") { force(fil.agg(
      sum("l_quantity").as("a"), sum("l_extendedprice").as("b"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
      avg("l_quantity").as("e"), avg("l_extendedprice").as("f"),
      avg("l_discount").as("g"), count(lit(1)).as("h"))) }
    time("dsum128") { force(fil.agg(
      sum("l_quantity").as("a"),
      graft.functions.Det.dsum(col("l_extendedprice")).as("b"),
      graft.functions.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
      graft.functions.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
      avg("l_quantity").as("e"),
      graft.functions.Det.davg(col("l_extendedprice")).as("f"),
      graft.functions.Det.davg(col("l_discount")).as("g"),
      count(lit(1)).as("h"))) }
    time("full-tpch01") { force(graft.SparkEntry.queries("tpch01")(spark, "/root/testdata/sf0.1")) }
    time("full-q1agg") { force(graft.SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.1")) }
    spark.stop()
  }
}
