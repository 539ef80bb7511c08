package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does AQE actually reuse the duplicated scalar-subquery
  * pipeline (TPC-H Q15 shape: rev joined with max-over-rev) at RUNTIME?
  * Static explain can't show it — exchange/stage reuse under AQE is
  * resolved during execution — so run the query and inspect the final
  * adaptive plan for ReusedExchange / table-cache style sharing, and
  * count the parquet scans that really executed. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries("q26_scalar_max")(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"REUSE-PROBE reusedExchange=${plan.contains("ReusedExchange")}")
    println(s"REUSE-PROBE reusedStage=${plan.contains("ReusedQueryStage")}")
    println(s"REUSE-PROBE scans=${"Scan parquet".r.findAllIn(plan).size}")
    val stages = "ShuffleQueryStage \\d+".r.findAllIn(plan).toSeq
    println(s"REUSE-PROBE shuffleStages=${stages.mkString(",")}")
    // why: diff the canonicalized shuffle-exchange subtrees (no AQE)
    val spark2 = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("reuse-probe-noaqe")
      .getOrCreate()
    val df2 = graft.SparkEntry.queries("q26_scalar_max")(spark2, d)
    val p2 = df2.queryExecution.executedPlan
    println(s"REUSE-PROBE noAqeReused=${p2.toString.contains("ReusedExchange")}")
    val exs = p2.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exs.zipWithIndex.foreach { case (e, i) =>
      println(s"REUSE-PROBE exchange $i canonical-hash=${e.canonicalized.hashCode}")
      println(e.canonicalized.toString.linesIterator
        .map(l => s"REUSE-PROBE   ex$i| $l").mkString("\n"))
    }
    spark2.stop()
    spark.stop()
  }
}
