package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stream-stream outer-join emission against the events
  * fixture — prints per-batch input rows + watermark and the final
  * count, the diagnostics that caught the filter-pushdown-kills-
  * sentinel bug (a left-column filter below the left EventTimeWatermark
  * node froze the watermark at the last real purchase).
  * Run: sbt "runMain graft.tools.SsjProbe [sfdir]" */
object SsjProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.queries.GateQueries.q198Plan(spark, d)
    val q = plan.writeStream.format("memory").queryName("probe")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach(p => println(
      s"batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime}"))
    println("TOTAL=" + spark.table("probe")
      .filter(col("user_id") >= 0).count())
    spark.stop()
  }
}
