package graft.tools

import graft.api.OrderedStream
import graft.ts.AsofJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev cross-check: the two as-of join formulations (union-tag window vs
  * cogroup merge) must agree row-for-row. Run:
  *   sbt "runMain graft.tools.CrossCheck /root/testdata/sf0.001" */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.queries.Tables.events(spark, d)
    val trades = new OrderedStream(
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value"), "ts")
    val quotes = new OrderedStream(
      ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value"), "ts")
    val a = AsofJoin.unionTag(trades, quotes, "user_id").df
    val b = AsofJoin.coGrouped(trades, quotes, "user_id")
    val na = a.count(); val nb = b.count()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"CROSSCHECK asof unionTag=$na cogroup=$nb symmetricDiff=$diff " +
      (if (na == nb && diff == 0) "AGREE" else "DISAGREE"))
    spark.stop()
  }
}
