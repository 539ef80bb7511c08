package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.OrderedStream
object AsofPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.1")
    val l = new OrderedStream(ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value"), "ts")
    val r = new OrderedStream(ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value"), "ts")
    val m = graft.ts.AsofJoin.merge(l, r, "user_id")
    m.explain("formatted")
    def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    println(s"MERGE_N=${m.count()}")
    println(s"MERGE_WARM=${time(m.count())}")
    val u = graft.ts.AsofJoin.unionTag(l, r, "user_id").df
    println(s"UNION_N=${u.count()}")
    println(s"UNION_WARM=${time(u.count())}")
    spark.stop()
  }
}
