package graft.tools

import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // override for scale profiling (e.g. target/sf1, the 10x soak copy)
    val d = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.explain("formatted")
      val t0 = System.nanoTime(); df.count()
      println(s"--- ${q} time: ${(System.nanoTime()-t0)/1e9}")
      val t1 = System.nanoTime(); df.count()
      println(s"--- ${q} time2: ${(System.nanoTime()-t1)/1e9}")
    }
    spark.stop()
  }
}
