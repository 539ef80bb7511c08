package graft.tools

import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // override for scale profiling (e.g. target/sf1, the 10x soak copy)
    val d = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, d).explain("formatted")
      // time construction + Bench.force (noop write), exactly what
      // Bench.timeOnce does: streaming gates run their whole bounded
      // stream AT construction, and the noop sink keeps Catalyst from
      // count-pruning windows/joins out of the timed plan
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(q)(spark, d))
        println(s"--- ${q} full$rep: ${(System.nanoTime()-t0)/1e9}")
      }
    }
    spark.stop()
  }
}
