package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-fidelity audit: Bench times `df.count()`, but Catalyst prunes
  * under a bare count — unused window expressions vanish and a left
  * join whose right side is aggregate-unique on the join key is
  * eliminated outright. A query whose count-plan is materially smaller
  * than its full plan benches a fraction of its real pipeline (q80's
  * old form timed a distinct-day count, 3x under its true cost). This
  * prints, per query, operator counts under the full plan vs under
  * count(), flagging the queries whose scan/window/join counts shrink. */
object CountPruneAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    def counts(plan: String): (Int, Int, Int) = (
      "Scan parquet".r.findAllIn(plan).size,
      "Window".r.findAllIn(plan).size,
      "Join".r.findAllIn(plan).size)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, d)
          val full = counts(df.queryExecution.executedPlan.toString)
          val cnt = counts(df.groupBy().count()
            .queryExecution.executedPlan.toString)
          if (cnt._1 < full._1 || cnt._2 < full._2 || cnt._3 < full._3)
            println(s"PRUNED $name full(scan,win,join)=$full count=$cnt")
        } catch { case e: Throwable =>
          println(s"ERROR  $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}")
        }
      }
    println("CountPruneAudit done")
    spark.stop()
  }
}
