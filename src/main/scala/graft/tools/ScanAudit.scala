package graft.tools

import org.apache.spark.sql.SparkSession

/** Catalog-wide duplicate-scan audit: builds every driver-catalog query
  * and counts how many times each parquet location appears as a FileScan
  * in the static physical plan. A table scanned twice in one query is
  * the round-9 "derived aggregate joined back to its own pipeline"
  * disease (tpch15/02/09/11/17/18/20 all had it): at 100 TB it doubles
  * the dominant cost. Duplicates are not automatically wrong — a union
  * of branches with DIFFERENT pushed filters/schemas reads different
  * bytes, and a ReusedExchange dedupes at runtime — so this prints the
  * offenders for a human plan-read, it does not assert. */
object ScanAudit {
  private val locPat = "InMemoryFileIndex(?: \\[| ?\\(\\d+ paths?\\)\\[)(file:[^],]*)".r

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
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, d).queryExecution.executedPlan.toString
          val dups = locPat.findAllMatchIn(plan).map(_.group(1)).toSeq
            .groupBy(identity).view.mapValues(_.size).filter(_._2 > 1)
          val reused = "ReusedExchange".r.findAllIn(plan).size
          if (dups.nonEmpty)
            println(s"SCANAUDIT $name reusedExchanges=$reused " +
              dups.toSeq.sorted.map { case (loc, n) =>
                s"${loc.split('/').last}x$n"
              }.mkString(" "))
        } catch {
          case e: Throwable =>
            println(s"SCANAUDIT $name BUILD-ERROR ${e.getMessage}")
        }
      }
    println("SCANAUDIT done")
    spark.stop()
  }
}
