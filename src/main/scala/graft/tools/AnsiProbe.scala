package graft.tools
/** Dev probe: ANSI default + overflow behavior on this Spark build. */
object AnsiProbe {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ANSI=" + spark.conf.get("spark.sql.ansi.enabled"))
    import spark.implicits._
    try {
      val r = Seq((4000000000L, 4000000000L)).toDF("a", "b")
        .selectExpr("a*b*a*b as x").collect()
      println("long overflow result: " + r(0).getLong(0))
    } catch { case e: Throwable =>
      println("long overflow THREW: " + e.getClass.getName) }
    try {
      val r = Seq(1).toDF("i").selectExpr(
        "cast(99999999999999999999999999999999999999 as decimal(38,0)) * cast(99 as decimal(38,0)) as x")
        .collect()
      println("decimal overflow result: " + r(0).get(0))
    } catch { case e: Throwable =>
      println("decimal overflow THREW: " + e.getClass.getName) }
    spark.stop()
  }
}
