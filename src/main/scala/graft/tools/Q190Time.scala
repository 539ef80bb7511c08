package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r18): cumulative noop-sink timing of prefixJaccardJoin's
  * stages — base checkpoint, df window, rank window, prefix, candidate
  * join+dedup, verify — so the optimization target is the measured
  * stage, not the guessed one.
  * Run: sbt "runMain graft.tools.Q190Time [sfdir]" */
object Q190Time {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (tauNum, tauDen, k) = (1, 2, 3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, d, "documents")
    def timed(label: String)(df: => DataFrame): Unit = {
      // warm + min of 2 (base is rebuilt per call — each timing stands
      // alone; the deltas between labels are the stage costs)
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.Bench.force(df)
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"[time] $label%-22s ${math.min(once(), once())}%.3f s")
    }
    def base() = docs
      .select(col("doc_id").as("__id"),
        graft.text.TextOps.shingleHashes(col("text"), k).as("__sh"))
      .withColumn("n", size(col("__sh")).cast("long"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    def posting(b: DataFrame) = {
      val wHash = Window.partitionBy(col("h"))
      val wRank = Window.partitionBy(col("__id"))
        .orderBy(col("df").asc, col("h").asc)
      b.select(col("__id"), col("n"), explode(col("__sh")).as("h"))
        .withColumn("df", count(lit(1)).over(wHash))
        .withColumn("rk", row_number().over(wRank).cast("long"))
    }
    def prefix(b: DataFrame) = posting(b)
      .filter(col("rk") <=
        expr(s"n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1"))
      .select(col("__id"), col("h"), col("n"), col("rk"))
    def cand(b: DataFrame) = {
      val p = prefix(b)
      val alpha = expr(s"($tauNum * (a.n + b.n) + ${tauNum + tauDen - 1})" +
        s" div ${tauNum + tauDen}")
      p.as("a").join(p.as("b"),
          col("a.h") === col("b.h") && col("a.__id") < col("b.__id") &&
            lit(tauNum.toLong) * greatest(col("a.n"), col("b.n")) <=
              lit(tauDen.toLong) * least(col("a.n"), col("b.n")) &&
            least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) +
              lit(1L) >= alpha)
        .select(col("a.__id").as("id_1"), col("b.__id").as("id_2"),
          col("a.n").as("n_1"), col("b.n").as("n_2"))
        .distinct()
    }
    def verify(b: DataFrame) = {
      val c = cand(b)
      c.join(b.select(col("__id").as("id_1"), col("__sh").as("__sh1")), "id_1")
        .join(b.select(col("__id").as("id_2"), col("__sh").as("__sh2")), "id_2")
        .withColumn("inter",
          size(array_intersect(col("__sh1"), col("__sh2"))).cast("long"))
        .filter(lit(tauDen.toLong) * col("inter") >=
          lit(tauNum.toLong) * (col("n_1") + col("n_2") - col("inter")))
    }
    timed("base_checkpoint") { base() }
    val b = base()
    timed("posting_windows") { posting(b) }
    timed("prefix") { prefix(b) }
    timed("cand_join_distinct") { cand(b) }
    timed("verify_full") { verify(b) }
    // window decomposition: df window alone (no rank)
    timed("df_window_only") {
      b.select(col("__id"), col("n"), explode(col("__sh")).as("h"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
    }
    // df via groupBy+join instead of window
    timed("df_via_agg_join") {
      val ex = b.select(col("__id"), col("n"), explode(col("__sh")).as("h"))
      val dfs = ex.groupBy("h").agg(count(lit(1)).as("df"))
      ex.join(dfs, "h")
    }
    spark.stop()
  }
}
