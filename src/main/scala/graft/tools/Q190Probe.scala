package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the exact set-similarity join (r18): candidate-pair
  * counts at each pruning tier of prefixJaccardJoin — prefix collisions,
  * pairs after the per-collision position filter, pairs after the
  * grouped accumulated-overlap bound, verified pairs — so a pruning
  * change's effect is a measured count, not a guess.
  * Run: sbt "runMain graft.tools.Q190Probe [sfdir [tauNum tauDen k]]" */
object Q190Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tauNum = args.lift(1).map(_.toInt).getOrElse(1)
    val tauDen = args.lift(2).map(_.toInt).getOrElse(2)
    val k = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, d, "documents")
    val base = docs
      .select(col("doc_id").as("__id"),
        graft.text.TextOps.shingleHashes(col("text"), k).as("__sh"))
      .withColumn("n", size(col("__sh")).cast("long"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    val wHash = Window.partitionBy(col("h"))
    val wRank = Window.partitionBy(col("__id"))
      .orderBy(col("df").asc, col("h").asc)
    val posting = base
      .select(col("__id"), col("n"), explode(col("__sh")).as("h"))
      .withColumn("df", count(lit(1)).over(wHash))
      .withColumn("rk", row_number().over(wRank).cast("long"))
    val prefixLen =
      expr(s"n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1")
    val prefix = posting.filter(col("rk") <= prefixLen)
      .select(col("__id"), col("h"), col("n"), col("rk"))
    println(s"[probe] docs=${base.count()} postings=${posting.count()} " +
      s"prefix_postings=${prefix.count()}")
    val alpha = expr(s"($tauNum * (a.n + b.n) + ${tauNum + tauDen - 1})" +
      s" div ${tauNum + tauDen}")
    val sizeOk = lit(tauNum.toLong) * greatest(col("a.n"), col("b.n")) <=
      lit(tauDen.toLong) * least(col("a.n"), col("b.n"))
    val posOk = least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) +
      lit(1L) >= alpha
    val joined0 = prefix.as("a").join(prefix.as("b"),
      col("a.h") === col("b.h") && col("a.__id") < col("b.__id") && sizeOk)
    println(s"[probe] collisions_size_filtered=${joined0.count()} " +
      s"pairs_size_filtered=${joined0.select("a.__id", "b.__id").distinct().count()}")
    val joined = prefix.as("a").join(prefix.as("b"),
      col("a.h") === col("b.h") && col("a.__id") < col("b.__id") &&
        sizeOk && posOk)
      .select(col("a.__id").as("id_1"), col("b.__id").as("id_2"),
        col("a.n").as("n_1"), col("b.n").as("n_2"),
        col("a.rk").as("__rk1"), col("b.rk").as("__rk2"))
    println(s"[probe] collisions_pos_filtered=${joined.count()} " +
      s"pairs_pos_filtered=${joined.select("id_1", "id_2").distinct().count()}")
    val alphaOut = expr(s"($tauNum * (n_1 + n_2) + ${tauNum + tauDen - 1})" +
      s" div ${tauNum + tauDen}")
    val grouped = joined
      .groupBy(col("id_1"), col("id_2"), col("n_1"), col("n_2"))
      .agg(count(lit(1)).as("__cnt"),
        max(col("__rk1")).as("__lrk1"), max(col("__rk2")).as("__lrk2"))
      .filter(col("__cnt") +
        least(col("n_1") - col("__lrk1"), col("n_2") - col("__lrk2")) >=
        alphaOut)
    println(s"[probe] pairs_grouped_bound=${grouped.count()}")
    val out = graft.dedup.SetSimJoin.prefixJaccardJoin(docs, "doc_id",
      "text", tauNum, tauDen, k)
    println(s"[probe] verified_pairs=${out.count()}")
    spark.stop()
  }
}
