package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 decomposition probe for the q176 sf1 soak-ratio move (1.07 →
  * 2.40 after the sampled-quantizer change): prints the coarse-cell
  * occupancy histogram of `Ann.fitQuantizer` (sampled driver Lloyd's)
  * vs an MLlib full-table fit at each fixture, plus the stage times of
  * the PQ probe path. Usage:
  * `sbt "runMain graft.tools.Q176Probe [sfdir ...]"`. */
object Q176Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "target/sf1")
    for (d <- dirs) {
      val emb = graft.queries.Tables.embeddings(spark, d)
      val n = emb.count()
      println(s"=== $d rows=$n")
      // the q176 shape: build a PQ index, decompose the gate's stages
      locally {
        val pqDir = java.nio.file.Files
          .createTempDirectory("q176probe_pq").toString
        graft.vector.PqIndex.build(emb, "embedding", "vec_id", pqDir,
          nlist = 8, m = 16, dim = 64, seed = 42L)
        val probes = emb.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "probe_id")
        def t(tag: String)(f: => Unit): Unit = {
          f // warm
          val t0 = System.nanoTime(); f
          val t1 = System.nanoTime(); f
          println(f"[q176probe] $d $tag%-22s ${
            math.min((t1 - t0), (System.nanoTime() - t1)) / 1e9}%7.3f s")
        }
        def force(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.mode("overwrite").format("noop").save()
        t("pq probe") {
          force(graft.vector.PqIndex.probe(probes, "embedding",
            "probe_id", pqDir, k = 10, nprobe = 4))
        }
        t("brute nnJoin") {
          force(graft.vector.VectorOps.nnJoin(emb, probes, "embedding",
            "vec_id", "probe_id", k = 10))
        }
        t("full q176 gate") {
          force(graft.SparkEntry.queries("q176_ivf_pq")(spark, d))
        }
      }
      for (nlist <- Seq(8, 16)) {
        val dir = java.nio.file.Files
          .createTempDirectory("q176probe_ivf").toString
        graft.vector.IvfIndex.build(emb, "embedding", "vec_id", dir,
          nlist = nlist, seed = 42L)
        val hist = graft.sources.Snapshots
          .read(spark, s"$dir/assignments", None)
          .groupBy(col("cell")).count()
          .orderBy(desc("count")).collect()
          .map(r => r.getLong(1)).toSeq
        println(s"[q176probe] $d nlist=$nlist sampled-Lloyd cells: " +
          s"${hist.mkString(",")} (max/mean=${
            f"${hist.max.toDouble * hist.length / hist.sum}%.2f"})")
        // the replaced MLlib full-table fit, for balance comparison
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val feat = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("__arr"))
          .withColumn("__feat", array_to_vector(col("__arr")))
        val model = new KMeans().setK(nlist).setSeed(42L)
          .setFeaturesCol("__feat").setPredictionCol("__cell").fit(feat)
        val h2 = model.transform(feat).groupBy(col("__cell")).count()
          .orderBy(desc("count")).collect().map(_.getLong(1)).toSeq
        println(s"[q176probe] $d nlist=$nlist MLlib-fit cells:     " +
          s"${h2.mkString(",")} (max/mean=${
            f"${h2.max.toDouble * h2.length / h2.sum}%.2f"})")
      }
    }
    spark.stop()
  }
}
