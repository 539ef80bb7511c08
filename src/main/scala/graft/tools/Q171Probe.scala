package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 decomposition probe for q171 (the round's most expensive gate,
  * 3.8 s min-of-3 at sf0.1): times each stage under the bench session
  * shape — the per-rep IVF REBUILD (`Ann.ivfJoin`, which k-means-fits
  * the quantizer from scratch), the stored-index probe, the exact
  * brute-force recall baseline, and the full gate.
  * Usage: `sbt "runMain graft.tools.Q171Probe"`. */
object Q171Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.queries.Tables.embeddings(spark, d)
    emb.count()
    val probes = emb.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id")

    def timed(tag: String)(f: => Unit): Unit = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = math.min(once(), once())
      println(f"[q171probe] $tag%-34s ${s}%7.3f s (min-of-2 warm)")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // the MLlib fit the r17 sampled-Lloyd's quantizer REPLACED — kept
    // as the measured yardstick of what each refit used to cost
    timed("kmeans fit only (old MLlib path)") {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val feat = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("__arr"))
        .withColumn("__feat", array_to_vector(col("__arr")))
      new KMeans().setK(8).setSeed(42L)
        .setFeaturesCol("__feat").setPredictionCol("__cell").fit(feat)
      ()
    }
    timed("ivfJoin rebuild (fit+probe)") {
      force(graft.vector.Ann.ivfJoin(emb, probes, "embedding", "vec_id",
        "probe_id", k = 10, nlist = 8, nprobe = 3, seed = 42L))
    }
    timed("exact brute-force NN") {
      force(graft.vector.VectorOps.nnJoin(emb, probes, "embedding",
        "vec_id", "probe_id", k = 10))
    }
    timed("full q171 gate") {
      force(graft.SparkEntry.queries("q171_ivf_persistent")(spark, d))
    }
    spark.stop()
  }
}
