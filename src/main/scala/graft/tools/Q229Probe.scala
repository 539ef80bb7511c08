package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 adjudication probe for q229_winnow_candidates' 2.32 soak ratio
  * (r13 verdict: "the round's only new operator whose soak growth has
  * no measured decomposition"): measure the winnowing pipeline's
  * population at each stage at sf0.1 vs target/sf1 — fingerprint rows,
  * distinct fingerprints, rows dropped by the hot-list cap, candidate
  * pairs before/after the minShared filter, and confirmed pairs — plus
  * a timed split of fingerprinting vs the capped self-join, so the
  * COVERAGE pin is a measurement, not a story. Usage:
  * `sbt "runMain graft.tools.Q229Probe"` (needs target/sf1 from a
  * prior ScaleSoak run). */
object Q229Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe(dir: String): Unit = {
      val docs = graft.queries.Tables.documents(spark, dir)
      val fps = graft.dedup.Dedup.winnowedFingerprints(docs, "doc_id",
        "text", k = 3, w = 4)
      val fpRows = fps.count()
      val fpDistinct = fps.select("fp").distinct().count()
      val sizes = fps.groupBy(col("fp")).agg(count(lit(1)).as("sz"))
      val hotFps = sizes.filter(col("sz") > 40).count()
      val droppedRows = sizes.filter(col("sz") > 40)
        .agg(coalesce(sum(col("sz")), lit(0L))).head().getLong(0)
      val pruned = fps.join(
        sizes.filter(col("sz") <= 40).select("fp"), Seq("fp"))
      val rawPairs = pruned.alias("a")
        .join(pruned.alias("b"), col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("n_shared"))
      val candAll = rawPairs.count()
      val candMin2 = rawPairs.filter(col("n_shared") >= 2).count()
      val confirmed = graft.dedup.Dedup.winnowNearDupPairs(docs,
        "doc_id", "text", k = 3, w = 4, threshold = 0.5,
        minShared = 2, maxBucket = 40).count()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def fpOnly() = fps.write.format("noop").mode("overwrite").save()
      def full() = graft.dedup.Dedup.winnowCandidates(docs, "doc_id",
          "text", k = 3, w = 4, minShared = 2, maxBucket = 40)
        .write.format("noop").mode("overwrite").save()
      fpOnly(); full() // warm
      val tFp = math.min(timed(fpOnly()), timed(fpOnly()))
      val tFull = math.min(timed(full()), timed(full()))
      println(f"[q229probe] dir=$dir fpRows=$fpRows " +
        f"fpDistinct=$fpDistinct hotFps=$hotFps droppedRows=$droppedRows " +
        f"candAll=$candAll candMin2=$candMin2 confirmed=$confirmed " +
        f"fingerprint=$tFp%.3fs candidates=$tFull%.3fs")
    }
    probe("/root/testdata/sf0.1")
    probe("target/sf1")
    spark.stop()
  }
}
