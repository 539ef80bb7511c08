package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 adjudication probe for q73_normalized_dedup's 4.74 soak ratio:
  * split the pipeline into (a) the regex normalization projection alone
  * and (b) the full dedup-tag query, at sf0.1 vs target/sf1 — if the
  * growth lives in (a), the ratio is the per-byte regex cost emerging
  * from the fixed floor (data-linear by construction), not a shuffle
  * pathology. Usage: `sbt "runMain graft.tools.Q73Probe"`. */
object Q73Probe {
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
      val bytes = docs.agg(sum(length(col("text")))).head().getLong(0)
      def normOnly() = docs
        .select(col("doc_id"),
          graft.text.TextOps.normalizeText(col("text")).as("n"))
        .write.format("noop").mode("overwrite").save()
      def md5Only() = docs
        .select(col("doc_id"), md5(col("text").cast("binary")).as("k"))
        .write.format("noop").mode("overwrite").save()
      def full() = graft.SparkEntry.queries("q73_normalized_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      normOnly(); md5Only(); full() // warm
      val tn = math.min(timed(normOnly()), timed(normOnly()))
      val tm = math.min(timed(md5Only()), timed(md5Only()))
      val tf = math.min(timed(full()), timed(full()))
      println(f"[q73probe] dir=$dir text_bytes=$bytes " +
        f"norm_only=$tn%.3fs md5_only=$tm%.3fs full=$tf%.3fs")
    }
    probe("/root/testdata/sf0.1")
    probe("target/sf1")
    spark.stop()
  }
}
