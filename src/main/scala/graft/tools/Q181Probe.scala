package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 budget re-derivation probe for q181_trailing_distinct (r13
  * verdict item: "3.86 against its pinned ≤4 — the closest any query
  * sits to its ceiling; re-derive the budget from a measured
  * decomposition, Q170Probe style"). Splits the pipeline into its
  * three stages at sf0.1 vs target/sf1 with stage populations:
  *   1. obs    — the (id, bucket) dedup aggregate (keys grow ~10×),
  *   2. cover  — the ×24 explode + per-target distinct count (the
  *               dominant, honestly-10× exchange),
  *   3. full   — + the one-row span agg, grid explode and outer join
  *               (fixed-size overhead at any sf: the grid is the
  *               calendar, not the data).
  * The marginal per-id cost is (full(sf1) − full(sf0.1)) over the key
  * growth; the fixed floor is what the ratio amortizes. Usage:
  * `sbt "runMain graft.tools.Q181Probe"` (needs target/sf1). */
object Q181Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe(dir: String): Unit = {
      val ev = graft.queries.Tables.events(spark, dir)
      val w = 3600L * 1000000L
      val obs = ev.select(col("user_id").as("__id"),
          (unix_micros(col("ts")) / w).cast("long").as("__b"))
        .groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__n"))
      val cover = obs.select(col("__id"),
        explode(expr("sequence(__b, __b + 23)")).as("__t"))
      val counts = cover.groupBy(col("__t"))
        .agg(count_distinct(col("__id")).as("n_ids"))
      val nObs = obs.count()
      val nCover = cover.count()
      val nBucketsOut = counts.count()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def s1() = obs.write.format("noop").mode("overwrite").save()
      def s2() = counts.write.format("noop").mode("overwrite").save()
      def full() = graft.ts.Trailing.trailingCounts(ev, "ts", "user_id",
          widthSec = 3600L, nBuckets = 24)
        .write.format("noop").mode("overwrite").save()
      s1(); s2(); full() // warm
      val t1 = math.min(timed(s1()), timed(s1()))
      val t2 = math.min(timed(s2()), timed(s2()))
      val tf = math.min(timed(full()), timed(full()))
      println(f"[q181probe] dir=$dir obs=$nObs cover=$nCover " +
        f"buckets=$nBucketsOut obsAgg=$t1%.3fs coverDistinct=$t2%.3fs " +
        f"full=$tf%.3fs")
    }
    probe("/root/testdata/sf0.1")
    probe("target/sf1")
    spark.stop()
  }
}
