package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Spilling-join gate (round-11 verdict item 7; reference
  * `DiskBuildProbeJoinExecutor`, sql_executors.py:456-515): the
  * reference builds its hash side on disk when it outgrows memory. The
  * Spark-native equivalent is the sort-merge join's
  * ExternalAppendOnlyUnsafeRowArray, which spills each key's buffered
  * match rows to disk past a threshold — nothing to build, but the
  * claim "Spark SMJ spills natively" (COVERAGE 📘) deserves a gate:
  * force the spill path with the engine's own thresholds and assert
  * (a) the plan IS a SortMergeJoin, (b) tasks really spilled bytes,
  * (c) the joined result is bit-identical to the unspilled run. */
class SpillJoinSpec extends SparkSpecBase {

  test("SMJ completes and stays exact when its match buffers spill to disk") {
    val s = spark; import s.implicits._
    // asymmetric many-to-many: 40 keys, 2 left dups x 30 right dups.
    // The RIGHT side is what SMJ buffers (and spills); LEFT multiplicity
    // is kept tiny deliberately — each left row re-opens the spilled
    // buffer through a fresh ~MB spill reader, so a left-heavy fixture
    // under forced thresholds exhausts the test JVM heap instead of
    // proving the spill. 2 shuffle partitions bound concurrent sorters.
    val left = (0 until 80).map(i => (i % 40, i)).toDF("k", "lv")
    val right = (0 until 1200).map(i => (i % 40, -i)).toDF("k", "rv")
    def run(): (String, Array[(Int, Long, Long)]) = {
      val j = left.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("lv") + col("rv")).as("sv"))
      (j.queryExecution.executedPlan.toString,
        j.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1))
    }
    val conf = s.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevShuf = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.shuffle.partitions", "2")
    val truth = run() // unspilled SMJ baseline (default thresholds)
    assert(truth._1.contains("SortMergeJoin"),
      "fixture must plan a sort-merge join")
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    s.sparkContext.addSparkListener(listener)
    val prevMem = conf.get("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    val prevSp = conf.get("spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    try {
      // force every buffered match set through the external (spilling)
      // array: >1 row in memory escalates, >2 rows forces a disk spill
      conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "1")
      conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "2")
      val forced = run()
      assert(forced._1.contains("SortMergeJoin"))
      // listener events are async; poll until the spill lands
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spilled.get() > 0L,
        "forced thresholds must actually spill bytes in task metrics")
      assert(forced._2.sameElements(truth._2),
        "spilled join must be bit-identical to the in-memory join")
    } finally {
      conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", prevMem)
      conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", prevSp)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      conf.set("spark.sql.shuffle.partitions", prevShuf)
      s.sparkContext.removeSparkListener(listener)
    }
  }
}
