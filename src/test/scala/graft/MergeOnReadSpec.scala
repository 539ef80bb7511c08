package graft

import graft.sources.MergeOnRead
import org.apache.spark.sql.functions._

/** Merge-on-read upsert/delete over snapshot tables: latest-wins
  * resolution, tombstones, reinstatement, time travel, compaction,
  * and the keyed diff. */
class MergeOnReadSpec extends SparkSpecBase {

  private def rows(xs: (Long, String)*) = {
    val s = spark
    import s.implicits._
    xs.toDF("id", "v")
  }

  private def resolved(dir: String, snap: Option[Long] = None): Map[Long, String] =
    MergeOnRead.readMerged(spark, dir, "id", snap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert supersedes, tombstones delete, later upsert reinstates") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    MergeOnRead.upsert(rows(1L -> "a1", 2L -> "b1", 3L -> "c1"), dir, "id")
    MergeOnRead.upsert(rows(2L -> "b2", 4L -> "d2"), dir, "id")
    MergeOnRead.delete(Seq(3L, 4L, 99L).toDF("id"), dir, "id") // 99: no-op
    assert(resolved(dir) == Map(1L -> "a1", 2L -> "b2"))
    // time travel: every earlier state stays resolvable
    assert(resolved(dir, Some(1L)) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
    assert(resolved(dir, Some(2L)) ==
      Map(1L -> "a1", 2L -> "b2", 3L -> "c1", 4L -> "d2"))
    // reinstate a deleted key
    MergeOnRead.upsert(rows(3L -> "c4"), dir, "id")
    assert(resolved(dir) == Map(1L -> "a1", 2L -> "b2", 3L -> "c4"))
  }

  test("compact folds versions without changing the resolved state") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    MergeOnRead.upsert(rows(1L -> "a1", 2L -> "b1"), dir, "id")
    MergeOnRead.upsert(rows(2L -> "b2"), dir, "id")
    MergeOnRead.delete(Seq(1L).toDF("id"), dir, "id")
    val before = resolved(dir)
    val cid = MergeOnRead.compact(spark, dir, "id")
    assert(resolved(dir) == before && before == Map(2L -> "b2"))
    // compacted snapshot pins ONE data dir; pre-compaction history lives
    assert(graft.sources.Snapshots.history(spark, dir)
      .filter(col("snapshot_id") === cid)
      .head().getAs[Int]("n_data_dirs") == 1)
    assert(resolved(dir, Some(2L)) == Map(1L -> "a1", 2L -> "b2"))
  }

  test("duplicate keys in a mutation batch are rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    val e = intercept[IllegalArgumentException] {
      MergeOnRead.upsert(rows(1L -> "x", 1L -> "y"), dir, "id")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("diff sees a value moving across a null-column boundary") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    // (v, w) = (null, "en") -> ("en", null): a null-skipping digest
    // would hash both states identically and hide the change
    MergeOnRead.upsert(
      Seq((1L, Option.empty[String], Option("en"))).toDF("id", "v", "w"),
      dir, "id")
    MergeOnRead.upsert(
      Seq((1L, Option("en"), Option.empty[String])).toDF("id", "v", "w"),
      dir, "id")
    val got = MergeOnRead.diff(spark, dir, "id", 1L, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed"))
  }

  test("diff digest is injective under embedded separators") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    // ("a|b", "c") vs ("a", "b|c"): a separator-joined digest would
    // collide; per-column hashing must see the change
    MergeOnRead.upsert(Seq((1L, "a|b", "c")).toDF("id", "v", "w"), dir, "id")
    MergeOnRead.upsert(Seq((1L, "a", "b|c")).toDF("id", "v", "w"), dir, "id")
    val got = MergeOnRead.diff(spark, dir, "id", 1L, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed"))
  }

  test("diff reports added/removed/changed and omits identical keys") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor").toString
    MergeOnRead.upsert(rows(1L -> "same", 2L -> "old", 3L -> "gone"), dir, "id")
    MergeOnRead.upsert(rows(2L -> "new", 4L -> "born"), dir, "id")
    MergeOnRead.delete(Seq(3L).toDF("id"), dir, "id")
    val got = MergeOnRead.diff(spark, dir, "id", 1L, 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshot schema evolution: merged read nulls old rows, strict read refuses") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("snap_evolve").toString
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("k", "x"), dir)
    Snapshots.write(Seq((3L, "c", 30L)).toDF("k", "x", "y"), dir,
      mode = "append")
    val merged = Snapshots.read(spark, dir, mergeSchema = true)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(merged.toSeq == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L))))
    // the strict default refuses the skewed commits loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Snapshots.read(spark, dir)
    }
    // time travel to v1 still reads the old schema untouched
    assert(Snapshots.read(spark, dir, Some(1L)).columns.toSeq == Seq("k", "x"))
  }

  test("snapshot readStream consumes commits incrementally, refuses overwrites") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("snap_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snap_stream_ck").toString
    Snapshots.write((1L to 5L).map(i => (i, s"a$i")).toDF("k", "x"), dir)
    val sink = java.nio.file.Files.createTempDirectory("snap_stream_out").toString
    def drain(): Long = {
      val q = Snapshots.readStream(s, dir).writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val n = q.recentProgress.map(_.numInputRows).sum
      q.stop(); n
    }
    assert(drain() == 5L)
    Snapshots.write((6L to 8L).map(i => (i, s"a$i")).toDF("k", "x"), dir,
      mode = "append")
    // checkpointed second drain reads ONLY the new commit's rows
    assert(drain() == 3L)
    assert(s.read.parquet(sink).count() == 8L)
    // an overwrite commit poisons the stream contract -> loud refusal
    Snapshots.write(Seq((9L, "z")).toDF("k", "x"), dir)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.readStream(s, dir)
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("expire keeps append-referenced ancestor dirs, drops the rest") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("snap_expire").toString
    val root = java.nio.file.Paths.get(dir)
    Snapshots.write(Seq((1L, "a")).toDF("k", "x"), dir)                  // v1
    Snapshots.write(Seq((2L, "b")).toDF("k", "x"), dir, mode = "append") // v2 refs v1
    Snapshots.write(Seq((3L, "c")).toDF("k", "x"), dir, mode = "append") // v3 refs v1,v2
    // keepLast=1: v1/v2 manifests expire, but v3 references BOTH their
    // data dirs — zero dirs may be deleted
    val (m, dd) = Snapshots.expire(dir, 1)
    assert(m == 2 && dd == 0)
    assert(java.nio.file.Files.exists(root.resolve("data/v1")))
    assert(Snapshots.read(s, dir).count() == 3L)
    assert(Snapshots.history(s, dir).count() == 1L) // surviving tail
    // overwrite then expire: the orphaned lineage's dirs all go
    Snapshots.write(Seq((9L, "z")).toDF("k", "x"), dir) // v4 overwrite
    val (m2, dd2) = Snapshots.expire(dir, 1)
    assert(m2 == 1 && dd2 == 3)
    assert(!java.nio.file.Files.exists(root.resolve("data/v1")))
    assert(Snapshots.read(s, dir).as[(Long, String)].collect().toSet ==
      Set((9L, "z")))
    // below-horizon time travel fails loudly
    val ex = intercept[IllegalArgumentException] {
      Snapshots.read(s, dir, Some(3L))
    }
    assert(ex.getMessage.contains("does not exist"))
    // keepLast must be >= 1
    intercept[IllegalArgumentException] { Snapshots.expire(dir, 0) }
  }

  test("snapshot readStream refuses hive-partitioned tables loudly") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    // partitioned layout nests files under data/v1/p=…/ — the flat
    // data/* stream glob would miss the partition column (it exists
    // only in dir names), so construction must refuse, not misread
    val dir = java.nio.file.Files.createTempDirectory("snap_part").toString
    Snapshots.write(Seq((1L, "a", 0), (2L, "b", 1)).toDF("k", "x", "p"),
      dir, partitionBy = Seq("p"))
    val ex = intercept[IllegalArgumentException] {
      Snapshots.readStream(s, dir)
    }
    assert(ex.getMessage.contains("UNPARTITIONED"))
  }
}
