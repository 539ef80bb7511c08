package graft

import graft.vector.{Ann, IvfIndex, VectorOps}
import org.apache.spark.sql.functions._

/** Persistent IVF index: build/probe, version pinning, rebuild
  * semantics (vector.IvfIndex over the Snapshots layer). */
class IvfIndexSpec extends SparkSpecBase {

  private def emb() =
    spark.read.parquet(sf() + "/embeddings.parquet")

  test("stored probe equals the per-query-refit ivfJoin row for row") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_eq").toString
    val v = IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 8)
    assert(v == 1L)
    assert(IvfIndex.currentVersion(dir).contains(1L))
    val stored = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val refit = Ann.ivfJoin(e, probes, "embedding", "vec_id", "probe_id",
        k = 5, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(stored == refit)
    // probing again reads the same snapshot: identical rows, HEAD still v1
    val again = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(again == stored)
    assert(IvfIndex.currentVersion(dir).contains(1L))
  }

  test("rebuild bumps the version; old version stays probeable (time travel)") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_tt").toString
    IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 8)
    val v1 = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rebuild with a different quantizer: new snapshot, HEAD moves
    val v2id = IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 4)
    assert(v2id == 2L && IvfIndex.currentVersion(dir).contains(2L))
    // pinned v1 probe reproduces the original result exactly
    val v1again = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3, snapshotId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1again == v1)
    // HEAD probe uses the v2 quantizer — structurally valid (self found)
    val v2 = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert((0L until 5L).forall(p => v2.contains((p, p))),
      "self-match must land in its own cell at any index version")
  }

  test("append assigns to existing centroids; both versions stay probeable") {
    val e = emb()
    val base = e.filter(col("vec_id") >= 5)
    val batch = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_append").toString
    assert(IvfIndex.build(base, "embedding", "vec_id", dir, nlist = 8) == 1L)
    assert(IvfIndex.append(batch, "embedding", "vec_id", dir) == 2L)
    assert(IvfIndex.currentVersion(dir).contains(2L))
    // appended vectors probe to themselves: assignment uses the probe
    // side's own cell ranking, so a fresh vector's cell IS its rank-1
    // probed cell
    val probes = batch.withColumnRenamed("vec_id", "probe_id")
    val got = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert((0L until 5L).forall(p => got.contains((p, p))))
    // the old version does NOT contain the appended batch (time travel)
    val v1 = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 3, nprobe = 2, snapshotId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!(0L until 5L).exists(p => v1.contains((p, p))))
    // exactly-once: every vector assigned exactly once at HEAD
    val n = graft.sources.Snapshots
      .read(spark, s"$dir/assignments", Some(2L)).count()
    assert(n == e.count())
  }

  test("partition-pruned probe equals the unpruned plan and prunes the scan") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_prune").toString
    IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 8)
    def run(prune: Boolean) = IvfIndex.probe(probes, "embedding",
      "probe_id", dir, k = 5, nprobe = 2, prunePartitions = prune)
    val pruned = run(true)
    val unpruned = run(false)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet ==
      unpruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet)
    // the pruned plan's scan carries a partition filter on cell
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"expected a cell partition filter in:\n$plan")
  }

  test("delete-and-rebuild at the same path is never served stale (memo)") {
    // r16 review finding: the open-index-handle memo keyed (dir, id)
    // alone would serve the DELETED index's CENTROIDS after rm -rf +
    // rebuild (snapshot ids restart at 1). Only centroids are
    // memoized — assignments re-read fresh — so the decisive pins are
    // (a) the commit token itself must change across the rebuild (the
    // memo key's mechanism) and (b) a LOW-nprobe probe, whose cell
    // choice is a pure function of the centroids, must equal a fresh
    // refit over the rebuilt population (stale even-fit centroids
    // would route probes to the wrong odd-index cells).
    val e = emb()
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_rebuild").toString
    IvfIndex.build(e.filter(col("vec_id") % 2 === 0), "embedding",
      "vec_id", dir, nlist = 4, seed = 1L)
    val tokBefore = graft.sources.Snapshots.commitToken(
      s"$dir/centroids", 1L)
    IvfIndex.probe(probes, "embedding", "probe_id", dir,
      k = 5, nprobe = 1).collect() // populate the memo
    // wipe and rebuild at the SAME path over the ODD ids only
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rm)); p.delete()
    }
    rm(new java.io.File(dir))
    val odd = e.filter(col("vec_id") % 2 === 1)
    IvfIndex.build(odd, "embedding", "vec_id", dir, nlist = 4, seed = 1L)
    val tokAfter = graft.sources.Snapshots.commitToken(
      s"$dir/centroids", 1L)
    assert(tokBefore != tokAfter,
      "commit token did not change across delete-and-rebuild — the " +
        "memo key cannot distinguish the rebuilt index")
    val after = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // must equal a fresh refit over the odd population (same seed,
    // same kmeans) — served-stale centroids route cells differently
    val refit = Ann.ivfJoin(odd, probes, "embedding", "vec_id",
        "probe_id", k = 5, nlist = 4, nprobe = 1, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(after == refit)
    assert(after.forall { case (_, id, _) => id % 2 == 1 })
  }

  test("probing an empty index directory fails loudly") {
    val e = emb().filter(col("vec_id") < 3)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_none").toString
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.probe(e, "embedding", "probe_id", dir, k = 3)
    }
    assert(ex.getMessage.contains("no IVF index"))
  }

  test("stored probe recall vs brute force clears the q171 floor") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_recall").toString
    IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 8)
    val exact = VectorOps.nnJoin(e, probes, "embedding", "vec_id",
        "probe_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = IvfIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect stored).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("filtered probe: pre-filter semantics fill k valid results") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec_filtered").toString
    IvfIndex.build(e, "embedding", "vec_id", dir, nlist = 4)
    val allowed = e.filter(col("label") % 2 === 0).select(col("vec_id"))
    val out = IvfIndex.probeFiltered(probes, "embedding", "probe_id",
        dir, k = 5, allowed, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every result satisfies the predicate
    val even = e.filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.forall { case (_, id) => even(id) })
    // pre-filter fills k per probe (all 4 cells probed, plenty of
    // even-label vectors) — a post-filter over an unfiltered top-5
    // would drop below k wherever odd labels crowd the head
    out.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.size == 5, s"probe $p returned ${rs.size} of k=5")
    }
    // nprobe = all cells + filter == brute force over the filtered set
    val exactF = VectorOps.nnJoin(e.filter(col("label") % 2 === 0),
        probes, "embedding", "vec_id", "probe_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.toSet == exactF)
    // filterIds must be a single-column relation
    intercept[IllegalArgumentException] {
      IvfIndex.probeFiltered(probes, "embedding", "probe_id", dir,
        k = 5, e.select("vec_id", "label"), nprobe = 4)
    }
  }
}
