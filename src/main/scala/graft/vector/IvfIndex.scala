package graft.vector

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT IVF ANN index — the stored-index half of the reference's
  * Lance IVF_PQ pushdown (pyquokka/df.py:1264-1318 probes a *stored*
  * index built by datastream.py:454-476; `Ann.ivfJoin` covers the
  * algorithm but re-trains the quantizer per query). The index is two
  * [[Snapshots]] tables under one directory, so it inherits snapshot
  * semantics for free: rebuilds are new snapshot versions, probes can
  * pin an index version (time travel), and a rebuild racing a probe is
  * the snapshot layer's already-proven commit protocol.
  *
  * {{{
  *   <dir>/centroids/    (cell int, centroid array<double>)   — nlist rows
  *   <dir>/assignments/  (id long, cell int, nvec array<double>)
  * }}}
  *
  * Scale design: the k-means fit and cell assignment are paid ONCE at
  * build; every probe reads the tiny centroid table (bounded driver
  * metadata, like OrderStat's picked ranks), ranks its nprobe cells as
  * literal-centroid expressions, and hash-joins the assignment table on
  * `cell` — the per-probe cost of `Ann.ivfJoin` minus the training.
  * The assignment table is written partitioned by nothing but read
  * through a cell-keyed join, so at 100 TB the natural refinement is a
  * cell-bucketed write; the snapshot layer already supports committing
  * that layout. */
object IvfIndex {

  /** Fit the coarse quantizer and persist centroids + assignments as
    * one index version. Returns the snapshot id (identical for both
    * tables — enforced). */
  def build(data: DataFrame, vecCol: String, idCol: String, dir: String,
      nlist: Int = 16, seed: Long = 42L): Long = {
    val spark = data.sparkSession
    val (assigned, centers) = Ann.fitQuantizer(data, vecCol, idCol, nlist, seed)
    import spark.implicits._
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val aId = Snapshots.write(
      assigned.select(col(idCol).as("id"), col("__cell").as("cell"),
        col("__dvec").as("nvec")),
      s"$dir/assignments", mode = "overwrite")
    val cId = Snapshots.write(centroids, s"$dir/centroids", mode = "overwrite")
    require(aId == cId,
      s"index tables diverged: assignments v$aId vs centroids v$cId " +
        s"under $dir — rebuild the index directory")
    cId
  }

  /** Current index version, if any. */
  def currentVersion(dir: String): Option[Long] =
    Snapshots.currentSnapshotId(s"$dir/centroids")

  /** Probe a stored index version (default: current): top-`k` cosine
    * neighbors per probe row searching the `nprobe` nearest cells.
    * Returns (probeId, id, sim, rank) — the exact shape of
    * [[Ann.ivfJoin]], and (for the same data, nlist, seed and session)
    * the exact same rows, since the stored quantizer IS the one
    * ivfJoin would refit. */
  def probe(probes: DataFrame, vecCol: String, probeIdCol: String,
      dir: String, k: Int, nprobe: Int = 4,
      snapshotId: Option[Long] = None): DataFrame = {
    val spark = probes.sparkSession
    val id = snapshotId.orElse(currentVersion(dir)).getOrElse(
      throw new IllegalArgumentException(s"no IVF index at $dir"))
    // nlist centroid rows: bounded metadata, same transfer class as
    // OrderStat's picked ranks
    val centers = Snapshots.read(spark, s"$dir/centroids", Some(id))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val assigned = Snapshots.read(spark, s"$dir/assignments", Some(id))
      .select(col("id"), col("cell").as("__cell"), col("nvec").as("__dvec"))
    val p = Ann.probeCells(probes, vecCol, probeIdCol, centers, nprobe)
    Ann.topKWithinCells(assigned, p, "id", probeIdCol, k)
  }
}
