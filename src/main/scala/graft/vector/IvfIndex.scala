package graft.vector

import graft.sources.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT IVF ANN index — the stored-index half of the reference's
  * Lance IVF_PQ pushdown (pyquokka/df.py:1264-1318 probes a *stored*
  * index built by datastream.py:454-476; `Ann.ivfJoin` covers the
  * algorithm but re-trains the quantizer per query). The index is two
  * [[Snapshots]] tables under one directory, so it inherits snapshot
  * semantics for free: rebuilds and appends are new snapshot versions,
  * probes can pin an index version (time travel), and a rebuild racing
  * a probe is the snapshot layer's already-proven commit protocol.
  *
  * {{{
  *   <dir>/centroids/    (cell int, centroid array<double>)   — nlist rows
  *   <dir>/assignments/  (id long, nvec array<double>) PARTITIONED BY cell
  * }}}
  *
  * Scale design: the k-means fit and cell assignment are paid ONCE at
  * build; every probe reads the tiny centroid table (bounded driver
  * metadata, like OrderStat's picked ranks), ranks its nprobe cells as
  * literal-centroid expressions, and joins the assignment table on
  * `cell`. The assignment table is written hive-partitioned BY CELL, and
  * the probe filters on the (bounded) union of probed cells BEFORE the
  * join — Spark prunes the non-probed cells' directories at planning, so
  * a probe touching p cells reads p/nlist of the index bytes no matter
  * the corpus size. [[append]] is the incremental-maintenance path: new
  * vectors are assigned to the EXISTING centroids (no refit — the Lance
  * append semantics) and committed as an append snapshot; the quantizer
  * drifts only when a rebuild is explicitly requested. */
object IvfIndex {

  /** Fit the coarse quantizer and persist centroids + cell-partitioned
    * assignments as one index version. Returns the snapshot id
    * (identical for both tables — enforced). */
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
      s"$dir/assignments", mode = "overwrite", partitionBy = Seq("cell"))
    val cId = Snapshots.write(centroids, s"$dir/centroids", mode = "overwrite")
    require(aId == cId,
      s"index tables diverged: assignments v$aId vs centroids v$cId " +
        s"under $dir — rebuild the index directory")
    cId
  }

  /** Incrementally index a batch: assign `newData` to the CURRENT
    * version's centroids (nearest cell under the same 2·x·c − |c|²
    * ranking the probe side uses, so a fresh vector's own cell is by
    * construction its probe's rank-1 cell) and commit as an append
    * snapshot of the assignments plus a re-listed centroid version —
    * batch-sized write, no refit, no table rewrite. Returns the new
    * index version. */
  def append(newData: DataFrame, vecCol: String, idCol: String,
      dir: String): Long = {
    val spark = newData.sparkSession
    val (id, centers) = readCentroids(spark, dir, None)
    val assigned = assignCells(newData, vecCol, idCol, centers)
    val aId = Snapshots.write(assigned, s"$dir/assignments",
      mode = "append", partitionBy = Seq("cell"))
    // centroids are unchanged but re-committed so both tables keep one
    // version number per index state (nlist tiny rows)
    import spark.implicits._
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val cId = Snapshots.write(centroids, s"$dir/centroids", mode = "overwrite")
    require(aId == cId && aId == id + 1,
      s"index tables diverged on append: v$aId vs v$cId (parent v$id)")
    aId
  }

  /** Current index version, if any. */
  def currentVersion(dir: String): Option[Long] =
    Snapshots.currentSnapshotId(s"$dir/centroids")

  /** Probe a stored index version (default: current): top-`k` cosine
    * neighbors per probe row searching the `nprobe` nearest cells.
    * Returns (probeId, id, sim, rank) — the exact shape of
    * [[Ann.ivfJoin]], and (for the same data, nlist, seed and session)
    * the exact same rows, since the stored quantizer IS the one
    * ivfJoin would refit. `prunePartitions` (on by default) collects
    * the union of probed cells — bounded by nprobe × the probe count,
    * and the probe side is bounded by contract (it broadcasts) — and
    * filters the cell-partitioned scan down to exactly those
    * directories; pass false to measure the unpruned plan. */
  def probe(probes: DataFrame, vecCol: String, probeIdCol: String,
      dir: String, k: Int, nprobe: Int = 4,
      snapshotId: Option[Long] = None,
      prunePartitions: Boolean = true): DataFrame = {
    val spark = probes.sparkSession
    val (id, centers) = readCentroids(spark, dir, snapshotId)
    val assigned0 = Snapshots.read(spark, s"$dir/assignments", Some(id))
      .select(col("id"), col("cell").as("__cell"), col("nvec").as("__dvec"))
    val p = Ann.probeCells(probes, vecCol, probeIdCol, centers, nprobe)
    val assigned =
      if (!prunePartitions) assigned0
      else {
        // bounded collect: ≤ nprobe × |probes| cell ids
        val cells = p.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).sorted
        assigned0.filter(col("__cell").isin(cells.map(Int.box): _*))
      }
    Ann.topKWithinCells(assigned, p, "id", probeIdCol, k)
  }

  /** FILTERED probe (predicate-constrained ANN — the vector-DB
    * `search(..., filter=...)` feature; Lance pushes the same shape
    * into its scanner): top-`k` neighbors per probe AMONG the ids in
    * `filterIds`, from the stored index. PRE-filtering semantics: the
    * allowed-id relation joins the cell-pruned assignment scan BEFORE
    * the top-k cut, so every probe gets k *valid* results when its
    * probed cells hold that many — a post-filter over an unfiltered
    * top-k would silently return fewer (or zero) the more selective
    * the predicate gets, which is exactly the failure mode this path
    * exists to avoid.
    *
    * Scale shape: identical to [[probe]] (directory-pruned cell scan,
    * bounded probe broadcast) plus ONE id-keyed hash join against the
    * filter relation — id-sized exchange, never vector-sized; the
    * filter side is an arbitrary DataFrame (any predicate the caller
    * can express upstream), not a collected set. */
  def probeFiltered(probes: DataFrame, vecCol: String, probeIdCol: String,
      dir: String, k: Int, filterIds: DataFrame,
      nprobe: Int = 4, snapshotId: Option[Long] = None,
      prunePartitions: Boolean = true): DataFrame = {
    val spark = probes.sparkSession
    val (id, centers) = readCentroids(spark, dir, snapshotId)
    val fCol = filterIds.columns match {
      case Array(c) => c
      case cs => throw new IllegalArgumentException(
        s"filterIds must have exactly one (id) column, got ${cs.toSeq}")
    }
    val assigned0 = Snapshots.read(spark, s"$dir/assignments", Some(id))
      .select(col("id"), col("cell").as("__cell"), col("nvec").as("__dvec"))
      .join(filterIds.select(col(fCol).as("id")).distinct(), Seq("id"),
        "left_semi")
    val p = Ann.probeCells(probes, vecCol, probeIdCol, centers, nprobe)
    val assigned =
      if (!prunePartitions) assigned0
      else {
        val cells = p.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).sorted
        assigned0.filter(col("__cell").isin(cells.map(Int.box): _*))
      }
    Ann.topKWithinCells(assigned, p, "id", probeIdCol, k)
  }

  /** Nearest-cell assignment under the probe-side ranking (top-1 of
    * [[Ann.probeCells]]'s score), emitted in the assignments schema —
    * the shared [[Ann.nearestCell]] expression, so append and build can
    * never drift on the tie convention (r17). */
  private def assignCells(df: DataFrame, vecCol: String, idCol: String,
      centers: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("__arr"))
      .withColumn("cell", Ann.nearestCell(col("__arr"), centers))
      .select(col("id"), col("cell"),
        VectorOps.normalized(col("__arr")).as("nvec"))

  // Centroid memo (r16, the q218/q176 bench-drift decomposition): a
  // version's centroid set is IMMUTABLE (appendTo/prune write a NEW
  // snapshot id), so the bounded collect — one Spark job + snapshot
  // listing per probe call, and every gate probes twice — is the
  // classic vector-DB "open index handle" state, cacheable per
  // version for the JVM's lifetime. The key carries the version's
  // COMMIT TOKEN (a per-commit nonce; one local manifest read, no
  // Spark job — r16 review finding): a table deleted and rebuilt at
  // the same path restarts ids at 1, and a bare (dir, id) key would
  // serve the deleted index's centroids. Only resolved ids are
  // memoized: a snapshotId=None call still lists the directory for
  // the CURRENT version first, so a concurrent append is never masked.
  // Bounded LRU (r17 ADVICE): append-heavy services mint a new snapshot
  // id per commit, so the r16 unbounded map leaked one nlist×dim
  // centroid set per version for the JVM's lifetime.
  private val centroidMemo = new HandleMemo[Array[Array[Double]]]()

  private def readCentroids(spark: SparkSession, dir: String,
      snapshotId: Option[Long]): (Long, Array[Array[Double]]) = {
    val id = snapshotId.orElse(currentVersion(dir)).getOrElse(
      throw new IllegalArgumentException(s"no IVF index at $dir"))
    val stamp = Snapshots.commitToken(s"$dir/centroids", id)
    // nlist centroid rows: bounded metadata, same transfer class as
    // OrderStat's picked ranks
    val centers = centroidMemo.getOrCompute((dir, id, stamp)) {
      Snapshots.read(spark, s"$dir/centroids", Some(id))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
    }
    (id, centers)
  }
}
