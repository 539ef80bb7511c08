package graft.vector

import graft.sources.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF_PQ — product-quantized codes inside the cell-partitioned IVF
  * layout, completing the reference's Lance IVF_PQ shape
  * (pyquokka/df.py:1264-1318; [[IvfIndex]] covers the IVF half, this
  * adds the PQ compression). Each normalized vector is split into `m`
  * subspaces; per subspace a 16-code k-means codebook quantizes the
  * sub-vector, and the 16 4-bit code ids pack into ONE int64 — a
  * 64-dim float vector (256 B) becomes 8 B of index payload, a 32×
  * compression, and the only thing the probe join moves besides ids.
  *
  * {{{
  *   <dir>/centroids/  (cell int, centroid array<double>)           — nlist rows
  *   <dir>/codebooks/  (subspace int, code int, centroid array<double>) — m·16 rows
  *   <dir>/codes/      (id long, code long) PARTITIONED BY cell
  * }}}
  *
  * Probe (asymmetric distance, cosine form): the score of a data vector
  * is dot(q, decode(code)) = Σ_s dot(q_s, codebook_s[code_s]) — so each
  * probe row precomputes its m×16 dot-product TABLE once on the
  * (bounded, broadcast) probe side, and the per-pair work after the
  * cell join is m nibble-extracts + table lookups, never a float dot
  * over the raw vectors. Cells prune exactly as in [[IvfIndex.probe]].
  * All three tables commit under one snapshot version (rebuilds are
  * versioned; probes can pin). */
object PqIndex {

  val CodesPerBook = 16 // 4-bit codes; m*4 must fit 64 bits

  // open-index-handle memo: (dir, resolved snapshot id, commit token)
  // → (coarse centroids, codebooks). Versions are immutable, and the
  // per-commit nonce keeps a delete-and-rebuild at the same path (ids
  // restart at 1) from serving the dead index; see IvfIndex (r16).
  // Bounded LRU (r17 ADVICE, shared helper): see HandleMemo.
  private val handleMemo =
    new HandleMemo[(Array[Array[Double]], Map[(Int, Int), Array[Double]])]()

  /** Fit coarse quantizer + per-subspace codebooks, encode, persist.
    * `dim` must divide into `m` equal subspaces; `m` ≤ 16. */
  def build(data: DataFrame, vecCol: String, idCol: String, dir: String,
      nlist: Int = 16, m: Int = 16, dim: Int = 64,
      seed: Long = 42L): Long = {
    require(m > 0 && m <= 16, s"m must be in [1,16], got $m")
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val spark = data.sparkSession
    val sub = dim / m
    val (assigned, coarse) = Ann.fitQuantizer(data, vecCol, idCol, nlist, seed)
    val cached = assigned.localCheckpoint(true)
    // per-subspace 16-code k-means over the normalized sub-vectors —
    // all m codebooks train on ONE bounded deterministic sample of the
    // normalized vectors (one Spark job), each book a driver-side
    // seeded Lloyd's on its slice (r17: replaces m full-table MLlib
    // k-means|| fits — m× 20+ jobs — with O(sample·16·dim) driver
    // arithmetic; the faiss PQ training discipline)
    val trainVecs = Ann.sampleVectors(cached.select(col("__dvec")),
      "__dvec", Ann.trainSampleFor(CodesPerBook), seed)
    val books: Array[Array[Array[Double]]] = (0 until m).toArray.map { s =>
      val slices = trainVecs.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      Ann.localLloyd(slices, CodesPerBook, seed + s + 1)
    }
    // encode: per subspace, argmin squared distance over the 16 codes —
    // ranked exactly like the probe side ranks cells (max of 2·x·c −
    // |c|², ties to the higher code id) — then pack 4-bit nibbles
    val packed = (0 until m).map { s =>
      val sv = slice(col("__dvec"), s * sub + 1, sub)
      val scores = books(s).zipWithIndex.map { case (c, i) =>
        val cLit = array(c.toIndexedSeq.map(lit): _*)
        val c2 = c.map(x => x * x).sum
        struct((VectorOps.dot(sv, cLit) * 2.0 - lit(c2)).as("score"),
          lit(i).as("code"))
      }
      val best = element_at(reverse(array_sort(array(scores.toIndexedSeq: _*))), 1)
        .getField("code").cast("long")
      shiftleft(best, s * 4)
    }.reduce(_.bitwiseOR(_))
    val codes = cached.select(col(idCol).as("id"), col("__cell").as("cell"),
      packed.as("code"))
    import spark.implicits._
    val centroids = coarse.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "centroid")
    val bookRows = for (s <- 0 until m; c <- 0 until CodesPerBook)
      yield (s, c, books(s)(c).toSeq)
    val cbDf = bookRows.toDF("subspace", "code", "centroid")
    val ids = Seq(
      Snapshots.write(codes, s"$dir/codes", "overwrite", Seq("cell")),
      Snapshots.write(cbDf, s"$dir/codebooks", "overwrite"),
      Snapshots.write(centroids, s"$dir/centroids", "overwrite"))
    require(ids.distinct.size == 1,
      s"PQ index tables diverged under $dir: $ids — rebuild the directory")
    ids.head
  }

  def currentVersion(dir: String): Option[Long] =
    Snapshots.currentSnapshotId(s"$dir/centroids")

  /** ADC probe: top-`k` per probe by the table-lookup cosine estimate
    * over the `nprobe` nearest cells. Returns (probeId, id, score,
    * rank). */
  def probe(probes: DataFrame, vecCol: String, probeIdCol: String,
      dir: String, k: Int, nprobe: Int = 4,
      snapshotId: Option[Long] = None): DataFrame = {
    val spark = probes.sparkSession
    val id = snapshotId.orElse(currentVersion(dir)).getOrElse(
      throw new IllegalArgumentException(s"no PQ index at $dir"))
    // memoized per (dir, id, commit stamp) — same open-index-handle
    // rationale as IvfIndex.readCentroids (r16): a version's
    // centroids/codebooks are immutable, and each gate probes twice
    val stamp = graft.sources.Snapshots.commitToken(s"$dir/centroids", id)
    val (coarse, bookRows) = handleMemo.getOrCompute((dir, id, stamp)) {
      val c = Snapshots.read(spark, s"$dir/centroids", Some(id))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
      // m×16 codebook rows: bounded metadata
      val b = Snapshots.read(spark, s"$dir/codebooks", Some(id))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
        .toMap
      (c, b)
    }
    val m = bookRows.keys.map(_._1).max + 1
    val sub = bookRows((0, 0)).length
    // probe side: cells + the per-row ADC table (m·16 dot products,
    // computed ONCE per probe row on the broadcast side)
    val p0 = Ann.probeCells(probes, vecCol, probeIdCol, coarse, nprobe)
    val tbl = array((for (s <- 0 until m; c <- 0 until CodesPerBook) yield {
      val sv = slice(col("__pvec"), s * sub + 1, sub)
      VectorOps.dot(sv, array(bookRows((s, c)).toIndexedSeq.map(lit): _*))
    }).toIndexedSeq: _*)
    val p = p0.withColumn("__tbl", tbl)
      .select(col(probeIdCol), col("__cell"), col("__tbl"))
    val codes0 = Snapshots.read(spark, s"$dir/codes", Some(id))
      .select(col("id"), col("cell").as("__cell"), col("code"))
    // bounded collect: ≤ nprobe × |probes| cell ids — prune partitions
    val cells = p.select(col("__cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val codes = codes0.filter(col("__cell").isin(cells.map(Int.box): _*))
    val score = (0 until m).map { s =>
      val nib = shiftright(col("code"), s * 4).bitwiseAND(lit(15L)).cast("int")
      element_at(col("__tbl"), lit(s * CodesPerBook + 1) + nib)
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(probeIdCol))
      .orderBy(col("score").desc, col("id").asc)
    codes.join(p, "__cell")
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol), col("id"), col("score"), col("rank"))
  }
}
