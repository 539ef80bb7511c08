package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search via random-hyperplane LSH — the
  * scale path next to [[VectorOps.nnJoin]]'s brute force (reference pushes
  * ANN into a Lance IVF_PQ index, pyquokka/df.py:1264-1318 +
  * datastream.py:454-476; sign-LSH buckets give the same
  * candidate-pruning intent in pure Spark expressions, and the
  * persisted-index half of the Lance shape lives in [[IvfIndex]]).
  *
  * Scale design: bucketing turns the |data|×|probes| cross product into a
  * hash join on bucket ids — each data row is hashed once (codegen'd
  * expression, no shuffle), and only same-bucket pairs are scored. With b
  * bits, expected candidate fraction is ~2^-b of brute force. Hyperplanes
  * are small *integer* vectors derived from a fixed formula, so any SQL
  * engine reproduces the exact buckets (oracle-verifiable) and dot-product
  * signs are computed in exact double arithmetic.
  */
object Ann {

  /** Deterministic pseudo-random integer hyperplane j of dimension dim:
    * w[i] = ((i*37 + j*101) mod 13) - 6  ∈ [-6, 6]. */
  def hyperplane(j: Int, dim: Int): Seq[Int] =
    (0 until dim).map(i => ((i * 37 + j * 101) % 13) - 6)

  /** Sign-LSH bucket id: bit j set iff dot(v, w_j) > 0. */
  def bucket(v: Column, numBits: Int, dim: Int): Column =
    (0 until numBits).map { j =>
      val w = array(hyperplane(j, dim).map(x => lit(x.toDouble)): _*)
      when(VectorOps.dot(v, w) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB SQL fragment producing the identical bucket id for a
    * list-of-float column expression `v`. */
  def bucketSql(v: String, numBits: Int, dim: Int): String =
    (0 until numBits).map { j =>
      val w = hyperplane(j, dim).mkString("[", ", ", "]")
      s"CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> $v[i]::DOUBLE * ($w)[i]::DOUBLE)) > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * data vector to one of `nlist` cells; each probe searches only the
    * `nprobe` nearest cells — the reference's Lance IVF_PQ pushdown shape
    * (pyquokka/datastream.py:454-476, df.py:1264-1318) without the PQ
    * compression. Deterministic for a fixed seed. At scale the model is
    * fit on a sample and the cell assignment is a narrow projection; the
    * probe-side cell fan-out replaces the all-pairs cross product. */
  /** Coarse-quantizer fit shared by [[ivfJoin]] (per-query) and
    * [[IvfIndex.build]] (persisted): returns the assigned data frame
    * (idCol, __cell, __dvec normalized) and the centroid arrays in cell
    * order. */
  private[vector] def fitQuantizer(data: DataFrame, vecCol: String,
      idCol: String, nlist: Int, seed: Long): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = data.select(col(idCol),
      col(vecCol).cast("array<double>").as("__arr"))
      .withColumn("__feat", array_to_vector(col("__arr")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__feat").setPredictionCol("__cell").fit(feat)
    val assigned = model.transform(feat)
      .select(col(idCol), col("__cell"),
        VectorOps.normalized(col("__arr")).as("__dvec"))
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Broadcast probe side: each probe row exploded to its `nprobe`
    * nearest cells under the assignment metric (Euclidean): rank by
    * 2·x·c − |c|², the distance terms that vary with c — computed as
    * expressions over the small literal centroids. Emits
    * (probeIdCol, __pvec normalized, __cell). */
  private[vector] def probeCells(probes: DataFrame, vecCol: String,
      probeIdCol: String, centers: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    val cellScores = centers.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.toIndexedSeq.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      struct((VectorOps.dot(col("__arr"), cLit) * 2.0 - lit(c2)).as("score"),
        lit(i).as("cell"))
    }
    broadcast(probes.select(col(probeIdCol),
        col(vecCol).cast("array<double>").as("__arr"))
      .withColumn("__cells",
        slice(reverse(array_sort(array(cellScores.toIndexedSeq: _*))), 1, nprobe))
      .withColumn("__pvec", VectorOps.normalized(col("__arr")))
      .select(col(probeIdCol), col("__pvec"),
        explode(col("__cells.cell")).as("__cell")))
  }

  /** Cell-joined cosine top-k: (probeId, dataId, sim, rank ≤ k). */
  private[vector] def topKWithinCells(assigned: DataFrame, p: DataFrame,
      dataIdCol: String, probeIdCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col(dataIdCol).asc)
    assigned.join(p, "__cell")
      .withColumn("sim", VectorOps.dot(col("__dvec"), col("__pvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol), col(dataIdCol), col("sim"), col("rank"))
  }

  def ivfJoin(
      data: DataFrame,
      probes: DataFrame,
      vecCol: String,
      dataIdCol: String,
      probeIdCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val (assigned, centers) = fitQuantizer(data, vecCol, dataIdCol, nlist, seed)
    val p = probeCells(probes, vecCol, probeIdCol, centers, nprobe)
    topKWithinCells(assigned, p, dataIdCol, probeIdCol, k)
  }

  /** ANN top-k cosine join: probes matched only against same-bucket data
    * vectors. Returns (probeId, dataId, sim, rank) with rank ≤ k within
    * bucket — an approximation of [[VectorOps.nnJoin]] whose recall is
    * spec-tested. Probes are broadcast; the data side is scanned once. */
  /** Per-row contract check: vectors must have exactly `dim` elements,
    * else the hyperplanes only see a truncated prefix and bucketing
    * quality silently degrades. Fails the query instead. */
  private def checkedDim(v: Column, dim: Int): Column =
    when(size(v) === dim, v).otherwise(raise_error(concat(
      lit("annJoin: vector of length "), size(v).cast("string"),
      lit(s" does not match dim=$dim"))))

  def annJoin(
      data: DataFrame,
      probes: DataFrame,
      vecCol: String,
      dataIdCol: String,
      probeIdCol: String,
      k: Int,
      numBits: Int = 8,
      dim: Int = 64): DataFrame = {
    val d = data.select(col(dataIdCol),
      checkedDim(col(vecCol).cast("array<double>"), dim).as("__raw"))
      .withColumn("__bucket", bucket(col("__raw"), numBits, dim))
      .select(col(dataIdCol), col("__bucket"),
        VectorOps.normalized(col("__raw")).as("__dvec"))
    val p = broadcast(probes.select(col(probeIdCol),
      checkedDim(col(vecCol).cast("array<double>"), dim).as("__raw"))
      .withColumn("__bucket", bucket(col("__raw"), numBits, dim))
      .select(col(probeIdCol), col("__bucket"),
        VectorOps.normalized(col("__raw")).as("__pvec")))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col(dataIdCol).asc)
    d.join(p, "__bucket")
      .withColumn("sim", VectorOps.dot(col("__dvec"), col("__pvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol), col(dataIdCol), col("sim"), col("rank"))
  }
}
