package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector / ML-adjacent operators (SURVEY §2.10): brute-force cosine
  * nearest-neighbor join (reference `vector_nn_join`,
  * datastream.py:396-476 + vector_executors.py:20-115), gramian and
  * covariance (datastream.py:1033-1147).
  *
  * All expression-level math is double-precision and codegen'd
  * (`zip_with`/`aggregate` higher-order functions — no UDFs).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ — the native codegen'd kernel (graft.functions.DotProduct;
    * registered by GraftFunctions, same left-to-right accumulation as
    * the HOF fold and the DuckDB oracle). Arguments must be
    * array<double>. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Pure-built-in fold form of [[dot]] (no registration needed); same
    * values — kept as the spec cross-check of the native kernel. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSim(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalized copy of the vector, with the input array and its
    * norm each evaluated once per row (higher-order expressions have no
    * codegen CSE — see TextOps.bindOnce). Pre-normalizing each side
    * turns per-pair cosine into a single dot fold: 3× fewer array folds
    * in every O(pairs) similarity operator. */
  def normalized(v: Column): Column =
    graft.text.TextOps.bindOnce(v) { vv =>
      graft.text.TextOps.bindOnce(l2Norm(vv)) { n =>
        transform(vv, x => x / n)
      }
    }

  /** Symmetric int8 quantization: each vector scales by 127/max|xᵢ| and
    * truncates toward zero, yielding integers in [−127, 127] (held as
    * exact doubles so the codegen'd [[dot]] kernel applies unchanged;
    * a zero vector quantizes to zeros). This is the memory-side lever
    * for 100 TB ANN: a 4-byte float dimension becomes 1 byte on disk /
    * in shuffle (cast to `array<tinyint>` at the storage boundary),
    * and the quantized dot is INTEGER-EXACT — 127²·d < 2⁵³ for any
    * realistic d — so quantized scores are engine-reproducible with no
    * float-sum ordering concerns at all, unlike the float cosine they
    * approximate.
    *
    * Each step is deterministic IEEE arithmetic: one multiply, one
    * divide, floor — mirrored literally by the DuckDB oracle. */
  def quantizeInt8(v: Column): Column =
    graft.text.TextOps.bindOnce(v.cast("array<double>")) { vd =>
      graft.text.TextOps.bindOnce(array_max(transform(vd, x => abs(x)))) { m =>
        transform(vd, x =>
          when(m === 0.0, lit(0.0))
            .otherwise(signum(x) * floor(abs(x) * 127.0 / m)))
      }
    }

  /** [[nnJoin]] on int8-quantized vectors: per-probe top-k by the
    * integer-exact quantized dot product (ties by data id). Same
    * broadcast-probes/no-data-shuffle plan as the float form; the
    * score column is `qdot` (int64). */
  def quantizedNnJoin(
      data: DataFrame,
      probes: DataFrame,
      vecCol: String,
      dataIdCol: String,
      probeIdCol: String,
      k: Int): DataFrame = {
    val d = data.select(col(dataIdCol),
      quantizeInt8(col(vecCol)).as("__dvec"))
    val p = broadcast(probes.select(col(probeIdCol),
      quantizeInt8(col(vecCol)).as("__pvec")))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("qdot").desc, col(dataIdCol).asc)
    d.crossJoin(p)
      .withColumn("qdot", dot(col("__dvec"), col("__pvec")).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol), col(dataIdCol), col("qdot"), col("rank"))
  }

  /** Brute-force cosine top-k join: for each probe vector, the k nearest
    * data vectors. Mirrors the reference's two-stage plan
    * (vector_executors.py: per-partition top-k, then global reduce):
    * stage 1 is the crossJoin with the *broadcast* probe set (no shuffle
    * of the data side), stage 2 the per-probe rank. With P probes the
    * shuffle input is |data|·P rows; for large P use an ANN variant
    * (see graft.vector.Ann). Deterministic: ties broken by data id. */
  def nnJoin(
      data: DataFrame,
      probes: DataFrame,
      vecCol: String,
      dataIdCol: String,
      probeIdCol: String,
      k: Int): DataFrame = {
    val d = data.select(col(dataIdCol),
      normalized(col(vecCol).cast("array<double>")).as("__dvec"))
    val p = broadcast(probes.select(col(probeIdCol),
      normalized(col(vecCol).cast("array<double>")).as("__pvec")))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col(dataIdCol).asc)
    d.crossJoin(p)
      .withColumn("sim", dot(col("__dvec"), col("__pvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol), col(dataIdCol), col("sim"), col("rank"))
  }

  /** XᵀX over a column list (reference `gramian`, datastream.py:1033):
    * one row, entries g_i_j = Σ colᵢ·colⱼ for i ≤ j. Spark's partial
    * aggregation gives the reference's tree-of-+ reduce for free.
    * `detScale = Some(s)`: sums run through [[graft.functions.Det]] —
    * per-row products rounded to s decimals, summed exactly in decimal
    * — making the result independent of partition/merge order (a raw
    * parallel double sum is not, so exact-compared outputs flake). */
  /** Per-GROUP embedding CENTROID DRIFT — the vector-column member of
    * the drift-monitor tier (categorical χ² q223, numeric KS q224,
    * per-group forms q232/q233): one row per (group, dimension) with
    * the group's mean component, the global mean component, and their
    * gap. A source whose centroid wanders from the corpus mean is the
    * embedding-space analog of a shifted CDF — and which DIMENSIONS
    * moved is the actionable part, so the rows are the readout
    * (q223's contract; fold `gap` into whatever norm you monitor).
    *
    * Determinism: per-dimension sums run through the exact decimal
    * integer form ([[graft.functions.Det.dsumInt]]) so means and gaps
    * are bit-identical on any partition layout and engine — no
    * float-sum order dependence — and the GLOBAL means re-aggregate
    * the per-group decimal partials (exact, associative) instead of
    * scanning and exploding the data a second time (r14 review: the
    * first cut's separate global `davg` shared no grouping key with
    * the per-group one, so the posexplode ran twice). A NaN component
    * raises LOUDLY (r14 review): `bround(NaN)` would otherwise
    * contribute a silent 0 to the sum while still counting — the
    * corrupted readout a drift monitor exists to catch — and the
    * oracle's decimal cast errors on NaN, a cross-engine divergence.
    *
    * Scale shape: posexplode feeds ONE map-combined (group, dim)
    * aggregate — the exchange carries groups × dims partials, never
    * data-sized rows — plus a (groups × dims)-sized re-aggregate
    * broadcast back. */
  def centroidDriftByGroup(df: DataFrame, vecCol: String,
      groupCol: String, scale: Int = 6): DataFrame = {
    val p = math.pow(10, scale)
    val rows = df.filter(col(vecCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        posexplode(col(vecCol)))
      .select(col("__g"), col("pos").cast("long").as("dim"),
        when(isnan(col("col").cast("double")),
          raise_error(lit("centroidDriftByGroup: NaN component — " +
            "filter or impute NaNs first")))
          .otherwise(col("col").cast("double")).as("__v"))
    // one data-sized aggregate; everything below re-aggregates its
    // (groups × dims) output. Exact-integer partials; the double view
    // (cast, /10^scale, /count — Det.davg's operation order) only at
    // emission, so the global mean is bit-identical to a direct davg.
    val per0 = rows.groupBy(col("__g"), col("dim"))
      .agg(count(col("__v")).as("n"),
        graft.functions.Det.dsumInt(col("__v"), scale).as("__si"))
    val per = per0.withColumn("mean",
      col("__si").cast("double") / p / col("n"))
    // re-aggregated decimal sum: in non-ANSI mode an overflowing
    // sum(decimal(38,0)) nulls SILENTLY — guard it loudly, mirroring
    // chiSquareDriftByGroup's overflow raise (r14 advice)
    val glob = per0.groupBy(col("dim"))
      .agg(sum(col("__si")).as("__gsi"), sum(col("n")).as("__gn"))
      .select(col("dim"),
        (when(col("__gsi").isNull && col("__gn") > 0,
          raise_error(lit("centroidDriftByGroup: decimal(38) overflow " +
            "re-aggregating per-group partials — lower `scale`")))
          .otherwise(col("__gsi")).cast("double") / p / col("__gn"))
          .as("global_mean"))
    per.join(broadcast(glob), Seq("dim"))
      .select(col("__g").as(groupCol), col("dim"), col("n"), col("mean"),
        col("global_mean"),
        (col("mean") - col("global_mean")).as("gap"))
  }

  def gramian(df: DataFrame, cols: Seq[String], demean: Boolean = false,
      detScale: Option[Int] = None): DataFrame = {
    def dsum(c: Column) = detScale match {
      case Some(sc) => graft.functions.Det.dsum(c, sc)
      case None => sum(c)
    }
    val base =
      if (!demean) df
      else {
        val means = df.select(cols.map(c => avg(col(c)).as(c)): _*).head()
        df.select(cols.zipWithIndex.map { case (c, i) =>
          (col(c) - lit(means.getDouble(i))).as(c)
        }: _*)
      }
    val prods = for {
      (ci, i) <- cols.zipWithIndex
      (cj, j) <- cols.zipWithIndex if j >= i
    } yield dsum(col(ci) * col(cj)).as(s"g_${i}_$j")
    base.agg(prods.head, prods.tail: _*)
  }

  /** Pairwise population covariance matrix entries (reference
    * `covariance`, datastream.py:1100) as one row of c_i_j columns.
    * `detScale = Some(s)` computes each entry from order-independent
    * decimal-exact moments, (n·Σxy − Σx·Σy)/n², instead of the native
    * one-pass `covar_pop` whose co-moment merge is partition-order-
    * dependent (and algorithm-specific across engines). */
  def covariance(df: DataFrame, cols: Seq[String],
      detScale: Option[Int] = None): DataFrame = detScale match {
    case None =>
      val entries = for {
        (ci, i) <- cols.zipWithIndex
        (cj, j) <- cols.zipWithIndex if j >= i
      } yield covar_pop(col(ci), col(cj)).as(s"c_${i}_$j")
      df.agg(entries.head, entries.tail: _*)
    case Some(sc) =>
      import graft.functions.Det
      val n = count(lit(1)).cast("double")
      def s1(c: String) = Det.dsum(col(c), sc)
      val entries = for {
        (ci, i) <- cols.zipWithIndex
        (cj, j) <- cols.zipWithIndex if j >= i
      } yield ((n * Det.dsum(col(ci) * col(cj), sc) - s1(ci) * s1(cj)) /
        (n * n)).as(s"c_${i}_$j")
      df.agg(entries.head, entries.tail: _*)
  }

  /** Sign-random-projection (Johnson–Lindenstrauss) dimensionality
    * reduction: out_i = Σ_j s_ij · x_j with s_ij ∈ {+1, −1} drawn
    * deterministically from the portable hash of (seed, i, j) — the
    * Achlioptas database-friendly JL family, no RNG, so the projection
    * matrix is a pure function of the seed and both engines (and every
    * rerun at any parallelism) build the identical matrix. The sum is
    * one fixed left-associated chain per output dim: deterministic
    * IEEE, mirrored literally by the oracle.
    *
    * Scale shape: the matrix is outDim × inDim driver-side literals
    * (bounded metadata, never a relation); the projection is a pure
    * codegen'd per-row expression — zero exchange at any corpus size,
    * and the 64→8 reduction cuts every downstream pairwise-distance
    * operator's cost 8×.
    *
    * Returns (idCol, r0 … r(outDim−1)) as doubles. */
  def signRandomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, seed: String): DataFrame = {
    require(inDim > 0 && outDim > 0, s"bad dims $inDim -> $outDim")
    val cols = (0 until outDim).map { i =>
      (0 until inDim).map { j =>
        element_at(col(vecCol), j + 1).cast("double") *
          lit(jlSign(seed, i, j).toDouble)
      }.reduceLeft(_ + _).as(s"r$i")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** The (i, j) entry of the seed's sign matrix: ±1 from the portable
    * hash parity — shared by the Spark expression builder and the
    * oracle generator so both engines state the same matrix. */
  def jlSign(seed: String, i: Int, j: Int): Int =
    if (graft.text.TextIndex.portableHashOf(s"jl:$seed:$i:$j") % 2 == 0) 1
    else -1
}
