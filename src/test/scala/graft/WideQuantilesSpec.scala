package graft

import graft.agg.{TDigestQuantiles, WideQuantiles}
import org.apache.spark.sql.functions._

/** Extreme-width t-digest quantiles (agg.WideQuantiles): the
  * mapPartitions array-of-digests path for the reference's 1M×10k
  * winsorization workload, sharing TDigest's kernel with the typed
  * Aggregator. */
class WideQuantilesSpec extends SparkSpecBase {

  test("wide quantiles within 1% rank error per column on skewed data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // three columns with different shapes: lognormal, uniform, bimodal
    val rows = (1 to 20000).map { _ =>
      (math.exp(rnd.nextGaussian() * 1.5), rnd.nextDouble() * 100.0,
        if (rnd.nextBoolean()) rnd.nextGaussian() else 50 + rnd.nextGaussian())
    }
    val df = s.createDataset(rows).toDF("a", "b", "c").repartition(8)
    val qs = Seq(0.05, 0.5, 0.95)
    val out = WideQuantiles.quantiles(df, Seq("a", "b", "c"), qs,
      compression = 200).head()
    Seq("a", "b", "c").zipWithIndex.foreach { case (_, ci) =>
      val col = rows.map(r => ci match {
        case 0 => r._1; case 1 => r._2; case 2 => r._3
      }).sorted
      val est = out.getSeq[Double](ci)
      qs.zip(est).foreach { case (q, e) =>
        val rank = col.count(_ <= e).toDouble / col.size
        assert(math.abs(rank - q) < 0.01, s"col=$ci q=$q est=$e rank=$rank")
      }
    }
  }

  test("wide path agrees with the typed Aggregator within sketch error") {
    val s = spark
    import s.implicits._
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val qs = Seq(0.1, 0.5, 0.9)
    val wide = WideQuantiles.quantiles(li, Seq("l_extendedprice"), qs)
      .head().getSeq[Double](0)
    val agg = new TDigestQuantiles(qs, compression = 100)
    val narrow = li.select(col("l_extendedprice").cast("double")).as[Double]
      .select(agg.toColumn).head().values
    val exact = li.agg(
      expr("percentile(l_extendedprice, array(0.1, 0.5, 0.9))"))
      .head().getSeq[Double](0)
    qs.indices.foreach { i =>
      assert(math.abs(wide(i) - exact(i)) / exact(i) < 0.02,
        s"wide=${wide(i)} exact=${exact(i)}")
      assert(math.abs(narrow(i) - exact(i)) / exact(i) < 0.02,
        s"narrow=${narrow(i)} exact=${exact(i)}")
    }
  }

  test("1000-column width: one pass, bounded task memory, correct shape") {
    // the width stress the expression tier cannot plan (scaled to spec
    // runtime; the full 10k×1M run is the baseline harness's headline)
    val wide = 1000
    val df = spark.range(20000).select(
      (0 until wide).map(i => rand(7L + i).as(s"f$i")): _*)
    val out = WideQuantiles.quantiles(df, (0 until wide).map(i => s"f$i"),
      Seq(0.1, 0.9))
    val row = out.head()
    assert(row.size == wide)
    // uniform[0,1): every column's (q10, q90) must straddle its mass
    (0 until wide by 97).foreach { i =>
      val q = row.getSeq[Double](i)
      assert(q(0) > 0.02 && q(0) < 0.18, s"f$i q10=${q(0)}")
      assert(q(1) > 0.82 && q(1) < 0.98, s"f$i q90=${q(1)}")
    }
  }

  test("float columns read in place (r16 type-aware path) match double") {
    val s = spark
    import s.implicits._
    val base = (1 to 5000).map(i => (i.toDouble, (5000 - i).toDouble))
    val dbl = s.createDataset(base).toDF("x", "y")
    val flt = dbl.select(col("x").cast("float").as("x"),
      col("y").cast("float").as("y"))
    val qs = Seq(0.1, 0.5, 0.9)
    val a = WideQuantiles.quantiles(dbl.coalesce(1), Seq("x", "y"), qs).head()
    val b = WideQuantiles.quantiles(flt.coalesce(1), Seq("x", "y"), qs).head()
    // integers <= 5000 are exact in float32, single partition pins the
    // merge order -> the two paths must agree bit-for-bit
    (0 until 2).foreach { c =>
      assert(a.getSeq[Double](c) == b.getSeq[Double](c),
        s"col $c: ${a.getSeq[Double](c)} vs ${b.getSeq[Double](c)}")
    }
    // int columns still take the cast path
    val ints = (1 to 1000).map(i => Tuple1(i.toLong)).toDF("v")
    val r = WideQuantiles.quantiles(ints, Seq("v"), Seq(0.5)).head()
    assert(math.abs(r.getSeq[Double](0).head - 500.0) < 25.0)
  }

  test("nulls skipped per column; all-null column yields NaN; NaN raises") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, null), (3.0, null), (null, null))
      .toDF("x", "y")
    val row = WideQuantiles.quantiles(df, Seq("x", "y"), Seq(0.5)).head()
    assert(row.getSeq[Double](0).head == 2.0)
    assert(row.getSeq[Double](1).head.isNaN)
    val bad = Seq((1.0, Double.NaN)).toDF("x", "y")
    val e = intercept[org.apache.spark.SparkException] {
      WideQuantiles.quantiles(bad, Seq("x", "y"), Seq(0.5)).head()
    }
    assert(e.getMessage.contains("NaN") ||
      Option(e.getCause).exists(_.getMessage.contains("NaN")))
  }

  test("repeated runs stay within the sketch band (merge order varies)") {
    // the sketch CONTRACT, same as the typed Aggregator's: treeReduce
    // combine order is scheduler-dependent, so repeated runs yield
    // different-but-equally-valid digests — each must satisfy the rank
    // bound, and two runs of the same input agree within it
    val df = spark.range(10000).select(
      (0 until 5).map(i => rand(3L + i).as(s"f$i")): _*).repartition(4)
    val cols = (0 until 5).map(i => s"f$i")
    val a = WideQuantiles.quantiles(df, cols, Seq(0.25, 0.75)).head()
    val b = WideQuantiles.quantiles(df, cols, Seq(0.25, 0.75)).head()
    cols.indices.foreach { i =>
      val (qa, qb) = (a.getSeq[Double](i), b.getSeq[Double](i))
      qa.zip(qb).foreach { case (x, y) =>
        // uniform[0,1): rank distance ≈ value distance
        assert(math.abs(x - y) < 0.02, s"f$i: $x vs $y")
      }
    }
  }

  test("array layout (r17) matches the column layout per element") {
    // same values through both layouts, single partition pins the
    // merge order -> bit-identical digests and quantiles
    val s = spark
    import s.implicits._
    val rows = (1 to 4000).map(i =>
      (i.toDouble, (4000 - i).toDouble, (i % 97).toDouble))
    val colsDf = s.createDataset(rows).toDF("a", "b", "c").coalesce(1)
    val arrDf = colsDf.select(
      array(col("a").cast("float"), col("b").cast("float"),
        col("c").cast("float")).as("vec"))
    val qs = Seq(0.1, 0.5, 0.9)
    val colFlt = colsDf.select(col("a").cast("float").as("a"),
      col("b").cast("float").as("b"), col("c").cast("float").as("c"))
    val byCols = WideQuantiles.quantiles(colFlt, Seq("a", "b", "c"), qs).head()
    val byArr = WideQuantiles.quantilesOfArray(arrDf, "vec", 3, qs).head()
    (0 until 3).foreach { j =>
      assert(byArr.getSeq[Double](j) == byCols.getSeq[Double](j),
        s"elem $j: ${byArr.getSeq[Double](j)} vs ${byCols.getSeq[Double](j)}")
    }
    // output naming: prefix + position
    assert(byArr.schema.fieldNames.toSeq ==
      Seq("f0_quantiles", "f1_quantiles", "f2_quantiles"))
  }

  test("array layout reads a float parquet round-trip (scan path)") {
    // exercises the actual storage path the baseline uses: parquet
    // array<float> scan -> toRdd -> ArrayData element reads
    val dir = java.nio.file.Files
      .createTempDirectory("wq_arr").toString + "/t.parquet"
    val df = spark.range(8000).select(array(
      (col("id") % 100).cast("float"),
      (col("id") % 7).cast("float")).as("vec"))
    df.repartition(4).write.parquet(dir)
    val rd = spark.read.parquet(dir)
    val out = WideQuantiles.quantilesOfArray(rd, "vec", 2,
      Seq(0.5), compression = 200).head()
    assert(math.abs(out.getSeq[Double](0).head - 49.5) < 3.0)
    assert(math.abs(out.getSeq[Double](1).head - 3.0) < 0.8)
  }

  test("winsorizeArray clips per element, preserves nulls and float type") {
    val s = spark
    import s.implicits._
    val base = (1 to 1000).map(i => Seq(Some(i.toFloat),
      if (i == 500) None else Some((1000 - i).toFloat)))
      .toDF("vec")
    val out = new graft.api.DataStream(base)
      .winsorizeArray("vec", 2, 0.1, 0.9).df
    // element type preserved
    assert(out.schema.head.dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true))
    val stats = out.selectExpr(
      "min(vec[0]) lo0", "max(vec[0]) hi0",
      "min(vec[1]) lo1", "max(vec[1]) hi1",
      "sum(cast(vec[1] is null as int)) nnull").head()
    // uniform 1..1000: q10 ~ 100, q90 ~ 900 (sketch tolerance)
    assert(stats.getFloat(0) > 60 && stats.getFloat(0) < 140, stats)
    assert(stats.getFloat(1) > 860 && stats.getFloat(1) < 940, stats)
    assert(stats.getFloat(2) > 60 && stats.getFloat(2) < 140, stats)
    assert(stats.getFloat(3) > 860 && stats.getFloat(3) < 940, stats)
    // the null element survived as null (not imputed to the lo bound)
    assert(stats.getLong(4) == 1L, stats)
  }

  test("array layout: null rows/elements skipped, ragged raises, NaN raises") {
    val s = spark
    import s.implicits._
    val ok = Seq(Some(Seq(Some(1.0), None)), None,
      Some(Seq(Some(3.0), Some(4.0))))
      .toDF("vec")
    val row = WideQuantiles.quantilesOfArray(ok, "vec", 2, Seq(0.5)).head()
    assert(row.getSeq[Double](0).head == 2.0) // median of {1, 3}
    assert(row.getSeq[Double](1).head == 4.0) // {4}
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0)).toDF("vec")
    val e1 = intercept[org.apache.spark.SparkException] {
      WideQuantiles.quantilesOfArray(ragged, "vec", 2, Seq(0.5)).head()
    }
    assert(e1.getMessage.contains("length") ||
      Option(e1.getCause).exists(_.getMessage.contains("length")))
    val nan = Seq(Seq(1.0, Double.NaN)).toDF("vec")
    val e2 = intercept[org.apache.spark.SparkException] {
      WideQuantiles.quantilesOfArray(nan, "vec", 2, Seq(0.5)).head()
    }
    assert(e2.getMessage.contains("NaN") ||
      Option(e2.getCause).exists(_.getMessage.contains("NaN")))
    // non-array column rejected loudly at plan time
    val notArr = Seq(1.0).toDF("vec")
    intercept[IllegalArgumentException] {
      WideQuantiles.quantilesOfArray(notArr, "vec", 1, Seq(0.5))
    }
  }

  test("r17 kernel: ingest flush is value-identical to the compress path") {
    // WideDigestIngest claims the same operation order as compress's
    // sorted fast path — pin it: same values, same flush boundaries,
    // bit-identical centroids
    import graft.agg.{TDigest, TDigestState, WideDigestIngest}
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(3000)(rnd.nextDouble() * 100 - 50)
    val comp = 50
    val bufCap = comp * 4
    val ing = new WideDigestIngest(1, comp)
    vals.foreach(v => ing.add(0, v))
    val got = ing.states()(0)
    var ref = TDigestState(Array.empty, Array.empty, Array.empty)
    vals.grouped(bufCap).foreach { chunk =>
      ref = TDigest.compress(ref.means, ref.weights, chunk.toArray, comp)
    }
    assert(got.means.toSeq == ref.means.toSeq)
    assert(got.weights.toSeq == ref.weights.toSeq)
    assert(got.buffer.isEmpty)
  }

  test("r17 kernel: encode/decode block round-trips flushed states") {
    import graft.agg.{TDigest, TDigestState}
    val rnd = new scala.util.Random(13)
    val states = Array.tabulate(5) { i =>
      TDigest.compress(Array.empty, Array.empty,
        Array.fill(500 + i * 100)(rnd.nextGaussian()), 100)
    }
    // full range and a sub-range (block slicing)
    Seq((0, 5), (1, 4), (2, 2)).foreach { case (from, until) =>
      val rt = TDigest.decodeBlock(TDigest.encodeBlock(states, from, until))
      assert(rt.length == until - from)
      rt.zipWithIndex.foreach { case (st, k) =>
        assert(st.means.toSeq == states(from + k).means.toSeq)
        assert(st.weights.toSeq == states(from + k).weights.toSeq)
        assert(st.buffer.isEmpty)
      }
    }
    // empty state encodes/decodes (zero-row partitions emit these)
    val empty = Array(TDigestState(Array.empty, Array.empty, Array.empty))
    val rt = TDigest.decodeBlock(TDigest.encodeBlock(empty, 0, 1))
    assert(rt.length == 1 && rt(0).means.isEmpty)
    // an unflushed buffer must refuse to encode (it would be dropped)
    intercept[IllegalArgumentException] {
      TDigest.encodeBlock(
        Array(TDigestState(Array.empty, Array.empty, Array(1.0))), 0, 1)
    }
  }

  test("r17 kernel: centroid-store growth path keeps rank accuracy") {
    // tiny compression + adversarial spread forces cluster counts past
    // the 2x-compression initial capacity, exercising Clusters growth
    import graft.agg.WideDigestIngest
    val rnd = new scala.util.Random(29)
    val vals = Array.fill(50000)(rnd.nextDouble())
    val ing = new WideDigestIngest(1, 4)
    vals.foreach(v => ing.add(0, v))
    val st = ing.states()(0)
    assert(st.means.length > 8, s"expected growth past initCap, got ${st.means.length}")
    // still a valid digest: median within the sketch band for comp=4
    val med = graft.agg.TDigest.quantiles(st, Seq(0.5), 4).head
    assert(math.abs(med - 0.5) < 0.15, s"median=$med")
  }
}
