package graft.vector


import org.apache.spark.sql.functions._

/** Focused pins for the r17 sampled-quantizer internals (Ann.localLloyd
  * / sampleVectors / nearestCell): the IVF gates only see the composed
  * result, so these pin the pieces an optimization could silently
  * bend — determinism, partitioning-independence of the training
  * sample, and the shared assignment tie convention. */
class QuantizerSpec extends graft.SparkSpecBase {

  private def vecs(n: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(n)(i => Array.tabulate(dim)(j =>
      math.sin(i * 37 + j * 101).abs * 10))

  test("localLloyd: deterministic, k centers, right dim, converges on separated data") {
    // two tight blobs far apart: Lloyd's must land one center in each
    val blob1 = Array.tabulate(50)(i => Array(0.0 + i * 0.001, 0.0))
    val blob2 = Array.tabulate(50)(i => Array(100.0 + i * 0.001, 100.0))
    val sample = blob1 ++ blob2
    val c1 = Ann.localLloyd(sample, 2, seed = 7L)
    val c2 = Ann.localLloyd(sample, 2, seed = 7L)
    assert(c1.length == 2 && c1.forall(_.length == 2))
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) },
      "same seed + sample must reproduce identical centers")
    val xs = c1.map(_(0)).sorted
    assert(xs(0) < 1.0 && xs(1) > 99.0,
      s"centers must split the blobs, got ${xs.toSeq}")
    // different seed still yields k centers (init path differs)
    assert(Ann.localLloyd(sample, 2, seed = 8L).length == 2)
  }

  test("localLloyd: k exceeding distinct points degenerates without crashing") {
    val sample = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 2.0))
    val c = Ann.localLloyd(sample, 8, seed = 1L)
    assert(c.length == 8 && c.forall(_.length == 2))
  }

  test("sampleVectors: deterministic and independent of input partitioning") {
    import scala.jdk.CollectionConverters._
    val rows = vecs(500, 8).map(v =>
      org.apache.spark.sql.Row(v.toSeq)).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val df1 = spark.createDataFrame(rows.asJava, schema)
    val df2 = spark.createDataFrame(rows.reverse.asJava, schema)
      .repartition(7)
    val s1 = Ann.sampleVectors(df1, "v", 100, seed = 42L)
    val s2 = Ann.sampleVectors(df2, "v", 100, seed = 42L)
    assert(s1.length == 100)
    assert(s1.zip(s2).forall { case (a, b) => a.sameElements(b) },
      "sample must not depend on partitioning or row order")
  }

  test("nearestCell: argmin squared distance, ties to the HIGHER cell id") {
    import spark.implicits._
    val centers = Array(Array(0.0, 0.0), Array(4.0, 0.0), Array(0.0, 4.0))
    val df = Seq(
      (0L, Seq(0.1, 0.1)),   // clearly cell 0
      (1L, Seq(3.9, 0.0)),   // clearly cell 1
      (2L, Seq(2.0, 0.0)),   // exact tie cell 0 vs cell 1 -> higher (1)
      (3L, Seq(0.0, 2.0))    // exact tie cell 0 vs cell 2 -> higher (2)
    ).toDF("id", "v")
    val out = df.select(col("id"),
        Ann.nearestCell(col("v").cast("array<double>"), centers).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2), out.toString)
  }

  test("fitQuantizer assignment matches the probe side's rank-1 cell (ok_self invariant)") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val (assigned, centers) = Ann.fitQuantizer(e, "embedding", "vec_id",
      nlist = 4, seed = 42L)
    val probes = e.withColumnRenamed("vec_id", "probe_id")
    // rank-1 probed cell per probe = first cell emitted by probeCells
    // under nprobe=1
    val top1 = Ann.probeCells(probes, "embedding", "probe_id", centers,
      nprobe = 1).select(col("probe_id").as("vec_id"), col("__cell").as("__p"))
    val joined = assigned.select(col("vec_id"), col("__cell")).join(top1, "vec_id")
    assert(joined.filter(col("__cell") =!= col("__p")).count() == 0,
      "every vector's assigned cell must be its own probe's rank-1 cell")
  }
}
