package graft

import graft.vector.{PqIndex, VectorOps}
import org.apache.spark.sql.functions._

/** IVF_PQ: packed-code compression, ADC probe, recall, determinism. */
class PqIndexSpec extends SparkSpecBase {

  private def emb() =
    spark.read.parquet(sf() + "/embeddings.parquet")

  test("codes pack 16 nibbles into one long; probe is deterministic") {
    val e = emb()
    val dir = java.nio.file.Files
      .createTempDirectory("pq_spec_det").toString
    assert(PqIndex.build(e, "embedding", "vec_id", dir, nlist = 8) == 1L)
    // one int64 per vector — the 32x compression claim, checked at the
    // storage boundary
    val codes = graft.sources.Snapshots
      .read(spark, s"$dir/codes", Some(1L))
    assert(codes.schema("code").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(codes.count() == e.count())
    val probes = e.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "probe_id")
    def run() = PqIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(run() == run())
  }

  test("ADC recall vs exact brute force clears a sane floor") {
    val e = emb()
    val probes = e.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "probe_id")
    val dir = java.nio.file.Files
      .createTempDirectory("pq_spec_recall").toString
    PqIndex.build(e, "embedding", "vec_id", dir, nlist = 8)
    val exact = VectorOps.nnJoin(e, probes, "embedding", "vec_id",
        "probe_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = PqIndex.probe(probes, "embedding", "probe_id", dir,
        k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"PQ recall@5: $recall")
    assert(recall >= 0.3, s"recall=$recall")
  }
}
