package graft

import graft.api.QContext
import org.apache.spark.sql.functions.col

/** End-to-end gate for the iceberg source (QContext.readIceberg,
  * reference read_iceberg df.py:802-832 + snapshot reads
  * logical.py:233-273). The container image ships no
  * iceberg-spark-runtime jar, so the body is guarded by an `assume`:
  * the test CANCELS (not passes) without the jar, and runs the full
  * write → snapshot → time-travel-read recipe the moment the jar is on
  * the classpath — keeping the row honestly "unverified here" rather
  * than paper-green.
  */
class IcebergSpec extends SparkSpecBase {

  private def icebergOnClasspath: Boolean =
    try {
      Class.forName("org.apache.iceberg.spark.SparkCatalog"); true
    } catch { case _: Throwable => false }

  test("iceberg write → snapshot → time-travel read roundtrip") {
    assume(icebergOnClasspath, "iceberg-spark-runtime jar not on classpath")
    val wh = java.nio.file.Files.createTempDirectory("graft_iceberg").toString
    spark.conf.set("spark.sql.catalog.graft_local",
      "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_local.warehouse", wh)
    spark.sql("CREATE TABLE graft_local.db.t (id BIGINT, v DOUBLE) USING iceberg")
    spark.sql("INSERT INTO graft_local.db.t VALUES (1, 1.5), (2, 2.5)")
    val snap1 = spark.sql(
      "SELECT snapshot_id FROM graft_local.db.t.snapshots ORDER BY committed_at")
      .head().getLong(0)
    spark.sql("INSERT INTO graft_local.db.t VALUES (3, 3.5)")
    val ctx = new QContext(spark)
    assert(ctx.readIceberg("graft_local.db.t").df.count() === 3L)
    assert(ctx.readIceberg("graft_local.db.t", Some(snap1)).df.count() === 2L)
  }
}

/** The jar-free cover for the same capability: parquet-manifest snapshot
  * tables (graft.sources.Snapshots). Unlike IcebergSpec this RUNS here —
  * q115 gates the operator against the DuckDB oracle; these specs pin
  * the commit protocol's edges. */
class SnapshotsSpec extends SparkSpecBase {
  import graft.sources.Snapshots

  private def freshDir =
    java.nio.file.Files.createTempDirectory("graft_snapspec").toString

  test("overwrite and append commits pin independent readable snapshots") {
    val s = spark
    import s.implicits._
    val dir = freshDir
    assert(Snapshots.write(Seq(1L, 2L, 3L).toDF("k"), dir) === 1L)
    assert(Snapshots.write(Seq(10L).toDF("k"), dir, "overwrite") === 2L)
    assert(Snapshots.write(Seq(20L, 30L).toDF("k"), dir, "append") === 3L)
    def keys(id: Option[Long]) =
      Snapshots.read(spark, dir, id).collect().map(_.getLong(0)).sorted.toSeq
    assert(keys(Some(1L)) === Seq(1L, 2L, 3L))
    assert(keys(Some(2L)) === Seq(10L))
    assert(keys(Some(3L)) === Seq(10L, 20L, 30L))
    assert(keys(None) === Seq(10L, 20L, 30L)) // HEAD
    val hist = Snapshots.history(spark, dir)
      .orderBy("snapshot_id").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(hist.map(_.getString(3)).toSeq ===
      Seq("overwrite", "overwrite", "append"))
    assert(hist.last.getInt(4) === 2) // append lists parent's dir + its own
  }

  test("missing snapshot id and empty table fail loudly") {
    val s = spark
    import s.implicits._
    val dir = freshDir
    intercept[IllegalArgumentException](Snapshots.read(spark, dir, None))
    Snapshots.write(Seq(1L).toDF("k"), dir)
    intercept[IllegalArgumentException](
      Snapshots.read(spark, dir, Some(99L)))
  }

  test("snapshot reads keep parquet pushdown (filter reaches the scan)") {
    val s = spark
    import s.implicits._
    val dir = freshDir
    Snapshots.write((1L to 100L).toDF("k"), dir)
    val plan = Snapshots.read(spark, dir).filter(col("k") === 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,5)]"), plan)
  }
}
