package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Session/context object — the engine's entry point.
  *
  * Mirrors the reference context's read surface (reference:
  * pyquokka/df.py:264-832) re-expressed on `spark.read`. Where the
  * reference hand-rolls schema sniffing, small-file materialization and
  * S3-prefix walking, Spark's DataSource framework already does all of it,
  * so this class is a thin veneer that returns [[DataStream]] wrappers.
  */
class QContext(val spark: SparkSession) {
  graft.functions.GraftFunctions.register(spark)

  /** CSV file or directory (reference df.py:264-411). */
  def readCsv(
      path: String,
      schema: Option[StructType] = None,
      hasHeader: Boolean = true,
      sep: String = ","): DataStream = {
    var r = spark.read.option("sep", sep).option("header", hasHeader.toString)
    r = schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
    new DataStream(r.csv(path))
  }

  /** Parquet file/dir/prefix (reference df.py:413-562). `nameColumn` adds
    * the source filename (reference's `name_column`) via
    * `input_file_name()`. */
  def readParquet(path: String, nameColumn: Option[String] = None): DataStream = {
    val df = spark.read.parquet(path)
    new DataStream(nameColumn.fold(df)(c =>
      df.withColumn(c, org.apache.spark.sql.functions.input_file_name())))
  }

  /** JSON lines (reference dataset/unordered_readers.py:445-593). */
  /** ORC source (parity-plus: the other first-class columnar lake format
    * Spark reads natively — same pushdown/pruning machinery as parquet). */
  def readOrc(path: String): DataStream =
    new DataStream(spark.read.orc(path))

  def readJson(path: String, schema: Option[StructType] = None): DataStream = {
    val r = spark.read
    new DataStream(schema.map(r.schema).getOrElse(r).json(path))
  }

  /** Directory of binary blobs → (path, modificationTime, length, content)
    * (reference df.py:213-253 `read_files`). */
  def readFiles(path: String): DataStream =
    new DataStream(spark.read.format("binaryFile").load(path))

  /** Parquet with a sortedness contract on `timeCol` — the reference's
    * `read_sorted_parquet` (df.py:790-800). Spark gives no cross-partition
    * order, so the contract is (re-)established lazily by the ordered
    * operators themselves (range partition + sortWithinPartitions); this
    * tags the stream and, with `verify = true`, checks the contract the
    * way the reference's sorted reader does — per-file time ranges must
    * not overlap (ordered_readers.py:28-100 reads row-group min/max
    * stats; here one column-pruned aggregate over (file → min, max),
    * which parquet answers from footer statistics, not data pages). */
  def readSortedParquet(path: String, timeCol: String,
      verify: Boolean = false): OrderedStream = {
    val df = spark.read.parquet(path)
    if (verify) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val ranges = df
        .groupBy(input_file_name().as("file"))
        .agg(min(col(timeCol)).as("lo"), max(col(timeCol)).as("hi"))
      // native-type comparison via a lag window over files ordered by lo
      // (file count is small; the heavy part was the column-pruned agg)
      val w = Window.orderBy(col("lo"))
      val bad = ranges
        .withColumn("prev_hi", lag(col("hi"), 1).over(w))
        .withColumn("prev_file", lag(col("file"), 1).over(w))
        .filter(col("prev_hi").isNotNull && col("lo") <= col("prev_hi"))
        .select(col("prev_file"), col("file"))
        .limit(1).collect()
      bad.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"sortedness contract violated on '$timeCol': file time ranges " +
            s"overlap between ${r.getString(0)} and ${r.getString(1)}")
      }
    }
    new OrderedStream(df, timeCol)
  }

  def readSortedCsv(
      path: String,
      timeCol: String,
      schema: Option[StructType] = None,
      hasHeader: Boolean = true,
      sep: String = ","): OrderedStream =
    new OrderedStream(readCsv(path, schema, hasHeader, sep).df, timeCol)

  /** Iceberg table, optionally at a snapshot (reference `read_iceberg`,
    * df.py:802-832 via pyiceberg+Glue; here the standard Spark-Iceberg
    * integration — requires the iceberg-spark-runtime jar and catalog
    * config on the session, the deployment-standard setup). */
  def readIceberg(table: String, snapshotId: Option[Long] = None): DataStream = {
    val r = spark.read.format("iceberg")
    new DataStream(snapshotId.fold(r)(id =>
      r.option("snapshot-id", id.toString)).load(table))
  }

  /** Paginated REST API as a source (reference `read_rest_get/post`,
    * df.py:655-663 + dataset/crypto_dataset.py:4-83). The fetcher is
    * injectable (page index → JSON body, None = exhausted); pages are
    * pulled on the driver — matching the reference, whose reader also
    * materializes the feed — then parallelized and parsed by the JSON
    * datasource. For truly large feeds implement a DataSourceV2; this
    * covers the reference's bounded-feed semantics. */
  def readRest(fetchPage: Int => Option[String], maxPages: Int = 10000): DataStream = {
    val records = Iterator.from(0).map(fetchPage)
      .takeWhile(_.isDefined).take(maxPages).flatten
      .flatMap(_.linesIterator).filter(_.trim.nonEmpty).toSeq
    import spark.implicits._
    new DataStream(spark.read.json(spark.createDataset(records)))
  }

  /** Local data → stream (reference df.py:713-788 from_polars/pandas/arrow). */
  /** N-input custom stateful operator — the reference's `mingle`
    * (df.py:837-849, its "internal as much as it can" multi-source
    * StatefulNode; the runtime hands each Executor `(batches, stream_id)`,
    * executors/\*.py). Spark-first shape: every source is projected to the
    * common layout and tagged with its stream id, the union is hash-
    * partitioned on `partitionBy` and time-sorted within partitions, and
    * `f` consumes `(streamId, row)` — one shuffle, arbitrary fan-in,
    * identical information to the reference's executor contract. */
  def mingle[T: org.apache.spark.sql.Encoder](
      sources: Map[Int, DataFrame],
      partitionBy: Seq[String],
      orderWithinPartitionBy: Seq[String])(
      f: Iterator[(Int, org.apache.spark.sql.Row)] => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    require(sources.nonEmpty, "mingle needs at least one source")
    import org.apache.spark.sql.functions._
    val common = sources.values.head.columns.toSeq
    val tagged = sources.map { case (sid, d) =>
      d.select(common.map(col) :+ lit(sid).as("__stream"): _*)
    }.reduce(_ unionByName _)
    val sidIdx = common.length
    new DataStream(tagged)
      .statefulTransform(partitionBy, orderWithinPartitionBy) { it =>
        f(it.map(r => (r.getInt(sidIdx), r)))
      }
  }

  def fromDataFrame(df: DataFrame): DataStream = new DataStream(df)

  def fromSeq[T: org.apache.spark.sql.Encoder](rows: Seq[T]): DataStream =
    new DataStream(spark.createDataset(rows).toDF())

  /** Re-stream a cached result (reference df.py:665-710 read_dataset). */
  def readDataset(ds: DataStream): DataStream = ds

  /** Native SQL entry point. The reference transpiles DuckDB plans into its
    * DataStream API (pyquokka/sql.py:74-280); Spark parses SQL natively. */
  def sql(query: String): DataStream = new DataStream(spark.sql(query))

  /** Runtime config knobs (reference df.py set_config/get_config — there
    * they toggle the hand-rolled optimizer; here they reach Spark SQL
    * conf, e.g. "spark.sql.autoBroadcastJoinThreshold"). */
  def setConfig(key: String, value: String): Unit = spark.conf.set(key, value)
  def getConfig(key: String): String = spark.conf.get(key)
}

object QContext {
  def apply(spark: SparkSession): QContext = new QContext(spark)
}
