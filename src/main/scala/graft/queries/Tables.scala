package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders over the driver-provided parquet dirs. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }
  def lineitem(s: SparkSession, d: String) = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String) = t(s, d, "orders")
  def customer(s: SparkSession, d: String) = t(s, d, "customer")
  def supplier(s: SparkSession, d: String) = t(s, d, "supplier")
  def part(s: SparkSession, d: String) = t(s, d, "part")
  def nation(s: SparkSession, d: String) = t(s, d, "nation")
  def region(s: SparkSession, d: String) = t(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long and convert (µs precision — the driver
    * data carries µs). Requires `spark.sql.legacy.parquet.nanosAsLong`
    * set at session build — loaders must not mutate shared session conf
    * (round-8 verdict's cross-suite-state hazard). */
  def events(s: SparkSession, d: String) = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(events.ts is parquet TIMESTAMP(NANOS))")
    import org.apache.spark.sql.functions._
    t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
