package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders over the driver-provided parquet dirs. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
  def lineitem(s: SparkSession, d: String) = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String) = t(s, d, "orders")
  def customer(s: SparkSession, d: String) = t(s, d, "customer")
  def supplier(s: SparkSession, d: String) = t(s, d, "supplier")
  def part(s: SparkSession, d: String) = t(s, d, "part")
  def nation(s: SparkSession, d: String) = t(s, d, "nation")
  def region(s: SparkSession, d: String) = t(s, d, "region")
  def events(s: SparkSession, d: String) = t(s, d, "events")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
