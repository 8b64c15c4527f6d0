package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. At cluster scale
  * these would be partitioned directories; the reader API is identical —
  * `spark.read.parquet(path)` — and all downstream operators are written
  * against the schema, not the file layout, so swapping in a partitioned
  * 100 TB layout (plus bucketing on the join keys) requires no operator
  * changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
