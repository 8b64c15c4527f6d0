package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  /** events.ts has shipped in two encodings across testdata generations:
    * plain TIMESTAMP(MICROS) (current) and TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). Sniff the footer via
    * schema inference — a footer-only read — and branch:
    *   - TimestampType: read as-is.
    *   - TimestampNTZType (isAdjustedToUTC=false micros): cast to
    *     TimestampType; value-preserving because every entry point pins
    *     spark.sql.session.timeZone=UTC.
    *   - anything else (inference throws on the illegal nanos annotation,
    *     or an unannotated INT64 infers LongType): read the physical INT64
    *     via a schema override and convert to a microsecond TimestampType
    *     with integer division (`div`, not `/` — epoch-nanos ≈ 1.7e18
    *     exceeds the 2^53 double mantissa, so float division would corrupt
    *     timestamps).
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val inferredTs =
      try Some(s.read.parquet(path).schema("ts").dataType)
      catch { case scala.util.control.NonFatal(_) => None }
    inferredTs match {
      case Some(TimestampType) => s.read.parquet(path)
      case Some(TimestampNTZType) =>
        s.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        s.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql(...)` text queries
    * run against the same data — the reference's third entry point (SQL
    * over the produced schema, SURVEY §3.3).
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}
