package graft

import org.apache.parquet.schema.LogicalTypeAnnotation
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
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). Branch on the parquet
    * footer's EXPLICIT logical-type annotation (a footer-only read):
    *   - TIMESTAMP(MILLIS/MICROS, adjustedToUTC=true): read as-is.
    *   - TIMESTAMP(MILLIS/MICROS, adjustedToUTC=false) (NTZ): cast to
    *     TimestampType; value-preserving because every entry point pins
    *     spark.sql.session.timeZone=UTC.
    *   - TIMESTAMP(NANOS): read the physical INT64 via a schema override
    *     and convert to a microsecond TimestampType with integer division
    *     (`div`, not `/` — epoch-nanos ≈ 1.7e18 exceeds the 2^53 double
    *     mantissa, so float division would corrupt timestamps).
    *   - anything else — in particular an UNANNOTATED INT64, which an
    *     earlier inference-based sniff silently routed to the div-1000
    *     branch — throws. A future generator shipping unannotated micros
    *     must fail loudly, not collapse timestamps 1000×.
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The footer logical-type annotation of events.ts — read straight from
    * the first parquet data file's metadata (parquet-hadoop is already on
    * Spark's classpath), not via Spark inference, because inference cannot
    * distinguish "illegal nanos annotation" from "corrupt file" (both
    * throw) or "unannotated INT64" from a generator bug (both infer long).
    */
  private def eventsTsAnnotation(
      s: SparkSession, path: String): Option[LogicalTypeAnnotation] = {
    val conf = s.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val dataFile =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") &&
                       !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName).headOption
          .getOrElse(throw new IllegalStateException(
            s"no parquet part files under $path"))
      else p
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dataFile, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      Option(schema.getType(Seq("ts"): _*).asPrimitiveType
        .getLogicalTypeAnnotation)
    } finally reader.close()
  }

  def events(s: SparkSession, d: String): DataFrame = {
    import LogicalTypeAnnotation.TimeUnit
    val path = s"$d/events.parquet"
    eventsTsAnnotation(s, path) match {
      case Some(t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
          if t.getUnit != TimeUnit.NANOS && t.isAdjustedToUTC =>
        s.read.parquet(path)
      case Some(t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
          if t.getUnit != TimeUnit.NANOS =>
        s.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case Some(_: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        // TIMESTAMP(NANOS) — the legacy encoding Spark refuses natively
        s.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts at $path carries unsupported parquet annotation " +
          s"${other.getOrElse("NONE (unannotated INT64)")} — refusing to " +
          "guess a unit (a silent div-1000 on unannotated micros would " +
          "collapse 2024 into 1970)")
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
