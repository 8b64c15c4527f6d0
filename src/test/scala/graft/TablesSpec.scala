package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the events-ts encoding split (round-6 incident:
  * the testdata generator moved from TIMESTAMP(NANOS) to plain
  * TIMESTAMP(MICROS) and the reader kept dividing by 1000, collapsing
  * 2024 into January 1970). Both branches are pinned here: the current
  * microsecond files must come through untouched, and a synthetic
  * nanos-annotated file must still take the INT64 `div 1000` path.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  test("events reader lands driver-generated timestamps in 2024, typed TimestampType") {
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType == TimestampType)
    val yrs = e.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    assert(yrs.getInt(0) == 2024, s"min year ${yrs.getInt(0)} — reader is corrupting ts again")
    assert(yrs.getInt(1) == 2024)
  }

  test("legacy TIMESTAMP(NANOS) files still take the div-1000 branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos-events").toFile
    dir.deleteOnExit()
    val file = new Path(s"${dir.getAbsolutePath}/events.parquet")
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64).named("event_id")
      .optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .optional(PrimitiveTypeName.INT64).named("user_id")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(PrimitiveTypeName.DOUBLE).named("value")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter.builder(file)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(schema)
      .build()
    val fac = new SimpleGroupFactory(schema)
    // 2024-01-15T12:00:00Z in epoch NANOseconds
    val nanos = 1705320000000000000L
    try (0 until 3).foreach { i =>
      val g = fac.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", nanos + i * 1000000000L)
      g.add("user_id", 42L)
      g.add("event_type", "click")
      g.add("value", 1.0)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()

    val e = Tables.events(spark, dir.getAbsolutePath)
    assert(e.schema("ts").dataType == TimestampType)
    val r = e.agg(min(col("ts")).cast("string").as("lo"), count(lit(1)).as("n")).head()
    assert(r.getString(0) == "2024-01-15 12:00:00", s"got ${r.getString(0)}")
    assert(r.getLong(1) == 3L)
  }

  test("UNANNOTATED INT64 ts fails loudly instead of guessing a unit") {
    // the advisory case: a future generator shipping plain INT64 micros
    // with no logical-type annotation must NOT take the div-1000 branch
    // (which would collapse timestamps 1000×) — the reader throws.
    val dir = java.nio.file.Files.createTempDirectory("graft-raw-events").toFile
    dir.deleteOnExit()
    val file = new Path(s"${dir.getAbsolutePath}/events.parquet")
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64).named("event_id")
      .optional(PrimitiveTypeName.INT64).named("ts") // no annotation
      .optional(PrimitiveTypeName.INT64).named("user_id")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(PrimitiveTypeName.DOUBLE).named("value")
      .optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter.builder(file)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(schema)
      .build()
    val fac = new SimpleGroupFactory(schema)
    try {
      val g = fac.newGroup()
      g.add("event_id", 0L)
      g.add("ts", 1705320000000000L) // 2024-01-15T12:00:00Z in MICROS
      g.add("user_id", 42L)
      g.add("event_type", "click")
      g.add("value", 1.0)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()

    val err = intercept[IllegalStateException] {
      Tables.events(spark, dir.getAbsolutePath)
    }
    assert(err.getMessage.contains("unannotated"), err.getMessage)
  }
}
