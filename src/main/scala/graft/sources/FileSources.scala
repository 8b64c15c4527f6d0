package graft.sources

import graft.ingest.CourseFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** json/csv file sources (SURVEY §2.2 "Scans / sources / sinks").
  *
  * The reference's native payload format is JSON (course_catalog.py:187);
  * CSV is the fixture-authoring format. Both queries write their fixture
  * to a deterministic temp location and read it back through the REAL
  * `spark.read` path (schema-first, not inferred — the reference's
  * fixed-shape contract), so the source machinery itself is under the
  * oracle: the DuckDB twins consume the SAME rows embedded as literals,
  * never the files.
  */
object FileSources {

  private def fixtureDir: String = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"), "graft_fixtures")
    Files.createDirectories(d)
    d.toString
  }

  private def writeFixture(name: String, content: String): String = {
    val p = Paths.get(fixtureDir, name)
    Files.write(p, content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    p.toString
  }

  // ─── q55: JSON-lines source ───────────────────────────────────────────
  // The course records as a .jsonl file → schema-first read → aggregate.
  def q55JsonSource(s: SparkSession, d: String): DataFrame = {
    val path = writeFixture("courses.jsonl", CourseFixture.records.mkString("\n"))
    s.read.schema(CourseFixture.schema).json(path)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"),
           sum(col("num_lectures")).cast("long").as("total_lectures"))
      .orderBy(col("level"))
  }

  val q55Sql: String =
    s"""SELECT json_extract_string(body, '$$.level') AS level,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(json_extract(body, '$$.num_lectures') AS BIGINT))
       |       AS BIGINT) AS total_lectures
       |FROM ${CourseFixture.valuesClause}
       |GROUP BY 1
       |ORDER BY level""".stripMargin

  // ─── q56: CSV source ──────────────────────────────────────────────────
  /** (activity-shaped) fixture rows: user, course_category, minutes. */
  val csvRows: Seq[(Long, String, Double)] = Seq(
    (1L, "Development", 125.5), (2L, "Development", 30.25),
    (3L, "IT Operations", 210.0), (4L, "Business", 15.75),
    (5L, "Development", 88.5), (6L, "Business", 240.0),
    (7L, "IT Operations", 55.25), (8L, "Development", 10.0))

  private val csvSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("course_category", StringType),
    StructField("minutes", DoubleType)))

  def q56CsvSource(s: SparkSession, d: String): DataFrame = {
    val content = "user_id,course_category,minutes\n" +
      csvRows.map { case (u, c, m) => s"$u,$c,$m" }.mkString("\n")
    val path = writeFixture("activity.csv", content)
    s.read.option("header", "true").schema(csvSchema).csv(path)
      .groupBy(col("course_category"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("minutes")), 2).as("total_minutes"))
      .orderBy(col("course_category"))
  }

  val q56Sql: String = {
    val values = csvRows
      .map { case (u, c, m) => s"($u, '$c', $m)" }.mkString(", ")
    s"""SELECT course_category, CAST(count(*) AS BIGINT) AS n,
       |  round(sum(minutes), 2) AS total_minutes
       |FROM (VALUES $values) v(user_id, course_category, minutes)
       |GROUP BY course_category
       |ORDER BY course_category""".stripMargin
  }

  // ─── q57: paginated source end-to-end (O1 + O16 retry) ────────────────
  // A 3-page fixture run through Pagination.fetchAll with the catalog
  // retry policy; page 2 serves a transient 524 on its first attempt, so
  // the retried fetch is ON the oracle-checked path. The sleep is
  // injected as a no-op (the schedule itself is unit-tested).
  def q57PaginatedIngest(s: SparkSession, d: String): DataFrame = {
    val rec = CourseFixture.records
    val pages = Map(
      "p1" -> Pagination.Page(rec.slice(0, 2), Some("p2")),
      "p2" -> Pagination.Page(rec.slice(2, 3), Some("p3")),
      "p3" -> Pagination.Page(rec.slice(3, 4), None))
    var p2Failures = 1
    val fetch: String => Either[Pagination.Failure, Pagination.Page] = {
      case "p2" if p2Failures > 0 =>
        p2Failures -= 1; Left(Pagination.Failure.Http(524))
      case u => Right(pages(u))
    }
    val (bodies, stats) =
      Pagination.fetchAll("p1", fetch, Pagination.catalogPolicy)
    require(stats.records == 4 && stats.retries == 1 && !stats.aborted,
      s"unexpected ingest stats: $stats")
    Pagination.toDF(s, bodies, CourseFixture.schema)
      .groupBy(col("locale.locale").as("locale"))
      .agg(count(lit(1)).as("n"),
           max(col("estimated_content_length")).cast("long").as("max_len"))
      .orderBy(col("locale"))
  }

  val q57Sql: String =
    s"""SELECT json_extract_string(body, '$$.locale.locale') AS locale,
       |  CAST(count(*) AS BIGINT) AS n,
       |  max(CAST(json_extract(body, '$$.estimated_content_length') AS BIGINT))
       |    AS max_len
       |FROM ${CourseFixture.valuesClause}
       |GROUP BY 1
       |ORDER BY locale""".stripMargin

  // ─── q109: XML source (Spark 4 built-in StaxXmlParser) ────────────────
  // The third fixture-authoring format after json/csv: course records as
  // an XML document — element attributes (`id`), nested elements
  // (`<locale><code>`), repeated rows under a rowTag. Schema-first like
  // q55/q56: attributes surface as `_`-prefixed fields, nested elements
  // as structs. The DuckDB twin consumes the same rows as literals (DuckDB
  // has no XML reader — which is the point: this is engine surface).
  val xmlRows: Seq[(Long, String, String, Long, String)] = Seq(
    (101L, "Intro to Spark", "Beginner", 12L, "en_US"),
    (102L, "Advanced Joins", "Expert", 30L, "en_US"),
    (103L, "Streaming 101", "Beginner", 18L, "de_DE"),
    (104L, "Warehouse Design", "Intermediate", 24L, "en_US"),
    (105L, "Query Tuning", "Expert", 21L, "de_DE"),
    (106L, "ETL Patterns", "Intermediate", 15L, "fr_FR"))

  private val xmlSchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("title", StringType),
    StructField("level", StringType),
    StructField("num_lectures", LongType),
    StructField("locale", StructType(Seq(StructField("code", StringType))))))

  def q109XmlSource(s: SparkSession, d: String): DataFrame = {
    val doc = xmlRows.map { case (id, t, lv, n, loc) =>
      s"""  <course id="$id"><title>$t</title><level>$lv</level>""" +
        s"<num_lectures>$n</num_lectures>" +
        s"<locale><code>$loc</code></locale></course>"
    }.mkString("<courses>\n", "\n", "\n</courses>")
    val path = writeFixture("courses.xml", doc)
    s.read.option("rowTag", "course").schema(xmlSchema)
      .format("xml").load(path)
      .groupBy(col("level"), col("locale.code").as("locale"))
      .agg(count(lit(1)).as("n"),
           sum(col("num_lectures")).cast("long").as("total_lectures"),
           min(col("_id")).cast("long").as("first_id"))
      .orderBy(col("level"), col("locale"))
  }

  val q109Sql: String = {
    val values = xmlRows
      .map { case (id, t, lv, n, loc) => s"($id, '$t', '$lv', $n, '$loc')" }
      .mkString(", ")
    s"""SELECT level, locale, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(num_lectures) AS BIGINT) AS total_lectures,
       |  CAST(min(id) AS BIGINT) AS first_id
       |FROM (VALUES $values) v(id, title, level, num_lectures, locale)
       |GROUP BY level, locale
       |ORDER BY level, locale""".stripMargin
  }

  // ─── q118: parquet schema evolution (mergeSchema over epochs) ─────────
  // The data-lake reality the reference's fixed DDL forecloses: a column
  // added mid-history. Two parquet "epochs" land under one root
  // (epoch=N partition dirs — partition DISCOVERY surfaces `epoch` as a
  // column); epoch 1 predates `num_lectures`. `mergeSchema=true` unions
  // the footers into one superset schema with NULL backfill — the read-
  // side contract that lets a 100 TB lake evolve without rewriting old
  // files. SqlTextSpec asserts the same frame is reachable through
  // `unionByName(allowMissingColumns)` — the in-memory twin of the same
  // evolution.
  val evoEpoch1: Seq[(Long, String)] =
    Seq((201L, "Beginner"), (202L, "Expert"), (203L, "Beginner"))
  val evoEpoch2: Seq[(Long, String, Long)] =
    Seq((204L, "Beginner", 12L), (205L, "Expert", 30L),
        (206L, "Intermediate", 15L))

  def q118SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = Paths.get(fixtureDir, "evolve").toString
    evoEpoch1.toDF("id", "level")
      .write.mode("overwrite").parquet(s"$root/epoch=1")
    evoEpoch2.toDF("id", "level", "num_lectures")
      .write.mode("overwrite").parquet(s"$root/epoch=2")
    s.read.option("mergeSchema", "true").parquet(root)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"),
           sum(col("num_lectures")).cast("long").as("total_lectures"),
           min(col("epoch")).cast("int").as("first_epoch"))
      .orderBy(col("level"))
  }

  val q118Sql: String = {
    val v1 = evoEpoch1.map { case (id, lv) => s"($id, '$lv', NULL, 1)" }
    val v2 = evoEpoch2.map { case (id, lv, n) => s"($id, '$lv', $n, 2)" }
    val values = (v1 ++ v2).mkString(", ")
    s"""SELECT level, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(num_lectures) AS BIGINT) AS total_lectures,
       |  CAST(min(epoch) AS INT) AS first_epoch
       |FROM (VALUES $values) v(id, level, num_lectures, epoch)
       |GROUP BY level
       |ORDER BY level""".stripMargin
  }

  // ─── q127: parquet AGGREGATE pushdown — the metadata-only scan ───────
  // MIN/MAX/COUNT with no filter and no grouping answer from parquet
  // FOOTER STATISTICS: the scan reads row-group metadata, zero data
  // pages. At 100 TB that is the difference between a full-corpus pass
  // and a few thousand footer reads — the same lever behind `SELECT
  // count(*)` returning in milliseconds on warehouse engines. Spark
  // gates this behind the DSv2 parquet path (`useV1SourceList` minus
  // parquet) + `spark.sql.parquet.aggregatePushdown`; both are set only
  // around relation resolution and restored after (the shared session's
  // other readers — notably the events TIMESTAMP_NANOS override — stay
  // on their default path). The pushdown itself is visible in the plan
  // as `PushedAggregation: [COUNT(*), MIN(...), MAX(...)]` —
  // StorageSpec asserts it; here the oracle checks the VALUES.
  // Timestamp/binary columns don't qualify (footer stats unreliable
  // there — parquet min/max on them is engine-dependent), so the probe
  // sticks to the numeric fact columns.
  def q127AggPushdown(s: SparkSession, d: String): DataFrame = {
    val conf = s.conf
    val (v1Key, aggKey) =
      ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown")
    val (oldV1, oldAgg) = (conf.get(v1Key), conf.get(aggKey))
    val pushed =
      try {
        conf.set(v1Key, oldV1.split(",").filterNot(_.trim == "parquet").mkString(","))
        conf.set(aggKey, "true")
        // relation + scan builder resolve HERE, on the V2 path
        val df = s.read.parquet(s"$d/lineitem.parquet")
          .agg(count(lit(1)).as("n_rows"),
               min(col("l_quantity")).as("min_qty"),
               max(col("l_quantity")).as("max_qty"),
               min(col("l_orderkey")).as("min_ok"),
               max(col("l_orderkey")).as("max_ok"))
        // the pushdown itself happens in the OPTIMIZER
        // (V2ScanRelationPushDown reads the agg conf then, not at
        // resolution) — force planning inside the conf window so the
        // pushed scan is baked into the lazy queryExecution the caller
        // executes later. NB: the df returned must be THIS df — any
        // further transformation (even a no-op select) creates a fresh
        // QueryExecution that would re-optimize after the conf reset.
        df.queryExecution.executedPlan
        df
      } finally { conf.set(v1Key, oldV1); conf.set(aggKey, oldAgg) }
    pushed
  }

  val q127Sql: String =
    """SELECT count(*) AS n_rows,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem""".stripMargin

  // ─── q283: ORC sink → source round-trip with predicate pushdown ───────
  // The third columnar format next to parquet (Tables) and the text
  // family above: a lineitem slice goes through the REAL ORC writer
  // (zlib) and back through `spark.read.orc` with a quantity predicate —
  // ORC translates it into its own search argument (PushedFilters), so
  // the scan skips stripes the way a 100 TB ORC lake would. The census
  // is oracle-checked against the ORIGINAL parquet rows: equality is
  // the losslessness proof of the round-trip (types, timestamps,
  // doubles), not a replay of the same read path.
  def q283OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = Paths.get(fixtureDir, "lineitem_orc").toString
    graft.Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
              col("l_shipdate"))
      .write.mode("overwrite").format("orc")
      .option("compression", "zlib").save(out)
    s.read.orc(out)
      .where(col("l_quantity") >= 25.0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
           round(sum(col("l_quantity")), 2).as("sum_qty"),
           min(col("l_shipdate")).as("first_ship"),
           max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("l_returnflag"))
  }

  val q283Sql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      |FROM lineitem
      |WHERE l_quantity >= 25.0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q283_orc_roundtrip"   -> (q283OrcRoundtrip _),
    "q127_agg_pushdown"    -> (q127AggPushdown _),
    "q55_json_source"      -> (q55JsonSource _),
    "q56_csv_source"       -> (q56CsvSource _),
    "q57_paginated_ingest" -> (q57PaginatedIngest _),
    "q109_xml_source"      -> (q109XmlSource _),
    "q118_schema_evolution" -> (q118SchemaEvolution _),
  )

  val oracleSql: Map[String, String] = Map(
    "q283_orc_roundtrip"   -> q283Sql,
    "q127_agg_pushdown"    -> q127Sql,
    "q55_json_source"      -> q55Sql,
    "q56_csv_source"       -> q56Sql,
    "q57_paginated_ingest" -> q57Sql,
    "q109_xml_source"      -> q109Sql,
    "q118_schema_evolution" -> q118Sql,
  )
}
