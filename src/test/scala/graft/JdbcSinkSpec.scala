package graft

import graft.sources.JdbcSink

/** O15 sink semantics against a REAL JDBC database — embedded Derby (ships
  * with Spark for the Hive metastore), so the whole write→read→merge cycle
  * runs without any network.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("append + read back round-trips rows and schema") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    JdbcSink.append(df, url, "T_ROUNDTRIP", driver)
    val back = JdbcSink.readTable(spark, url, "T_ROUNDTRIP", driver)
    assert(back.count() === 2)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq === Seq("k", "name", "v"))
  }

  test("q97 JDBC read: partitioned scan with predicate + column pushdown") {
    val df = JdbcSink.q97JdbcRoundtrip(spark, sfDir)
    assert(df.collect().nonEmpty)
    // the dim-side filter and 2-column projection must compile into the
    // JDBC scan itself (the DB ships dim-sized bytes, not the table),
    // and the scan must be the 4-way partitioned range form
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PushedFilters:[^\\n]*LessThan\\(n_regionkey,3\\)".r
      .findFirstIn(plan).isDefined,
      s"predicate did not push into the JDBC scan:\n$plan")
    assert(plan.contains("numPartitions=4"),
      s"JDBC scan is not the partitioned range form:\n$plan")
    // pushdown must not change results: same rows as a post-read filter
    val dimAll = JdbcSink.readTable(spark, JdbcSink.Q97Url,
        "nation_dim", driver)
    val expected = dimAll.where($"n_regionkey" < 3)
      .select($"n_nationkey").as[Long].collect().toSet
    val pushed = spark.read.format("jdbc")
      .option("url", JdbcSink.Q97Url).option("dbtable", "nation_dim")
      .option("driver", driver).load()
      .where($"n_regionkey" < 3)
      .select($"n_nationkey").as[Long].collect().toSet
    assert(pushed === expected && pushed.nonEmpty)
  }

  test("appendIfAbsent is first-writer-wins (O12 at the sink)") {
    val first = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    JdbcSink.append(first, url, "T_NOCONFLICT", driver)
    val second = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    JdbcSink.appendIfAbsent(second, url, "T_NOCONFLICT", driver, "k")
    val got = JdbcSink.readTable(spark, url, "T_NOCONFLICT", driver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "old"), (2L, "old"), (3L, "new")))
  }

  private def exec(ddl: String): Unit = {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try { conn.createStatement().execute(ddl) } finally conn.close()
  }

  test("upsertTx is latest-wins, touches only conflicting rows, idempotent") {
    exec("CREATE TABLE T_TX (k BIGINT PRIMARY KEY, v VARCHAR(10))")
    JdbcSink.upsertTx(Seq((1L, "old"), (2L, "old")).toDF("k", "v"),
      url, "T_TX", driver, "k")
    JdbcSink.upsertTx(Seq((2L, "new"), (3L, "new")).toDF("k", "v"),
      url, "T_TX", driver, "k")
    def read() = JdbcSink.readTable(spark, url, "T_TX", driver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(read() === Seq((1L, "old"), (2L, "new"), (3L, "new")))
    // replay changes nothing
    JdbcSink.upsertTx(Seq((2L, "new"), (3L, "new")).toDF("k", "v"),
      url, "T_TX", driver, "k")
    assert(read() === Seq((1L, "old"), (2L, "new"), (3L, "new")))
  }

  test("upsertTx partition failure rolls back the WHOLE partition (atomicity)") {
    exec("CREATE TABLE T_ATOMIC (k BIGINT PRIMARY KEY, v VARCHAR(10))")
    JdbcSink.upsertTx(Seq((1L, "old"), (2L, "old")).toDF("k", "v"),
      url, "T_ATOMIC", driver, "k")
    // one partition: a valid update of k=2 followed by a row that violates
    // the VARCHAR(10) limit. If the transaction were per-statement, k=2
    // would be visible as 'new' after the failure — a half-replaced table.
    val poisoned = Seq((2L, "new"), (3L, "x" * 40)).toDF("k", "v").coalesce(1)
    val err = intercept[Exception] {
      JdbcSink.upsertTx(poisoned, url, "T_ATOMIC", driver, "k")
    }
    assert(err.getMessage != null)
    val got = JdbcSink.readTable(spark, url, "T_ATOMIC", driver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "old"), (2L, "old")),
      "reader observed a half-applied partition — rollback failed")
  }

  test("upsertTx quotes identifiers: reserved-word and mixed-case columns") {
    // 'select' is a reserved word; "MixedCase" survives only if quoted
    // with its stored spelling — unquoted SQL would fold to SELECT /
    // MIXEDCASE and fail against this DDL.
    exec("""CREATE TABLE T_QUOTED (k BIGINT PRIMARY KEY, "select" VARCHAR(10), "MixedCase" VARCHAR(10))""")
    JdbcSink.upsertTx(Seq((1L, "a", "b"), (2L, "a", "b")).toDF("k", "select", "MixedCase"),
      url, "T_QUOTED", driver, "k")
    JdbcSink.upsertTx(Seq((2L, "a2", "b2")).toDF("k", "select", "MixedCase"),
      url, "T_QUOTED", driver, "k")
    val got = JdbcSink.readTable(spark, url, "T_QUOTED", driver)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", "b"), (2L, "a2", "b2")))
  }

  test("upsertTx resolves a schema-QUALIFIED table through the catalog") {
    // Derby folds unquoted DDL to upper case: the table is stored as
    // GSCHEMA.T_QUAL. The caller passes lower-case "gschema.t_qual" —
    // the resolver must recover BOTH stored spellings from the catalog
    // (quoting the raw "gschema" text would be schema-not-found).
    exec("CREATE SCHEMA gschema")
    exec("CREATE TABLE gschema.t_qual (k BIGINT PRIMARY KEY, v VARCHAR(10))")
    JdbcSink.upsertTx(Seq((1L, "a")).toDF("k", "v"),
      url, "gschema.t_qual", driver, "k")
    JdbcSink.upsertTx(Seq((1L, "a2"), (2L, "b")).toDF("k", "v"),
      url, "gschema.t_qual", driver, "k")
    val got = JdbcSink.readTable(spark, url, "gschema.t_qual", driver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a2"), (2L, "b")))
  }

  test("Postgres dialect emits the reference's native ON CONFLICT upsert") {
    // string contract on the PG branch (no Postgres server in CI): the
    // statement must be the reference's exact merge shape,
    // user_course_activity.py:73–102 — INSERT … ON CONFLICT (user_id,
    // course_id) DO UPDATE SET <non-keys> = EXCLUDED.<non-keys>
    val q = (s: String) => "\"" + s + "\""
    val sql = JdbcSink.pgUpsertSql(q("user_course_activity"),
      Seq("user_id", "course_id", "status", "completed_at").map(q),
      Seq("user_id", "course_id").map(q),
      Seq("status", "completed_at").map(q))
    assert(sql ==
      """INSERT INTO "user_course_activity" ("user_id", "course_id", "status", "completed_at") """ +
      """VALUES (?, ?, ?, ?) """ +
      """ON CONFLICT ("user_id", "course_id") DO UPDATE SET """ +
      """"status" = EXCLUDED."status", "completed_at" = EXCLUDED."completed_at"""")
  }

  test("upsert is latest-wins and idempotent (O13 at the sink)") {
    val first = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    JdbcSink.append(first, url, "T_UPSERT", driver)
    val batch = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    JdbcSink.upsert(batch, url, "T_UPSERT", driver, "k")
    def read() = JdbcSink.readTable(spark, url, "T_UPSERT", driver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(read() === Seq((1L, "old"), (2L, "new"), (3L, "new")))
    // replaying the same batch changes nothing (refresh contract)
    JdbcSink.upsert(batch, url, "T_UPSERT", driver, "k")
    assert(read() === Seq((1L, "old"), (2L, "new"), (3L, "new")))
  }
}
