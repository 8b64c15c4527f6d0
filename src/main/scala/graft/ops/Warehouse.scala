package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-analytics surface the reference's star schema exists to serve
  * (SURVEY §2 preamble: query capability is delegated to the PostgreSQL
  * schema, course_catalog_database.sql:90–106): exact distribution
  * statistics, relational PIVOT, correlated subqueries through the SQL
  * text entry, and slowly-changing-dimension (type 2) history build — the
  * four ops every BI consumer of such a schema runs.
  */
object Warehouse {

  // ─── q77: exact percentiles / quartile profile per group ──────────────
  // Spark's `percentile` is the EXACT linear-interpolation aggregate
  // (one sort-based agg per group; for 100 TB you'd reach for
  // approx_percentile — q28 already demonstrates the sketch path, so this
  // is the exact twin). DuckDB's quantile_cont uses the same type-7
  // interpolation, making the hash comparable.
  def q77Percentiles(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(l_quantity, 0.25D)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5D)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75D)"), 4).as("p75"),
        round(avg(col("l_quantity")), 4).as("mean_qty"))
      .orderBy(col("l_returnflag"))

  val q77Sql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |  round(avg(l_quantity), 4) AS mean_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q78: PIVOT — order revenue, nation × order-year matrix ───────────
  // Uses the relational `.pivot(col, values)` operator with the value set
  // STATED (1995–2001): stating values keeps the plan a single pass
  // (unknown values would force a distinct-collect planning job first,
  // a driver round-trip you don't want on a 100 TB fact table). Pivot
  // compiles to one hash aggregate over (nation) with 7 conditional sums —
  // the same plan the CASE-based oracle describes.
  private val Years: Seq[Int] = 1995 to 2001

  def q78Pivot(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
    val df = orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"),
              year(col("o_orderdate")).as("o_year"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_year", Years)
      .agg(round(sum(col("o_totalprice")), 2))
    Years.foldLeft(df)((acc, y) => acc.withColumnRenamed(y.toString, s"y$y"))
      .orderBy(col("n_name"))
  }

  val q78Sql: String = {
    val cases = Years.map(y =>
      s"round(sum(CASE WHEN year(o_orderdate) = $y THEN o_totalprice END), 2) AS y$y")
      .mkString(",\n  ")
    s"""SELECT n_name,
       |  $cases
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin
  }

  // ─── q79: correlated subqueries through the SQL text entry ────────────
  // EXISTS + NOT EXISTS + a scalar subquery, written as SQL text: Catalyst
  // decorrelates all three into joins (RewriteCorrelatedScalarSubquery /
  // RewritePredicateSubquery — EXISTS becomes a left-semi, NOT EXISTS a
  // left-anti, the scalar an aggregated broadcast join), so the executed
  // plan is the q04/q08 shape, never a per-row re-execution.
  private val q79Text =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o2
      |    WHERE o2.o_custkey = c.c_custkey
      |      AND o2.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey
      |LIMIT 50""".stripMargin

  def q79Subqueries(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(q79Text)
  }

  val q79Sql: String = q79Text // ANSI — runs verbatim in DuckDB

  // ─── q80: SCD type-2 history from an event stream ─────────────────────
  // Collapse each user's event-type timeline into validity ranges
  // [valid_from, valid_to) with an is_current flag — the standard
  // change-capture dimension build (the reference's refresh strategy keeps
  // only latest-wins state, README.md:156–163; type 2 is what a warehouse
  // keeps instead when history matters). Two window passes over the same
  // (user_id × time) partitioning — Spark reuses the sort: change-point
  // detection via lag, then range close-off via lead over the survivors.
  def q80Scd2(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .where(pmod(col("user_id"), lit(20)) === 0)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .select(col("user_id"), col("event_type"),
              col("ts").as("valid_from"), col("valid_to"),
              col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }

  val q80Sql: String =
    """WITH changes AS (
      |  SELECT user_id, event_type, ts, event_id
      |  FROM (
      |    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |      lag(event_type) OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS prev_type
      |    FROM events
      |    WHERE user_id % 20 = 0)
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current
      |FROM changes
      |ORDER BY user_id, valid_from, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_percentiles" -> (q77Percentiles _),
    "q78_pivot"       -> (q78Pivot _),
    "q79_subqueries"  -> (q79Subqueries _),
    "q80_scd2"        -> (q80Scd2 _))

  val oracleSql: Map[String, String] = Map(
    "q77_percentiles" -> q77Sql,
    "q78_pivot"       -> q78Sql,
    "q79_subqueries"  -> q79Sql,
    "q80_scd2"        -> q80Sql)
}
