package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.2).
  *
  * The reference (sha0h0ng/ub-etl) builds a star schema explicitly designed
  * for joins and aggregation (course_catalog_database.sql:90–106 bridge
  * tables; user_course_activity_database.sql:11–13 metric columns) but
  * delegates all query execution to PostgreSQL. This object is the engine's
  * native implementation of that consumption contract: scans, projections,
  * filters, the full join family, hash aggregation, windows, set ops,
  * sorts/top-k and scalar functions — all as declarative DataFrame plans so
  * Catalyst does pushdown/pruning/broadcast/codegen.
  *
  * Determinism contract (for the DuckDB oracle): every query ends in an
  * orderBy over a unique key combination, float aggregates are rounded, and
  * all timestamps are UTC.
  */
object Relational {

  /** revenue = extendedprice * (1 - discount), the standard star-schema
    * money expression. Kept as a Column so codegen fuses it into the scan.
    */
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ─── q01: pricing summary (scan → filter → hash agg → sort) ───────────
  // Exercises: parquet scan with predicate pushdown, two-phase hash
  // aggregation (partial map-side combine is Catalyst-automatic), tiny
  // 4-group result. At 100 TB this is the ideal shape: one pass, no join,
  // shuffle carries only 4 groups × partial buffers.
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ─── q02: revenue by region (flagship; 5-way star join) ───────────────
  // lineitem ⋈ orders (big-big, sort-merge / shuffled hash under AQE)
  // then customer ⋈ nation ⋈ region: nation+region are O(25)/O(5) rows at
  // ANY scale factor — broadcast explicitly so the big side never shuffles
  // for them. customer is left to AQE: broadcastable at bench scale,
  // shuffle join at 100 TB, both correct.
  def q02RevenueByRegion(s: SparkSession, d: String): DataFrame = {
    val li  = lineitem(s, d)
    val o   = orders(s, d).where(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
      col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
    val c   = customer(s, d)
    val n   = nation(s, d)
    val r   = region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(revenue), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  val q02Sql: String =
    """SELECT r_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  // ─── q03: top-10 orders by revenue (agg → join → global top-k) ────────
  // Aggregate lineitem by l_orderkey BEFORE the join: the aggregation's
  // map-side partial combine collapses ~4 items/order on the scan side, so
  // both the agg shuffle and the join shuffle carry |orders| rows instead
  // of |lineitem| rows — and the orders columns never ride through an
  // aggregation. orderBy(...).limit(k) compiles to TakeOrderedAndProject:
  // each partition keeps a k-heap, driver merges k×partitions rows — no
  // global sort shuffle, which is what makes top-k viable at 100 TB.
  def q03TopOrders(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(revenue), 2).as("order_revenue"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
              col("order_revenue"))
      .orderBy(col("order_revenue").desc, col("l_orderkey"))
      .limit(10)

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS order_revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY order_revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ─── q04: order priority count (LEFT SEMI join = EXISTS) ──────────────
  // Semi join projects nothing from the right side, so Spark only shuffles
  // the distinct right keys — cheapest join kind for existence checks.
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val returned = lineitem(s, d).where(col("l_returnflag") === "R")
    orders(s, d)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ─── q05: nation volume (6-way join incl. supplier co-location) ───────
  def q05NationVolume(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o  = orders(s, d).where(
      col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
      col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ─── q06: forecasting revenue change (filter-only global agg) ─────────
  // All three predicates push into the parquet scan (PushedFilters);
  // the aggregate is a single-row reduce.
  def q06ForecastRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("promo_revenue"),
           count(lit(1)).as("n_items"))

  val q06Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS promo_revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ─── q07: customers per order-count bucket (LEFT OUTER join) ──────────
  // Customers with zero orders must survive — that's the outer-join
  // semantics the reference's star schema implies (courses with no
  // activity; SURVEY.md §2.2 joins). Pre-aggregate orders by o_custkey
  // BEFORE the outer join: the join then shuffles at most |distinct
  // custkey| pre-combined rows instead of every order row — at 100 TB the
  // difference between shuffling the fact table and shuffling a per-key
  // summary. coalesce(cnt, 0) restores the zero-order bucket.
  def q07CustomerOrderBuckets(s: SparkSession, d: String): DataFrame = {
    val perCust = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    customer(s, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))
  }

  val q07Sql: String =
    """SELECT n_orders, count(*) AS n_customers
      |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey)
      |GROUP BY n_orders
      |ORDER BY n_orders""".stripMargin

  // ─── q08: silent customers by segment (LEFT ANTI join = NOT EXISTS) ───
  // The one join the reference semantically requires: ON CONFLICT DO
  // NOTHING (course_catalog.py:99) is an anti-join against existing keys.
  def q08SilentCustomers(s: SparkSession, d: String): DataFrame = {
    val finished = orders(s, d).where(col("o_orderstatus") === "F")
    customer(s, d)
      .join(finished, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_silent"))
      .orderBy(col("c_mktsegment"))
  }

  val q08Sql: String =
    """SELECT c_mktsegment, count(*) AS n_silent
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ─── q119: NULL-SAFE equi-join (<=>) ──────────────────────────────────
  // `a <=> b` (IS NOT DISTINCT FROM) treats NULL as a joinable value —
  // the join ON CONFLICT-style merge keys need when a component of the
  // composite key is nullable (a plain `=` silently DROPS every
  // null-keyed row, the classic merge bug). Nulls are planted
  // deterministically on both sides; the null-null matches land in their
  // own census bucket. Crucially `<=>` is still an EQUI-join to Catalyst
  // (EqualNullSafe is a hashable join key), so the plan is the same hash
  // join as q02 — not the filter-on-top-of-cross that `=` + `OR both
  // null` devolves to.
  def q119NullsafeJoin(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_nationkey"))
          .as("c_nat"))
    val supp = supplier(s, d)
      .select(col("s_suppkey"),
        when(col("s_suppkey") % 7 === 0, lit(null)).otherwise(col("s_nationkey"))
          .as("s_nat"))
    // pre-aggregate EACH side before the null-safe join: the join carries
    // no residual predicate, so per-bucket pair count = n_c × n_s and the
    // distinct counts factor through — the <=> hash join then runs over
    // two ~25-row aggregates instead of the fact tables, and the original
    // two-countDistinct aggregate (whose multi-distinct Expand tripled the
    // joined rows on the shuffle — caught by PlanLint) disappears
    // entirely. Same output, same oracle.
    val cAgg = cust.groupBy(col("c_nat"))
      .agg(count(lit(1)).as("n_c"),
           countDistinct(col("c_custkey")).as("n_cust"))
    val sAgg = supp.groupBy(col("s_nat"))
      .agg(count(lit(1)).as("n_s"),
           countDistinct(col("s_suppkey")).as("n_supp"))
    cAgg.join(sAgg, col("c_nat") <=> col("s_nat"))
      .select(coalesce(col("c_nat"), lit(-1L)).as("nation_bucket"),
              (col("n_c") * col("n_s")).as("n_pairs"),
              col("n_cust"), col("n_supp"))
      .orderBy(col("nation_bucket"))
  }

  val q119Sql: String =
    """SELECT coalesce(c_nat, -1) AS nation_bucket,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
      |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_supp
      |FROM (SELECT c_custkey,
      |        CASE WHEN c_custkey % 10 = 0 THEN NULL
      |             ELSE c_nationkey END AS c_nat FROM customer) c
      |JOIN (SELECT s_suppkey,
      |        CASE WHEN s_suppkey % 7 = 0 THEN NULL
      |             ELSE s_nationkey END AS s_nat FROM supplier) s
      |  ON c.c_nat IS NOT DISTINCT FROM s.s_nat
      |GROUP BY 1
      |ORDER BY nation_bucket""".stripMargin

  // ─── q140: TYPED Dataset[T] pipeline (case-class encoders end-to-end) ─
  // The Dataset API surface SURVEY §1.1 names ("Dataset[T] with
  // case-class Encoders where type safety helps"), exercised end to end:
  // `as[T]` typed views, `joinWith` (pair-of-objects join, not column
  // flattening), `groupByKey` over a field accessor, and TypedColumn
  // aggregates. Honesty notes, in-plan: the PRICE FILTER runs as a
  // Column BEFORE `as[T]` so it still reaches the parquet scan (a typed
  // `filter(f: T => Boolean)` is a lambda black box Catalyst cannot push
  // — the documented cost of the typed API); the TypedColumn aggregates
  // compile to the same partial/final hash aggregate as the untyped
  // form. What typed buys: the join condition and the grouping key are
  // checked against the case classes at compile time.
  case class TCust(c_custkey: Long, c_nationkey: Long)
  case class TOrd(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

  def q140TypedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val custs = customer(s, d)
      .select(col("c_custkey"), col("c_nationkey")).as[TCust]
    val ords = orders(s, d)
      .where(col("o_totalprice") > 150000.0) // Column filter: pushes down
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[TOrd]
    val pairs: org.apache.spark.sql.Dataset[(TOrd, TCust)] =
      ords.joinWith(custs, ords("o_custkey") === custs("c_custkey"))
    pairs.groupByKey(_._2.c_nationkey)
      .agg(count(lit(1)).as("n_big").as[Long],
           round(sum(col("_1.o_totalprice")), 2).as("volume").as[Double])
      .toDF("c_nationkey", "n_big", "volume")
      .orderBy(col("c_nationkey"))
  }

  val q140Sql: String =
    """SELECT c_nationkey, count(*) AS n_big,
      |  round(sum(o_totalprice), 2) AS volume
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 150000.0
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_typed_pipeline"   -> (q140TypedPipeline _),
    "q119_nullsafe_join"    -> (q119NullsafeJoin _),
    "q01_pricing_summary"   -> (q01PricingSummary _),
    "q02_revenue_by_region" -> (q02RevenueByRegion _),
    "q03_top_orders"        -> (q03TopOrders _),
    "q04_order_priority"    -> (q04OrderPriority _),
    "q05_nation_volume"     -> (q05NationVolume _),
    "q06_forecast_revenue"  -> (q06ForecastRevenue _),
    "q07_customer_order_buckets" -> (q07CustomerOrderBuckets _),
    "q08_silent_customers"  -> (q08SilentCustomers _),
  )

  val oracleSql: Map[String, String] = Map(
    "q140_typed_pipeline"   -> q140Sql,
    "q119_nullsafe_join"    -> q119Sql,
    "q01_pricing_summary"   -> q01Sql,
    "q02_revenue_by_region" -> q02Sql,
    "q03_top_orders"        -> q03Sql,
    "q04_order_priority"    -> q04Sql,
    "q05_nation_volume"     -> q05Sql,
    "q06_forecast_revenue"  -> q06Sql,
    "q07_customer_order_buckets" -> q07Sql,
    "q08_silent_customers"  -> q08Sql,
  )
}
