package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.2 "Scalar functions").
  *
  * The reference's only scalar computations are the ISO-8601 `Z` timestamp
  * normalization (user_course_activity.py:181–185) and equality on natural
  * keys (course_catalog.py:69–70); everything else is delegated to the SQL
  * sink. The engine exposes the full built-in families — string, date/time,
  * math, array/map lambdas, JSON — all as Catalyst built-ins so they stay
  * inside whole-stage codegen (no UDFs anywhere on the hot path).
  */
object Scalars {

  // ─── q18: string functions over part ────────────────────────────────────
  // upper/lower/substring/length/trim/concat/split/regexp_replace, grouped
  // by the first word of p_type so the result stays a small summary.
  def q18StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .withColumn("type_head", split(col("p_type"), " ").getItem(0))
      .withColumn("name5", upper(substring(col("p_name"), 1, 5)))
      .withColumn("no_digits", regexp_replace(col("p_brand"), "[0-9]", ""))
      .groupBy(col("type_head"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(length(col("p_name"))), 4).as("avg_name_len"),
        min(col("name5")).as("min_name5"),
        max(concat_ws("#", col("no_digits"), lower(col("p_name")))).as("max_tag"))
      .orderBy(col("type_head"))

  val q18Sql: String =
    """SELECT string_split(p_type, ' ')[1] AS type_head,
      |  count(*) AS n,
      |  round(avg(length(p_name)), 4) AS avg_name_len,
      |  min(upper(substring(p_name, 1, 5))) AS min_name5,
      |  max(concat_ws('#', regexp_replace(p_brand, '[0-9]', '', 'g'),
      |                lower(p_name))) AS max_tag
      |FROM part
      |GROUP BY 1
      |ORDER BY type_head""".stripMargin

  // ─── q19: date/time functions over orders ──────────────────────────────
  def q19DateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .withColumn("mo", month(col("o_orderdate")).cast("long"))
      .withColumn("month_start", date_trunc("month", col("o_orderdate")))
      .withColumn("days_since_epoch95",
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long"))
      .groupBy(col("yr"), col("mo"), col("month_start"))
      .agg(count(lit(1)).as("n_orders"),
           min(col("days_since_epoch95")).as("min_day"),
           max(col("days_since_epoch95")).as("max_day"))
      .orderBy(col("yr"), col("mo"))

  val q19Sql: String =
    """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  count(*) AS n_orders,
      |  min(date_diff('day', DATE '1995-01-01', o_orderdate)) AS min_day,
      |  max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS max_day
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY yr, mo""".stripMargin

  // ─── q20: math functions over lineitem ─────────────────────────────────
  // sqrt is IEEE-correctly-rounded in both engines; ln agreement is within
  // 1 ulp, far inside the round(…,2)-after-sum tolerance.
  def q20MathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(sqrt(col("l_quantity"))), 2).as("sum_sqrt_qty"),
        round(sum(log(col("l_extendedprice"))), 2).as("sum_ln_price"),
        sum(pmod(col("l_orderkey"), lit(7))).as("sum_mod7"),
        round(max(abs(col("l_discount") - 0.05)), 6).as("max_abs_disc"),
        sum(floor(col("l_quantity") / 10)).cast("long").as("sum_floor"),
        sum(ceil(col("l_tax") * 100)).cast("long").as("sum_ceil"))
      .orderBy(col("l_returnflag"))

  val q20Sql: String =
    """SELECT l_returnflag,
      |  round(sum(sqrt(l_quantity)), 2) AS sum_sqrt_qty,
      |  round(sum(ln(l_extendedprice)), 2) AS sum_ln_price,
      |  CAST(sum(l_orderkey % 7) AS BIGINT) AS sum_mod7,
      |  round(max(abs(l_discount - 0.05)), 6) AS max_abs_disc,
      |  CAST(sum(floor(l_quantity / 10)) AS BIGINT) AS sum_floor,
      |  CAST(sum(ceil(l_tax * 100)) AS BIGINT) AS sum_ceil
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q21: array construction + higher-order lambdas ────────────────────
  // collect_list is order-nondeterministic under parallelism → always
  // sort_array before exposing. The lambda sum then adds the same doubles
  // in the same order in both engines.
  def q21ArrayFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .where(col("o_custkey") % 100 === 0)
      .groupBy(col("o_custkey"))
      .agg(
        sort_array(collect_set(col("o_orderpriority"))).as("priorities"),
        sort_array(collect_list(col("o_totalprice"))).as("prices"))
      .select(
        col("o_custkey"),
        // The driver's pandas-based compare can't hash array cells
        // (CORRECTNESS_r01 q21 err) — expose the array as a scalar join
        // and keep the raw `prices` array internal to the lambdas.
        array_join(col("priorities"), ",").as("priorities_csv"),
        array_contains(col("priorities"), "1-URGENT").as("has_urgent"),
        size(col("priorities")).cast("long").as("n_priorities"),
        round(aggregate(col("prices"), lit(0.0),
          (acc, x) => acc + x), 2).as("sum_prices"),
        size(filter(col("prices"), _ > 150000.0)).cast("long").as("n_big"))
      .orderBy(col("o_custkey"))

  val q21Sql: String =
    """SELECT o_custkey,
      |  array_to_string(priorities, ',') AS priorities_csv,
      |  list_contains(priorities, '1-URGENT') AS has_urgent,
      |  len(priorities) AS n_priorities,
      |  round(list_aggregate(prices, 'sum'), 2) AS sum_prices,
      |  len(list_filter(prices, x -> x > 150000.0)) AS n_big
      |FROM (SELECT o_custkey,
      |        list_sort(list(DISTINCT o_orderpriority)) AS priorities,
      |        list_sort(list(o_totalprice)) AS prices
      |      FROM orders WHERE o_custkey % 100 = 0
      |      GROUP BY o_custkey)
      |ORDER BY o_custkey""".stripMargin

  // ─── q22: JSON extraction over events.props ────────────────────────────
  // events.props is a JSON string column (TESTDATA); the reference's whole
  // ingest is JSON-document decoding (course_catalog.py:187).
  def q22JsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"),
           sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_big_k"))
      .orderBy(col("event_type"))

  val q22Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_big_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ─── q23: conditional logic (when/otherwise ≡ CASE) + null handling ────
  // The reference's optional-field idiom (`course.get(k)` → NULL,
  // course_catalog.py:102–106) is Spark's nullable columns + coalesce.
  def q23CaseNulls(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("band",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large"))
      .withColumn("maybe", when(col("o_orderstatus") === "P", col("o_totalprice")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
           round(sum(coalesce(col("maybe"), lit(0.0))), 2).as("pending_value"),
           sum(col("maybe").isNull.cast("long")).as("n_null"))
      .orderBy(col("band"))

  val q23Sql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
      |            WHEN o_totalprice < 150000 THEN 'medium'
      |            ELSE 'large' END AS band,
      |  count(*) AS n,
      |  round(sum(coalesce(CASE WHEN o_orderstatus = 'P'
      |                          THEN o_totalprice END, 0.0)), 2) AS pending_value,
      |  CAST(sum(CASE WHEN (CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)
      |           IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      |FROM orders
      |GROUP BY 1
      |ORDER BY band""".stripMargin

  // ─── q120: collation-aware grouping + join (Spark 4 collations) ──────
  // `collate(x, 'UTF8_LCASE')` makes case-insensitivity a property of
  // the TYPE, not a per-expression lower() wrapper: the collated column
  // groups and joins case-insensitively with no normalized shadow column
  // to maintain. Engine fact worth knowing at scale: collated keys
  // hash-PARTITION fine (the shuffle is collation-aware) but the join
  // itself plans as SortMergeJoin, not a hash join — build-side hashing
  // needs binary equality, which a collation breaks (JoinSelection warns
  // exactly this). Still an equi-join with one shuffle per side — the
  // at-scale shape — never a loop join; SqlTextSpec pins it. A mixed-
  // case segment label is derived deterministically (half TitleCase,
  // half lower), grouped under UTF8_LCASE, and collation-joined to a
  // lowercase dim. The DuckDB twin normalizes with lower() — the
  // pre-collation idiom the feature replaces.
  def q120Collation(s: SparkSession, d: String): DataFrame = {
    import graft.Tables.customer
    val mixed = customer(s, d).select(col("c_custkey"), col("c_acctbal"),
      when(col("c_custkey") % 2 === 0, initcap(lower(col("c_mktsegment"))))
        .otherwise(lower(col("c_mktsegment"))).as("seg_mixed"))
    val dim = s.createDataFrame(Seq(
      ("automobile", 10L), ("building", 20L), ("furniture", 30L),
      ("household", 40L), ("machinery", 50L)))
      .toDF("seg_name", "seg_code")
    mixed.join(broadcast(dim),
        expr("collate(seg_mixed, 'UTF8_LCASE')") ===
        expr("collate(seg_name, 'UTF8_LCASE')"))
      .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("k"))
      .agg(min(lower(col("seg_mixed"))).as("segment"),
           count(lit(1)).as("n"),
           round(sum(col("c_acctbal")), 2).as("acctbal"),
           min(col("seg_code")).as("seg_code"))
      .select(col("segment"), col("n"), col("acctbal"), col("seg_code"))
      .orderBy(col("segment"))
  }

  val q120Sql: String =
    """SELECT lower(seg_mixed) AS segment,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(c_acctbal), 2) AS acctbal,
      |  CAST(min(seg_code) AS BIGINT) AS seg_code
      |FROM (SELECT c_acctbal,
      |        CASE WHEN c_custkey % 2 = 0
      |             THEN upper(substr(c_mktsegment, 1, 1)) ||
      |                  lower(substr(c_mktsegment, 2))
      |             ELSE lower(c_mktsegment) END AS seg_mixed
      |      FROM customer) m
      |JOIN (VALUES ('automobile', 10), ('building', 20), ('furniture', 30),
      |             ('household', 40), ('machinery', 50)) d(seg_name, seg_code)
      |  ON lower(m.seg_mixed) = d.seg_name
      |GROUP BY lower(seg_mixed)
      |ORDER BY segment""".stripMargin

  // ─── q122: error-safe arithmetic (try_divide / try_multiply) ──────────
  // ANSI mode makes overflow and division-by-zero runtime ERRORS (the
  // correct default for a warehouse); the `try_` family is the per-
  // expression escape hatch that yields NULL instead — the difference
  // between one bad row killing a 100 TB job and one bad row becoming a
  // counted null. Planted hazards: quantity 25 zeroes a divisor on real
  // rows (cheap: try_divide null-checks the divisor, no exception), and
  // every ~10⁴th key multiplies by Long.MaxValue and overflows. The
  // overflow MUST be rare by construction: Spark implements try_multiply
  // as catch-ArithmeticException, so each overflowing row pays a Java
  // throw/catch — a first cut that overflowed ~98% of rows ran this
  // query at 10.4 s (vs ~0.5 s now). That is the try_ scale contract:
  // an escape hatch for rare bad rows, not a majority-row code path.
  // The DuckDB twin guards with CASE (its overflow also throws).
  def q122TryArith(s: SparkSession, d: String): DataFrame = {
    import graft.Tables.lineitem
    lineitem(s, d)
      .withColumn("safe_div",
        expr("try_divide(l_extendedprice, l_quantity - 25.0)"))
      .withColumn("big_mul",
        // the > 0 guard matters: orderkey 0 exists in the data and
        // 0 × Long.MaxValue is exactly 0, not an overflow
        expr("try_multiply(l_orderkey, CASE WHEN l_orderkey % 9973 = 0 " +
             "AND l_orderkey > 0 THEN 9223372036854775807L ELSE 1L END)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("safe_div").isNull, 1L).otherwise(0L))
             .as("n_div_by_zero"),
           round(sum(col("safe_div")), 2).as("sum_safe_div"),
           sum(when(col("big_mul").isNull, 1L).otherwise(0L))
             .as("n_overflow"))
      .orderBy(col("l_returnflag"))
  }

  val q122Sql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN l_quantity = 25.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_div_by_zero,
      |  round(sum(CASE WHEN l_quantity = 25.0 THEN NULL
      |            ELSE l_extendedprice / (l_quantity - 25.0) END), 2)
      |    AS sum_safe_div,
      |  CAST(sum(CASE WHEN l_orderkey % 9973 = 0 AND l_orderkey > 0
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q141: MAP-typed columns (map_from_entries / transform_values /
  //           map_filter) ───────────────────────────────────────────────
  // The map column lifecycle q21's array family doesn't touch: build a
  // status→count map per priority from pre-aggregated counts
  // (map_from_entries over a SORTED entry array — maps have no engine
  // order, sorting the entries first is what makes every downstream
  // fold deterministic), derive per-status percentage shares with
  // transform_values, keep the ≥20% ones with map_filter, and emit the
  // surviving entries as sorted CSV (the driver's pandas compare can't
  // hash map cells — q21's array rule, same fix). The DuckDB twin does
  // the same math on the flat (priority, status, n) counts and never
  // builds a map — which is exactly the oracle's job: same VALUES,
  // different representation. Scale note: the maps here live per
  // GROUP (5×3 entries), built after aggregation — map columns as
  // group-local structures, never fact-table payload on a shuffle.
  def q141MapFuncs(s: SparkSession, d: String): DataFrame = {
    val counts = orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("o_orderpriority"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("o_orderstatus"), col("n"))))).as("m"))
      .withColumn("total",
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x))
      .withColumn("shares",
        transform_values(col("m"),
          (_, v) => round(v * lit(100.0) / col("total"), 1)))
      .withColumn("big",
        map_filter(col("shares"), (_, v) => v >= 20.0))
      .select(col("o_orderpriority"), col("total"),
        concat_ws(",", transform(map_entries(col("big")),
          e => concat(e.getField("key"), lit(":"),
                      e.getField("value").cast("string"))))
          .as("big_shares"))
      .orderBy(col("o_orderpriority"))
  }

  val q141Sql: String =
    """WITH counts AS (
      |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |shares AS (
      |  SELECT o_orderpriority, o_orderstatus,
      |    sum(n) OVER (PARTITION BY o_orderpriority) AS total,
      |    round(n * 100.0 / sum(n) OVER (PARTITION BY o_orderpriority), 1)
      |      AS share
      |  FROM counts)
      |SELECT o_orderpriority, CAST(max(total) AS BIGINT) AS total,
      |  coalesce(string_agg(
      |    CASE WHEN share >= 20.0
      |         THEN o_orderstatus || ':' || CAST(share AS VARCHAR) END,
      |    ',' ORDER BY o_orderstatus), '') AS big_shares
      |FROM shares
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_map_funcs"   -> (q141MapFuncs _),
    "q120_collation"   -> (q120Collation _),
    "q122_try_arith"   -> (q122TryArith _),
    "q18_string_funcs" -> (q18StringFuncs _),
    "q19_date_funcs"   -> (q19DateFuncs _),
    "q20_math_funcs"   -> (q20MathFuncs _),
    "q21_array_funcs"  -> (q21ArrayFuncs _),
    "q22_json_funcs"   -> (q22JsonFuncs _),
    "q23_case_nulls"   -> (q23CaseNulls _),
  )

  val oracleSql: Map[String, String] = Map(
    "q141_map_funcs"   -> q141Sql,
    "q120_collation"   -> q120Sql,
    "q122_try_arith"   -> q122Sql,
    "q18_string_funcs" -> q18Sql,
    "q19_date_funcs"   -> q19Sql,
    "q20_math_funcs"   -> q20Sql,
    "q21_array_funcs"  -> q21Sql,
    "q22_json_funcs"   -> q22Sql,
    "q23_case_nulls"   -> q23Sql,
  )
}
