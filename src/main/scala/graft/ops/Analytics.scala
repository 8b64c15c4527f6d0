package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation surface (SURVEY.md §2.2 "Aggregations").
  *
  * rollup / cube / grouping sets / count-distinct / approx-distinct over the
  * star schema the reference's output exists to serve (completion and
  * engagement metrics, user_course_activity_database.sql:11–13).
  *
  * Grouping-null handling: subtotal rows carry NULL grouping keys, and
  * Spark and DuckDB disagree on default NULL sort order — every grouping
  * key is therefore coalesced to the sentinel 'ALL' before the final sort.
  */
object Analytics {

  // ─── q24: ROLLUP(year, priority) over orders ───────────────────────────
  def q24Rollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("string"))
      .rollup(col("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("yr"), lit("ALL")).as("yr"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n"), col("total"))
      .orderBy(col("yr"), col("priority"))

  val q24Sql: String =
    """SELECT coalesce(yr, 'ALL') AS yr,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM (SELECT CAST(year(o_orderdate) AS VARCHAR) AS yr,
      |             o_orderpriority, o_totalprice FROM orders)
      |GROUP BY ROLLUP(yr, o_orderpriority)
      |ORDER BY coalesce(yr, 'ALL'), coalesce(o_orderpriority, 'ALL')""".stripMargin

  // ─── q25: CUBE(returnflag, linestatus) over lineitem ──────────────────
  def q25Cube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
              col("n"), col("qty"))
      .orderBy(col("rflag"), col("lstatus"))

  val q25Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |  coalesce(l_linestatus, 'ALL') AS lstatus,
      |  count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin

  // ─── q26: GROUPING SETS via the SQL entry point ─────────────────────────
  // Registers temp views and goes through spark.sql(...) — the engine's SQL
  // text surface (the consumption contract of SURVEY.md §3.3).
  def q26GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
  }

  val q26Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority))
      |ORDER BY status, priority""".stripMargin

  // ─── q27: exact COUNT(DISTINCT) per group + global ─────────────────────
  // TWO distinct columns in one agg would plan as the multi-distinct
  // Expand — every input row replicated once per distinct group before
  // the shuffle (the q28 trap; 2x the shuffled rows here, worse with
  // more columns). Splitting into one single-distinct agg per column
  // keeps each pass Expand-free (partial dedup of (flag, key) pairs
  // map-side, then a two-phase count) and re-joins on the tiny group
  // key. Measured ~1.0 s -> ~0.8 s at sf0.1 (A/B, same session); the
  // gap widens with row count and distinct-column count — the Expand's
  // cost is an extra full-input shuffle copy per distinct column.
  def q27CountDistinct(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val orders = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
           count(lit(1)).as("n_rows"))
    val parts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    orders.join(broadcast(parts), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
              col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q27Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q28: approx_count_distinct (HLL) with an oracle-checkable bound ──
  // HLL sketch VALUES differ between engines, so raw sketches can't be
  // oracle-compared. Instead the query emits the exact counts (oracle-
  // checkable) plus `approx_ok` — the 10% error-bound assertion AS DATA.
  // The DuckDB twin emits literal TRUE, so the hash matches only if the
  // sketch genuinely lands inside the bound (rsd 0.02 ⇒ 10% is a 5σ
  // margin). TextSimSpec additionally bounds the raw sketch at 5%.
  // At 100 TB the sketch (fixed-size, single pass) replaces
  // count(DISTINCT) wherever exactness isn't contractual.
  // Plan note: the exact and approx aggregates run as SEPARATE passes
  // joined on the 3-row group key. Folding the sketches into the same
  // agg as the two countDistincts drags them through the multi-distinct
  // Expand (every input row replicated per distinct group) — measured
  // 6.6 s vs ~1.2 s for this split at sf0.1. The sketch pass has no
  // Expand at all; the join is a broadcast of 3 rows. The exact side is
  // additionally split per distinct column (the q27 rewrite; ~1.22 →
  // ~1.11 s A/B) so no Expand survives anywhere in the plan.
  def q28ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    // the exact side splits per distinct column too (the q27 rewrite):
    // two Expand-free single-distinct passes re-joined on the group key
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .join(broadcast(li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))),
        Seq("l_returnflag"))
    // rsd 0.02: half the default error at a quarter of the 0.01-rsd
    // sketch size (HLL registers scale 1/rsd²) — 0.01 was the top bench
    // cost at sf0.1 for precision nothing consumed.
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
           approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
    exact.join(broadcast(approx), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
        (abs(col("ao") - col("n_orders")) <= col("n_orders") * 0.1 &&
         abs(col("ap") - col("n_parts")) <= col("n_parts") * 0.1).as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q28Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q121: ordered string aggregation (LISTAGG WITHIN GROUP) ─────────
  // The warehouse "roll members up into one delimited label" op (report
  // headers, denormalized exports). Spark 4's `listagg(col, sep) WITHIN
  // GROUP (ORDER BY ...)` ≡ DuckDB's `string_agg(col, sep ORDER BY ...)`
  // — the explicit ORDER BY is what makes the result deterministic and
  // hash-comparable (an unordered listagg is nondeterministic under
  // parallel aggregation, the same trap as collect_list). Nation names
  // per region: bounded group size by construction — at 100 TB listagg
  // over unbounded groups is an OOM-shaped contract like exact
  // percentiles (q77); bound the group or go back to rows.
  def q121Listagg(s: SparkSession, d: String): DataFrame = {
    val joined = nation(s, d).join(broadcast(region(s, d)),
      col("n_regionkey") === col("r_regionkey"))
    joined.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
           expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
             .as("members"))
      .orderBy(col("r_name"))
  }

  val q121Sql: String =
    """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
      |  string_agg(n_name, ',' ORDER BY n_name) AS members
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  // ─── q123: MERGEABLE HLL sketches (hll_sketch_agg / hll_union_agg) ───
  // The q28 sketch (approx_count_distinct) collapses to a number at the
  // end of its one aggregation — it cannot be re-aggregated later. This
  // is the datasketches form: `hll_sketch_agg` materializes the sketch
  // BYTES per fine-grained cell (year × priority), and `hll_union_agg`
  // re-merges those bytes up to year level WITHOUT rescanning the fact
  // table. That two-level shape is the canonical 100 TB pattern: the
  // expensive pass over the corpus runs once and persists kilobyte-sized
  // partials; every coarser rollup is an aggregation over (cells ×
  // sketch bytes), not (rows). Sketch bytes are engine-specific, so the
  // oracle contract is the q28 one: exact counts as data + the 5%
  // error-bound assertion as a boolean column (lgConfigK=12 ⇒ rsd
  // ≈1.6%, so 5% is a ≥3σ margin at every SF).
  def q123HllMerge(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).withColumn("yr", year(col("o_orderdate")))
    // level 1: one sketch per (year, priority) cell — the persisted partial
    val partials = o.groupBy(col("yr"), col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    // level 2: merge partials to year level — touches sketches, not rows
    val merged = partials.groupBy(col("yr"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = o.groupBy(col("yr"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    exact.join(broadcast(merged), Seq("yr"))
      .select(col("yr"), col("n_cust"),
        (abs(col("est") - col("n_cust")) <= col("n_cust") * 0.05)
          .as("merge_ok"))
      .orderBy(col("yr"))
  }

  val q123Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  TRUE AS merge_ok
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ─── q187: ROLLING 7-day distinct users from daily HLL sketches ──────
  // The operational "7-day active users" metric at sketch cost: one
  // sketch per DAY persists (the q123 partial), and every day's trailing
  // window is a union of ≤7 sketches — the fact is scanned once ever,
  // each daily report touches kilobytes. The window association is a
  // small range join (|days| rows against |days| sketches, broadcast);
  // the EXACT twin recomputes each window from rows (test-scale only —
  // at 100 TB exactly the thing the sketches exist to avoid) and the 5%+2
  // bound rides as data, q123's oracle contract.
  def q187RollingHll(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(to_date(col("ts")).as("dt"), col("user_id"))
    val daily = e.groupBy(col("dt"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val days = daily.select(col("dt").as("d"))
    val est = days.join(broadcast(daily),
        datediff(col("d"), col("dt")).between(0, 6))
      .groupBy(col("d"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = days.join(e, datediff(col("d"), col("dt")).between(0, 6))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    exact.join(broadcast(est), Seq("d"))
      .select(col("d"), col("n_users"),
        (abs(col("est") - col("n_users")) <= col("n_users") * 0.05 + 2)
          .as("window_ok"))
      .orderBy(col("d"))
  }

  val q187Sql: String =
    """WITH e AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dt, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT dt AS d FROM e)
      |SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  TRUE AS window_ok
      |FROM days JOIN e ON datediff('day', e.dt, days.d) BETWEEN 0 AND 6
      |GROUP BY d
      |ORDER BY d""".stripMargin

  // ─── q156: HLL set-INTERSECTION estimate (inclusion–exclusion) ───────
  // Sketches union natively (q123) but not intersect; the standard
  // answer is |A∩B| ≈ est(A) + est(B) − est(A∪B), computed entirely
  // from the per-year sketches — the fact table is never rescanned for
  // any pair. Error compounds (three estimates, each ~1.6% of its own
  // cardinality at the default lgK), so the honest bound is stated
  // against the UNION size, not the intersection: |est − exact| ≤
  // 5%·|A∪B| + 2. The returning-customer census (year y ∩ year y+1)
  // is the classic use.
  def q156HllIntersect(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(year(col("o_orderdate")).as("yr"), col("o_custkey"))
      .where(col("yr").between(1995, 1998))
    val sk = o.groupBy(col("yr")).agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val dys = o.distinct()
    val perYear = dys.groupBy(col("yr")).agg(count(lit(1)).as("n"))
    val both = dys.as("a")
      .join(dys.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.yr") === col("a.yr") + 1)
      .groupBy(col("a.yr").as("y1"))
      .agg(count(lit(1)).as("n_both"))
    val est = sk.as("sa")
      .join(sk.as("sb"), col("sb.yr") === col("sa.yr") + 1)
      .select(col("sa.yr").as("y1"),
        hll_sketch_estimate(col("sa.sk")).as("ea"),
        hll_sketch_estimate(col("sb.sk")).as("eb"),
        hll_sketch_estimate(hll_union(col("sa.sk"), col("sb.sk"))).as("eu"))
    both.join(est, Seq("y1"))
      .join(perYear.select(col("yr").as("y1"), col("n").as("n_y1")), Seq("y1"))
      .join(perYear.select((col("yr") - 1).as("y1"), col("n").as("n_y2")), Seq("y1"))
      .select(col("y1"), (col("y1") + 1).as("y2"), col("n_y1"), col("n_y2"),
        col("n_both"),
        (abs(col("ea") + col("eb") - col("eu") - col("n_both")) <=
          (col("n_y1") + col("n_y2") - col("n_both")) * 0.05 + 2)
          .as("inter_ok"))
      .orderBy(col("y1"))
  }

  val q156Sql: String =
    """WITH dys AS (
      |  SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS yr, o_custkey
      |  FROM orders
      |  WHERE year(o_orderdate) BETWEEN 1995 AND 1998),
      |py AS (SELECT yr, CAST(count(*) AS BIGINT) AS n FROM dys GROUP BY 1)
      |SELECT a.yr AS y1, a.yr + 1 AS y2,
      |  (SELECT n FROM py WHERE yr = a.yr) AS n_y1,
      |  (SELECT n FROM py WHERE yr = a.yr + 1) AS n_y2,
      |  CAST(count(*) AS BIGINT) AS n_both,
      |  TRUE AS inter_ok
      |FROM dys a JOIN dys b
      |  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
      |GROUP BY a.yr
      |ORDER BY y1""".stripMargin

  // ─── q124: EXACT distinct via mergeable bitmaps (bitmap_*_agg) ───────
  // Exactness without count(DISTINCT)'s re-scan problem: each key maps to
  // (bucket = key>>15, bit position), `bitmap_construct_agg` ORs the bits
  // into one ≤4 KB bitmap per (group, bucket) cell, and coarser levels
  // merge with `bitmap_or_agg` — again bytes, not rows. Unlike q123 this
  // is EXACT, so the oracle check is value equality with count(DISTINCT),
  // not a bound. The two-level shape here: partials at (returnflag,
  // linestatus, bucket) are OR-merged up to (returnflag, bucket), then
  // `bitmap_count` + sum gives the distinct-order count per flag. At
  // 100 TB the partials layer is what you persist: any rollup
  // (flag level, status level, grand total) re-merges bitmaps without
  // touching the fact table, and the shuffle carries fixed-width bitmap
  // bytes keyed by (group, bucket) — never the raw keys.
  def q124BitmapDistinct(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"),
      bitmap_bucket_number(col("l_orderkey")).as("bkt"),
      bitmap_bit_position(col("l_orderkey")).as("pos"))
    // level 1: fine-grained persisted partials
    val partials = li.groupBy(col("l_returnflag"), col("l_linestatus"), col("bkt"))
      .agg(bitmap_construct_agg(col("pos")).as("bm"))
    // level 2: OR-merge across linestatus — no fact-table rescan
    val flagLevel = partials.groupBy(col("l_returnflag"), col("bkt"))
      .agg(bitmap_or_agg(col("bm")).as("bm"))
    flagLevel.groupBy(col("l_returnflag"))
      .agg(sum(bitmap_count(col("bm"))).as("n_orders"))
      .orderBy(col("l_returnflag"))
  }

  val q124Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q125: FILTER-clause aggregates (conditional agg without self-join)
  // The report shape "total, plus the same metric under N predicates" in
  // ONE pass: `agg FILTER (WHERE p)` evaluates each predicate per row
  // inside a single hash aggregate — versus the naive N scans + N joins,
  // or CASE-WHEN-NULL contortions. One scan, one shuffle, regardless of
  // how many filtered columns ride along; at 100 TB that is N−1 fact
  // scans saved. Identical syntax in DuckDB, so the oracle is literal.
  def q125FilteredAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_finished"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'O')").as("n_open"),
        expr("round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 2)")
          .as("big_total"))
      .orderBy(col("o_orderpriority"))

  val q125Sql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  round(sum(o_totalprice) FILTER (WHERE o_totalprice > 150000), 2)
      |    AS big_total
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ─── q126: numeric histogram via width_bucket ────────────────────────
  // Fixed-bound equi-width histogram — the profiling op behind data-
  // quality dashboards and binned joins (q112 uses the same bucketing
  // idea as a join key). STATIC bounds (l_quantity ∈ [1,50] by TPC-H
  // construction) keep the bucket id a pure per-row projection — no
  // global min/max pre-pass, no driver round-trip — so the whole
  // histogram is one map-side-combined aggregation over 10 buckets.
  // DuckDB lacks width_bucket, so the oracle spells out the same
  // formula: bucket = floor((v − lo) / ((hi − lo) / n)) + 1.
  def q126Histogram(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("bucket",
        expr("CAST(width_bucket(l_quantity, 1.0D, 51.0D, 10) AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("l_quantity")).as("min_q"),
           max(col("l_quantity")).as("max_q"))
      .orderBy(col("bucket"))

  val q126Sql: String =
    """SELECT CAST(floor((l_quantity - 1.0) / 5.0) + 1 AS INT) AS bucket,
      |  count(*) AS n, min(l_quantity) AS min_q, max(l_quantity) AS max_q
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ─── q134: max_by / min_by (argmax — "the row that set the extreme") ──
  // The report shape "which order was the biggest" WITHOUT a join-back
  // or a window: one hash aggregate carrying (value, orderkey) state.
  // Ties: Spark's max_by and DuckDB's arg_max both pick an ARBITRARY
  // row on equal ordering values, so the ordering key is made UNIQUE by
  // fusing price-cents with the orderkey into one BIGINT (cents ≤ ~6e7
  // × 1e7 + key ≤ 6e5 stays well inside Long; exact integers, no float
  // compare). Deterministic in both engines by construction.
  def q134ArgMax(s: SparkSession, d: String): DataFrame = {
    val ord = expr(
      "CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey")
    orders(s, d).groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"), ord).as("top_order"),
           min_by(col("o_orderkey"), ord).as("bottom_order"),
           round(max(col("o_totalprice")), 2).as("top_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q134Sql: String =
    """SELECT o_orderpriority,
      |  arg_max(o_orderkey,
      |    CAST(round(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey)
      |    AS top_order,
      |  arg_min(o_orderkey,
      |    CAST(round(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey)
      |    AS bottom_order,
      |  round(max(o_totalprice), 2) AS top_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ─── q135: regression / correlation aggregates ───────────────────────
  // The built-in OLS family (regr_slope/intercept/count, corr): single-
  // pass algebraic aggregates (sum, sum², cross-sum state) — fully
  // map-side-combinable, so they scale like any sum. Values rounded in
  // BOTH engines before hashing (the two engines accumulate in
  // different orders; 3 decimals absorbs the float drift while still
  // pinning 7 significant digits here).
  def q135Regression(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 3).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 3)
          .as("icept"),
        round(expr("corr(l_extendedprice, l_quantity)"), 4).as("r"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy(col("l_returnflag"))

  val q135Sql: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 3) AS icept,
      |  round(corr(l_extendedprice, l_quantity), 4) AS r,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q136: boolean aggregates (bool_and / bool_or / count_if) ────────
  // Data-quality assertions as aggregates: "every row satisfies P",
  // "any row satisfies Q", "how many satisfy R" in one pass — the
  // shape q89's constraint audit uses per-check, here as first-class
  // single-aggregate functions.
  def q136BoolAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(expr("bool_and(l_quantity > 0)").as("all_pos"),
           expr("bool_or(l_discount > 0.09)").as("any_big_disc"),
           expr("count_if(l_tax = 0)").as("n_notax"),
           expr("bool_and(l_shipdate >= '1992-01-01')").as("ship_ok"))
      .orderBy(col("l_returnflag"))

  val q136Sql: String =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_pos,
      |  bool_or(l_discount > 0.09) AS any_big_disc,
      |  CAST(count_if(l_tax = 0) AS BIGINT) AS n_notax,
      |  bool_and(l_shipdate >= '1992-01-01') AS ship_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q139: grouped top-k via the custom TypedImperativeAggregate ─────
  // expr/TopKAgg.scala's `top_k_by` — top-3 orders per priority as ONE
  // ObjectHashAggregate with a partial step (each map task emits ≤ k
  // entries per group; the shuffle never carries the fact table and
  // nothing sorts), versus the window form's per-partition sort. The
  // fused cents×1e7+key ordering (q134's trick) keeps ties impossible,
  // so both engines agree exactly; output is CSV'd because the driver
  // compare can't hash array cells (q21 note). The DuckDB twin is the
  // window formulation — same rows, opposite plan shape.
  def q139TopkAgg(s: SparkSession, d: String): DataFrame = {
    val ord = expr(
      "CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey")
    orders(s, d).groupBy(col("o_orderpriority"))
      .agg(graft.expr.TopKByAgg.top_k_by(col("o_orderkey"), ord, 3).as("top"))
      .select(col("o_orderpriority"),
        concat_ws(",", transform(col("top"), _.cast("string")))
          .as("top_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q139Sql: String =
    """SELECT o_orderpriority,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY fused DESC)
      |    AS top_orders
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(round(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey
      |      AS fused,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(round(o_totalprice*100) AS BIGINT)*10000000
      |               + o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ─── q143: dispersion + bitwise aggregates ───────────────────────────
  // The remaining single-pass algebraic families: stddev/variance (both
  // sample and population conventions), the higher moments (skewness,
  // excess kurtosis — both engines use the sample-excess convention,
  // probe-verified to 4 decimals), and the bitwise fold aggregates
  // (bit_and/or/xor — the fingerprint shape for "which flag bits ever/
  // always occur per group"). All are fixed-size running-moment or
  // single-long state: map-side combinable, shuffle carries O(groups)
  // bytes.
  def q143StatsAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_samp"),
        round(var_pop(col("l_quantity")), 4).as("var_p"),
        // + 0.0 canonicalizes -0.0 (a symmetric distribution's skew can
        // round to the negative zero bit pattern in one engine only)
        (round(skewness(col("l_quantity")), 4) + lit(0.0)).as("skew"),
        round(kurtosis(col("l_quantity")), 4).as("kurt"),
        expr("bit_and(l_orderkey)").as("key_bits_all"),
        expr("bit_or(l_orderkey)").as("key_bits_any"),
        expr("bit_xor(l_orderkey)").as("key_bits_xor"))
      .orderBy(col("l_returnflag"))

  val q143Sql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_samp,
      |  round(var_pop(l_quantity), 4) AS var_p,
      |  round(skewness(l_quantity), 4) + 0.0 AS skew,
      |  round(kurtosis(l_quantity), 4) AS kurt,
      |  bit_and(l_orderkey) AS key_bits_all,
      |  bit_or(l_orderkey) AS key_bits_any,
      |  bit_xor(l_orderkey) AS key_bits_xor
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_listagg"        -> (q121Listagg _),
    "q143_stats_agg"      -> (q143StatsAgg _),
    "q139_topk_agg"       -> (q139TopkAgg _),
    "q134_argmax"         -> (q134ArgMax _),
    "q135_regression"     -> (q135Regression _),
    "q136_bool_agg"       -> (q136BoolAgg _),
    "q123_hll_merge"      -> (q123HllMerge _),
    "q187_rolling_hll"    -> (q187RollingHll _),
    "q156_hll_intersect"  -> (q156HllIntersect _),
    "q124_bitmap_distinct" -> (q124BitmapDistinct _),
    "q125_filtered_agg"   -> (q125FilteredAgg _),
    "q126_histogram"      -> (q126Histogram _),
    "q24_rollup"          -> (q24Rollup _),
    "q25_cube"            -> (q25Cube _),
    "q26_grouping_sets"   -> (q26GroupingSets _),
    "q27_count_distinct"  -> (q27CountDistinct _),
    "q28_approx_distinct" -> (q28ApproxDistinct _),
  )

  val oracleSql: Map[String, String] = Map(
    "q121_listagg"       -> q121Sql,
    "q139_topk_agg"      -> q139Sql,
    "q143_stats_agg"     -> q143Sql,
    "q134_argmax"        -> q134Sql,
    "q135_regression"    -> q135Sql,
    "q136_bool_agg"      -> q136Sql,
    "q123_hll_merge"     -> q123Sql,
    "q187_rolling_hll"   -> q187Sql,
    "q156_hll_intersect" -> q156Sql,
    "q124_bitmap_distinct" -> q124Sql,
    "q125_filtered_agg"  -> q125Sql,
    "q126_histogram"     -> q126Sql,
    "q24_rollup"         -> q24Sql,
    "q25_cube"           -> q25Sql,
    "q26_grouping_sets"  -> q26Sql,
    "q27_count_distinct" -> q27Sql,
    "q28_approx_distinct" -> q28Sql,
  )
}
