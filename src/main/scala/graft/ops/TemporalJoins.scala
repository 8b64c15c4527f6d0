package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join surface: range (interval) joins and as-of joins
  * (SURVEY.md §2.2 "Joins" — theta/range and as-of rows).
  *
  * Spark has no native as-of join. Rather than a naive inequality join
  * (which plans as a broadcast nested loop — quadratic, dead at scale),
  * the as-of here uses the union + ordered-window formulation: tag both
  * streams, single shuffle on the key, one ordered pass per key with
  * `last(_, ignoreNulls)` carrying the most recent left-side timestamp
  * forward. Cost = one shuffle + one sort, same as any window — this is
  * the formulation that survives 100 TB.
  *
  * The range join keeps an equi-key (user_id) so Catalyst plans a hash
  * join and the interval predicate is a post-join filter — never a
  * cartesian product.
  */
object TemporalJoins {

  // ─── q09: view→purchase conversions within 6 hours (range join) ──────
  def q09RangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    views.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("user_id"))
  }

  val q09Sql: String =
    """SELECT v.user_id, count(*) AS n_conversions
      |FROM (SELECT user_id, ts AS view_ts FROM events
      |      WHERE event_type = 'view') v
      |JOIN (SELECT user_id, ts AS purchase_ts FROM events
      |      WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND p.purchase_ts > v.view_ts
      | AND p.purchase_ts <= v.view_ts + INTERVAL 6 HOUR
      |GROUP BY v.user_id
      |ORDER BY v.user_id""".stripMargin

  // ─── q10: last view before each purchase (as-of join) ──────────────────
  // Tie-break: equal timestamps resolve by event_id, so a view sharing a
  // purchase's exact timestamp counts only if its event_id is smaller.
  def q10AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("view_ts", when(col("event_type") === "view", col("ts")))
      .withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("last_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q10Sql: String =
    """SELECT p.user_id, p.event_id,
      |  (SELECT max(v.ts) FROM events v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |     AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id)))
      |  AS last_view_ts
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ─── q93: the same as-of, through the NATIVE custom operator ──────────
  // graft.plans.AsOfJoinExec — custom LogicalPlan + SparkStrategy +
  // SparkPlan: one hash shuffle per side, one sort per side, a single
  // forward merge pass with ONE candidate row of state per partition.
  // Same contract as q10 (strictly-before, event_id tiebreak), same
  // oracle shape; PlansSpec additionally asserts bit-equality with the
  // union+window formulation and the no-Window/no-Union plan.
  def q93AsofNative(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    // alias every right column: as-of output is left ++ right, so right
    // must not collide with left (the standard self-join rule)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
              col("event_id").as("v_event"))
    graft.plans.AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("ts"), purchases("event_id")),
        Seq(views("view_ts"), views("v_event")))
      .select(col("user_id"), col("event_id"),
              col("view_ts").as("last_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // same semantics as q10 ⇒ literally the same oracle (one text to fix
  // if the oracle ever changes)
  val q93Sql: String = q10Sql

  // ─── q116: native as-of with TOLERANCE (pandas merge_asof parity) ────
  // q93's native operator plus its tolerance knob: a purchase only
  // attributes to a view from the PRECEDING 30 MINUTES; staler matches
  // null-fill. The gate is one long comparison at emit time inside the
  // same single merge pass — identical shuffles/sorts to q93 (the
  // plan is byte-for-byte the same shape; only the emit predicate
  // differs), where the composed form pays a post-join filter +
  // conditional null-out projection.
  private val q116TolMicros = 30L * 60L * 1000000L

  def q116AsofTolerance(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
              col("event_id").as("v_event"))
    graft.plans.AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("ts"), purchases("event_id")),
        Seq(views("view_ts"), views("v_event")),
        toleranceUnits = Some(q116TolMicros))
      .select(col("user_id"), col("event_id"),
              col("view_ts").as("last_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q116Sql: String =
    """SELECT p.user_id, p.event_id,
      |  (SELECT max(v.ts) FROM events v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |     AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
      |     AND v.ts >= p.ts - INTERVAL 30 MINUTE)
      |  AS last_view_ts
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ─── q112: interval join WITHOUT an equi-key, via bin bucketing ──────
  // q09's range join has a natural equi-key (user_id), so Catalyst plans
  // a hash join. When the ONLY predicate is containment (point ∈
  // [lo, hi]) Spark plans BroadcastNestedLoopJoin — quadratic, dead at
  // scale. The standard fix (Flink interval joins, the published
  // range-join binning technique) is to discretize the domain into
  // fixed-width bins sized ≥ the max interval length: each interval
  // lands in ≤2 bins (exploded), each point in exactly 1, the join
  // becomes a plain EQUI-join on bin id + a residual containment filter,
  // and no pair is ever produced twice (a point has one bin). Intervals
  // here are derived deterministically from lineitem (hi = shipdate +
  // 1 + orderkey % 25 days < the 32-day bin), so both engines build
  // identical inputs; the DuckDB oracle runs the NAIVE inequality join —
  // the semantics the binned plan must reproduce exactly.
  //
  // 100 TB notes: the bin column is a uniform hash-partition key (time
  // bins × data volume per bin), so the equi-join shuffles both sides
  // once; bin width tunes the shuffle-width vs residual-filter
  // selectivity trade. Skewed bins (hot time ranges) fall back to the
  // q61 salting lever on the bin key.
  private val BinDays = 32

  def q112IntervalBinJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val epoch = lit("1992-01-01").cast("date")
    def bin(c: Column): Column = floor(datediff(c, epoch) / BinDays)
    val points = li.where(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("pd"))
      .withColumn("bin", bin(col("pd")))
    val ivs = li.where(col("l_orderkey") % 89 === 0)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("iv_id"),
              col("l_shipdate").cast("date").as("lo"))
      .withColumn("hi",
        date_add(col("lo"), (lit(1) + col("iv_id") % 25).cast("int")))
      .withColumn("bin", explode(sequence(bin(col("lo")), bin(col("hi")))))
    ivs.join(points, Seq("bin"))
      .where(col("pd").between(col("lo"), col("hi")))
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_pts"),
           countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("iv_id"))
  }

  val q112Sql: String =
    """SELECT i.iv_id, CAST(count(*) AS BIGINT) AS n_pts,
      |  CAST(count(DISTINCT p.l_orderkey) AS BIGINT) AS n_orders
      |FROM (SELECT l_orderkey*10 + l_linenumber AS iv_id,
      |        CAST(l_shipdate AS DATE) AS lo,
      |        CAST(l_shipdate AS DATE)
      |          + CAST(1 + (l_orderkey*10 + l_linenumber) % 25 AS INT) AS hi
      |      FROM lineitem WHERE l_orderkey % 89 = 0) i
      |JOIN (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS pd
      |      FROM lineitem WHERE l_orderkey % 97 = 0) p
      |  ON p.pd BETWEEN i.lo AND i.hi
      |GROUP BY i.iv_id
      |ORDER BY i.iv_id""".stripMargin

  // ─── q128/q129: as-of DIRECTION knob (pandas merge_asof parity) ──────
  // q93 is `backward` (last view BEFORE each purchase). `forward` flips
  // the scan: FIRST view strictly after each purchase — the "next touch
  // after conversion" attribution shape. `nearest` takes the closer of
  // the two by timestamp distance (exact matches count as distance 0 on
  // the forward side; ties resolve backward). All three directions are
  // the SAME single merge pass with one row of state — the plan shape
  // (2 shuffles + 2 sorts, nothing else) is identical, PlansSpec asserts
  // it. The oracles spell each contract out as correlated subqueries:
  // forward = min over the strictly-after set; nearest = the branch
  // comparison the merge performs, written in SQL.
  def q128AsofForward(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
              col("event_id").as("v_event"))
    graft.plans.AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("ts"), purchases("event_id")),
        Seq(views("view_ts"), views("v_event")),
        direction = "forward")
      .select(col("user_id"), col("event_id"),
              col("view_ts").as("next_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q128Sql: String =
    """SELECT p.user_id, p.event_id,
      |  (SELECT min(v.ts) FROM events v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |     AND (v.ts > p.ts OR (v.ts = p.ts AND v.event_id > p.event_id)))
      |  AS next_view_ts
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.user_id, p.event_id""".stripMargin

  def q129AsofNearest(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
              col("event_id").as("v_event"))
    graft.plans.AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("ts"), purchases("event_id")),
        Seq(views("view_ts"), views("v_event")),
        direction = "nearest")
      .select(col("user_id"), col("event_id"),
              col("view_ts").as("nearest_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // back = newest strictly-before (by (ts, event_id) tuple); fwd = first
  // at-or-after (tuple ≥ ⇔ NOT strictly-before and not the left row
  // itself — views and purchases never share an event_id, so tuple ≥
  // over views reduces to NOT (tuple <)); pick by epoch distance with
  // ties going backward — exactly the merge's emit branch.
  val q129Sql: String =
    """SELECT user_id, event_id,
      |  CASE
      |    WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL OR
      |         epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts))
      |      THEN back_ts
      |    ELSE fwd_ts
      |  END AS nearest_view_ts
      |FROM (
      |  SELECT p.user_id, p.event_id, p.ts,
      |    (SELECT max(v.ts) FROM events v
      |     WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |       AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id)))
      |    AS back_ts,
      |    (SELECT min(v.ts) FROM events v
      |     WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |       AND NOT (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id)))
      |    AS fwd_ts
      |  FROM events p
      |  WHERE p.event_type = 'purchase') m
      |ORDER BY user_id, event_id""".stripMargin

  // ─── q161: POINT-IN-TIME feature join (feature-store correctness) ────
  // The op feature stores exist for: enrich each fact with the dim
  // version that was CURRENT at the fact's own timestamp — never a later
  // one (that's label/feature leakage). This is exactly a keyed backward
  // as-of join, so it rides the NATIVE operator (one merge pass, O(1)
  // state/key, no validity-interval range join needed): dim versions
  // carry only effective_from; "effective_to" is implicit in the as-of
  // semantics. Facts before a customer's first version null-fill → the
  // 'NONE' bucket, which the census keeps visible (silently dropping
  // pre-history facts is the classic PIT bug). Dim fixture: every 3rd
  // order opens a version (seg = that order's priority, min-deduped per
  // (cust, day) so the version sequence is unique and deterministic).
  // Match strictness: the native as-of is STRICTLY-before (q10/q93's
  // contract), so a version opened on day D applies to facts from D+1
  // on — dates carry no intra-day order, so the same-day fact cannot be
  // proven to follow the update; the conservative read is the
  // leak-safe one.
  def q161PitFeatureJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val dim = o.where(col("o_orderkey") % 3 === 0)
      .groupBy(col("o_custkey").as("d_cust"), col("o_orderdate").as("eff_from"))
      .agg(min(col("o_orderpriority")).as("seg"))
    val facts = o.select(col("o_custkey"), col("o_orderdate"),
      col("o_orderkey"), col("o_totalprice"))
    graft.plans.AsOfJoin.asof(facts, dim,
        facts("o_custkey"), dim("d_cust"),
        Seq(facts("o_orderdate")), Seq(dim("eff_from")))
      .groupBy(coalesce(col("seg"), lit("NONE")).as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("segment"))
  }

  val q161Sql: String =
    """WITH dim AS MATERIALIZED (
      |  SELECT o_custkey AS d_cust, o_orderdate AS eff_from,
      |    min(o_orderpriority) AS seg
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  GROUP BY 1, 2),
      |pit AS (
      |  SELECT f.o_totalprice,
      |    (SELECT d.seg FROM dim d
      |     WHERE d.d_cust = f.o_custkey AND d.eff_from < f.o_orderdate
      |     ORDER BY d.eff_from DESC LIMIT 1) AS seg
      |  FROM orders f)
      |SELECT coalesce(seg, 'NONE') AS segment,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM pit
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_pit_feature_join" -> (q161PitFeatureJoin _),
    "q09_range_join"  -> (q09RangeJoin _),
    "q10_asof_join"   -> (q10AsOfJoin _),
    "q93_asof_native" -> (q93AsofNative _),
    "q112_interval_bin_join" -> (q112IntervalBinJoin _),
    "q116_asof_tolerance" -> (q116AsofTolerance _),
    "q128_asof_forward" -> (q128AsofForward _),
    "q129_asof_nearest" -> (q129AsofNearest _),
  )

  val oracleSql: Map[String, String] = Map(
    "q161_pit_feature_join" -> q161Sql,
    "q09_range_join"  -> q09Sql,
    "q10_asof_join"   -> q10Sql,
    "q93_asof_native" -> q93Sql,
    "q112_interval_bin_join" -> q112Sql,
    "q116_asof_tolerance" -> q116Sql,
    "q128_asof_forward" -> q128Sql,
    "q129_asof_nearest" -> q129Sql,
  )
}
