package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-support analytics the reference's warehouse serves through its
  * produced star schema (SURVEY §3.3: "SQL analytics over the loaded
  * tables" — the reference loads and constrains the schema, the analyst
  * queries it). Each operator here is a classic OLAP insight shape —
  * cohort retention, market-basket affinity, RFM segmentation, Markov
  * transition matrices, IQR outlier screens, chi-square independence,
  * Benford screening, entropy profiling — expressed Spark-first and
  * oracle-checked cell-for-cell against DuckDB.
  *
  * Scale stance shared by the whole file: every query is built from
  * hash-aggregates over the fact table plus joins against SMALL derived
  * frames (per-group fences, per-source totals, 1-row grand totals) that
  * are explicitly `broadcast(...)` — the 100 TB plan is "one shuffle over
  * the fact, map-side everything else". No query collects to the driver.
  */
object Insights {

  // ─── q162: cohort retention matrix ─────────────────────────────────────
  // The canonical growth-analytics query: bucket customers by the month
  // of their FIRST order (the cohort), then count how many are still
  // ordering k months later. Month index = year*12+month keeps the key a
  // plain long (no date formatting to disagree on between engines).
  //
  // Plan: one shuffle to find each customer's min month (groupBy custkey),
  // broadcast-joined back (cohort frame is |customers| rows but only
  // 2 longs wide — at 100 TB of ORDERS the customer dim is ~1e8 rows, so
  // the join flips to a shuffle join on o_custkey, which AQE picks
  // automatically; the code is join-strategy-agnostic). The final distinct
  // + groupBy is over (cohort, months_since, custkey) — cardinality
  // |customers|×|active months|, far smaller than the fact.
  def q162CohortRetention(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(
      col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("midx"))
    val cohort = o.groupBy("o_custkey").agg(min("midx").as("cohort"))
    o.join(cohort, "o_custkey")
      .select(col("cohort"), (col("midx") - col("cohort")).as("months_since"),
              col("o_custkey"))
      .distinct()
      .groupBy("cohort", "months_since")
      .agg(count(lit(1)).as("active_customers"))
      .orderBy("cohort", "months_since")
  }

  val q162Sql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS midx
      |  FROM orders),
      |cohort AS (SELECT o_custkey, min(midx) AS cohort FROM o GROUP BY 1)
      |SELECT cohort, months_since,
      |  CAST(count(*) AS BIGINT) AS active_customers
      |FROM (
      |  SELECT DISTINCT c.cohort, o.midx - c.cohort AS months_since,
      |    o.o_custkey
      |  FROM o JOIN cohort c ON o.o_custkey = c.o_custkey)
      |GROUP BY cohort, months_since
      |ORDER BY cohort, months_since""".stripMargin

  // ─── q163: market-basket affinity (support / confidence / lift) ───────
  // Frequent-pair mining over order baskets: which parts co-occur in the
  // same order more than chance predicts. This is the A-priori first pass
  // (pairs only) as one self-join:
  //   pairs  = lineitem ⋈ lineitem ON orderkey, pk1 < pk2
  //   lift   = P(p2|p1) / P(p2)
  //
  // Scale: the self-join keys on l_orderkey, the fact's NATURAL
  // partitioning — co-partitioned, so the pair expansion is map-side
  // after one shuffle; fanout per order is k(k-1)/2 for basket size k
  // (TPC-H k≤7; a retail basket of 50 → 1 225 rows — bounded, not
  // quadratic in the table). Item totals and the order count are tiny
  // aggregates, broadcast onto the pair frame. The min-support HAVING
  // prunes before the stats joins, mirroring A-priori's candidate cut.
  def q163BasketAffinity(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nOrders = li.agg(countDistinct(col("ok")).cast("double").as("n_orders"))
    val itemN = li.groupBy("pk").agg(count(lit(1)).cast("double").as("item_n"))
    val pairs = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_n"))
      .where(col("pair_n") >= 3)
    pairs
      .join(broadcast(itemN.withColumnRenamed("pk", "p1")
        .withColumnRenamed("item_n", "i1")), "p1")
      .join(broadcast(itemN.withColumnRenamed("pk", "p2")
        .withColumnRenamed("item_n", "i2")), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("pair_n"),
        round(col("pair_n") / col("n_orders"), 6).as("support"),
        round(col("pair_n") / col("i1"), 6).as("confidence"),
        round(col("pair_n") / col("i1") * col("n_orders") / col("i2"), 6)
          .as("lift"))
      .orderBy("p1", "p2")
  }

  val q163Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem),
      |tot AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_orders FROM li),
      |item AS (SELECT pk, CAST(count(*) AS DOUBLE) AS item_n
      |         FROM li GROUP BY pk),
      |pair AS (
      |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS pair_n
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk
      |  HAVING count(*) >= 3)
      |SELECT p1, p2, pair_n,
      |  round(pair_n / t.n_orders, 6) AS support,
      |  round(pair_n / i1.item_n, 6) AS confidence,
      |  round(pair_n / i1.item_n * t.n_orders / i2.item_n, 6) AS lift
      |FROM pair
      |CROSS JOIN tot t
      |JOIN item i1 ON pair.p1 = i1.pk
      |JOIN item i2 ON pair.p2 = i2.pk
      |ORDER BY p1, p2""".stripMargin

  // ─── q164: RFM segmentation ───────────────────────────────────────────
  // Score every customer 1–4 on Recency / Frequency / Monetary via
  // exact ntile(4), then report the segment grid. The per-customer
  // rollup is a single hash-agg over orders. r15 (guide §2.5): the
  // three tile assignments were GLOBAL ntile windows — three
  // single-partition sorts of the whole customer frame, the shape that
  // serializes at 1e9 customers — and are now [[Windows.ntileScaled]]:
  // the dense position comes from range-bucketed local windows + a
  // broadcast offsets frame, the tile from the SQL-standard arithmetic
  // on (position, N). EXACTLY the same tiles (ties broken by o_custkey
  // so the order is total); the oracle twin still says ntile. The
  // customer frame is checkpointed once — the three axis pipelines and
  // their bounds aggregates read one materialization, not four
  // re-aggregations of orders.
  def q164RfmSegments(s: SparkSession, d: String): DataFrame = {
    val cust = orders(s, d).groupBy("o_custkey").agg(
      max(col("o_orderdate")).as("recency"),
      count(lit(1)).as("frequency"),
      sum(col("o_totalprice")).as("monetary"))
      .localCheckpoint()
    // range-aligned bucket keys for the DESC orders: negate a monotone
    // integer image of the leading sort column (day number / count /
    // truncated monetary); one shared bounds aggregate for all 3 axes
    val scored = Windows.ntileScaledMulti(cust, Seq(
      (-unix_date(to_date(col("recency"))),
        Seq(col("recency").desc, col("o_custkey")), "r_score"),
      (-col("frequency"),
        Seq(col("frequency").desc, col("o_custkey")), "f_score"),
      (-col("monetary"),
        Seq(col("monetary").desc, col("o_custkey")), "m_score")), 4)
    scored
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
           round(avg(col("monetary")), 2).as("avg_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val q164Sql: String =
    """WITH cust AS (
      |  SELECT o_custkey, max(o_orderdate) AS recency,
      |    count(*) AS frequency, sum(o_totalprice) AS monetary
      |  FROM orders GROUP BY o_custkey),
      |scored AS (
      |  SELECT monetary,
      |    ntile(4) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
      |    ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
      |    ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      |  FROM cust)
      |SELECT r_score, f_score, m_score,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  round(avg(monetary), 2) AS avg_monetary
      |FROM scored
      |GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  // ─── q165: Markov transition matrix over event streams ────────────────
  // P(next event type | current event type) per user journey — the
  // first-order Markov model behind "what do users do after X" and the
  // input to sequence-anomaly scoring. lead() over (user, time) pairs up
  // consecutive events; one hash-agg counts transitions; the per-source
  // totals (≤ |event types|² rows) broadcast back for the probabilities.
  //
  // Scale: the window partitions by user_id — millions of small
  // partitions, the window shape that scales linearly (contrast the
  // global windows q164 documents). Ordering ties broken by event_id on
  // both engines; the oracle casts ts to microseconds FIRST so nanos
  // don't order ties differently (see q87's cast_events note).
  def q165MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .where(col("dst").isNotNull)
    val counts = pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("src").agg(sum(col("n")).as("src_n"))
    counts.join(broadcast(totals), "src")
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("src_n").cast("double"), 6)
          .as("p"))
      .orderBy("src", "dst")
  }

  val q165Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type AS src
      |  FROM events),
      |pairs AS (
      |  SELECT src, lead(src) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS dst
      |  FROM e),
      |counts AS (
      |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
      |totals AS (SELECT src, sum(n) AS src_n FROM counts GROUP BY src)
      |SELECT c.src, c.dst, c.n,
      |  round(CAST(c.n AS DOUBLE) / CAST(t.src_n AS DOUBLE), 6) AS p
      |FROM counts c JOIN totals t ON c.src = t.src
      |ORDER BY c.src, c.dst""".stripMargin

  // ─── q166: IQR outlier screen (Tukey fences) per group ────────────────
  // The boxplot rule as a distributed screen: per event type, flag values
  // outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. Two passes over the fact: an
  // exact-percentile agg builds the per-group fence frame (|groups| rows,
  // broadcast), then one more scan counts violations — the same
  // fence-then-rescan shape as q82's length clip, with the fences LEARNED
  // from the data instead of configured. 100 TB path: swap `percentile`
  // for `approx_percentile` (q96/q99 pin that sketch twin); the rescan is
  // embarrassingly parallel either way.
  def q166IqrOutliers(s: SparkSession, d: String,
                      sketch: Boolean = false): DataFrame = {
    val e = events(s, d)
    val fences = e.groupBy("event_type").agg(
        pct("value", "0.25D", sketch).as("q1"),
        pct("value", "0.75D", sketch).as("q3"))
      .select(col("event_type"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    e.join(broadcast(fences), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count_if(col("value") < col("lo") || col("value") > col("hi"))
          .as("n_outliers"),
        round(first(col("lo")), 4).as("lo"),
        round(first(col("hi")), 4).as("hi"))
      .orderBy("event_type")
  }

  val q166Sql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
      |  FROM events GROUP BY event_type),
      |fence AS (
      |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
      |    q3 + (q3 - q1) * 1.5 AS hi
      |  FROM f)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE e.value < lo OR e.value > hi) AS BIGINT)
      |    AS n_outliers,
      |  round(min(lo), 4) AS lo, round(min(hi), 4) AS hi
      |FROM events e JOIN fence ON e.event_type = fence.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  // ─── q167: chi-square test of independence ────────────────────────────
  // Is order PRIORITY independent of order STATUS? Pearson's χ² over the
  // contingency table: χ² = Σ (obs − exp)² / exp, exp = rowTotal·colTotal/N.
  // The contingency table is |priorities|×|statuses| — a handful of
  // cells — so everything after the single fact-table hash-agg is
  // broadcast algebra. This is the distributed A/B-test shape: the fact
  // scan reduces to a tiny sufficient statistic; the test statistic is
  // computed closed-form on top.
  def q167ChisqIndependence(s: SparkSession, d: String): DataFrame = {
    val obs = orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).cast("double").as("o"))
    val rowT = obs.groupBy("pri").agg(sum(col("o")).as("rt"))
    val colT = obs.groupBy("st").agg(sum(col("o")).as("ct"))
    val n = obs.agg(sum(col("o")).as("n"))
    // dof from the (tiny) marginal frames' row counts — NOT a
    // multi-distinct aggregate, whose Expand would replicate the input
    // per distinct column before the shuffle
    val nr = rowT.agg(count(lit(1)).as("nr"))
    val nc = colT.agg(count(lit(1)).as("nc"))
    obs.join(broadcast(rowT), "pri").join(broadcast(colT), "st")
      .crossJoin(broadcast(n))
      .select((((col("o") - col("rt") * col("ct") / col("n"))
                 * (col("o") - col("rt") * col("ct") / col("n")))
                / (col("rt") * col("ct") / col("n"))).as("contrib"))
      .agg(round(sum(col("contrib")), 4).as("chi2"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .select(col("chi2"), ((col("nr") - 1) * (col("nc") - 1)).as("dof"))
  }

  val q167Sql: String =
    """WITH obs AS (
      |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
      |    CAST(count(*) AS DOUBLE) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT pri, sum(o) AS rt FROM obs GROUP BY pri),
      |ct AS (SELECT st, sum(o) AS ct FROM obs GROUP BY st),
      |n AS (SELECT sum(o) AS n FROM obs)
      |SELECT
      |  round(sum((o - rt * ct / n.n) * (o - rt * ct / n.n)
      |        / (rt * ct / n.n)), 4) AS chi2,
      |  CAST((count(DISTINCT obs.pri) - 1) * (count(DISTINCT obs.st) - 1)
      |       AS BIGINT) AS dof
      |FROM obs
      |JOIN rt ON obs.pri = rt.pri
      |JOIN ct ON obs.st = ct.st
      |CROSS JOIN n""".stripMargin

  // ─── q168: Benford leading-digit screen ───────────────────────────────
  // Fraud/data-quality screen: the leading digit of naturally-occurring
  // amounts should follow P(d) = log10(1 + 1/d). The digit is extracted
  // NUMERICALLY (x / 10^floor(log10 x)) — never via string formatting,
  // which the two engines render differently. One hash-agg on a 9-value
  // key; the grand total broadcasts back. Purely map-side + one tiny
  // shuffle at any scale.
  def q168BenfordScreen(s: SparkSession, d: String): DataFrame = {
    val digits = lineitem(s, d).select(
      floor(col("l_extendedprice")
        / pow(lit(10.0), floor(log10(col("l_extendedprice")))))
        .cast("long").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).cast("double").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("tot"), 6).as("observed_p"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford_p"),
        round(abs(col("n") / col("tot")
          - log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))), 6)
          .as("abs_dev"))
      .orderBy("digit")
  }

  val q168Sql: String =
    """WITH digits AS (
      |  SELECT CAST(floor(l_extendedprice
      |    / power(10.0, floor(log10(l_extendedprice)))) AS BIGINT) AS digit
      |  FROM lineitem),
      |counts AS (
      |  SELECT digit, CAST(count(*) AS BIGINT) AS n
      |  FROM digits GROUP BY digit),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM counts)
      |SELECT digit, n,
      |  round(n / tot, 6) AS observed_p,
      |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
      |  round(abs(n / tot - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
      |    AS abs_dev
      |FROM counts CROSS JOIN tot
      |ORDER BY digit""".stripMargin

  // ─── q169: categorical entropy profile ────────────────────────────────
  // Column profiling for the produced schema: Shannon entropy (bits) and
  // cardinality of each categorical column — the summary a data catalog
  // computes per column to rank "informative" vs "constant" fields. Each
  // column costs one hash-agg on the (tiny) value domain; the per-column
  // results union into one profile frame. At 100 TB you run the four
  // aggs in one pass with grouping sets over a melted frame; the
  // per-column form keeps each distribution's plan independent and
  // readable.
  def q169EntropyProfile(s: SparkSession, d: String): DataFrame = {
    def ent(df: DataFrame, c: String, label: String): DataFrame = {
      val dist = df.groupBy(col(c)).agg(count(lit(1)).cast("double").as("cnt"))
      val tot = dist.agg(sum(col("cnt")).as("tot"))
      dist.crossJoin(broadcast(tot))
        .select((col("cnt") / col("tot")).as("p"))
        .agg(round(-sum(col("p") * log2(col("p"))), 6).as("entropy_bits"),
             count(lit(1)).as("n_distinct"))
        .select(lit(label).as("column_name"), col("entropy_bits"),
                col("n_distinct"))
    }
    val o = orders(s, d); val l = lineitem(s, d)
    ent(o, "o_orderstatus", "orders.o_orderstatus")
      .unionAll(ent(o, "o_orderpriority", "orders.o_orderpriority"))
      .unionAll(ent(l, "l_returnflag", "lineitem.l_returnflag"))
      .unionAll(ent(l, "l_linestatus", "lineitem.l_linestatus"))
      .orderBy("column_name")
  }

  val q169Sql: String = {
    def one(table: String, c: String): String =
      s"""SELECT '$table.$c' AS column_name,
         |  round(-sum(p * log2(p)), 6) AS entropy_bits,
         |  CAST(count(*) AS BIGINT) AS n_distinct
         |FROM (
         |  SELECT cnt / (SELECT sum(cnt) FROM (
         |      SELECT CAST(count(*) AS DOUBLE) AS cnt FROM $table
         |      GROUP BY $c)) AS p
         |  FROM (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM $table
         |        GROUP BY $c))""".stripMargin
    Seq(one("orders", "o_orderstatus"), one("orders", "o_orderpriority"),
        one("lineitem", "l_returnflag"), one("lineitem", "l_linestatus"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ─── q172: inter-purchase gap profile by market segment ───────────────
  // Time-between-orders per customer (lag over the per-customer order
  // history), profiled per market segment — the survival-analysis input
  // behind churn models. The window partitions by o_custkey (millions of
  // small partitions, the linear-scaling window shape); the segment
  // profile is one hash-agg over the gap frame with the customer dim
  // broadcast in.
  def q172InterpurchaseGaps(s: SparkSession, d: String,
                            sketch: Boolean = false): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val gaps = orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), col("prev")).cast("long").as("gap_days"))
    gaps.join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_days")), 2).as("avg_gap"),
        // cast: approx_percentile over an integral column returns the
        // column type; the knob must not change the output schema
        round(pct("gap_days", "0.5D", sketch).cast("double"), 2).as("median_gap"),
        round(pct("gap_days", "0.9D", sketch).cast("double"), 2).as("p90_gap"),
        max(col("gap_days")).as("max_gap"))
      .orderBy("c_mktsegment")
  }

  val q172Sql: String =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey), o_orderdate) AS BIGINT)
      |      AS gap_days
      |  FROM orders)
      |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
      |  round(avg(gap_days), 2) AS avg_gap,
      |  round(quantile_cont(gap_days, 0.5), 2) AS median_gap,
      |  round(quantile_cont(gap_days, 0.9), 2) AS p90_gap,
      |  max(gap_days) AS max_gap
      |FROM gaps JOIN customer ON o_custkey = c_custkey
      |WHERE gap_days IS NOT NULL
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ─── q173: PSI drift between time halves ──────────────────────────────
  // Population Stability Index — the standard model-monitoring drift
  // score — between the first and second half of the event stream's time
  // range. Bins are DECILES OF THE REFERENCE window (so ref mass is 0.1
  // by construction and no bin is empty on the reference side); the
  // midpoint split uses pure integer arithmetic (us*2 <= min+max) so both
  // engines cut identically. Binning assigns each value the count of cut
  // points strictly below it via a broadcast join against the 9-row cut
  // frame — map-side at any scale. PSI = Σ (curP − refP)·ln(curP/refP),
  // with a 1e-6 floor on the current side for empty bins.
  def q173PsiDrift(s: SparkSession, d: String,
                   sketch: Boolean = false): DataFrame = {
    val e = events(s, d)
      .select(col("value"), unix_micros(col("ts")).as("us"))
    val mm = e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val tagged = e.crossJoin(broadcast(mm))
      .select(col("value"),
        (col("us") * 2 <= col("mn") + col("mx")).as("is_ref"))
    // cut points as a 1-row broadcast ARRAY; bin = |{cuts < value}| is a
    // map-side size(filter(...)) over distinct values — no 9× fan-out,
    // no per-value re-aggregation (the q190 one-pass binning form)
    val cuts = tagged.where(col("is_ref"))
      .agg(pct("value",
        "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)", sketch)
        .as("cuts"))
    val vals = tagged.groupBy(col("value"), col("is_ref"))
      .agg(count(lit(1)).as("cnt"))
    val binned = vals.crossJoin(broadcast(cuts))
      .select(col("value"), col("is_ref"), col("cnt"),
        size(filter(col("cuts"), c => c < col("value"))).cast("long").as("bin"))
    val perBin = binned.groupBy("bin").agg(
      sum(when(col("is_ref"), col("cnt")).otherwise(0L)).cast("double")
        .as("ref_n"),
      sum(when(!col("is_ref"), col("cnt")).otherwise(0L)).cast("double")
        .as("cur_n"))
    val tot = perBin.agg(sum(col("ref_n")).as("ref_tot"),
                         sum(col("cur_n")).as("cur_tot"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("ref_n").cast("long").as("ref_n"),
        col("cur_n").cast("long").as("cur_n"),
        (col("ref_n") / col("ref_tot")).as("ref_p"),
        greatest(col("cur_n") / col("cur_tot"), lit(1e-6)).as("cur_p"))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(col("ref_p"), 6).as("ref_p"), round(col("cur_p"), 6).as("cur_p"),
        round((col("cur_p") - col("ref_p")) * log(col("cur_p") / col("ref_p")), 6)
          .as("psi_contrib"))
      .orderBy("bin")
  }

  val q173Sql: String =
    """WITH e AS (
      |  SELECT value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |mm AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
      |tagged AS (
      |  SELECT value, (us * 2 <= mn + mx) AS is_ref FROM e CROSS JOIN mm),
      |cuts AS (
      |  SELECT unnest(quantile_cont(value,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS cut
      |  FROM tagged WHERE is_ref),
      |vals AS (
      |  SELECT value, is_ref, CAST(count(*) AS BIGINT) AS cnt
      |  FROM tagged GROUP BY value, is_ref),
      |binned AS (
      |  SELECT value, is_ref, cnt,
      |    CAST(count(*) FILTER (WHERE cut < value) AS BIGINT) AS bin
      |  FROM vals CROSS JOIN cuts GROUP BY value, is_ref, cnt),
      |per_bin AS (
      |  SELECT bin,
      |    CAST(sum(CASE WHEN is_ref THEN cnt ELSE 0 END) AS DOUBLE) AS ref_n,
      |    CAST(sum(CASE WHEN NOT is_ref THEN cnt ELSE 0 END) AS DOUBLE)
      |      AS cur_n
      |  FROM binned GROUP BY bin),
      |tot AS (SELECT sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot
      |        FROM per_bin),
      |p AS (
      |  SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
      |    CAST(cur_n AS BIGINT) AS cur_n,
      |    ref_n / ref_tot AS ref_p,
      |    greatest(cur_n / cur_tot, 1e-6) AS cur_p
      |  FROM per_bin CROSS JOIN tot)
      |SELECT bin, ref_n, cur_n, round(ref_p, 6) AS ref_p,
      |  round(cur_p, 6) AS cur_p,
      |  round((cur_p - ref_p) * ln(cur_p / ref_p), 6) AS psi_contrib
      |FROM p ORDER BY bin""".stripMargin

  // ─── q174: two-sample Kolmogorov–Smirnov statistic ────────────────────
  // Distributional A/B comparison: D = max |F_click(x) − F_purchase(x)|
  // over the pooled support. Grouping by exact value first makes the
  // ECDF step function tie-safe and deterministic. r15 (guide §2.5):
  // the two cumulative sums over the DISTINCT value domain were one
  // global-sort window — a single-partition sort of the whole support,
  // which is data-sized for a continuous metric — and are now the
  // scalable [[Windows.prefixSumScaled]] (exact: the summed counts are
  // integers). The value histogram is checkpointed once so the two
  // chained prefix passes and the totals read one materialization.
  def q174KsTest(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .groupBy("value")
      .agg(count_if(col("event_type") === "click").as("ca"),
           count_if(col("event_type") === "purchase").as("cb"))
      .localCheckpoint()
    val tot = e.agg(sum(col("ca")).cast("double").as("na"),
                    sum(col("cb")).cast("double").as("nb"))
    val cum = Windows.prefixSumScaled(
      Windows.prefixSumScaled(e, Seq.empty, col("value"),
        Seq(col("value")), col("ca"), "cuma"),
      Seq.empty, col("value"), Seq(col("value")), col("cb"), "cumb")
    cum.select(col("cuma"), col("cumb"))
      .crossJoin(broadcast(tot))
      .agg(round(max(abs(col("cuma").cast("double") / col("na")
                       - col("cumb").cast("double") / col("nb"))), 6)
             .as("ks_stat"),
           first(col("na")).cast("long").as("n_click"),
           first(col("nb")).cast("long").as("n_purchase"))
  }

  val q174Sql: String =
    """WITH e AS (
      |  SELECT value,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS ca,
      |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      |      AS cb
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY value),
      |tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
      |               CAST(sum(cb) AS DOUBLE) AS nb FROM e),
      |cum AS (
      |  SELECT
      |    sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cuma,
      |    sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM e)
      |SELECT round(max(abs(CAST(cuma AS DOUBLE) / na
      |                   - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_stat,
      |  CAST(min(na) AS BIGINT) AS n_click,
      |  CAST(min(nb) AS BIGINT) AS n_purchase
      |FROM cum CROSS JOIN tot""".stripMargin

  // ─── q175: Gini coefficient of revenue concentration ──────────────────
  // "What share of revenue do the top customers own" collapsed to the
  // standard inequality index: G = 2·Σ i·r_i / (n·Σ r) − (n+1)/n over
  // revenues sorted ascending (ties broken by custkey so both engines
  // rank identically). Per-customer revenue is one hash-agg. r15
  // (guide §2.5): the rank i was a global row_number window — a
  // single-partition sort of the whole customer frame — and is now the
  // scalable [[Windows.densePosScaled]] (a prefix sum of 1s: exact
  // integer positions, identical ranks under the same total order).
  def q175Gini(s: SparkSession, d: String): DataFrame = {
    val rev = orders(s, d).groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("r"))
    Windows.densePosScaled(rev, Seq.empty, col("r"),
        Seq(col("r"), col("o_custkey")), "ipos")
      .select(col("r"), col("ipos").cast("double").as("i"))
      .agg(sum(col("i") * col("r")).as("sip"),
           count(lit(1)).cast("double").as("n"), sum(col("r")).as("tot"))
      .select(
        round(lit(2.0) * col("sip") / (col("n") * col("tot"))
              - (col("n") + lit(1.0)) / col("n"), 6).as("gini"),
        col("n").cast("long").as("n_customers"))
  }

  val q175Sql: String =
    """WITH rev AS (
      |  SELECT o_custkey, sum(o_totalprice) AS r
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT r, CAST(row_number() OVER (ORDER BY r, o_custkey) AS DOUBLE)
      |    AS i
      |  FROM rev),
      |agg AS (
      |  SELECT sum(i * r) AS sip, CAST(count(*) AS DOUBLE) AS n,
      |    sum(r) AS tot
      |  FROM ranked)
      |SELECT round(2.0 * sip / (n * tot) - (n + 1.0) / n, 6) AS gini,
      |  CAST(n AS BIGINT) AS n_customers
      |FROM agg""".stripMargin

  // ─── q176: autocorrelation of the daily revenue series ────────────────
  // Lag-k ACF (k = 1..7) of daily order revenue — the seasonality probe
  // run before any forecasting model (q06 is the forecast consumer). The
  // fact reduces to one row per day; each lag is a window-lag + corr
  // aggregate over that tiny series. The 7 per-lag plans union into one
  // frame; at 100 TB the daily rollup is the only fact-sized shuffle and
  // everything after is a few-thousand-row series on one node's worth of
  // work.
  def q176Acf(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy("dt")
    val lags = (1 to 7).map { k =>
      daily.select(col("rev"), lag(col("rev"), k).over(w).as("l"))
        .agg(round(corr(col("rev"), col("l")), 6).as("acf"),
             count(col("l")).as("n_pairs"))
        .select(lit(k.toLong).as("lag_k"), col("acf"), col("n_pairs"))
    }
    lags.reduce(_ unionAll _).orderBy("lag_k")
  }

  val q176Sql: String = {
    def one(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS lag_k,
         |  round(corr(rev, l), 6) AS acf,
         |  CAST(count(l) AS BIGINT) AS n_pairs
         |FROM (SELECT rev, lag(rev, $k) OVER (ORDER BY dt) AS l
         |      FROM (SELECT CAST(o_orderdate AS DATE) AS dt,
         |              sum(o_totalprice) AS rev
         |            FROM orders GROUP BY 1))""".stripMargin
    (1 to 7).map(one).mkString("", "\nUNION ALL\n", "\nORDER BY lag_k")
  }

  // ─── q177: marketing attribution (first-touch / last-touch) ───────────
  // For every purchase, credit the FIRST and the LAST non-purchase event
  // the user emitted before it — the two canonical attribution models,
  // computed in one pass with ignore-null window aggregates over the
  // preceding-rows frame (no self-join, no per-user collect). The window
  // partitions by user_id — the linear-scaling shape (q165's note).
  def q177Attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
              col("value"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("last_touch").isNotNull)
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("conversions"),
           round(sum(col("value")), 2).as("revenue"))
      .orderBy("first_touch", "last_touch")
  }

  val q177Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    value
      |  FROM events),
      |attr AS (
      |  SELECT event_type, value,
      |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      |  FROM e)
      |SELECT first_touch, last_touch, CAST(count(*) AS BIGINT) AS conversions,
      |  round(sum(value), 2) AS revenue
      |FROM attr
      |WHERE event_type = 'purchase' AND last_touch IS NOT NULL
      |GROUP BY first_touch, last_touch
      |ORDER BY first_touch, last_touch""".stripMargin

  // ─── q178: CUSUM change-point detection ───────────────────────────────
  // Where did the daily-revenue regime shift? Standardize the series
  // against its global mean/σ, cumulative-sum the deviations, and report
  // the |CUSUM| peak — the classic Page-style change-point estimate. The
  // cumsum is one ordered window over the day-level series (already
  // reduced from the fact); both engines accumulate in the same dt order
  // so the float sequence is identical.
  def q178CusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val stats = daily.agg(avg(col("rev")).as("mu"),
                          stddev_pop(col("rev")).as("sd"))
    val w = Window.orderBy("dt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(stats))
      .select(col("dt"),
        sum((col("rev") - col("mu")) / col("sd")).over(w).as("s"))
      .orderBy(abs(col("s")).desc, col("dt"))
      .limit(1)
      .select(col("dt").as("change_date"), round(col("s"), 4).as("cusum"))
  }

  val q178Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS dt, sum(o_totalprice) AS rev
      |  FROM orders GROUP BY 1),
      |stats AS (SELECT avg(rev) AS mu, stddev_pop(rev) AS sd FROM daily),
      |cus AS (
      |  SELECT dt, sum((rev - mu) / sd) OVER (ORDER BY dt
      |    ROWS UNBOUNDED PRECEDING) AS s
      |  FROM daily CROSS JOIN stats)
      |SELECT dt AS change_date, round(s, 4) AS cusum
      |FROM cus ORDER BY abs(s) DESC, dt LIMIT 1""".stripMargin

  // ─── q179: exponential time-decay engagement score ────────────────────
  // The feature-store staple: per-user engagement where yesterday counts
  // e^(−1/τ) of today (τ = 7 days). Decay anchors on the corpus max
  // timestamp (broadcast 1-row frame) so the whole thing is one map-side
  // expression + one hash-agg — embarrassingly parallel at any scale,
  // and incrementally maintainable (new data multiplies old scores by a
  // constant factor, the q106 incremental-agg pattern).
  def q179DecayedEngagement(s: SparkSession, d: String): DataFrame = {
    val tauUs = 604800000000.0 // 7 days in microseconds
    val e = events(s, d)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
    val mx = e.agg(max(col("us")).as("mx"))
    e.crossJoin(broadcast(mx))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")
          * exp((col("us") - col("mx")).cast("double") / lit(tauUs))), 4)
          .as("decayed_score"))
      .orderBy("user_id")
  }

  val q179Sql: String =
    """WITH e AS (
      |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |mx AS (SELECT max(us) AS mx FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value
      |    * exp(CAST(us - mx AS DOUBLE) / 604800000000.0)), 4)
      |    AS decayed_score
      |FROM e CROSS JOIN mx
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ─── q180: frequent 3-step path mining ────────────────────────────────
  // The top navigation paths: consecutive event-type triples per user
  // journey (two leads over the per-user window), counted and cut at
  // min-support 5. Journey mining without sequence explosion: the state
  // per row is two strings, the agg key domain is |types|³.
  def q180PathMining(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)
      .orderBy("e1", "e2", "e3")
  }

  val q180Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type AS e1
      |  FROM events),
      |paths AS (
      |  SELECT e1,
      |    lead(e1, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS e2,
      |    lead(e1, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS e3
      |  FROM e)
      |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
      |FROM paths WHERE e3 IS NOT NULL
      |GROUP BY e1, e2, e3
      |HAVING count(*) >= 5
      |ORDER BY e1, e2, e3""".stripMargin

  // ─── q182: skyline (Pareto frontier) of customer value ────────────────
  // The multi-criteria "best customers" query: keep every customer not
  // DOMINATED on (order count, total quantity, account balance) — q
  // dominates p when q >= p on all three and > on at least one. Metrics
  // are chosen exact-deterministic (counts and integral-quantity sums,
  // plus a raw column) so both engines see identical dominance.
  //
  // Distributed form is the canonical two-phase skyline (Börzsönyi et
  // al., ICDE'01 adapted to shared-nothing): a PARTITION-LOCAL skyline
  // first — skylines are tiny relative to their input, so this is the
  // heavy pruning step and runs embarrassingly parallel via
  // mapPartitions (the rare case where per-partition imperative logic is
  // the right tool: dominance is not an equi-join, so no shuffle key
  // exists for Catalyst to exploit) — then the surviving candidates
  // (thousands, not millions) meet in one final broadcast anti-join with
  // the dominance predicate. The naive form would be a single O(n²)
  // non-equi self-join over the full frame; at 10⁸ customers that is the
  // plan that never finishes, while local-prune + candidate-join is
  // minutes.
  def q182Skyline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = orders(s, d).join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity")).cast("long").as("qty_total"))
    val withBal = base.join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("n_items"),
              col("qty_total"), col("c_acctbal"))
      .as[(Long, Long, Long, Double)]

    def localSkyline(it: Iterator[(Long, Long, Long, Double)]
                    ): Iterator[(Long, Long, Long, Double)] = {
      val kept = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double)]
      def dominates(q: (Long, Long, Long, Double),
                    p: (Long, Long, Long, Double)): Boolean =
        q._2 >= p._2 && q._3 >= p._3 && q._4 >= p._4 &&
          (q._2 > p._2 || q._3 > p._3 || q._4 > p._4)
      it.foreach { p =>
        if (!kept.exists(q => dominates(q, p))) {
          val survivors = kept.filterNot(q => dominates(p, q))
          survivors += p
          kept.clear(); kept ++= survivors
        }
      }
      kept.iterator
    }

    val candidates = withBal.mapPartitions(localSkyline).toDF(
      "custkey", "n_items", "qty_total", "c_acctbal")
    // global pass: candidates vs candidates (both tiny post-prune)
    val dom = candidates.as("p").join(broadcast(candidates.as("q")),
      col("q.n_items") >= col("p.n_items") &&
      col("q.qty_total") >= col("p.qty_total") &&
      col("q.c_acctbal") >= col("p.c_acctbal") &&
      (col("q.n_items") > col("p.n_items") ||
       col("q.qty_total") > col("p.qty_total") ||
       col("q.c_acctbal") > col("p.c_acctbal")), "left_anti")
    dom.select(col("custkey"), col("n_items"), col("qty_total"),
               col("c_acctbal"))
      .orderBy("custkey")
  }

  val q182Sql: String =
    """WITH pts AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(count(*) AS BIGINT) AS n_items,
      |    CAST(sum(l_quantity) AS BIGINT) AS qty_total
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY o_custkey),
      |pb AS (
      |  SELECT custkey, n_items, qty_total, c_acctbal
      |  FROM pts JOIN customer ON custkey = c_custkey)
      |SELECT custkey, n_items, qty_total, c_acctbal
      |FROM pb p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pb q
      |  WHERE q.n_items >= p.n_items AND q.qty_total >= p.qty_total
      |    AND q.c_acctbal >= p.c_acctbal
      |    AND (q.n_items > p.n_items OR q.qty_total > p.qty_total
      |         OR q.c_acctbal > p.c_acctbal))
      |ORDER BY custkey""".stripMargin

  // ─── q184: full linear-regression sufficient-statistics family ────────
  // The regr_* aggregates q135 doesn't cover: centered second moments
  // (sxx/syy/sxy), the marginal means, and r². Moments are reported
  // PER-ROW-normalized (÷ regr_count) — at 5·10¹⁴ raw magnitude the
  // engines' different summation trees diverge beyond round(…,2), while
  // the normalized form is stable to ~1e-6; same sufficient statistic,
  // scale-safe comparison.
  def q184RegrFull(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_sxx(l_extendedprice, l_quantity)")
          / expr("regr_count(l_extendedprice, l_quantity)"), 2).as("sxx_n"),
        round(expr("regr_syy(l_extendedprice, l_quantity)")
          / expr("regr_count(l_extendedprice, l_quantity)"), 2).as("syy_n"),
        round(expr("regr_sxy(l_extendedprice, l_quantity)")
          / expr("regr_count(l_extendedprice, l_quantity)"), 2).as("sxy_n"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("avgx"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("avgy"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"))
      .orderBy("l_returnflag")

  val q184Sql: String =
    """SELECT l_returnflag,
      |  round(regr_sxx(l_extendedprice, l_quantity)
      |    / regr_count(l_extendedprice, l_quantity), 2) AS sxx_n,
      |  round(regr_syy(l_extendedprice, l_quantity)
      |    / regr_count(l_extendedprice, l_quantity), 2) AS syy_n,
      |  round(regr_sxy(l_extendedprice, l_quantity)
      |    / regr_count(l_extendedprice, l_quantity), 2) AS sxy_n,
      |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
      |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q185: linear (equal-credit) attribution ──────────────────────────
  // q177's multi-touch sibling: each purchase's value splits EQUALLY
  // across all its preceding touches. No self-join needed — per purchase
  // row compute alloc = value / n_preceding_touches, then every touch's
  // credit is the sum of alloc over FOLLOWING rows of its user (a touch
  // precedes a purchase ⟺ the purchase follows the touch). Two windows
  // over the same per-user ordering — one pass, linear scaling.
  def q185LinearAttribution(s: SparkSession, d: String): DataFrame = {
    val wPrev = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
              col("value"))
      .withColumn("n_touch",
        count_if(col("event_type") =!= "purchase").over(wPrev))
      .withColumn("alloc",
        when(col("event_type") === "purchase" && col("n_touch") > 0,
             col("value") / col("n_touch")).otherwise(lit(0.0)))
      .withColumn("credit", sum(col("alloc")).over(wNext))
      .where(col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
           round(sum(col("credit")), 2).as("credit"))
      .orderBy("channel")
  }

  val q185Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    value
      |  FROM events),
      |alloc AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN event_type = 'purchase' AND n_touch > 0
      |         THEN value / n_touch ELSE 0.0 END AS alloc
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type, value,
      |      count(*) FILTER (WHERE event_type <> 'purchase') OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_touch
      |    FROM e)),
      |credited AS (
      |  SELECT event_type,
      |    sum(alloc) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS credit
      |  FROM alloc)
      |SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_touches,
      |  round(sum(credit), 2) AS credit
      |FROM credited
      |WHERE event_type <> 'purchase'
      |GROUP BY event_type
      |ORDER BY channel""".stripMargin

  // ─── q186: one-shot column profile ────────────────────────────────────
  // The data-catalog table profile: per column, row count, null count,
  // exact distinct count. Per-column plans union into one profile frame
  // (q169's pattern — independent, prunable scans; a single-pass
  // grouping-sets melt is the 100 TB alternative when the table is too
  // hot to scan once per column).
  def q186ColumnProfile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def prof(c: String): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
            count_if(col(c).isNull).as("n_null"),
            countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
                col("n_distinct"))
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .map(prof).reduce(_ unionAll _)
      .orderBy("column_name")
  }

  val q186Sql: String = {
    def one(c: String): String =
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Exact-vs-sketched percentile routing for the cut-point/fence family
    * (q166/q172/q173/q190/q196): `sketch = false` is the oracle-checkable
    * exact form the driver verifies; `sketch = true` swaps in
    * `approx_percentile` (fixed-size mergeable summary, rank error ≤
    * N/10000) — the 100 TB path, since exact `percentile` with
    * empty-or-enum grouping buffers a fact-sized value-count map per
    * group (PlanLint's exact-percentile rule). q197 pins the two paths
    * against each other as data, the q99 pattern.
    */
  private def pct(value: String, probs: String, sketch: Boolean): Column =
    if (sketch) expr(s"approx_percentile($value, $probs, 10000)")
    else expr(s"percentile($value, $probs)")

  // ─── q190: equi-DEPTH histogram ───────────────────────────────────────
  // The optimizer-statistics histogram (q126 is equi-WIDTH): decile cut
  // points from the exact percentile family, bin = count of cuts
  // strictly below the value (the q173 broadcast-join idiom — 9 rows
  // against the fact, map-side at any scale), then per-bin count and
  // value range. Bins hold ~n/10 rows by construction — the property
  // that makes equi-depth the selectivity-estimation form.
  def q190EquidepthHist(s: SparkSession, d: String,
                        sketch: Boolean = false): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").as("v"))
    // the 9 cut points stay an ARRAY in a 1-row broadcast frame: the bin
    // of a value is |{cuts < v}|, computed MAP-SIDE by size(filter(...))
    // — no 9× row fan-out, no per-value re-aggregation (one shuffle
    // fewer than the exploded-cuts crossJoin form this replaces)
    val cuts = li.agg(pct("v",
      "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)", sketch)
      .as("cuts"))
    // distinct values first (multiplicity in cnt) so the bin expression
    // evaluates per distinct value, not per row
    val vals = li.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    vals.crossJoin(broadcast(cuts))
      .select(col("v"), col("cnt"),
        size(filter(col("cuts"), c => c < col("v"))).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n"),
           round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"))
      .orderBy("bin")
  }

  val q190Sql: String =
    """WITH li AS (SELECT l_extendedprice AS v FROM lineitem),
      |cuts AS (
      |  SELECT unnest(quantile_cont(v,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS cut
      |  FROM li),
      |vals AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY v),
      |binned AS (
      |  SELECT v, cnt,
      |    CAST(count(*) FILTER (WHERE cut < v) AS BIGINT) AS bin
      |  FROM vals CROSS JOIN cuts GROUP BY v, cnt)
      |SELECT bin, CAST(sum(cnt) AS BIGINT) AS n,
      |  round(min(v), 2) AS lo, round(max(v), 2) AS hi
      |FROM binned GROUP BY bin
      |ORDER BY bin""".stripMargin

  // ─── q197: equi-depth sketch-twin pin (q190's 100 TB path, as data) ──
  // Runs q190's decile binning with SKETCHED cut points and asserts the
  // equi-depth property survives the sketch, emitting the agreement AS
  // DATA (the q99 pattern): every sketched bin's count must sit within
  // |n_b − N/10| ≤ 2·N/10000 (rank error, two boundaries) + the max
  // per-value multiplicity (tie block at a boundary) + 1. The oracle
  // states the sketch-independent facts — 10 bins, total row count,
  // literal TRUE — so the hash matches only if the sketch path really
  // is within its error budget.
  def q197EquidepthSketch(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").as("v"))
    val cuts = li.agg(pct("v",
      "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)", sketch = true)
      .as("cuts"))
    val vals = li.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val mult = vals.agg(max(col("cnt")).as("mult"))
    val bins = vals.crossJoin(broadcast(cuts))
      .select(col("cnt"),
        size(filter(col("cuts"), c => c < col("v"))).cast("long").as("bin"))
      .groupBy(col("bin")).agg(sum(col("cnt")).as("n_b"))
    val tot = bins.agg(sum(col("n_b")).as("n_total"))
    bins.crossJoin(broadcast(tot)).crossJoin(broadcast(mult))
      .agg(count(lit(1)).as("n_bins"),
           first(col("n_total")).as("n_total"),
           max(abs(col("n_b").cast("double")
             - col("n_total").cast("double") / 10.0)).as("max_dev"),
           first(col("mult")).as("mult"))
      .select(col("n_bins"), col("n_total"),
        (col("max_dev") <=
          lit(2.0) * col("n_total") / 10000.0 + col("mult") + 1).as("all_ok"))
  }

  val q197Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_bins,
      |  CAST(count(*) AS BIGINT) AS n_total,
      |  TRUE AS all_ok
      |FROM lineitem""".stripMargin

  // ─── q191: per-group z-score feature scaling ──────────────────────────
  // The feature-pipeline normalization pass: learn per-group (mean, σ)
  // in one agg, broadcast the tiny stats frame back, scale map-side.
  // The output is the self-audit every scaler ships: the normalized
  // column's mean must be 0 and σ must be 1 per group (reported rounded,
  // so the oracle proves the scaling algebra, not just the stats).
  def q191FeatureScaling(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"), col("value"))
    val stats = e.groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sd"))
    e.join(broadcast(stats), "event_type")
      .select(col("event_type"), ((col("value") - col("mu")) / col("sd")).as("z"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           (round(avg(col("z")), 6) + lit(0.0)).as("mean_z"),
           round(stddev_pop(col("z")), 6).as("sd_z"),
           round(min(col("z")), 4).as("min_z"),
           round(max(col("z")), 4).as("max_z"))
      .orderBy("event_type")
  }

  val q191Sql: String =
    """WITH stats AS (
      |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
      |  FROM events GROUP BY event_type),
      |z AS (
      |  SELECT e.event_type, (e.value - mu) / sd AS z
      |  FROM events e JOIN stats ON e.event_type = stats.event_type)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(z), 6) + 0.0 AS mean_z,
      |  round(stddev_pop(z), 6) AS sd_z,
      |  round(min(z), 4) AS min_z, round(max(z), 4) AS max_z
      |FROM z GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ─── q192: leave-one-out target encoding ──────────────────────────────
  // The categorical-feature encoder that avoids self-leakage: each row's
  // encoding is the target mean of its category EXCLUDING the row itself
  // — (sum − y) / (n − 1). One agg learns per-category (sum, n); the
  // encode is map-side algebra against the broadcast table, never a
  // per-row subquery. Output audits the encoder per category: the mean
  // of LOO encodings equals the raw category mean (an algebraic identity
  // — each row's exclusion cancels in the average), and their spread
  // shows the leakage the exclusion removes.
  def q192TargetEncoding(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority").as("cat"),
                                col("o_totalprice").as("y"))
    val enc = o.groupBy("cat")
      .agg(sum(col("y")).as("s"), count(lit(1)).cast("double").as("n"))
    o.join(broadcast(enc), "cat")
      .select(col("cat"), col("y"),
        ((col("s") - col("y")) / (col("n") - 1.0)).as("loo"))
      .groupBy("cat")
      .agg(count(lit(1)).as("n_rows"),
           round(avg(col("y")), 2).as("raw_mean"),
           round(avg(col("loo")), 2).as("loo_mean"),
           round(stddev_pop(col("loo")), 2).as("loo_sd"))
      .orderBy("cat")
  }

  val q192Sql: String =
    """WITH enc AS (
      |  SELECT o_orderpriority AS cat, sum(o_totalprice) AS s,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM orders GROUP BY o_orderpriority),
      |loo AS (
      |  SELECT o.o_orderpriority AS cat, o.o_totalprice AS y,
      |    (s - o.o_totalprice) / (n - 1.0) AS loo
      |  FROM orders o JOIN enc ON o.o_orderpriority = enc.cat)
      |SELECT cat, CAST(count(*) AS BIGINT) AS n_rows,
      |  round(avg(y), 2) AS raw_mean,
      |  round(avg(loo), 2) AS loo_mean,
      |  round(stddev_pop(loo), 2) AS loo_sd
      |FROM loo GROUP BY cat
      |ORDER BY cat""".stripMargin

  // ─── q193: temporal train/valid/test split with embargo ───────────────
  // The leakage-safe time split (q72's hash split is for iid data; time
  // series need a TEMPORAL cut): train < t70, valid in [t70+embargo,
  // t85), test ≥ t85+embargo, with a 1-day EMBARGO dropped after each
  // boundary so look-ahead features computed near the cut can't leak
  // across it. Boundaries come from integer microsecond arithmetic on
  // (min, max) — both engines cut identically, the q173 rule. The output
  // audits the split: per-bucket counts, time ranges, and the embargoed
  // row count made visible (silent row drops are how leakage audits die).
  def q193TemporalSplit(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val e = events(s, d).select(unix_micros(col("ts")).as("us"))
    val mm = e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    e.crossJoin(broadcast(mm))
      // `div` (integer division), matching the oracle's `//` — Column `/`
      // on longs is FLOAT division and would cut boundaries differently
      .select(col("us"),
        expr("mn + ((mx - mn) * 70) div 100").as("t70"),
        expr("mn + ((mx - mn) * 85) div 100").as("t85"))
      .select(col("us"),
        when(col("us") < col("t70"), "1_train")
          .when(col("us") >= col("t70") + dayUs && col("us") < col("t85"),
                "2_valid")
          .when(col("us") >= col("t85") + dayUs, "3_test")
          .otherwise("0_embargoed").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min(col("us")).as("from_us"), max(col("us")).as("to_us"))
      .orderBy("bucket")
  }

  val q193Sql: String =
    """WITH e AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |mm AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
      |cut AS (
      |  SELECT us,
      |    mn + ((mx - mn) * 70) // 100 AS t70,
      |    mn + ((mx - mn) * 85) // 100 AS t85
      |  FROM e CROSS JOIN mm),
      |b AS (
      |  SELECT us,
      |    CASE WHEN us < t70 THEN '1_train'
      |         WHEN us >= t70 + 86400000000 AND us < t85 THEN '2_valid'
      |         WHEN us >= t85 + 86400000000 THEN '3_test'
      |         ELSE '0_embargoed' END AS bucket
      |  FROM cut)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |  min(us) AS from_us, max(us) AS to_us
      |FROM b GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ─── q196: inter-rater agreement (Cohen's kappa) ──────────────────────
  // Labeling-pipeline QA: how much do two heuristic raters agree beyond
  // chance? Raters here are two real document heuristics — "long in
  // chars" vs "long in words", each split at its own corpus median —
  // and κ = (p_o − p_e)/(1 − p_e) comes from the 2×2 confusion matrix.
  // The fact reduces to 4 cells (the q167 sufficient-statistic shape);
  // medians are exact percentiles broadcast from a 1-row frame.
  def q196CohensKappa(s: SparkSession, d: String,
                      sketch: Boolean = false): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"),
      size(split(col("text"), "\\s+")).cast("long").as("n_words"))
    val med = docs.agg(
      pct("n_chars", "0.5D", sketch).cast("double").as("med_chars"),
      pct("n_words", "0.5D", sketch).cast("double").as("med_words"))
    val rated = docs.crossJoin(broadcast(med))
      .select((col("n_chars") > col("med_chars")).as("a"),
              (col("n_words") > col("med_words")).as("b"))
    val cells = rated.groupBy("a", "b")
      .agg(count(lit(1)).cast("double").as("c"))
    cells.agg(
        sum(when(col("a") === col("b"), col("c")).otherwise(0.0)).as("agree"),
        sum(when(col("a"), col("c")).otherwise(0.0)).as("a1"),
        sum(when(col("b"), col("c")).otherwise(0.0)).as("b1"),
        sum(col("c")).as("n"))
      .select(
        round((col("agree") / col("n")
          - (col("a1") * col("b1") + (col("n") - col("a1")) * (col("n") - col("b1")))
            / (col("n") * col("n")))
          / (lit(1.0)
            - (col("a1") * col("b1") + (col("n") - col("a1")) * (col("n") - col("b1")))
              / (col("n") * col("n"))), 6).as("kappa"),
        round(col("agree") / col("n"), 6).as("p_observed"),
        col("n").cast("long").as("n_docs"))
  }

  val q196Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words
      |  FROM documents),
      |med AS (
      |  SELECT quantile_cont(n_chars, 0.5) AS med_chars,
      |    quantile_cont(n_words, 0.5) AS med_words
      |  FROM docs),
      |rated AS (
      |  SELECT (n_chars > med_chars) AS a, (n_words > med_words) AS b
      |  FROM docs CROSS JOIN med),
      |cells AS (
      |  SELECT a, b, CAST(count(*) AS DOUBLE) AS c
      |  FROM rated GROUP BY a, b),
      |agg AS (
      |  SELECT
      |    sum(CASE WHEN a = b THEN c ELSE 0.0 END) AS agree,
      |    sum(CASE WHEN a THEN c ELSE 0.0 END) AS a1,
      |    sum(CASE WHEN b THEN c ELSE 0.0 END) AS b1,
      |    sum(c) AS n
      |  FROM cells)
      |SELECT
      |  round((agree / n
      |    - (a1 * b1 + (n - a1) * (n - b1)) / (n * n))
      |    / (1.0 - (a1 * b1 + (n - a1) * (n - b1)) / (n * n)), 6) AS kappa,
      |  round(agree / n, 6) AS p_observed,
      |  CAST(n AS BIGINT) AS n_docs
      |FROM agg""".stripMargin

  // ─── q201: strict-order conversion funnel ─────────────────────────────
  // The canonical product-analytics funnel with STRICT sequencing and a
  // per-step deadline: a user converts step k only via an event strictly
  // AFTER their step-(k-1) conversion time and within 24 h of it
  // (view → click → purchase). Attribution (q177) credits touches and
  // path mining (q180) counts unordered trigrams; neither answers "how
  // many users progressed, in order, in time, and what fraction survived
  // each gate" — the funnel's whole point. (The deadline also keeps the
  // measure discriminating: without it every synthetic user converts.)
  //
  // Plan: each step is one hash-aggregate per user (min qualifying ts)
  // joined to the previous step's frame ON user_id — per-step frames are
  // |users| rows × 2 cols, so at 100 TB of events every join is a plain
  // key shuffle (or broadcast while the surviving cohort is small, AQE's
  // call) and work stays linear in |events| + |users|. The sequential
  // dependency between steps is inherent to the semantics (step k's
  // filter needs step k-1's time); three passes over the user key is the
  // scalable shape, not a driver loop. Final census is one 1-row
  // aggregate unpivoted with stack() — no window, no collect.
  def q201ConversionFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val deadline = expr("INTERVAL 24 HOUR")
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("ts") > col("t_view") &&
             col("ts") <= col("t_view") + deadline)
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("ts") > col("t_click") &&
             col("ts") <= col("t_click") + deadline)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(col("t_view")).as("s1"), count(col("t_click")).as("s2"),
           count(col("t_purchase")).as("s3"))
      .select(expr("stack(3, CAST(1 AS BIGINT), 'view', s1, " +
                   "CAST(2 AS BIGINT), 'click', s2, " +
                   "CAST(3 AS BIGINT), 'purchase', s3) " +
                   "AS (step, step_name, users)"),
              col("s1"))
      .select(col("step"), col("step_name"), col("users"),
              round(col("users") * lit(1.0) / col("s1"), 6).as("pct_of_entry"))
      .orderBy("step")
  }

  val q201Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |    AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |    AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY 1),
      |j AS (
      |  SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      |  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)),
      |agg AS (
      |  SELECT count(t_view) AS s1, count(t_click) AS s2,
      |    count(t_purchase) AS s3
      |  FROM j),
      |funnel AS (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
      |    s1 AS users, s1 AS entry FROM agg
      |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', s2, s1 FROM agg
      |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', s3, s1 FROM agg)
      |SELECT step, step_name, CAST(users AS BIGINT) AS users,
      |  round(users * 1.0 / entry, 6) AS pct_of_entry
      |FROM funnel ORDER BY step""".stripMargin

  // ─── q202: hourly spine + last-observation-carried-forward fill ───────
  // Dense per-type hourly series where silent hours repeat the LAST
  // observed hourly mean — the LOCF interpolation every monitoring /
  // feature-store layer runs. q95's spine zero-fills (a gap means zero
  // revenue); LOCF is the other canonical fill (a gap means the metric
  // HELD its value), needing the ignore-nulls running `last` that
  // zero-fill never touches.
  //
  // Plan: the fact reduces to |types|×|hours| in ONE hash aggregate; the
  // spine is generated from a 1-row (min,max) bounds frame (broadcast
  // algebra — the crossJoin the allowlist documents) and the LOCF window
  // partitions the GRID, not the fact: |hours| rows per type at any
  // scale, which is why the enum-keyed window is sound here (and
  // allowlisted with that reason — the input is calendar-sized by
  // construction, the q144 principle).
  def q202LocfGapFill(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      date_trunc("hour", col("ts")).as("hr"), col("event_type"), col("value"))
    // EXACT integer mean: `value` is 2-decimal by construction, so the
    // hourly mean is the rational sum(cents)/(100·n) — and at sf0.1 it
    // lands EXACTLY on 1e-4 HALF_UP boundaries often enough that
    // engines disagree on `round(avg(value), 4)` (Spark rounds the
    // shortest decimal rendering of the nearest double, DuckDB the
    // exact binary — the round-9 full sf0.1 sweep caught three cells
    // exactly 1e-4 apart). Integer arithmetic removes the ambiguity:
    // half-up(mean, 4) ≡ (200·sum(cents) + n) DIV (2·n), exact in both
    // engines, then one deterministic double divide for the output.
    val hourly = e.groupBy("event_type", "hr")
      .agg((expr("CAST((sum(CAST(round(value * 100) AS BIGINT)) * 200" +
                 " + count(*)) DIV (2 * count(*)) AS DOUBLE)") / 10000.0)
        .as("v_obs"))
    val bounds = e.agg(min("hr").as("lo"), max("hr").as("hi"))
    val spine = bounds.select(explode(
      sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val types = e.select("event_type").distinct()
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    types.crossJoin(spine)
      .join(hourly, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        col("v_obs").isNotNull.as("observed"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v_locf"))
      .orderBy("event_type", "hr")
  }

  val q202Sql: String =
    """WITH e AS (
      |  SELECT date_trunc('hour', ts) AS hr, event_type, value FROM events),
      |hourly AS (
      |  SELECT event_type, hr,
      |    CAST((sum(CAST(round(value * 100) AS BIGINT)) * 200 + count(*))
      |         // (2 * count(*)) AS DOUBLE) / 10000 AS v_obs
      |  FROM e GROUP BY 1, 2),
      |bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM e),
      |grid AS (SELECT event_type, hr FROM types CROSS JOIN spine)
      |SELECT g.event_type, g.hr, h.v_obs IS NOT NULL AS observed,
      |  last_value(h.v_obs IGNORE NULLS) OVER (
      |    PARTITION BY g.event_type ORDER BY g.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
      |FROM grid g
      |LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr
      |ORDER BY g.event_type, g.hr""".stripMargin

  // ─── q234: seasonal robust anomaly screen (weekday-median MAD) ────────
  // Time-series quality monitoring without a model: the daily revenue
  // series is compared against its own WEEKDAY's median (the seasonal-
  // naive baseline — weekends and weekdays have different normals), and
  // a day is anomalous when its absolute deviation exceeds 3.5 modified
  // z-scores of the weekday's median absolute deviation (Iglewicz–
  // Hoaglin: 0.6745·dev/MAD > 3.5). Robust twin of the q166 IQR screen:
  // median/MAD ignore the outliers they hunt, where mean/σ absorb them.
  // Everything stays in exact integers: revenue in cents, the two
  // medians are percentile_disc (ACTUAL attained values), and the flag
  // is the cross-multiplication 6745·dev > 35000·mad — no float division
  // near the gate (q218's rule). MAD = 0 degenerates to dev > 0,
  // documented.
  // Scale: the fact reduces to ≤ |calendar days| rows (~2 500 at ANY SF
  // — the date range is fixed) in one map-side-combined aggregate;
  // exact percentiles run over that bounded frame, never the fact
  // (the q137 contract), and the per-weekday frames broadcast back.
  def q234SeasonalMad(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("wd", weekday(col("day")).cast("long") + 1L)
    // Spark's percentile_disc returns DOUBLE even over integer input;
    // the value is an ATTAINED cents amount (< 2^53), so the cast back
    // to long is exact — and keeps the gate arithmetic all-integer
    val med = daily.groupBy(col("wd")).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("med"))
    val dev = daily.join(broadcast(med), "wd")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = dev.groupBy(col("wd")).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)")
        .cast("long").as("mad"))
    dev.join(broadcast(mad), "wd")
      .groupBy(col("wd"))
      .agg(count(lit(1)).as("n_days"),
        max(col("med")).as("med_cents"), max(col("mad")).as("mad_cents"),
        sum(when((col("mad") > 0L && lit(6745L) * col("dev") >
                    lit(35000L) * col("mad")) ||
                 (col("mad") === 0L && col("dev") > 0L), 1L).otherwise(0L))
          .as("n_anomalies"))
      .orderBy(col("wd"))
  }

  val q234Sql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents,
      |    CAST(isodow(o_orderdate) AS BIGINT) AS wd
      |  FROM orders GROUP BY 1),
      |med AS (
      |  SELECT wd, percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
      |  FROM daily GROUP BY wd),
      |dev AS (
      |  SELECT d.wd, d.cents, m.med, abs(d.cents - m.med) AS dev
      |  FROM daily d JOIN med m USING (wd)),
      |mad AS (
      |  SELECT wd, percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      |  FROM dev GROUP BY wd)
      |SELECT d.wd, CAST(count(*) AS BIGINT) AS n_days,
      |  max(d.med) AS med_cents, max(m.mad) AS mad_cents,
      |  CAST(sum(CASE WHEN (m.mad > 0 AND 6745 * d.dev > 35000 * m.mad)
      |                  OR (m.mad = 0 AND d.dev > 0)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM dev d JOIN mad m USING (wd)
      |GROUP BY d.wd
      |ORDER BY d.wd""".stripMargin

  // ─── q252: k-anonymity suppression census with one generalization ───
  // The release-gating read for any dataset that leaves the warehouse
  // (the training-data governance twin of the PII scrub q73): rows
  // whose quasi-identifier tuple (nation, segment, 1000-unit balance
  // band) is shared by fewer than K=5 customers are re-identifiable
  // and must be suppressed — unless one ladder step of generalization
  // (coarsening the balance band 1000 → 5000) pools them into a
  // compliant group. The census reports, per segment: rows, QI groups,
  // kept-at-fine rows, rescued-by-generalization rows, and the residual
  // suppression — the exact table a privacy review asks for.
  //
  // Scale: two hash aggregates over fixed-width QI keys (the group-size
  // census) + one group-keyed join back to attach sizes to rows —
  // map-side-combined, never a window. Balance bands use exact cents
  // integers (`div`, truncating identically to DuckDB's `//`); no float
  // ever reaches a group key or a gate.
  private val KAnon = 5

  def q252KAnonymity(s: SparkSession, d: String): DataFrame = {
    val rows = customer(s, d).select(col("c_custkey"),
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
      .withColumn("band1", expr("cents div 100000"))
      .withColumn("band2", expr("cents div 500000"))
    val fine = rows.groupBy(col("nation"), col("segment"), col("band1"))
      .agg(count(lit(1)).as("n_fine"))
    val tagged = rows.join(fine, Seq("nation", "segment", "band1"))
    val suppressed = tagged.where(col("n_fine") < KAnon)
    val coarse = suppressed.groupBy(col("nation"), col("segment"),
        col("band2"))
      .agg(count(lit(1)).as("n_coarse"))
    val rescued = suppressed.join(coarse, Seq("nation", "segment", "band2"))
      .withColumn("ok2", col("n_coarse") >= KAnon)
    tagged.where(col("n_fine") >= KAnon)
      .select(col("segment"), lit(1L).as("kept"), lit(0L).as("rescue"),
        lit(0L).as("supp"))
      .unionByName(rescued.select(col("segment"), lit(0L).as("kept"),
        when(col("ok2"), 1L).otherwise(0L).as("rescue"),
        when(col("ok2"), 0L).otherwise(1L).as("supp")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_rows"), sum(col("kept")).as("n_kept_fine"),
        sum(col("rescue")).as("n_rescued"),
        sum(col("supp")).as("n_suppressed"))
      .orderBy(col("segment"))
  }

  val q252Sql: String =
    s"""WITH rows_ AS (
       |  SELECT c_custkey, c_nationkey AS nation, c_mktsegment AS segment,
       |    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS band1,
       |    CAST(round(c_acctbal * 100) AS BIGINT) // 500000 AS band2
       |  FROM customer),
       |fine AS (
       |  SELECT nation, segment, band1, CAST(count(*) AS BIGINT) AS n_fine
       |  FROM rows_ GROUP BY 1, 2, 3),
       |tagged AS (
       |  SELECT r.*, f.n_fine FROM rows_ r
       |  JOIN fine f USING (nation, segment, band1)),
       |coarse AS (
       |  SELECT nation, segment, band2, CAST(count(*) AS BIGINT) AS n_coarse
       |  FROM tagged WHERE n_fine < $KAnon GROUP BY 1, 2, 3),
       |labeled AS (
       |  SELECT segment, 1 AS kept, 0 AS rescue, 0 AS supp
       |  FROM tagged WHERE n_fine >= $KAnon
       |  UNION ALL
       |  SELECT t.segment,
       |    0, CASE WHEN c.n_coarse >= $KAnon THEN 1 ELSE 0 END,
       |    CASE WHEN c.n_coarse >= $KAnon THEN 0 ELSE 1 END
       |  FROM tagged t JOIN coarse c USING (nation, segment, band2)
       |  WHERE t.n_fine < $KAnon)
       |SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(kept) AS BIGINT) AS n_kept_fine,
       |  CAST(sum(rescue) AS BIGINT) AS n_rescued,
       |  CAST(sum(supp) AS BIGINT) AS n_suppressed
       |FROM labeled
       |GROUP BY segment
       |ORDER BY segment""".stripMargin

  // ─── q262: Kaplan–Meier time-to-first-failure survival curve ──────────
  // The nonparametric survival estimator (Kaplan & Meier 1958) — the
  // standard read for "how long until a user hits their first error",
  // churn curves, and reliability analyses with CENSORED observations.
  // Subject = user; clock starts at the user's first event; the event is
  // their first 'error'; observation is administratively censored at a
  // fixed [[KmHorizonDays]]-day horizon (users whose first error falls
  // at or beyond the horizon — or who never error — contribute risk up
  // to the horizon but no event; both engines apply the identical rule).
  //   S(t) = Π_{t' ≤ t, d_{t'} > 0} (1 − d_{t'}/n_{t'})
  // The cumulative product is evaluated float-free across rows: each
  // step's ln(1 − d/n) is quantized to integer NANOS (the q231 double-
  // round), the running product becomes an exact integer prefix SUM, and
  // only the final exp/scale to survival_micro touches a double — on
  // identical integer inputs in both engines. A step where d = n drives
  // survival to exactly 0 (ln is −∞); a running flag zeroes that step
  // and everything after it instead of feeding ±∞ into the quantizer.
  //
  // Scale: one shuffle to the per-user frame (groupBy user_id), then
  // everything runs on the ≤(horizon+1)-row duration GRID — the risk
  // set, the prefix sums, and the flag are global windows over that
  // enum-sized frame, never the fact (the q144/q202 principle).
  private val KmHorizonDays = 10L

  def q262KaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    val fd = ev.groupBy("user_id").agg(min(col("day")).as("fd"))
    val fe = ev.where(col("event_type") === "error")
      .groupBy("user_id").agg(min(col("day")).as("ed"))
    val durs = fd.join(fe, Seq("user_id"), "left")
      .select(
        when(col("ed").isNotNull &&
             col("ed") - col("fd") < KmHorizonDays,
          col("ed") - col("fd")).otherwise(KmHorizonDays).as("t"),
        when(col("ed").isNotNull &&
             col("ed") - col("fd") < KmHorizonDays, 1L).otherwise(0L)
          .as("e"))
    val grid = durs.groupBy(col("t"))
      .agg(sum(col("e")).as("d_events"),
           sum(lit(1L) - col("e")).as("n_censored"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_risk",
        sum(col("d_events") + col("n_censored")).over(wRisk))
      .withColumn("term_nano",
        when(col("d_events") === 0L || col("d_events") >= col("n_risk"), 0L)
          .otherwise(round(round(log(lit(1.0) -
            col("d_events").cast("double") / col("n_risk").cast("double")),
            9) * 1e9, 0).cast("long")))
      .withColumn("zeroed",
        max(when(col("d_events") === col("n_risk"), 1L).otherwise(0L))
          .over(wCum))
      .withColumn("cum_nano", sum(col("term_nano")).over(wCum))
      .where(col("d_events") > 0L)
      .select(col("t"), col("n_risk"), col("d_events"), col("n_censored"),
        when(col("zeroed") === 1L, 0L)
          .otherwise(round(exp(col("cum_nano").cast("double") / lit(1e9)) *
            lit(1e6), 0).cast("long")).as("survival_micro"))
      .orderBy(col("t"))
  }

  val q262Sql: String =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
       |  FROM events),
       |fd AS (SELECT user_id, min(day) AS fd FROM ev GROUP BY 1),
       |fe AS (SELECT user_id, min(day) AS ed FROM ev
       |       WHERE event_type = 'error' GROUP BY 1),
       |durs AS (
       |  SELECT
       |    CASE WHEN e.ed IS NOT NULL AND e.ed - f.fd < $KmHorizonDays
       |         THEN e.ed - f.fd ELSE $KmHorizonDays END AS t,
       |    CASE WHEN e.ed IS NOT NULL AND e.ed - f.fd < $KmHorizonDays
       |         THEN 1 ELSE 0 END AS e
       |  FROM fd f LEFT JOIN fe e USING (user_id)),
       |grid AS (
       |  SELECT t, CAST(sum(e) AS BIGINT) AS d_events,
       |    CAST(sum(1 - e) AS BIGINT) AS n_censored
       |  FROM durs GROUP BY t),
       |risk AS (
       |  SELECT *, CAST(sum(d_events + n_censored) OVER (ORDER BY t
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |    AS n_risk
       |  FROM grid),
       |terms AS (
       |  SELECT *,
       |    CASE WHEN d_events = 0 OR d_events >= n_risk THEN 0
       |         ELSE CAST(round(round(ln(1.0 - CAST(d_events AS DOUBLE)
       |           / CAST(n_risk AS DOUBLE)), 9) * 1e9, 0) AS BIGINT)
       |    END AS term_nano
       |  FROM risk),
       |cum AS (
       |  SELECT *,
       |    CAST(sum(term_nano) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nano,
       |    max(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
       |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
       |            CURRENT ROW) AS zeroed
       |  FROM terms)
       |SELECT t, n_risk, d_events, n_censored,
       |  CASE WHEN zeroed = 1 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(round(exp(CAST(cum_nano AS DOUBLE) / 1e9) * 1e6, 0)
       |                 AS BIGINT) END AS survival_micro
       |FROM cum
       |WHERE d_events > 0
       |ORDER BY t""".stripMargin

  // ─── q263: seasonal-naïve forecast backtest (sMAPE / MAE census) ──────
  // The forecasting-evaluation primitive: before any model ships, its
  // errors are benchmarked against the seasonal-naïve baseline
  // ŷ(d) = y(d − 7) (same weekday last week — the standard yardstick in
  // the M-competition literature; a model that can't beat it isn't a
  // model). This runs that baseline's backtest over the daily event
  // counts and prices it with the standard scale-free metrics, all
  // integer-exact: per-point sMAPE = (2·10⁶·|y−ŷ|) div (y+ŷ) (counts
  // are integers, the denominator is ≥ 2 after the inner join), MAE in
  // millis, and the signed bias — no float ever enters a metric.
  // Days are epoch-day indices (micros div 86 400 000 000); the lag is
  // an equi-join of the daily frame against itself shifted +7, which —
  // unlike a rows-based window lag — is gap-correct by construction.
  //
  // Scale: one shuffle reduces the fact to the |types|×|days| daily
  // frame; the shifted self-join and census run entirely on that
  // calendar-sized grid (q144 principle — never the fact).
  def q263ForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val fc = daily.select(col("event_type"), (col("day") + 7L).as("day"),
      col("y").as("yhat"))
    daily.join(fc, Seq("event_type", "day"))
      .select(col("event_type"),
        abs(col("y") - col("yhat")).as("aerr"),
        (col("y") - col("yhat")).as("serr"),
        expr("(2000000 * abs(y - yhat)) div (y + yhat)").as("sm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_points"),
           sum(col("aerr")).as("sum_abs_err"),
           sum(col("serr")).as("bias"),
           expr("(1000 * sum(aerr)) div count(*)").as("mae_milli"),
           expr("sum(sm) div count(*)").as("smape_micro"))
      .orderBy(col("event_type"))
  }

  val q263Sql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |joined AS (
      |  SELECT a.event_type, abs(a.y - f.y) AS aerr, a.y - f.y AS serr,
      |    (2000000 * abs(a.y - f.y)) // (a.y + f.y) AS sm
      |  FROM daily a JOIN daily f
      |    ON a.event_type = f.event_type AND a.day = f.day + 7)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
      |  CAST(sum(aerr) AS BIGINT) AS sum_abs_err,
      |  CAST(sum(serr) AS BIGINT) AS bias,
      |  (1000 * CAST(sum(aerr) AS BIGINT)) // CAST(count(*) AS BIGINT)
      |    AS mae_milli,
      |  CAST(sum(sm) AS BIGINT) // CAST(count(*) AS BIGINT) AS smape_micro
      |FROM joined
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ─── q269: user-journey path mining (top event trigrams) ──────────────
  // q165's Markov matrix sees one step at a time; journey analysis wants
  // the actual PATHS — which 3-step sequences dominate user behaviour
  // (the "view → click → purchase vs view → error → view" read product
  // analytics tools sell). Consecutive event triples per user via two
  // lags over the (ts, event_id)-ordered per-user window — fixed-width,
  // user-partitioned (the q87 sessionization shape; per-user event
  // counts are retention-bounded, never corpus-bounded) — then one
  // path-keyed count. Share in basis points by exact integer division
  // against the 1-row total. Top-15 by (count DESC, path) — ties cannot
  // reorder across engines.
  def q269JourneyPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e3"))
      .withColumn("e2", lag(col("e3"), 1).over(w))
      .withColumn("e1", lag(col("e3"), 2).over(w))
      .where(col("e1").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
    val total = broadcast(tri.agg(count(lit(1)).as("nn")))
    tri.groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .crossJoin(total)
      .select(col("path"), col("n_paths"),
        expr("(10000 * n_paths) div nn").as("share_bp"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(15)
  }

  val q269Sql: String =
    """WITH tri AS MATERIALIZED (
      |  SELECT e1 || '>' || e2 || '>' || e3 AS path FROM (
      |    SELECT event_type AS e3,
      |      lag(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS e2,
      |      lag(event_type, 2) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS e1
      |    FROM events)
      |  WHERE e1 IS NOT NULL),
      |total AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tri)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_paths,
      |  (10000 * CAST(count(*) AS BIGINT)) // nn AS share_bp
      |FROM tri, total
      |GROUP BY path, nn
      |ORDER BY n_paths DESC, path
      |LIMIT 15""".stripMargin

  // ─── q271: Mann–Whitney U test (nonparametric A/B comparison) ─────────
  // The rank-sum test experimentation platforms run when normality is
  // off the table (Mann & Whitney 1947): do BUILDING and MACHINERY
  // customers draw order totals from the same distribution? Exact and
  // float-free via the tie-aware rank identity on the VALUE HISTOGRAM:
  // for a value with L strictly-smaller observations and E ties, the
  // DOUBLED midrank is 2L + E + 1 (integer!), so the doubled rank sum
  // R₁ₓ₂ = Σ_v n₁(v)·(2L(v) + E(v) + 1) folds from per-value counts and
  // one cumulative window over the histogram — never per-row ranks.
  // U₁ₓ₂ = 2n₁n₂ + n₁(n₁+1) − R₁ₓ₂. The normal-approximation z (no tie
  // correction — documented) is emitted in integer micros from one-row
  // double math on identical integer inputs. Values are exact CENTS.
  // Scale: one shuffle to the cents histogram; the cumulative window
  // runs over the ≤|distinct cents| reduced frame (q250 shape).
  def q271MannWhitney(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(
      customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .where(col("seg").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        when(col("seg") === "BUILDING", 1L).otherwise(0L).as("g1"))
    val hist = o.groupBy(col("cents"))
      .agg(sum(col("g1")).as("n1v"), sum(lit(1L) - col("g1")).as("n2v"))
      .localCheckpoint() // one materialization for the prefix machinery
    // r15 (guide §2.5): the exclusive cumulative count over the cents
    // histogram was a global window (single-partition sort of the whole
    // value domain); now the scalable prefix sum — inclusive prefix
    // minus the current bin, exact integers, identical lcum values.
    val ranked = Windows.prefixSumScaled(hist, Seq.empty, col("cents"),
        Seq(col("cents")), col("n1v") + col("n2v"), "icum")
      .withColumn("lcum", col("icum") - (col("n1v") + col("n2v")))
      .select(col("n1v"), col("n2v"),
        (col("n1v") * (lit(2L) * col("lcum") + col("n1v") + col("n2v") +
          1L)).as("r1x2_part"))
    ranked.agg(sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
        sum(col("r1x2_part")).as("r1x2"))
      .select(col("n1"), col("n2"),
        (lit(2L) * col("n1") * col("n2") + col("n1") * (col("n1") + 1L) -
          col("r1x2")).as("u1x2"))
      .select(col("n1"), col("n2"), col("u1x2"),
        round((col("u1x2").cast("double") / 2.0 -
          col("n1").cast("double") * col("n2").cast("double") / 2.0) /
          sqrt(col("n1").cast("double") * col("n2").cast("double") *
            (col("n1") + col("n2") + 1L).cast("double") / 12.0) * 1e6, 0)
          .cast("long").as("z_micro"))
  }

  val q271Sql: String =
    """WITH o AS MATERIALIZED (
      |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (
      |  SELECT cents, CAST(sum(g1) AS BIGINT) AS n1v,
      |    CAST(sum(1 - g1) AS BIGINT) AS n2v
      |  FROM o GROUP BY cents),
      |ranked AS (
      |  SELECT n1v, n2v,
      |    n1v * (2 * coalesce(sum(n1v + n2v) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + n1v + n2v + 1) AS r1x2_part
      |  FROM hist),
      |agg AS (
      |  SELECT CAST(sum(n1v) AS BIGINT) AS n1,
      |    CAST(sum(n2v) AS BIGINT) AS n2,
      |    CAST(sum(r1x2_part) AS BIGINT) AS r1x2
      |  FROM ranked)
      |SELECT n1, n2,
      |  2 * n1 * n2 + n1 * (n1 + 1) - r1x2 AS u1x2,
      |  CAST(round((CAST(2 * n1 * n2 + n1 * (n1 + 1) - r1x2 AS DOUBLE) / 2.0
      |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |        * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) * 1e6, 0) AS BIGINT)
      |    AS z_micro
      |FROM agg""".stripMargin

  // ─── q275: Poisson-bootstrap confidence interval ──────────────────────
  // THE bootstrap that works at data scale (the classic multinomial
  // resample needs n draws coordinated across the cluster; the Poisson
  // approximation — each row enters replicate b with an independent
  // Poisson(1) weight — is the published streaming/map-reduce form,
  // e.g. Chamandy et al. 2012): a CI for the mean order value without
  // any distributional assumption. Fully deterministic: replicate
  // weights come from md5("boot:"||b||":"||id) mapped through the
  // EXACT Poisson(1) inverse CDF — the fences are plan-time integer
  // literals on the 2³² hash scale, identical in both engines (the
  // plane-weights idiom). Replicate means are exact integer
  // MILLI-cents (truncating div); the 2.5/97.5 CI bounds are
  // percentile_disc order statistics over the [[BootB]]-row replicate
  // frame — attained integers, no interpolation.
  // Scale: the explode is a ×B map-side fanout folded immediately by a
  // B-group partial aggregate — nothing B-sized ever shuffles per row;
  // the replicate frame is B rows.
  private val BootB = 32

  /** floor(2³² · P(Poisson(1) ≤ k)) for k = 0..5 — weight = first fence
    * the hash draw falls under, else 6. Driver-computed once; both
    * engines receive the same literals. */
  private val BootFences: Seq[Long] = {
    var cum = 0.0
    var fact = 1.0
    (0 to 5).map { k =>
      if (k > 0) fact *= k
      cum += math.exp(-1.0) / fact
      math.floor(cum * 4294967296.0).toLong
    }
  }

  def q275PoissonBootstrap(s: SparkSession, d: String): DataFrame = {
    val cents = orders(s, d).select(col("o_orderkey").as("id"),
      round(col("o_totalprice") * 100, 0).cast("long").as("v"))
    val u = conv(substring(md5(concat(lit("boot:"), col("b").cast("string"),
      lit(":"), col("id").cast("string"))), 1, 8), 16, 10).cast("long")
    val w = BootFences.zipWithIndex
      .foldRight(lit(6L): Column) { case ((fence, k), rest) =>
        when(col("u") < fence, k.toLong).otherwise(rest) }
    val reps = cents
      .select(col("id"), col("v"),
        explode(sequence(lit(1), lit(BootB))).as("b"))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg(expr("(1000 * sum(w * v)) div sum(w)").as("mean_milli"))
    val full = broadcast(cents.agg(
      expr("(1000 * sum(v)) div count(*)").as("mean_full_milli"),
      count(lit(1)).as("n_rows")))
    reps.agg(count(lit(1)).as("n_reps"),
        expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_milli)")
          .cast("long").as("ci_lo_milli"),
        expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_milli)")
          .cast("long").as("ci_hi_milli"),
        min(col("mean_milli")).as("rep_min"),
        max(col("mean_milli")).as("rep_max"))
      .crossJoin(full)
  }

  val q275Sql: String = {
    val whenChain = BootFences.zipWithIndex
      .map { case (f, k) => s"WHEN u < $f THEN $k" }.mkString(" ")
    s"""WITH cents AS MATERIALIZED (
       |  SELECT o_orderkey AS id,
       |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
       |  FROM orders),
       |expl AS (
       |  SELECT v, b,
       |    CAST(('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
       |      || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
       |  FROM cents, unnest(range(1, ${BootB + 1})) t(b)),
       |reps AS (
       |  SELECT b, (1000 * CAST(sum(w * v) AS BIGINT))
       |      // CAST(sum(w) AS BIGINT) AS mean_milli
       |  FROM (SELECT v, b, CASE $whenChain ELSE 6 END AS w FROM expl)
       |  GROUP BY b),
       |fullm AS (
       |  SELECT (1000 * CAST(sum(v) AS BIGINT)) // CAST(count(*) AS BIGINT)
       |      AS mean_full_milli,
       |    CAST(count(*) AS BIGINT) AS n_rows
       |  FROM cents)
       |SELECT CAST(count(*) AS BIGINT) AS n_reps,
       |  percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_milli)
       |    AS ci_lo_milli,
       |  percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_milli)
       |    AS ci_hi_milli,
       |  min(mean_milli) AS rep_min, max(mean_milli) AS rep_max,
       |  mean_full_milli, n_rows
       |FROM reps, fullm
       |GROUP BY mean_full_milli, n_rows""".stripMargin
  }

  // ─── q277: exact-integer KS test with significance ────────────────────
  // q174 computes the KS D over event values in rounded floats; this is
  // its EXACT twin (the exact-vs-float pairing q96/q99 set for
  // percentiles) on a different comparison (order totals across
  // customer segments), plus the significance read q174 lacks. The D
  // statistic is max |F₁(v) − F₂(v)| computed EXACTLY as integers by
  // cross-multiplication: over the shared cents histogram,
  // d_num(v) = |c₁(v)·n₂ − c₂(v)·n₁| with c = cumulative counts — one
  // window over the reduced value histogram (the q271/q250 shape), one
  // max; no float division ever enters the argmax. The one-term
  // Smirnov tail p ≈ 2·exp(−2λ²), λ = D·√(n₁n₂/(n₁+n₂)) (documented
  // approximation) is emitted in integer micros from 1-row double math
  // on the exact integer inputs. (At sf10³ scales, 1e6·d_num needs the
  // q218 decimal widening if the distributions truly diverge — noted.)
  def q277KsTest(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(
      customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .where(col("seg").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        when(col("seg") === "BUILDING", 1L).otherwise(0L).as("g1"))
    // checkpointed once: the totals broadcast and the two chained
    // prefix passes read one materialization of the histogram
    val hist = o.groupBy(col("cents"))
      .agg(sum(col("g1")).as("n1v"), sum(lit(1L) - col("g1")).as("n2v"))
      .localCheckpoint()
    val tot = broadcast(hist.agg(sum(col("n1v")).as("n1"),
      sum(col("n2v")).as("n2")))
    // r15 (guide §2.5): two global cumulative windows over the cents
    // histogram → two chained scalable prefix sums (exact integer
    // counts, identical c1/c2)
    Windows.prefixSumScaled(
        Windows.prefixSumScaled(hist, Seq.empty,
          col("cents"), Seq(col("cents")), col("n1v"), "c1"),
        Seq.empty, col("cents"), Seq(col("cents")), col("n2v"), "c2")
      .crossJoin(tot)
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        expr("(1000000 * d_num) div (n1 * n2)").as("d_micro"),
        round(lit(2.0) * exp(lit(-2.0) *
          pow(col("d_num").cast("double") /
              (col("n1").cast("double") * col("n2").cast("double")), 2) *
          (col("n1").cast("double") * col("n2").cast("double") /
           (col("n1") + col("n2")).cast("double"))) * 1e6, 0)
          .cast("long").as("p_micro"))
  }

  val q277Sql: String =
    """WITH o AS MATERIALIZED (
      |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (
      |  SELECT cents, CAST(sum(g1) AS BIGINT) AS n1v,
      |    CAST(sum(1 - g1) AS BIGINT) AS n2v
      |  FROM o GROUP BY cents),
      |tot AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
      |               CAST(sum(n2v) AS BIGINT) AS n2 FROM hist),
      |cum AS (
      |  SELECT
      |    CAST(sum(n1v) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
      |    CAST(sum(n2v) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
      |  FROM hist),
      |dmax AS (
      |  SELECT n1, n2, max(abs(c1 * n2 - c2 * n1)) AS d_num
      |  FROM cum, tot GROUP BY n1, n2)
      |SELECT n1, n2, d_num,
      |  (1000000 * d_num) // (n1 * n2) AS d_micro,
      |  CAST(round(2.0 * exp(-2.0
      |      * pow(CAST(d_num AS DOUBLE)
      |            / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 2)
      |      * (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |         / CAST(n1 + n2 AS DOUBLE))) * 1e6, 0) AS BIGINT)
      |    AS p_micro
      |FROM dmax""".stripMargin

  // ─── q279: distribution-shape census (skewness / kurtosis) ────────────
  // Higher-moment profiling per return flag — the shape diagnostics
  // (heavy tails, asymmetry) that decide whether mean/stddev monitoring
  // (q166's z-screen) is even valid. Built WITHOUT the engines'
  // skewness/kurtosis builtins (their sample-vs-population conventions
  // differ across engines): raw power sums S₁..S₄ over exact integer
  // CENTS accumulate in DECIMAL(38,0) — cents⁴ ≈ 1e28 and its corpus
  // sum stay exact where int64 would overflow (the q218 wide-decimal
  // discipline; DuckDB mirrors in HUGEINT) — and the population
  // moments m₂/m₃/m₄, skew = m₃/m₂^1.5, excess kurtosis = m₄/m₂² − 3
  // are assembled in identically-shaped double expressions from those
  // exact sums, rounded to 6 dp.
  // Scale: ONE map-side-combined grouped aggregate; decimal partials
  // are fixed-width.
  def q279MomentsCensus(s: SparkSession, d: String): DataFrame = {
    val v = lineitem(s, d).select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
    val sums = v
      .withColumn("v1", col("v").cast("decimal(38,0)"))
      .withColumn("v2", (col("v") * col("v")).cast("decimal(38,0)"))
      .withColumn("v3", col("v2") * col("v").cast("decimal(38,0)"))
      .withColumn("v4", col("v2") * col("v2"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("v1")).as("s1"),
           sum(col("v2")).as("s2"), sum(col("v3")).as("s3"),
           sum(col("v4")).as("s4"))
    val n = col("n").cast("double")
    val mu = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - mu * mu
    val m3 = col("s3").cast("double") / n -
      lit(3.0) * mu * (col("s2").cast("double") / n) +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4").cast("double") / n -
      lit(4.0) * mu * (col("s3").cast("double") / n) +
      lit(6.0) * mu * mu * (col("s2").cast("double") / n) -
      lit(3.0) * mu * mu * mu * mu
    sums.select(col("flag"), col("n"),
        expr("CAST(s1 AS BIGINT) div n").as("mean_cents"),
        round(sqrt(m2), 4).as("sd_cents"),
        round(m3 / pow(m2, 1.5), 6).as("skew"),
        round(m4 / (m2 * m2) - 3.0, 6).as("ex_kurtosis"))
      .orderBy(col("flag"))
  }

  val q279Sql: String = {
    val n = "CAST(n AS DOUBLE)"
    val mu = s"(CAST(s1 AS DOUBLE) / $n)"
    val m2 = s"(CAST(s2 AS DOUBLE) / $n - $mu * $mu)"
    val m3 = s"(CAST(s3 AS DOUBLE) / $n - 3.0 * $mu * (CAST(s2 AS DOUBLE)" +
      s" / $n) + 2.0 * $mu * $mu * $mu)"
    val m4 = s"(CAST(s4 AS DOUBLE) / $n - 4.0 * $mu * (CAST(s3 AS DOUBLE)" +
      s" / $n) + 6.0 * $mu * $mu * (CAST(s2 AS DOUBLE) / $n)" +
      s" - 3.0 * $mu * $mu * $mu * $mu)"
    s"""WITH v AS MATERIALIZED (
       |  SELECT l_returnflag AS flag,
       |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
       |  FROM lineitem),
       |sums AS (
       |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(v AS HUGEINT)) AS s1,
       |    sum(CAST(v AS HUGEINT) * v) AS s2,
       |    sum(CAST(v AS HUGEINT) * v * v) AS s3,
       |    sum(CAST(v AS HUGEINT) * v * v * v) AS s4
       |  FROM v GROUP BY flag)
       |SELECT flag, n,
       |  CAST(s1 AS BIGINT) // n AS mean_cents,
       |  round(sqrt($m2), 4) AS sd_cents,
       |  round($m3 / pow($m2, 1.5), 6) AS skew,
       |  round($m4 / ($m2 * $m2) - 3.0, 6) AS ex_kurtosis
       |FROM sums
       |ORDER BY flag""".stripMargin
  }

  // ─── q280: conversion-latency percentiles (time to convert) ──────────
  // The funnel-velocity read next to q201's conversion COUNTS: how long
  // from a user's first 'view' to their first 'purchase' AFTER it.
  // Latencies are exact integer SECONDS (micros div 1e6); the
  // distribution summary uses percentile_disc — attained values, no
  // interpolation float — over the |users|-sized converted frame
  // (reduced input, the q231 cut discipline).
  def q280ConversionLatency(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val fv = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val lat = ev.where(col("event_type") === "purchase")
      .join(fv, "user_id")
      .where(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
      .join(fv, "user_id")
      .select(expr("(p_us - v_us) div 1000000").as("lat_s"))
    lat.agg(count(lit(1)).as("n_converted"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s)")
        .cast("long").as("p50_s"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s)")
        .cast("long").as("p90_s"),
      min(col("lat_s")).as("min_s"), max(col("lat_s")).as("max_s"))
  }

  val q280Sql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |fv AS (SELECT user_id, min(us) AS v_us FROM ev
      |       WHERE event_type = 'view' GROUP BY user_id),
      |lat AS (
      |  SELECT (min(e.us) - any_value(f.v_us)) // 1000000 AS lat_s
      |  FROM ev e JOIN fv f USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us >= f.v_us
      |  GROUP BY e.user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_s) AS p50_s,
      |  percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_s) AS p90_s,
      |  min(lat_s) AS min_s, max(lat_s) AS max_s
      |FROM lat""".stripMargin

  // ─── q286: behavioural entropy-rate census ────────────────────────────
  // "How predictable is user behaviour" as one number per state and one
  // for the chain: the plug-in entropy rate of the first-order event
  // process (Shannon; the standard predictability read over q165's
  // transition matrix): H = −Σ_s π(s)·Σ_t p(t|s)·ln p(t|s), with π the
  // empirical state frequency and p the empirical transition row. All
  // inputs are exact integer transition counts; each (s, t) term
  // quantizes to integer NANOS at two grains (conditional, weighted by
  // π) so both the per-state conditional entropy AND the chain rate
  // fold as exact integer sums. Per-user transitions via one lag over
  // the (ts, event_id)-ordered user window (the q269 shape).
  def q286EntropyRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tr = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t"))
      .withColumn("st", lag(col("t"), 1).over(w))
      .where(col("st").isNotNull)
      .groupBy(col("st"), col("t")).agg(count(lit(1)).as("c"))
    val byS = tr.groupBy(col("st")).agg(sum(col("c")).as("cs"))
    val tot = broadcast(byS.agg(sum(col("cs")).as("tt")))
    val terms = tr.join(byS, "st").crossJoin(tot)
      .select(col("st"), col("cs"), col("tt"),
        round(round(lit(-1.0) * (col("c").cast("double") /
          col("cs").cast("double")) *
          log(col("c").cast("double") / col("cs").cast("double")), 9) *
          1e9, 0).cast("long").as("cond_nano"),
        round(round(lit(-1.0) * (col("c").cast("double") /
          col("tt").cast("double")) *
          log(col("c").cast("double") / col("cs").cast("double")), 9) *
          1e9, 0).cast("long").as("rate_nano"))
    val rate = broadcast(terms.agg(sum(col("rate_nano"))
      .as("h_rate_nano")))
    terms.groupBy(col("st"), col("cs"), col("tt"))
      .agg(sum(col("cond_nano")).as("h_state_nano"))
      .crossJoin(rate)
      .select(col("st").as("state"), col("cs").as("n_obs"),
        expr("(1000000 * cs) div tt").as("pi_micro"),
        col("h_state_nano"), col("h_rate_nano"))
      .orderBy(col("state"))
  }

  val q286Sql: String =
    """WITH tr AS MATERIALIZED (
      |  SELECT st, t, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT event_type AS t,
      |      lag(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS st
      |    FROM events)
      |  WHERE st IS NOT NULL
      |  GROUP BY st, t),
      |bys AS (SELECT st, CAST(sum(c) AS BIGINT) AS cs FROM tr GROUP BY st),
      |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS tt FROM bys),
      |terms AS (
      |  SELECT tr.st, cs, tt,
      |    CAST(round(round(-1.0 * (CAST(c AS DOUBLE) / CAST(cs AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)), 9) * 1e9, 0)
      |      AS BIGINT) AS cond_nano,
      |    CAST(round(round(-1.0 * (CAST(c AS DOUBLE) / CAST(tt AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)), 9) * 1e9, 0)
      |      AS BIGINT) AS rate_nano
      |  FROM tr JOIN bys USING (st), tot),
      |rate AS (SELECT CAST(sum(rate_nano) AS BIGINT) AS h_rate_nano
      |         FROM terms)
      |SELECT st AS state, cs AS n_obs,
      |  (1000000 * cs) // tt AS pi_micro,
      |  CAST(sum(cond_nano) AS BIGINT) AS h_state_nano, h_rate_nano
      |FROM terms, rate
      |GROUP BY st, cs, tt, h_rate_nano
      |ORDER BY state""".stripMargin

  // ─── q288: trimmed & winsorized mean census ───────────────────────────
  // Completes the robust-aggregation family (q166 IQR screen, q234 MAD,
  // q175 Gini): the two standard outlier-resistant means, per segment,
  // entirely integer-exact. Fences are percentile_disc(0.05/0.95)
  // values of exact CENTS — attained integers per segment;
  // trimmed mean = mean of values inside the fences (truncating div),
  // winsorized mean = mean after CLAMPING to the fences. Both sit next
  // to the raw mean so the census reads as "how much do the tails move
  // this metric".
  // Scale: one grouped pass; the exact per-segment percentile is the
  // oracle contract, approx_percentile fences are the 100 TB knob
  // (q226's note).
  def q288RobustMeans(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(
      customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .select(col("seg"),
        round(col("o_totalprice") * 100, 0).cast("long").as("v"))
    val fences = o.groupBy(col("seg")).agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY v)")
        .cast("long").as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)")
        .cast("long").as("hi"))
    o.join(broadcast(fences), "seg")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
           expr("sum(v) div count(*)").as("raw_mean_cents"),
           expr("sum(CASE WHEN v BETWEEN lo AND hi THEN v END) div " +
             "count(CASE WHEN v BETWEEN lo AND hi THEN 1 END)")
             .as("trimmed_mean_cents"),
           expr("sum(greatest(lo, least(hi, v))) div count(*)")
             .as("winsor_mean_cents"))
      .orderBy(col("seg"))
  }

  val q288Sql: String =
    """WITH o AS MATERIALIZED (
      |  SELECT c_mktsegment AS seg,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |fences AS (
      |  SELECT seg,
      |    percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS lo,
      |    percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS hi
      |  FROM o GROUP BY seg)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT)
      |    AS raw_mean_cents,
      |  CAST(sum(CASE WHEN v BETWEEN lo AND hi THEN v END) AS BIGINT)
      |    // CAST(count(CASE WHEN v BETWEEN lo AND hi THEN 1 END)
      |         AS BIGINT) AS trimmed_mean_cents,
      |  CAST(sum(greatest(lo, least(hi, v))) AS BIGINT)
      |    // CAST(count(*) AS BIGINT) AS winsor_mean_cents
      |FROM o JOIN fences USING (seg)
      |GROUP BY seg
      |ORDER BY seg""".stripMargin

  // ─── q289: price-volume-mix revenue bridge ────────────────────────────
  // The FP&A waterfall every revenue review runs: decompose the change
  // in revenue between two periods (orders before vs from 1998) into a
  // PRICE effect ((p₂−p₁)·q₁), a VOLUME effect (p₁·(q₂−q₁)) and the
  // mix/cross residual — per brand, entirely integer-exact: revenues
  // are exact cents, per-unit prices are truncating milli-cents
  // (1000·rev div qty), and the residual is defined by exact closure
  // Δrev·1000 − price − volume, so the three effects reconcile to the
  // bridge total BY CONSTRUCTION in both engines.
  // Scale: one join-reduce to the (brand, period) frame; the bridge is
  // a self-join of that 25×2 frame.
  def q289PvmBridge(s: SparkSession, d: String): DataFrame = {
    val per = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        (year(col("o_orderdate")) >= 1998).cast("int").as("period")),
        "l_orderkey")
      .join(part(s, d).select(col("p_partkey").as("l_partkey"),
        col("p_brand").as("brand")), "l_partkey")
      .groupBy(col("brand"), col("period"))
      .agg(sum(round(col("l_quantity"), 0).cast("long")).as("qty"),
           sum(round(col("l_extendedprice") * 100, 0).cast("long"))
             .as("rev"))
      .withColumn("p_milli", expr("(1000 * rev) div qty"))
    val a = per.where(col("period") === 0)
      .select(col("brand"), col("qty").as("q1"), col("rev").as("rev1"),
        col("p_milli").as("p1"))
    val b = per.where(col("period") === 1)
      .select(col("brand"), col("qty").as("q2"), col("rev").as("rev2"),
        col("p_milli").as("p2"))
    a.join(b, "brand")
      .select(col("brand"), col("q1"), col("q2"),
        col("rev1").as("rev1_cents"), col("rev2").as("rev2_cents"),
        ((col("p2") - col("p1")) * col("q1")).as("price_eff_milli"),
        (col("p1") * (col("q2") - col("q1"))).as("volume_eff_milli"))
      .withColumn("mix_resid_milli",
        lit(1000L) * (col("rev2_cents") - col("rev1_cents")) -
          col("price_eff_milli") - col("volume_eff_milli"))
      .orderBy(col("brand"))
  }

  val q289Sql: String =
    """WITH per AS MATERIALIZED (
      |  SELECT p_brand AS brand,
      |    CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END AS period,
      |    CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
      |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      |         AS BIGINT) AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |pm AS (SELECT *, (1000 * rev) // qty AS p_milli FROM per),
      |a AS (SELECT brand, qty AS q1, rev AS rev1, p_milli AS p1
      |      FROM pm WHERE period = 0),
      |b AS (SELECT brand, qty AS q2, rev AS rev2, p_milli AS p2
      |      FROM pm WHERE period = 1)
      |SELECT a.brand, q1, q2, rev1 AS rev1_cents, rev2 AS rev2_cents,
      |  (p2 - p1) * q1 AS price_eff_milli,
      |  p1 * (q2 - q1) AS volume_eff_milli,
      |  1000 * (rev2 - rev1) - (p2 - p1) * q1 - p1 * (q2 - q1)
      |    AS mix_resid_milli
      |FROM a JOIN b USING (brand)
      |ORDER BY brand""".stripMargin

  // ─── q292: weighted percentile census ─────────────────────────────────
  // Every percentile in the library so far weights rows equally; the
  // business read usually doesn't ("median order value weighted by
  // units sold" ≠ median order value). Weighted quartiles, rank-exact:
  // over the per-segment cents histogram with integer weights
  // (quantity), the weighted p-quantile is the smallest value whose
  // cumulative weight reaches p·W — evaluated as INTEGER
  // cross-multiplications (4·cumw ≥ W, 2·cumw ≥ W, 4·cumw ≥ 3·W), so
  // no float ever decides a quantile. One cumulative window per
  // segment over the reduced value histogram (the q250/q271 shape).
  def q292WeightedPercentiles(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).join(
      customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .join(lineitem(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(round(col("l_quantity"), 0).cast("long")).as("w")),
        "o_orderkey")
      .select(col("seg"),
        round(col("o_totalprice") * 100, 0).cast("long").as("v"), col("w"))
    val hist = o.groupBy(col("seg"), col("v")).agg(sum(col("w")).as("wv"))
    val tot = hist.groupBy(col("seg")).agg(sum(col("wv")).as("tw"))
    val wCum = Window.partitionBy(col("seg")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cumw", sum(col("wv")).over(wCum))
      .join(broadcast(tot), "seg")
      .groupBy(col("seg"), col("tw"))
      .agg(
        min(when(lit(4L) * col("cumw") >= col("tw"), col("v"))).as("wp25"),
        min(when(lit(2L) * col("cumw") >= col("tw"), col("v"))).as("wp50"),
        min(when(lit(4L) * col("cumw") >= lit(3L) * col("tw"), col("v")))
          .as("wp75"))
      .select(col("seg"), col("tw").as("total_weight"), col("wp25"),
        col("wp50"), col("wp75"))
      .orderBy(col("seg"))
  }

  val q292Sql: String =
    """WITH o AS MATERIALIZED (
      |  SELECT c_mktsegment AS seg,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
      |    w
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN (SELECT l_orderkey,
      |          CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
      |            AS w
      |        FROM lineitem GROUP BY l_orderkey) li
      |    ON o_orderkey = li.l_orderkey),
      |hist AS (
      |  SELECT seg, v, CAST(sum(w) AS BIGINT) AS wv
      |  FROM o GROUP BY seg, v),
      |tot AS (SELECT seg, CAST(sum(wv) AS BIGINT) AS tw
      |        FROM hist GROUP BY seg),
      |cum AS (
      |  SELECT seg, v,
      |    CAST(sum(wv) OVER (PARTITION BY seg ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumw
      |  FROM hist)
      |SELECT c.seg, tw AS total_weight,
      |  min(CASE WHEN 4 * cumw >= tw THEN v END) AS wp25,
      |  min(CASE WHEN 2 * cumw >= tw THEN v END) AS wp50,
      |  min(CASE WHEN 4 * cumw >= 3 * tw THEN v END) AS wp75
      |FROM cum c JOIN tot USING (seg)
      |GROUP BY c.seg, tw
      |ORDER BY c.seg""".stripMargin

  // ─── q298: Markov removal-effect channel attribution ──────────────────
  // The data-driven attribution model (Anderl et al. 2016's removal
  // effect over q165's first-order chain) that replaced heuristic
  // position rules (q177 last-touch, q185 linear): each user's journey
  // up to their FIRST purchase becomes a chain START → events → CONV
  // (purchase) / DROP (journey ends unconverted); a channel's credit is
  // how much the absorption probability P(reach CONV from START) FALLS
  // when every transition into that channel is redirected to DROP — the
  // counterfactual "what if this channel didn't exist".
  //
  // Absorption probabilities come from [[MrRounds]] fixed rounds of
  // value iteration v(s) ← Σ_t P(s,t)·v(t) with v(CONV)=1, v(DROP)=0 —
  // run SIMULTANEOUSLY for the base chain and all four removal variants
  // as one variant-keyed frame (≤ |variants|·|states|² rows). Each term
  // P(s,t)·v(t) is quantized to integer NANOS before the sum (the q258
  // quantize-then-sum rule), so round values are exact BIGINTs.
  //
  // Scale: the corpus-sized work is ONE per-user window pass (journey
  // truncation + lead, the q87/q165 linear shape) and one transition
  // count; everything after lives on the ≤150-row transition frame —
  // 8 rounds of broadcast equi-joins on a driver-negligible frame, the
  // converged values checkpointed once (see the fin note). The counts
  // frame is cached because base and removal variants all derive from
  // it.
  private val MrRounds = 8

  def q298MarkovAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("st"))
      .withColumn("prevPurch",
        sum(when(col("st") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .where(coalesce(col("prevPurch"), lit(0L)) === 0L)
    val steps = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("st"), 1).over(w))
    val trans = steps.where(col("rn") === 1)
      .select(lit("START").as("src"),
        when(col("st") === "purchase", "CONV").otherwise(col("st"))
          .as("dst"))
      .unionAll(steps.where(col("st") =!= "purchase")
        .select(col("st").as("src"),
          when(col("nxt").isNull, "DROP")
            .when(col("nxt") === "purchase", "CONV")
            .otherwise(col("nxt")).as("dst")))
    val counts = trans.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .cache()
    val totals = counts.groupBy("src").agg(sum(col("n")).as("tn"))
    val p = counts.join(broadcast(totals), "src")
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("tn").cast("double")).as("p"))
    val variants = s.range(1).select(explode(array(
      lit("base"), lit("click"), lit("error"), lit("signup"),
      lit("view"))).as("variant"))
    // removal = redirect every transition INTO the removed channel to
    // DROP; denominators (and so all other probabilities) are unchanged
    val vp = p.crossJoin(broadcast(variants))
      .select(col("variant"), col("src"),
        when(col("dst") === col("variant"), lit("DROP"))
          .otherwise(col("dst")).as("dst"),
        col("p"))
    var vv = vp.select(col("variant").as("vv_variant"),
        col("src").as("state")).distinct()
      .withColumn("v_nano", lit(0L))
    for (_ <- 1 to MrRounds) {
      vv = vp.join(vv, col("variant") === col("vv_variant") &&
             col("dst") === col("state"), "left")
        .select(col("variant"), col("src"),
          round(col("p") * (
            when(col("dst") === "CONV", lit(1e9))
              .when(col("dst") === "DROP", lit(0.0))
              .otherwise(coalesce(col("v_nano").cast("double"),
                lit(0.0))))).cast("long").as("term"))
        .groupBy(col("variant"), col("src"))
        .agg(sum(col("term")).as("v_nano"))
        .select(col("variant").as("vv_variant"), col("src").as("state"),
          col("v_nano"))
    }
    // materialize the converged ≤25-row value frame ONCE: fin feeds base,
    // the removal census, and the share total — a lazy 8-round chain
    // would re-execute (and re-schedule ~100 tiny stages) per reference
    // (measured 12.7 s at sf0.1; checkpointed ~1 s)
    vv = vv.localCheckpoint()
    val fin = vv.where(col("state") === "START")
      .select(col("vv_variant").as("variant"), col("v_nano"))
    val base = fin.where(col("variant") === "base")
      .select(col("v_nano").as("base_nano"))
    val rem = fin.where(col("variant") =!= "base")
      .crossJoin(broadcast(base))
      .select(col("variant").as("channel"), col("base_nano"),
        col("v_nano").as("removed_nano"),
        greatest(lit(0L), col("base_nano") - col("v_nano"))
          .as("removal_nano"))
    val tot = rem.agg(sum(col("removal_nano")).as("rt"))
    rem.crossJoin(broadcast(tot))
      .select(col("channel"), col("base_nano"), col("removed_nano"),
        col("removal_nano"),
        when(col("rt") > 0L, expr("(10000 * removal_nano) div rt"))
          .otherwise(lit(0L)).as("share_bp"))
      .orderBy(col("channel"))
  }

  val q298Sql: String = {
    val rounds = (1 to MrRounds).map { r =>
      s"""v$r AS MATERIALIZED (
         |  SELECT t.variant, t.src AS state,
         |    CAST(sum(CAST(round(t.p * CASE WHEN t.dst = 'CONV' THEN 1e9
         |      WHEN t.dst = 'DROP' THEN 0
         |      ELSE coalesce(v.v_nano, 0) END) AS BIGINT)) AS BIGINT)
         |      AS v_nano
         |  FROM vp t LEFT JOIN v${r - 1} v
         |    ON v.variant = t.variant AND v.state = t.dst
         |  GROUP BY t.variant, t.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |    event_type AS st
       |  FROM events),
       |ev AS (
       |  SELECT * FROM (
       |    SELECT user_id, ts, event_id, st,
       |      coalesce(sum(CASE WHEN st = 'purchase' THEN 1 ELSE 0 END)
       |        OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |        0) AS prevpurch
       |    FROM e)
       |  WHERE prevpurch = 0),
       |steps AS (
       |  SELECT st,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    lead(st) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS nxt
       |  FROM ev),
       |trans AS (
       |  SELECT 'START' AS src,
       |    CASE WHEN st = 'purchase' THEN 'CONV' ELSE st END AS dst
       |  FROM steps WHERE rn = 1
       |  UNION ALL
       |  SELECT st AS src,
       |    CASE WHEN nxt IS NULL THEN 'DROP'
       |         WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END AS dst
       |  FROM steps WHERE st <> 'purchase'),
       |counts AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |           FROM trans GROUP BY src, dst),
       |totals AS (SELECT src, CAST(sum(n) AS BIGINT) AS tn
       |           FROM counts GROUP BY src),
       |variants AS (SELECT unnest(['base', 'click', 'error', 'signup',
       |                            'view']) AS variant),
       |vp AS MATERIALIZED (
       |  SELECT va.variant, c.src,
       |    CASE WHEN c.dst = va.variant THEN 'DROP' ELSE c.dst END AS dst,
       |    CAST(c.n AS DOUBLE) / CAST(t.tn AS DOUBLE) AS p
       |  FROM counts c JOIN totals t ON c.src = t.src
       |  CROSS JOIN variants va),
       |v0 AS (SELECT DISTINCT variant, src AS state, CAST(0 AS BIGINT)
       |         AS v_nano
       |       FROM vp),
       |$rounds,
       |fin AS (SELECT variant, v_nano FROM v$MrRounds
       |        WHERE state = 'START'),
       |bs AS (SELECT v_nano AS base_nano FROM fin WHERE variant = 'base'),
       |rem AS (
       |  SELECT f.variant AS channel, b.base_nano, f.v_nano AS removed_nano,
       |    greatest(0, b.base_nano - f.v_nano) AS removal_nano
       |  FROM fin f, bs b WHERE f.variant <> 'base'),
       |tot AS (SELECT CAST(sum(removal_nano) AS BIGINT) AS rt FROM rem)
       |SELECT channel, base_nano, removed_nano, removal_nano,
       |  CAST(CASE WHEN rt > 0 THEN (10000 * removal_nano) // rt
       |       ELSE 0 END AS BIGINT) AS share_bp
       |FROM rem, tot
       |ORDER BY channel""".stripMargin
  }

  // ─── q299: Holt double-exponential-smoothing forecast backtest ────────
  // The level+trend forecaster (Holt 1957) one notch above q263's
  // seasonal-naïve yardstick: l_t = α·y_t + (1−α)·(l_{t−1}+b_{t−1}),
  // b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1}, one-step forecast ŷ_t =
  // l_{t−1}+b_{t−1}, here with α = 1/5, β = 1/10 so every update is a
  // RATIONAL recurrence over integer micros: l/b live as exact BIGINTs,
  // each update is floor((2·y + 8·(l+b))/10) and floor((Δl + 9·b)/10) —
  // explicit floor() on BOTH engines (NB: DuckDB's // truncates toward
  // zero exactly like Spark's div — -7 // 2 = -3 — so neither integer
  // division would do here: b can go negative and Holt's update wants
  // floor, not truncation); both engines evaluate the identical
  // floor(double) on values far inside 2^53.
  //
  // The recurrence is inherently sequential IN TIME but the time axis is
  // calendar-bounded (|days| per series, never corpus-sized) — so each
  // series folds its day array in ONE higher-order `aggregate` over the
  // grid-completed (gap = 0, spine-joined) daily counts: the q243
  // bounded-group contract. The corpus-sized work is one daily count.
  // Census: per event type, one-step MAE (micros) and sMAPE plus the
  // final level/trend the forecast would ship with.
  def q299HoltBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        (coalesce(col("y"), lit(0L)) * 1000000L).as("ym"))
    def fdiv10(c: Column): Column =
      floor(c.cast("double") / lit(10.0)).cast("long")
    val folded = series.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("ym"))))
        .as("pts"))
      .withColumn("acc", aggregate(
        expr("slice(pts, 3, size(pts))"),
        struct(
          expr("pts[0].ym").as("l"),
          (expr("pts[1].ym") - expr("pts[0].ym")).as("b"),
          lit(0L).as("sae"), lit(0L).as("sms"), lit(0L).as("np")),
        (acc, pt) => {
          val f = acc("l") + acc("b")
          val err = abs(pt("ym") - f)
          val sm = when(pt("ym") + f > 0L,
            floor((lit(2000000L) * err).cast("double") /
              (pt("ym") + f).cast("double")).cast("long"))
            .otherwise(lit(0L))
          val l2 = fdiv10(lit(2L) * pt("ym") + lit(8L) * (acc("l") + acc("b")))
          val b2 = fdiv10((l2 - acc("l")) + lit(9L) * acc("b"))
          struct(l2.as("l"), b2.as("b"),
            (acc("sae") + err).as("sae"), (acc("sms") + sm).as("sms"),
            (acc("np") + 1L).as("np"))
        }))
    folded.select(col("event_type"),
      col("acc.np").as("n_points"),
      expr("acc.sae div acc.np").as("mae_micro"),
      expr("acc.sms div acc.np").as("smape_micro"),
      col("acc.l").as("level_micro"), col("acc.b").as("trend_micro"))
      .orderBy(col("event_type"))
  }

  val q299Sql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |spine AS (
      |  SELECT t.event_type, g.day
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN (SELECT unnest(generate_series(
      |    (SELECT d0 FROM span), (SELECT d1 FROM span))) AS day) g),
      |series AS MATERIALIZED (
      |  SELECT s.event_type, s.day, coalesce(d.y, 0) * 1000000 AS ym
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day),
      |idx AS MATERIALIZED (
      |  SELECT event_type, ym,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      |  FROM series),
      |base AS (
      |  SELECT event_type,
      |    min(CASE WHEN i = 1 THEN ym END) AS y1,
      |    min(CASE WHEN i = 2 THEN ym END) AS y2,
      |    max(i) AS n
      |  FROM idx GROUP BY event_type),
      |rec AS (
      |  SELECT event_type, CAST(2 AS BIGINT) AS i, y1 AS l,
      |    y2 - y1 AS b, CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS sms,
      |    CAST(0 AS BIGINT) AS np, n
      |  FROM base
      |  UNION ALL
      |  SELECT r.event_type, r.i + 1,
      |    CAST(floor((2 * x.ym + 8 * (r.l + r.b)) / 10.0) AS BIGINT),
      |    CAST(floor((CAST(floor((2 * x.ym + 8 * (r.l + r.b)) / 10.0)
      |        AS BIGINT) - r.l + 9 * r.b) / 10.0) AS BIGINT),
      |    r.sae + abs(x.ym - (r.l + r.b)),
      |    r.sms + CASE WHEN x.ym + r.l + r.b > 0
      |      THEN CAST(floor((2000000 * abs(x.ym - (r.l + r.b)))
      |        / CAST(x.ym + r.l + r.b AS DOUBLE)) AS BIGINT)
      |      ELSE 0 END,
      |    r.np + 1, r.n
      |  FROM rec r JOIN idx x
      |    ON x.event_type = r.event_type AND x.i = r.i + 1)
      |SELECT event_type, np AS n_points,
      |  sae // np AS mae_micro, sms // np AS smape_micro,
      |  l AS level_micro, b AS trend_micro
      |FROM rec WHERE i = n
      |ORDER BY event_type""".stripMargin

  // ─── q300: differentially-private histogram release ───────────────────
  // The governance release primitive past q73's PII scrub and q252's
  // k-anonymity: publish per-(event type, day) activity counts under
  // ε-differential privacy (Dwork et al. 2006) — Laplace(1/ε) noise on
  // every bucket, clamped at zero. Sensitivity is 1 (one user-event
  // moves one bucket count by one), so scale b = 1/ε with ε = 1.
  //
  // Noise is SEEDED, not sampled: each bucket's Laplace draw comes from
  // inverse-transform over a 52-bit md5 hash of the bucket key —
  // u = (2k+1)/2^53 (the midpoint trick: u can never hit 0, ½, or 1, so
  // ln(1−2|u−½|) is always finite), lap = −sign(u−½)·ln(1−2|u−½|).
  // Determinism is what makes the release oracle-checkable; a production
  // deployment would swap the hash for a drawn seed per release and keep
  // every other line. ln runs on dyadic-rational doubles both engines
  // construct identically; the result is 9-dp-rounded then quantized to
  // integer micros (the q262 double-rounding guard).
  //
  // Scale: one map-side-combined count to the |types|×|days| grid; the
  // noise projection is per-row arithmetic on that calendar-sized frame.
  def q300DpHistogram(s: SparkSession, d: String): DataFrame = {
    val grid = events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    grid
      .withColumn("k",
        conv(substring(md5(concat(lit("dp:"), col("event_type"), lit(":"),
          col("day").cast("string"))), 1, 13), 16, 10).cast("long"))
      .withColumn("u",
        (col("k") * 2L + 1L).cast("double") / lit(9007199254740992.0))
      .withColumn("lap_micro",
        round(round(-signum(col("u") - 0.5)
          * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 9)
          * lit(1e6)).cast("long"))
      .select(col("event_type"), col("day"),
        greatest(lit(0L), col("n") * 1000000L + col("lap_micro"))
          .as("noisy_count_micro"),
        lit(1000000L).as("epsilon_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  val q300Sql: String =
    """WITH grid AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |noise AS (
      |  SELECT event_type, day, n,
      |    CAST(round(round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)),
      |      9) * 1e6) AS BIGINT) AS lap_micro
      |  FROM (
      |    SELECT event_type, day, n,
      |      CAST(2 * CAST(('0x' || substr(md5('dp:' || event_type || ':'
      |        || CAST(day AS VARCHAR)), 1, 13)) AS BIGINT) + 1 AS DOUBLE)
      |        / 9007199254740992.0 AS u
      |    FROM grid))
      |SELECT event_type, day,
      |  greatest(0, n * 1000000 + lap_micro) AS noisy_count_micro,
      |  CAST(1000000 AS BIGINT) AS epsilon_micro
      |FROM noise
      |ORDER BY event_type, day""".stripMargin

  // ─── q305: Neyman-allocation stratified sampling ──────────────────────
  // The survey-sampling workhorse (Neyman 1934): a fixed audit budget of
  // [[NeyBudget]] rows allocated across strata ∝ N_h·σ_h — high-variance
  // strata get more budget, which minimizes the estimator's variance for
  // a fixed cost (vs q75's proportional rule, which ignores σ). The ML
  // counterpart is variance-aware eval-set construction.
  //
  // Exactness: N_h·σ_h = √(N_h·Σx² − (Σx)²) — an exact integer under the
  // root (cents² sums run in DECIMAL(38), the q279 rule), rounded once
  // to an integer weight; allocation integerizes by LARGEST REMAINDER
  // (q290's Hamilton method: base = truncating div, remainders ranked as
  // exact integers, Σ = budget by construction). The draw is salted-hash
  // rank (grow-stable, the q102/q232 discipline) with the kept-id
  // checksum emitted as data.
  //
  // Scale: one grouped aggregate to |strata| rows; allocation arithmetic
  // on that enum-sized frame; the draw ranks per-stratum under a LITERAL
  // rank ≤ budget prefilter (WindowGroupLimit prunes partitions before
  // the full sort), then the per-stratum cut joins on the broadcast
  // 5-row allocation.
  private val NeyBudget = 1000

  def q305NeymanSample(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .select(col("seg"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        md5(concat(lit("ney:"), col("o_orderkey").cast("string")))
          .as("h"))
    val strat = base.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col("cents").cast("decimal(38,0)")).as("sx"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)"))
          .as("sx2"))
      .select(col("seg"), col("n_pop"),
        round(sqrt((col("n_pop").cast("decimal(38,0)") * col("sx2")
          - col("sx") * col("sx")).cast("double"))).cast("long")
          .as("w_sigma"))
    val tot = strat.agg(sum(col("w_sigma")).as("tw"),
      count(lit(1)).as("n_strata"))
    val withBase = strat.crossJoin(broadcast(tot))
      .select(col("seg"), col("n_pop"), col("w_sigma"),
        expr(s"($NeyBudget * w_sigma) div tw").as("alloc0"),
        expr(s"($NeyBudget * w_sigma) % tw").as("rem"))
    val leftover = withBase.agg(
      (lit(NeyBudget.toLong) - sum(col("alloc0"))).as("left"))
    val alloc = withBase.crossJoin(broadcast(leftover))
      .withColumn("rr", row_number().over(
        Window.orderBy(col("rem").desc, col("seg"))))
      .select(col("seg"), col("n_pop"), col("w_sigma"),
        (col("alloc0") + when(col("rr") <= col("left"), 1L)
          .otherwise(0L)).as("alloc"))
    val kept = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("h"),
          col("o_orderkey"))))
      .where(col("rn") <= NeyBudget)
      .join(broadcast(alloc.select(col("seg"), col("alloc"))), "seg")
      .where(col("rn") <= col("alloc"))
    kept.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_kept"), sum(col("o_orderkey")).as("id_sum"),
           sum(col("cents")).as("cents_sum"))
      .join(alloc, Seq("seg"))
      .select(col("seg"), col("n_pop"), col("w_sigma"), col("alloc"),
        col("n_kept"), col("id_sum"), col("cents_sum"))
      .orderBy(col("seg"))
  }

  val q305Sql: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT c_mktsegment AS seg, o_orderkey,
       |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
       |    md5('ney:' || CAST(o_orderkey AS VARCHAR)) AS h
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |strat AS (
       |  SELECT seg, CAST(count(*) AS BIGINT) AS n_pop,
       |    CAST(round(sqrt(CAST(CAST(count(*) AS HUGEINT)
       |      * sum(CAST(cents AS HUGEINT) * cents)
       |      - sum(CAST(cents AS HUGEINT)) * sum(CAST(cents AS HUGEINT))
       |      AS DOUBLE))) AS BIGINT) AS w_sigma
       |  FROM base GROUP BY seg),
       |tot AS (SELECT CAST(sum(w_sigma) AS BIGINT) AS tw FROM strat),
       |wb AS (
       |  SELECT seg, n_pop, w_sigma,
       |    ($NeyBudget * w_sigma) // tw AS alloc0,
       |    ($NeyBudget * w_sigma) % tw AS rem
       |  FROM strat, tot),
       |lo AS (SELECT $NeyBudget - CAST(sum(alloc0) AS BIGINT) AS lft
       |       FROM wb),
       |alloc AS (
       |  SELECT seg, n_pop, w_sigma,
       |    alloc0 + CASE WHEN row_number()
       |        OVER (ORDER BY rem DESC, seg) <= lft
       |      THEN 1 ELSE 0 END AS alloc
       |  FROM wb, lo),
       |kept AS (
       |  SELECT b.seg, b.o_orderkey, b.cents FROM (
       |    SELECT seg, o_orderkey, cents,
       |      row_number() OVER (PARTITION BY seg ORDER BY h, o_orderkey)
       |        AS rn
       |    FROM base) b
       |  JOIN alloc a ON b.seg = a.seg
       |  WHERE b.rn <= a.alloc)
       |SELECT a.seg, a.n_pop, a.w_sigma, CAST(a.alloc AS BIGINT) AS alloc,
       |  CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(k.o_orderkey) AS BIGINT) AS id_sum,
       |  CAST(sum(k.cents) AS BIGINT) AS cents_sum
       |FROM kept k JOIN alloc a ON k.seg = a.seg
       |GROUP BY a.seg, a.n_pop, a.w_sigma, a.alloc
       |ORDER BY a.seg""".stripMargin

  // ─── q309: next-event prediction backtest (leave-last-out Markov) ─────
  // Does the q165 transition model actually PREDICT? The standard
  // sequence-model eval under the standard leakage discipline: hold out
  // every user's LAST transition, train the first-order model on the
  // rest, predict argmax P(next | current), score hit rate per source
  // state. Leave-last-out (not in-sample) matters: the test pair must
  // not vote for its own prediction — the q204/q222 leakage principle
  // applied to sequences.
  //
  // Determinism: prediction per source = rank-1 of (count DESC, dst) —
  // integer counts, string tie-break; hit rates are exact integer basis
  // points. Scale: one per-user window pass tags each user's last
  // transition; train counts are one map-side-combined aggregate; the
  // prediction table is |states|² rows; the eval joins the |users|-row
  // test frame against the broadcast prediction table.
  def q309NextEventBacktest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val trans = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      // tag BEFORE dropping the pair-less final event: the user's last
      // transition is the pair whose source is the penultimate event —
      // rn 2 in the descending order over ALL events (rn 1 is the final
      // event, which emits no pair)
      .withColumn("isTest", row_number().over(wDesc) === 2)
      .where(col("dst").isNotNull)
    val counts = trans.where(!col("isTest"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val pred = counts
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("n").desc, col("dst"))))
      .where(col("rk") === 1)
      .select(col("src"), col("dst").as("pred"))
    trans.where(col("isTest"))
      .join(broadcast(pred), Seq("src"), "left")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_tests"),
        sum(when(col("dst") === col("pred"), 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("src"), col("n_tests"), col("n_hits"),
        expr("(10000 * n_hits) div n_tests").as("hit_bp"))
      .orderBy(col("src"))
  }

  val q309Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type AS src
      |  FROM events),
      |trans AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT user_id, src,
      |      lead(src) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |        AS dst,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) = 2 AS istest
      |    FROM e)
      |  WHERE dst IS NOT NULL),
      |counts AS (
      |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      |  FROM trans WHERE NOT istest GROUP BY src, dst),
      |pred AS (
      |  SELECT src, dst AS pred FROM (
      |    SELECT *, row_number() OVER (PARTITION BY src
      |      ORDER BY n DESC, dst) AS rk
      |    FROM counts)
      |  WHERE rk = 1)
      |SELECT t.src, CAST(count(*) AS BIGINT) AS n_tests,
      |  CAST(sum(CASE WHEN t.dst = p.pred THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_hits,
      |  (10000 * CAST(sum(CASE WHEN t.dst = p.pred THEN 1 ELSE 0 END)
      |    AS BIGINT)) // CAST(count(*) AS BIGINT) AS hit_bp
      |FROM trans t LEFT JOIN pred p ON t.src = p.src
      |WHERE t.istest
      |GROUP BY t.src
      |ORDER BY t.src""".stripMargin

  // ─── q310: multiple-testing screen (Mann–Whitney × Benjamini–Hochberg) ─
  // The anomaly-screening discipline at scale: 35 simultaneous hypotheses
  // (each event type × weekday: "does this weekday's value distribution
  // differ from the type's other days?"), each tested with q271's
  // histogram-folded Mann–Whitney U, then FDR-controlled with
  // Benjamini–Hochberg step-up at α = 0.10 — the correction that keeps a
  // 35-cell screen from crying wolf 3.5 times by chance (Bonferroni's
  // over-conservative cousin is the strawman; BH is what monitoring
  // pipelines ship).
  //
  // Exactness: midranks fold from the per-type value histogram exactly
  // as q271 (doubled midranks, integer U; per-weekday rank sums join the
  // per-(type, value) day counts against the type's midrank frame — the
  // histogram is computed ONCE per type, 35 hypotheses price one
  // aggregate). The normal CDF uses the Abramowitz–Stegun 26.2.17
  // polynomial — exp + fixed literals evaluated in the same order by
  // both engines, on the ALREADY-QUANTIZED z (micro), with the result
  // 9-dp-rounded before micro-quantization (the q262 guard). The BH
  // threshold is a pure integer cross-multiplication:
  // reject rank k iff 10·m·p_micro ≤ 10⁶·k; step-up rejects everything
  // at or below the LARGEST satisfying k.
  //
  // Scale: one fact reduction to the (type, value) histogram and one to
  // the (type, weekday, value) counts; ranks run over the value DOMAIN
  // (q144/q250 principle); the BH window sorts 35 rows.
  def q310BhScreen(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .select(col("event_type").as("et"),
        round(col("value") * 100, 0).cast("long").as("v"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("wd"))
    val histAll = base.groupBy(col("et"), col("v"))
      .agg(count(lit(1)).as("nv"))
    val wCum = Window.partitionBy(col("et")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val m2 = histAll
      .withColumn("lcum", coalesce(sum(col("nv")).over(wCum), lit(0L)))
      .select(col("et"), col("v"),
        (lit(2L) * col("lcum") + col("nv") + 1L).as("m2"))
    val totals = histAll.groupBy(col("et")).agg(sum(col("nv")).as("nt"))
    val histDay = base.groupBy(col("et"), col("wd"), col("v"))
      .agg(count(lit(1)).as("ndv"))
    val hyp = histDay.join(m2, Seq("et", "v"))
      .groupBy(col("et"), col("wd"))
      .agg(sum(col("ndv")).as("n1"),
           sum(col("ndv") * col("m2")).as("r1x2"))
      .join(broadcast(totals), "et")
      .select(col("et"), col("wd"), col("n1"),
        (col("nt") - col("n1")).as("n2"), col("r1x2"))
      .select(col("et"), col("wd"), col("n1"), col("n2"),
        round(((col("r1x2") - col("n1") * (col("n1") + 1L))
          .cast("double") / 2.0 -
          col("n1").cast("double") * col("n2").cast("double") / 2.0) /
          sqrt(col("n1").cast("double") * col("n2").cast("double") *
            (col("n1") + col("n2") + 1L).cast("double") / 12.0) * 1e6, 0)
          .cast("long").as("z_micro"))
    // two-sided p from the quantized z: Abramowitz–Stegun 26.2.17 on
    // x = |z|; identical literals and nesting on both engines
    val x = abs(col("z_micro")).cast("double") / lit(1e6)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = (((((lit(1.330274429) * t - lit(1.821255978)) * t
      + lit(1.781477937)) * t - lit(0.356563782)) * t
      + lit(0.319381530)) * t)
    val phi = exp(-(x * x) / lit(2.0)) * lit(0.3989422804014327)
    val pv = hyp.withColumn("p_micro",
      round(round(lit(2.0) * phi * poly, 9) * lit(1e6)).cast("long"))
    bhStepUp(pv, Seq("et", "wd"), m = 35)
      .select(col("et").as("event_type"), col("wd").as("weekday"),
        col("n1"), col("z_micro"), col("p_micro"), col("p_rank"),
        col("rejected"))
      .orderBy(col("event_type"), col("weekday"))
  }

  /** Benjamini–Hochberg step-up at α = 0.10 over a frame carrying
    * `p_micro`: adds `p_rank` (ascending p, ties by `tieCols`) and
    * `rejected` (1 for every rank ≤ the LARGEST k with
    * 10·m·p_micro ≤ 10⁶·k — the step-up rejects hypotheses whose own
    * inequality fails when a later rank passes, the property that
    * distinguishes BH from per-test thresholding). Pure integer gate.
    * Factored from [[q310BhScreen]] so InsightsSpec can drive planted
    * p-value sets through the textbook cases — the sf fixture's null
    * result (zero rejections) never exercises the step-up path. */
  private[graft] def bhStepUp(pv: DataFrame, tieCols: Seq[String],
                              m: Int): DataFrame = {
    val ranked = pv.withColumn("p_rank", row_number().over(
      Window.orderBy(col("p_micro") +: tieCols.map(col): _*)).cast("long"))
    val kStar = ranked.agg(coalesce(max(when(
      lit(10L * m) * col("p_micro") <= lit(1000000L) * col("p_rank"),
      col("p_rank"))), lit(0L)).as("k_star"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("rejected",
        when(col("p_rank") <= col("k_star"), 1L).otherwise(0L))
      .drop("k_star")
  }

  val q310Sql: String =
    """WITH base AS MATERIALIZED (
      |  SELECT event_type AS et,
      |    CAST(round(value * 100, 0) AS BIGINT) AS v,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS wd
      |  FROM events),
      |histall AS MATERIALIZED (
      |  SELECT et, v, CAST(count(*) AS BIGINT) AS nv
      |  FROM base GROUP BY et, v),
      |m2 AS (
      |  SELECT et, v,
      |    2 * coalesce(sum(nv) OVER (PARTITION BY et ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + nv + 1 AS m2
      |  FROM histall),
      |totals AS (SELECT et, CAST(sum(nv) AS BIGINT) AS nt
      |           FROM histall GROUP BY et),
      |histday AS (
      |  SELECT et, wd, v, CAST(count(*) AS BIGINT) AS ndv
      |  FROM base GROUP BY et, wd, v),
      |hyp AS (
      |  SELECT h.et, h.wd, sum(h.ndv) AS n1, t.nt - sum(h.ndv) AS n2,
      |    sum(h.ndv * m.m2) AS r1x2
      |  FROM histday h JOIN m2 m ON h.et = m.et AND h.v = m.v
      |  JOIN totals t ON h.et = t.et
      |  GROUP BY h.et, h.wd, t.nt),
      |zs AS (
      |  SELECT et, wd, CAST(n1 AS BIGINT) AS n1,
      |    CAST(round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
      |        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      |      / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |          * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) * 1e6, 0)
      |      AS BIGINT) AS z_micro
      |  FROM hyp),
      |pv AS (
      |  SELECT et, wd, n1, z_micro,
      |    CAST(round(round(2.0
      |      * (exp(-(x * x) / 2.0) * 0.3989422804014327)
      |      * ((((( 1.330274429 * (1.0 / (1.0 + 0.2316419 * x))
      |          - 1.821255978) * (1.0 / (1.0 + 0.2316419 * x))
      |          + 1.781477937) * (1.0 / (1.0 + 0.2316419 * x))
      |          - 0.356563782) * (1.0 / (1.0 + 0.2316419 * x))
      |          + 0.319381530) * (1.0 / (1.0 + 0.2316419 * x))),
      |      9) * 1e6) AS BIGINT) AS p_micro
      |  FROM (SELECT *, CAST(abs(z_micro) AS DOUBLE) / 1e6 AS x FROM zs)),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, et, wd)
      |    AS BIGINT) AS p_rank
      |  FROM pv),
      |ks AS (
      |  SELECT coalesce(max(CASE WHEN 350 * p_micro <= 1000000 * p_rank
      |    THEN p_rank END), 0) AS k_star
      |  FROM ranked)
      |SELECT et AS event_type, wd AS weekday, n1, z_micro, p_micro,
      |  p_rank,
      |  CAST(CASE WHEN p_rank <= k_star THEN 1 ELSE 0 END AS BIGINT)
      |    AS rejected
      |FROM ranked, ks
      |ORDER BY event_type, weekday""".stripMargin

  // ─── q311: sequential association rules (X followed by Y within 3) ────
  // The directional counterpart of q163's basket rules and the k-step
  // widening of q165's adjacent transitions: "users who do X go on to do
  // Y within 3 events" — the sequence pattern product analytics mines
  // for intervention points. Windows = the three leads per event (the
  // q269 shape); a (src, dst) pair counts once per (position, offset)
  // occurrence. Confidence = share of X's forward windows that hit Y;
  // lift normalizes by Y's share of ALL windows — both exact integer
  // ratios (bp / milli).
  //
  // Scale: one per-user window pass (three leads), one pair-keyed
  // count, |types|²-row census; totals broadcast back.
  def q311SequentialRules(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val leads = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("x"))
      .withColumn("y1", lead(col("x"), 1).over(w))
      .withColumn("y2", lead(col("x"), 2).over(w))
      .withColumn("y3", lead(col("x"), 3).over(w))
    val pairs = Seq("y1", "y2", "y3").map(c =>
      leads.where(col(c).isNotNull)
        .select(col("x"), col(c).as("y"))).reduce(_ unionAll _)
    val nx = pairs.groupBy(col("x")).agg(count(lit(1)).as("n_x"))
    val ny = pairs.groupBy(col("y")).agg(count(lit(1)).as("n_y"))
    val tot = pairs.agg(count(lit(1)).as("n_w"))
    pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      .join(broadcast(nx), "x")
      .join(broadcast(ny), "y")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"),
        expr("(10000 * n_xy) div n_x").as("confidence_bp"),
        // n_xy*n_w and n_x*n_y are corpus-scale products that pass 2^63
        // at large SF — ride DECIMAL(38,0)/HUGEINT (q279 rule) into div.
        expr("""(1000 * cast(n_xy as decimal(38,0)) * n_w)
                div (cast(n_x as decimal(38,0)) * n_y)""").as("lift_milli"))
      .orderBy(col("x"), col("y"))
  }

  val q311Sql: String =
    """WITH leads AS (
      |  SELECT event_type AS x,
      |    lead(event_type, 1) OVER w AS y1,
      |    lead(event_type, 2) OVER w AS y2,
      |    lead(event_type, 3) OVER w AS y3
      |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |          event_type FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |pairs AS MATERIALIZED (
      |  SELECT x, y1 AS y FROM leads WHERE y1 IS NOT NULL
      |  UNION ALL SELECT x, y2 FROM leads WHERE y2 IS NOT NULL
      |  UNION ALL SELECT x, y3 FROM leads WHERE y3 IS NOT NULL),
      |nx AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x
      |       FROM pairs GROUP BY x),
      |ny AS (SELECT y, CAST(count(*) AS BIGINT) AS n_y
      |       FROM pairs GROUP BY y),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_w FROM pairs)
      |SELECT p.x, p.y, CAST(count(*) AS BIGINT) AS n_xy,
      |  (10000 * CAST(count(*) AS BIGINT)) // n_x AS confidence_bp,
      |  CAST((1000 * CAST(count(*) AS HUGEINT) * n_w)
      |    // (CAST(n_x AS HUGEINT) * n_y) AS BIGINT) AS lift_milli
      |FROM pairs p
      |JOIN nx ON p.x = nx.x
      |JOIN ny ON p.y = ny.y
      |CROSS JOIN tot
      |GROUP BY p.x, p.y, n_x, n_y, n_w
      |ORDER BY p.x, p.y""".stripMargin

  // ─── q312: overdispersion census (Poisson sanity of daily counts) ─────
  // Before any count-based anomaly alert ships, the dispersion check:
  // a Poisson process has variance ≈ mean; real traffic is usually
  // OVERDISPERSED (bursts, weekly cycles), and alerting with Poisson
  // thresholds on overdispersed counts pages people at 3 am. Per event
  // type over the daily-count series: the variance/mean ratio in exact
  // millis — sample variance folds from integer power sums, the
  // overdispersion FLAG is the pure integer comparison
  // n·Σy² − (Σy)² > (n−1)·Σy (no float ever decides it).
  def q312OverdispersionCensus(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("y_sum"),
           sum(col("y") * col("y")).as("y_sq"))
      .select(col("event_type"), col("n_days"), col("y_sum"),
        expr("(1000 * y_sum) div n_days").as("mean_milli"),
        expr("(1000 * (n_days * y_sq - y_sum * y_sum)) div " +
          "((n_days - 1) * y_sum)").as("dispersion_milli"),
        when(col("n_days") * col("y_sq") - col("y_sum") * col("y_sum")
          > (col("n_days") - 1L) * col("y_sum"), 1L).otherwise(0L)
          .as("overdispersed"))
      .orderBy(col("event_type"))
  }

  val q312Sql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |prof AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(y) AS BIGINT) AS y_sum,
      |    CAST(sum(y * y) AS BIGINT) AS y_sq
      |  FROM daily GROUP BY event_type)
      |SELECT event_type, n_days, y_sum,
      |  (1000 * y_sum) // n_days AS mean_milli,
      |  (1000 * (n_days * y_sq - y_sum * y_sum))
      |    // ((n_days - 1) * y_sum) AS dispersion_milli,
      |  CAST(CASE WHEN n_days * y_sq - y_sum * y_sum
      |         > (n_days - 1) * y_sum THEN 1 ELSE 0 END AS BIGINT)
      |    AS overdispersed
      |FROM prof
      |ORDER BY event_type""".stripMargin

  // ─── q315: two-proportion A/B census with Wilson intervals ────────────
  // The conversion-rate comparison every experiment readout leads with:
  // per event-type cohort split (user_id parity as the deterministic
  // A/B assignment), the share of users who go on to purchase, with
  // WILSON score intervals (Wilson 1927 — the interval that behaves at
  // small n and extreme p, unlike the Wald interval textbooks warn
  // about) and the pooled two-proportion z. Bounds and z are computed
  // from exact integer (conversions, cohort size) pairs, quantized to
  // micros after the closed forms (sqrt/division on integer-derived
  // doubles — identical IEEE both engines, the q271 discipline).
  //
  // Scale: one per-user reduction (first event type per user = the
  // exposure; any purchase = conversion), one |types|×2 aggregate;
  // everything after is enum-sized arithmetic.
  def q315AbWilson(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val users = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("et"))
      .withColumn("rn", row_number().over(w))
      .withColumn("conv",
        max(when(col("et") === "purchase", 1L).otherwise(0L))
          .over(Window.partitionBy("user_id")))
      .where(col("rn") === 1 && col("et") =!= "purchase")
      .select(col("et").as("exposure"),
        (col("user_id") % 2).as("cohort"), col("conv"))
    val cells = users.groupBy(col("exposure"), col("cohort"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    def wilson(x: Column, n: Column, upper: Boolean): Column = {
      val z2 = lit(3.84145882) // z² for z = 1.959964 (95%), fixed literal
      val p = x.cast("double") / n.cast("double")
      val den = lit(1.0) + z2 / n.cast("double")
      val centre = p + z2 / (lit(2.0) * n.cast("double"))
      val rad = sqrt(z2) * sqrt(p * (lit(1.0) - p) / n.cast("double")
        + z2 / (lit(4.0) * n.cast("double") * n.cast("double")))
      val bound = if (upper) (centre + rad) / den else (centre - rad) / den
      round(round(bound, 9) * lit(1e6)).cast("long")
    }
    val ab = cells.groupBy(col("exposure"))
      .agg(min(when(col("cohort") === 0L, col("n"))).as("n_a"),
           min(when(col("cohort") === 0L, col("x"))).as("x_a"),
           min(when(col("cohort") === 1L, col("n"))).as("n_b"),
           min(when(col("cohort") === 1L, col("x"))).as("x_b"))
    ab.select(col("exposure"), col("n_a"), col("x_a"), col("n_b"),
        col("x_b"),
        wilson(col("x_a"), col("n_a"), upper = false).as("a_lo_micro"),
        wilson(col("x_a"), col("n_a"), upper = true).as("a_hi_micro"),
        wilson(col("x_b"), col("n_b"), upper = false).as("b_lo_micro"),
        wilson(col("x_b"), col("n_b"), upper = true).as("b_hi_micro"),
        {
          val pp = (col("x_a") + col("x_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double")
          val se = sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a").cast("double")
              + lit(1.0) / col("n_b").cast("double")))
          // a degenerate pool (zero or unanimous conversions) has se = 0
          // and z undefined — pinned to 0, and guarded BEFORE the divide
          // because ANSI mode raises on double division by zero
          when(col("x_a") + col("x_b") === 0L ||
               col("x_a") + col("x_b") === col("n_a") + col("n_b"),
            lit(0L))
            .otherwise(round(round(
              (col("x_a").cast("double") / col("n_a")
                - col("x_b").cast("double") / col("n_b")) / se, 9)
              * lit(1e6)).cast("long")).as("z_micro")
        })
      .orderBy(col("exposure"))
  }

  val q315Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type AS et
      |  FROM events),
      |users AS MATERIALIZED (
      |  SELECT et AS exposure, user_id % 2 AS cohort, conv FROM (
      |    SELECT user_id, et,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS rn,
      |      max(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id) AS conv
      |    FROM e)
      |  WHERE rn = 1 AND et <> 'purchase'),
      |cells AS (
      |  SELECT exposure, cohort, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(conv) AS BIGINT) AS x
      |  FROM users GROUP BY exposure, cohort),
      |ab AS (
      |  SELECT exposure,
      |    min(CASE WHEN cohort = 0 THEN n END) AS n_a,
      |    min(CASE WHEN cohort = 0 THEN x END) AS x_a,
      |    min(CASE WHEN cohort = 1 THEN n END) AS n_b,
      |    min(CASE WHEN cohort = 1 THEN x END) AS x_b
      |  FROM cells GROUP BY exposure)
      |SELECT exposure, n_a, x_a, n_b, x_b,
      |  CAST(round(round(((CAST(x_a AS DOUBLE)/n_a
      |      + 3.84145882/(2.0*n_a))
      |    - sqrt(3.84145882) * sqrt((CAST(x_a AS DOUBLE)/n_a)
      |        * (1.0 - CAST(x_a AS DOUBLE)/n_a) / n_a
      |        + 3.84145882/(4.0*CAST(n_a AS DOUBLE)*n_a)))
      |    / (1.0 + 3.84145882/n_a), 9) * 1e6) AS BIGINT) AS a_lo_micro,
      |  CAST(round(round(((CAST(x_a AS DOUBLE)/n_a
      |      + 3.84145882/(2.0*n_a))
      |    + sqrt(3.84145882) * sqrt((CAST(x_a AS DOUBLE)/n_a)
      |        * (1.0 - CAST(x_a AS DOUBLE)/n_a) / n_a
      |        + 3.84145882/(4.0*CAST(n_a AS DOUBLE)*n_a)))
      |    / (1.0 + 3.84145882/n_a), 9) * 1e6) AS BIGINT) AS a_hi_micro,
      |  CAST(round(round(((CAST(x_b AS DOUBLE)/n_b
      |      + 3.84145882/(2.0*n_b))
      |    - sqrt(3.84145882) * sqrt((CAST(x_b AS DOUBLE)/n_b)
      |        * (1.0 - CAST(x_b AS DOUBLE)/n_b) / n_b
      |        + 3.84145882/(4.0*CAST(n_b AS DOUBLE)*n_b)))
      |    / (1.0 + 3.84145882/n_b), 9) * 1e6) AS BIGINT) AS b_lo_micro,
      |  CAST(round(round(((CAST(x_b AS DOUBLE)/n_b
      |      + 3.84145882/(2.0*n_b))
      |    + sqrt(3.84145882) * sqrt((CAST(x_b AS DOUBLE)/n_b)
      |        * (1.0 - CAST(x_b AS DOUBLE)/n_b) / n_b
      |        + 3.84145882/(4.0*CAST(n_b AS DOUBLE)*n_b)))
      |    / (1.0 + 3.84145882/n_b), 9) * 1e6) AS BIGINT) AS b_hi_micro,
      |  CAST(CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0
      |    ELSE round(round((CAST(x_a AS DOUBLE)/n_a
      |        - CAST(x_b AS DOUBLE)/n_b)
      |      / sqrt((CAST(x_a + x_b AS DOUBLE)/(n_a + n_b))
      |          * (1.0 - CAST(x_a + x_b AS DOUBLE)/(n_a + n_b))
      |          * (1.0/n_a + 1.0/n_b)), 9) * 1e6)
      |    END AS BIGINT) AS z_micro
      |FROM ab
      |ORDER BY exposure""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q305_neyman_sample" -> (q305NeymanSample _),
    "q309_next_event_backtest" -> (q309NextEventBacktest _),
    "q315_ab_wilson" -> (q315AbWilson _),
    "q310_bh_screen" -> (q310BhScreen _),
    "q311_sequential_rules" -> (q311SequentialRules _),
    "q312_overdispersion" -> (q312OverdispersionCensus _),
    "q298_markov_attribution" -> (q298MarkovAttribution _),
    "q299_holt_backtest" -> (q299HoltBacktest _),
    "q300_dp_histogram" -> (q300DpHistogram _),
    "q292_weighted_percentiles" -> (q292WeightedPercentiles _),
    "q289_pvm_bridge" -> (q289PvmBridge _),
    "q288_robust_means" -> (q288RobustMeans _),
    "q286_entropy_rate" -> (q286EntropyRate _),
    "q279_moments_census" -> (q279MomentsCensus _),
    "q280_conversion_latency" -> (q280ConversionLatency _),
    "q275_poisson_bootstrap" -> (q275PoissonBootstrap _),
    "q277_ks_test" -> (q277KsTest _),
    "q269_journey_paths" -> (q269JourneyPaths _),
    "q271_mann_whitney" -> (q271MannWhitney _),
    "q263_forecast_backtest" -> (q263ForecastBacktest _),
    "q262_kaplan_meier" -> (q262KaplanMeier _),
    "q252_k_anonymity" -> (q252KAnonymity _),
    "q234_seasonal_mad" -> (q234SeasonalMad _),
    "q201_conversion_funnel" -> (q201ConversionFunnel _),
    "q202_locf_gap_fill"    -> (q202LocfGapFill _),
    "q196_cohens_kappa"     -> ((s, d) => q196CohensKappa(s, d)),
    "q191_feature_scaling"  -> (q191FeatureScaling _),
    "q192_target_encoding"  -> (q192TargetEncoding _),
    "q193_temporal_split"   -> (q193TemporalSplit _),
    "q190_equidepth_hist"   -> ((s, d) => q190EquidepthHist(s, d)),
    "q197_equidepth_sketch" -> (q197EquidepthSketch _),
    "q184_regr_full"        -> (q184RegrFull _),
    "q185_linear_attribution" -> (q185LinearAttribution _),
    "q186_column_profile"   -> (q186ColumnProfile _),
    "q182_skyline"          -> (q182Skyline _),
    "q177_attribution"      -> (q177Attribution _),
    "q178_cusum_changepoint" -> (q178CusumChangepoint _),
    "q179_decayed_engagement" -> (q179DecayedEngagement _),
    "q180_path_mining"      -> (q180PathMining _),
    "q172_interpurchase_gaps" -> ((s, d) => q172InterpurchaseGaps(s, d)),
    "q173_psi_drift"        -> ((s, d) => q173PsiDrift(s, d)),
    "q174_ks_test"          -> (q174KsTest _),
    "q175_gini"             -> (q175Gini _),
    "q176_acf"              -> (q176Acf _),
    "q162_cohort_retention" -> (q162CohortRetention _),
    "q163_basket_affinity"  -> (q163BasketAffinity _),
    "q164_rfm_segments"     -> (q164RfmSegments _),
    "q165_markov_transitions" -> (q165MarkovTransitions _),
    "q166_iqr_outliers"     -> ((s, d) => q166IqrOutliers(s, d)),
    "q167_chisq_independence" -> (q167ChisqIndependence _),
    "q168_benford_screen"   -> (q168BenfordScreen _),
    "q169_entropy_profile"  -> (q169EntropyProfile _),
  )

  val oracleSql: Map[String, String] = Map(
    "q305_neyman_sample" -> q305Sql,
    "q309_next_event_backtest" -> q309Sql,
    "q310_bh_screen" -> q310Sql,
    "q315_ab_wilson" -> q315Sql,
    "q311_sequential_rules" -> q311Sql,
    "q312_overdispersion" -> q312Sql,
    "q298_markov_attribution" -> q298Sql,
    "q299_holt_backtest" -> q299Sql,
    "q300_dp_histogram" -> q300Sql,
    "q275_poisson_bootstrap" -> q275Sql,
    "q277_ks_test" -> q277Sql,
    "q292_weighted_percentiles" -> q292Sql,
    "q289_pvm_bridge" -> q289Sql,
    "q288_robust_means" -> q288Sql,
    "q286_entropy_rate" -> q286Sql,
    "q279_moments_census" -> q279Sql,
    "q280_conversion_latency" -> q280Sql,
    "q269_journey_paths" -> q269Sql,
    "q271_mann_whitney" -> q271Sql,
    "q263_forecast_backtest" -> q263Sql,
    "q262_kaplan_meier" -> q262Sql,
    "q252_k_anonymity" -> q252Sql,
    "q234_seasonal_mad" -> q234Sql,
    "q201_conversion_funnel" -> q201Sql,
    "q202_locf_gap_fill"    -> q202Sql,
    "q196_cohens_kappa"     -> q196Sql,
    "q191_feature_scaling"  -> q191Sql,
    "q192_target_encoding"  -> q192Sql,
    "q193_temporal_split"   -> q193Sql,
    "q190_equidepth_hist"   -> q190Sql,
    "q197_equidepth_sketch" -> q197Sql,
    "q184_regr_full"        -> q184Sql,
    "q185_linear_attribution" -> q185Sql,
    "q186_column_profile"   -> q186Sql,
    "q182_skyline"          -> q182Sql,
    "q177_attribution"      -> q177Sql,
    "q178_cusum_changepoint" -> q178Sql,
    "q179_decayed_engagement" -> q179Sql,
    "q180_path_mining"      -> q180Sql,
    "q172_interpurchase_gaps" -> q172Sql,
    "q173_psi_drift"        -> q173Sql,
    "q174_ks_test"          -> q174Sql,
    "q175_gini"             -> q175Sql,
    "q176_acf"              -> q176Sql,
    "q162_cohort_retention" -> q162Sql,
    "q163_basket_affinity"  -> q163Sql,
    "q164_rfm_segments"     -> q164Sql,
    "q165_markov_transitions" -> q165Sql,
    "q166_iqr_outliers"     -> q166Sql,
    "q167_chisq_independence" -> q167Sql,
    "q168_benford_screen"   -> q168Sql,
    "q169_entropy_profile"  -> q169Sql,
  )
}
