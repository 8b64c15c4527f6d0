package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column}

/** Skew mitigation by salting (build-brief "skewed keys → salting or AQE
  * skew-join").
  *
  * When one group key dominates (power-law keys at 100 TB), a plain
  * groupBy sends the whole hot key to one reducer. Salting splits each
  * key into `SALTS` sub-keys for the first (wide, parallel) aggregation,
  * then a second aggregation over the tiny per-salt partials removes the
  * salt. The result is EXACTLY the unsalted aggregate — which is what the
  * DuckDB oracle twin computes directly. (Quantities are integral, so the
  * re-associated double sums are exact; the technique composes with any
  * algebraic aggregate.)
  *
  * AQE's skew-join handling covers the JOIN case automatically; explicit
  * salting remains the lever for skewed AGGREGATION keys like this.
  */
object Skew {

  private val SALTS = 16

  def q61SaltedAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(SALTS)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("partial_qty"),
           count(lit(1)).as("partial_n"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("partial_qty")), 2).as("sum_qty"),
           sum(col("partial_n")).as("n"))
      .orderBy(col("l_returnflag"))

  val q61Sql: String =
    """SELECT l_returnflag,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ─── q132: Z-ORDER clustering — multi-dimensional data skipping ──────
  // The layout lever behind Delta's OPTIMIZE ZORDER BY and Iceberg's
  // sort orders: interleave the bits of two quantized dimensions into a
  // Morton key and lay files out in key ranges, so each file's bounding
  // box is TIGHT IN BOTH dimensions and a 2-D box predicate prunes most
  // files from their min/max footer stats. A single-column sort gives
  // tight boxes in ONE dimension and full-range boxes in the other —
  // box queries touch almost every file.
  //
  // The query MEASURES that: orders quantized to an 8-bit (date ×
  // price) grid, bucketed 64 ways two ways — by Morton key vs by date
  // alone (ntile over a total order with a unique tiebreak, so both
  // engines bucket identically) — then counts how many buckets' bboxes
  // intersect a fixed 2-D box predicate. Output: 2 rows (layout,
  // buckets touched, rows in touched buckets) — the skipping win as
  // data, engine-checkable. The interleave is literal shift/mask
  // arithmetic generated per engine from one Scala loop (codegen'd
  // projection, no UDF).
  //
  // 100 TB notes: ntile here stands in for repartitionByRange(zkey) +
  // one file per partition — the same global range layout Spark writes
  // at scale (sampled boundaries; the measurement is identical). The
  // quantization grid is STATIC (schema-derived bounds), so the Morton
  // key is a pure per-row projection: layout jobs need one pass + one
  // range shuffle, never a global min/max pre-pass.
  private val ZBits = 8
  private val ZBuckets = 64

  /** Morton interleave of two [0,255] ints, as engine SQL text. */
  private def morton(xCol: String, yCol: String,
                     shr: (String, Int) => String): String =
    (0 until ZBits).flatMap { b =>
      Seq(s"(${shr(xCol, b)} & 1) * ${1L << (2 * b)}",
          s"(${shr(yCol, b)} & 1) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")

  def q132ZOrder(s: SparkSession, d: String): DataFrame = {
    // 8-bit grid: date = days since epoch div 10 (1992–98 ⇒ 0..255),
    // price div 2400 (max ~600k ⇒ 0..250); both clamped defensively
    val base = orders(s, d).select(
      col("o_orderkey"),
      least(lit(255), floor(datediff(col("o_orderdate"),
        lit("1992-01-01").cast("date")) / 10).cast("int")).as("qx"),
      least(lit(255), floor(col("o_totalprice") / 2400).cast("int")).as("qy"))
    // checkpointed once: both layout pipelines (bounds, positions,
    // offsets) read one materialization instead of re-scanning orders
    val keyed = base
      .withColumn("zkey",
        expr(morton("qx", "qy", (c, b) => s"shiftright($c, $b)")))
      .localCheckpoint()
    // r15 (guide §2.5): the 64-way layout assignment was a GLOBAL ntile
    // window over the full fact — the entire orders table moved to ONE
    // partition per layout. Now [[Windows.ntileScaled]]: identical
    // bucket assignment (total order via the o_orderkey tiebreak), no
    // single-partition sort. The oracle twin still says ntile.
    def layout(name: String, ordCol: Column) = {
      Windows.ntileScaled(keyed, ordCol,
          Seq(ordCol, col("o_orderkey")), ZBuckets, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("qx")).as("x0"), max(col("qx")).as("x1"),
             min(col("qy")).as("y0"), max(col("qy")).as("y1"))
        // the probe box: does this bucket's bbox intersect it?
        .withColumn("touched",
          col("x1") >= 60 && col("x0") <= 200 &&
          col("y1") >= 80 && col("y0") <= 120)
        .agg(count(lit(1)).as("n_buckets"),
             count(when(col("touched"), 1)).as("buckets_touched"),
             sum(when(col("touched"), col("n")).otherwise(0))
               .as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_buckets"),
                col("buckets_touched"), col("rows_scanned"))
    }
    layout("linear", col("qx"))
      .unionAll(layout("zorder", col("zkey")))
      .orderBy(col("layout"))
  }

  val q132Sql: String = {
    // the extra "& 1" the template adds around an already-masked shr is
    // a harmless identity (x & 1 & 1 = x & 1)
    val z = morton("qx", "qy", (c, b) => s"($c >> $b)")
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    least(255, CAST(floor(datediff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) / 10) AS INT)) AS qx,
       |    least(255, CAST(floor(o_totalprice / 2400) AS INT)) AS qy
       |  FROM orders),
       |keyed AS (SELECT *, $z AS zkey FROM base),
       |layouts AS (
       |  SELECT 'linear' AS layout, ntile(64) OVER (ORDER BY qx, o_orderkey)
       |    AS bucket, qx, qy FROM keyed
       |  UNION ALL
       |  SELECT 'zorder', ntile(64) OVER (ORDER BY zkey, o_orderkey),
       |    qx, qy FROM keyed),
       |boxes AS (
       |  SELECT layout, bucket, count(*) AS n,
       |    min(qx) AS x0, max(qx) AS x1, min(qy) AS y0, max(qy) AS y1
       |  FROM layouts GROUP BY layout, bucket)
       |SELECT layout, count(*) AS n_buckets,
       |  count(CASE WHEN x1 >= 60 AND x0 <= 200
       |             AND y1 >= 80 AND y0 <= 120 THEN 1 END)
       |    AS buckets_touched,
       |  CAST(sum(CASE WHEN x1 >= 60 AND x0 <= 200
       |             AND y1 >= 80 AND y0 <= 120 THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_scanned
       |FROM boxes
       |GROUP BY layout
       |ORDER BY layout""".stripMargin
  }

  // ─── q291: Hilbert-curve layout vs z-order vs linear ──────────────────
  // q132's census extended with the space-filling curve z-order
  // approximates: along the HILBERT walk every consecutive cell is
  // plane-adjacent (Manhattan distance 1 — the property StorageSpec
  // proves for the kernel by full enumeration), while the Z walk jumps
  // across the key space at every quadrant boundary — so
  // Hilbert-clustered file bounding boxes are tighter and a 2-D box
  // predicate touches fewer of them. Same 8-bit (date × price) grid,
  // same 64-way ntile layout, same probe box, THREE layouts side by
  // side — the ranking emitted as data, oracle-recomputed (the oracle
  // evaluates the curve by unrolling the 8-level rotate-and-accumulate
  // state machine as chained CTEs; the Spark side is the native codegen
  // expression expr/HilbertIndex.scala, #10). The 16-bit kernel on
  // 8-bit inputs reduces EXACTLY to the 8-level curve: each empty
  // leading level adds 0 to d and one x↔y swap, and 8 swaps are the
  // identity.
  def q291HilbertLayout(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      col("o_orderkey"),
      least(lit(255), floor(datediff(col("o_orderdate"),
        lit("1992-01-01").cast("date")) / 10).cast("int")).as("qx"),
      least(lit(255), floor(col("o_totalprice") / 2400).cast("int")).as("qy"))
    // checkpointed once: all three layout pipelines read one
    // materialization (see q132's r15 note — same global-ntile fix)
    val keyed = base
      .withColumn("zkey",
        expr(morton("qx", "qy", (c, b) => s"shiftright($c, $b)")))
      .withColumn("hkey", graft.expr.HilbertFunctions.hilbert_index(
        col("qx").cast("long"), col("qy").cast("long")))
      .localCheckpoint()
    def layout(name: String, ordCol: Column) = {
      Windows.ntileScaled(keyed, ordCol,
          Seq(ordCol, col("o_orderkey")), ZBuckets, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("qx")).as("x0"), max(col("qx")).as("x1"),
             min(col("qy")).as("y0"), max(col("qy")).as("y1"))
        .withColumn("touched",
          col("x1") >= 60 && col("x0") <= 200 &&
          col("y1") >= 80 && col("y0") <= 120)
        .agg(count(lit(1)).as("n_buckets"),
             count(when(col("touched"), 1)).as("buckets_touched"),
             sum(when(col("touched"), col("n")).otherwise(0))
               .as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_buckets"),
                col("buckets_touched"), col("rows_scanned"))
    }
    layout("hilbert", col("hkey"))
      .unionAll(layout("linear", col("qx")))
      .unionAll(layout("zorder", col("zkey")))
      .orderBy(col("layout"))
  }

  val q291Sql: String = {
    val z = morton("qx", "qy", (c, b) => s"($c >> $b)")
    // unrolled 8-level Hilbert state machine: per level s, classify the
    // quadrant, accumulate d, reflect-and-swap the frame
    val steps = (0 until ZBits).map { k =>
      val s = 1 << (ZBits - 1 - k)
      val p = k      // previous stage suffix
      val n = k + 1  // this stage suffix
      s"""h$n AS (
         |  SELECT o_orderkey, zkey, qx, qy,
         |    d$p + ${s.toLong * s} * xor(3 * rx, ry) AS d$n,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN $s - 1 - y$p ELSE y$p END
         |    ELSE x$p END AS x$n,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN $s - 1 - x$p ELSE x$p END
         |    ELSE y$p END AS y$n
         |  FROM (SELECT *,
         |          CASE WHEN (x$p & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (y$p & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM h$p))""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    least(255, CAST(floor(datediff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) / 10) AS INT)) AS qx,
       |    least(255, CAST(floor(o_totalprice / 2400) AS INT)) AS qy
       |  FROM orders),
       |h0 AS (SELECT o_orderkey, qx, qy, $z AS zkey,
       |         CAST(0 AS BIGINT) AS d0, qx AS x0, qy AS y0 FROM base),
       |$steps,
       |keyed AS (SELECT o_orderkey, qx, qy, zkey, d$ZBits AS hkey
       |          FROM h$ZBits),
       |layouts AS (
       |  SELECT 'hilbert' AS layout,
       |    ntile($ZBuckets) OVER (ORDER BY hkey, o_orderkey) AS bucket,
       |    qx, qy FROM keyed
       |  UNION ALL
       |  SELECT 'linear', ntile($ZBuckets) OVER (ORDER BY qx, o_orderkey),
       |    qx, qy FROM keyed
       |  UNION ALL
       |  SELECT 'zorder', ntile($ZBuckets) OVER (ORDER BY zkey, o_orderkey),
       |    qx, qy FROM keyed),
       |boxes AS (
       |  SELECT layout, bucket, count(*) AS n,
       |    min(qx) AS x0, max(qx) AS x1, min(qy) AS y0, max(qy) AS y1
       |  FROM layouts GROUP BY layout, bucket)
       |SELECT layout, count(*) AS n_buckets,
       |  count(CASE WHEN x1 >= 60 AND x0 <= 200
       |             AND y1 >= 80 AND y0 <= 120 THEN 1 END)
       |    AS buckets_touched,
       |  CAST(sum(CASE WHEN x1 >= 60 AND x0 <= 200
       |             AND y1 >= 80 AND y0 <= 120 THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_scanned
       |FROM boxes
       |GROUP BY layout
       |ORDER BY layout""".stripMargin
  }

  // ─── q246: salted SHUFFLE JOIN (the hot-key join at 100 TB) ───────────
  // q61 salts a skewed AGGREGATION; this salts the skewed JOIN — the
  // case where the dim is too big to broadcast (forced here with a
  // SHUFFLE_MERGE hint, since the fixture dim would auto-broadcast) and
  // one fact key dominates: a third of the fact collapses onto part 1
  // (planted: l_orderkey % 3). Unsalted, that key's entire mass lands on
  // ONE reducer of the shuffle join. The standard fix, exactly as a
  // cluster runs it: fact rows take a deterministic salt in [0, SALTS)
  // (a pure function of the row's own keys — no rand(), the engine's
  // reproducibility rule), the dim REPLICATES SALTS× via explode, and
  // the join keys on (key, salt) — the hot key now spreads across SALTS
  // reducers at the price of a SALTS× dim. The result is EXACTLY the
  // unsalted join (each fact row still matches its dim row exactly
  // once, under its own salt), which is what the oracle computes
  // directly — and what makes the technique oracle-checkable at all.
  def q246SaltedSkewJoin(s: SparkSession, d: String): DataFrame = {
    val fact = lineitem(s, d).select(
      when(col("l_orderkey") % 3 === 0, 1L)
        .otherwise(col("l_partkey")).as("pk"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      pmod(col("l_orderkey") + col("l_linenumber"), lit(SALTS.toLong))
        .as("salt"))
    val dim = part(s, d).select(col("p_partkey").as("pk"), col("p_brand"))
      .withColumn("salt", explode(sequence(lit(0L), lit(SALTS - 1L))))
    fact.join(dim.hint("SHUFFLE_MERGE"), Seq("pk", "salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents_sum"))
      .orderBy(col("p_brand"))
  }

  val q246Sql: String =
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS cents_sum
      |FROM (
      |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1
      |              ELSE l_partkey END AS pk,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem) f
      |JOIN part p ON f.pk = p.p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_salted_agg" -> (q61SaltedAgg _),
    "q132_zorder"    -> (q132ZOrder _),
    "q291_hilbert_layout" -> (q291HilbertLayout _),
    "q246_salted_skew_join" -> (q246SaltedSkewJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q61_salted_agg" -> q61Sql,
    "q132_zorder"    -> q132Sql,
    "q291_hilbert_layout" -> q291Sql,
    "q246_salted_skew_join" -> q246Sql,
  )
}
