package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O11–O13: the reference's merge family, set-based.
  *
  * The reference executes these row-at-a-time against PostgreSQL:
  *  - O11 get-or-insert surrogate keys (course_catalog.py:65–87): SELECT id
  *    by natural key, INSERT RETURNING if absent — 1–2 round-trips per row.
  *  - O12 insert-if-absent (`ON CONFLICT DO NOTHING`, course_catalog.py:99):
  *    first-writer-wins, the existing row is never updated.
  *  - O13 latest-wins upsert (`ON CONFLICT DO UPDATE`,
  *    user_course_activity.py:73–102): incoming beats existing on the
  *    composite key.
  *
  * Spark-first, each is ONE set-based pass: anti-join for novelty, window
  * over the natural key for id assignment, union+window for the merge —
  * a single shuffle keyed on the merge key, no per-row round-trips. The
  * merge inputs are modeled over testdata (existing = one orders slice,
  * incoming = a perturbed overlapping slice) so the DuckDB oracle can
  * replay the identical semantics.
  */
object Merge {

  /** Deterministic dense ids 1..N in ascending `keyCol` order over a
    * DISTINCT-key frame — the surrogate-key kernel for O11 and the
    * catalog dimensions.
    *
    * Dimension-sized inputs (≤ `maxWindowKeys`) use a global
    * `row_number` window: ONE single-partition task over the distinct
    * key set, which is fine precisely because dimensions are small
    * (10^2..10^6 rows) and the fact table never enters this plan. The
    * guard makes that assumption EXPLICIT: past the threshold the same
    * ids come from sort + `zipWithIndex` — a range-partitioned sort
    * followed by a per-partition index, so no task ever holds the whole
    * key set. Both paths produce the identical id ↔ key mapping (the
    * rank in ascending key order); MergeSpec proves it at an adversarial
    * cardinality.
    *
    * The input is cached before the cardinality probe: the probe's
    * count() materializes the distinct once, and the id-assignment pass
    * (either path) then reads the cached keys instead of recomputing the
    * upstream distinct — without this, the probe DOUBLED the fact-side
    * shuffle (q38 went 0.5 s → 1.6 s at sf0.1). Cache lifecycle is
    * caller-owned, like q45's shingles (Bench/Verify clearCache per
    * query).
    */
  def denseIds(distinctKeys: DataFrame, keyCol: String): DataFrame =
    denseIds(distinctKeys, Seq(keyCol), 4L << 20)

  def denseIds(distinctKeys: DataFrame, keyCol: String,
               maxWindowKeys: Long): DataFrame =
    denseIds(distinctKeys, Seq(keyCol), maxWindowKeys)

  /** Composite-key form. `keyCols` must be UNIQUE over the frame (the
    * determinism contract: row_number over a non-unique ordering would
    * tie-break by partition layout) — pass every column that makes the
    * distinct key, e.g. (title, url) for the catalog dimensions.
    *
    * This form relies on the session to release the internal probe
    * cache (Bench/Verify `clearCache` per query). Long-lived sessions
    * should use [[denseIdsManaged]] and call `release()` once the ids
    * are materialized, or the probe frames accumulate pinned storage.
    */
  def denseIds(distinctKeys: DataFrame, keyCols: Seq[String],
               maxWindowKeys: Long = 4L << 20): DataFrame =
    denseIdsManaged(distinctKeys, keyCols, maxWindowKeys).df

  /** An id frame plus the handle that releases the cache(s) backing it.
    * Call `release()` only AFTER the frame is materialized (written,
    * collected, or re-cached) — the frame reads the cache lazily, so an
    * early release silently recomputes the upstream distinct instead.
    */
  final case class ManagedFrame(df: DataFrame, release: () => Unit)

  def denseIdsManaged(distinctKeys: DataFrame, keyCols: Seq[String],
                      maxWindowKeys: Long = 4L << 20): ManagedFrame = {
    val order = keyCols.map(col)
    val cached = distinctKeys.cache()
    val n = cached.count()
    if (n <= maxWindowKeys) {
      val ids = cached.withColumn("id",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      ManagedFrame(ids, () => { cached.unpersist(); () })
    } else {
      // Partition-offset two-pass, entirely in Tungsten (the r4 form
      // dropped to `sorted.rdd.zipWithIndex`, deserializing every key
      // through Row):
      //  1. range-sort once and STAMP each row with
      //     monotonically_increasing_id, whose documented layout is
      //     (partitionIndex << 33) | localRowIndex. The stamped frame is
      //     cached: both passes must read ONE physical materialization —
      //     a re-run of the range sort may re-sample partition boundaries
      //     and permute the stamps.
      //  2. per-partition counts → cumulative offsets (driver-side: one
      //     row per partition, the same reduction zipWithIndex runs) are
      //     broadcast back and repaired: id = offset(pid) + local + 1.
      // No task ever holds the whole key set, and rows never leave
      // UnsafeRow until the caller acts.
      val sp = cached.sparkSession
      import sp.implicits._
      val stamped = cached.orderBy(order: _*)
        .withColumn("mid", monotonically_increasing_id())
        .cache()
      val pid = shiftright(col("mid"), 33).cast("int")
      val loc = col("mid").bitwiseAND((1L << 33) - 1)
      val counts = stamped.groupBy(pid.as("pid")).agg(count(lit(1)).as("c"))
        .select(col("pid"), col("c")).as[(Int, Long)].collect()
        .sortBy(_._1)
      val offsets = counts.scanLeft((0, 0L)) {
        case ((_, acc), (p, c)) => (p, acc + c)
      } // (p_i, rows at or before p_i); offset(p_i) = previous entry's acc
      val offDf = counts.map(_._1).zip(offsets.map(_._2))
        .toSeq.toDF("pid", "off")
      val ids = stamped.withColumn("pid", pid)
        .join(broadcast(offDf), Seq("pid"))
        .withColumn("id", col("off") + loc + 1L)
        .select(cached.columns.toIndexedSeq.map(col) :+ col("id"): _*)
      ManagedFrame(ids,
        () => { stamped.unpersist(); cached.unpersist(); () })
    }
  }

  // ─── q38: surrogate-key dimension build (O11) ─────────────────────────
  // Natural key = order month. Existing dim = months before 1999 (testdata
  // spans 1995-2001, so existing = 1995-1998 and new keys = 1999-2001,
  // exercising both the known-key and fresh-key branches) with ids
  // assigned by row_number over the key (deterministic — SURVEY §7.3 rules
  // out monotonically_increasing_id, which is partition-layout-dependent).
  // Incoming = all months. New keys get maxId + row_number(new natural
  // keys). The global-ordering window runs on the DISTINCT key set, which
  // is dimension-sized (10^2..10^6 rows), not fact-sized — that is what
  // makes a single-partition window acceptable here even at 100 TB fact
  // scale; the fact table itself never enters this plan.
  def q38SurrogateKeys(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val monthOf = date_trunc("month", col("o_orderdate"))
    val existing = denseIds(
      o.where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(monthOf.as("month_key")).distinct(),
      "month_key")
    val incoming = o.select(monthOf.as("month_key")).distinct()
    val maxId = existing.agg(coalesce(max(col("id")), lit(0L)).as("max_id"))
    val newKeys = denseIds(
        incoming.join(existing.select(col("month_key")), Seq("month_key"), "left_anti"),
        "month_key")
      .withColumnRenamed("id", "rn")
      .crossJoin(broadcast(maxId)) // 1-row broadcast, not a real cartesian
      .select(col("month_key"), (col("max_id") + col("rn")).as("id"))
    existing.withColumn("is_new", lit(false))
      .unionByName(newKeys.withColumn("is_new", lit(true)))
      .select(col("id"), col("month_key"), col("is_new"))
      .orderBy(col("id"))
  }

  val q38Sql: String =
    """WITH existing AS (
      |  SELECT month_key,
      |    CAST(row_number() OVER (ORDER BY month_key) AS BIGINT) AS id
      |  FROM (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
      |          AS month_key
      |        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00')),
      |incoming AS (
      |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
      |    AS month_key FROM orders),
      |new_keys AS (
      |  SELECT month_key,
      |    CAST((SELECT coalesce(max(id), 0) FROM existing)
      |         + row_number() OVER (ORDER BY month_key) AS BIGINT) AS id
      |  FROM incoming
      |  WHERE month_key NOT IN (SELECT month_key FROM existing))
      |SELECT id, month_key, FALSE AS is_new FROM existing
      |UNION ALL SELECT id, month_key, TRUE AS is_new FROM new_keys
      |ORDER BY id""".stripMargin

  /** Existing slice: orders whose key is not divisible by 3. */
  private def existingOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).where(pmod(col("o_orderkey"), lit(3)) =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"),
              lit("existing").as("src"))

  /** Incoming slice: even keys, price revised by an exactly-representable
    * +1.0 (a ×1.1 revision diverges between engines on round-half ties) —
    * overlaps existing on keys ≡ 2,4 (mod 6), brings new keys ≡ 0 (mod 6).
    */
  private def incomingOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
              (col("o_totalprice") + 1.0).as("o_totalprice"),
              lit("incoming").as("src"))

  private val existingSqlCte: String =
    """existing AS (
      |  SELECT o_orderkey, o_totalprice, 'existing' AS src
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |incoming AS (
      |  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice,
      |         'incoming' AS src
      |  FROM orders WHERE o_orderkey % 2 = 0)""".stripMargin

  // ─── q39: insert-if-absent, first-writer-wins (O12) ───────────────────
  // existing ∪ (incoming ∖ existing on the key): an anti-join keyed on the
  // conflict key. The anti-join shuffles only the key column of existing
  // against incoming — first-writer rows are never rewritten, exactly
  // `ON CONFLICT DO NOTHING`.
  def q39InsertIfAbsent(s: SparkSession, d: String): DataFrame = {
    val existing = existingOrders(s, d)
    val incoming = incomingOrders(s, d)
    existing.unionByName(
        incoming.join(existing.select(col("o_orderkey")),
                      Seq("o_orderkey"), "left_anti"))
      .orderBy(col("o_orderkey"))
  }

  val q39Sql: String =
    s"""WITH $existingSqlCte
       |SELECT o_orderkey, o_totalprice, src FROM existing
       |UNION ALL
       |SELECT o_orderkey, o_totalprice, src FROM incoming
       |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM existing)
       |ORDER BY o_orderkey""".stripMargin

  // ─── q40: latest-wins upsert (O13) ────────────────────────────────────
  // `ON CONFLICT DO UPDATE SET … = EXCLUDED.…` without a mutable table:
  // union both sides with a recency rank, keep row_number()==1 per key
  // ordering incoming first. ONE shuffle keyed on the conflict key; works
  // unchanged if incoming carries multiple versions per key (extend the
  // orderBy with a version column). This is the scale-correct form of the
  // reference's per-row upsert loop.
  def q40UpsertLatestWins(s: SparkSession, d: String): DataFrame = {
    val unioned = incomingOrders(s, d).withColumn("pri", lit(1))
      .unionByName(existingOrders(s, d).withColumn("pri", lit(0)))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("pri").desc)
    unioned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("src"))
      .orderBy(col("o_orderkey"))
  }

  val q40Sql: String =
    s"""WITH $existingSqlCte,
       |unioned AS (
       |  SELECT *, 1 AS pri FROM incoming
       |  UNION ALL SELECT *, 0 AS pri FROM existing)
       |SELECT o_orderkey, o_totalprice, src FROM (
       |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |                               ORDER BY pri DESC) AS rn
       |  FROM unioned)
       |WHERE rn = 1
       |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_surrogate_keys"    -> (q38SurrogateKeys _),
    "q39_insert_if_absent"  -> (q39InsertIfAbsent _),
    "q40_upsert_latest_wins" -> (q40UpsertLatestWins _),
  )

  val oracleSql: Map[String, String] = Map(
    "q38_surrogate_keys"    -> q38Sql,
    "q39_insert_if_absent"  -> q39Sql,
    "q40_upsert_latest_wins" -> q40Sql,
  )
}
