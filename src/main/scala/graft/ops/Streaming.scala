package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Streaming surface (SURVEY.md §2.2 "Streaming").
  *
  * The reference's ingest loop is a micro-batch stream (page = batch,
  * commit-per-page — course_catalog.py:204–212) with an incremental-refresh
  * contract (README.md:156–163). The engine's streaming story is Structured
  * Streaming; the transforms below are written against plain DataFrames so
  * the SAME code serves both modes:
  *  - batch: applied to the `events` table → oracle-checked queries
  *    q52–q54 (event-time windows are pure functions of `ts`, so batch and
  *    stream agree by construction);
  *  - stream: applied to a `readStream`/`MemoryStream` frame → covered by
  *    the ScalaTest streaming suite (watermark, late-data drop, stateful
  *    dedup, flatMapGroupsWithState upsert) where no SQL oracle can reach.
  *
  * Scale notes: event-time windowed aggregation shuffles by (window, key) —
  * at 100 TB the partial aggregation still combines map-side per window, so
  * the shuffle carries one partial buffer per (partition × window × key).
  * The sliding window multiplies rows by (length/slide) BEFORE the partial
  * agg — that ×4 fan-out happens inside the scan projection, never
  * materialized to the shuffle at full width.
  */
object Streaming {

  /** Tumbling 1-hour event-time window per event type. Works on batch and
    * streaming frames alike (add `withWatermark` upstream for streams).
    */
  def tumblingCounts(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** 30-minute-gap session windows per user. */
  def sessionAgg(df: DataFrame): DataFrame =
    df.groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /** Stateful dedup by event_id within the watermark horizon (streaming
    * twin of O12's first-writer-wins; state is purged past the watermark).
    */
  def dedupStream(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Dedup with BOUNDED state: `dropDuplicatesWithinWatermark` evicts a
    * key's state once the watermark passes its event time + delay, so
    * state size tracks the watermark horizon, not the all-time key count —
    * the difference between O(keys-in-window) and O(keys-ever) memory on
    * an unbounded 100 TB stream. The trade: a duplicate arriving after
    * its key's state expired is re-emitted (exactly-once only within the
    * horizon), which is the correct contract when upstream retries are
    * time-bounded (the reference's page retry window, course_catalog.py
    * retry loop, is seconds — far inside any reasonable horizon).
    */
  def dedupStreamBounded(df: DataFrame): DataFrame =
    df.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup dedup: the continuous-ingest twin of the batch
    * SimHash family (q46/q68). The doc's 32-bit SimHash fingerprint is a
    * STATELESS projection (native codegen expression — no explode, no
    * aggregation), so the only stateful operator is the bounded dedup on
    * the fingerprint: state is one 32-bit key per distinct fingerprint
    * inside the watermark horizon, evicted past it — O(docs-in-window)
    * memory on an unbounded stream. Near-identical docs collide on the
    * exact fingerprint with high probability (each differing token can
    * flip a bit-sum only near zero); docs differing beyond near-dup
    * distance virtually never do. The trade vs batch q68: no banded
    * hamming join (streaming state lookups are exact-key), so recall is
    * fingerprint-exact only — the right first gate in front of a
    * periodic batch near-dup compaction. Expects (doc_id, ts, text).
    */
  def nearDupDedupStream(df: DataFrame): DataFrame =
    df.withColumn("toks",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
      .where(size(col("toks")) > 0)
      .withColumn("simhash",
        graft.expr.SimHashFunctions.simhash_bits(col("toks")))
      .drop("toks")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("simhash")

  /** Upsert-stream ≡ O13 (user_course_activity.py:73–102 as a stream):
    * keep the latest value per key in `GroupState`, emit only when the key
    * advances — the streaming form of latest-wins merge. State is one
    * (ts, value) pair per key: constant per-key memory at any input rate.
    */
  final case class KeyedValue(k: Long, ts: java.sql.Timestamp, v: Double)
  final case class RunningTotal(n: Long, total: Double)
  final case class UserTotals(k: Long, n: Long, total: Double)
  final case class LatestState(tsMillis: Long, v: Double)

  def latestPerKey(ds: Dataset[KeyedValue]): Dataset[KeyedValue] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (k: Long, rows: Iterator[KeyedValue], state: GroupState[LatestState]) => {
          val newest = rows.maxBy(_.ts.getTime)
          val keep = state.getOption.forall(_.tsMillis <= newest.ts.getTime)
          if (keep) {
            state.update(LatestState(newest.ts.getTime, newest.v))
            Iterator.single(newest)
          } else Iterator.empty
        })
  }

  /** Spark 4's arbitrary-state API (`transformWithState`): per-key running
    * event count + value total, state in a named `ValueState` backed by the
    * RocksDB state store. Where `flatMapGroupsWithState` offers one opaque
    * state value per key, the v2 API gives named typed state slots with
    * per-slot TTL, timers, and an evolvable schema — the shape a 100 TB
    * stream wants: state lives off-heap in RocksDB (no executor-heap OOM at
    * high key cardinality), one slot update per key per micro-batch.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (StreamingSpec sets it per-query).
    */
  def runningTotals(ds: Dataset[KeyedValue]): Dataset[UserTotals] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Event-time TIMERS through `transformWithState`: gap-based session
    * aggregation where the SESSION CLOSE is emitted by an expired timer,
    * not by a later arrival of the same key. `session_window` (q54) can
    * only emit a key's closed session when the watermark passes it AND
    * the aggregation finalizes; a timer does the same for ARBITRARY
    * custom state — the missing piece between "named state slots"
    * (runningTotals) and full session semantics. Protocol: every input
    * batch re-arms the key's single timer to lastEvent + gap (old timer
    * deleted — at most ONE live timer per key, so timer state is O(keys)
    * like the value state); when the event-time watermark passes the
    * expiry, `handleExpiredTimer` emits the session summary and CLEARS
    * the state — a key's memory returns to zero between sessions.
    */
  final case class SessionAgg(n: Long, total: Double, lastMs: Long)
  final case class SessionOut(k: Long, n: Long, total: Double, last_ms: Long)

  def timedSessions(ds: Dataset[KeyedValue], gapMs: Long,
                    watermarkDelay: String): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream interval join (funnel attribution): each click joins
    * the same user's views from the preceding 15 minutes. The inputs are
    * plain DataFrames with (user_id, view_ts/click_ts, view_id/click_id)
    * columns, so the SAME code runs batch (q67, oracle-checked) and
    * streaming (StreamingSpec: both sides watermarked — the equality +
    * time-bound predicate is what lets Spark EVICT join state older than
    * watermark + 15 min instead of buffering both streams forever).
    */
  private def vcCond(views: DataFrame, clicks: DataFrame) =
    views("user_id") === clicks("user_id") &&
      views("view_ts") <= clicks("click_ts") &&
      clicks("click_ts") < views("view_ts") + expr("INTERVAL 15 MINUTES")

  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame =
    views.join(clicks, vcCond(views, clicks))
      .select(views("user_id"), col("view_id"), col("click_id"),
              col("view_ts"), col("click_ts"))

  /** LEFT OUTER stream-stream join — the conversion-funnel form: every
    * view appears, clickless ones with NULL click columns. In streaming
    * this is the mode where WATERMARKS ARE SEMANTIC, not just a state
    * bound: an unmatched view can only be emitted once the watermark
    * proves no matching click can still arrive (view_ts + 15 min behind
    * the click watermark) — the null-side row materializes at state
    * EVICTION time, so outer results trail the watermark by design.
    * Spark requires the time bound on both sides for exactly this
    * reason. Batch twin q149 is oracle-checked; the streaming path's
    * eviction-time emission is pinned in StreamingSpec.
    */
  def viewClickJoinLeft(views: DataFrame, clicks: DataFrame): DataFrame =
    views.join(clicks, vcCond(views, clicks), "left_outer")
      .select(views("user_id"), col("view_id"), col("click_id"),
              col("view_ts"), col("click_ts"))

  /** Stream-STATIC enrichment join: every micro-batch joins the static
    * dimension with NO state store — stream-static joins are stateless
    * by construction (the dim is re-planned per batch, so a file-backed
    * dim even picks up files appended between batches). With the
    * broadcast hint the stream side never shuffles: the standard
    * enrich-events-with-dim pattern at any scale. Left join keeps
    * dim-less events (null attrs) rather than silently dropping them.
    */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  // ─── q52: tumbling window (batch twin) ────────────────────────────────
  def q52Tumbling(s: SparkSession, d: String): DataFrame =
    tumblingCounts(events(s, d))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val q52Sql: String =
    """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  // ─── q53: sliding window (batch twin) ─────────────────────────────────
  // Each event belongs to exactly length/slide = 4 windows; the oracle
  // expands the same 4 offsets explicitly.
  def q53Sliding(s: SparkSession, d: String): DataFrame =
    slidingCounts(events(s, d))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val q53Sql: String =
    """SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM (
      |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
      |           - u.kk * INTERVAL '15 minutes' AS window_start,
      |         event_type, value
      |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kk) u)
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  // ─── q54: session window (batch twin) ─────────────────────────────────
  // Spark closes a session when the next event is >= gap after the
  // previous one (window end is exclusive); the oracle's gaps-and-islands
  // uses the same >= threshold.
  def q54Sessions(s: SparkSession, d: String): DataFrame =
    sessionAgg(events(s, d))
      .select(col("user_id"), col("sw.start").as("session_start"),
              col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  val q54Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ─── q67: stream-stream interval join (batch twin) ────────────────────
  def q67IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    viewClickJoin(views, clicks)
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  val q67Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events)
      |SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      |  v.ts AS view_ts, c.ts AS click_ts
      |FROM (SELECT * FROM e WHERE event_type = 'view') v
      |JOIN (SELECT * FROM e WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id AND v.ts <= c.ts
      | AND c.ts < v.ts + INTERVAL 15 MINUTE
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  // ─── q157: DYNAMIC-gap session windows (batch twin) ──────────────────
  // session_window's gap can be an EXPRESSION over the row — engagement
  // semantics (a view holds a session open 30 min, a click only 10).
  // Each event spans [ts, ts+gap(event)); overlapping spans merge. The
  // oracle needs the RUNNING-MAX gaps-and-islands form: a session
  // breaks when ts ≥ max over all PRIOR events of (ts+gap) — q54's
  // lag-only form is a constant-gap special case and would split
  // sessions a long-gap event is still holding open.
  def q157DynamicSessions(s: SparkSession, d: String): DataFrame = {
    // the gap expression must be CalendarIntervalType (a cast from
    // string), not the ANSI day-time interval INTERVAL literals produce
    val gap = when(col("event_type") === "view", lit("30 minutes"))
      .when(col("event_type") === "click", lit("10 minutes"))
      .otherwise(lit("20 minutes")).cast("interval")
    events(s, d)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val q157Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    CASE WHEN event_type = 'view' THEN 30
      |         WHEN event_type = 'click' THEN 10
      |         ELSE 20 END AS gap_min
      |  FROM events),
      |x AS (
      |  SELECT *, ts + gap_min * INTERVAL '1 minute' AS endts FROM e),
      |flagged AS (
      |  SELECT *, CASE WHEN max(endts) OVER w IS NULL
      |                   OR ts >= max(endts) OVER w
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ─── q149: LEFT OUTER interval join (batch twin) ──────────────────────
  // Unmatched views ride as click_id = -1 (coalesced in BOTH engines, so
  // no NULL-ordering divergence can touch the sort or the hash).
  def q149IntervalJoinLeft(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    viewClickJoinLeft(views, clicks)
      .select(col("user_id"), col("view_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  val q149Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events)
      |SELECT v.user_id, v.event_id AS view_id,
      |  coalesce(c.event_id, -1) AS click_id
      |FROM (SELECT * FROM e WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id AND v.ts <= c.ts
      | AND c.ts < v.ts + INTERVAL 15 MINUTE
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  /** FULL OUTER stream-stream join — the audit form: every view AND every
    * click appears, matched or not. The outer-emission rule of q149
    * applies to BOTH sides: an unmatched row (either stream) materializes
    * only when the watermark proves its join window is closed, so both
    * sides' state evicts at watermark + 15 min. Same condition, same
    * code, batch (q189, oracle-checked) and streaming (StreamingSpec).
    */
  def viewClickJoinFull(views: DataFrame, clicks: DataFrame): DataFrame = {
    // rename the click side's key: both outputs must survive the outer
    // join, and when both inputs share a lineage (batch twin: one events
    // scan) df("col") references are ambiguous — name-based resolution
    // over DISTINCT names is lineage-proof
    val c = clicks.withColumnRenamed("user_id", "c_user_id")
    val cond = col("user_id") === col("c_user_id") &&
      col("view_ts") <= col("click_ts") &&
      col("click_ts") < col("view_ts") + expr("INTERVAL 15 MINUTES")
    views.join(c, cond, "full_outer")
      .select(coalesce(col("user_id"), col("c_user_id")).as("user_id"),
              col("view_id"), col("click_id"),
              col("view_ts"), col("click_ts"))
  }

  // ─── q189: FULL OUTER interval join (batch twin) ──────────────────────
  // Null sides coalesce to -1 in BOTH engines (the q149 rule); the
  // user_id survives from whichever side is present.
  def q189IntervalJoinFull(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
              col("event_id").as("view_id"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    viewClickJoinFull(views, clicks)
      .select(col("user_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  val q189Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events)
      |SELECT coalesce(v.user_id, c.user_id) AS user_id,
      |  coalesce(v.event_id, -1) AS view_id,
      |  coalesce(c.event_id, -1) AS click_id
      |FROM (SELECT * FROM e WHERE event_type = 'view') v
      |FULL JOIN (SELECT * FROM e WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id AND v.ts <= c.ts
      | AND c.ts < v.ts + INTERVAL 15 MINUTE
      |ORDER BY user_id, view_id, click_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_tumbling_window" -> (q52Tumbling _),
    "q53_sliding_window"  -> (q53Sliding _),
    "q54_session_window"  -> (q54Sessions _),
    "q67_interval_join"   -> (q67IntervalJoin _),
    "q149_interval_join_left" -> (q149IntervalJoinLeft _),
    "q189_interval_join_full" -> (q189IntervalJoinFull _),
    "q157_dynamic_sessions" -> (q157DynamicSessions _),
  )

  val oracleSql: Map[String, String] = Map(
    "q52_tumbling_window" -> q52Sql,
    "q53_sliding_window"  -> q53Sql,
    "q54_session_window"  -> q54Sql,
    "q67_interval_join"   -> q67Sql,
    "q149_interval_join_left" -> q149Sql,
    "q189_interval_join_full" -> q189Sql,
    "q157_dynamic_sessions" -> q157Sql,
  )
}

/** The `StatefulProcessor` behind [[Streaming.runningTotals]] — top-level
  * (it is serialized to executors) with a single named ValueState slot.
  * TTLConfig.NONE keeps state forever, matching the batch twin; a real
  * deployment bounds it with a TTL per slot (state expiry without timers).
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, Streaming.KeyedValue, Streaming.UserTotals] {
  @transient private var totals: ValueState[Streaming.RunningTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[Streaming.RunningTotal]("totals",
      Encoders.product[Streaming.RunningTotal], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[Streaming.KeyedValue],
      timerValues: TimerValues): Iterator[Streaming.UserTotals] = {
    val prev = Option(totals.get()).getOrElse(Streaming.RunningTotal(0L, 0.0))
    val upd = rows.foldLeft(prev) { (acc, r) =>
      Streaming.RunningTotal(acc.n + 1, acc.total + r.v)
    }
    totals.update(upd)
    Iterator.single(Streaming.UserTotals(key, upd.n, upd.total))
  }
}

/** The timer-armed session processor behind [[Streaming.timedSessions]].
  * One ValueState slot + at most one live timer per key; emission happens
  * ONLY from the expired-timer path (append semantics: a session is final
  * when the watermark proves no event can extend it).
  */
class SessionTimerProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Streaming.KeyedValue,
                              Streaming.SessionOut] {
  @transient private var agg: ValueState[Streaming.SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[Streaming.SessionAgg]("session",
      Encoders.product[Streaming.SessionAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[Streaming.KeyedValue],
      timerValues: TimerValues): Iterator[Streaming.SessionOut] = {
    val prev = Option(agg.get()).getOrElse(Streaming.SessionAgg(0L, 0.0, 0L))
    val upd = rows.foldLeft(prev) { (acc, r) =>
      Streaming.SessionAgg(acc.n + 1, acc.total + r.v,
        math.max(acc.lastMs, r.ts.getTime))
    }
    agg.update(upd)
    // re-arm: drop any previous timer so exactly one (the latest) lives
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(upd.lastMs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Streaming.SessionOut] = {
    val st = agg.get()
    if (st == null) Iterator.empty
    else {
      agg.clear()
      Iterator.single(Streaming.SessionOut(key, st.n, st.total, st.lastMs))
    }
  }
}
