package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The CHANGE FEED as a streaming SOURCE — the Delta `readChangeFeed`
  * streaming mode for the snapshot store. A downstream job SUBSCRIBES
  * to a table's commits instead of polling it:
  *
  *   spark.readStream.format("graft.sources.ChangeFeedSource")
  *     .option("table", path).option("keyCols", "id")
  *     .option("startVersion", "3").load()
  *
  * OFFSETS ARE VERSIONS; by default one micro-batch = one commit step's
  * change rows, because a commit step is the unit downstream retraction
  * algebra composes over (see [[SnapshotStore.retractApply]]). A
  * subscriber that has fallen behind drains its backlog with
  * `maxVersionsPerTrigger`: admission then spans up to that many commit
  * steps per micro-batch, each row still tagged `_commit_version`.
  * NB `Trigger.Once` (and any other ReadAllAvailable admission path)
  * is EXEMPT from the cap: the engine asks for everything in one
  * micro-batch and the source complies — the Kafka-source convention,
  * but a surprise if the cap was set specifically to bound batch size.
  * Use `Trigger.AvailableNow` for a capped self-terminating drain: the
  * target version is pinned at query start while per-trigger admission
  * still honors `maxVersionsPerTrigger`.
  * Folding a MULTI-step batch through `retractApply` in ONE call is
  * sound because the algebra is ORDER-INDEPENDENT: every step
  * contributes signed (sum, count) deltas and addition commutes, so
  * Σ_steps(post − pre) applied at once equals the steps applied in
  * sequence (the transient per-step `cnt = 0` group-drop is invisible —
  * the full-outer merge re-creates the group, and combined counts are
  * summed before the `cnt > 0` filter). The schema is the table's
  * manifest schema plus `_change_type`/`_commit_version`, fixed at
  * stream start.
  *
  * ARCHITECTURE — DataSource V1 `Source`, the tier Delta's own CDF
  * streaming source rides, chosen deliberately over DSv2
  * `MicroBatchStream`: `getBatch` returns the DISTRIBUTED
  * [[SnapshotStore.changeFeed]] plan itself (manifest-listed parquet
  * files planned as real file splits, DV-delta positions applied as a
  * distributed anti-join, delete pre-images synthesized executor-side,
  * update pre/post pairing as delta-sized joins), re-wrapped streaming
  * via its compiled RDD lineage. NO change row ever passes through the
  * driver — a DSv2 source would have to materialize the batch into
  * `InputPartition`s because its readers cannot express the feed's
  * joins, which is exactly the driver funnel a CoW-amplified commit or
  * a `startVersion` backfill cannot afford. There is no collected-row
  * fallback because none is needed.
  *
  * DETERMINISTIC REPLAY with ZERO admission state: committed versions
  * are immutable, so `getBatch(start, end)` derives the batch from the
  * manifests alone — a crash-restarted stream replays the offset-log
  * batch bit-identically with nothing buffered. The only retention
  * contract is vacuum's: versions inside the checkpoint lag must not
  * be expired (the Delta CDF caveat verbatim).
  *
  * 100 TB shape: admission (`latestOffset`) is one driver-side manifest
  * listing per trigger — no data touched. Per batch, driver work is
  * plan construction (two manifest parses per admitted step); data
  * work is column-pruned executor-side scans of exactly the files the
  * admitted commits touched. Copy-on-write steps (compaction, full
  * rewrites) amplify the delta to the rewritten bytes — that cost now
  * lands on the EXECUTORS as a normal distributed scan instead of on
  * driver memory; subscribe past them with `startVersion` if even the
  * scan is unwanted.
  */
object ChangeFeedSource {
  private[sources] val CdfCols = Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false))

  /** The stream's schema for `table`: latest manifest schema + CDF cols. */
  def schemaFor(spark: SparkSession, table: String): StructType = {
    val committed = SnapshotStore.versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    StructType(SnapshotStore.schemaOf(spark, table, committed.last).fields
      ++ CdfCols)
  }

  /** Convenience reader: subscribe to `table`'s commits after
    * `startVersion` (exclusive). Rows arrive one commit step per
    * micro-batch (raise `maxVersionsPerTrigger` to drain a backlog in
    * multi-step batches), tagged `_change_type`/`_commit_version`.
    */
  def readStream(spark: SparkSession, table: String, keyCols: Seq[String],
                 startVersion: Int,
                 maxVersionsPerTrigger: Int = 1): DataFrame =
    spark.readStream.format(classOf[ChangeFeedSource].getName)
      .option("table", table)
      .option("keyCols", keyCols.mkString(","))
      .option("startVersion", startVersion.toString)
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
      .load()
}

final class ChangeFeedSource extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "snapshot-cdf"

  private def opt(parameters: Map[String, String],
                  key: String): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val table = opt(parameters, "table").getOrElse(
      throw new IllegalArgumentException("option 'table' is required"))
    (shortName(),
      schema.getOrElse(
        ChangeFeedSource.schemaFor(sqlContext.sparkSession, table)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val table = opt(parameters, "table").getOrElse(
      throw new IllegalArgumentException("option 'table' is required"))
    val keyCols = opt(parameters, "keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(keyCols.nonEmpty, "option 'keyCols' is required " +
      "(update pre/post pairing is keyed)")
    val maxVersions = opt(parameters, "maxVersionsPerTrigger")
      .map(_.toInt).getOrElse(1)
    require(maxVersions >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $maxVersions")
    val declared = schema.getOrElse(
      ChangeFeedSource.schemaFor(sqlContext.sparkSession, table))
    new CdfSource(sqlContext.sparkSession, table, keyCols,
      opt(parameters, "startVersion").map(_.toInt), maxVersions, declared)
  }
}

/** Offset = committed table version the stream has emitted through. */
private[graft] final case class VersionOffset(version: Int) extends OffsetV1 {
  override def json(): String = version.toString
}

private[graft] final class CdfSource(spark: SparkSession, table: String,
                              keyCols: Seq[String],
                              startVersion: Option[Int], maxVersions: Int,
                              declared: StructType)
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def schema: StructType = declared

  // Trigger.AvailableNow: pin the drain target at query start (the
  // KafkaSource discipline) so per-trigger admission still honors
  // maxVersionsPerTrigger while the run self-terminates at the pinned
  // version — without this the engine's generic wrapper admits the
  // whole backlog as ONE batch, defeating the catch-up cap.
  private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val committed = SnapshotStore.versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    availableNowTarget = Some(committed.last)
  }

  private def verOf(o: AnyRef): Int = o match {
    case v: OffsetV1 => v.json().trim.toInt // incl. SerializedOffset replay
    case v: OffsetV2 => v.json().trim.toInt
  }

  /** Fresh-checkpoint start: the given version, or the table's latest
    * at stream creation (subscribe to FUTURE commits — the common
    * "summary follows table" posture; pass an explicit earlier version
    * to backfill history — now a distributed scan, not a driver walk).
    */
  override def initialOffset(): OffsetV2 = {
    val committed = SnapshotStore.versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    val v = startVersion.getOrElse(committed.last)
    require(committed.contains(v),
      s"startVersion $v not committed (have ${committed.mkString(",")})")
    VersionOffset(v)
  }

  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(startOffset, limit) is used (SupportsAdmissionControl)")

  /** A commit step is the admission unit; `maxVersionsPerTrigger` rides
    * the engine's ReadLimit channel as maxFiles(steps).
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(maxVersions)

  /** Admit up to the limit's commit steps per micro-batch: one
    * driver-side manifest listing; no data touched. A backlog of N
    * commits drains in ceil(N / maxVersionsPerTrigger) triggers.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // first trigger passes start = null (the v1+admission contract —
    // KafkaSource's Option(start).getOrElse(initial) discipline)
    val s = Option(start).map(verOf).getOrElse(verOf(initialOffset()))
    val latest = availableNowTarget.getOrElse(
      SnapshotStore.versions(spark, table).lastOption.getOrElse(s))
    val cap: Long = limit match {
      case _: ReadAllAvailable => Int.MaxValue.toLong
      case mf: ReadMaxFiles => mf.maxFiles().toLong
      case _ => maxVersions.toLong
    }
    VersionOffset(math.min(latest.toLong, s.toLong + cap).toInt)
  }

  /** The batch's DISTRIBUTED plan, conformed to the declared schema so
    * emitted rows match `schema` even if the table widened after stream
    * start (a column the declared schema lacks is an analysis error
    * here — loud, not silent corruption). Exposed for the spec that
    * pins the no-driver-materialization shape: the executed plan scans
    * parquet FILE SPLITS and joins executor-side.
    */
  private[graft] def batchPlan(s: Int, e: Int): DataFrame =
    SnapshotStore.changeFeed(spark, table, s, e, keyCols)
      .select(declared.fields.toIndexedSeq
        .map(fl => col(fl.name).cast(fl.dataType).as(fl.name)): _*)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = start.map(verOf).getOrElse(verOf(initialOffset()))
    val e = verOf(end)
    if (s >= e) // defensive: an already-drained (start, end] replays empty
      bridge.asStreamingFrame(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared))
    else bridge.asStreamingFrame(batchPlan(s, e))
  }

  // versions are immutable and the batch is derived from manifests, so
  // there is nothing to free or advance
  override def commit(end: OffsetV2): Unit = ()
  override def deserializeOffset(json: String): OffsetV2 =
    VersionOffset(json.toInt)
  override def stop(): Unit = ()
}
