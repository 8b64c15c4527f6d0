package graft

import graft.ops.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import org.apache.spark.sql.functions.{filter, lower, split}

/** top-level so Spark can derive an encoder without an outer scope. */
final case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Ev + user_id, for the keyed stream-stream join. */
final case class EvU(event_id: Long, ts: Timestamp, event_type: String,
                     value: Double, user_id: Long)

/** Document stream row, for the streaming near-dup dedup. */
final case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** True Structured Streaming semantics that no SQL oracle can check
  * (SURVEY §5.2 / §7.3 "Streaming oracle gap"): watermark-driven late-data
  * drop, stateful dedup, and the flatMapGroupsWithState upsert stream.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("paged-api DSv2 source: page = micro-batch = one JDBC transaction") {
    import graft.sources.{JdbcSink, PagedApiSource, Pagination}
    // 3-page fixture cursor chain, with one retryable 524 on page 2 to
    // prove the classified-retry policy runs inside the stream too.
    val pages = Map(
      "p1" -> Pagination.Page(Seq("""{"id":1}""", """{"id":2}"""), Some("p2")),
      "p2" -> Pagination.Page(Seq("""{"id":3}"""), Some("p3")),
      "p3" -> Pagination.Page(Seq("""{"id":4}""", """{"id":5}"""), None))
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    PagedApiSource.register("fixture-3pages", PagedApiSource.FetchSpec(
      startUrl = "p1",
      fetch = url =>
        if (url == "p2" && failedOnce.compareAndSet(false, true))
          Left(Pagination.Failure.Http(524))
        else Right(pages(url)),
      policy = Pagination.catalogPolicy))
    val ckpt = java.nio.file.Files.createTempDirectory("pagedapi").toString
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val url = "jdbc:derby:memory:graftdb;create=true"
    val batchPages = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    val q = spark.readStream
      .format("graft.sources.PagedApiSource")
      .option("fetcher", "fixture-3pages")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val pageIds = df.select($"page_id").as[Int].collect().toSeq
        batchPages.synchronized { batchPages += pageIds }
        // page-granular transaction: one page -> one append
        JdbcSink.append(df, url, "T_PAGE_TX", driver, numPartitions = 1)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    PagedApiSource.unregister("fixture-3pages")
    // every non-empty batch carried EXACTLY one page
    val nonEmpty = batchPages.filter(_.nonEmpty)
    assert(nonEmpty.forall(_.distinct.size == 1),
      s"a micro-batch mixed pages: $batchPages")
    assert(nonEmpty.map(_.head).sorted == Seq(0, 1, 2))
    // all 5 record bodies landed, tagged with their page
    val got = JdbcSink.readTable(spark, url, "T_PAGE_TX", driver)
      .as[(Int, String)].collect().toSet
    assert(got === Set(
      0 -> """{"id":1}""", 0 -> """{"id":2}""", 1 -> """{"id":3}""",
      2 -> """{"id":4}""", 2 -> """{"id":5}"""))
  }

  test("paged-api source recovers a replayed batch after restart (cursor re-walk)") {
    import graft.sources.{PagedApiSource, Pagination}
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val pages = Map(
      "a" -> Pagination.Page(Seq("r1", "r2"), Some("b")),
      "b" -> Pagination.Page(Seq("r3"), Some("c")),
      "c" -> Pagination.Page(Seq("r4"), None))
    PagedApiSource.register("restart-fx", PagedApiSource.FetchSpec(
      startUrl = "a",
      fetch = url => { fetches.incrementAndGet(); Right(pages(url)) },
      policy = Pagination.catalogPolicy))
    val table = new PagedApiSource().getTable(PagedApiSource.schema,
      Array.empty, java.util.Collections.singletonMap("fetcher", "restart-fx"))
    def newStream() = table.asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .toMicroBatchStream("unused-ckpt")
      .asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
        with org.apache.spark.sql.connector.read.streaming.MicroBatchStream]
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    def advance(s: org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl,
                from: String) =
      s.latestOffset(s.asInstanceOf[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]
        .deserializeOffset(from), ReadLimit.allAvailable())
    // first run: admit pages 0 and 1, commit page 0, then "crash"
    val run1 = newStream()
    advance(run1, "0"); advance(run1, "1")
    run1.commit(run1.deserializeOffset("1"))
    run1.stop()
    assert(fetches.get() === 2)
    // restart: a FRESH stream is asked to replay batch (1, 2] from the
    // offset log — it must re-walk the cursor (pages 0 and 1 refetched)
    // and serve page 1 only.
    val run2 = newStream()
    val parts = run2.planInputPartitions(
      run2.deserializeOffset("1"), run2.deserializeOffset("2"))
    assert(parts.length === 1)
    assert(fetches.get() === 4, "recovery should refetch exactly pages 0 and 1")
    val reader = run2.createReaderFactory().createReader(parts(0))
    val got = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    while (reader.next()) {
      val r = reader.get()
      got += ((r.getInt(0), r.getUTF8String(1).toString))
    }
    assert(got.toSeq === Seq(1 -> "r3"), s"wrong replayed rows: $got")
    // and the stream continues past the replayed batch as normal
    assert(advance(run2, "2").json() === "3")
    run2.stop()
    PagedApiSource.unregister("restart-fx")
  }

  test("paged-api restart after COMMITTED batch never regresses the offset") {
    import graft.sources.{PagedApiSource, Pagination}
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val pages = Map(
      "a" -> Pagination.Page(Seq("r1"), Some("b")),
      "b" -> Pagination.Page(Seq("r2"), Some("c")),
      "c" -> Pagination.Page(Seq("r3"), None))
    PagedApiSource.register("commit-restart-fx", PagedApiSource.FetchSpec(
      startUrl = "a", fetch = url => Right(pages(url)),
      policy = Pagination.catalogPolicy))
    val table = new PagedApiSource().getTable(PagedApiSource.schema,
      Array.empty, java.util.Collections.singletonMap("fetcher", "commit-restart-fx"))
    def newStream() = table.asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .toMicroBatchStream("unused-ckpt")
      .asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
        with org.apache.spark.sql.connector.read.streaming.MicroBatchStream]
    // run 1 processed AND committed pages 0 and 1, then the process died.
    // run 2's first admission call receives the checkpointed start (2):
    // the reported offset must be ≥ 2 (here 3: pages 0-1 re-walked, page 2
    // newly admitted) — the regression bug reported 1 and re-emitted
    // committed pages to append sinks as duplicates.
    val run2 = newStream()
    val off = run2.latestOffset(run2.deserializeOffset("2"), ReadLimit.allAvailable())
    assert(off.json() === "3", s"offset regressed: $off")
    val parts = run2.planInputPartitions(
      run2.deserializeOffset("2"), run2.deserializeOffset("3"))
    assert(parts.length === 1)
    val reader = run2.createReaderFactory().createReader(parts(0))
    val got = scala.collection.mutable.ArrayBuffer[String]()
    while (reader.next()) got += reader.get().getUTF8String(1).toString
    assert(got.toSeq === Seq("r3"), s"committed pages re-emitted: $got")
    // an exhausted chain idles at the checkpoint instead of regressing
    val idle = run2.latestOffset(run2.deserializeOffset("3"), ReadLimit.allAvailable())
    assert(idle.json() === "3")
    run2.stop()
    PagedApiSource.unregister("commit-restart-fx")
  }

  test("change-feed DSv2 source: one commit step per micro-batch, a " +
       "retractApply-maintained summary follows a streamCdcSink-fed table") {
    import graft.sources.{ChangeFeedSource, SnapshotStore}
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val t = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-follow"
    val ckpt = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-follow-ckpt"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(t, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    // seed v1, then two CDC waves → v2, v3 (the q328 write side)
    SnapshotStore.publish(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
        .toDF("id", "g", "v"), t)
    SnapshotStore.applyCdcVersion(spark, t,
      Seq((1L, "a", 0L, "D"), (2L, "a", 25L, "U"), (5L, "b", 50L, "I"))
        .toDF("id", "g", "v", "op"), Seq("id"), "op", 2)
    SnapshotStore.applyCdcVersion(spark, t,
      Seq((5L, "b", 0L, "D"), (3L, "c", 33L, "U"))
        .toDF("id", "g", "v", "op"), Seq("id"), "op", 3)
    // subscribe from v1 and maintain a (g -> sum(v), cnt) summary with
    // the retraction algebra — no polling, no fact rescan
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(sum(col("v")).as("sum_val"),
        count(lit(1)).as("cnt"))
    var maintained = summarize(SnapshotStore.read(spark, t, Some(1)))
      .localCheckpoint()
    val seenVersions = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = ChangeFeedSource.readStream(spark, t, Seq("id"), 1)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seenVersions += batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).toSet
        maintained = SnapshotStore
          .retractApply(maintained, batch, Seq("g"), "v").localCheckpoint()
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // one commit step per micro-batch, in order
    assert(seenVersions.toSeq === Seq(Set(2L), Set(3L)),
      s"expected one version per batch, got $seenVersions")
    val got = maintained.orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    val scratch = summarize(SnapshotStore.read(spark, t)).orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === scratch,
      s"maintained $got must equal from-scratch $scratch")
    assert(got === Seq(("a", 25L, 1L), ("b", 40L, 1L), ("c", 33L, 1L)))
    // a NEW commit arrives while subscribed: the running query picks it
    // up as its own micro-batch (the no-polling contract)
    val q2 = ChangeFeedSource.readStream(spark, t, Seq("id"), 1)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        maintained = SnapshotStore
          .retractApply(maintained, batch, Seq("g"), "v").localCheckpoint()
        ()
      }.start()
    try {
      SnapshotStore.applyCdcVersion(spark, t,
        Seq((6L, "a", 60L, "I")).toDF("id", "g", "v", "op"),
        Seq("id"), "op", 4)
      q2.processAllAvailable()
    } finally q2.stop()
    // the restarted checkpoint resumes AFTER v3 (no replay of consumed
    // steps) and folds only the new commit
    assert(maintained.orderBy(col("g")).as[(String, Long, Long)]
      .collect().toSeq === Seq(("a", 85L, 2L), ("b", 40L, 1L),
        ("c", 33L, 1L)))
  }

  test("full CDC loop: streamCdcSink ingests a MemoryStream while a " +
       "ChangeFeedSource subscription maintains a summary downstream") {
    import graft.sources.{ChangeFeedSource, SnapshotStore}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val t = sys.props("java.io.tmpdir") + "/graft-snapspec/cdc-loop"
    val ckptIn = sys.props("java.io.tmpdir") + "/graft-snapspec/cdc-loop-in"
    val ckptOut = sys.props("java.io.tmpdir") + "/graft-snapspec/cdc-loop-out"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(t, ckptIn, ckptOut).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    SnapshotStore.publish(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "v"), t)
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(sum(col("v")).as("sum_val"),
        count(lit(1)).as("cnt"))
    var maintained = summarize(SnapshotStore.read(spark, t, Some(1)))
      .localCheckpoint()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, String)]
    val ingest = SnapshotStore.streamCdcSink(
      in.toDF().toDF("id", "g", "v", "op"), t, ckptIn,
      keyCols = Seq("id"), opCol = "op", baseVersion = 1)
    val follow = ChangeFeedSource.readStream(spark, t, Seq("id"), 1)
      .writeStream.option("checkpointLocation", ckptOut)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        maintained = SnapshotStore
          .retractApply(maintained, batch, Seq("g"), "v").localCheckpoint()
        ()
      }.start()
    try {
      in.addData((1L, "a", 0L, "D"), (3L, "b", 30L, "I"))
      ingest.processAllAvailable()
      follow.processAllAvailable()
      in.addData((2L, "b", 25L, "U"), (4L, "a", 40L, "I"))
      ingest.processAllAvailable()
      follow.processAllAvailable()
    } finally { ingest.stop(); follow.stop() }
    // table state: {2→(b,25), 3→(b,30), 4→(a,40)}; the maintained
    // summary followed commit-by-commit with no polling and no rescan
    val got = maintained.orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    val scratch = summarize(SnapshotStore.read(spark, t)).orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === scratch, s"maintained $got != from-scratch $scratch")
    assert(got === Seq(("a", 40L, 1L), ("b", 55L, 2L)))
  }

  test("change-feed source plans DISTRIBUTED batches: parquet file " +
       "splits + executor-side joins, no driver materialization of " +
       "change rows") {
    import graft.sources.{ChangeFeedSource, CdfSource, SnapshotStore}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.col
    val t = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-planned"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(t), true)
    SnapshotStore.publish(
      spark.range(500).select(col("id"), (col("id") % 7).as("g"),
        (col("id") * 3).as("v")), t)
    SnapshotStore.applyCdcVersion(spark, t,
      spark.range(100).select(col("id"), (col("id") % 7).as("g"),
          (col("id") * 5).as("v"))
        .withColumn("op",
          org.apache.spark.sql.functions.when(col("id") < 40,
            org.apache.spark.sql.functions.lit("D"))
          .otherwise(org.apache.spark.sql.functions.lit("U"))),
      Seq("id"), "op", 2)
    val src = new ChangeFeedSource().createSource(spark.sqlContext,
      t + "-meta", None, "snapshot-cdf",
      Map("table" -> t, "keyCols" -> "id")).asInstanceOf[CdfSource]
    // the batch's plan scans the commit's parquet files as real file
    // splits — a collected-row source would show none
    val plan = src.batchPlan(1, 2)
    val executed = plan.queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: FileSourceScanExec => 1
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(scans).sum
    }
    assert(scans(executed) > 0,
      s"batch must plan parquet FILE SPLITS, got:\n$executed")
    // the batch's rows equal the batch changeFeed's — getBatch wraps
    // batchPlan's compiled RDD verbatim (no executeCollect path exists
    // in ChangeFeedSource at all), so plan equality IS row equality
    val gotRows = plan.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    val expect = SnapshotStore.changeFeed(spark, t, 1, 2, Seq("id"))
      .groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(gotRows === expect, s"planned $gotRows != batch feed $expect")
    assert(gotRows("delete") === 40L &&
      gotRows("update_preimage") === 60L &&
      gotRows("update_postimage") === 60L)
    // the v1 getBatch contract: a STREAMING-flagged frame of the same
    // schema (a batch execution of it is rejected by analysis, so the
    // flag itself is the assert)
    val batch = src.getBatch(None, graft.sources.VersionOffset(2))
    assert(batch.isStreaming, "getBatch must return a streaming frame")
    assert(batch.schema.map(f => (f.name, f.dataType))
      === plan.schema.map(f => (f.name, f.dataType)))
  }

  test("change-feed catch-up admission: a 10-commit backlog drains in " +
       "2 triggers under maxVersionsPerTrigger=8; multi-step batches " +
       "fold through retractApply in one call; replay stays a no-op") {
    import graft.sources.{ChangeFeedSource, SnapshotStore}
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val t = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-backlog"
    val ckpt = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-backlog-ckpt"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(t, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    SnapshotStore.publish(
      (1L to 20L).map(i => (i, s"g${i % 3}", i * 10L)).toDF("id", "g", "v"),
      t)
    // 10 commits pile up BEFORE the subscriber attaches — each wave
    // inserts a fresh row, updates a seed row, and deletes the
    // previous wave's insert (cross-step interactions, so a one-shot
    // fold only matches if the composed algebra is order-independent)
    for (w <- 1 to 10) {
      val rows = Seq(
        (100L * w, s"g${w % 3}", 100L * w, "I"),
        (w.toLong, s"g${w % 3}", w * 1000L, "U")) ++
        (if (w > 1)
           Seq((100L * (w - 1), s"g${(w - 1) % 3}", 100L * (w - 1), "D"))
         else Seq.empty)
      SnapshotStore.applyCdcVersion(spark, t,
        rows.toDF("id", "g", "v", "op"), Seq("id"), "op", w + 1)
    }
    assert(SnapshotStore.versions(spark, t).last === 11)
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(sum(col("v")).as("sum_val"),
        count(lit(1)).as("cnt"))
    var maintained = summarize(SnapshotStore.read(spark, t, Some(1)))
      .localCheckpoint()
    val batchVersions = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = ChangeFeedSource.readStream(spark, t, Seq("id"), 1,
        maxVersionsPerTrigger = 8)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchVersions += batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).toSeq.sorted
        // ONE retractApply over the whole multi-step batch — sound
        // because the algebra is order-independent (scaladoc proof)
        maintained = SnapshotStore
          .retractApply(maintained, batch, Seq("g"), "v").localCheckpoint()
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batchVersions.size === 2,
      s"10 commits at 8/trigger must drain in 2 batches, got $batchVersions")
    assert(batchVersions(0) === (2L to 9L) &&
      batchVersions(1) === (10L to 11L),
      s"admission must span versions in order, got $batchVersions")
    val got = maintained.orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    val scratch = summarize(SnapshotStore.read(spark, t)).orderBy(col("g"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === scratch,
      s"multi-step maintained $got must equal from-scratch $scratch")
    // restart on the drained checkpoint: nothing replays
    val q2 = ChangeFeedSource.readStream(spark, t, Seq("id"), 1,
        maxVersionsPerTrigger = 8)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchVersions += batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).toSeq.sorted
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batchVersions.size === 2,
      s"drained checkpoint must not replay, got $batchVersions")
  }

  test("change-feed Trigger.AvailableNow: the engine's wrapper drains " +
       "the whole backlog under the source's admission cap, then stops") {
    import graft.sources.{ChangeFeedSource, SnapshotStore}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val t = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-avnow"
    val ckpt = sys.props("java.io.tmpdir") + "/graft-snapspec/cdf-avnow-ckpt"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(t, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    SnapshotStore.publish(
      (1L to 6L).map(i => (i, i * 10L)).toDF("id", "v"), t)
    for (w <- 1 to 5)
      SnapshotStore.applyCdcVersion(spark, t,
        Seq((100L + w, 1000L + w, "I")).toDF("id", "v", "op"),
        Seq("id"), "op", w + 1)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = ChangeFeedSource.readStream(spark, t, Seq("id"), 1,
        maxVersionsPerTrigger = 2)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen += batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).toSeq.sorted
        ()
      }.start()
    q.awaitTermination(120000)
    // 5 commits at 2/trigger: 3 batches, in version order, then done
    assert(seen.toSeq === Seq(Seq(2L, 3L), Seq(4L, 5L), Seq(6L)),
      s"AvailableNow must drain the backlog under the cap, got $seen")
    assert(!q.isActive, "AvailableNow query must self-terminate")
  }

  test("stream-stream interval join matches batch semantics with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EvU]
    val clicks = MemoryStream[EvU]
    val joined = Streaming.viewClickJoin(
      views.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id")),
      clicks.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // user 7: view at t=0; clicks at t=10 (in window) and t=20 (outside)
      // user 8: view at t=30, click at t=29 (click precedes view -> no match)
      views.addData(EvU(100, ts(0), "view", 0, 7), EvU(101, ts(30), "view", 0, 8))
      clicks.addData(EvU(200, ts(10), "click", 0, 7), EvU(201, ts(20), "click", 0, 7),
                     EvU(202, ts(29), "click", 0, 8))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      views.addData(EvU(110, ts(120), "view", 0, 99))
      clicks.addData(EvU(210, ts(121), "click", 0, 98))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select($"user_id", $"view_id", $"click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set((7L, 100L, 200L)),
        s"interval join produced $rows")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched views at watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EvU]
    val clicks = MemoryStream[EvU]
    val joined = Streaming.viewClickJoinLeft(
      views.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id")),
      clicks.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")))
    val q = joined.writeStream.format("memory").queryName("ssjl")
      .outputMode("append").start()
    try {
      // user 7: matched within the window; user 8: click precedes the
      // view -> never matches, must surface with a NULL click anyway
      views.addData(EvU(100, ts(0), "view", 0, 7), EvU(101, ts(30), "view", 0, 8))
      clicks.addData(EvU(200, ts(10), "click", 0, 7), EvU(202, ts(29), "click", 0, 8))
      q.processAllAvailable()
      val early = spark.table("ssjl")
        .select($"view_id", $"click_id").as[(Long, Option[Long])].collect().toSet
      assert(!early.contains((101L, None)),
        s"unmatched view leaked BEFORE its watermark horizon passed: $early")
      // push both watermarks past view_ts(30) + 15 min + 5 min delay
      views.addData(EvU(110, ts(120), "view", 0, 99))
      clicks.addData(EvU(210, ts(121), "click", 0, 98))
      q.processAllAvailable()
      val rows = spark.table("ssjl")
        .select($"user_id", $"view_id", $"click_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(rows === Set((7L, 100L, Some(200L)), (8L, 101L, None)),
        s"left-outer join produced $rows")
    } finally q.stop()
  }

  test("full-outer stream-stream join surfaces BOTH unmatched sides after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EvU]
    val clicks = MemoryStream[EvU]
    val joined = Streaming.viewClickJoinFull(
      views.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id")),
      clicks.toDF().withWatermark("ts", "5 minutes")
        .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")))
    val q = joined.writeStream.format("memory").queryName("ssjf")
      .outputMode("append").start()
    try {
      // user 7 matches; user 8's view never matches (click precedes it);
      // user 9 has a click with NO view at all — only the FULL join shows it
      views.addData(EvU(100, ts(0), "view", 0, 7), EvU(101, ts(30), "view", 0, 8))
      clicks.addData(EvU(200, ts(10), "click", 0, 7),
                     EvU(202, ts(29), "click", 0, 8),
                     EvU(203, ts(31), "click", 0, 9))
      q.processAllAvailable()
      // push both watermarks far past every horizon
      views.addData(EvU(110, ts(120), "view", 0, 99))
      clicks.addData(EvU(210, ts(121), "click", 0, 98))
      q.processAllAvailable()
      val rows = spark.table("ssjf")
        .select($"user_id", $"view_id", $"click_id")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(rows === Set(
        (7L, Some(100L), Some(200L)),   // matched
        (8L, Some(101L), None),         // view without click
        (8L, None, Some(202L)),         // click without view (pre-view)
        (9L, None, Some(203L))),        // click-only user
        s"full-outer join produced $rows")
    } finally q.stop()
  }

  test("dynamic session gap is live: shorter click gaps split more sessions") {
    val dynamic = Streaming.q157DynamicSessions(spark, sfDir).count()
    val fixed30 = Streaming.q54Sessions(spark, sfDir).count()
    // clicks hold sessions open only 10 min instead of 30 ⇒ strictly
    // more (or equal, never fewer) session breaks than the fixed form
    assert(dynamic >= fixed30,
      s"dynamic=$dynamic fixed=$fixed30 — gap expression had no effect?")
    assert(dynamic > fixed30,
      "fixture must be non-degenerate: at least one session split by a short gap")
  }

  test("Trigger.AvailableNow drains a file backlog in bounded batches, then stops") {
    // the operational replay mode: process everything that EXISTS, in
    // rate-limited micro-batches (bounded state/memory, unlike a single
    // giant batch), then terminate — backfill and catch-up both ride this
    val dir = java.nio.file.Files.createTempDirectory("graft_drain").toString
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100).toDF("id").repartition(1)
        .write.mode("append").parquet(dir)
    }
    val q = spark.readStream
      .schema("id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .writeStream.format("memory").queryName("drain")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    assert(spark.table("drain").count() === 300, "every backlog row lands")
    // rate limit respected: 3 files at 1/trigger ⇒ at least 3 batches
    assert(q.lastProgress.batchId >= 2,
      s"expected ≥3 bounded batches, saw batchId ${q.lastProgress.batchId}")
  }

  test("stream-static enrichment joins each micro-batch against the dim " +
       "with no state store") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EvU]
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "segment")
    val q = Streaming.enrichStream(in.toDF(), dim)
      .select($"event_id", $"user_id", $"segment")
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      in.addData(EvU(1, ts(0), "view", 0, 7), EvU(2, ts(1), "view", 0, 9))
      q.processAllAvailable()
      in.addData(EvU(3, ts(2), "view", 0, 8))
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .as[(Long, Long, Option[String])].collect().toSet
      // matched events carry the dim attr; dim-less user 9 survives with
      // null (left join), across BOTH batches
      assert(rows === Set((1L, 7L, Some("gold")), (2L, 9L, None),
                          (3L, 8L, Some("basic"))))
      // stateless: a stream-static join must report no state store rows
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0),
        s"stream-static join kept state: ${progress.json}")
    } finally q.stop()
  }

  test("watermark drops late events in append-mode tumbling aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = Streaming.tumblingCounts(
      in.toDF().withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.format("memory").queryName("wmk")
      .outputMode("append").start()
    try {
      // hour 0 gets 2 events
      in.addData(Ev(1, ts(5), "a", 1.0), Ev(2, ts(20), "a", 2.0))
      q.processAllAvailable()
      // watermark jumps past hour 0's end (+10 min) -> hour-0 window final
      in.addData(Ev(3, ts(135), "a", 1.0))
      q.processAllAvailable()
      // a latecomer for hour 0 must be DROPPED (watermark ≈ 02:05)
      in.addData(Ev(4, ts(25), "a", 100.0))
      q.processAllAvailable()
      val rows = spark.table("wmk")
        .select($"window.start", $"n", $"sum_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((ts(0), 2L, 3.0)),
        s"hour-0 window wrong or missing: $rows")
      assert(!rows.exists(_._3 == 103.0), "late event leaked into a final window")
    } finally q.stop()
  }

  test("streaming near-dup dedup suppresses a SimHash-colliding doc across batches") {
    implicit val sqlCtx = spark.sqlContext
    // long repetitive base text with an ODD distinct-token count: every
    // SimHash bit-sum is 20·(odd integer), magnitude ≥ 20 — an even
    // count allows 3-vs-3 hash splits where the sum is 0 and a one-token
    // tail decides the bit. Here the tail cannot flip any bit: the
    // near-dup collides on the exact fingerprint by construction.
    val base = ("alpha beta gamma delta epsilon zeta eta " * 20).trim
    val nearDup = base + " zzz"
    val other = ("one two three four five six seven eight nine " * 15).trim
    // precondition: the planted pair really shares a fingerprint, and the
    // distinct doc doesn't (computed via the same native expression)
    val fps = Seq(base, nearDup, other).toDF("text")
      .select(graft.expr.SimHashFunctions.simhash_bits(
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "")).as("fp"))
      .as[String].collect()
    assert(fps(0) === fps(1), "planted near-dup must share the fingerprint")
    assert(fps(0) !== fps(2), "distinct doc must differ")
    val in = MemoryStream[Doc]
    val q = Streaming.nearDupDedupStream(in.toDF())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      in.addData(Doc(1, ts(1), base), Doc(2, ts(2), other))
      q.processAllAvailable()
      in.addData(Doc(3, ts(3), nearDup),
                 Doc(4, ts(4), "completely unrelated fresh content here"))
      q.processAllAvailable()
      val ids = spark.table("neardup").select($"doc_id").as[Long]
        .collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 4L),
        s"near-dup 3 should be suppressed, got $ids")
    } finally q.stop()
  }

  test("stateful dropDuplicates emits each event_id once across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, ts(1), "a", 1.0), Ev(2, ts(2), "a", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts(3), "a", 99.0), Ev(3, ts(4), "a", 3.0)) // 1 is a dup
      q.processAllAvailable()
      val ids = spark.table("dedup").select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
      // first-writer-wins: the duplicate's value never surfaces
      val v1 = spark.table("dedup").where($"event_id" === 1)
        .select($"value").as[Double].head()
      assert(v1 === 1.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds state to the horizon " +
       "(re-emits after eviction, suppresses inside it)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.dedupStreamBounded(in.toDF())
      .writeStream.format("memory").queryName("dedupwm")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, ts(1), "a", 1.0), Ev(2, ts(2), "a", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts(3), "a", 99.0)) // inside horizon: suppressed
      q.processAllAvailable()
      // advance the watermark far past ts(1)+10min so key 1's state evicts
      in.addData(Ev(9, ts(120), "a", 0.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts(125), "a", 42.0)) // after eviction: re-emitted
      q.processAllAvailable()
      val ones = spark.table("dedupwm").where($"event_id" === 1)
        .select($"value").as[Double].collect().sorted
      assert(ones.toSeq === Seq(1.0, 42.0),
        "expected the in-horizon dup suppressed and the post-eviction " +
        s"arrival re-emitted; got ${ones.toSeq}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps the latest value per key (O13 stream)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.KeyedValue]
    val q = Streaming.latestPerKey(in.toDS())
      .writeStream.format("memory").queryName("upsert")
      .outputMode("update").start()
    try {
      in.addData(
        Streaming.KeyedValue(1, ts(1), 10.0),
        Streaming.KeyedValue(2, ts(1), 20.0))
      q.processAllAvailable()
      // newer value for key 1, stale (older) value for key 2
      in.addData(
        Streaming.KeyedValue(1, ts(5), 11.0),
        Streaming.KeyedValue(2, ts(0), 19.0))
      q.processAllAvailable()
      val out = spark.table("upsert").as[Streaming.KeyedValue].collect()
      val latest = out.groupBy(_.k).view.mapValues(_.maxBy(_.ts.getTime).v).toMap
      assert(latest === Map(1L -> 11.0, 2L -> 20.0))
      // the stale update for key 2 produced no row
      assert(!out.exists(r => r.k == 2 && r.v == 19.0))
    } finally q.stop()
  }

  test("transformWithState accumulates per-key totals across micro-batches " +
       "(RocksDB state store)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streaming.KeyedValue]
    val q = Streaming.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("twstotals")
      .outputMode("update").start()
    try {
      in.addData(
        Streaming.KeyedValue(1, ts(1), 10.0),
        Streaming.KeyedValue(1, ts(2), 5.0),
        Streaming.KeyedValue(2, ts(1), 1.0))
      q.processAllAvailable()
      in.addData(
        Streaming.KeyedValue(1, ts(3), 2.5),
        Streaming.KeyedValue(3, ts(3), 7.0))
      q.processAllAvailable()
      val out = spark.table("twstotals").as[Streaming.UserTotals].collect()
      // latest emission per key carries the cross-batch cumulative state
      val latest = out.groupBy(_.k).view.mapValues(_.maxBy(_.n)).toMap
      assert(latest(1L) === Streaming.UserTotals(1L, 3L, 17.5))
      assert(latest(2L) === Streaming.UserTotals(2L, 1L, 1.0))
      assert(latest(3L) === Streaming.UserTotals(3L, 1L, 7.0))
      // batch 1 emitted the intermediate totals for key 1 (n=2), proving
      // the second batch READ state rather than recomputing from scratch
      assert(out.exists(r => r.k == 1L && r.n == 2L && r.total == 15.0))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState event-time timers close sessions on watermark, " +
       "state cleared between sessions") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streaming.KeyedValue]
    // gap 5 min, watermark delay 2 min
    val q = Streaming.timedSessions(in.toDS(), 5L * 60000L, "2 minutes")
      .writeStream.format("memory").queryName("timersessions")
      .outputMode("append").start()
    try {
      // session A for key 1: events at minute 10 and 11 → timer at 16
      in.addData(Streaming.KeyedValue(1, ts(10), 1.0),
                 Streaming.KeyedValue(1, ts(11), 2.0))
      q.processAllAvailable()
      assert(spark.table("timersessions").count() === 0,
        "session closed before the watermark could prove it over")
      // key 2 at minute 30 pushes the watermark to 28 > 16 → A emits
      in.addData(Streaming.KeyedValue(2, ts(30), 7.0))
      q.processAllAvailable()
      val afterA = spark.table("timersessions")
        .as[Streaming.SessionOut].collect()
      assert(afterA.toSet === Set(
        Streaming.SessionOut(1L, 2L, 3.0, ts(11).getTime)),
        s"expected exactly session A, got ${afterA.toSeq}")
      // key 1 returns at minute 40: watermark 38 > 35 closes key 2's
      // session; key 1 starts a FRESH session (state was cleared — its
      // count must not continue from session A)
      in.addData(Streaming.KeyedValue(1, ts(40), 9.0))
      q.processAllAvailable()
      val afterB = spark.table("timersessions")
        .as[Streaming.SessionOut].collect()
      assert(afterB.toSet === Set(
        Streaming.SessionOut(1L, 2L, 3.0, ts(11).getTime),
        Streaming.SessionOut(2L, 1L, 7.0, ts(30).getTime)))
      assert(!afterB.exists(r => r.k == 1L && r.n > 2L),
        "key 1's second session leaked state from its first")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("batch and streaming tumbling aggregations agree on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(1, ts(5), "a", 1.0), Ev(2, ts(20), "b", 2.0),
      Ev(3, ts(65), "a", 3.0), Ev(4, ts(70), "a", 4.0))
    val batch = Streaming.tumblingCounts(events.toDF())
      .select($"window.start", $"event_type", $"n", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val in = MemoryStream[Ev]
    val q = Streaming.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("twin")
      .outputMode("complete").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("twin")
        .select($"window.start", $"event_type", $"n", $"sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("reference refresh loop end-to-end: paged source -> catalog fan-out " +
       "-> exactly-once snapshot publish (forced replay no-ops)") {
    // The reference's full refresh (README.md:156-163): walk the paginated
    // API, fan each page out to the catalog relations, commit atomically —
    // here as ONE pipeline: paged-api micro-batches -> CatalogPipeline
    // fan-out inside foreachBatch -> SnapshotStore.publishVersion pinned to
    // batchId+1. Version 1 is PRE-published from page 1's fan-out, i.e. a
    // previous run crashed AFTER the sink committed but BEFORE the
    // checkpoint advanced — the standard foreachBatch dup window — so the
    // stream's first batch is a forced replay that must no-op.
    import graft.ingest.{CatalogPipeline, CourseFixture}
    import graft.sources.{PagedApiSource, Pagination, SnapshotStore}
    import org.apache.spark.sql.functions.col
    val recs = CourseFixture.records
    val pages = Map(
      "p1" -> Pagination.Page(recs.slice(0, 2), Some("p2")),
      "p2" -> Pagination.Page(recs.slice(2, 3), Some("p3")),
      "p3" -> Pagination.Page(recs.slice(3, 4), None))
    PagedApiSource.register("refresh-e2e", PagedApiSource.FetchSpec(
      startUrl = "p1",
      fetch = url => Right(pages(url)),
      policy = Pagination.catalogPolicy))
    val dir = java.nio.file.Files.createTempDirectory("refresh-e2e").toString
    val table = s"$dir/courses_snap"
    def coursesOf(bodies: Seq[String]): org.apache.spark.sql.DataFrame = {
      val m = CatalogPipeline.fanoutManaged(spark,
        spark.createDataset(bodies).toDF("body"))
      val out = m.relations("courses").localCheckpoint()
      m.release(); out
    }
    // the "crashed previous run" committed page 1 as version 1
    assert(SnapshotStore.publishVersion(coursesOf(recs.slice(0, 2)), table, 1))
    val publishLog =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = spark.readStream
      .format("graft.sources.PagedApiSource")
      .option("fetcher", "refresh-e2e")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!df.isEmpty) {
          val m = CatalogPipeline.fanoutManaged(spark, df.select(col("body")))
          val committed = SnapshotStore.publishVersion(
            m.relations("courses"), table, batchId.toInt + 1)
          publishLog.synchronized {
            publishLog += ((batchId, df.count(), committed))
          }
          m.release()
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    PagedApiSource.unregister("refresh-e2e")
    // batch 0 (page 1) hit the pre-committed version -> replay no-op;
    // batches 1 and 2 committed fresh versions
    val log = publishLog.sortBy(_._1)
    assert(log.map(t => (t._1, t._3)) === Seq((0L, false), (1L, true), (2L, true)),
      s"publish log: $log")
    assert(SnapshotStore.versions(spark, table) === Seq(1, 2, 3))
    // batch twin: the union of the committed snapshots IS the one-shot
    // fan-out of the whole catalog (the 19-col wide projection carries no
    // surrogate keys, so per-page fan-outs compose exactly)
    val streamed = (1 to 3)
      .map(v => SnapshotStore.read(spark, table, Some(v)))
      .reduce(_ unionByName _)
    val twin = CatalogPipeline.fanout(spark, CourseFixture.raw(spark))("courses")
    assert(streamed.columns.sorted === twin.columns.sorted)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(twin.columns.sorted.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(key(streamed) === key(twin))
    assert(streamed.count() === 4)
    spark.catalog.clearCache()
  }

  test("durable index subscriber: kill + restart from the checkpoint " +
       "folds ONLY the new commit, committed index versions stay " +
       "byte-identical, and the final published graph equals the " +
       "one-session batch chain") {
    import graft.ops.{IndexMaintainer, Similarity}
    import graft.sources.SnapshotStore
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val base = sys.props("java.io.tmpdir") + "/graft-snapspec/idxrestart"
    val Seq(vec, idx, meta, ckpt) =
      Seq("vec", "idx", "meta", "ckpt").map(n => s"$base-$n")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vec, idx, meta, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    def m10(c: org.apache.spark.sql.Column) = pmod(c, lit(10))
    val emb = Similarity.embFrame(spark, sfDir)
    SnapshotStore.publish(emb.where(m10(col("vec_id")) =!= 3), vec)
    val cfg = IndexMaintainer.Config(vec, idx, meta)
    val bg = Similarity.nnMemberGraphFor(spark, sfDir,
      m10(col("vec_id")) =!= 3)
    IndexMaintainer.bootstrap(spark, cfg, bg)
    // commit 2 (delete class 7) lands; subscriber run 1 drains it and
    // self-terminates (AvailableNow = the kill point)
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 7)
        .select(col("vec_id"), col("e"), lit("D").as("op")),
      Seq("vec_id"), "op", 2)
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    assert(SnapshotStore.versions(spark, idx) === Seq(1, 2))
    assert(SnapshotStore.read(spark, meta, Some(2))
      .select("action").head().getString(0) === "maintain")
    def manifestBytes(v: Int): Seq[Byte] = {
      val p = new org.apache.hadoop.fs.Path(idx,
        f"_snapshots/v$v%05d.manifest")
      val in = fs.open(p)
      try { val b = in.readAllBytes(); b.toSeq } finally in.close()
    }
    val v2Bytes = manifestBytes(2)
    // commit 3 (insert class 3) lands while the subscriber is DOWN;
    // the restarted run resumes from the checkpoint and folds ONLY it
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 3)
        .select(col("vec_id"), col("e"), lit("I").as("op")),
      Seq("vec_id"), "op", 3)
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    assert(SnapshotStore.versions(spark, idx) === Seq(1, 2, 3),
      "restart must fold exactly the one new commit")
    assert(manifestBytes(2) === v2Bytes,
      "a restarted subscriber must not re-publish a committed version")
    // the published final graph ≡ the q342-style one-session chain
    val tombs = emb.where(m10(col("vec_id")) === 7)
      .select(col("vec_id").as("t"))
    val gd = Similarity.nnDeleteWaveKeys(emb, bg, tombs)._1
    val entries = Similarity.nnEntriesFrom(
      emb.where(m10(col("vec_id")) =!= 3 && m10(col("vec_id")) =!= 7)
        .select("vec_id"))
    val expect = Similarity.nnInsertWaveKeys(emb, gd,
      emb.where(m10(col("vec_id")) === 3).select("vec_id", "e"), entries)
    assert(SnapshotStore.read(spark, idx, Some(3))
        .as[(Long, Long, Long)].collect().toSet
      === expect.as[(Long, Long, Long)].collect().toSet,
      "published graph must equal the batch-session chain edge-for-edge")
    // run 3 with nothing new: a drained checkpoint replays NOTHING
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    assert(SnapshotStore.versions(spark, idx) === Seq(1, 2, 3))
    assert(SnapshotStore.versions(spark, meta) === Seq(1, 2, 3))
  }

  test("index subscriber catch-up: TWO commits drained in ONE batch " +
       "(maxVersionsPerTrigger=2) resolve per key by NET EFFECT — a " +
       "deleted-then-reinserted key re-places — and land the same " +
       "graph as the one-commit-per-batch run") {
    import graft.ops.{IndexMaintainer, Similarity}
    import graft.sources.SnapshotStore
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val base = sys.props("java.io.tmpdir") + "/graft-snapspec/idxcatchup"
    val Seq(vec, idxA, metaA, ckptA, idxB, metaB, ckptB) =
      Seq("vec", "idxA", "metaA", "ckptA", "idxB", "metaB", "ckptB")
        .map(n => s"$base-$n")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vec, idxA, metaA, ckptA, idxB, metaB, ckptB).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    def m10(c: org.apache.spark.sql.Column) = pmod(c, lit(10))
    val emb = Similarity.embFrame(spark, sfDir)
    SnapshotStore.publish(emb.where(m10(col("vec_id")) =!= 3), vec)
    val bg = Similarity.nnMemberGraphFor(spark, sfDir,
      m10(col("vec_id")) =!= 3)
    // k1: a live class-1 member deleted at v2 and RE-inserted at v3 —
    // the cross-step interaction the net-effect fold must get right
    val k1 = emb.where(m10(col("vec_id")) === 1)
      .agg(org.apache.spark.sql.functions.min(col("vec_id")))
      .head().getLong(0)
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 7 || col("vec_id") === k1)
        .select(col("vec_id"), col("e"), lit("D").as("op")),
      Seq("vec_id"), "op", 2)
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 3 || col("vec_id") === k1)
        .select(col("vec_id"), col("e"), lit("I").as("op")),
      Seq("vec_id"), "op", 3)
    // subscriber A: one commit per batch (2 micro-batches)
    val cfgA = IndexMaintainer.Config(vec, idxA, metaA)
    IndexMaintainer.bootstrap(spark, cfgA, bg)
    IndexMaintainer.start(spark, cfgA, ckptA).awaitTermination()
    assert(SnapshotStore.versions(spark, idxA) === Seq(1, 2, 3))
    // subscriber B: both commits in ONE batch
    val cfgB = IndexMaintainer.Config(vec, idxB, metaB,
      maxVersionsPerTrigger = 2)
    IndexMaintainer.bootstrap(spark, cfgB, bg)
    IndexMaintainer.start(spark, cfgB, ckptB).awaitTermination()
    assert(SnapshotStore.versions(spark, idxB) === Seq(1, 2),
      "a 2-commit backlog at max=2 must fold into ONE index version")
    val gA = SnapshotStore.read(spark, idxA, Some(3))
      .as[(Long, Long, Long)].collect().toSet
    val gB = SnapshotStore.read(spark, idxB, Some(2))
      .as[(Long, Long, Long)].collect().toSet
    assert(gA === gB,
      "catch-up fold must land the same graph as per-commit batches")
    // the re-inserted key is PRESENT and the deleted class is not
    assert(gB.exists(_._1 == k1), s"re-inserted key $k1 must re-place")
    assert(gB.forall(e => e._1 % 10 != 7 && e._2 % 10 != 7))
    // and the one-batch meta row saw the NET counters: 1 net delete
    // wave over class 7 ∪ {k1}, inserts = class 3 ∪ {k1}
    val m = SnapshotStore.read(spark, metaB, Some(2))
      .select("n_del", "n_ins", "src_version").head()
    val n7 = emb.where(m10(col("vec_id")) === 7).count()
    val n3 = emb.where(m10(col("vec_id")) === 3).count()
    assert(m.getLong(0) === n7, "net deletes exclude the re-inserted key")
    assert(m.getLong(1) === n3 + 1, "inserts include the re-placed key")
    assert(m.getLong(2) === 3L)
  }

  test("retention interplay: vacuuming the INDEX to its latest keeps " +
       "the subscription alive; vacuuming the SOURCE past the " +
       "checkpoint lag fails the restarted subscriber LOUDLY, naming " +
       "the expired versions") {
    import graft.ops.{IndexMaintainer, Similarity}
    import graft.sources.SnapshotStore
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val base = sys.props("java.io.tmpdir") + "/graft-snapspec/idxretention"
    val Seq(vec, idx, meta, ckpt) =
      Seq("vec", "idx", "meta", "ckpt").map(n => s"$base-$n")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vec, idx, meta, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    def m10(c: org.apache.spark.sql.Column) = pmod(c, lit(10))
    val emb = Similarity.embFrame(spark, sfDir)
    SnapshotStore.publish(emb.where(m10(col("vec_id")) =!= 3), vec)
    val cfg = IndexMaintainer.Config(vec, idx, meta)
    IndexMaintainer.bootstrap(spark, cfg,
      Similarity.nnMemberGraphFor(spark, sfDir,
        m10(col("vec_id")) =!= 3))
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 7)
        .select(col("vec_id"), col("e"), lit("D").as("op")),
      Seq("vec_id"), "op", 2)
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    assert(SnapshotStore.versions(spark, idx) === Seq(1, 2))
    // INDEX-side retention: dropping index/meta history to the latest
    // version is always safe — the subscriber only ever reads its
    // previous version, which keepLast=1 retains
    SnapshotStore.vacuum(spark, idx, keepLast = 1)
    SnapshotStore.vacuum(spark, meta, keepLast = 1)
    assert(SnapshotStore.versions(spark, idx) === Seq(2))
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 3)
        .select(col("vec_id"), col("e"), lit("I").as("op")),
      Seq("vec_id"), "op", 3)
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    assert(SnapshotStore.versions(spark, idx) === Seq(2, 3),
      "a vacuumed index must not stall the subscription")
    assert(SnapshotStore.read(spark, idx, Some(3))
      .where(pmod(col("u"), lit(10)) === 3).count() > 0)
    // SOURCE-side: a commit lands while the subscriber is down, then
    // vacuum expires the versions inside the checkpoint lag — the
    // restart must fail with the named gap, not a missing-file trace
    SnapshotStore.applyCdcVersion(spark, vec,
      emb.where(m10(col("vec_id")) === 1)
        .select(col("vec_id"), col("e"), lit("D").as("op")),
      Seq("vec_id"), "op", 4)
    SnapshotStore.vacuum(spark, vec, keepLast = 1)
    assert(SnapshotStore.versions(spark, vec) === Seq(4))
    val q = IndexMaintainer.start(spark, cfg, ckpt)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("expired") &&
        m.contains("checkpoint lag")),
      s"must name the retention violation, got: ${msgs(e).mkString(" | ")}")
    // the index is UNCHANGED by the failed run
    assert(SnapshotStore.versions(spark, idx) === Seq(2, 3))
  }

  test("auto-firing health policy: a delete chain crosses the " +
       "threshold MID-STREAM and the published lineage reads " +
       "maintain/maintain/retrain, with the retrained index free of " +
       "every tombstoned class") {
    import graft.ops.{IndexMaintainer, Similarity}
    import graft.sources.SnapshotStore
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val base = sys.props("java.io.tmpdir") + "/graft-snapspec/idxpolicy"
    val Seq(vec, idx, meta, ckpt) =
      Seq("vec", "idx", "meta", "ckpt").map(n => s"$base-$n")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(vec, idx, meta, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    def m10(c: org.apache.spark.sql.Column) = pmod(c, lit(10))
    val emb = Similarity.embFrame(spark, sfDir)
    SnapshotStore.publish(emb, vec)
    // classes 7, 3, 1 deleted in sequence: cumulative deleted-since-
    // retrain ≈ 1111 / 2500 / 4286 bp — threshold 3000 fires exactly
    // at the THIRD wave
    val cfg = IndexMaintainer.Config(vec, idx, meta,
      retrainThresholdBp = Some(3000L),
      retrain = Some(keys =>
        Similarity.nnDescentGraphKeys(spark, sfDir, keys)))
    IndexMaintainer.bootstrap(spark, cfg, Similarity.nnGraphFor(spark, sfDir))
    Seq(7, 3, 1).zipWithIndex.foreach { case (cls, i) =>
      SnapshotStore.applyCdcVersion(spark, vec,
        emb.where(m10(col("vec_id")) === cls)
          .select(col("vec_id"), col("e"), lit("D").as("op")),
        Seq("vec_id"), "op", i + 2)
    }
    IndexMaintainer.start(spark, cfg, ckpt).awaitTermination()
    val lineage = (1 to 4).map(v =>
      SnapshotStore.read(spark, meta, Some(v))
        .select("action", "fired", "dels_since", "live").head())
    assert(lineage.map(_.getString(0))
      === Seq("base", "maintain", "maintain", "retrain"),
      s"got ${lineage.map(_.getString(0))}")
    assert(lineage.map(_.getLong(1)) === Seq(0L, 0L, 0L, 1L))
    // decision inputs accumulate across the chain and reflect the table
    val l0 = lineage.head.getLong(3)
    assert(lineage(3).getLong(2) === l0 - lineage(3).getLong(3),
      "dels_since must equal total deletes since the base")
    // the retrained index holds NO tombstoned class on either side
    val g4 = SnapshotStore.read(spark, idx, Some(4))
      .as[(Long, Long, Long)].collect()
    assert(g4.nonEmpty)
    assert(g4.forall { case (u, v, _) =>
      Seq(u % 10, v % 10).forall(m => m != 7 && m != 3 && m != 1) },
      "retrained graph must be ghost-free")
    // degree bound holds (a structural retrain invariant)
    assert(g4.groupBy(_._1).values.forall(_.size <= 4))
  }
}
