package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** O1 in STREAMING form: the paginated cursor API as a DataSource V2
  * `MicroBatchStream` where ONE PAGE = ONE MICRO-BATCH = (with
  * [[JdbcSink.upsertTx]]/`append` in `foreachBatch`) ONE TRANSACTION —
  * the reference's commit-per-page atomicity unit
  * (course_catalog.py:204–212) expressed as a `readStream` pipeline
  * instead of a batch driver loop.
  *
  * Cursor protocols are inherently serial (page N+1's URL arrives with
  * page N), so ADMISSION stays on the driver: `latestOffset` follows the
  * cursor one page per micro-batch, buffering the page's record bodies;
  * `planInputPartitions` ships each buffered page as one partition whose
  * reader emits (page_id, body) rows on the executors; `commit` frees
  * pages the checkpoint has passed. This is the same driver-admission /
  * executor-read split Spark's own socket and rate sources use — the
  * difference from the batch [[Pagination.fetchAll]] path is that
  * downstream transforms and sinks run per page with checkpointed
  * progress, so a crash resumes at the first uncommitted page instead of
  * refetching the whole chain.
  *
  * The fetch function cannot ride through DSv2's string-map options, so
  * fetchers REGISTER under a name ([[PagedApiSource.register]]) and the
  * option `fetcher` selects one — production registers an HTTP client,
  * tests register fixtures. Retry classification reuses
  * [[Pagination.fetchOnePage]] (same policies as the batch path); an
  * Abort decision ends the stream gracefully at the last complete page.
  */
object PagedApiSource {
  /** Everything a stream needs to drive one cursor chain. */
  final case class FetchSpec(
      startUrl: String,
      fetch: String => Either[Pagination.Failure, Pagination.Page],
      policy: Pagination.Failure => Pagination.Decision,
      sleep: Int => Unit = _ => (),
      maxRetriesPerPage: Int = 10)

  private val registry = new ConcurrentHashMap[String, FetchSpec]()

  def register(name: String, spec: FetchSpec): Unit = registry.put(name, spec)
  def unregister(name: String): Unit = registry.remove(name)
  private[sources] def lookup(name: String): FetchSpec = {
    val s = registry.get(name)
    require(s != null, s"no fetcher registered under '$name' " +
      "(call PagedApiSource.register before starting the stream)")
    s
  }

  val schema: StructType = StructType(Seq(
    StructField("page_id", IntegerType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

final class PagedApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "paged-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedApiTable(properties.get("fetcher"))
}

private final class PagedApiTable(fetcherName: String) extends Table with SupportsRead {
  require(fetcherName != null, "option 'fetcher' is required")
  override def name(): String = s"paged-api($fetcherName)"
  override def schema(): StructType = PagedApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PagedApiSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PagedApiMicroBatchStream(fetcherName)
      }
    }
}

/** Offset = number of pages fully admitted (cursor position). */
private final case class PageOffset(pages: Int) extends Offset {
  override def json(): String = pages.toString
}

private final class PagedApiMicroBatchStream(fetcherName: String)
  extends MicroBatchStream with SupportsAdmissionControl {

  private val spec = PagedApiSource.lookup(fetcherName)
  // one limiter across the stream's lifetime: the throttle schedule
  // (300 s/1k, 1800 s/10k) is cumulative over records, like the reference.
  private val limiter = new Pagination.RateLimiter(spec.sleep)

  // driver-side admission state
  private var nextUrl: Option[String] = Some(spec.startUrl)
  private var admitted = 0 // pages fetched == next page index
  private val buffered = new ConcurrentHashMap[Int, Seq[String]]()

  override def initialOffset(): Offset = PageOffset(0)

  /** Fetch the next page at the cursor (if any), buffering its records.
    * Returns false when the chain is exhausted or the policy aborted.
    */
  private def fetchNext(): Boolean = nextUrl match {
    case Some(url) =>
      val attempt = Pagination.fetchOnePage(
        url, spec.fetch, spec.policy, spec.sleep, spec.maxRetriesPerPage)
      attempt.page match {
        case Some(page) =>
          buffered.put(admitted, page.results)
          limiter.recordsIngested(page.results.size)
          admitted += 1
          nextUrl = page.next
          true
        case None => // Abort policy: stop at the last complete page
          nextUrl = None
          false
      }
    case None => false
  }

  // SupportsAdmissionControl: Spark calls the 2-arg form below instead.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(startOffset, limit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission with RESTART AWARENESS. `start` is the checkpoint's
    * committed position; a fresh stream's cursor is back at page 0, so
    * the reported offset must never fall below `start` — a regressed
    * offset would make MicroBatchExecution replay already-committed
    * pages as "new" data, duplicating records into append sinks. The
    * cursor chain has no random access, so recovery re-walks it up to
    * `start` (refetched pages are buffered but evicted before emission)
    * and only then admits AT MOST one new page: micro-batch boundaries
    * == page boundaries, which is what makes foreachBatch
    * page-transactional.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PageOffset].pages
    while (admitted < s && fetchNext()) ()
    if (admitted >= s) fetchNext()
    // if the chain ended short of the checkpoint (source shrank), still
    // report `start`: start == end means "no new batch", a graceful idle
    // rather than a duplicate-emitting regression.
    PageOffset(math.max(admitted, s))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].pages
    val e = end.asInstanceOf[PageOffset].pages
    // RESTART RECOVERY: after a crash Spark replays the batch recorded in
    // the offset log against a FRESH stream whose buffer is empty and
    // whose cursor is back at the start. A cursor protocol has no random
    // access, so recovery re-walks the chain from the beginning up to the
    // requested pages (already-committed pages are fetched and dropped by
    // `commit`-driven eviction below, never re-emitted). Replayed page
    // contents are whatever the API serves NOW — same as the reference,
    // which would also refetch after a crash mid-run.
    while (admitted < e && fetchNext()) ()
    require(admitted >= e,
      s"cursor chain ended at $admitted pages but the offset log expects $e " +
      "(source shrank between runs)")
    // pages before `start` were committed in the previous run: fetched
    // during the re-walk (the cursor must pass through them) but never
    // re-emitted — free them now.
    buffered.keySet().forEach(k => if (k < s) buffered.remove(k))
    (s until e).map { pageId =>
      val rows = buffered.get(pageId)
      require(rows != null,
        s"page $pageId was evicted by a later commit — offset log went backwards")
      PagePartition(pageId, rows): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PagePartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.bodies.length }
        override def get(): InternalRow =
          InternalRow(p.pageId, UTF8String.fromString(p.bodies(i)))
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[PageOffset].pages
    buffered.keySet().forEach(k => if (k < e) buffered.remove(k))
  }

  override def deserializeOffset(json: String): Offset = PageOffset(json.toInt)
  override def stop(): Unit = buffered.clear()
}

private final case class PagePartition(pageId: Int, bodies: Seq[String])
  extends InputPartition
