package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.bridge
import java.nio.ByteBuffer

/** Grouped TOP-K as a custom Catalyst `TypedImperativeAggregate` — the
  * aggregation-machinery tier of the custom-operator ladder (the codegen
  * `Expression`s in this package are scalar; `ops/Similarity`'s centroid
  * is a typed Dataset `Aggregator`; this is the IMPERATIVE Catalyst
  * aggregate with an opaque buffer, the surface Spark's own
  * `percentile`/`collect_list` are built on).
  *
  * Semantics: `top_k_by(payload, ord, k)` keeps the k (payload: long)
  * values with the LARGEST (ord: long) keys, ties broken by larger
  * payload, and evaluates to the payloads ordered descending — the
  * "top-3 orders per priority" report WITHOUT a window.
  *
  * Why it matters at 100 TB: the window form (`row_number() OVER
  * (PARTITION BY g ORDER BY v DESC) <= k`) must SORT each partition of
  * the fact table (WindowGroupLimit prunes rows but still sorts what
  * remains), and every surviving row rides the shuffle. This aggregate
  * runs on the `ObjectHashAggregate` path with a PARTIAL step: each map
  * task reduces its input to ≤ k entries PER GROUP before the exchange,
  * so the shuffle carries at most (groups × mappers × k) fixed-width
  * entries and nothing is ever globally sorted — the same partial-state
  * shape as sum/count, applied to top-k. Buffer is a bounded min-heap
  * (O(log k) update, O(k) merge, 4+16k-byte serialization).
  */
case class TopKByAgg(
    payload: Expression, ord: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"top_k_by: k must be a foldable integer, got $other")
  }
  require(kExpr.foldable, "top_k_by: k must be a literal")

  override def checkInputDataTypes(): TypeCheckResult =
    if (payload.dataType != LongType || ord.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (bigint payload, bigint ord), got " +
          s"(${payload.dataType.sql}, ${ord.dataType.sql}) — cast the inputs")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("top_k_by: k must be an int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(payload, ord, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val p = payload.eval(input)
    val o = ord.eval(input)
    // SQL aggregate semantics: null inputs are skipped, not ranked
    if (p != null && o != null)
      buf.offer(o.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.offer(b.ords(i), b.payloads(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map(_._2))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.ords(i)); bb.putLong(buf.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(payload = newChildren(0), ord = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "top_k_by"
}

/** Bounded min-heap over (ord, payload) pairs — the smallest ranked pair
  * sits at index 0 and is evicted when a larger one arrives. Plain
  * parallel long arrays: no boxing, 16 bytes/entry, allocation-free
  * steady state.
  */
final class TopKBuffer(k: Int) {
  val ords = new Array[Long](k)
  val payloads = new Array[Long](k)
  var size = 0

  @inline private def less(i: Int, j: Int): Boolean =
    ords(i) < ords(j) || (ords(i) == ords(j) && payloads(i) < payloads(j))
  @inline private def lessThan(o: Long, p: Long, i: Int): Boolean =
    o < ords(i) || (o == ords(i) && p < payloads(i))

  private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && less(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val (l, r) = (2 * i + 1, 2 * i + 2)
      var m = i
      if (l < size && less(l, m)) m = l
      if (r < size && less(r, m)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def offer(o: Long, p: Long): Unit =
    if (size < k) {
      ords(size) = o; payloads(size) = p; size += 1; siftUp(size - 1)
    } else if (k > 0 && !lessThan(o, p, 0) && (o != ords(0) || p != payloads(0))) {
      ords(0) = o; payloads(0) = p; siftDown()
    }

  /** payload values ordered by (ord, payload) descending. */
  def sortedDesc: Array[(Long, Long)] =
    (0 until size).map(i => (ords(i), payloads(i))).toArray
      .sortBy { case (o, p) => (-o, -p) }
}

object TopKByAgg {
  /** DataFrame entry: `top_k_by(payload, ord, k)` → array<long>, largest
    * ord first.
    */
  def top_k_by(payload: Column, ord: Column, k: Int): Column =
    bridge.column(TopKByAgg(
      bridge.expression(payload), bridge.expression(ord),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** SQL builder (GraftExtensions / [[register]]): arity here, types at
    * analysis via checkInputDataTypes.
    */
  private[expr] val builder: Seq[Expression] => Expression = { children =>
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"top_k_by requires exactly 3 arguments, got ${children.length}")
    TopKByAgg(children.head, children(1), children(2))
  }

  private def info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopKByAgg].getName, "top_k_by")

  /** Register for SQL text on a live session (post-startup alternative
    * to GraftExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    bridge.registerFunction(spark, "top_k_by", info, builder)
}
