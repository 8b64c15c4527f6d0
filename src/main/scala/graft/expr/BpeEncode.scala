package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode — the kernel replacement for `ops/Bpe.mergePass`'s
  * chained higher-order `aggregate` folds (16 interpreted lambda passes,
  * each rebuilding the symbol array through Catalyst eval, ~65 µs/word).
  * Here the whole merge chain is one static call per word: split to char
  * symbols once, then each merge is an in-place left-to-right compaction
  * scan over a plain String[] — no per-element lambda dispatch, no
  * intermediate ArrayData.
  *
  * The contract is EXACTLY the fold's (asserted bit-for-bit in BpeSpec):
  * merges apply in rank order, one left-to-right non-overlapping pass
  * each; a fused symbol never re-merges within its own pass (the scan
  * compares the already-written slot `out[w-1]`, which after a merge
  * holds `l+r` — it can only re-trigger if `l+r == l`, impossible for
  * non-empty `r`).
  *
  * Codegen is a single static call (StaticInvoke pattern, like
  * MinHashSigs): the projection stays inside WholeStageCodegen with no
  * interpreted-eval boundary; the merge table rides along as a codegen
  * reference object, flattened to [l, r, fused] triples so the hot loop
  * does no tuple unboxing or string concat.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
                         byteLevel: Boolean = false)
    extends UnaryExpression {
  require(merges.nonEmpty && merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merges must be non-empty pairs of non-empty symbols")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  @transient private lazy val flat: Array[String] =
    merges.flatMap { case (l, r) => Seq(l, r, l + r) }.toArray

  override def nullSafeEval(in: Any): Any =
    if (byteLevel) BpeEncodeExpr.computeBytes(in.asInstanceOf[UTF8String], flat)
    else BpeEncodeExpr.compute(in.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    val fn = if (byteLevel) "computeBytes" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.BpeEncodeExpr.$fn($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {

  /** Static kernel shared by interpreted eval and generated code.
    * `flat` is [l, r, fused] triples in rank order.
    */
  def compute(word: UTF8String, flat: Array[String]): ArrayData = {
    val s = word.toString
    val n = s.length
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
    var len = n
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1); val fused = flat(m + 2)
      var w = 0
      i = 0
      while (i < len) {
        if (w > 0 && syms(i) == r && syms(w - 1) == l) syms(w - 1) = fused
        else { syms(w) = syms(i); w += 1 }
        i += 1
      }
      len = w
      m += 3
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** BYTE-LEVEL kernel (GPT-2 shape): initial symbols are the word's
    * UTF-8 BYTES as 2-hex-digit strings (uppercase, matching `hex` on
    * both engines), then the same in-place merge scan as [[compute]].
    * Every byte is in the base alphabet, so any string encodes with no
    * unknown token and decoding is exact hex concatenation.
    */
  def computeBytes(word: UTF8String, flat: Array[String]): ArrayData = {
    val bytes = word.getBytes
    val n = bytes.length
    val syms = new Array[String](n)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      syms(i) = new String(
        Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
      i += 1
    }
    var len = n
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1); val fused = flat(m + 2)
      var w = 0
      i = 0
      while (i < len) {
        if (w > 0 && syms(i) == r && syms(w - 1) == l) syms(w - 1) = fused
        else { syms(w) = syms(i); w += 1 }
        i += 1
      }
      len = w
      m += 3
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

object BpeFunctions {
  /** DataFrame-DSL entry point. */
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeEncodeExpr(bridge.expression(word), merges))

  /** Byte-level entry point: symbols are 2-hex-digit UTF-8 bytes. */
  def bpe_encode_bytes(word: Column, merges: Seq[(String, String)]): Column =
    bridge.column(
      BpeEncodeExpr(bridge.expression(word), merges, byteLevel = true))
}
