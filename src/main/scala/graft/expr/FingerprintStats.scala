package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q48's content-sampled fingerprint summary as ONE expression over the
  * shingle array: count, 1/16 content-defined sample size (md5 starting
  * with hex '0'), and the min/max sampled hash — replacing explode →
  * md5 → conditional aggregates → left-anti union for empty docs. The
  * whole query becomes a shuffle-free projection, and the empty-doc
  * branch is just the expression's zero case (0, 0, NULL, NULL).
  *
  * Bit-identical contract with the exploded/oracle formulation
  * (TextSimSpec): hashes are lowercase-hex MD5; "sampled" means digest
  * byte 0's high nibble is 0 (== leading hex char '0'); min/max compare
  * the full 32-hex string, which equals byte-wise unsigned comparison of
  * the raw digest (hex encoding is order-preserving), so digests are
  * compared raw and hex-encoded once at the end.
  */
case class FingerprintStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("fp_min", StringType, nullable = true),
    StructField("fp_max", StringType, nullable = true)))
  override def prettyName: String = "fingerprint_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(in: Any): Any =
    FingerprintStats.compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.FingerprintStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintStats =
    copy(child = newChild)
}

object FingerprintStats {
  import DigestUtil.HexChars

  private def hex(d: Array[Byte]): UTF8String = {
    val chars = new Array[Char](32)
    var i = 0
    while (i < 16) {
      chars(2 * i) = HexChars((d(i) >> 4) & 0xF)
      chars(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromString(new String(chars))
  }

  /** byte-wise unsigned compare == lexicographic compare of the hex form */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** NULL elements are SKIPPED and excluded from n_shingles (the shingle
    * builder never emits them — `concat_ws` can't produce NULL — so this
    * is a safety contract against NPE, not a hot case).
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val md = DigestUtil.md5()
    var count = 0L
    var sampled = 0L
    var minD: Array[Byte] = null
    var maxD: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        count += 1
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        if (((d(0) >> 4) & 0xF) == 0) { // leading hex char '0'
          sampled += 1
          if (minD == null || less(d, minD)) minD = d
          if (maxD == null || less(maxD, d)) maxD = d
        }
      }
      i += 1
    }
    InternalRow(count, sampled,
      if (minD == null) null else hex(minD),
      if (maxD == null) null else hex(maxD))
  }
}

object FingerprintFunctions {
  /** DataFrame-DSL entry point. */
  def fingerprint_stats(shingles: Column): Column =
    bridge.column(FingerprintStats(bridge.expression(shingles)))
}
