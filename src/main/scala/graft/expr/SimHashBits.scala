package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a token array as ONE expression — the native
  * replacement for q46's explode → md5 → 32 conditional sums → groupBy
  * pipeline. The explode multiplies the row count by the token count and
  * the groupBy shuffles 32 partial sums per document; this expression
  * folds the token array in place, so the whole query becomes a
  * shuffle-free projection (the only exchange left is the final sort).
  *
  * Bit-identical contract with the SQL/oracle formulation (asserted in
  * TextSimSpec): bit j is set iff
  * `sum over tokens of (substring(md5(tok), j+1, 1) IN ('8'..'f') ? 1 : -1) > 0`
  * — i.e. the high bit of hex nibble j of each token's MD5, counted
  * ±1, thresholded at zero. Nibble j's high bit is read directly from
  * digest byte j/2 (bit 7 for even j, bit 3 for odd j) — no hex
  * encoding, no substrings. Duplicate tokens count every occurrence,
  * exactly like the exploded form.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(in: Any): Any =
    SimHashBits.compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashBits.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  /** Static kernel shared by interpreted eval and generated code.
    * NULL elements are SKIPPED (the tokenizer never emits them; this is
    * a safety contract against NPE inside the codegen'd projection, not
    * a hot case).
    */
  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    val md = DigestUtil.md5()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 32) {
          val b = d(j >> 1)
          val hi = if ((j & 1) == 0) (b >> 7) & 1 else (b >> 3) & 1
          counts(j) += (if (hi == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val chars = new Array[Char](32)
    var j = 0
    while (j < 32) {
      chars(j) = if (counts(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(chars))
  }
}

object SimHashFunctions {
  /** DataFrame-DSL entry point. */
  def simhash_bits(tokens: Column): Column =
    bridge.column(SimHashBits(bridge.expression(tokens)))
}
