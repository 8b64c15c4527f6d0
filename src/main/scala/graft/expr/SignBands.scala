package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded sign-bit packing of an embedding as ONE expression — the native
  * replacement for q302's 64-term `when` chain (eight 8-bit words, each a
  * sum of eight conditionals over `element_at` calls). The chain codegens
  * to 64 array bound-checks and branch trees per row; this kernel walks
  * the array once and shifts bits in place, keeping the signature
  * projection a single tight loop inside whole-stage codegen.
  *
  * Contract (bit-identical with the `when`-chain and the DuckDB CASE-sum
  * formulation — asserted in SimilaritySpec): the input splits into
  * `bands` equal contiguous slices; band w's bit i (value 2^i) is set iff
  * element [w·(n/bands) + i] is strictly > 0. NULL elements contribute a
  * 0 bit (the strict comparison's false branch — parquet float arrays
  * never carry them; safety contract, not a hot case). The array length
  * must divide evenly into `bands`.
  */
case class SignBands(child: Expression, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(in: Any): Any =
    SignBands.compute(in.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SignBands.compute($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, bands: Int): ArrayData = {
    val n = arr.numElements()
    require(n % bands == 0,
      s"sign_bands: array length $n not divisible into $bands bands")
    val per = n / bands
    val out = new Array[Long](bands)
    var w = 0
    while (w < bands) {
      var acc = 0L
      var i = 0
      while (i < per) {
        val idx = w * per + i
        if (!arr.isNullAt(idx) && arr.getDouble(idx) > 0.0)
          acc |= (1L << i)
        i += 1
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }
}

object SignFunctions {
  /** DataFrame-DSL entry point. */
  def sign_bands(e: Column, bands: Int): Column =
    bridge.column(SignBands(bridge.expression(e), bands))
}
