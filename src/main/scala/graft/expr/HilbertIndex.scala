package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index (native expression #10) — the space-filling
  * layout key with strictly better locality than z-order (q132): along
  * the Hilbert walk every consecutive cell is an adjacent cell in the
  * plane (Manhattan distance 1), whereas the Z walk jumps across the
  * key space at every quadrant boundary, so range scans over
  * Hilbert-clustered files touch fewer distant key regions. This is the
  * standard iterative xy→d transform (Hilbert 1891; the public
  * algorithm in Hamilton's compact form): per level, take the top bits
  * of x and y, accumulate the quadrant's step count, and rotate the
  * frame. [[HilbertBits]] fixed levels keep the curve order a plan
  * constant; inputs are masked into the grid, so any non-negative key
  * pair is valid.
  *
  * Codegen is the StaticInvoke pattern shared by the other nine native
  * expressions — one static call, a tight 16-iteration integer loop,
  * zero allocation.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndexExpr.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expr.HilbertIndexExpr.xy2d($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {

  /** Curve order: a 2^16 × 2^16 grid — plenty for file-layout keys. */
  val HilbertBits: Int = 16

  /** Static kernel shared by interpreted eval and generated code.
    * Inputs are masked to [[HilbertBits]] bits. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    val mask = (1L << HilbertBits) - 1L
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (HilbertBits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is preserved
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object HilbertFunctions {
  /** DataFrame-DSL entry point. */
  def hilbert_index(x: Column, y: Column): Column =
    bridge.column(HilbertIndexExpr(
      bridge.expression(x), bridge.expression(y)))
}
