package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  IntegerType}

/** All M product-quantization codes of a float vector in ONE pass — the
  * native replacement for the unrolled/HOF encode in
  * `ops/Similarity.q111PqTopk`. Same lesson as [[MinHashSigs]]: the
  * declarative formulations of this per-row kernel are not
  * codegen-friendly (higher-order functions are CodegenFallback; a fully
  * unrolled scalar tree of ~2000 nodes defeats both the JIT and the
  * fallback interpreter — measured ~3 ms/row either way), while a static
  * compiled kernel is O(M·K·SUB) tight float math, ~µs/row.
  *
  * Bit-identical contract with the DuckDB oracle (asserted via the q111
  * hash match and the SimilaritySpec driver-side recompute): for each
  * subspace s, code_s = argmin over the codebook of
  * round(Σx² − 2·Σxc + Σc², 6) with ties broken by ascending code id;
  * every Σ accumulates left-to-right in double, and rounding is
  * Spark/DuckDB `round(_, 6)` (BigDecimal HALF_UP on the canonical
  * decimal representation).
  *
  * The codebook rides the plan as a reference object (the broadcast-task
  * -binary shape of production PQ); Σc² per (code, subspace) is
  * precomputed once at kernel construction, not per row.
  */
case class PqCodes(child: Expression, kernel: PqCodes.Kernel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.simpleString}")
  }

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(in: Any): Any =
    kernel.compute(in.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("pqKernel", kernel, classOf[PqCodes.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kRef.compute($c, $isDouble);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  /** Compiled-once encode kernel. `cb(k)` is code k's full-width centroid
    * (codes must arrive sorted ascending so iteration order IS the
    * tiebreak order); `m` subspaces of `sub = dim/m` dims each.
    */
  final class Kernel(val cids: Array[Int], cb: Array[Array[Double]],
                     m: Int, sub: Int) extends Serializable {
    require(cb.nonEmpty && cb.forall(_.length == m * sub),
      s"codebook centroids must all be ${m * sub}-wide")
    require(cids.length == cb.length, "one id per centroid")
    require(cids.sameElements(cids.sorted), "codebook must be cid-sorted")

    // Σc² per (code, subspace), left-to-right — plan-time constants
    private val cc: Array[Array[Double]] = cb.map { c =>
      Array.tabulate(m) { s =>
        var acc = 0.0
        var j = s * sub
        while (j < (s + 1) * sub) { acc += c(j) * c(j); j += 1 }
        acc
      }
    }

    private def round6(d: Double): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    def compute(arr: ArrayData, isDouble: Boolean): ArrayData = {
      if (arr.numElements() != m * sub) return null
      @inline def el(i: Int): Double =
        if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      val codes = new Array[Any](m)
      var s = 0
      while (s < m) {
        val lo = s * sub
        var xx = 0.0
        var j = 0
        while (j < sub) {
          val v = el(lo + j)
          xx += v * v
          j += 1
        }
        var bestD = Double.PositiveInfinity
        var bestC = -1
        var k = 0
        while (k < cb.length) {
          val c = cb(k)
          var xc = 0.0
          j = 0
          while (j < sub) {
            xc += el(lo + j) * c(lo + j)
            j += 1
          }
          val d = round6(xx - 2.0 * xc + cc(k)(s))
          if (d < bestD) { bestD = d; bestC = cids(k) } // strict < ⇒ first
          k += 1                                        // (lowest cid) wins ties
        }
        codes(s) = bestC
        s += 1
      }
      new GenericArrayData(codes)
    }
  }

  /** Column-level factory (codebook sorted by cid inside). */
  def pq_codes(v: Column, codebook: Seq[(Int, IndexedSeq[Double])],
               m: Int): Column = {
    val sorted = codebook.sortBy(_._1)
    val dim = sorted.head._2.length
    val kernel = new Kernel(sorted.map(_._1).toArray,
      sorted.map(_._2.toArray).toArray, m, dim / m)
    bridge.column(PqCodes(bridge.expression(v), kernel))
  }
}
