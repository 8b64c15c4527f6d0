package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the fuzzy-match scorer Spark's built-ins
  * lack (only levenshtein ships). Canonical definition (Winkler 1990):
  * Jaro = (m/|a| + m/|b| + (m−t)/m) / 3 with the match window
  * ⌊max(|a|,|b|)/2⌋−1 and t = half the out-of-order matches; Winkler
  * adds min(4, common-prefix)·0.1·(1−jaro) ONLY when jaro > 0.7 (the
  * standard boost threshold). This exact contract is what DuckDB's
  * `jaro_winkler_similarity` implements, which is what makes the
  * q155 oracle a true independent twin (both engines round to 4).
  *
  * Codegen is one static call (the StaticInvoke pattern shared by the
  * other six native expressions): the scorer runs inside
  * WholeStageCodegen with two stack buffers and no allocation beyond
  * the char arrays.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaroWinklerExpr.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.toCharArray
    val b = ub.toString.toCharArray
    val (la, lb) = (a.length, b.length)
    // empty-vs-empty scores 0.0 — the DuckDB/RapidFuzz convention (some
    // libraries say 1.0); pinned here because the oracle is DuckDB
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
        a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object JaroWinklerFunctions {
  /** DataFrame-DSL entry point. */
  def jaro_winkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerExpr(bridge.expression(a), bridge.expression(b)))
}
