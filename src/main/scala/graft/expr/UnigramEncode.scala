package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation against a unigram piece vocabulary (Kudo 2018,
  * the SentencePiece unigram model) — native expression #13, the E-step
  * kernel of the q327 trainer. Dynamic programming over word positions:
  * dp[j] = best of dp[i] + piece(i..j) over i in [j-MaxPiece, j).
  *
  * "Best" is the integer surrogate objective that keeps every EM round
  * cross-engine hashable (the q317 integer-bp discipline): minimize
  * pieces·10¹² − Σ piece-count, ties by the lexicographically smaller
  * comma-joined path. True unigram Viterbi maximizes Σ log p(piece);
  * with p ∝ count this objective is its order-exact integer stand-in
  * for the dominant piece-count regime and — unlike float log-probs —
  * two engines agree on every argmax bit for bit. The DuckDB twin
  * unrolls the SAME dp as 16 chained stages with the same (score, path)
  * window cut, so both sides keep exactly one optimum per position.
  *
  * The vocabulary arrives as LITERAL aligned arrays (pieces, counts) —
  * the trained vocab is driver-bounded (≤ ~130 entries) and collected
  * between EM rounds, the q147 argmax-collect discipline. The piece map
  * is memoized per (thread, pieces-reference) like [[AcCountExpr]];
  * foldability is enforced so the reference memo is sound.
  */
case class UnigramEncodeExpr(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
        if (second.foldable && third.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires foldable (literal) vocab arrays")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>, array<bigint>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def nullSafeEval(word: Any, pieces: Any, counts: Any): Any =
    UnigramEncodeExpr.bestPath(word.asInstanceOf[UTF8String],
      pieces.asInstanceOf[ArrayData], counts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p, c) =>
      s"${ev.value} = graft.expr.UnigramEncodeExpr.bestPath($w, $p, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): UnigramEncodeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramEncodeExpr {

  private val MaxPiece = 4
  private val Big = 1000000000000L

  /** Per-thread (vocab-reference → piece map) memo — sound because the
    * vocab arrays are enforced plan-time literals. */
  // value type is BOXED java.lang.Long on purpose: with a primitive
  // Long value type, get() on a missing key returns null and silently
  // unboxes to 0 — every substring would "exist" with count 0
  private val cache =
    new ThreadLocal[(AnyRef, java.util.HashMap[String, java.lang.Long])]

  private def dictFor(pieces: ArrayData, counts: ArrayData)
      : java.util.HashMap[String, java.lang.Long] = {
    val memo = cache.get()
    if (memo != null && (memo._1 eq pieces)) memo._2
    else {
      require(pieces.numElements() == counts.numElements(),
        "unigram_encode: pieces/counts must align")
      val m = new java.util.HashMap[String, java.lang.Long](
        pieces.numElements() * 2)
      var i = 0
      while (i < pieces.numElements()) {
        m.put(pieces.getUTF8String(i).toString,
          java.lang.Long.valueOf(counts.getLong(i)))
        i += 1
      }
      cache.set((pieces, m))
      m
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def bestPath(word: UTF8String, pieces: ArrayData,
               counts: ArrayData): ArrayData = {
    val dict = dictFor(pieces, counts)
    val w = word.toString
    val n = w.length
    val INF = Long.MaxValue
    val score = Array.fill(n + 1)(INF)
    val path = new Array[String](n + 1)
    score(0) = 0L
    path(0) = ""
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPiece)
      while (i < j) {
        if (score(i) != INF) {
          val piece = w.substring(i, j)
          val c: java.lang.Long = dict.get(piece)
          if (c != null) {
            val sc = score(i) + (Big - c.longValue())
            val p = if (path(i).isEmpty) piece else path(i) + "," + piece
            if (sc < score(j) || (sc == score(j) && p < path(j))) {
              score(j) = sc
              path(j) = p
            }
          }
        }
        i += 1
      }
      j += 1
    }
    require(score(n) != INF, s"unigram_encode: unsegmentable word '$w'")
    ArrayData.toArrayData(
      path(n).split(",").map(UTF8String.fromString(_)))
  }
}

object UnigramFunctions {
  /** DataFrame-DSL entry: Viterbi-best segmentation of `word` under the
    * literal (pieces, counts) vocabulary, as an array of pieces. */
  def unigram_encode(word: Column, pieces: Column, counts: Column): Column =
    bridge.column(UnigramEncodeExpr(bridge.expression(word),
      bridge.expression(pieces), bridge.expression(counts)))
}
