package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via Aho–Corasick (Aho & Corasick,
  * CACM 1975) — native expression #12, the gazetteer/blocklist primitive
  * behind C4-style URL/domain/PII-dictionary gating. One linear pass over
  * the text counts EVERY occurrence of EVERY dictionary term at once —
  * overlapping and nested matches included (the classic failure-link
  * output closure: scanning `scan` reports both `scan` and its embedded
  * `an`) — where the naive per-term scan costs O(|text|·|dict|) and a
  * regex alternation backtracks.
  *
  * Returns the per-pattern occurrence counts as an ARRAY<BIGINT> aligned
  * with the dictionary's order, so one expression feeds both the
  * per-term census and the any-hit gate. The dictionary arrives as a
  * LITERAL array column (the broadcast-constant shape); the automaton is
  * built once per (thread, dictionary-reference) — the CmsProbe memo
  * discipline — so per-row work is the pure scan. Matching operates on
  * UTF-16 code units of the decoded string: exact for the engine's
  * lowercase-ASCII corpora and any BMP text, and the DuckDB oracle's
  * positional `substring` compare (q321) agrees character-for-character.
  *
  * Codegen is the StaticInvoke pattern shared by the other eleven
  * kernels, so the scan runs inside WholeStageCodegen.
  */
case class AcCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        // The dictionary must be a plan-time constant: the per-thread
        // automaton memo keys on the ArrayData REFERENCE, which is only
        // sound when one immutable literal serves every row. A per-row
        // array would rebuild the automaton per row (quadratic) and a
        // buffer-reused ArrayData could scan with a stale dictionary.
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) pattern dictionary")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, pats: Any): Any =
    AcCountExpr.countAll(
      text.asInstanceOf[UTF8String], pats.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.expr.AcCountExpr.countAll($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcCountExpr =
    copy(left = newLeft, right = newRight)
}

object AcCountExpr {

  /** Aho–Corasick automaton over UTF-16 code units. Goto is a per-node
    * hash map (dictionaries are small; a dense char table would waste
    * 64 K entries per node), fail links and the output CLOSURE (own
    * outputs ∪ outputs along the fail chain, precomputed in BFS order)
    * are arrays indexed by node id.
    */
  private[graft] final class Automaton(patterns: Array[String]) {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "ac_count needs a non-empty dictionary of non-empty patterns")
    private val gotoT =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val failB = scala.collection.mutable.ArrayBuffer(0)
    private val ownOut =
      scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { ch =>
        s = gotoT(s).getOrElseUpdate(ch, {
          gotoT += scala.collection.mutable.Map.empty[Char, Int]
          failB += 0
          ownOut += Nil
          gotoT.length - 1
        })
      }
      ownOut(s) = idx :: ownOut(s)
    }
    // BFS: fail links + output closure (out(s) ++= out(fail(s)))
    private val outC = new Array[Array[Int]](gotoT.length)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      outC(0) = ownOut(0).toArray
      gotoT(0).valuesIterator.foreach { s =>
        failB(s) = 0
        outC(s) = ownOut(s).toArray
        queue += s
      }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoT(r).foreach { case (ch, s) =>
          var f = failB(r)
          while (f != 0 && !gotoT(f).contains(ch)) f = failB(f)
          failB(s) = gotoT(f).getOrElse(ch, 0) match {
            case `s` => 0 // self-transition from root (first char match)
            case t => t
          }
          outC(s) = ownOut(s).toArray ++ outC(failB(s))
          queue += s
        }
      }
    }
    private val fail = failB.toArray
    private val nPat = patterns.length

    def scan(text: String): ArrayData = {
      val counts = new Array[Long](nPat)
      var state = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        while (state != 0 && !gotoT(state).contains(ch)) state = fail(state)
        state = gotoT(state).getOrElse(ch, 0)
        val out = outC(state)
        var k = 0
        while (k < out.length) { counts(out(k)) += 1L; k += 1 }
        i += 1
      }
      ArrayData.toArrayData(counts)
    }
  }

  /** Per-thread (dictionary-reference → automaton) memo: the dictionary
    * is a plan-time literal, so one object reference serves every row a
    * task sees — build once, scan millions of times. */
  private val cache = new ThreadLocal[(AnyRef, Automaton)]

  private[graft] def automatonFor(pats: ArrayData): Automaton = {
    val memo = cache.get()
    if (memo != null && (memo._1 eq pats)) memo._2
    else {
      val arr = Array.tabulate(pats.numElements())(i =>
        pats.getUTF8String(i).toString)
      val a = new Automaton(arr)
      cache.set((pats, a))
      a
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def countAll(text: UTF8String, pats: ArrayData): ArrayData =
    automatonFor(pats).scan(text.toString)
}

object AcFunctions {
  /** DataFrame-DSL entry point: per-pattern occurrence counts of every
    * `patterns` member in `text`, index-aligned with the dictionary. */
  def ac_count(text: Column, patterns: Column): Column =
    bridge.column(AcCountExpr(
      bridge.expression(text), bridge.expression(patterns)))
}
