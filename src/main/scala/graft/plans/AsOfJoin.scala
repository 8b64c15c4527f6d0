package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — a whole-operator Catalyst extension (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`), the (c) tier of the
  * custom-operator ladder after composition (q10's union+window form) and
  * custom expressions (`graft.expr`).
  *
  * Semantics: for each left row, attach the LAST right row with an equal
  * key and strictly-smaller (time, tiebreak...) ordering tuple — exactly
  * q10's "last view before each purchase" contract. Unmatched left rows
  * keep null right columns (left-outer as-of). Null keys follow natural
  * ordering (null == null matches); the fixture carries none.
  *
  * Why a custom operator: Spark's built-ins express as-of only as (a) an
  * inequality join — plans as BroadcastNestedLoop, quadratic, dead at
  * scale — or (b) the union+window rewrite, which carries BOTH streams
  * through one window (the right side's payload columns ride along as
  * nulls on every left row and vice versa). The native operator is the
  * classic sort-merge as-of: one hash shuffle per side on the key, one
  * sort per side by (key, time, tie), then a single forward merge pass
  * per partition holding ONE candidate row of state. At 100 TB that is
  * the minimum possible movement for this semantics — and the merge
  * never rewinds, so it streams.
  *
  * `EnsureRequirements` supplies the exchanges/sorts from
  * `requiredChildDistribution`/`requiredChildOrdering` — the operator
  * itself plans no data movement, exactly like SortMergeJoinExec.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    toleranceUnits: Option[Long] = None,
    direction: String = "backward")
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push left-side predicates THROUGH the as-of join.
  * Catalyst's own PushDownPredicates cannot see through an unknown
  * node, so `asof(...).where(<left-only predicate>)` would keep the
  * filter above the join — after both shuffles. Left-only predicates
  * commute exactly: every output row carries its left row's columns
  * unchanged and each left row yields exactly one output row, so
  * filtering before the join drops the same rows while skipping their
  * shuffle + merge cost (and, once below the node, the BUILT-IN
  * machinery carries the predicate all the way into the parquet scan —
  * PlansSpec asserts `PushedFilters` at the file source).
  * Right-side predicates do NOT commute (they would change which row is
  * "latest"), so they stay put.
  */
object AsOfJoinPushDown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      // only the DETERMINISTIC PREFIX may move (Catalyst's own
      // PushPredicateThroughNonJoin rule): pushing a deterministic
      // conjunct PAST a nondeterministic one (e.g. rand() < 0.5 &&
      // user_id < 10) would change how many rows the nondeterministic
      // expression evaluates over, and thus the result.
      val (detPrefix, suffix) = splitConjunctivePredicates(cond)
        .span(_.deterministic)
      val (leftOnly, rest) = detPrefix
        .partition(_.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        (rest ++ suffix).reduceOption(And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner rule: logical as-of → physical as-of. Registered either at
  * builder time (`graft.expr.GraftExtensions`) or on a live session via
  * `spark.experimental.extraStrategies` ([[AsOfJoin.ensureStrategy]]).
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro, tol, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, tol, dir) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    toleranceUnits: Option[Long] = None,
    direction: String = "backward")
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides hash-clustered on the key → co-partitioned by
  // EnsureRequirements (the SortMergeJoin contract)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKey +: leftOrder).map(SortOrder(_, Ascending)),
    (rightKey +: rightOrder).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val lk = leftKey; val rk = rightKey
    val lo = leftOrder; val ro = rightOrder
    val tol = toleranceUnits
    val dir = direction
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyP = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyP = UnsafeProjection.create(Seq(rk), rightOut)
      val lOrdP = UnsafeProjection.create(lo, leftOut)
      val rOrdP = UnsafeProjection.create(ro, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(lo.map(_.dataType))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // bind against NULLABLE right attributes: binding keeps the input
      // side's nullability, and a non-nullable binding elides the null
      // check — an unmatched row's nulls would read as zeros (the classic
      // outer-join nullability trap)
      val project = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // merge state: ONE buffered right row + ONE candidate — constant
        // memory per partition regardless of input size
        private var rightAhead: InternalRow = null
        private var exhausted = !rIter.hasNext
        private var candidate: InternalRow = null
        private var candidateKey: InternalRow = null
        private var candidateOrd: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        /** Advance the right cursor for this left row. `backward`/`nearest`
          * buffer the newest strictly-before row as the candidate and stop
          * with the cursor parked on the first at-or-after row; `forward`
          * buffers nothing — it discards at-or-before rows (useless for
          * every later left row too, since left ordering only grows) and
          * parks on the first strictly-after row, which IS the match.
          */
        private def advance(lKey: InternalRow, lOrd: InternalRow): Unit = {
          var scanning = true
          while (scanning) {
            if (rightAhead == null && !exhausted) {
              if (rIter.hasNext) rightAhead = rIter.next() else exhausted = true
            }
            if (rightAhead == null) scanning = false
            else {
              val rKey = rKeyP(rightAhead)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rightAhead = null // right key behind: discard
              else if (c == 0 && dir == "forward" &&
                       ordOrd.compare(rOrdP(rightAhead), lOrd) <= 0) {
                rightAhead = null // at-or-before: dead for all future lefts
              } else if (c == 0 && dir != "forward" &&
                         ordOrd.compare(rOrdP(rightAhead), lOrd) < 0) {
                // strictly before this left row: newest-so-far candidate.
                // copy() — the child iterator reuses its row buffer.
                candidate = rightAhead.copy()
                candidateKey = rKey.copy()
                candidateOrd = rOrdP(rightAhead).copy()
                rightAhead = null
              } else scanning = false // right at/after left: stop advancing
            }
          }
        }

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyP(l)
          val lOrd = lOrdP(l)
          if (candidateKey != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null; candidateOrd = null
          }
          advance(lKey, lOrd)
          // does the parked cursor row belong to this left row's key group?
          lazy val aheadKeyEq = rightAhead != null &&
            keyOrd.compare(rKeyP(rightAhead), lKey) == 0
          val matchRow: InternalRow = dir match {
            case "forward" =>
              // first strictly-after row; tolerance gates its lead time
              val ok = aheadKeyEq && (tol match {
                case Some(t) =>
                  rOrdP(rightAhead).getLong(0) - lOrd.getLong(0) <= t
                case None => true
              })
              if (ok) rightAhead else nullRight
            case "nearest" =>
              // closer of {newest strictly-before, first at-or-after};
              // exact matches land on the forward side with distance 0;
              // equidistant resolves backward. Both sides gate on
              // tolerance INDEPENDENTLY before the comparison.
              val tolMax = tol.getOrElse(Long.MaxValue)
              val backDist =
                if (candidate != null) lOrd.getLong(0) - candidateOrd.getLong(0)
                else Long.MaxValue
              val fwdDist =
                if (aheadKeyEq) rOrdP(rightAhead).getLong(0) - lOrd.getLong(0)
                else Long.MaxValue
              val backOk = candidate != null && backDist <= tolMax
              val fwdOk = aheadKeyEq && fwdDist <= tolMax
              if (backOk && (!fwdOk || backDist <= fwdDist)) candidate
              else if (fwdOk) rightAhead
              else nullRight
            case _ => // backward
              // tolerance gate (pandas merge_asof parity): the candidate
              // is the LATEST match, so if IT is too old every earlier row
              // is too — null-fill, but KEEP the candidate (a later left
              // row can never re-enter tolerance, but the candidate may
              // still be replaced as the merge advances; dropping it here
              // would be wrong only in the key-change path, which clears
              // anyway)
              val ok = candidate != null && (tol match {
                case Some(t) => lOrd.getLong(0) - candidateOrd.getLong(0) <= t
                case None => true
              })
              if (ok) candidate else nullRight
          }
          project(joined(l, matchRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.bridge

  /** Idempotently register the planner strategy on a live session (the
    * extensions path covers builder-time; Verify/Bench sessions are
    * already running when queries are built).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    // probe the PLANNER, not just extraStrategies: a session built with
    // GraftExtensions already carries the strategy via injection, and a
    // blind append would register it (and the rule) twice
    if (!bridge.plannerStrategies(spark).exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    // the rule is a semantic no-op when re-applied (the filter is already
    // below the node), so extension-injected duplication is harmless; the
    // guard still keeps extraOptimizations itself duplicate-free
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPushDown) &&
        !bridge.optimizerRuleNames(spark).contains(AsOfJoinPushDown.ruleName))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPushDown
  }

  /** As-of join `left` to the latest `right` row with an equal key and a
    * strictly-smaller (time, tie...) tuple. Pass RESOLVED columns
    * (`df("col")`). The right side's columns must not collide with the
    * left's (alias them) — the same rule Spark's own self-joins impose.
    *
    * `toleranceUnits` (pandas `merge_asof` parity): when set, a candidate
    * only matches if `left_order₀ − right_order₀ ≤ tolerance`, measured
    * in the FIRST ordering column's native units — MICROSECONDS for
    * timestamps, raw values for longs. Out-of-tolerance left rows
    * null-fill (still left-outer). Zero extra data movement: the gate is
    * one long comparison at emit time inside the same merge pass.
    *
    * `direction` (pandas `merge_asof` parity):
    *  - `backward` (default): newest right row STRICTLY BEFORE the left
    *    tuple — q10's "last view before each purchase";
    *  - `forward`: first right row STRICTLY AFTER the left tuple
    *    (tolerance gates its lead time, `right₀ − left₀ ≤ t`);
    *  - `nearest`: closer of the two by the FIRST ordering column's
    *    distance; the forward side is AT-OR-AFTER here (an exact match is
    *    distance 0 and wins), equidistant resolves backward, and each
    *    side gates on tolerance independently. Requires a long-backed
    *    first ordering column (like tolerance).
    * All three run in the same single merge pass with the same one-row
    * state — direction changes comparisons, never data movement.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftOrder: Seq[Column], rightOrder: Seq[Column],
           toleranceUnits: Option[Long] = None,
           direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(leftOrder.nonEmpty && leftOrder.size == rightOrder.size,
      "as-of needs matching non-empty ordering column lists")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got '$direction'")
    // the merge comparators are built from LEFT-side types and read both
    // sides' projections with them — a type mismatch would compare raw
    // slots and silently pick wrong candidates, so fail loudly instead
    import org.apache.spark.sql.types.DataType.equalsStructurally
    val lkT = bridge.expression(leftKey).dataType
    val rkT = bridge.expression(rightKey).dataType
    require(equalsStructurally(lkT, rkT, ignoreNullability = true),
      s"as-of key types differ: $lkT vs $rkT")
    leftOrder.zip(rightOrder).foreach { case (l, r) =>
      val (lt, rt) = (bridge.expression(l).dataType, bridge.expression(r).dataType)
      require(equalsStructurally(lt, rt, ignoreNullability = true),
        s"as-of ordering types differ: $lt vs $rt")
    }
    if (toleranceUnits.isDefined || direction == "nearest") {
      toleranceUnits.foreach(t =>
        require(t >= 0, s"as-of tolerance must be >= 0, got $t"))
      // tolerance gates and nearest distances read the first ordering
      // slot as a raw long — only long-backed types qualify (timestamps
      // are micros internally)
      import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
      val t0 = bridge.expression(leftOrder.head).dataType
      require(Seq(LongType, TimestampType, TimestampNTZType).contains(t0),
        s"as-of tolerance/nearest requires a long-backed first ordering " +
          s"column (timestamp/long), got $t0")
    }
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      bridge.expression(leftKey), bridge.expression(rightKey),
      leftOrder.map(bridge.expression), rightOrder.map(bridge.expression),
      toleranceUnits, direction)
    bridge.ofRows(spark, plan)
  }
}
