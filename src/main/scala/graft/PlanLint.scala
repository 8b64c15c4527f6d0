package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan LINTER — the 100 TB design bar as an executable check.
  *
  * `Explain` prints plans for a human; this walks them mechanically and
  * reports the patterns that kill jobs at scale, so every query's plan
  * can be asserted clean in CI instead of spot-read per round:
  *
  *  - `cartesian` / `nested-loop`: a join with no equi-key — quadratic
  *    work; at 100 TB this is the difference between minutes and never.
  *    (Legitimate when one side is O(1) rows — broadcast query sets —
  *    which is why findings are allowlisted per query, not globally.)
  *  - `expand`: the multi-distinct Expand — every input row replicated
  *    once per distinct aggregate before the shuffle (the q27/q28 trap).
  *  - `unpushed-filter`: a Filter sitting DIRECTLY on a parquet scan
  *    that pushed nothing, where the predicate is SOURCE-CONVERTIBLE
  *    (comparisons/IN/IS NULL over bare attributes and literals — the
  *    shapes parquet can evaluate against row-group stats). Derived
  *    expressions (`year(cast(..))`, higher-order funcs) can never push
  *    and are NOT flagged; residual filters above a scan that DID push
  *    are fine too.
  *  - `global-window`: a window function with an empty PARTITION BY —
  *    the whole input sorts through ONE task, the q85 scale-killer.
  *  - `no-partial-agg`: a final aggregation whose shuffle input isn't
  *    partially aggregated — the map-side combine is missing, so the
  *    exchange carries raw rows. (Catalyst plans partials by default;
  *    this catches operators/configs that defeat it.)
  *
  * The walk descends into AQE wrappers (initial plan — linting runs
  * before execution) and subqueries.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String) {
    override def toString: String = s"[$rule] $node: $detail"
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val root = df.queryExecution.executedPlan
    val out = Seq.newBuilder[Finding]

    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
        case j: CartesianProductExec =>
          out += Finding("cartesian", j.nodeName,
            "join with no condition at all — O(n×m)")
        case j: BroadcastNestedLoopJoinExec =>
          out += Finding("nested-loop", j.nodeName,
            s"no equi-key (${j.joinType}); every streamed row scans the " +
              "whole build side")
        case e if e.nodeName == "Expand" =>
          out += Finding("expand", e.nodeName,
            "multi-distinct Expand: input replicated per distinct column " +
              "before the shuffle")
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += Finding("global-window", w.nodeName,
            "empty PARTITION BY — the whole input sorts through one task")
        case f: FilterExec if isBareScan(unwrap(f.child)) &&
            f.condition.deterministic &&
            sourceConvertible(f.condition) &&
            pushedNothing(unwrap(f.child)) =>
          out += Finding("unpushed-filter", unwrap(f.child).nodeName,
            s"convertible predicate ${f.condition.sql.take(80)} evaluates " +
              "above a scan that pushed nothing")
        case agg if isFinalAgg(agg) =>
          agg.children.headOption match {
            case Some(ex: ShuffleExchangeExec)
                if !ex.child.exists(isPartialAgg) =>
              out += Finding("no-partial-agg", agg.nodeName,
                "final aggregate over a shuffle of raw rows — no map-side " +
                  "combine")
            case _ => ()
          }
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(root)
    out.result()
  }

  /** Throw (with every finding listed) unless the plan is clean modulo
    * the allowlisted rules.
    */
  def assertClean(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = lint(df).filterNot(f => allow.contains(f.rule))
    if (bad.nonEmpty)
      throw new AssertionError(
        s"plan lint failed:\n${bad.mkString("\n")}\n--- plan ---\n" +
          df.queryExecution.executedPlan.toString)
  }

  /** The predicate shapes a parquet source could have translated: atomic
    * comparisons / IN / null checks over bare column references and
    * literals, under And/Or/Not. Anything containing a computed
    * expression is untranslatable by construction and therefore not a
    * pushdown FAILURE.
    */
  private def sourceConvertible(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def atom(x: Expression): Boolean = x match {
      case _: Attribute | _: Literal => true
      case _ => false
    }
    e match {
      case And(l, r) => sourceConvertible(l) && sourceConvertible(r)
      case Or(l, r) => sourceConvertible(l) && sourceConvertible(r)
      case Not(c) => sourceConvertible(c)
      case b: BinaryComparison => atom(b.left) && atom(b.right)
      case In(v, list) => atom(v) && list.forall(atom)
      case IsNull(c) => atom(c)
      case IsNotNull(c) => atom(c)
      case _: StartsWith | _: EndsWith | _: Contains =>
        e.children.forall(atom)
      case _ => false
    }
  }

  /** Descend through codegen/columnar wrappers (InputAdapter,
    * WholeStageCodegen, ColumnarToRow) to the node that actually scans.
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w if (w.nodeName == "InputAdapter" ||
               w.nodeName.startsWith("WholeStageCodegen") ||
               w.nodeName == "ColumnarToRow") && w.children.size == 1 =>
      unwrap(w.children.head)
    case other => other
  }

  private def isBareScan(p: SparkPlan): Boolean = {
    val n = p.nodeName
    n.startsWith("Scan parquet") || n.startsWith("BatchScan") ||
      (n.contains("Scan") && n.contains("parquet"))
  }

  /** True when the scan advertises no pushed filters — either an
    * explicit `PushedFilters: []` or no pushdown report at all (a DSv2
    * scan that never implemented SupportsPushDownFilters).
    */
  private def pushedNothing(scan: SparkPlan): Boolean = {
    val s = scan.toString
    val i = s.indexOf("PushedFilters:")
    i < 0 || s.substring(i, math.min(s.length, i + 60)).contains("[]")
  }

  private def isFinalAgg(p: SparkPlan): Boolean = p match {
    case h: HashAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final)
    case h: ObjectHashAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final)
    case h: SortAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final)
    case _ => false
  }

  private def isPartialAgg(p: SparkPlan): Boolean = p match {
    case h: HashAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)
    case h: ObjectHashAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)
    case h: SortAggregateExec => h.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)
    case _ => false
  }
}
