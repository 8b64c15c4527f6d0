package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime twin of [[PlanLint]]: counts the Spark ACTIONS (tracked query
  * executions) a query launches while it is built and materialized.
  *
  * Why actions and not jobs: under AQE one action legitimately submits a
  * job per materialized shuffle stage, so a job count varies with plan
  * DEPTH; the action count varies only with driver-side CONTROL FLOW —
  * exactly the thing that hurts at cluster scale. Every action is a
  * driver→cluster round-trip (job scheduling latency + result pull), so
  * an operator that quietly runs two actions per iterative round, or a
  * per-row driver loop, multiplies end-to-end latency by a constant no
  * executor-side tuning can recover (the round-7 CC fixpoint lesson:
  * `count() + exceptAll.isEmpty` per round = 2 extra scheduler
  * round-trips × O(log²n) rounds). PlanLint can't see this — each
  * individual plan is clean; only the RUN exposes the loop — hence this
  * runtime counter, enforced in Verify against [[PlanLint.actionBounds]]
  * (per-query documented bounds for the intentional iteratives, a tight
  * default for everything declarative).
  *
  * Mechanics: a [[QueryExecutionListener]] counts execution-end events.
  * The listener bus is ASYNCHRONOUS, so after `body` returns we launch a
  * sentinel action (a `spark.range` over a magic literal no real query
  * uses) and wait for it to arrive — the bus delivers events to a given
  * listener in submission order, so seeing the sentinel proves every
  * action `body` ran has been counted. Streaming micro-batches report
  * through the same listener (`IncrementalExecution` ends), so stream
  * registry queries are audited too, one count per micro-batch.
  */
object ActionAudit {

  final case class Audited[T](value: T, actions: Int)

  /** Magic range start for the flush sentinel — outside any key space
    * the test tables use. */
  private val SentinelStart = 424242420000L

  def audit[T](spark: SparkSession)(body: => T): Audited[T] = {
    val seen = new AtomicInteger(0)
    @volatile var sentinelSeen = false
    val listener = new QueryExecutionListener {
      private def classify(qe: QueryExecution): Unit = {
        val isSentinel = qe.analyzed.collectFirst {
          case r: org.apache.spark.sql.catalyst.plans.logical.Range
              if r.start == SentinelStart => ()
        }.isDefined
        if (isSentinel) sentinelSeen = true else seen.incrementAndGet()
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = classify(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = classify(qe)
    }
    spark.listenerManager.register(listener)
    try {
      val v = body
      spark.range(SentinelStart, SentinelStart + 1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sentinelSeen && System.nanoTime() < deadline) Thread.sleep(2)
      require(sentinelSeen,
        "action-audit sentinel never arrived on the listener bus")
      Audited(v, seen.get())
    } finally spark.listenerManager.unregister(listener)
  }
}
