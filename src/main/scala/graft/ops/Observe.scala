package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline health counters via `Dataset.observe` — the engine-native
  * form of the reference's imperative ingest counters (O18,
  * course_catalog.py's per-page record/retry tallies): named aggregate
  * expressions ride the SAME job as the query action, evaluated as
  * accumulators while rows stream past the observation point. No second
  * scan, no extra action — at 100 TB a separate "count the funnel
  * stages" pass costs a full corpus read per stage; observe() costs
  * nothing beyond the accumulator merge at task completion.
  *
  * Contract notes for a library user: metrics become available after ANY
  * action executes the observed node (batch: `Observation.get` blocks
  * until then; streaming: each `StreamingQueryProgress.observedMetrics`
  * carries the per-batch values). Only non-distinct aggregates are
  * allowed — the merge must be accumulator-shaped (mergeable partial
  * state, the q106 property).
  */
object Observe {

  /** q115: quality-gate funnel with observed admission metrics. The
    * RESULT is the post-filter per-language census (oracle-checkable);
    * the observation records what the filter SAW — input rows, input
    * chars, and how many rows each gate dropped — without re-scanning.
    * ObserveSpec cross-checks every metric against a second, explicitly
    * recomputed pass.
    */
  private[graft] def observedClean(
      s: SparkSession, d: String): (DataFrame, Observation) = {
    val obs = Observation()
    val gated = documents(s, d)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(col("n_chars")).as("chars_in"),
        sum(when(col("n_chars") < 120, 1L).otherwise(0L)).as("short_drops"),
        sum(when(col("n_chars") >= 120 &&
                 !col("lang").isin("en", "de", "fr"), 1L).otherwise(0L))
          .as("lang_drops"))
      .where(col("n_chars") >= 120 && col("lang").isin("en", "de", "fr"))
    val out = gated.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy(col("lang"))
    (out, obs)
  }

  def q115ObservedClean(s: SparkSession, d: String): DataFrame =
    observedClean(s, d)._1

  val q115Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
      |FROM documents
      |WHERE n_chars >= 120 AND lang IN ('en', 'de', 'fr')
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_observed_clean" -> (q115ObservedClean _))

  val oracleSql: Map[String, String] = Map(
    "q115_observed_clean" -> q115Sql)
}
