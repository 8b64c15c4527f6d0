package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (build-brief "skewed keys → salting or AQE
  * skew-join").
  *
  * When one group key dominates (power-law keys at 100 TB), a plain
  * groupBy sends the whole hot key to one reducer. Salting splits each
  * key into `SALTS` sub-keys for the first (wide, parallel) aggregation,
  * then a second aggregation over the tiny per-salt partials removes the
  * salt. The result is EXACTLY the unsalted aggregate — which is what the
  * DuckDB oracle twin computes directly. (Quantities are integral, so the
  * re-associated double sums are exact; the technique composes with any
  * algebraic aggregate.)
  *
  * AQE's skew-join handling covers the JOIN case automatically; explicit
  * salting remains the lever for skewed AGGREGATION keys like this.
  */
object Skew {

  private val SALTS = 16

  def q61SaltedAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(SALTS)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("partial_qty"),
           count(lit(1)).as("partial_n"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("partial_qty")), 2).as("sum_qty"),
           sum(col("partial_n")).as("n"))
      .orderBy(col("l_returnflag"))

  val q61Sql: String =
    """SELECT l_returnflag,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_salted_agg" -> (q61SaltedAgg _),
  )

  val oracleSql: Map[String, String] = Map(
    "q61_salted_agg" -> q61Sql,
  )
}
