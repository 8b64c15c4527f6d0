package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY.md §2.2 "Set operations").
  *
  * The reference's `ON CONFLICT DO NOTHING` (course_catalog.py:99 et al.) is
  * semantically `existing ∪ (incoming ∖ existing)`. This exercises the whole
  * family — UNION / UNION ALL / INTERSECT / INTERSECT ALL / EXCEPT /
  * EXCEPT ALL — over customer-key multisets derived from orders.
  */
object SetOps {

  // ─── q16: set-op census over open vs finished order customers ──────────
  // Multiset = one custkey per order (duplicates preserved), split by
  // orderstatus. Each branch reduces to a single count, so the result is a
  // 6-row census regardless of scale factor.
  def q16SetOpCensus(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val open     = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val finished = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    def one(op: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    one("union",         open.union(finished).distinct())
      .unionByName(one("union_all",     open.union(finished)))
      .unionByName(one("intersect",     open.intersect(finished)))
      .unionByName(one("intersect_all", open.intersectAll(finished)))
      .unionByName(one("except",        open.except(finished)))
      .unionByName(one("except_all",    open.exceptAll(finished)))
      .orderBy(col("op"))
  }

  val q16Sql: String =
    """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |     fin  AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'union' AS op, count(*) AS n
      |  FROM (SELECT o_custkey FROM open UNION SELECT o_custkey FROM fin)
      |UNION ALL SELECT 'union_all', count(*)
      |  FROM (SELECT o_custkey FROM open UNION ALL SELECT o_custkey FROM fin)
      |UNION ALL SELECT 'intersect', count(*)
      |  FROM (SELECT o_custkey FROM open INTERSECT SELECT o_custkey FROM fin)
      |UNION ALL SELECT 'intersect_all', count(*)
      |  FROM (SELECT o_custkey FROM open INTERSECT ALL SELECT o_custkey FROM fin)
      |UNION ALL SELECT 'except', count(*)
      |  FROM (SELECT o_custkey FROM open EXCEPT SELECT o_custkey FROM fin)
      |UNION ALL SELECT 'except_all', count(*)
      |  FROM (SELECT o_custkey FROM open EXCEPT ALL SELECT o_custkey FROM fin)
      |ORDER BY op""".stripMargin

  // ─── q17: customers whose open-order spend survives EXCEPT ALL ─────────
  // A value-level EXCEPT ALL (not just counts): custkeys appearing more
  // times with open orders than with finished ones, with multiplicity.
  def q17ExceptAllDetail(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val open     = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val finished = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.exceptAll(finished)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("surplus"))
      .orderBy(col("o_custkey"))
  }

  val q17Sql: String =
    """SELECT o_custkey, count(*) AS surplus
      |FROM ((SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |      EXCEPT ALL
      |      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_setop_census"     -> (q16SetOpCensus _),
    "q17_except_all_detail" -> (q17ExceptAllDetail _),
  )

  val oracleSql: Map[String, String] = Map(
    "q16_setop_census"     -> q16Sql,
    "q17_except_all_detail" -> q17Sql,
  )
}
