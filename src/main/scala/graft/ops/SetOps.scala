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

  // ─── q29: the same census, fused into ONE pass over orders ─────────────
  // q16 is a deliberate API exerciser: 6 set-op branches = 12 scans and 6
  // wide shuffles. At 100 TB that shape is a scan-amplification
  // anti-pattern: all six counts are derivable from one groupBy(custkey)
  // carrying two conditional counters, then constant-size arithmetic —
  //   union         = #keys with open_n>0 OR fin_n>0
  //   union_all     = Σ open_n + Σ fin_n
  //   intersect     = #keys with open_n>0 AND fin_n>0
  //   intersect_all = Σ least(open_n, fin_n)
  //   except        = #keys with open_n>0 AND fin_n=0
  //   except_all    = Σ greatest(open_n − fin_n, 0)
  // — 1 scan, 1 shuffle, then a 1-row reduce `stack`ed into the same
  // 6-row (op, n) shape as q16.
  def q29SetOpFused(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fin_n"))
      .agg(
        count(when(col("open_n") > 0 || col("fin_n") > 0, 1)).as("u"),
        (sum(col("open_n")) + sum(col("fin_n"))).as("ua"),
        count(when(col("open_n") > 0 && col("fin_n") > 0, 1)).as("i"),
        sum(least(col("open_n"), col("fin_n"))).as("ia"),
        count(when(col("open_n") > 0 && col("fin_n") === 0, 1)).as("e"),
        sum(greatest(col("open_n") - col("fin_n"), lit(0L))).as("ea"))
      .select(expr(
        """stack(6, 'union', u, 'union_all', ua, 'intersect', i,
          |'intersect_all', ia, 'except', e, 'except_all', ea) AS (op, n)"""
          .stripMargin))
      .orderBy(col("op"))

  val q29Sql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS open_n,
      |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fin_n
      |  FROM orders GROUP BY o_custkey),
      |agg AS (SELECT
      |  count(CASE WHEN open_n > 0 OR fin_n > 0 THEN 1 END) AS u,
      |  sum(open_n) + sum(fin_n) AS ua,
      |  count(CASE WHEN open_n > 0 AND fin_n > 0 THEN 1 END) AS i,
      |  sum(least(open_n, fin_n)) AS ia,
      |  count(CASE WHEN open_n > 0 AND fin_n = 0 THEN 1 END) AS e,
      |  sum(greatest(open_n - fin_n, 0)) AS ea
      |FROM per)
      |SELECT op, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'union' AS op, u AS n FROM agg
      |  UNION ALL SELECT 'union_all', ua FROM agg
      |  UNION ALL SELECT 'intersect', i FROM agg
      |  UNION ALL SELECT 'intersect_all', ia FROM agg
      |  UNION ALL SELECT 'except', e FROM agg
      |  UNION ALL SELECT 'except_all', ea FROM agg)
      |ORDER BY op""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_setop_census"     -> (q16SetOpCensus _),
    "q17_except_all_detail" -> (q17ExceptAllDetail _),
    "q29_setop_fused"      -> (q29SetOpFused _),
  )

  val oracleSql: Map[String, String] = Map(
    "q16_setop_census"     -> q16Sql,
    "q17_except_all_detail" -> q17Sql,
    "q29_setop_fused"      -> q29Sql,
  )
}
