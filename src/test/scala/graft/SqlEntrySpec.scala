package graft

/** SQL-text entry point: registered views + `spark.sql` agree with the
  * DataFrame DSL on the same computation.
  */
class SqlEntrySpec extends SparkSpec {
  import spark.implicits._

  test("spark.sql over registered views matches the DSL plan results") {
    Tables.registerViews(spark, sfDir)
    val sql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val dsl = {
      import org.apache.spark.sql.functions._
      Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir).where($"c_mktsegment" === "BUILDING"),
              $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
        .as[(String, Long)].collect().toSeq
    }
    assert(sql === dsl && sql.nonEmpty)
  }
}
