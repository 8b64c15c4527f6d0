package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage-layout levers for the 100 TB design story (SURVEY §2.2 scans,
  * build-brief "partitioning & shuffle"): bucketing co-locates join keys
  * so big-big joins skip the shuffle entirely, and partitioned layouts
  * prune at the directory level before any I/O. Both are asserted against
  * the PHYSICAL plan, not just results.
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("bucketed tables join with zero Exchange operators") {
    val wh = tmp("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sfDir)
      .write.format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.customer(spark, sfDir)
      .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: the join itself needs NO shuffle; the only
      // Exchange allowed is the post-join aggregation's.
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // results match the unbucketed formulation
      val direct = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSet
      assert(joined.as[(String, Long)].collect().toSet === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("partitioned layout prunes to one partition on a key predicate") {
    val dir = tmp("partitioned")
    Tables.orders(spark, sfDir)
      .withColumn("yr", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir).where($"yr" === 1996)
    val scan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters:.*\\(yr#\\d+ = 1996\\)".r.findFirstIn(scan).isDefined,
      s"no partition filter pushed:\n$scan")
    val expected = Tables.orders(spark, sfDir)
      .where(year($"o_orderdate") === 1996).count()
    assert(pruned.count() === expected && expected > 0)
  }
}
