package graft

import graft.expr.TopKByAgg.top_k_by
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The custom TypedImperativeAggregate (expr/TopKAgg.scala): semantics
  * against a brute-force oracle on random data WITH ties, merge
  * correctness under adversarial partitioning (the serialize →
  * shuffle → deserialize → merge path), the ObjectHashAggregate partial
  * plan shape the operator exists for, and the SQL null/edge contracts.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute force on random keyed data with ties (seeded)") {
    val gen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 9L), Gen.choose(0L, 30L)))
    } yield rows
    (0 until 8).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = rows.toDF("g", "ord", "p")
        .repartition(5, $"p") // NOT by group: forces cross-partition merge
      for (k <- Seq(1, 3, 7)) {
        val got = df.groupBy($"g")
          .agg(top_k_by($"p", $"ord", k).as("top"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
        val expected = rows.groupBy(_._1).map { case (g, xs) =>
          g -> xs.map(t => (t._2, t._3)).sortBy(t => (-t._1, -t._2))
            .take(k).map(_._2).toList
        }
        assert(got === expected, s"seed=$seed k=$k")
      }
    }
  }

  test("plan: ObjectHashAggregate with a partial step below the exchange") {
    val df = Tables.orders(spark, sfDir).groupBy($"o_orderpriority")
      .agg(top_k_by($"o_orderkey", $"o_orderkey", 3).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed imperative aggregate not on the object-hash path:\n$plan")
    assert(plan.contains("partial_top_k_by"),
      s"no partial (map-side) step — the shuffle would carry the fact table:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"),
      "aggregate fell back to a window plan")
  }

  test("null ordering/payload rows are skipped; k > group size truncates") {
    val df = Seq(
      (1L, Some(10L), Some(100L)), (1L, None, Some(101L)),
      (1L, Some(20L), None), (1L, Some(5L), Some(102L)))
      .toDF("g", "ord", "p")
    val got = df.groupBy($"g").agg(top_k_by($"p", $"ord", 10).as("top"))
      .collect()(0).getSeq[Long](1)
    assert(got === Seq(100L, 102L), "null ord/payload rows must be skipped")
    // empty input group → empty array, not null
    val empty = Seq.empty[(Long, Long)].toDF("p", "ord")
      .agg(top_k_by($"p", $"ord", 3).as("top")).collect()(0).getSeq[Long](0)
    assert(empty === Seq.empty)
  }

  test("SQL registration: top_k_by callable from spark.sql text") {
    graft.expr.TopKByAgg.register(spark)
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_topk_sql_probe")
    try {
      val got = spark.sql(
        """SELECT o_orderpriority,
          |  top_k_by(o_orderkey, o_orderkey, 2) AS top
          |FROM graft_topk_sql_probe
          |GROUP BY o_orderpriority""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val expected = Tables.orders(spark, sfDir)
        .groupBy($"o_orderpriority")
        .agg(top_k_by($"o_orderkey", $"o_orderkey", 2).as("top"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(got === expected && got.nonEmpty)
      // wrong arity / wrong types fail at ANALYSIS, not at runtime
      intercept[Exception](spark.sql(
        "SELECT top_k_by(o_orderkey, 1) FROM graft_topk_sql_probe"))
      intercept[Exception](spark.sql(
        "SELECT top_k_by(o_orderpriority, o_orderkey, 2) " +
        "FROM graft_topk_sql_probe").collect())
    } finally spark.catalog.dropTempView("graft_topk_sql_probe")
  }

  test("streaming: top_k_by composes with stateful aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val agg = in.toDF().toDF("g", "ord", "p")
      .groupBy($"g").agg(top_k_by($"p", $"ord", 2).as("top"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("graft_topk_stream").start()
    try {
      in.addData((1L, 10L, 100L), (1L, 30L, 101L), (2L, 5L, 200L))
      q.processAllAvailable()
      in.addData((1L, 20L, 102L)) // displaces 100 from g=1's top-2
      q.processAllAvailable()
      val got = spark.table("graft_topk_stream")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      // state carried ACROSS micro-batches: batch-2's row merged into
      // batch-1's buffer, not a fresh aggregation of batch 2 alone
      assert(got === Map(1L -> List(101L, 102L), 2L -> List(200L)))
    } finally q.stop()
  }

  test("serialization round-trips the buffer exactly") {
    val agg = graft.expr.TopKByAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
    val buf = agg.createAggregationBuffer()
    Seq((5L, 1L), (9L, 2L), (9L, 3L), (1L, 4L), (7L, 5L), (9L, 2L))
      .foreach { case (o, p) => buf.offer(o, p) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedDesc.toSeq === buf.sortedDesc.toSeq)
    // and the heap kept exactly the top 4 by (ord, payload) desc
    assert(buf.sortedDesc.map(_._2).toSeq === Seq(3L, 2L, 2L, 5L))
  }
}
