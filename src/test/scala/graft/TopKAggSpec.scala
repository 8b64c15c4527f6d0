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
