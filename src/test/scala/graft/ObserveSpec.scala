package graft

import graft.ops.Observe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `Dataset.observe` semantics the oracle can't see: the metrics ride the
  * same action (no second scan), agree with an explicit recompute, and in
  * streaming surface per-batch through StreamingQueryProgress.
  */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("q115 observed funnel metrics match an explicit recompute") {
    val (out, obs) = Observe.observedClean(spark, sfDir)
    val result = out.collect()
    val m = obs.get
    val docs = Tables.documents(spark, sfDir)
    val shortDrops = docs.where($"n_chars" < 120).count()
    val langDrops = docs.where($"n_chars" >= 120 &&
      !$"lang".isin("en", "de", "fr")).count()
    assert(m("rows_in") === docs.count())
    assert(m("chars_in") === docs.agg(sum($"n_chars")).as[Long].head)
    assert(m("short_drops") === shortDrops)
    assert(m("lang_drops") === langDrops)
    // funnel conservation: every input row is kept or accounted to a gate
    val kept = result.map(_.getLong(1)).sum
    assert(m("rows_in") === kept + shortDrops + langDrops)
    assert(out.queryExecution.executedPlan.toString.contains("CollectMetrics"),
      "observation node missing from the executed plan")
  }

  test("streaming observe: per-batch metrics surface in query progress") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val observed = in.toDF()
      .observe("doc_gate",
        count(lit(1)).as("rows"),
        sum(length($"text")).as("chars"))
      .where(length($"text") >= 5)
    val q = observed.writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    try {
      in.addData(Doc(1, new java.sql.Timestamp(0), "abcdef"),
                 Doc(2, new java.sql.Timestamp(0), "ab"))
      q.processAllAvailable()
      val om = q.lastProgress.observedMetrics
      assert(om.containsKey("doc_gate"), s"no observed metrics: $om")
      val row = om.get("doc_gate")
      // the gate saw BOTH rows even though only one survived the filter
      assert(row.getAs[Long]("rows") === 2L)
      assert(row.getAs[Long]("chars") === 8L)
      assert(spark.table("obs_stream").count() === 1L)
    } finally q.stop()
  }
}
