package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** q123–q126: mergeable-sketch aggregation + conditional/histogram aggs.
  *
  * The load-bearing claims the DuckDB oracle can't see:
  *  - q123: merging per-cell HLL partials with hll_union_agg gives the
  *    SAME estimate as sketching the whole column directly (the merge is
  *    lossless for a partition of the data — that's what makes persisted
  *    partials trustworthy for later rollups);
  *  - q124: the bitmap path is EXACT (≡ count(DISTINCT)) and the OR-merge
  *    across a partition of the data is too;
  *  - q125: all four filtered aggregates come from ONE scan of orders
  *    (single aggregation — no self-join, no extra fact scans);
  *  - q126: width_bucket's closed form matches the oracle formula at the
  *    bucket boundaries (the off-by-one trap: v=lo, v=hi−width, v=hi−ε).
  */
class SketchAggSpec extends SparkSpec {

  test("q123: hll_union_agg over per-cell partials ≡ direct whole-column sketch") {
    val o = Tables.orders(spark, sfDir).withColumn("yr", year(col("o_orderdate")))
    val direct = o.groupBy(col("yr"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
    val merged = o.groupBy(col("yr"), col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy(col("yr"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val joined = direct.alias("a").join(merged.alias("b"), Seq("yr"))
      .select(col("a.est").as("direct"), col("b.est").as("merged")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"merge must be lossless: direct=${r.getLong(0)} merged=${r.getLong(1)}")
    }
  }

  test("q124: bitmap distinct is exact and OR-merge preserves exactness") {
    val res = Analytics.q124BitmapDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == exact, s"bitmap=$res exact=$exact")
  }

  test("q125: four filtered aggregates run as one aggregation over one scan") {
    val df = Analytics.q125FilteredAgg(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 orders scan, plan had $scans:\n$plan")
    assert(!plan.contains("Join"), "FILTER aggregates must not self-join")
    // conservation: the filtered counts partition or bound the total
    df.collect().foreach { r =>
      val (n, nf, no) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nf + no <= n, "status-filtered counts cannot exceed the total")
    }
  }

  test("q134: fused ordering key makes argmax deterministic under repartitioning") {
    val a = Analytics.q134ArgMax(spark, sfDir).collect().toSeq
    // same data, adversarial partitioning: ties (if any) must resolve
    // identically because the ordering key is unique by construction
    val ord = expr(
      "CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey")
    val b = Tables.orders(spark, sfDir)
      .repartition(7, col("o_custkey")) // different co-location than the scan
      .groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"), ord).as("top_order"),
           min_by(col("o_orderkey"), ord).as("bottom_order"),
           round(max(col("o_totalprice")), 2).as("top_price"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.forall(r => r.getLong(1) != r.getLong(2)),
      "top and bottom order collapsed — fixture gives the aggregate no range")
  }

  test("q135: regr_slope matches a driver-side OLS recompute") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (k, xs) =>
      val n = xs.length.toDouble
      val (sy, sx) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(t => t._2 * t._3).sum
      val sxx = xs.map(t => t._3 * t._3).sum
      k -> (sxy - sx * sy / n) / (sxx - sx * sx / n)
    }
    Analytics.q135Regression(spark, sfDir).collect().foreach { r =>
      val got = r.getDouble(1)
      val want = expected(r.getString(0))
      assert(math.abs(got - want) < 5e-3,
        s"slope mismatch for ${r.getString(0)}: spark=$got local=$want")
    }
  }

  test("q126: width_bucket matches the closed form at boundary values") {
    import spark.implicits._
    // v=1 (lo), v=5.999 (top of bucket 1), v=6 (bottom of bucket 2),
    // v=50 (interior of last bucket), v=50.999 (just under hi)
    val probes = Seq(1.0, 5.999, 6.0, 26.0, 50.0, 50.999).toDF("v")
      .withColumn("wb", expr("CAST(width_bucket(v, 1.0D, 51.0D, 10) AS INT)"))
      .withColumn("cf", expr("CAST(floor((v - 1.0) / 5.0) + 1 AS INT)"))
      .collect()
    probes.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"v=${r.getDouble(0)}: width_bucket=${r.getInt(1)} formula=${r.getInt(2)}")
    }
    // histogram buckets cover every row exactly once
    val hist = Analytics.q126Histogram(spark, sfDir)
    val total = hist.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("q187: rolling 7-day window ties out and the sketch stays in bound") {
    val rows = Analytics.q187RollingHll(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "every window estimate in bound")
    // driver-side recompute of one mid-series window
    val byDay = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("dt"), col("user_id"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val mid = rows(rows.length / 2)
    val d = mid.getDate(0).toLocalDate
    val expect = byDay.collect {
      case (dt, u) if !dt.isAfter(d) && !dt.isBefore(d.minusDays(6)) => u
    }.distinct.length
    assert(mid.getLong(1) == expect, s"window at $d: ${mid.getLong(1)} vs $expect")
    // windows are supersets of their day -> monotone vs daily distinct
    val dailyMax = byDay.groupBy(_._1).map(_._2.map(_._2).distinct.length).max
    assert(rows.map(_.getLong(1)).max >= dailyMax)
  }

  test("cms_probe (native expression #9) ≡ the library's estimateCount") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma",
      "delta", "alpha", "beta", "unseen-probe-target")
    val sk = words.toDF("w")
      .agg(expr("count_min_sketch(w, 0.001d, 0.99d, 7)").as("sk"))
    // bit-for-bit twin: the native probe on a DataFrame vs the library
    // API on the driver, for seen AND unseen keys
    val lib = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sk.head().getAs[Array[Byte]](0)))
    val probes = Seq("alpha", "beta", "gamma", "delta", "never-added")
    val got = probes.toDF("w").crossJoin(sk)
      .select($"w", graft.expr.CmsProbeFunctions.cms_probe($"sk", $"w"))
      .as[(String, Long)].collect().toMap
    probes.foreach { p =>
      assert(got(p) === lib.estimateCount(p), p)
      // CMS never undercounts the true frequency
      assert(got(p) >= words.count(_ == p).toLong, p)
    }
  }
}
