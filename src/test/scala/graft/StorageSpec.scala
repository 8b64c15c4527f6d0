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

  test("AQE splits a planted skewed join key (OptimizeSkewedJoin fires)") {
    // the JOIN-side skew lever, complementing q61's salted AGGREGATION:
    // a hot key whose shuffle partition dwarfs the median gets split into
    // advisory-sized reader chunks at runtime, with the build side
    // replicated per chunk — no manual salting of the join needed.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.get(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // shrink the skew thresholds to fixture scale (defaults are 256 MB)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // left: key 0 carries 300k of 400k rows; right: all 38 keys, small
      // but non-broadcastable by config
      val left = spark.range(0, 400000).select(
        when($"id" < 300000, 0L).otherwise(pmod($"id", lit(37)) + 1).as("k"),
        $"id".as("v"))
      val right = spark.range(0, 38).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would spawn its own, leaving
      // joined's adaptive plan unexecuted and the assertion vacuous)
      val n = joined.collect().length
      assert(n === 400000) // every left row finds exactly one right row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // the third scale lever next to AQE skew-split and bucketing: when one
    // join side carries a selective filter, InjectRuntimeFilter builds a
    // bloom filter over its join keys and semi-filters the OTHER side's
    // scan BEFORE the shuffle — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~matching slice.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // fixture scans are far below the 10 GB production default
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      val dimDir = tmp("bloom_dim"); val factDir = tmp("bloom_fact")
      spark.range(0, 1000)
        .select($"id".as("k"), concat(lit("g"), pmod($"id", lit(10))).as("grp"))
        .write.mode("overwrite").parquet(dimDir)
      spark.range(0, 200000)
        .select(pmod($"id", lit(1000)).as("k"), $"id".as("v"))
        .write.mode("overwrite").parquet(factDir)
      val dim = spark.read.parquet(dimDir).where($"grp" === "g7") // 100 of 1000 keys
      val fact = spark.read.parquet(factDir)
      val joined = fact.join(dim, "k")
      val n = joined.collect().length // execute THIS queryExecution
      assert(n === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter was not injected:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("CBO: ANALYZE ... FOR ALL COLUMNS flips a filtered join to broadcast") {
    // Without statistics a catalog table's size estimate falls back to
    // defaultSizeInBytes (effectively infinite), so a selective filter
    // on it still plans SortMergeJoin. ANALYZE gives the optimizer
    // rowCount + per-column NDV; CBO's FilterEstimation then shrinks the
    // equality filter's output below the broadcast threshold and the
    // SAME query replans as BroadcastHashJoin. This is the stats story a
    // 100 TB warehouse runs on: selectivity knowledge, not hints.
    val wh = tmp("cbo")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
    spark.range(20000)
      .select($"id", ($"id" % 1000).cast("long").as("code"),
              lpad($"id".cast("string"), 64, "x").as("pad"))
      .write.format("parquet").option("path", s"$wh/dim")
      .saveAsTable("graft_cbo_dim")
    val fact = spark.range(5000).select(($"id" % 20000).as("fid"))
    def q = spark.table("graft_cbo_dim").where($"code" === 7)
      .join(fact, $"id" === $"fid")
      .groupBy($"code").agg(count(lit(1)).as("n"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val before = q.queryExecution.sparkPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"stats-less table broadcast anyway (estimate not conservative):\n$before")
      spark.sql(
        "ANALYZE TABLE graft_cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      val after = q.queryExecution.sparkPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"column stats did not flip the join to broadcast:\n$after")
      // and the result itself is stable across the replan
      assert(q.as[(Long, Long)].collect().toSeq === Seq((7L, 5L)))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
    }
  }

  test("q127: parquet aggregate pushdown answers MIN/MAX/COUNT from footers") {
    val df = graft.sources.FileSources.q127AggPushdown(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed to the parquet scan:\n$plan")
    // values still exact vs the ordinary (v1, unpushed) read
    val Array(r) = df.collect()
    val li = Tables.lineitem(spark, sfDir)
    assert(r.getLong(0) === li.count())
    assert(r.getDouble(1) === li.agg(min($"l_quantity")).collect()(0).getDouble(0))
    assert(r.getLong(4) === li.agg(max($"l_orderkey")).collect()(0).getLong(0))
    // the around-resolution config dance restored the session defaults
    assert(spark.conf.get("spark.sql.sources.useV1SourceList").contains("parquet"))
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false")
  }

  test("q132: z-order layout strictly beats linear on 2-D box skipping") {
    val rows = graft.ops.Skew.q132ZOrder(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (linB, linR) = rows("linear")
    val (zB, zR) = rows("zorder")
    assert(zB < linB, s"z-order touched $zB buckets vs linear $linB")
    assert(zR < linR, s"z-order scanned $zR rows vs linear $linR")
    assert(zB > 0, "probe box missed the data entirely — measurement is vacuous")
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

  test("ignoreCorruptFiles: a torn file fails loudly by default, " +
       "skips cleanly when opted in") {
    val dir = tmp("corrupt")
    spark.range(0, 100).toDF("id").repartition(1)
      .write.mode("append").parquet(dir)
    // a torn write: parquet magic but garbage after it
    Files.write(java.nio.file.Paths.get(dir, "part-torn.snappy.parquet"),
      "PAR1 this is not a parquet file".getBytes("UTF-8"))
    // default: the corruption must surface, not silently drop data
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    assert(failed.getMessage != null)
    // opted in: the good file's rows survive, the torn one is skipped.
    // collect INSIDE the conf scope — the flag is read at execution time
    val before = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(dir).count() === 100)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("q246 salted join plans SMJ keyed on (pk, salt) and ties out") {
    val df = graft.ops.Skew.q246SaltedSkewJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the hint forced a shuffle join (no broadcast of the replicated dim)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"salted join did not plan a shuffle join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "dim was broadcast — salting demo degenerated")
    // the join's key set includes the salt: the hot key's rows spread
    // across SALTS reducers instead of one
    assert(plan.contains("salt"), "salt column missing from the plan")
    // and the result is EXACTLY the unsalted join
    import spark.implicits._
    val unsalted = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(when($"l_orderkey" % 3 === 0, 1L).otherwise($"l_partkey")
        .as("pk"),
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .join(spark.read.parquet(s"$sfDir/part.parquet")
        .select($"p_partkey".as("pk"), $"p_brand"), "pk")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("cents_sum"))
      .orderBy($"p_brand")
    assert(df.collect().toSeq === unsalted.collect().toSeq)
  }

  test("hilbert_index: bijective with unit-step locality (full 32x32 walk)") {
    import graft.expr.HilbertIndexExpr.xy2d
    // THE Hilbert property q291's layout win rests on, proved by full
    // enumeration: over a 32x32 grid the index is a bijection onto
    // 0..1023 and every consecutive step of the walk moves to a
    // plane-ADJACENT cell (Manhattan distance exactly 1). Z-order
    // provably lacks the second property (checked as the contrast).
    val cells = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong, xy2d(x.toLong, y.toLong))
    val ds = cells.map(_._3)
    assert(ds.distinct.length === 1024 && ds.min === 0L && ds.max === 1023L)
    val walk = cells.sortBy(_._3)
    walk.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump at ($x1,$y1)->($x2,$y2)")
    }
    def morton(x: Long, y: Long): Long =
      (0 until 5).map(b => (((x >> b) & 1L) << (2 * b)) |
                           (((y >> b) & 1L) << (2 * b + 1))).sum
    val zWalk = cells.map { case (x, y, _) => (x, y, morton(x, y)) }
      .sortBy(_._3)
    val zJumps = zWalk.sliding(2).count {
      case Seq((x1, y1, _), (x2, y2, _)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(zJumps > 0, "z-order should jump at quadrant boundaries")
    // expression codegen path agrees with the static kernel
    val viaExpr = Seq((7L, 19L), (0L, 0L), (31L, 31L)).toDF("x", "y")
      .select(graft.expr.HilbertFunctions.hilbert_index($"x", $"y"))
      .as[Long].collect()
    assert(viaExpr === Array(xy2d(7, 19), xy2d(0, 0), xy2d(31, 31)))
  }
}
