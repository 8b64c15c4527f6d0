package graft

import graft.ops.SqlText
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Spark-4 SQL-surface operators (recursive CTE / VARIANT / LATERAL)
  * plus the XML source: independent recomputes of each result, and the
  * plan shapes the operators exist for.
  */
class SqlTextSpec extends SparkSpec {
  import spark.implicits._

  // ─── q107 recursive CTE ───────────────────────────────────────────────

  test("q107 executes as UnionLoop recursion, not a hand-unrolled union") {
    val df = SqlText.q107RecursiveHierarchy(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), s"recursion not planned:\n$plan")
  }

  test("q107 depth census matches a driver-side recursion recompute") {
    val keyed = graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect().toMap
    // walk parent(ck) = floor(ck/10) until a single-digit root
    def depth(ck: Long): Int =
      if (ck < 10) 0 else 1 + depth(ck / 10)
    val expected = keyed.keys.groupBy(depth).map { case (dep, ks) =>
      (dep, ks.size.toLong, BigDecimal(ks.map(keyed).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = SqlText.q107RecursiveHierarchy(spark, sfDir)
      .select($"depth", $"n_nodes", $"acctbal")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 0.02, s"acctbal at depth ${g._1}")
    }
    assert(got.map(_._2).sum === keyed.size.toLong) // every customer reached
  }

  // ─── q108 VARIANT shredding ───────────────────────────────────────────

  test("q108 routes exactly the corrupted rows to the _invalid bucket") {
    val expectedBad = graft.Tables.documents(spark, sfDir)
      .where($"doc_id" % 97 === 13).count()
    val invalid = SqlText.q108VariantShred(spark, sfDir)
      .where($"lang" === "_invalid")
      .select($"n_docs").as[Long].collect()
    assert(invalid.toSeq === Seq(expectedBad))
    assert(expectedBad > 0, "fixture must plant at least one malformed row")
  }

  test("q108 scan prunes the text column (variant built from metadata only)") {
    val df = SqlText.q108VariantShred(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("text#"),
      s"document text column read by a metadata-only query:\n$plan")
    assert(!plan.contains("Generate"), s"unexpected explode:\n$plan")
  }

  // ─── q109 XML source ──────────────────────────────────────────────────

  test("q109 XML read maps attributes and nested elements (schema-first)") {
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))))
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_spec")
    val p = dir.resolve("t.xml")
    java.nio.file.Files.writeString(p,
      """<rs><r id="7"><name>a</name><meta><k>x</k></meta></r>
        |<r id="8"><name>b</name><meta><k>y</k></meta></r></rs>""".stripMargin)
    val got = spark.read.option("rowTag", "r").schema(sch)
      .format("xml").load(p.toString)
      .select($"_id", $"name", $"meta.k").as[(Long, String, String)]
      .collect().toSeq.sortBy(_._1)
    assert(got === Seq((7L, "a", "x"), (8L, "b", "y")))
  }

  test("q109 census covers all fixture rows") {
    val res = graft.sources.FileSources.q109XmlSource(spark, sfDir)
      .agg(sum($"n").cast("long"), sum($"total_lectures").cast("long"))
      .as[(Long, Long)].collect().head
    assert(res._1 === graft.sources.FileSources.xmlRows.size.toLong)
    assert(res._2 === graft.sources.FileSources.xmlRows.map(_._4).sum)
  }

  // ─── q118 schema evolution ────────────────────────────────────────────

  test("q118 mergeSchema read ≡ unionByName(allowMissingColumns) twin") {
    import graft.sources.FileSources
    val fromLake = FileSources.q118SchemaEvolution(spark, sfDir)
      .as[(String, Long, Option[Long], Int)].collect().toSeq.sorted
    val e1 = FileSources.evoEpoch1.toDF("id", "level")
      .withColumn("epoch", lit(1))
    val e2 = FileSources.evoEpoch2.toDF("id", "level", "num_lectures")
      .withColumn("epoch", lit(2))
    val inMem = e1.unionByName(e2, allowMissingColumns = true)
      .groupBy($"level")
      .agg(count(lit(1)).as("n"),
           sum($"num_lectures").cast("long").as("total_lectures"),
           min($"epoch").cast("int").as("first_epoch"))
      .as[(String, Long, Option[Long], Int)].collect().toSeq.sorted
    assert(fromLake === inMem)
    assert(fromLake.nonEmpty)
    // epoch arrived via partition DISCOVERY, not file contents
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_fixtures", "evolve").toString)
    assert(merged.columns.contains("epoch"))
    assert(merged.columns.contains("num_lectures"))
    assert(merged.where($"epoch" === 1 && $"num_lectures".isNotNull).count() === 0)
  }

  // ─── q119 null-safe join ──────────────────────────────────────────────

  test("q119 <=> plans a hash equi-join and buckets null-null matches") {
    val df = graft.ops.Relational.q119NullsafeJoin(spark, sfDir)
    val rows = df.as[(Long, Long, Long, Long)].collect()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"null-safe equality fell off the hash-join path:\n$plan")
    // planted nulls: every 10th custkey x every 7th suppkey meet in -1
    val nullCust = graft.Tables.customer(spark, sfDir)
      .where($"c_custkey" % 10 === 0).count()
    val nullSupp = graft.Tables.supplier(spark, sfDir)
      .where($"s_suppkey" % 7 === 0).count()
    val bucket = rows.find(_._1 == -1L)
    assert(bucket.isDefined, "null-null bucket missing")
    assert(bucket.get._2 === nullCust * nullSupp)
    assert(bucket.get._3 === nullCust && bucket.get._4 === nullSupp)
  }

  // ─── q120 collations ──────────────────────────────────────────────────

  test("q120 collation groups case-insensitively; join stays equi (SMJ)") {
    val df = graft.ops.Scalars.q120Collation(spark, sfDir)
    val rows = df.collect()
    // 10 raw mixed-case labels collapse to the 5 collated groups
    val raw = graft.Tables.customer(spark, sfDir)
      .select(when($"c_custkey" % 2 === 0, initcap(lower($"c_mktsegment")))
        .otherwise(lower($"c_mktsegment")).as("m"))
      .distinct().count()
    assert(raw === 10L && rows.length === 5)
    // collated keys can't build a hash table (no binary equality), so the
    // planner's contract is SortMergeJoin on the collated keys — an
    // equi-join with one shuffle per side, never a loop join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"collated equality not planned as a merge equi-join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"collated equality fell to a loop join:\n$plan")
  }

  // ─── q121 listagg ─────────────────────────────────────────────────────

  test("q121 listagg WITHIN GROUP is deterministic under repartitioning") {
    val base = graft.ops.Analytics.q121Listagg(spark, sfDir)
      .as[(String, Long, String)].collect().toSeq.sorted
    // same aggregation over a deliberately scrambled partitioning
    val scrambled = graft.Tables.nation(spark, sfDir).repartition(7)
      .join(graft.Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
        .as("members"))
      .as[(String, String)].collect().toSeq.sorted
    assert(base.map(r => (r._1, r._3)) === scrambled)
    // members really are the sorted group contents
    base.foreach { case (_, n, members) =>
      val parts = members.split(",").toSeq
      assert(parts.size.toLong === n && parts === parts.sorted)
    }
  }

  // ─── q110 LATERAL top-k ───────────────────────────────────────────────

  test("q110 decorrelates to a partial WindowGroupLimit, no loop join") {
    val df = SqlText.q110LateralTopk(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-group LIMIT not planned as a group-limit window:\n$plan")
    assert(plan.contains("Partial"),
      s"no map-side truncation before the exchange:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"lateral executed as a loop:\n$plan")
  }

  // ─── q112 binned interval join ────────────────────────────────────────

  test("q112 binned join ≡ naive inequality join; only the naive plans BNLJ") {
    val binned = graft.ops.TemporalJoins.q112IntervalBinJoin(spark, sfDir)
    val li = graft.Tables.lineitem(spark, sfDir)
    val points = li.where($"l_orderkey" % 97 === 0)
      .select($"l_orderkey", $"l_shipdate".cast("date").as("pd"))
    val ivs = li.where($"l_orderkey" % 89 === 0)
      .select(($"l_orderkey" * 10 + $"l_linenumber").as("iv_id"),
              $"l_shipdate".cast("date").as("lo"))
      .withColumn("hi", date_add($"lo", (lit(1) + $"iv_id" % 25).cast("int")))
    val naive = ivs.join(points, $"pd".between($"lo", $"hi"))
      .groupBy($"iv_id")
      .agg(count(lit(1)).as("n_pts"),
           countDistinct($"l_orderkey").as("n_orders"))
    assert(binned.select($"iv_id", $"n_pts", $"n_orders")
             .as[(Long, Long, Long)].collect().sorted.toSeq
           === naive.as[(Long, Long, Long)].collect().sorted.toSeq)
    naive.collect()
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop"),
      "expected the un-binned containment join to plan as BNLJ " +
        s"(the failure mode q112 exists to avoid):\n$naivePlan")
    binned.collect()
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"binned form still quadratic:\n$plan")
  }

  // ─── q113 SQL UDFs ────────────────────────────────────────────────────

  test("q113 SQL UDFs are inlined: no UDF node, plan stays codegen'd") {
    val df = SqlText.q113SqlUdf(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // inlined = the BODY appears expanded inside the aggregate (the alias
    // attribute keeps the function's name; that's fine) and no black-box
    // UDF node exists anywhere
    assert(plan.contains("(1.0 - disc"),
      s"graft_net body not inlined into the aggregate:\n$plan")
    assert(plan.contains("partial_sum"),
      s"partial aggregation lost (black-box UDF would do this):\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"black-box UDF in plan:\n$plan")
  }

  test("SQL table function (RETURNS TABLE) evaluates through the analyzer") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_seq(n INT)
        |RETURNS TABLE(i INT)
        |RETURN SELECT explode(sequence(1, n))""".stripMargin)
    val got = spark.sql("SELECT sum(i) AS s FROM graft_seq(10)")
      .as[Long].collect().toSeq
    assert(got === Seq(55L))
  }

  // ─── q114 pipe syntax ─────────────────────────────────────────────────

  test("q114 pipe syntax ≡ the classic-SQL formulation in the same session") {
    val pipe = SqlText.q114PipeSyntax(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    graft.Tables.lineitem(spark, sfDir)
      .createOrReplaceTempView("graft_q114_classic")
    val classic =
      try spark.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(count(*) AS BIGINT) AS n,
          |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
          |FROM graft_q114_classic
          |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
        .as[(String, String, Long, Double)].collect().toSeq
      finally spark.catalog.dropTempView("graft_q114_classic")
    assert(pipe === classic)
    assert(pipe.nonEmpty)
  }

  test("q110 matches the DataFrame window-rank formulation bit for bit") {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir)
              .where($"c_custkey" % 7 === 0).select($"c_custkey"),
            $"o_custkey" === $"c_custkey")
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 2)
      .select($"c_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val got = SqlText.q110LateralTopk(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q145: NOT IN plans the NULL-AWARE anti join; NOT EXISTS the plain one") {
    val df = graft.ops.Warehouse.q145NullAwareAnti(spark, sfDir)
    val Array(r) = df.collect()
    // the semantic divergence is the point: a single NULL in the subquery
    // annihilates NOT IN, while NOT EXISTS still finds the orphans
    assert(r.getLong(0) === 0L, "NOT IN must return zero under a NULL key")
    assert(r.getLong(1) > 0L, "fixture must have genuine orphans")
    assert(r.getLong(2) > 0L, "fixture must plant NULL keys")
    val plan = df.queryExecution.executedPlan.toString
    // BroadcastHashJoin's trailing flag is isNullAwareAntiJoin: the NOT IN
    // branch carries `true`, the NOT EXISTS branch `false`
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN did not plan a null-aware anti join:\n$plan")
    assert(plan.contains("LeftAnti, BuildRight, false"),
      s"NOT EXISTS lost its plain anti join:\n$plan")
  }

  test("q138: SET VAR captures the statistic; EXECUTE IMMEDIATE binds it; " +
       "session state is cleaned up") {
    val got = SqlText.q138SqlVariables(spark, sfDir).collect()
    // the emitted threshold IS the avg the direct formulation computes
    val expectedThr = Tables.lineitem(spark, sfDir)
      .agg(round(avg($"l_quantity"), 4)).collect()(0).getDouble(0)
    got.foreach(r => assert(r.getDouble(3) === expectedThr))
    // counts ≡ the inline-threshold formulation
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(count(when($"l_quantity" >
        Tables.lineitem(spark, sfDir).agg(avg($"l_quantity"))
          .collect()(0).getDouble(0), 1)).as("n_above"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getLong(1) === direct(r.getString(0))))
    // lifecycle: the temporary variable did not leak into the session
    val leaked = intercept[Exception] {
      spark.sql("SELECT graft_q138_thr").collect()
    }
    assert(leaked.getMessage.toLowerCase.contains("graft_q138_thr"))
  }

  test("q152 script binary search ≡ closed-form 5th-largest; conf restored") {
    val before = spark.conf.getOption("spark.sql.scripting.enabled")
    val out = SqlText.q152SqlScript(spark, sfDir)
      .as[(Long, Long)].collect().head
    // independent closed form straight from the DataFrame API
    val counts = spark.read.parquet(s"$sfDir/supplier.parquet")
      .groupBy($"s_nationkey").count()
      .select($"count").as[Long].collect().sortBy(-_)
    val fifth = if (counts.length >= 5) counts(4) else 0L
    assert(out._1 === fifth, s"script found ${out._1}, closed form $fifth")
    assert(out._2 === counts.count(_ >= fifth))
    assert(out._2 >= 5 || counts.length < 5, "invariant: ≥5 nations at c5")
    assert(spark.conf.getOption("spark.sql.scripting.enabled") === before,
      "scripting flag must be restored")
  }
}
