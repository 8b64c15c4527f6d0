package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native as-of operator (custom LogicalPlan + Strategy + SparkPlan):
  * semantics against both the union+window formulation and a brute-force
  * oracle, plus the plan-shape guarantees the operator exists for.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of matches the union+window formulation on the fixture") {
    val native = graft.ops.TemporalJoins.q93AsofNative(spark, sfDir)
      .as[(Long, Long, Option[Timestamp])].collect().toSeq
    val window = graft.ops.TemporalJoins.q10AsOfJoin(spark, sfDir)
      .as[(Long, Long, Option[Timestamp])].collect().toSeq
    assert(native === window)
    assert(native.nonEmpty)
  }

  test("plan: AsOfJoinExec, two exchanges, no Window, no Union, no NLJ") {
    val df = graft.ops.TemporalJoins.q93AsofNative(spark, sfDir)
    df.collect() // execute THIS queryExecution (AQE finalizes on execute)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator not planned:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Union"),
      s"fell back to the union+window shape:\n$plan")
    assert(!plan.contains("NestedLoop"), s"quadratic join planned:\n$plan")
    // one hash exchange per side + one range exchange for the final
    // orderBy = 3; the JOIN itself moves nothing else. Count only the
    // final plan — the AQE string appends an "== Initial Plan ==" section
    // that duplicates every node.
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalPlan).length
    assert(exchanges <= 3, s"unexpected data movement ($exchanges):\n$finalPlan")
  }

  test("tolerance as-of ≡ window form + null-out; plan shape unchanged") {
    val tolMicros = 30L * 60L * 1000000L
    val native = graft.ops.TemporalJoins.q116AsofTolerance(spark, sfDir)
    native.collect()
    // same operator, same movement: the gate is emit-time only
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"tolerance lost the native node:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(finalPlan).length <= 3,
      s"tolerance added data movement:\n$finalPlan")
    // composed twin: q10's union+window last-view carried WITH the
    // purchase ts, then stale matches nulled by the same bound
    val e = graft.Tables.events(spark, sfDir)
      .where($"event_type".isin("view", "purchase"))
      .select($"user_id", $"ts", $"event_type", $"event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val composed = e
      .withColumn("view_ts", when($"event_type" === "view", $"ts"))
      .withColumn("lv", last($"view_ts", ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        when(unix_micros($"ts") - unix_micros($"lv") <= tolMicros, $"lv")
          .as("last_view_ts"))
      .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSeq.sorted
    val got = native.as[(Long, Long, Option[java.sql.Timestamp])]
      .collect().toSeq.sorted
    assert(got === composed)
    // the knob has teeth on this data: some matches were nulled, none
    // were invented
    val untolerated = graft.ops.TemporalJoins.q93AsofNative(spark, sfDir)
      .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSeq
    assert(got.count(_._3.isEmpty) > untolerated.count(_._3.isEmpty),
      "tolerance nulled nothing — fixture gives it no coverage")
    assert(got.size === untolerated.size)
  }

  test("matches brute force on random keyed timelines (seeded)") {
    val gen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
    } yield (ls, rs)
    (0 until 6).foreach { seed =>
      val (ls, rs) = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      // unique tiebreak ids so expected results are well-defined
      val lrows = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rrows = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val left = lrows.toDF("k", "t", "id")
      val right = rrows.toDF("rk", "rt", "rid")
      val got = AsOfJoin.asof(left, right, left("k"), right("rk"),
          Seq(left("t"), left("id")), Seq(right("rt"), right("rid")))
        .select($"k", $"t", $"id", $"rt", $"rid")
        .as[(Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      val expected = lrows.map { case (k, t, i) =>
        val m = rrows.filter(r => r._1 == k &&
          (r._2 < t || (r._2 == t && r._3 < i)))
          .sortBy(r => (r._2, r._3)).lastOption
        (k, t, i, m.map(_._2), m.map(_._3))
      }.toSet
      assert(got === expected, s"seed=$seed mismatch")
      // tolerance variant over the same timelines: the latest-before
      // match survives only within `tol` first-order units
      val tol = seed.toLong * 3 // 0, 3, 6, ... exercises 0-tolerance too
      val gotT = AsOfJoin.asof(left, right, left("k"), right("rk"),
          Seq(left("t"), left("id")), Seq(right("rt"), right("rid")),
          toleranceUnits = Some(tol))
        .select($"k", $"t", $"id", $"rt", $"rid")
        .as[(Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      val expectedT = expected.map { case (k, t, i, mt, mi) =>
        if (mt.exists(v => t - v <= tol)) (k, t, i, mt, mi)
        else (k, t, i, None, None)
      }
      assert(gotT === expectedT, s"seed=$seed tolerance=$tol mismatch")
    }
  }

  test("forward + nearest directions match brute force on random timelines") {
    val gen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
    } yield (ls, rs)
    (0 until 6).foreach { seed =>
      val (ls, rs) = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val lrows = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rrows = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val left = lrows.toDF("k", "t", "id")
      val right = rrows.toDF("rk", "rt", "rid")
      def run(dirn: String, tol: Option[Long]) =
        AsOfJoin.asof(left, right, left("k"), right("rk"),
            Seq(left("t"), left("id")), Seq(right("rt"), right("rid")),
            toleranceUnits = tol, direction = dirn)
          .select($"k", $"t", $"id", $"rt", $"rid")
          .as[(Long, Long, Long, Option[Long], Option[Long])]
          .collect().toSet
      // forward: FIRST strictly-after (by tuple); tolerance gates lead time
      val tol = seed.toLong * 3
      for (tolOpt <- Seq(None, Some(tol))) {
        val expectedF = lrows.map { case (k, t, i) =>
          val m = rrows.filter(r => r._1 == k &&
              (r._2 > t || (r._2 == t && r._3 > i)))
            .sortBy(r => (r._2, r._3)).headOption
            .filter(r => tolOpt.forall(tl => r._2 - t <= tl))
          (k, t, i, m.map(_._2), m.map(_._3))
        }.toSet
        assert(run("forward", tolOpt) === expectedF,
          s"seed=$seed forward tol=$tolOpt mismatch")
      }
      // nearest: closer of {newest strictly-before, first AT-OR-AFTER};
      // ties resolve backward; tolerance gates each side independently
      for (tolOpt <- Seq(None, Some(tol))) {
        val expectedN = lrows.map { case (k, t, i) =>
          val back = rrows.filter(r => r._1 == k &&
              (r._2 < t || (r._2 == t && r._3 < i)))
            .sortBy(r => (r._2, r._3)).lastOption
            .filter(r => tolOpt.forall(tl => t - r._2 <= tl))
          val fwd = rrows.filter(r => r._1 == k &&
              !(r._2 < t || (r._2 == t && r._3 < i)))
            .sortBy(r => (r._2, r._3)).headOption
            .filter(r => tolOpt.forall(tl => r._2 - t <= tl))
          val m = (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (t - b._2 <= f._2 - t) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
          (k, t, i, m.map(_._2), m.map(_._3))
        }.toSet
        assert(run("nearest", tolOpt) === expectedN,
          s"seed=$seed nearest tol=$tolOpt mismatch")
      }
    }
  }

  test("q128/q129 plan shape: same native node, no added movement") {
    for (df <- Seq(graft.ops.TemporalJoins.q128AsofForward(spark, sfDir),
                   graft.ops.TemporalJoins.q129AsofNearest(spark, sfDir))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), s"direction lost the native node:\n$plan")
      val finalPlan = plan.split("== Initial Plan ==").head
      assert("Exchange".r.findAllIn(finalPlan).length <= 3,
        s"direction knob added data movement:\n$finalPlan")
    }
    // the directions genuinely differ on this data (not all three
    // collapsing to the same column)
    val back = graft.ops.TemporalJoins.q93AsofNative(spark, sfDir)
      .as[(Long, Long, Option[Timestamp])].collect().toMap2
    val fwd = graft.ops.TemporalJoins.q128AsofForward(spark, sfDir)
      .as[(Long, Long, Option[Timestamp])].collect().toMap2
    val near = graft.ops.TemporalJoins.q129AsofNearest(spark, sfDir)
      .as[(Long, Long, Option[Timestamp])].collect().toMap2
    assert(back.keySet === fwd.keySet && fwd.keySet === near.keySet)
    assert(back !== fwd, "forward collapsed to backward on the fixture")
    // nearest must always pick one of the two sides
    near.foreach { case (key, ts) =>
      assert(ts == back(key) || ts == fwd(key),
        s"nearest invented a match at $key: $ts")
    }
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => ((r._1, r._2), r._3)).toMap
  }

  test("AsOfJoinPushDown carries a left-only filter into the parquet scan") {
    val e = Tables.events(spark, sfDir) // NANOS-ts-safe reader
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id")
    val views = e.where($"event_type" === "view")
      .select($"user_id".as("v_user"), $"event_id".as("v_event"))
    val df = AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("event_id")), Seq(views("v_event")))
      .where($"user_id" < 10) // applied ABOVE the custom join
    df.collect()
    // our rule moves the filter below the custom node; the BUILT-IN
    // pushdown must then carry it all the way into the left file scan
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PushedFilters:[^\\n]*LessThan\\(user_id,10\\)".r
      .findFirstIn(physical).isDefined,
      s"predicate did not reach the file source:\n$physical")
    // semantic commutation: identical rows to as-of over a pre-filtered
    // left side (filter-before == filter-after for left-only predicates)
    val prefiltered = AsOfJoin.asof(
        purchases.where($"user_id" < 10), views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("event_id")), Seq(views("v_event")))
      .select($"user_id", $"event_id", $"v_event")
      .as[(Long, Long, Option[Long])].collect().toSet
    val got = df.select($"user_id", $"event_id", $"v_event")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === prefiltered && got.nonEmpty,
      "pushdown changed the result")
  }

  test("pushdown does NOT move predicates past a nondeterministic conjunct") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id")
    val views = e.where($"event_type" === "view")
      .select($"user_id".as("v_user"), $"event_id".as("v_event"))
    // rand() first: the deterministic user_id predicate sits AFTER a
    // nondeterministic conjunct, so pushing it would change how many
    // rows rand() evaluates over — it must stay above the join.
    // (The threshold must be contingent: Spark 4 constant-folds an
    // always-true rand() comparison away entirely.)
    val df = AsOfJoin.asof(purchases, views,
        purchases("user_id"), views("v_user"),
        Seq(purchases("event_id")), Seq(views("v_event")))
      .where(rand(42) < 0.5 && $"user_id" < 10)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PushedFilters:[^\\n]*LessThan\\(user_id,10\\)".r
      .findFirstIn(physical).isEmpty,
      s"predicate pushed past a nondeterministic conjunct:\n$physical")
  }

  test("q85 rank family: closed form over value counts, no per-flag fact sort") {
    // the r4 form ran ntile/percent_rank/cume_dist over
    // Window.partitionBy(l_returnflag) — parallelism 3, one task sorting
    // ~33 TB per flag at 100x. The closed-form rewrite must (a) contain
    // no ntile at all and (b) run every window over the per-(flag,
    // quantity) count aggregate, never the raw fact rows.
    val df = graft.ops.Warehouse.q85RankFamily(spark, sfDir)
    df.collect() // execute THIS queryExecution (AQE finalizes then)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("ntile("), s"ntile still planned:\n$plan")
    val lines = plan.linesIterator.toVector
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"expected a (tiny) cumulative window:\n$plan")
    // parents print before children: the value-count HashAggregate must
    // appear BELOW the window, i.e. the window consumes the aggregate
    val aggIdx = lines.indexWhere(
      l => l.contains("HashAggregate(keys=[flag") && l.contains(" v#"), wIdx)
    assert(aggIdx > wIdx,
      s"window input is not the value-count aggregate:\n$plan")
  }

  test("q85 closed form equals the literal ntile/percent_rank/cume_dist " +
       "window on randomized tied data") {
    // the rewrite's claim: with a unique tiebreak the per-(flag,
    // quartile) census is tie-permutation-invariant and equal to the
    // window form. Randomize over heavy ties, group sizes below 4
    // (empty ntile buckets), and single-row groups (percent_rank = 0).
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(85)
    (1 to 12).foreach { trial =>
      val flags = Seq.tabulate(1 + rnd.nextInt(2))(i => s"f$i")
      val data = flags.flatMap { f =>
        Seq.tabulate(rnd.nextInt(26))(uid =>
          (f, rnd.nextInt(7).toDouble, uid.toLong))
      }
      if (data.nonEmpty) {
        val df = data.toDF("flag", "v", "uid")
        val w = Window.partitionBy($"flag").orderBy($"v", $"uid")
        val windowed = df
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy($"flag", $"quartile")
          .agg(count(lit(1)).as("n"),
               round(min($"v"), 2).as("min_v"),
               round(max($"v"), 2).as("max_v"),
               round(avg($"pr"), 4).as("avg_pct_rank"),
               round(avg($"cd"), 4).as("avg_cume_dist"))
        def rows(out: org.apache.spark.sql.DataFrame) = out
          .select($"flag", $"quartile", $"n", $"min_v", $"max_v",
                  $"avg_pct_rank", $"avg_cume_dist")
          .as[(String, Int, Long, Double, Double, Double, Double)]
          .collect().sortBy(r => (r._1, r._2)).toSeq
        val closed = rows(
          graft.ops.Warehouse.rankFamilyCensus(df.select($"flag", $"v")))
        val literal = rows(windowed)
        assert(closed === literal, s"trial $trial diverged on $data")
      }
    }
  }

  test("empty right side leaves every left row unmatched (nulls)") {
    val left = Seq((1L, 10L, 1L), (2L, 5L, 2L)).toDF("k", "t", "id")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
    val got = AsOfJoin.asof(left, right, left("k"), right("rk"),
        Seq(left("t"), left("id")), Seq(right("rt"), right("rid")))
      .select($"k", $"rt").as[(Long, Option[Long])].collect().toSet
    assert(got === Set((1L, None), (2L, None)))
  }

  test("windowed top-k plans a partial WindowGroupLimit below the exchange " +
       "(two-phase top-k)") {
    // Every "per-shard top-k becomes two-phase at 100 TB" note in the
    // repo leans on Spark planning rank-limit windows as
    // WindowGroupLimit(Partial) BEFORE the hash exchange (each map task
    // keeps its own k candidates) and Final after — so the shuffle
    // carries ≤ k rows per partition per task, not the corpus. Pin that
    // contract on the canonical window top-k (q11) and the A-ES weighted
    // sample (q102).
    Seq(
      "q11" -> graft.ops.Windows.q11TopOrdersPerCustomer(spark, sfDir),
      "q102" -> graft.ops.Corpus.q102WeightedSample(spark, sfDir)
    ).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val lines = plan.linesIterator.toVector
      val partialIdx = lines.indexWhere(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial"))
      assert(partialIdx >= 0, s"$name: no partial WindowGroupLimit:\n$plan")
      // parents print above children: an Exchange ABOVE the partial limit
      // means the limit runs map-side, before the shuffle
      val exchangeAbove = lines.take(partialIdx).exists(_.contains("Exchange"))
      assert(exchangeAbove,
        s"$name: partial WindowGroupLimit is not below an exchange:\n$plan")
    }
  }
}
