package graft

import graft.ops.Insights
import org.apache.spark.sql.functions._

/** Invariant tests for the OLAP-insight batch (ops/Insights.scala). The
  * DuckDB oracle proves cell-level equality at sf0.01; these pin the
  * MATHEMATICAL contracts that hold at any scale factor — probability
  * mass sums to 1, entropy is bounded by log2(cardinality), ntile is
  * balanced — which a cell-level diff can't express.
  */
class InsightsSpec extends SparkSpec {

  test("q162: month-0 retention accounts for every customer exactly once") {
    val rows = Insights.q162CohortRetention(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) >= 0L), "months_since must be >= 0")
    val month0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    // every customer is active in their own cohort month
    assert(month0 == nCust)
  }

  test("q163: support <= confidence and lift is consistent with both") {
    val rows = Insights.q163BasketAffinity(spark, sfDir).collect()
    assert(rows.nonEmpty, "min-support 3 must leave pairs at sf0.001")
    rows.foreach { r =>
      val (support, confidence, lift) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // P(p1 ∧ p2) <= P(p2 | p1); both in (0, 1]
      assert(support > 0 && support <= confidence + 1e-9)
      assert(confidence <= 1.0 + 1e-9)
      assert(lift > 0)
    }
  }

  test("q164: each axis' tiles are balanced to within one customer") {
    val rows = Insights.q164RfmSegments(spark, sfDir).collect()
    val n = rows.map(_.getLong(3)).sum
    def axisCounts(i: Int): Map[Long, Long] =
      rows.groupBy(_.getLong(i)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    for (axis <- 0 to 2) {
      val counts = axisCounts(axis)
      assert(counts.keySet == Set(1L, 2L, 3L, 4L))
      assert(counts.values.max - counts.values.min <= 1,
        s"ntile(4) must balance axis $axis: $counts")
      assert(counts.values.sum == n)
    }
  }

  test("q165: outgoing transition probabilities sum to 1 per source") {
    val rows = Insights.q165MarkovTransitions(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"P(*|$src) sums to $mass")
    }
    // transition count = events - one terminal event per user
    val e = Tables.events(spark, sfDir)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("q166: fences are ordered and outliers are a strict minority") {
    val rows = Insights.q166IqrOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) < r.getDouble(4), "lo < hi")
      assert(r.getLong(2) < r.getLong(1), "outliers < n")
    }
  }

  test("q167: chi-square is non-negative with the right dof") {
    val row = Insights.q167ChisqIndependence(spark, sfDir).collect().head
    assert(row.getDouble(0) >= 0.0)
    val o = Tables.orders(spark, sfDir)
    val dof = (o.select("o_orderpriority").distinct().count() - 1) *
      (o.select("o_orderstatus").distinct().count() - 1)
    assert(row.getLong(1) == dof)
  }

  test("q168: leading digits are 1-9 and observed mass sums to 1") {
    val rows = Insights.q168BenfordScreen(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val mass = rows.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < 1e-4)
    // benford_p is the closed form, independent of the data
    rows.foreach { r =>
      val d = r.getLong(0).toDouble
      assert(math.abs(r.getDouble(3) - math.log10(1 + 1 / d)) < 1e-5)
    }
  }

  test("q172: gap count ties out to orders minus first-orders") {
    val rows = Insights.q172InterpurchaseGaps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9, "median <= p90")
      assert(r.getDouble(4) <= r.getLong(5).toDouble + 1e-9, "p90 <= max")
    }
    val o = Tables.orders(spark, sfDir)
    val expected = o.count() - o.select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("q173: reference deciles carry ~10% mass each and PSI is finite") {
    val rows = Insights.q173PsiDrift(spark, sfDir).collect()
    assert(rows.length == 10, s"expected 10 bins, got ${rows.length}")
    val refMass = rows.map(_.getDouble(3)).sum
    assert(math.abs(refMass - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - 0.1) < 0.02,
        s"ref decile mass ${r.getDouble(3)} far from 0.1")
      assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
    }
  }

  test("q174: KS statistic is a valid sup-distance in [0,1]") {
    val row = Insights.q174KsTest(spark, sfDir).collect().head
    val ks = row.getDouble(0)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(row.getLong(1) > 0 && row.getLong(2) > 0)
  }

  test("q175: Gini is in [0,1) and matches a driver-side recompute") {
    val row = Insights.q175Gini(spark, sfDir).collect().head
    val gini = row.getDouble(0)
    assert(gini >= 0.0 && gini < 1.0)
    val revs = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(org.apache.spark.sql.functions.sum("o_totalprice").as("r"))
      .collect().map(r => (r.getDouble(1), r.getLong(0))).sortBy(identity)
    val n = revs.length.toDouble
    val tot = revs.map(_._1).sum
    val sip = revs.zipWithIndex.map { case ((r, _), i) => (i + 1) * r }.sum
    val expected = 2.0 * sip / (n * tot) - (n + 1.0) / n
    assert(math.abs(gini - expected) < 1e-4, s"$gini vs $expected")
  }

  test("q176: ACF values are correlations and pair counts step down by lag") {
    val rows = Insights.q176Acf(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    val nDays = Tables.orders(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")))
      .distinct().count()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      assert(r.getLong(2) == nDays - r.getLong(0))
    }
  }

  test("q177: attribution credits only pre-purchase touches") {
    val rows = Insights.q177Attribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != "purchase" && r.getString(1) != "purchase")
      assert(r.getLong(2) > 0)
    }
    // attributed conversions <= total purchases (first event of a user
    // being a purchase has no touch to credit)
    val purchases = Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.map(_.getLong(2)).sum <= purchases)
  }

  test("q178: change point is a real date with a finite CUSUM") {
    val row = Insights.q178CusumChangepoint(spark, sfDir).collect().head
    assert(row.getDate(0) != null)
    assert(!row.getDouble(1).isNaN && !row.getDouble(1).isInfinite)
  }

  test("q179: decay keeps scores under the undecayed sum, monotone in time") {
    val rows = Insights.q179DecayedEngagement(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val plain = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (uid, score) = (r.getLong(0), r.getDouble(2))
      assert(score >= 0.0 && score <= plain(uid) + 1e-6,
        s"user $uid decayed $score exceeds raw ${plain(uid)}")
    }
  }

  test("q180: path counts tie out to journeys of length >= 3") {
    val rows = Insights.q180PathMining(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 5))
    // total triples across ALL paths (no threshold) = sum over users of
    // max(0, n_events - 2); the thresholded sum must be <= that
    val perUser = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    val totalTriples = perUser.map(n => math.max(0L, n - 2)).sum
    assert(rows.map(_.getLong(3)).sum <= totalTriples)
  }

  test("q182: skyline members are mutually non-dominating and complete") {
    val rows = Insights.q182Skyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    def dom(q: (Long, Long, Long, Double), p: (Long, Long, Long, Double)) =
      q._2 >= p._2 && q._3 >= p._3 && q._4 >= p._4 &&
        (q._2 > p._2 || q._3 > p._3 || q._4 > p._4)
    // no member dominates another
    for (p <- rows; q <- rows) assert(!dom(q, p), s"$q dominates member $p")
    // completeness vs a driver-side brute force over ALL points
    val pts = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n_items"),
           org.apache.spark.sql.functions.sum("l_quantity").cast("long")
             .as("qty_total"))
      .join(Tables.customer(spark, sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("o_custkey", "n_items", "qty_total", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = pts.filter(p => !pts.exists(q => dom(q, p)))
    assert(rows.sortBy(_._1).toSeq == brute.sortBy(_._1).toSeq)
  }

  test("q184: moment identities hold (r2 = sxy^2/(sxx*syy), |r|<=1)") {
    val rows = Insights.q184RegrFull(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sxx, syy, sxy, r2) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(6))
      assert(sxx >= 0 && syy >= 0)
      val expected = sxy * sxy / (sxx * syy)
      assert(math.abs(r2 - expected) < 1e-3, s"r2 $r2 vs $expected")
      assert(r2 >= 0 && r2 <= 1.0 + 1e-9)
    }
  }

  test("q185: equal-credit attribution conserves attributable revenue") {
    val rows = Insights.q185LinearAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // total credited value = value of purchases that HAVE >= 1 prior touch
    val f = org.apache.spark.sql.functions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val attributable = Tables.events(spark, sfDir)
      .withColumn("n_touch",
        f.count_if(f.col("event_type") =!= "purchase").over(w))
      .where(f.col("event_type") === "purchase" && f.col("n_touch") > 0)
      .agg(f.sum("value")).collect().head.getDouble(0)
    val credited = rows.map(_.getDouble(2)).sum
    assert(math.abs(credited - attributable) < 0.5,
      s"credit $credited vs attributable $attributable")
  }

  test("q186: profile matches per-column ground truth") {
    val rows = Insights.q186ColumnProfile(spark, sfDir).collect()
    assert(rows.length == 6)
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) + r.getLong(3) <= n + r.getLong(3)) // sanity
    }
    val byCol = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byCol("o_orderkey") == n, "PK must be unique")
    assert(byCol("o_orderstatus") <= 3)
  }

  test("q190: equi-depth bins cover all rows in ~n/10 slices with ordered ranges") {
    val rows = Insights.q190EquidepthHist(spark, sfDir).collect()
    assert(rows.length == 10)
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total, "bins must cover every row")
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10.0) <= total * 0.02 + 2,
        s"bin ${r.getLong(0)} holds ${r.getLong(1)} of $total — not equi-depth")
      assert(r.getDouble(2) <= r.getDouble(3), "lo <= hi within bin")
    }
    // ranges are disjoint and ordered across bins
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
      case _ =>
    }
  }

  test("q191: scaled features audit to mean 0, sd 1 per group") {
    val rows = Insights.q191FeatureScaling(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) < 1e-5, s"mean_z ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-5, s"sd_z ${r.getDouble(3)}")
      assert(r.getDouble(4) < 0 && r.getDouble(5) > 0)
    }
  }

  test("q192: LOO encoding means equal raw means (the cancellation identity)") {
    val rows = Insights.q192TargetEncoding(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.02,
        s"${r.getString(0)}: raw ${r.getDouble(2)} vs loo ${r.getDouble(3)}")
      assert(r.getDouble(4) > 0, "LOO encodings must vary within a category")
    }
  }

  test("q193: temporal split covers every event once, embargo visible, ordered") {
    val rows = Insights.q193TemporalSplit(spark, sfDir).collect()
    val byBucket = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
    assert(byBucket.contains("1_train") && byBucket.contains("2_valid") &&
           byBucket.contains("3_test"))
    // buckets are time-ordered and non-overlapping: train < valid < test
    assert(byBucket("1_train")._3 < byBucket("2_valid")._2)
    assert(byBucket("2_valid")._3 < byBucket("3_test")._2)
    // train is the largest bucket (70% of the span)
    assert(byBucket("1_train")._1 > byBucket("2_valid")._1)
    assert(byBucket("1_train")._1 > byBucket("3_test")._1)
  }

  test("q196: kappa is in [-1,1], below raw agreement, on the full corpus") {
    val row = Insights.q196CohensKappa(spark, sfDir).collect().head
    val (kappa, po, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    assert(kappa >= -1.0 && kappa <= 1.0)
    assert(po >= 0.0 && po <= 1.0)
    // chance correction can only reduce: kappa <= p_observed (pe >= 0)
    assert(kappa <= po + 1e-9)
    assert(n == Tables.documents(spark, sfDir).count())
    // the two raters are correlated but not identical: 0 < kappa < 1
    assert(kappa > 0.0 && kappa < 1.0, s"degenerate raters: kappa=$kappa")
  }

  test("q169: entropy is bounded by log2 of the column cardinality") {
    val rows = Insights.q169EntropyProfile(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (h, k) = (r.getDouble(1), r.getLong(2))
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, log2($k)]")
    }
  }

  // ─── sketch twins: the `sketch = true` knob (approx_percentile cut
  // points, the 100 TB path PlanLint's exact-percentile rule demands)
  // must agree with the exact oracle-checked form within sketch error ───

  test("q166 sketch twin: identical groups/counts, fences within sketch error") {
    val e = Insights.q166IqrOutliers(spark, sfDir).collect()
    val a = Insights.q166IqrOutliers(spark, sfDir, sketch = true).collect()
    assert(e.length == a.length)
    e.zip(a).foreach { case (re, ra) =>
      assert(re.getString(0) == ra.getString(0))
      val n = re.getLong(1)
      assert(n == ra.getLong(1), "group counts are fence-independent")
      assert(math.abs(re.getLong(2) - ra.getLong(2)) <= 0.05 * n + 10,
        s"${re.getString(0)}: outlier counts ${re.getLong(2)} vs ${ra.getLong(2)}")
    }
  }

  test("q172 sketch twin: medians within one integer gap-day of exact") {
    val e = Insights.q172InterpurchaseGaps(spark, sfDir).collect()
    val a = Insights.q172InterpurchaseGaps(spark, sfDir, sketch = true).collect()
    assert(e.length == a.length)
    e.zip(a).foreach { case (re, ra) =>
      assert(re.getString(0) == ra.getString(0))
      assert(re.getLong(1) == ra.getLong(1))     // n_gaps
      assert(re.getDouble(2) == ra.getDouble(2)) // avg: percentile-free
      // the sketch returns an actual data value, the exact form
      // interpolates — at sf0.001 the per-segment gap distribution is
      // sparse at the tail, so adjacent values sit several days apart
      assert(math.abs(re.getDouble(3) - ra.getDouble(3)) <= 5.0) // median
      assert(math.abs(re.getDouble(4) - ra.getDouble(4)) <= 5.0) // p90
      assert(re.getLong(5) == ra.getLong(5))     // max
    }
  }

  test("q173 sketch twin: same bins, same totals") {
    val e = Insights.q173PsiDrift(spark, sfDir).collect()
    val a = Insights.q173PsiDrift(spark, sfDir, sketch = true).collect()
    assert(e.length == a.length, "decile binning must keep 10 bins")
    assert(e.map(_.getLong(1)).sum == a.map(_.getLong(1)).sum) // ref total
    assert(e.map(_.getLong(2)).sum == a.map(_.getLong(2)).sum) // cur total
  }

  test("q190 sketch twin: q197 pins the equi-depth property as data") {
    val row = Insights.q197EquidepthSketch(spark, sfDir).head()
    assert(row.getLong(0) == 10L, s"bins: ${row.getLong(0)}")
    assert(row.getLong(1) ==
      Tables.lineitem(spark, sfDir).count(), "total must be sketch-independent")
    assert(row.getBoolean(2), "sketched bins exceeded the rank-error budget")
  }

  test("q196 sketch twin: kappa within sketch tolerance of exact") {
    val e = Insights.q196CohensKappa(spark, sfDir).head()
    val a = Insights.q196CohensKappa(spark, sfDir, sketch = true).head()
    assert(e.getLong(2) == a.getLong(2))
    assert(math.abs(e.getDouble(0) - a.getDouble(0)) <= 0.1,
      s"kappa ${e.getDouble(0)} vs sketched ${a.getDouble(0)}")
  }

  test("q234 MAD screen matches a driver-side robust recompute") {
    import spark.implicits._
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy($"o_orderdate")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .withColumn("wd", weekday($"o_orderdate").cast("long") + 1L)
      .select($"wd", $"cents").as[(Long, Long)].collect()
    def medianOf(xs: Seq[Long]): Long = {
      // percentile_disc(0.5): smallest attained value with cume_dist >= 0.5
      val sorted = xs.sorted
      sorted((xs.size - 1) / 2)
    }
    val expected = daily.groupBy(_._1).map { case (wd, rows) =>
      val cents = rows.map(_._2).toSeq
      val med = medianOf(cents)
      val devs = cents.map(c => math.abs(c - med))
      val mad = medianOf(devs)
      val anom = devs.count(d =>
        if (mad > 0) 6745L * d > 35000L * mad else d > 0)
      wd -> (cents.size.toLong, med, mad, anom.toLong)
    }
    val got = Insights.q234SeasonalMad(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (wd, n, med, mad, a) => wd -> (n, med, mad, a) }.toMap
    assert(got === expected)
    assert(got.values.map(_._4).sum > 0, "fixture produced no anomalies")
  }

  test("q252 census partitions every customer; kept rows are k-anonymous") {
    import spark.implicits._
    val census = Insights.q252KAnonymity(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    // per-segment identity and full-corpus conservation
    census.foreach { case (seg, n, kept, resc, supp) =>
      assert(n === kept + resc + supp, s"$seg census does not partition") }
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("b1"))
      .as[(Int, String, Long)].collect()
    assert(census.map(_._2).sum === cust.length.toLong)
    // driver recompute of the fine gate: kept-at-fine per segment
    val fineSizes = cust.groupBy(identity).view.mapValues(_.length)
    val keptRef = cust.filter(r => fineSizes(r) >= 5)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    census.foreach { case (seg, _, kept, _, _) =>
      assert(kept === keptRef.getOrElse(seg, 0L), s"$seg kept mismatch") }
  }

  test("q271 Mann–Whitney matches a per-row midrank driver recompute") {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .select($"c_custkey".as("o_custkey"), $"c_mktsegment".as("seg")),
        "o_custkey")
      .where($"seg".isin("BUILDING", "MACHINERY"))
      .select(round($"o_totalprice" * 100, 0).cast("long"),
        ($"seg" === "BUILDING").cast("long"))
      .as[(Long, Long)].collect()
    // brute-force doubled midranks per observation — the textbook form
    // the histogram fold must agree with
    val vals = rows.map(_._1)
    def rank2x(v: Long): Long =
      2L * vals.count(_ < v) + vals.count(_ == v) + 1L
    val n1 = rows.count(_._2 == 1L).toLong
    val n2 = rows.length - n1
    val r1x2 = rows.filter(_._2 == 1L).map(r => rank2x(r._1)).sum
    val u1x2Ref = 2L * n1 * n2 + n1 * (n1 + 1L) - r1x2
    val got = Insights.q271MannWhitney(spark, sfDir)
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 === n1 && got._2 === n2)
    assert(got._3 === u1x2Ref, s"U×2: got ${got._3}, ref $u1x2Ref")
    // doubled U is bounded by 2·n1·n2 and z is finite
    assert(got._3 >= 0L && got._3 <= 2L * n1 * n2)
  }

  test("q269 journey paths: trigram shares are consistent") {
    import spark.implicits._
    val paths = Insights.q269JourneyPaths(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(paths.nonEmpty && paths.length <= 15)
    // counts are non-increasing (the top-15 contract) and every path is
    // three valid event types
    val counts = paths.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    val types = Set("view", "click", "purchase", "signup", "error")
    paths.foreach { case (p, n, bp) =>
      assert(p.split(">").length === 3 &&
             p.split(">").forall(types.contains), p)
      assert(n > 0L && bp >= 0L && bp <= 10000L)
    }
  }

  test("q298 removal attribution: removing a channel never helps, shares " +
       "partition 10000 bp") {
    import spark.implicits._
    val rows = Insights.q298MarkovAttribution(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet === Set("click", "error", "signup", "view"))
    val base = rows.head._2
    assert(base > 0L && base <= 1000000000L,
      "base conversion must be a probability in nanos")
    rows.foreach { case (ch, b, rem, eff, bp) =>
      assert(b === base, "every row carries the same base")
      assert(rem <= b, s"$ch: removal cannot INCREASE conversion")
      assert(eff === math.max(0L, b - rem))
      assert(bp >= 0L && bp <= 10000L)
    }
    // truncating shares: each div drops < 1 bp, so the sum lands in
    // (10000 - 4, 10000]
    val shareSum = rows.map(_._5).sum
    assert(shareSum > 9996L && shareSum <= 10000L, s"shares: $shareSum")
  }

  test("q299 Holt backtest matches a driver-side fold of the recurrence") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
    val (d0, d1) = (daily.map(_._2).min, daily.map(_._2).max)
    def fdiv10(x: Long): Long = math.floor(x / 10.0).toLong
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val byDay = rows.map(r => r._2 -> r._3 * 1000000L).toMap
      val ys = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      var l = ys(0); var b = ys(1) - ys(0)
      var sae = 0L; var sms = 0L; var np = 0L
      ys.drop(2).foreach { y =>
        val f = l + b
        val err = math.abs(y - f)
        if (y + f > 0)
          sms += math.floor(2000000L * err / (y + f).toDouble).toLong
        sae += err; np += 1
        val l2 = fdiv10(2 * y + 8 * (l + b))
        b = fdiv10((l2 - l) + 9 * b); l = l2
      }
      t -> ((np, sae / np, sms / np, l, b))
    }
    val got = Insights.q299HoltBacktest(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (t, np, mae, sm, l, b) =>
      assert(expected(t) === ((np, mae, sm, l, b)), s"series $t")
    }
    assert(got.map(_._1).toSet === expected.keySet)
  }

  test("q310 BH step-up: rejects through a failing earlier rank; " +
       "all-null set rejects nothing") {
    import spark.implicits._
    def run(ps: Seq[Long]): Seq[(Long, Long)] =
      Insights.bhStepUp(
        ps.zipWithIndex.map { case (p, i) => (i.toString, p) }
          .toDF("id", "p_micro"), Seq("id"), ps.length)
        .select($"p_rank", $"rejected").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    // textbook: k* = 3 (0.01 ≤ .02, 0.03 ≤ .04, 0.05 ≤ .06; 0.4 / 0.9
    // fail) — exactly ranks 1..3 rejected
    assert(run(Seq(10000L, 30000L, 50000L, 400000L, 900000L))
      .map(_._2) === Seq(1L, 1L, 1L, 0L, 0L))
    // STEP-UP: rank 1 (p = .03 > .02) fails its own test but ranks 2..5
    // pass, so k* = 5 and EVERYTHING rejects — the property per-test
    // thresholding lacks
    assert(run(Seq(30000L, 31000L, 32000L, 33000L, 50000L))
      .map(_._2) === Seq(1L, 1L, 1L, 1L, 1L))
    // null set: no rank satisfies, zero rejections
    assert(run(Seq(200000L, 500000L, 900000L)).map(_._2)
      === Seq(0L, 0L, 0L))
  }

  test("q300 DP release: noise is the pinned hash-seeded Laplace draw, " +
       "clamped at zero") {
    import spark.implicits._
    val rows = Insights.q300DpHistogram(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.forall(_._3 >= 0L), "released counts are clamped at 0")
    assert(rows.forall(_._4 === 1000000L))
    // recompute one bucket's draw on the driver: same md5 → same integer
    // → same inverse-transform Laplace, micro-quantized
    val (et, day, noisy, _) = rows.head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"dp:$et:$day".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    val k = java.lang.Long.parseLong(hex, 16)
    val u = (2.0 * k + 1.0) / 9007199254740992.0
    val lap = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    val lapMicro = BigDecimal(BigDecimal(lap)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val trueN = Tables.events(spark, sfDir)
      .where(col("event_type") === et &&
        expr("unix_micros(ts) div 86400000000") === day).count()
    assert(noisy === math.max(0L, trueN * 1000000L + lapMicro))
  }
}
