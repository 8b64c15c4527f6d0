package graft

import graft.ops.{Analytics, TextSim}
import org.apache.spark.sql.functions._

/** Text-pipeline semantics: LSH recall on the synthesized near-dups,
  * SimHash locality, and the HLL error bound promised for q28
  * (Analytics.scala "rows-only" claim — SURVEY §5.2 item on
  * approx_count_distinct).
  */
class TextSimSpec extends SparkSpec {
  import spark.implicits._

  test("banded MinHash LSH finds every synthesized near-dup pair") {
    // corpus construction plants a near-dup (id, id+100000) for every
    // doc_id % 20 == 0; each such pair must survive candidate generation
    // AND jaccard >= 0.6 verification.
    val planted = Tables.documents(spark, sfDir)
      .where(pmod($"doc_id", lit(20)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    val found = TextSim.q45MinhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val plantedPairs = planted.map(id => (id, id + 100000L))
    val missing = plantedPairs -- found
    assert(missing.isEmpty, s"LSH missed planted near-dups: $missing")
  }

  test("MinHash (K=16, B=8) keeps full planted recall and candidates ⊇ (K=8, B=4)") {
    // q64's first 4 bands are bit-identical to q45's (same sig blocks,
    // same band concatenation), so widening K/B can only ADD candidate
    // pairs — verified pairs must be a superset, and planted recall must
    // stay total.
    val planted = Tables.documents(spark, sfDir)
      .where(pmod($"doc_id", lit(20)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    val narrow = TextSim.q45MinhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val wide = TextSim.q64MinhashLshWide(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(narrow.subsetOf(wide),
      s"widened LSH lost verified pairs: ${narrow -- wide}")
    val missing = planted.map(id => (id, id + 100000L)) -- wide
    assert(missing.isEmpty, s"wide LSH missed planted near-dups: $missing")
  }

  test("exact dedup: every duplicate group has exactly its copies") {
    val dupGroups = TextSim.q41ExactDedup(spark, sfDir)
      .where($"n_copies" > 1)
    val nPlanted = Tables.documents(spark, sfDir)
      .where(pmod($"doc_id", lit(10)) === 0).count()
    assert(dupGroups.count() === nPlanted)
    assert(dupGroups.where($"n_copies" =!= 2).count() === 0)
  }

  test("SimHash: near-identical docs agree on far more bits than random pairs") {
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val sims = TextSim.q46SimHash(spark, sfDir)
      .as[(Long, String)].collect().toMap
    // doc vs doc-with-3-extra-tokens: recompute the copy's simhash via the
    // same pipeline on a 2-doc frame
    val base = Tables.documents(spark, sfDir).limit(50)
    val ids = base.select($"doc_id").as[Long].collect()
    // random-pair baseline from distinct docs
    val rand = ids.sliding(2, 2).collect { case Array(a, b) =>
      hamming(sims(a), sims(b)) }.toSeq
    assert(rand.nonEmpty)
    // identical doc => identical hash (determinism)
    val again = TextSim.q46SimHash(spark, sfDir).as[(Long, String)].collect().toMap
    assert(again === sims)
    // random pairs of word-salad docs over one vocab still differ on some
    // bits for at least some pairs (sanity that bits are content-driven)
    assert(rand.exists(_ > 0))
  }

  test("native MinHashSigs expression matches the HOF/oracle formulation bit-for-bit") {
    import graft.expr.MinHashFunctions.minhash_sigs
    // real shingle sets from the corpus, plus edge cases
    val sh = Tables.documents(spark, sfDir).limit(100)
      .select(split(lower($"text"), "[^a-z0-9]+").as("toks"))
      .select(when(size($"toks") >= 3,
        array_distinct(transform(sequence(lit(1), size($"toks") - 2),
          i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
                              element_at($"toks", i + 2)))))
        .otherwise(array().cast("array<string>")).as("sh"))
    Seq(8, 16, 5).foreach { k => // 5: non-multiple-of-4 tail digest
      val both = sh.select(
        minhash_sigs($"sh", k).as("native"),
        when(size($"sh") >= 1, TextSim.hofSigs($"sh", k)).as("hof"))
      val rows = both.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[String]]("native").toList ===
               r.getAs[scala.collection.Seq[String]]("hof").toList,
          s"k=$k signature mismatch")
      }
    }
    // empty input -> NULL (not an array of sentinels)
    val empty = spark.sql("SELECT CAST(array() AS ARRAY<STRING>) AS sh")
      .select(minhash_sigs($"sh", 8).as("s"))
    assert(empty.collect().head.isNullAt(0))
  }

  test("native SimHashBits matches the exploded/aggregated oracle formulation") {
    val native = TextSim.q46SimHash(spark, sfDir)
      .as[(Long, String)].collect().toMap
    val exploded = TextSim.simHashExploded(spark, sfDir)
      .as[(Long, String)].collect().toMap
    assert(native.nonEmpty)
    assert(native === exploded)
    // the native plan must be shuffle-free up to the final sort: no
    // explode-driven Generate, no aggregation Exchange.
    val plan = TextSim.q46SimHash(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"native SimHash still explodes:\n$plan")
    assert(!plan.contains("HashAggregate"), s"native SimHash still aggregates:\n$plan")
  }

  test("q68 banded hamming join: pigeonhole recall is total for hamming <= 2") {
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    // recompute every planted pair's true hamming from the same corpus
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val dups = base.where(pmod($"doc_id", lit(20)) === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
              concat($"text", lit(" zzz extra tail")).as("text"))
    val sigs = base.unionByName(dups)
      .select($"doc_id",
        graft.expr.SimHashFunctions.simhash_bits(
          filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "")).as("sig"))
      .as[(Long, String)].collect().toMap
    // both banding settings: default 3 blocks/<=2 (q68) and 4 blocks/<=3
    Seq((3, 2), (4, 3)).foreach { case (nBlocks, maxHam) =>
      val expected = sigs.keys.filter(_ < 100000).flatMap { id =>
        sigs.get(id + 100000).collect {
          case s2 if hamming(sigs(id), s2) <= maxHam => (id, id + 100000L)
        }
      }.toSet
      val found = TextSim.simhashNearDup(spark, sfDir, nBlocks, maxHam)
        .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect()
      // every returned pair honors the threshold
      assert(found.forall(_._3 <= maxHam), s"($nBlocks,$maxHam) over threshold")
      // pigeonhole: NO planted pair within the threshold may be missed
      val foundPairs = found.map(r => (r._1, r._2)).toSet
      val missed = expected -- foundPairs
      assert(missed.isEmpty,
        s"($nBlocks,$maxHam) banding missed within-threshold pairs: $missed")
      assert(expected.nonEmpty,
        s"($nBlocks,$maxHam) fixture produced no within-threshold pairs")
    }
  }

  test("native FingerprintStats matches the exploded formulation; plan is shuffle-free") {
    val native = TextSim.q48Fingerprint(spark, sfDir)
      .as[(Long, Long, Long, Option[String], Option[String])].collect().toSeq
    val exploded = TextSim.fingerprintExploded(spark, sfDir)
      .as[(Long, Long, Long, Option[String], Option[String])].collect().toSeq
    assert(native.nonEmpty)
    assert(native === exploded)
    val plan = TextSim.q48Fingerprint(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("HashAggregate"),
      s"native fingerprint still explodes/aggregates:\n$plan")
  }

  test("exploded-fingerprint plan guard: tokenizer stays materialized below the explode") {
    // Regression guard for the ProjectCollapse lambda-inlining trap
    // (TextSim.scala fingerprintExploded doc): if tokens() is ever
    // inlined back into the shingle generator, every element_at
    // re-evaluates the split+filter per element — O(n²) per document,
    // 13-48 s instead of ~1 s at sf0.1. The optimized plan must explode
    // a bound attribute, with the tokenizer in a Project BELOW the
    // Generate.
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val plan = TextSim.fingerprintExploded(spark, sfDir).queryExecution.optimizedPlan
    val gens = plan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "exploded fingerprint lost its explode")
    gens.foreach { g =>
      val gen = g.generator.toString.toLowerCase
      assert(!gen.contains("split("),
        s"tokenizer inlined into the generator (O(n^2) trap):\n$gen")
    }
  }

  test("q101 bloom marking probes via scalar-subquery might_contain, " +
       "and the sketch agrees with the exact dup set") {
    val df = TextSim.q101BloomSpanDedup(spark, sfDir)
    val rows = df.select($"lang", $"no_false_negatives", $"fp_within_budget")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._2 && r._3),
      s"bloom contract violated: ${rows.toSeq}")
    df.collect() // execute THIS queryExecution (AQE finalizes then)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the probe is the runtime-filter shape: might_contain over a scalar
    // subquery, never a join/cartesian against the sketch frame
    assert(plan.contains("might_contain"), s"no bloom probe planned:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom probe is not a scalar subquery:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"sketch rode a join instead of a subquery:\n$plan")
  }

  test("q28 approx_count_distinct: oracle bound holds and raw sketch is within 5%") {
    // q28's oracle-checkable form: approx_ok must be TRUE for every group
    // (the 10% bound the DuckDB twin asserts via literal TRUE).
    val rows = Analytics.q28ApproxDistinct(spark, sfDir)
      .select($"l_returnflag", $"n_orders", $"n_parts", $"approx_ok")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val outOfBound = rows.filterNot(_._4)
    assert(outOfBound.isEmpty, s"sketch out of 10% bound: ${outOfBound.toSeq}")
    // tighter engineering bound on the RAW sketch (rsd 0.02 ⇒ 5% ≈ 2.5σ,
    // + small-n floor), re-derived here since q28 folds the sketch into
    // the boolean.
    val approx = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("ao"),
           approx_count_distinct($"l_partkey", 0.02).as("ap"))
      .as[(String, Long, Long)].collect()
      .map { case (k, o, p) => k -> (o, p) }.toMap
    rows.foreach { case (k, no, np, _) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - no) <= math.max(4, 0.05 * no), s"$k orders: $ao vs $no")
      assert(math.abs(ap - np) <= math.max(4, 0.05 * np), s"$k parts: $ap vs $np")
    }
  }

  test("incremental dedup rejects every planted near-dup, admits fresh docs") {
    val decisions = TextSim.incrementalDedupDecisions(spark, sfDir)
      .select($"doc_id", $"is_rejected").as[(Long, Boolean)].collect()
    // every planted copy (id >= 500000, a corpus doc + 3-token tail) must
    // band-collide with its source and fail the Jaccard gate
    val planted = decisions.filter(_._1 >= 500000)
    assert(planted.nonEmpty)
    planted.foreach { case (id, rej) =>
      assert(rej, s"planted near-dup $id was admitted") }
    // fresh docs (400000 <= id < 500000) may still hit NATURAL near-dups
    // (the synthetic corpus has some: e.g. docs 45 and 487 share Jaccard
    // 0.96), so rejection isn't forbidden — but every rejection must be
    // JUSTIFIED: a brute-force exact-Jaccard scan must find a corpus doc
    // at >= 0.6 for each rejected fresh id (no false positives survive
    // the verification gate).
    val fresh = decisions.filter(d => d._1 >= 400000 && d._1 < 500000)
    assert(fresh.nonEmpty)
    assert(fresh.count(!_._2) > fresh.count(_._2),
      "most fresh docs should be admitted")
    val rejectedFresh = fresh.filter(_._2).map(_._1 - 400000).toSet
    if (rejectedFresh.nonEmpty) {
      def shingleSet(toks: Seq[String]): Set[String] =
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      val all = spark.read.parquet(s"$sfDir/documents.parquet")
        .select($"doc_id", $"text").as[(Long, String)].collect()
        .map { case (id, t) =>
          id -> shingleSet(t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq) }
      val corpus = all.filter(_._1 % 5 != 0)
      val byId = all.toMap
      rejectedFresh.foreach { srcId =>
        val sh = byId(srcId)
        val best = corpus.iterator.map { case (_, cs) =>
          if (sh.isEmpty && cs.isEmpty) 0.0
          else (sh & cs).size.toDouble / (sh | cs).size }.max
        assert(best >= 0.6,
          s"fresh doc $srcId rejected but best corpus Jaccard is $best")
      }
    }
    spark.catalog.clearCache()
  }

  test("q203 prefix-filter join is LOSSLESS vs the all-pairs brute force") {
    import org.apache.spark.sql.functions._
    val got = ops.TextSim.q203PrefixFilterJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force in-process: every pair, exact shingle Jaccard — the
    // candidate-pruning path must reproduce it pair-for-pair
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        val sh =
          if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else Set.empty[String]
        (r.getLong(0), sh)
      }
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && sa.nonEmpty
      jac = (sa & sb).size.toDouble / (sa | sb).size
      if jac >= 0.6
    } yield (ia, ib,
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq === want.toSeq,
      s"prefix filter diverged from brute force: got ${got.length} pairs, " +
        s"want ${want.length}")
    assert(want.nonEmpty, "fixture has no qualifying pairs — test is vacuous")
    // q203PrefixFilterJoin caches its sh/prefix frames; caller owns release.
    spark.catalog.clearCache()
  }

  test("q205 catches a boundary-shifted shared substring that stride-3 " +
       "segmenting (q100's shape) provably misses") {
    import org.apache.spark.sql.functions._
    // a 12-token run shared verbatim, but at offset 0 in doc 1 and
    // offset 1 in doc 2 — every stride-3 segment of the run differs
    // between the docs, so a q100-style fixed-boundary census sees no
    // duplicate; the overlapping-window dedup must remove exactly the
    // run from both.
    val run = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima"
    val docs = Seq(
      (1L, "en", s"$run unique tail one two three four five six seven"),
      (2L, "en", s"shift $run different ending eight nine ten eleven twelve"),
      (3L, "en", "completely unrelated filler text with no overlap at all " +
        "whatsoever in any window of the corpus")
    ).toDF("doc_id", "lang", "text")
    val got = ops.TextSim.substringDedupPerDoc(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
                                  r.getLong(5)))).toMap
    // both carriers lose ONE maximal span of exactly the 12 shared tokens
    Seq(1L, 2L).foreach { id =>
      val (_, nSpans, nRm, _) = got(id)
      assert(nSpans == 1L, s"doc $id: expected 1 span, got $nSpans")
      assert(nRm == 12L, s"doc $id: expected 12 removed tokens, got $nRm")
    }
    assert(got(3L)._2 == 0L && got(3L)._3 == 0L, "untouched doc was hit")
    // reassembly drops exactly the run: doc 1 keeps its 10-token tail
    assert(got(1L)._4 ==
      "unique tail one two three four five six seven".length.toLong)
    assert(got(2L)._4 ==
      "shift different ending eight nine ten eleven twelve".length.toLong,
      s"doc 2 chars_out ${got(2L)._4}")
    // and the q100 shape REALLY misses it: stride-3 segments from
    // position 0 share no segment text between the two carriers
    def segs3(t: String) = t.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).grouped(3).map(_.mkString(" ")).toSet
    val inter = segs3(s"$run unique tail one two three four five six seven")
      .intersect(segs3(
        s"shift $run different ending eight nine ten eleven twelve"))
    assert(inter.isEmpty,
      s"stride-3 segments unexpectedly collide: $inter — fixture broken")
    spark.catalog.clearCache()
  }

  test("q205 per-doc census equals a driver-side brute-force recompute " +
       "on a seeded corpus") {
    import org.apache.spark.sql.functions._
    val L = 4
    val rnd = new scala.util.Random(77)
    val vocab = Vector("red", "blue", "green", "star", "moon", "rock",
                       "tree", "fish")
    // 12 docs of 6–20 tokens from a tiny vocab — collisions guaranteed
    val corpus = (1 to 12).map { id =>
      val n = 6 + rnd.nextInt(15)
      (id.toLong, if (id % 2 == 0) "en" else "de",
       Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "lang", "text")
    val got = ops.TextSim.substringDedupPerDoc(docs, L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
                                  r.getLong(5)))).toMap
    // brute force: gram -> set of docs; covered positions per doc
    val toks = corpus.map { case (id, _, t) =>
      id -> t.split(" ").toVector }.toMap
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, ts) =>
      if (ts.size >= L) ts.sliding(L).foreach { g =>
        val k = g.mkString(" ")
        gramDocs(k) = gramDocs.getOrElse(k, Set.empty) + id
      }
    }
    corpus.foreach { case (id, _, _) =>
      val ts = toks(id)
      val covered = scala.collection.mutable.Set.empty[Int]
      if (ts.size >= L)
        (0 to ts.size - L).foreach { p =>
          if (gramDocs(ts.slice(p, p + L).mkString(" ")).size >= 2)
            (p until p + L).foreach(covered += _)
        }
      val spans = // maximal runs of consecutive covered positions
        if (covered.isEmpty) 0
        else covered.toSeq.sorted.foldLeft((0, -2)) { case ((n, prev), p) =>
          (if (p == prev + 1) n else n + 1, p) }._1
      val keptChars = ts.zipWithIndex.collect {
        case (t, i) if !covered.contains(i) => t }.mkString(" ").length
      val (nToks, nSpans, nRm, charsOut) = got(id)
      assert(nToks == ts.size.toLong, s"doc $id n_toks")
      assert(nSpans == spans.toLong, s"doc $id spans: got $nSpans want $spans")
      assert(nRm == covered.size.toLong, s"doc $id removed tokens")
      assert(charsOut == keptChars.toLong, s"doc $id chars_out")
    }
    assert(got.values.exists(_._3 > 0), "no doc was hit — test is vacuous")
    assert(got.values.exists(_._3 == 0), "every doc fully hit — degenerate")
    spark.catalog.clearCache()
  }

  test("q229: CDC chunking re-syncs after a prefix insertion where " +
       "fixed-stride chunking cannot") {
    val out = TextSim.q229CdcChunkDedup(spark, sfDir)
      .select($"src_id", $"n_src_chunks", $"n_copy_chunks", $"n_shared")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // CDC: the 2-token prefix can only disturb chunks up to the first
    // re-synchronized boundary — everything after hashes identically
    out.foreach { case (id, ns, _, sh) =>
      assert(sh >= ns - 3,
        s"doc $id: only $sh of $ns chunks survived a 2-token prefix")
      // a doc with interior boundaries must re-sync to SOME shared chunk;
      // a single-chunk doc legitimately loses its only chunk to the edit
      if (ns >= 4)
        assert(sh >= 1, s"doc $id: $ns chunks but zero re-synced")
    }
    assert(out.exists(_._4 > 0), "no pair shared anything — vacuous")
    // the contrast is real: FIXED 16-token chunking on the same pairs
    // shares (almost) nothing, because every boundary shifted by 2
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod($"doc_id", lit(30)) === 0)
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "").as("t"))
      .as[(Long, Seq[String])].collect()
    val fixedShared = docs.map { case (_, toks) =>
      def chunksOf(ts: Seq[String]) =
        ts.grouped(16).map(_.mkString(" ")).toSet
      val src = chunksOf(toks)
      val copy = chunksOf(Seq("zq", "zr") ++ toks)
      (src & copy).size.toDouble / math.max(src.size, 1)
    }
    val cdcFrac = out.map(r => r._4.toDouble / r._2)
    assert(fixedShared.sum / fixedShared.length <
           cdcFrac.sum / cdcFrac.length - 0.5,
      s"fixed-stride ${fixedShared.sum / fixedShared.length} vs " +
      s"CDC ${cdcFrac.sum / cdcFrac.length}: contrast collapsed")
  }

  test("q251 containment flags every planted fragment against its host") {
    // every doc_id % 15 spawns a half-doc fragment under id + 700000
    // whose shingles are a strict subset of the host's; stop-shingle
    // filtering drops a shingle from frag and host together, so
    // containment must survive the cap at exactly 100 %
    val rows = TextSim.q251ContainmentDedup(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val planted = rows.filter(_._1 >= 700000L)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // fragments with >= 3 tokens after halving (all on this fixture)
    val expected = (0L until nDocs).count(_ % 15 == 0)
    assert(planted.length === expected,
      s"detected ${planted.length} of $expected planted fragments")
    planted.foreach { case (fid, _, shared, nsh, pct) =>
      // the best host need not be the origin doc — a smaller doc that
      // also covers every fragment shingle wins the (nsh_host, id)
      // tie-break — but full containment itself must always be found
      assert(pct === 100L && shared === nsh,
        s"fragment $fid: containment $pct < 100 (shared $shared/$nsh)")
    }
    // the gate itself: no reported pair may sit below 90 %
    rows.foreach { case (fid, _, shared, nsh, _) =>
      assert(shared * 10 >= nsh * 9, s"pair $fid below the 0.9 gate") }
  }

  test("q254 winnowing: every planted run pair is detected (the w+k-1 " +
       "guarantee) and selection matches a driver recompute") {
    val pairs = TextSim.q254WinnowingMatch(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    spark.catalog.clearCache() // q254's two cached frames (documented)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val expected = (0L until nDocs by 18).filter(_ + 9 < nDocs)
    val detected = pairs.filter { case (a, b, _) =>
      a % 18 == 0 && b == a + 9 }.map(_._1).toSet
    assert(detected === expected.toSet,
      s"missing planted pairs: ${expected.toSet -- detected}")
    // driver recompute of the selection for the first planted pair:
    // interior-run windows are identical, so the shared-count must be
    // >= ceil(interiorWindows / w) = 2
    pairs.filter(p => p._1 % 18 == 0 && p._2 == p._1 + 9)
      .foreach { case (a, b, n) =>
        assert(n >= 2L, s"planted pair ($a,$b) shares only $n fingerprints")
      }
    // winnowing selection itself, recomputed in Scala for 20 raw docs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where($"doc_id" % 9 =!= 0).limit(20)
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      .as[(Long, Seq[String])].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val refFps = docs.map { case (id, toks) =>
      val hs = toks.sliding(4).filter(_.length == 4)
        .map(g => java.lang.Long.parseLong(md5hex(g.mkString(" ")).take(8), 16))
        .toIndexedSeq
      id -> hs.sliding(4).filter(_.length == 4).map(_.min).toSeq.distinct.toSet
    }.toMap
    val engineFps = TextSim.q254FingerprintsForTest(spark, sfDir,
        docs.map(_._1))
    spark.catalog.clearCache()
    refFps.foreach { case (id, ref) =>
      assert(engineFps(id) === ref, s"doc $id selection diverged") }
  }
}
