package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-prep operators that the row-hash
  * oracle cannot express: chunk reconstruction, split stability under
  * corpus growth, scrub idempotence, and decontamination recall.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunking reconstructs every document (coverage + overlap contract)") {
    // stride=24, size=32: chunk i starts at token 24i+1; consecutive
    // chunks overlap by 8 tokens; the union of chunks covers exactly
    // [1, n]. Verified against the raw token arrays, not the hashes.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val chunks = Corpus.q75Chunk(spark, sfDir)
      .select($"doc_id", $"chunk_id", $"n_toks")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.keySet === docs.keySet)
    docs.foreach { case (id, toks) =>
      val cs = chunks(id)
      val n = toks.length
      // chunk starts advance by the stride; every token index is covered
      val covered = cs.flatMap { case (_, cid, len) =>
        (cid * 24 + 1) to (cid * 24 + len) }.toSet
      val expected = if (n == 0) Set(0) -- Set(0) else (1 to n).toSet
      assert(covered === expected, s"doc $id coverage hole (n=$n, cs=$cs)")
      // every chunk except possibly the last is full-size
      cs.init.foreach { case (_, cid, len) =>
        assert(len === 32, s"doc $id chunk $cid not full") }
    }
  }

  test("hash split is stable under corpus growth and ~80/10/10") {
    // assignment depends only on doc_id: the same id gets the same split
    // at every scale factor (the property rand()-based splits lack).
    def assign(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 2)
          .as("h"))
      .withColumn("split", when($"h" < "cc", "train")
        .when($"h" < "e6", "val").otherwise("test"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val small = assign("/root/testdata/sf0.001")
    val big = assign("/root/testdata/sf0.01")
    val common = small.keySet.intersect(big.keySet)
    assert(common.nonEmpty, "fixture SFs share no doc ids — property vacuous")
    common.foreach(id => assert(small(id) === big(id),
      s"doc $id changed split when the corpus grew"))
    // proportions near 204/26/26 of 256 (binomial tolerance at n=500)
    val n = big.size.toDouble
    val frac = big.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.797) < 0.06, s"train frac $frac")
    assert(math.abs(frac("val") - 0.102) < 0.05, s"val frac $frac")
    assert(math.abs(frac("test") - 0.102) < 0.05, s"test frac $frac")
  }

  test("PII scrub is idempotent and leaves no matches behind") {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\d{3}-\\d{3}-\\d{4}"
    val planted = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat($"text", lit(" reach me at first.last+tag@sub.example.co.uk"),
        lit(" or 555-123-4567 x"), $"doc_id".cast("string")).as("t"))
    val once = planted.select(
      regexp_replace(regexp_replace($"t", emailPat, "<EMAIL>"),
        phonePat, "<PHONE>").as("s"))
    // nothing left to match…
    val residue = once.where(
      size(regexp_extract_all($"s", lit(emailPat), lit(0))) > 0 ||
      size(regexp_extract_all($"s", lit(phonePat), lit(0))) > 0).count()
    assert(residue === 0, "scrubbed text still matches a PII pattern")
    // …so a second pass is the identity
    val twice = once.select(
      regexp_replace(regexp_replace($"s", emailPat, "<EMAIL>"),
        phonePat, "<PHONE>").as("s2"), $"s")
    assert(twice.where($"s2" =!= $"s").count() === 0)
  }

  test("sequence packing conserves tokens with contiguous pack ids") {
    val out = Corpus.q76SeqPack(spark, sfDir)
      .select($"lang", $"pack_id", $"n_docs", $"n_tokens")
      .as[(String, Long, Long, Long)].collect()
    val totals = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"lang",
        size(filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= ""))
          .cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("t"), count(lit(1)).as("d"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.groupBy(_._1).foreach { case (lang, packs) =>
      // conservation: every token and every doc lands in exactly one pack
      assert(packs.map(_._4).sum === totals(lang)._1, s"$lang tokens leak")
      assert(packs.map(_._3).sum === totals(lang)._2, s"$lang docs leak")
      // contiguity: pack ids are 0..max with no holes
      val ids = packs.map(_._2).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq, s"$lang pack holes")
    }
  }

  test("q90 funnel: sketch-bounds routing agrees with exact bounds " +
       "within the discretization band") {
    // the sketchBounds knob swaps stage 3's exact percentile for the
    // approx_percentile sketch (the 100 TB form). Stages 1/2 (before the
    // bounds) must be identical; stages 3-5 may shift by boundary-value
    // discretization (sketch = data value, exact = interpolated; see
    // q99's in-query bound) — max(4, 5%) covers the fixture's tie
    // masses, and the data is deterministic so this is a stable check.
    val exact = Corpus.q90PipelineFunnel(spark, sfDir, sketchBounds = false)
      .select($"stage", $"lang", $"n").as[(String, String, Long)]
      .collect().map { case (st, l, n) => (st, l) -> n }.toMap
    val sk = Corpus.q90PipelineFunnel(spark, sfDir, sketchBounds = true)
      .select($"stage", $"lang", $"n").as[(String, String, Long)]
      .collect().map { case (st, l, n) => (st, l) -> n }.toMap
    assert(sk.keySet === exact.keySet)
    exact.foreach { case (k @ (stage, _), n) =>
      val tol =
        if (stage < "3") 0L else math.max(4L, math.ceil(n * 0.05).toLong)
      assert(math.abs(sk(k) - n) <= tol,
        s"$k: sketch=${sk(k)} exact=$n tolerance=$tol")
    }
  }

  test("decontamination catches every planted leak") {
    val out = Corpus.q84Decontaminate(spark, sfDir)
      .select($"train_id", $"first_bench_id").as[(Long, Long)].collect()
    val benchIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod($"doc_id", lit(50)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    // every planted leak (bench_id + 300000) must be flagged, and its
    // strongest match must be its own source document
    benchIds.foreach { b =>
      val hit = out.find(_._1 == b + 300000)
      assert(hit.isDefined, s"planted leak of bench doc $b not flagged")
    }
    // flagged leaks really share their source: first_bench_id ≤ source
    out.filter(_._1 >= 300000).foreach { case (t, fb) =>
      assert(benchIds.contains(fb), s"leak $t matched non-bench doc $fb")
    }
  }

  test("weighted sample matches an independent local A-ES recompute") {
    // Re-derive the Efraimidis–Spirakis keys from scratch on the driver
    // (MessageDigest md5, not Spark's) and take the per-lang top-10 by
    // (k desc, doc_id asc). q102 must reproduce it bit-for-bit — this
    // pins the whole expression chain (md5 → conv → pow) AND proves the
    // key is a pure function of (doc_id, n_chars): stable under corpus
    // growth and re-partitioning, the q72/q81 determinism property.
    val md = java.security.MessageDigest.getInstance("MD5")
    def aesKey(docId: Long, nChars: Long): (Double, Double) = {
      val hex = md.digest(s"wsample:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
      val w = math.max(nChars.toDouble, 1.0)
      (w, math.pow(u, 1.0 / w))
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"lang", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
    val expected = docs.map { case (lang, id, n) =>
        val (w, k) = aesKey(id, n); (lang, id, w.toLong, k) }
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(10).zipWithIndex.map {
          case ((_, id, w, k), i) =>
            (lang, i + 1, id, w, BigDecimal(k).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble) }
      }.sortBy(r => (r._1, r._2))
    val got = Corpus.q102WeightedSample(spark, sfDir)
      .select($"lang", $"rk", $"doc_id", $"weight", $"k")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got === expected)
  }

  test("q153 bigram scoring is consistent with q83's unigram census") {
    val uni = Corpus.q83UnigramScore(spark, sfDir)
      .select($"doc_id", $"n_toks").as[(Long, Long)].collect().toMap
    val bi = Corpus.q153BigramScore(spark, sfDir)
      .select($"doc_id", $"n_bigrams", $"ppl")
      .as[(Long, Long, Double)].collect()
    assert(bi.nonEmpty)
    bi.foreach { case (id, nBi, ppl) =>
      // same sampled docs, and |bigrams| = |tokens| − 1 per doc
      assert(uni.contains(id), s"doc $id missing from the unigram sample")
      assert(nBi === uni(id) - 1, s"doc $id: $nBi bigrams vs ${uni(id)} tokens")
      assert(ppl >= 1.0, s"doc $id: perplexity $ppl below 1")
    }
  }

  test("q194: negatives are cross-class, exactly 5 per anchor, reproducible") {
    val rows = Corpus.q194NegativeSampling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_._1).foreach { case (anchor, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 5L), s"anchor $anchor ranks")
      rs.foreach { case (_, _, neg, negLabel) =>
        assert(labels(neg) == negLabel)
        assert(negLabel != labels(anchor),
          s"anchor $anchor (label ${labels(anchor)}) drew same-class $neg")
      }
    }
    // pure function of ids: a second run draws the identical sample
    val again = Corpus.q194NegativeSampling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q195: every class downsampled to exactly the minority size") {
    val rows = Corpus.q195ClassBalance(spark, sfDir).collect()
    assert(rows.length > 1)
    val minTotal = rows.map(_.getLong(1)).min
    rows.foreach { r =>
      assert(r.getLong(2) == minTotal,
        s"${r.getString(0)} kept ${r.getLong(2)}, want $minTotal")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) > 0, "checksum must reflect a real selection")
    }
  }

  test("q211 temperature mixing up-weights low-resource languages and " +
       "hits the target size") {
    val rows = Corpus.q211TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(5)))
    assert(rows.length >= 3)
    // α < 1: keep-RATE strictly decreases as resource size grows —
    // check the extremes (largest vs smallest lang)
    val byN = rows.sortBy(_._2)
    assert(byN.last._5 < byN.head._5,
      s"largest lang ${byN.last} must keep a smaller share than ${byN.head}")
    // quotas bind (kept == quota) and land within |langs| of the target
    rows.foreach { case (l, n, q, kept, _) =>
      assert(kept == math.min(q, n), s"$l kept $kept vs quota $q")
    }
    val total = rows.map(_._2).sum
    assert(math.abs(rows.map(_._4).sum - total / 2) <= rows.length.toLong,
      s"kept ${rows.map(_._4).sum} strays from target ${total / 2}")
  }

  test("q209 trainer: log-loss decreases every epoch and beats the zero model") {
    val docs = Tables.documents(spark, sfDir)
    val feat = Corpus.lrFeatures(docs).localCheckpoint()
    def loss(epochs: Int): Double = {
      val w = Corpus.trainQualityLr(spark, docs, epochs)
      Corpus.lrScores(feat, w)
        .select((-($"y" * log($"s") + (lit(1.0) - $"y") * log(lit(1.0) - $"s")))
          .as("l"))
        .agg(avg($"l")).as[Double].head()
    }
    // the trainer is deterministic, so shorter runs ARE the longer run's
    // intermediate states — the per-epoch loss trajectory is recoverable
    val losses = (0 to 4).map(loss)
    assert(math.abs(losses.head - math.log(2.0)) < 1e-9,
      s"zero model must sit at ln 2, got ${losses.head}")
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss rose across an epoch: $losses") }
    assert(losses.last < 0.69, s"4 epochs left loss at ${losses.last}")
    // scores stay proper probabilities
    val w4 = Corpus.trainQualityLr(spark, docs, 4)
    val (mn, mx) = Corpus.lrScores(feat, w4)
      .agg(min($"s"), max($"s")).as[(Double, Double)].head()
    assert(mn > 0.0 && mx < 1.0)
  }

  test("q216 DSIR selects by CONTENT similarity to the target, not by " +
       "the target label itself") {
    // two disjoint vocabularies; two docs carry target-like content
    // under a NON-target label — distribution matching must rank them
    // above every genuinely off-target doc (that's the method's whole
    // point: select what LOOKS like the target corpus)
    val tgtText = "alpha beta gamma delta alpha beta"
    val offText = "zulu yankee xray whiskey zulu yankee"
    val docs = (
      (1L to 10L).map(i => (i, "en", tgtText)) ++
      (11L to 20L).map(i => (i, "xx", offText)) ++
      Seq((21L, "xx", tgtText), (22L, "xx", tgtText))
    ).toDF("doc_id", "lang", "text")
    val w = Corpus.dsirWeights(spark, docs)
      .select($"doc_id", $"logw")
      .as[(Long, Double)].collect().toMap
    val lookalike = Seq(21L, 22L).map(w)
    val offTarget = (11L to 20L).map(w)
    assert(lookalike.min > offTarget.max,
      s"target-like content must outrank off-target: $w")
    // and weights depend on content only: identical text ⇒ identical w
    assert(w(21L) === w(1L) && w(21L) === w(22L))
    assert(lookalike.min > 0 && offTarget.max < 0,
      "log-ratio sign must separate target-like from off-target here")
  }

  test("q297 Naive Bayes classifies by CONTENT on a two-vocabulary corpus") {
    // disjoint vocabularies per class: NB must recover the label from
    // tokens alone — a perfect confusion diagonal. One held-out-style
    // mixed doc (majority-en tokens under label de) must land where its
    // CONTENT points, proving the argmax reads the model, not the label.
    val enText = "alpha beta gamma delta alpha beta"
    val deText = "zulu yankee xray whiskey zulu yankee"
    val docs = (
      (1L to 10L).map(i => (i, "en", enText)) ++
      (11L to 20L).map(i => (i, "de", deText)) ++
      Seq((21L, "de", "alpha beta gamma alpha zulu"))
    ).toDF("doc_id", "lang", "text")
    val got = Corpus.nbConfusion(docs)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("en", "en", 10L),   // pure-vocab docs: perfect diagonal
      ("de", "de", 10L),
      ("de", "en", 1L)))   // the majority-en doc crosses BY CONTENT
  }

  test("q313 ablation arms differ: near-dedup removes docs, never adds; " +
       "shared columns agree") {
    val rows = Corpus.q313DedupAblation(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (raw, ddp) = (rows("raw"), rows("dedup"))
    assert(ddp._2 < raw._2, "dedup must remove at least one train doc " +
      "(the corpus plants near-dup tails)")
    assert(ddp._3 < raw._3, "fewer docs ⇒ fewer train tokens")
    assert(ddp._4 <= raw._4, "dedup can only shrink the vocabulary")
    assert(ddp._5 === raw._5, "the held-out token count is variant-" +
      "independent by construction")
    spark.catalog.clearCache()
  }

  test("q228 softmax trainer: cross-entropy falls every epoch from ln 5") {
    val docs = Tables.documents(spark, sfDir)
    val feat = Corpus.smFeatures(docs).localCheckpoint()
    def loss(epochs: Int): Double = {
      val w = Corpus.trainSoftmaxLangId(spark, docs, epochs)
      Corpus.smProbs(feat, w)
        .where($"y" === $"k")
        .agg(avg(-log($"p"))).as[Double].head()
    }
    val losses = (0 to 3).map(loss)
    assert(math.abs(losses.head - math.log(5.0)) < 1e-9,
      s"zero model must sit at ln 5, got ${losses.head}")
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss rose across an epoch: $losses") }
    // probabilities stay a proper distribution per doc
    val w3 = Corpus.trainSoftmaxLangId(spark, docs, 3)
    val sums = Corpus.smProbs(feat, w3)
      .groupBy($"doc_id").agg(sum($"p").as("t"))
      .agg(min($"t"), max($"t")).as[(Double, Double)].head()
    assert(math.abs(sums._1 - 1.0) < 1e-9 && math.abs(sums._2 - 1.0) < 1e-9)
  }

  test("q226 phases are weight-ordered terciles that conserve the corpus") {
    val out = Corpus.q226CurriculumPlan(spark, sfDir)
      .select($"phase", $"n_docs").as[(String, Long)].collect()
    val byPhase = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byPhase.keySet === Set("p1_general", "p2_mixed", "p3_target"))
    val n = byPhase.values.sum
    assert(n === spark.read.parquet(s"$sfDir/documents.parquet").count())
    // discrete terciles: each phase holds ~n/3 docs, off only by weight
    // ties at the cut values (DSIR weights are near-unique here)
    byPhase.values.foreach(c =>
      assert(math.abs(c - n / 3.0) <= n * 0.08 + 4,
        s"phase sizes far from terciles: $byPhase"))
  }

  test("q221's census matches what the physical shard writer puts on disk") {
    // Drive the ACTUAL writer plan the census stands for —
    // repartition(shard) → sortWithinPartitions → write.partitionBy —
    // and reconcile the on-disk layout against the q221 aggregate.
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Corpus.shardedDocs(spark, sfDir)
      .repartition(Corpus.ShardCount, $"shard")
      .sortWithinPartitions($"shard", $"ord", $"doc_id")
      .write.partitionBy("shard").mode("overwrite").parquet(out)
    // one hive dir per shard value
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length === Corpus.ShardCount)
    val census = Corpus.q221ShardWriter(spark, sfDir)
      .select($"shard", $"n_docs", $"char_sum")
      .as[(Int, Long, Long)].collect().map { case (s, n, c) => s -> (n, c) }.toMap
    val onDisk = spark.read.parquet(out)
      .groupBy($"shard").agg(count(lit(1)).as("n"),
        sum($"n_chars".cast("long")).as("c"))
      .as[(Int, Long, Long)].collect().map { case (s, n, c) => s -> (n, c) }.toMap
    assert(onDisk === census)
    // the written order is the salted-hash order, not id order: within a
    // shard file, doc_ids must NOT be monotonically sorted (the point of
    // the shuffle) while ord IS (the writer's sort contract)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard").orderBy($"file", $"row")
    val seq = spark.read.parquet(out)
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("row", col("_metadata.row_index"))
      .withColumn("ordLag", lag($"ord", 1).over(w))
      .withColumn("idLag", lag($"doc_id", 1).over(w))
      .where($"ordLag".isNotNull)
    assert(seq.where($"ord" < $"ordLag").count() === 0L,
      "rows inside each shard must be in salted-hash order")
    assert(seq.where($"doc_id" < $"idLag").count() > 0L,
      "a shard in doc_id order means no global shuffle happened")
  }

  test("q230 planted violations are caught exactly; rule flags conserve") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val n13 = docs.where(pmod($"doc_id", lit(13)) === 0).count()
    val n11 = docs.where(pmod($"doc_id", lit(11)) === 0).count()
    val r = Corpus.q230GopherRules(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") === n)
    // every planted doc has < 120 words (fixture max ≈ 110), so the '#'
    // run always tips the 0.1 ratio and the 30 numeric words always tip
    // the 0.8 alpha fraction — planted hits are EXACTLY the fail counts
    assert(r.getAs[Long]("f_symbol") === n13,
      "symbol-rule failures must be exactly the planted '#' docs")
    assert(r.getAs[Long]("f_alpha") === n11,
      "alpha-rule failures must be exactly the planted numeric docs")
    // natural rules fire on this corpus and the survivor count is sane
    assert(r.getAs[Long]("f_wordcount") > 0 && r.getAs[Long]("f_stopword") > 0)
    assert(r.getAs[Long]("kept") > 0 && r.getAs[Long]("kept") < n)
  }

  test("q231 buckets are per-language terciles that conserve each language") {
    val out = Corpus.q231CcnetBuckets(spark, sfDir)
      .select($"lang", $"bucket", $"n_docs").as[(String, String, Long)]
      .collect()
    val perLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).toSet === Set("head", "middle", "tail"),
        s"$lang missing a bucket")
      val total = rows.map(_._3).sum
      assert(total === perLang(lang), s"$lang bucket counts don't conserve")
      // discrete terciles: ±(ties + 1) of n/3 — unigram means are
      // near-unique on this corpus
      rows.foreach { case (_, b, c) =>
        assert(math.abs(c - total / 3.0) <= total * 0.12 + 4,
          s"$lang/$b far from a tercile: $c of $total") }
    }
  }

  test("q232 keeps exactly min(cap, population) per source") {
    val out = Corpus.q232DomainCaps(spark, sfDir)
      .select($"source", $"n_docs", $"n_kept", $"n_dropped")
      .as[(String, Long, Long, Long)].collect()
    val perSource = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out.map(_._1).toSet === perSource.keySet)
    out.foreach { case (src, nd, nk, ndr) =>
      assert(nd === perSource(src))
      assert(nk === math.min(Corpus.DomainCap.toLong, nd))
      assert(ndr === nd - nk)
    }
  }

  test("q235 folds are exactly balanced (±1) within every language") {
    val out = Corpus.q235KFold(spark, sfDir)
      .select($"lang", $"fold", $"n_docs").as[(String, Long, Long)].collect()
    val perLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum === perLang(lang))
      assert(rows.map(_._2).toSet === (0L until 5L).toSet)
      val sizes = rows.map(_._3)
      assert(sizes.max - sizes.min <= 1L,
        s"$lang folds unbalanced: ${rows.mkString(",")}")
    }
  }

  test("q243 FFD fold matches a driver recompute, incl. above-lower-bound") {
    // drive the exact production fold over planted batches
    def engine(lens: Seq[Long]): Seq[Long] = {
      val its = lens.zipWithIndex
        .map { case (l, i) => (-l, i.toLong) }.sorted
        .map { case (nl, id) => s"struct(CAST($nl AS BIGINT), CAST($id AS BIGINT))" }
      val arr = expr(s"CAST(array(${its.mkString(",")}) AS " +
        "ARRAY<STRUCT<nl: BIGINT, id: BIGINT>>)")
      spark.range(1).select(Corpus.ffdLoads(arr).as("loads"))
        .collect().head.getSeq[Long](0)
    }
    def refFfd(lens: Seq[Long], cap: Long = 128L): Seq[Long] = {
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      lens.sorted(Ordering[Long].reverse).foreach { l =>
        bins.indexWhere(_ + l <= cap) match {
          case -1 => bins += l
          case i  => bins(i) += l
        }
      }
      bins.toSeq
    }
    // FFD strictly above the lower bound: three 70s need 3 bins, lb = 2
    assert(engine(Seq(70L, 70L, 70L)) === Seq(70L, 70L, 70L))
    // second-fit behavior: 100 then 60 opens bin 2, then 28 tops bin 1
    assert(engine(Seq(100L, 60L, 28L)) === refFfd(Seq(100L, 60L, 28L)))
    // randomized agreement with the independent driver FFD
    val rnd = new scala.util.Random(4242)
    (1 to 25).foreach { _ =>
      val lens = Seq.fill(rnd.nextInt(30) + 2)(rnd.nextInt(128).toLong + 1L)
      assert(engine(lens) === refFfd(lens), s"diverged on $lens")
    }
  }

  test("q255 LPT fold matches a driver recompute; makespan >= lower bound") {
    def engine(lens: Seq[Long]): Seq[Long] = {
      val its = lens.zipWithIndex
        .map { case (l, i) => (-l, i.toLong) }.sorted
        .map { case (nl, id) => s"struct(CAST($nl AS BIGINT), CAST($id AS BIGINT))" }
      val arr = expr(s"CAST(array(${its.mkString(",")}) AS " +
        "ARRAY<STRUCT<nl: BIGINT, id: BIGINT>>)")
      spark.range(1).select(Corpus.lptLoads(arr).as("loads"))
        .collect().head.getSeq[Long](0)
    }
    def refLpt(lens: Seq[Long], m: Int = 8): Seq[Long] = {
      val loads = Array.fill(m)(0L)
      lens.sorted(Ordering[Long].reverse).foreach { l =>
        loads(loads.zipWithIndex.minBy { case (v, i) => (v, i) }._2) += l
      }
      loads.toSeq
    }
    // 10 jobs of 9 across 8 workers: one worker gets two
    assert(engine(Seq.fill(10)(9L)).sorted === refLpt(Seq.fill(10)(9L)).sorted)
    val rnd = new scala.util.Random(2552)
    (1 to 25).foreach { _ =>
      val lens = Seq.fill(rnd.nextInt(30) + 2)(rnd.nextInt(120).toLong + 1L)
      val e = engine(lens)
      assert(e === refLpt(lens), s"diverged on $lens")
      val lb = math.max((lens.sum + 7) / 8, lens.max)
      assert(e.max >= lb, s"makespan below lower bound on $lens")
    }
  }

  test("q248 BM25 ranking matches an independent driver recompute") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / docs.length
    val queries = Map(1L -> Seq("merge", "window"),
      2L -> Seq("hash", "join", "table"), 3L -> Seq("stream", "batch"))
    val allTerms = queries.values.flatten.toSet
    val df = allTerms.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    def contribMicro(tf: Long, dfT: Long, dl: Int): Long = {
      val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
      math.round(idf * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)) * 1e6)
    }
    val expected = queries.map { case (qid, terms) =>
      val scored = docs.flatMap { case (id, toks) =>
        val micro = terms.map { t =>
          val tf = toks.count(_ == t).toLong
          if (tf == 0) 0L else contribMicro(tf, df(t), toks.length)
        }.sum
        if (terms.exists(toks.contains)) Some((id, micro)) else None
      }
      val top = scored.sortBy { case (id, m) => -(m * 100000000L + id) }
        .take(5).map(_._1).mkString(",")
      qid -> ((top, scored.length.toLong, scored.map(_._2).max))
    }
    val got = Corpus.q248Bm25TopK(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
  }

  test("q256 nDCG census matches an independent driver recompute") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / docs.length
    val queries = Map(1L -> Seq("merge", "window"),
      2L -> Seq("hash", "join", "table"), 3L -> Seq("stream", "batch"))
    val df = queries.values.flatten.toSet.map((t: String) =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    def contribMicro(tf: Long, dfT: Long, dl: Int): Long = {
      val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
      math.round(idf * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)) * 1e6)
    }
    def posMicro(g: Long, rank: Int): Long =
      math.round((math.pow(2.0, g.toDouble) - 1.0) /
        (math.log(rank + 1.0) / math.log(2.0)) * 1e6)
    val expected = queries.map { case (qid, terms) =>
      val gfull = math.min(3, terms.length).toLong
      val scored = docs.flatMap { case (id, toks) =>
        val present = terms.filter(toks.contains)
        if (present.isEmpty) None else Some((id,
          present.map(t => contribMicro(toks.count(_ == t).toLong,
            df(t), toks.length)).sum,
          math.min(3, present.length).toLong))
      }
      val top10 = scored.sortBy { case (id, m, _) =>
        -(m * 100000000L + id) }.take(10)
      val dcg = top10.zipWithIndex
        .map { case ((_, _, g), i) => posMicro(g, i + 1) }.sum
      val idcg = scored.map(_._3).sorted(Ordering[Long].reverse).take(10)
        .zipWithIndex.map { case (g, i) => posMicro(g, i + 1) }.sum
      val ffr = top10.zipWithIndex.collectFirst {
        case ((_, _, g), i) if g == gfull => (i + 1).toLong }.getOrElse(0L)
      qid -> ((dcg, idcg, ffr, scored.length.toLong))
    }
    val got = Corpus.q256RankingQuality(spark, sfDir)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    spark.catalog.clearCache() // q256 caches the shared BM25 frame
    got.foreach { case (qid, dcg, idcg, ndcg, ffr, nm) =>
      val (edcg, eidcg, effr, enm) = expected(qid)
      assert((dcg, idcg, ffr, nm) === ((edcg, eidcg, effr, enm)),
        s"query $qid diverged")
      assert(dcg <= idcg && ndcg <= 1.0, s"query $qid nDCG > 1")
    }
  }

  test("q249 attribution partitions the corpus exactly (docs AND tokens)") {
    val census = Corpus.q249RemovalAttribution(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
    // same planting as the operator: doc_id % 13 gets the 30-token spam run
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        filter(split(lower(
          when($"doc_id" % 13 === 0, concat($"text", lit(" spam" * 30)))
            .otherwise($"text")), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      .as[(Long, Seq[String])].collect()
    val planted = docs.filter(_._1 % 10 == 0)
    // every corpus doc lands in exactly one (stage, source) cell
    assert(census.map(_._3).sum === docs.length + planted.length)
    assert(census.map(_._4).sum ===
      docs.map(_._2.length.toLong).sum + planted.map(_._2.length.toLong).sum)
    // all four gates plus survivors are exercised on this fixture
    val stages = census.map(_._1).toSet
    assert(stages === Set("1_short", "2_no_stopword", "3_repetitive",
      "4_exact_dup", "kept"))
    // a planted copy whose original survives is ALWAYS dropped as a dup:
    // dup drops are at least the number of surviving planted pairs
    val kept = census.filter(_._1 == "kept").map(_._3).sum
    val dupDropped = census.filter(_._1 == "4_exact_dup").map(_._3).sum
    assert(dupDropped > 0 && kept > 0)
  }

  test("q250 AUC equals the naive pairwise count over per-doc scores") {
    val row = Corpus.q250AucCensus(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().head
    val (nPos, nNeg, num2, den2, auc) = row
    // independent recompute: quantized per-doc scores, counted pairwise
    val scored = Corpus.q209QualityClassifier(spark, sfDir) // sampled...
    val full = {
      val docs = Tables.documents(spark, sfDir)
      val w = Corpus.trainQualityLr(spark, docs, 4)
      Corpus.lrScores(Corpus.lrFeatures(docs), w)
        .select($"y".cast("long"), round($"s" * 1e6, 0).cast("long"))
        .as[(Long, Long)].collect()
    }
    val pos = full.filter(_._1 == 1L).map(_._2)
    val neg = full.filter(_._1 == 0L).map(_._2)
    assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
    val pairNum2 = pos.iterator.map { p =>
      2L * neg.count(_ < p) + neg.count(_ == p).toLong
    }.sum
    assert(num2 === pairNum2)
    assert(den2 === 2L * pos.length * neg.length)
    assert(math.abs(auc - pairNum2.toDouble / den2) < 1e-6)
    assert(scored.count() > 0)
  }

  test("q268 attribution: the bias feature has zero Shapley mass") {
    // j = -1 is x = 1 for EVERY doc, so mu = 1 and w·(x − mu) ≡ 0 —
    // the closed-form sanity anchor of the linear-SHAP identity
    val rows = graft.ops.Corpus.q268FeatureAttribution(spark, sfDir)
      .as[(Long, Long, Double, Double, Long)].collect()
    val bias = rows.find(_._1 == -1L).get
    assert(bias._4 === 1.0 && bias._5 === 0L)
    // every non-bias feature with any weight carries positive mass
    assert(rows.count(r => r._1 >= 0L && r._5 > 0L) > 0)
  }

  test("q293 isotonic fit is monotone and pools violating deciles") {
    val rows = graft.ops.Corpus.q293IsotonicCalibration(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 10)
    val iso = rows.map(_._5)
    // the minimax form guarantees a non-decreasing fit
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b }, iso.toSeq)
    // the fit conserves the overall positive rate direction: first fit
    // value ≤ overall rate ≤ last fit value (pooling can't escape the
    // data's range)
    val totalN = rows.map(_._2).sum
    val totalP = rows.map(_._3).sum
    val overall = totalP.toDouble / totalN * 1e6
    assert(iso.head <= overall + 1 && iso.last >= overall - 1)
  }

  test("q264 conformal: 'both' sets always cover; counts are consistent") {
    val rows = graft.ops.Corpus.q264ConformalGate(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (set, qhat, n, cov) =>
      assert(cov <= n)
      assert(qhat > 0L)
      if (set == "both") assert(cov === n, "a {0,1} set covers any label")
      if (set == "empty") assert(cov === 0L, "an empty set covers nothing")
    }
  }

  test("q319 funnel: conservation law holds stage to stage; pack-stage " +
       "observe counters equal the census row") {
    val (df, obs) = Corpus.funnelWithObservation(spark, sfDir)
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // monotone non-increasing doc counts through the drop stages
    val order = Seq("0_ingest", "1_gopher", "2_exact", "3_neardup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._1 <= rows(a)._1, s"$b grew vs $a") }
    // substring keeps every doc, only tokens shrink
    assert(rows("4_substring")._1 === rows("3_neardup")._1)
    assert(rows("4_substring")._2 <= rows("3_neardup")._2)
    // classifier + tempmix only drop
    assert(rows("5_classifier")._1 <= rows("4_substring")._1)
    assert(rows("6_tempmix")._1 <= rows("5_classifier")._1)
    // pack carries every tempmix survivor; bins ≥ the capacity bound
    assert(rows("7_pack")._1 === rows("6_tempmix")._1)
    assert(rows("7_pack")._3 * 128L >= rows("7_pack")._2,
      "bins × cap must cover the packed tokens")
    // gopher aux is exactly the drop count
    assert(rows("1_gopher")._3 === rows("0_ingest")._1 - rows("1_gopher")._1)
    // the observation rode the same job — no extra scan, same numbers
    val m = obs.get
    assert(m("pack_docs") === rows("7_pack")._1,
      s"observed ${m("pack_docs")} vs census ${rows("7_pack")._1}")
    assert(m("pack_toks") === rows("7_pack")._2)
  }

  test("ac_count kernel ≡ positional HOF fallback bit-for-bit; " +
       "overlap/nesting/edge pins") {
    import graft.expr.AcFunctions.ac_count
    val dict = Seq("an", "scan", "table", "merge batch", "zz secret7")
    val dictCol = array(dict.map(lit): _*)
    // HOF fallback: count every start position where the term matches
    def hofOcc(t: org.apache.spark.sql.Column, term: String) =
      size(filter(sequence(lit(1),
          greatest(length(t) - (term.length - 1), lit(0))),
        i => t.substr(i, lit(term.length)) === lit(term)))
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text".as("t"))
    val both = docs.select($"doc_id",
        ac_count($"t", dictCol).as("ac"),
        array(dict.map(term => hofOcc($"t", term).cast("long")): _*)
          .as("hof"))
      .where($"ac" =!= $"hof")
    assert(both.count() === 0L, "native AC and HOF fallback must agree")
    // hand pins: overlapping, nested, phrase, absent, short text
    val pins = Seq(
      ("aaaa", Seq("aa"), Seq(3L)),                 // overlapping counted
      ("the scan ran", Seq("an", "scan"), Seq(2L, 1L)), // nested output
      ("merge batch merge batch", Seq("merge batch"), Seq(2L)),
      ("tiny", Seq("elephant"), Seq(0L)),
      ("", Seq("an"), Seq(0L)))
    pins.foreach { case (t, ps, want) =>
      val got = Seq(t).toDF("t")
        .select(ac_count($"t", array(ps.map(lit): _*)))
        .head().getSeq[Long](0)
      assert(got === want, s"text='$t' dict=$ps: got $got want $want")
    }
  }
}
