package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over `documents` (BASELINE.json
  * north-star: dedup, text analysis).
  *
  * Design rules that hold at 100 TB:
  *  - dedup keys are HASHES (fixed width), never raw text, so the shuffle
  *    carries 32–64 bytes/row instead of document bodies;
  *  - near-dup candidates come from a BANDED MinHash self-join — the join
  *    key is a band signature, so only same-bucket docs ever meet; there is
  *    no all-pairs/cross join anywhere in these plans;
  *  - every per-doc feature (tokens, shingles, signatures) is computed with
  *    codegen'd higher-order array functions in one projection pass — no
  *    UDFs, no mapPartitions.
  *
  * Cross-engine determinism: all hashing is `md5`/`sha2` (identical hex
  * output in Spark and DuckDB); the testdata has no duplicates, so the
  * dedup inputs synthesize them — corpus = documents ∪ deterministic
  * perturbed copies, built from the same expressions on both sides.
  */
object TextSim {

  /** Tokenizer: lowercase, split on non-alphanumerics, drop empties. The
    * "BPE-ish" regex family from the survey; identical in DuckDB as
    * `list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), …)`.
    */
  private def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  private val tokensSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Distinct word 3-gram shingles of a token array (empty if < 3 tokens —
    * guarded because Spark's `sequence(1, n)` counts DOWN for n < 1).
    */
  private def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                            element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  private def shinglesSql(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 3 THEN
       |  list_distinct(list_transform(generate_series(1, len($toksExpr) - 2),
       |    i -> $toksExpr[i] || ' ' || $toksExpr[i+1] || ' ' || $toksExpr[i+2]))
       |ELSE [] END""".stripMargin

  // ─── q41: exact dedup by content hash ─────────────────────────────────
  // Corpus = documents ∪ verbatim copies of every 10th doc under new ids.
  // Group by sha2(text): the shuffle key is a 64-hex digest, not the
  // document body; keeper = min doc_id, first-writer-wins like O12.
  def q41ExactDedup(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val copies = base.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    base.unionByName(copies)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"),
           count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_id"))
  }

  val q41Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT sha256(text) AS text_hash, min(doc_id) AS keeper_id,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM corpus
      |GROUP BY 1
      |ORDER BY keeper_id""".stripMargin

  // ─── q42: token counting — top-20 tokens corpus-wide ──────────────────
  // explode → groupBy(token): partial map-side combine collapses each
  // partition to |vocab| rows before the shuffle.
  def q42TokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val q42Sql: String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT unnest($tokensSql) AS token FROM documents)
       |GROUP BY token
       |ORDER BY n DESC, token
       |LIMIT 20""".stripMargin

  // ─── q43: quality scoring per language ────────────────────────────────
  // Per-doc features (token count, stopword ratio, char length) in one
  // codegen'd projection, then a per-lang aggregate.
  private val stopwords = Seq("the", "a", "of", "and", "to")
  private val stopSql = stopwords.map("'" + _ + "'").mkString("[", ", ", "]")

  def q43DocQuality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => t.isInCollection(stopwords))) / col("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_tokens")), 4).as("avg_tokens"),
           round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
           round(avg(length(col("text"))), 4).as("avg_chars"))
      .orderBy(col("lang"))

  val q43Sql: String =
    s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  round(avg(n_tokens), 4) AS avg_tokens,
       |  round(avg(stop_ratio), 4) AS avg_stop_ratio,
       |  round(avg(n_chars_len), 4) AS avg_chars
       |FROM (
       |  SELECT lang,
       |    CAST(len(toks) AS DOUBLE) AS n_tokens,
       |    len(list_filter(toks, x -> list_contains($stopSql, x)))
       |      / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       |    length(text) AS n_chars_len
       |  FROM (SELECT lang, text, $tokensSql AS toks FROM documents))
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ─── q44: language-ID by marker scoring + confusion census ────────────
  // The n-gram-heuristic shape: score each doc against per-language marker
  // sets, argmax with deterministic tiebreak, then a (labeled, predicted)
  // census. (The synthetic corpus shares one vocabulary across langs, so
  // predictions are near-uniform — the operator, not the classifier skill,
  // is what is verified.)
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "table"),
    "de" -> Seq("order", "group", "window"),
    "es" -> Seq("data", "value", "part"),
    "fr" -> Seq("query", "join", "merge"),
    "zh" -> Seq("hash", "scan", "sort"))

  def q44LangId(s: SparkSession, d: String): DataFrame = {
    val withToks = documents(s, d).withColumn("toks", tokens(col("text")))
    val scored = markers.foldLeft(withToks) { case (df, (l, ms)) =>
      df.withColumn(s"score_$l",
        size(filter(col("toks"), t => t.isInCollection(ms))))
    }
    // argmax with lexicographic-language tiebreak: the first language in
    // sorted order whose score equals the row max (same CASE priority as
    // the oracle twin).
    val best = greatest(markers.map { case (l, _) => col(s"score_$l") }: _*)
    val predLtr = markers.map(_._1).sorted.reverse.foldLeft(lit("??"): Column) {
      case (acc, l) => when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored
      .withColumn("predicted", predLtr)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  val q44Sql: String = {
    val scoreCols = markers.map { case (l, ms) =>
      val lst = ms.map("'" + _ + "'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($lst, x))) AS score_$l"
    }.mkString(",\n    ")
    val bestExpr = markers.map { case (l, _) => s"score_$l" }
      .mkString("greatest(", ", ", ")")
    val predExpr = markers.map(_._1).sorted
      .map(l => s"WHEN score_$l = best THEN '$l'")
      .mkString("CASE ", " ", " ELSE '??' END")
    s"""SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
       |FROM (
       |  SELECT lang, $predExpr AS predicted
       |  FROM (
       |    SELECT lang, $bestExpr AS best, *
       |    FROM (
       |      SELECT lang,
       |        $scoreCols
       |      FROM (SELECT lang, $tokensSql AS toks FROM documents))))
       |GROUP BY lang, predicted
       |ORDER BY lang, predicted""".stripMargin
  }

  // ─── q45/q64: banded MinHash LSH near-dup detection ───────────────────
  // Corpus = documents ∪ near-dup copies (every 20th doc + a 3-token tail).
  // Pipeline: shingle → K MinHash signatures (md5-keyed min over the
  // shingle set) → B bands of R = K/B rows → self-join on (band_id,
  // band_key) → exact-Jaccard verification of candidates. The ONLY join is
  // keyed on the band signature — docs that share no band never meet,
  // which is what makes this viable at 100 TB (vs the all-pairs O(n²)
  // trap).
  //
  // Scale rule for (K, B): candidate probability for Jaccard j is
  // 1 - (1 - j^R)^B — the S-curve's threshold sits near (1/B)^(1/R).
  // More bands => higher recall and more candidates; more rows per band
  // => sharper threshold. K signatures cost ceil(K/4) md5 digests per
  // shingle (each 32-hex digest is split into four independent 8-hex
  // blocks). q45 runs the default (K=8, B=4, threshold ≈ 0.5); q64 the
  // same operator at (K=16, B=8) proving correctness and recall hold as
  // the knobs scale.
  val DefaultK = 8  // minhash functions
  val DefaultB = 4  // bands (of K/B rows each)

  /** The dedup-test corpus (doc_id, text): every document plus a planted
    * near-duplicate of every 20th one at doc_id + 100000 — shared by the
    * MinHash detectors here and the q199 funnel's keeper scoring (which
    * needs the TEXT of every corpus member, not just its shingles).
    */
  private[graft] def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val nearDups = base.where(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
              concat(col("text"), lit(" zzz extra tail")).as("text"))
    base.unionByName(nearDups)
  }

  /** (doc_id, sh) where sh = distinct 3-gram shingle set, over the
    * dedup-test corpus.
    */
  private def shingled(s: SparkSession, d: String): DataFrame =
    dedupCorpus(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks")).as("sh"))

  private val shingledSqlCte: String = {
    val toksE = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zzz extra tail'
       |  FROM documents WHERE doc_id % 20 = 0),
       |shingled AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 3 THEN
       |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |    ELSE [] END AS sh
       |  FROM (SELECT doc_id, $toksE AS toks FROM corpus))""".stripMargin
  }

  /** [[minhashPairs]] in the q45/q64 report form (deterministic order). */
  def minhashLsh(s: SparkSession, d: String, k: Int, b: Int): DataFrame =
    minhashPairs(s, d, k, b).orderBy(col("doc_a"), col("doc_b"))

  /** Verified near-duplicate PAIRS (doc_a < doc_b, bigram-shingle Jaccard
    * >= 0.6) from banded MinHash-LSH candidate generation — the unordered
    * edge-list form the q199 dedup funnel feeds into connected components.
    */
  def minhashPairs(s: SparkSession, d: String, k: Int, b: Int): DataFrame = {
    require(k % b == 0, s"K=$k must be a multiple of B=$b")
    val r = k / b // rows per band
    // the shingle set feeds three consumers (signatures, and both sides of
    // the verification join) — cache it once instead of re-tokenizing the
    // corpus three times (plan audit showed 8 document scans uncached).
    // Lifecycle: the cache must outlive this (lazy) plan, so the CALLER
    // owns release — Bench/Verify run spark.catalog.clearCache() after
    // materializing each query; long-lived sessions should do the same.
    val sh = shingled(s, d).cache()
    // K signatures from ceil(K/4) md5s per shingle: each 32-hex digest
    // yields 4 independent (non-overlapping) 8-hex blocks, so h_{m,b}(x) =
    // substring(md5(m":"x), 8b, 8) — 4× fewer hashes than one md5 per
    // signature, bit-identical in both engines. The md5s are materialized
    // as columns first so the per-block mins reference them instead of
    // re-hashing (the q48 inlining lesson).
    // All K signatures in ONE native pass (graft.expr.MinHashSigs):
    // per shingle, ceil(K/4) MD5s and K unsigned-int compares, no
    // intermediate arrays. Bit-identical to the HOF formulation the
    // DuckDB oracle runs (hofSigs below — TextSimSpec cross-checks) and
    // NULL for empty shingle sets, keeping empty docs out of every band.
    val sigs = sh.withColumn("sigsArr",
      graft.expr.MinHashFunctions.minhash_sigs(col("sh"), k))
    def sig(j: Int): Column = col("sigsArr").getItem(j)
    val banded = (0 until b).foldLeft(sigs) { (df, i) =>
      df.withColumn(s"band$i",
        md5(concat((0 until r).map(j => sig(r * i + j)): _*)))
    }
    val bands = banded.select(col("doc_id"),
      posexplode(array((0 until b).map(i => col(s"band$i")): _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .where(col("jaccard") >= 0.6)
  }

  /** The composable HOF formulation of the K signatures — what the
    * DuckDB oracle computes; the native expression must match it
    * bit-for-bit (TextSimSpec "native MinHash" case).
    */
  private[graft] def hofSigs(shingles: Column, k: Int): Column = {
    val nDigests = (k + 3) / 4
    val digests = (0 until nDigests).map(m =>
      transform(shingles, x => md5(concat(lit(s"$m:"), x))))
    array((0 until k).map { j =>
      array_min(transform(digests(j / 4), h => substring(h, (j % 4) * 8 + 1, 8)))
    }: _*)
  }

  def q45MinhashLsh(s: SparkSession, d: String): DataFrame =
    minhashLsh(s, d, DefaultK, DefaultB)

  def q64MinhashLshWide(s: SparkSession, d: String): DataFrame =
    minhashLsh(s, d, 16, 8)

  /** The banded-LSH candidate + verify pipeline as a reusable CTE chain
    * (starts with `corpus`/`shingled`, ends with
    * `pairs(doc_a, doc_b, jaccard)` — the verified near-dup edges).
    * Shared by the q45/q64 pair reports and the q199 funnel oracle.
    */
  def minhashPairCtes(k: Int, b: Int): String = {
    val r = k / b
    val nDigests = (k + 3) / 4
    val digestCols = (0 until nDigests).map(m =>
      s"list_transform(sh, x -> md5('$m:' || x)) AS h$m").mkString(",\n    ")
    val sigCols = (0 until k).map { j =>
      val src = s"h${j / 4}"
      val off = (j % 4) * 8 + 1
      s"list_aggregate(list_transform($src, h -> substring(h, $off, 8)), 'min') AS sig$j"
    }.mkString(",\n    ")
    val bandCols = (0 until b).map { i =>
      val cat = (0 until r).map(j => s"sig${r * i + j}").mkString(" || ")
      s"md5($cat) AS band$i"
    }.mkString(",\n    ")
    val bandArray = (0 until b).map(i => s"band$i").mkString("[", ", ", "]")
    val bandIdx = (0 until b).mkString("[", ",", "]")
    s"""$shingledSqlCte,
       |hashed AS (
       |  SELECT doc_id, sh,
       |    $digestCols
       |  FROM shingled),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hashed),
       |bandkeys AS (
       |  SELECT doc_id,
       |    $bandCols
       |  FROM sigs),
       |bands AS (
       |  SELECT doc_id, u.b AS band_id, $bandArray[u.b + 1] AS band_key
       |  FROM bandkeys CROSS JOIN (SELECT unnest($bandIdx) AS b) u),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
       |      4) AS jaccard
       |  FROM cand
       |  JOIN shingled sa ON sa.doc_id = cand.doc_a
       |  JOIN shingled sb ON sb.doc_id = cand.doc_b
       |  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
       |    >= 0.6)""".stripMargin
  }

  def minhashSql(k: Int, b: Int): String =
    s"""WITH ${minhashPairCtes(k, b)}
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  val q45Sql: String = minhashSql(DefaultK, DefaultB)
  val q64Sql: String = minhashSql(16, 8)

  // ─── q46: SimHash fingerprints (32-bit, md5-nibble planes) ────────────
  // Per token, bit j = high bit of the j-th hex nibble of md5(token);
  // the doc signature takes the sign of the per-position ±1 sum — the
  // classic SimHash, with md5 nibbles as the 32 random projections so both
  // engines derive identical bits. One explode + one groupBy; the shuffle
  // carries 32 small partial sums per doc.
  private val HI = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  def q46SimHash(s: SparkSession, d: String): DataFrame =
    // Native expression (graft.expr.SimHashBits): folds the token array
    // in place, so the plan is a SHUFFLE-FREE projection — no explode
    // (which multiplied rows by the token count), no 32-sum groupBy
    // exchange. TextSimSpec cross-checks bit-for-bit against the
    // exploded formulation the oracle twin still runs.
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      // token-less docs have no rows after the oracle's explode — drop
      // them here too so both forms agree on row membership.
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
              graft.expr.SimHashFunctions.simhash_bits(col("toks"))
                .as("simhash"))
      .orderBy(col("doc_id"))

  /** The exploded/aggregated formulation — what the DuckDB oracle
    * computes; the native expression must match it bit-for-bit
    * (TextSimSpec "native SimHash" case).
    */
  private[graft] def simHashExploded(s: SparkSession, d: String): DataFrame = {
    val exploded = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withBlocks = (0 until 4).foldLeft(exploded) { (df, b) =>
      df.withColumn(s"b$b",
        conv(substring(col("h"), b * 8 + 1, 8), 16, 10).cast("long"))
    }
    val sums = (0 until 32).map { j =>
      val bit = shiftright(col(s"b${j / 8}"), (7 - j % 8) * 4 + 3)
        .bitwiseAND(lit(1L))
      sum(when(bit === 1L, 1).otherwise(-1)).as(s"s$j")
    }
    val bits = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit("1")).otherwise(lit("0")))
    withBlocks.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
      .orderBy(col("doc_id"))
  }

  val q46Sql: String = {
    val hiList = HI.map("'" + _ + "'").mkString("(", ", ", ")")
    val sumCols = (0 until 32).map(j =>
      s"sum(CASE WHEN substring(h, ${j + 1}, 1) IN $hiList THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val bitConcat = (0 until 32).map(j =>
      s"(CASE WHEN s$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""SELECT doc_id, $bitConcat AS simhash
       |FROM (
       |  SELECT doc_id,
       |    $sumCols
       |  FROM (SELECT doc_id, md5(tok) AS h FROM
       |          (SELECT doc_id, unnest($tokensSql) AS tok FROM documents))
       |  GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ─── q68: SimHash near-dup via banded hamming join ────────────────────
  // Completes the SimHash story: q46 computes signatures, this USES them
  // for dedup at scale. Pigeonhole banding: the 32-bit signature splits
  // into three blocks (11/11/10 bits), and hamming(a, b) <= 2 < 3 blocks
  // guarantees at least one block is IDENTICAL — so the candidate join
  // is a plain equi-join on (block_id, block_value) with 100% recall for
  // the <= 2 contract (never all-pairs), and the exact hamming check
  // runs only on same-block candidates (one codegen'd bit_count(xor)).
  // Block width vs count is the scale knob: wider blocks (2^11 buckets
  // here vs 2^8 for four blocks) shrink candidate volume, at the price
  // of a tighter guaranteed threshold (blocks - 1). The synthetic
  // one-vocabulary corpus clusters signatures far more than real text,
  // so candidate counts here overstate production density.
  /** Even 32-bit split into `nBlocks` (remainder spread over the first
    * blocks) as (offset, length) pairs — the banding knob. The guaranteed
    * threshold is nBlocks - 1 (pigeonhole); TextSimSpec proves total
    * within-threshold recall at BOTH the default 3-block and a 4-block
    * setting.
    */
  private[graft] def hammingBlocks(nBlocks: Int): Seq[(Int, Int)] = {
    val base = 32 / nBlocks
    val extra = 32 % nBlocks
    val lens = Seq.tabulate(nBlocks)(i => base + (if (i < extra) 1 else 0))
    lens.scanLeft(1)(_ + _).zip(lens).map { case (off, len) => (off, len) }
  }

  def simhashNearDup(s: SparkSession, d: String, nBlocks: Int,
                     maxHamming: Int): DataFrame = {
    require(maxHamming < nBlocks,
      s"pigeonhole guarantee needs maxHamming < nBlocks ($maxHamming >= $nBlocks)")
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val dups = base.where(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
              concat(col("text"), lit(" zzz extra tail")).as("text"))
    val corpus = base.unionByName(dups)
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
              graft.expr.SimHashFunctions.simhash_bits(col("toks")).as("sig"))
    // the signature is parsed to a LONG once per doc BEFORE the join:
    // candidates then carry an 8-byte payload instead of a 32-char
    // string, and each match costs one xor+bit_count instead of two
    // base-2 string parses (2M+ matches on this clustered corpus).
    val blocks = corpus
      .withColumn("signum", conv(col("sig"), 2, 10).cast("long"))
      .select(col("doc_id"), col("signum"),
        posexplode(array(hammingBlocks(nBlocks).map { case (off, len) =>
          substring(col("sig"), off, len) }: _*)))
      .withColumnRenamed("pos", "block_id")
      .withColumnRenamed("col", "block_val")
    val ham = bit_count(col("x.signum").bitwiseXOR(col("y.signum")))
    // hamming is computed IN the join projection and filtered BEFORE the
    // dedup: a pair co-buckets in up to nBlocks blocks, so the distinct
    // would otherwise shuffle every candidate occurrence with the full
    // signature payload attached. Filter-then-distinct equals
    // distinct-then-filter because hamming is a pure function of the
    // pair.
    blocks.as("x")
      .join(blocks.as("y"),
        col("x.block_id") === col("y.block_id") &&
        col("x.block_val") === col("y.block_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              ham.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def q68SimhashNearDup(s: SparkSession, d: String): DataFrame =
    simhashNearDup(s, d, nBlocks = 3, maxHamming = 2)

  val q68Sql: String = {
    val hiList = HI.map("'" + _ + "'").mkString("(", ", ", ")")
    val sums = (0 until 32).map(j =>
      s"sum(CASE WHEN substring(h, ${j + 1}, 1) IN $hiList THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n      ")
    val bits = (0 until 32).map(j =>
      s"(CASE WHEN s$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zzz extra tail'
       |  FROM documents WHERE doc_id % 20 = 0),
       |sh AS (
       |  SELECT doc_id, $bits AS sig FROM (
       |    SELECT doc_id,
       |      $sums
       |    FROM (SELECT doc_id, md5(tok) AS h FROM
       |            (SELECT doc_id, unnest($tokensSql) AS tok FROM corpus))
       |    GROUP BY doc_id)),
       |blocks AS (
       |  SELECT doc_id, sig, u.b AS block_id,
       |         CASE u.b WHEN 0 THEN substring(sig, 1, 11)
       |                  WHEN 1 THEN substring(sig, 12, 11)
       |                  ELSE substring(sig, 23, 10) END AS block_val
       |  FROM sh CROSS JOIN (SELECT unnest([0, 1, 2]) AS b) u),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.sig AS sa, y.sig AS sb
       |  FROM blocks x JOIN blocks y
       |    ON x.block_id = y.block_id AND x.block_val = y.block_val
       |   AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_filter(generate_series(1, 32),
       |    i -> substring(sa, i, 1) <> substring(sb, i, 1))) AS INT) AS hamming
       |FROM cand
       |WHERE len(list_filter(generate_series(1, 32),
       |    i -> substring(sa, i, 1) <> substring(sb, i, 1))) <= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ─── q47: n-gram Jaccard between successive docs per language ─────────
  // Successive-pair generation via a dense per-lang position
  // (Windows.densePos — the naive PARTITION BY lang lead() hands each
  // language's whole corpus to one task) and an equi-join of position p
  // against p+1: positions are dense, so the join reproduces lead()
  // exactly, sharded across the cluster on (lang, pos). The similarity
  // itself is the same set arithmetic q45 uses for verification, on
  // word bigrams.
  def q47NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val bigrams = when(size(col("toks")) >= 2,
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
                            element_at(col("toks"), i + 1)))))
      .otherwise(array().cast("array<string>"))
    val jac = size(array_intersect(col("bg"), col("bg_next"))).cast("double") /
              size(array_union(col("bg"), col("bg_next"))).cast("double")
    val docs = documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(col("lang"), col("doc_id"), bigrams.as("bg"))
    val positioned = Windows.densePosScaled(docs, Seq("lang"),
      col("doc_id"), Seq(col("doc_id")), "pos")
    val successors = positioned.select(col("lang"),
      (col("pos") - 1L).as("pos"), col("doc_id").as("doc_b"),
      col("bg").as("bg_next"))
    positioned.join(successors, Seq("lang", "pos"))
      .select(col("lang"), col("doc_id").as("doc_a"), col("doc_b"),
              round(jac, 4).as("jaccard"))
      .orderBy(col("lang"), col("doc_a"))
  }

  val q47Sql: String =
    s"""WITH bg AS (
       |  SELECT lang, doc_id,
       |    CASE WHEN len(toks) >= 2 THEN
       |      list_distinct(list_transform(generate_series(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1]))
       |    ELSE [] END AS bg
       |  FROM (SELECT lang, doc_id, $tokensSql AS toks FROM documents)),
       |paired AS (
       |  SELECT lang, doc_id AS doc_a,
       |    lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS doc_b,
       |    bg,
       |    lead(bg) OVER (PARTITION BY lang ORDER BY doc_id) AS bg_next
       |  FROM bg)
       |SELECT lang, doc_a, doc_b,
       |  round(CAST(len(list_intersect(bg, bg_next)) AS DOUBLE)
       |    / (len(bg) + len(bg_next) - len(list_intersect(bg, bg_next))),
       |    4) AS jaccard
       |FROM paired
       |WHERE doc_b IS NOT NULL
       |ORDER BY lang, doc_a""".stripMargin

  // ─── q48: content-sampled document fingerprints ───────────────────────
  // Winnowing-flavored: hash every 3-gram shingle, keep the 1/16 sample
  // whose hash starts with '0' — a content-defined sample that is stable
  // under local edits (the rolling-hash fingerprint idea). Per-doc output:
  // sample size + min/max sampled hash.
  //
  // Shape matters: explode once → hash each shingle ONCE → per-doc
  // conditional aggregates. The first cut kept everything in nested array
  // lambdas, and ProjectCollapse inlined the whole shingle+md5 pipeline
  // into each of the 4 output columns — 4× the hashing, 48 s at sf0.1 vs
  // ~1 s for this formulation. (left-anti restores docs with no shingles
  // as all-NULL/zero rows, matching the lambda semantics.)
  def q48Fingerprint(s: SparkSession, d: String): DataFrame =
    // Native expression (graft.expr.FingerprintStats): the whole
    // summary — count, 1/16 sample, min/max sampled hash — is one fold
    // over the shingle array, so the plan is a SHUFFLE-FREE projection:
    // no explode, no groupBy exchange, and no left-anti union for
    // shingle-less docs (they are the expression's zero case).
    // TextSimSpec cross-checks against the exploded formulation below.
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("f",
        graft.expr.FingerprintFunctions.fingerprint_stats(shingles(col("toks"))))
      .select(col("doc_id"), col("f.n_shingles"), col("f.n_sampled"),
              col("f.fp_min"), col("f.fp_max"))
      .orderBy(col("doc_id"))

  /** The exploded/aggregated formulation — what the DuckDB oracle
    * computes; the native expression must match it bit-for-bit
    * (TextSimSpec "native fingerprint" case).
    */
  private[graft] def fingerprintExploded(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // materialize `toks` in its own projection BEFORE the explode: inlining
    // tokens() into the shingle lambda makes every element_at re-evaluate
    // the split+filter — O(n²) per document (13 s vs ~1 s at sf0.1).
    val perShingle = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), explode(shingles(col("toks"))).as("sh1"))
      .withColumn("h", md5(col("sh1")))
      .withColumn("sampled", substring(col("h"), 1, 1) === "0")
    val agg = perShingle.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
      min(when(col("sampled"), col("h"))).as("fp_min"),
      max(when(col("sampled"), col("h"))).as("fp_max"))
    val empty = docs.join(agg.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(0L).as("n_shingles"), lit(0L).as("n_sampled"),
              lit(null).cast("string").as("fp_min"),
              lit(null).cast("string").as("fp_max"))
    agg.unionByName(empty).orderBy(col("doc_id"))
  }

  val q48Sql: String = {
    val shE = shinglesSql("toks").replace("\n", " ")
    s"""SELECT doc_id,
       |  CAST(len(sh) AS BIGINT) AS n_shingles,
       |  CAST(len(sampled) AS BIGINT) AS n_sampled,
       |  list_aggregate(sampled, 'min') AS fp_min,
       |  list_aggregate(sampled, 'max') AS fp_max
       |FROM (
       |  SELECT doc_id, sh,
       |    list_filter(list_transform(sh, x -> md5(x)),
       |                h -> substring(h, 1, 1) = '0') AS sampled
       |  FROM (
       |    SELECT doc_id, $shE AS sh
       |    FROM (SELECT doc_id, $tokensSql AS toks FROM documents)))
       |ORDER BY doc_id""".stripMargin
  }

  // ─── q69: repetition-based quality filtering (Gopher-style) ───────────
  // The published repetition rules (Rae et al. 2021, "Scaling Language
  // Models: ... Gopher", Table A1) adapted to this corpus's token level:
  // a document is flagged when its most frequent 2-gram occupies too much
  // of the text or its token diversity collapses. Signals per doc:
  //  - dup_token_ratio  = 1 - distinct/total tokens      (diversity)
  //  - top_bigram_frac  = max bigram count / total        (repetition)
  //  - mean_token_len                                     (C4-style)
  // The bigram mode is computed the SCALABLE way — explode → count per
  // (doc, bigram) → max per doc: two partial-aggregated shuffles keyed on
  // fixed-size keys, never a per-doc O(distinct × n) lambda scan.
  def q69RepetitionQuality(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 2)
    val perDoc = docs.select(
      col("doc_id"),
      size(col("toks")).as("n_tokens"),
      round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
              / size(col("toks")), 4).as("dup_token_ratio"),
      round(aggregate(transform(col("toks"), t => length(t)), lit(0),
              (acc, x) => acc + x).cast("double") / size(col("toks")), 4)
        .as("mean_token_len"))
    val bigramStats = docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
                            element_at(col("toks"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("cnt")).cast("double") / sum(col("cnt")), 4)
        .as("top_bigram_frac"))
    perDoc.join(bigramStats, Seq("doc_id"))
      .withColumn("flagged",
        col("top_bigram_frac") > 0.18 || col("dup_token_ratio") > 0.8)
      .orderBy(col("doc_id"))
  }

  val q69Sql: String =
    s"""WITH toksed AS (
       |  SELECT doc_id, $tokensSql AS toks FROM documents),
       |docs AS (
       |  SELECT doc_id, toks FROM toksed WHERE len(toks) >= 2),
       |per_doc AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS INT) AS n_tokens,
       |    round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
       |      AS dup_token_ratio,
       |    round(CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
       |            AS DOUBLE) / len(toks), 4) AS mean_token_len
       |  FROM docs),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1])) AS bg
       |  FROM docs),
       |bg_counts AS (
       |  SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY doc_id, bg),
       |bg_stats AS (
       |  SELECT doc_id, round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4)
       |    AS top_bigram_frac
       |  FROM bg_counts GROUP BY doc_id)
       |SELECT p.doc_id, n_tokens, dup_token_ratio, mean_token_len,
       |  top_bigram_frac,
       |  (top_bigram_frac > 0.18 OR dup_token_ratio > 0.8) AS flagged
       |FROM per_doc p JOIN bg_stats b ON p.doc_id = b.doc_id
       |ORDER BY p.doc_id""".stripMargin

  // ─── q70: the full corpus-cleaning pipeline as ONE query ──────────────
  // Composition capstone: the dedup + quality family chained the way a
  // production training-data pipeline runs them, reported as a stage
  // funnel (stage, n_docs):
  //   00_raw          corpus = documents ∪ exact copies (%10) ∪
  //                   near-dup tail copies (%20)
  //   01_exact_dedup  keep min doc_id per sha2(text)          (q41 kernel)
  //   02_near_dedup   drop the higher id of every verified    (q45 kernel)
  //                   MinHash pair (jaccard ≥ 0.6) among survivors
  //   03_quality      drop docs whose top bigram occupies     (q69 kernel)
  //                   > 18% of the text (Gopher repetition rule)
  // Every stage is the already-verified operator's plan shape — hash
  // shuffles, banded LSH, two-agg bigram mode — so the funnel inherits
  // the 100 TB properties of its parts.
  def q70CleanCorpus(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val exactCopies = base.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val nearCopies = base.where(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
              concat(col("text"), lit(" zzz extra tail")).as("text"))
    val corpus = base.unionByName(exactCopies).unionByName(nearCopies)

    // stage 1: exact dedup (first-writer-wins on the content hash)
    val exact = corpus
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .select(col("doc_id"), col("text"))

    // stage 2: near-dup removal — MinHash candidates among stage-1
    // survivors, verified by exact Jaccard, drop the higher id
    val sh = exact
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("text"), shingles(col("toks")).as("sh"))
      .cache()
    val sigs = sh.withColumn("sigsArr",
      graft.expr.MinHashFunctions.minhash_sigs(col("sh"), DefaultK))
    val r = DefaultK / DefaultB
    val banded = (0 until DefaultB).foldLeft(sigs) { (df, i) =>
      df.withColumn(s"band$i", md5(concat((0 until r).map(j =>
        col("sigsArr").getItem(r * i + j)): _*)))
    }
    val bands = banded.select(col("doc_id"),
      posexplode(array((0 until DefaultB).map(i => col(s"band$i")): _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")
    val dropNear = bands.as("x")
      .join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .where(round(jac, 4) >= 0.6)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = sh.select(col("doc_id"), col("text"))
      .join(dropNear, Seq("doc_id"), "left_anti")

    // stage 3: repetition-quality filter (top-bigram fraction)
    val bigrams = nearDeduped
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
                            element_at(col("toks"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg((max(col("cnt")).cast("double") / sum(col("cnt"))).as("tbf"))
    val clean = nearDeduped.join(
      bigrams.where(col("tbf") <= 0.18).select(col("doc_id")), Seq("doc_id"))

    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    stage("00_raw", corpus)
      .unionByName(stage("01_exact_dedup", exact))
      .unionByName(stage("02_near_dedup", nearDeduped))
      .unionByName(stage("03_quality", clean))
      .orderBy(col("stage"))
  }

  val q70Sql: String = {
    val toksE = tokensSql
    val shE = shinglesSql("toks").replace("\n", " ")
    val sigCols = (0 until DefaultK).map { j =>
      val src = s"h${j / 4}"
      val off = (j % 4) * 8 + 1
      s"list_aggregate(list_transform($src, h -> substring(h, $off, 8)), 'min') AS sig$j"
    }.mkString(",\n    ")
    val digestCols = (0 until (DefaultK + 3) / 4).map(m =>
      s"list_transform(sh, x -> md5('$m:' || x)) AS h$m").mkString(",\n    ")
    val r = DefaultK / DefaultB
    val bandCols = (0 until DefaultB).map { i =>
      val cat = (0 until r).map(j => s"sig${r * i + j}").mkString(" || ")
      s"md5($cat) AS band$i"
    }.mkString(",\n    ")
    val bandArray = (0 until DefaultB).map(i => s"band$i").mkString("[", ", ", "]")
    val bandIdx = (0 until DefaultB).mkString("[", ",", "]")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zzz extra tail'
       |  FROM documents WHERE doc_id % 20 = 0),
       |exact AS (
       |  SELECT min(doc_id) AS doc_id, min(text) AS text
       |  FROM corpus GROUP BY sha256(text)),
       |shingled AS (
       |  SELECT doc_id, text, $shE AS sh
       |  FROM (SELECT doc_id, text, $toksE AS toks FROM exact)),
       |hashed AS (
       |  SELECT doc_id, sh,
       |    $digestCols
       |  FROM shingled),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hashed),
       |bandkeys AS (
       |  SELECT doc_id,
       |    $bandCols
       |  FROM sigs),
       |bands AS (
       |  SELECT doc_id, u.b AS band_id, $bandArray[u.b + 1] AS band_key
       |  FROM bandkeys CROSS JOIN (SELECT unnest($bandIdx) AS b) u),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id),
       |drop_near AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM cand
       |  JOIN shingled sa ON sa.doc_id = cand.doc_a
       |  JOIN shingled sb ON sb.doc_id = cand.doc_b
       |  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
       |    >= 0.6),
       |near_deduped AS (
       |  SELECT doc_id, text FROM exact
       |  WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)),
       |bg_stats AS (
       |  SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS tbf FROM (
       |    SELECT doc_id, bg, count(*) AS cnt FROM (
       |      SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1])) AS bg
       |      FROM (SELECT doc_id, $toksE AS toks FROM near_deduped)
       |      WHERE len(toks) >= 2)
       |    GROUP BY doc_id, bg)
       |  GROUP BY doc_id),
       |clean AS (
       |  SELECT n.doc_id FROM near_deduped n
       |  JOIN bg_stats b ON n.doc_id = b.doc_id AND b.tbf <= 0.18)
       |SELECT stage, n_docs FROM (
       |  SELECT '00_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM corpus
       |  UNION ALL
       |  SELECT '01_exact_dedup', CAST(count(*) AS BIGINT) FROM exact
       |  UNION ALL
       |  SELECT '02_near_dedup', CAST(count(*) AS BIGINT) FROM near_deduped
       |  UNION ALL
       |  SELECT '03_quality', CAST(count(*) AS BIGINT) FROM clean)
       |ORDER BY stage""".stripMargin
  }

  // ─── q100: cross-document span dedup (paragraph-dedup shape) ──────────
  // The C4/RefinedWeb cleaning step the doc-level dedups (q41/q45/q46)
  // don't cover: REPEATED SPANS removed from inside otherwise-unique
  // documents (boilerplate, navigation, license blocks), documents then
  // REASSEMBLED from their surviving spans in order. The corpus has no
  // paragraph delimiters, so spans are consecutive 3-token segments; the
  // shape — explode → hash-keyed span census → mark → ordered reassembly
  // — is delimiter-agnostic. Dedup contract: a span seen in >1 distinct
  // document is removed from ALL of them (deterministic and order-free,
  // unlike keep-first, which depends on scan order in a parallel run);
  // same-doc repeats survive.
  //
  // At 100 TB: the census groups md5 keys with a distinct-doc count —
  // 32-byte shuffle rows, map-side partial aggs. Span text rides exactly
  // two shuffles it cannot avoid (the nd lookup join — whose tiny (h,nd)
  // side AQE broadcasts when it fits; a bloom filter over dup hashes is
  // the fallback lever — and the per-doc reassembly). Reassembly is
  // collect_list over ONE document's spans: bounded by doc length, never
  // by corpus size.
  /** Shared by q100/q101: one-pass tokenize → 3-token segment → explode,
    * emitting (doc_id, lang, seg_idx, seg, h=md5(seg)). The toks frame
    * is CACHED — the q84 trap and fix: without the InMemoryRelation
    * boundary CollapseProject inlines the regex tokenizer into the
    * segment lambda's sequence/slice references, so the split re-runs
    * per SEGMENT on every consuming side (measured 7.1 s at sf0.1 vs
    * ~1 s fixed). Downstream consumers re-run only the cheap explode+md5
    * over the materialized arrays. Lifecycle: caller/harness clearCache,
    * as q45/q84 (identical logical plans share one cache entry across
    * q100/q101 in a session).
    */
  private def spanFrame(s: SparkSession, d: String): DataFrame = {
    val toksFrame = documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .cache()
    toksFrame
      .select(col("doc_id"), col("lang"),
        when(size(col("toks")) > 0, transform(
            sequence(lit(0), (ceil(size(col("toks")) / 3.0d) - 1).cast("int")),
            i => struct(i.as("seg_idx"),
                        array_join(slice(col("toks"), i * 3 + 1, lit(3)), " ")
                          .as("seg"))))
          .otherwise(array()).as("segs"))
      .select(col("doc_id"), col("lang"), explode(col("segs")).as("s"))
      .select(col("doc_id"), col("lang"),
              col("s.seg_idx").as("seg_idx"), col("s.seg").as("seg"),
              md5(col("s.seg")).as("h"))
  }

  def q100SpanDedup(s: SparkSession, d: String): DataFrame = {
    val segs = spanFrame(s, d)
    val counts = segs.select(col("h"), col("doc_id"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    val perDoc = segs.join(counts, "h")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"),
           sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_kept"),
           length(array_join(transform(
             filter(array_sort(collect_list(struct(col("seg_idx"), col("seg"),
                                                   col("nd")))),
                    x => x("nd") === 1),
             x => x("seg")), " ")).cast("long").as("chars_out"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_spans")).as("n_spans"),
           sum(col("n_dup")).as("n_dup_spans"),
           sum(col("n_kept")).as("n_kept_spans"),
           sum(col("chars_out")).as("chars_out"))
      .orderBy(col("lang"))
  }

  val q100Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, $tokensSql AS toks FROM documents),
       |segs AS (
       |  SELECT doc_id, lang, i AS seg_idx,
       |    array_to_string(toks[(i*3+1):(i*3+3)], ' ') AS seg
       |  FROM t, unnest(range(0, CAST(ceil(len(toks)/3.0) AS BIGINT))) AS u(i)),
       |nd AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg),
       |perdoc AS (
       |  SELECT doc_id, lang, count(*) AS n_spans,
       |    sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS n_dup,
       |    sum(CASE WHEN nd.nd = 1 THEN 1 ELSE 0 END) AS n_kept,
       |    coalesce(length(string_agg(seg, ' ' ORDER BY seg_idx)
       |      FILTER (WHERE nd.nd = 1)), 0) AS chars_out
       |  FROM segs JOIN nd USING (seg)
       |  GROUP BY doc_id, lang)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
       |  CAST(sum(n_dup) AS BIGINT) AS n_dup_spans,
       |  CAST(sum(n_kept) AS BIGINT) AS n_kept_spans,
       |  CAST(sum(chars_out) AS BIGINT) AS chars_out
       |FROM perdoc
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ─── q101: BLOOM-FILTER span dedup — q100's membership at 100 TB ──────
  // q100 marks duplicate spans with an exact (h → nd) equi-join; when
  // the duplicated-span vocabulary itself is too large to join cheaply,
  // production pipelines (Dolma-style) switch to a BLOOM FILTER over the
  // dup keys: built here with Spark's own runtime-filter aggregate
  // (BloomFilterAggregate via the sql-namespace bridge — distributed,
  // mergeable, one fixed-size sketch), probed with `might_contain` in
  // the PROJECTION — the marking pass needs no join and no shuffle, just
  // a 1-row broadcast of the sketch. The probabilistic contract is
  // checked AS DATA against the exact path: a bloom filter has NO false
  // negatives (every true dup span must test positive —
  // `no_false_negatives`), and false positives only ever OVER-drop,
  // bounded by the fpp the sketch geometry implies (`fp_within_budget`:
  // ≤ 3% of unique spans + 2, generous for 10 bits/key). The oracle
  // emits literal TRUE for both, so the hash only matches if the sketch
  // machinery genuinely behaves.
  def q101BloomSpanDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val segs = spanFrame(s, d)
    // CACHED: the scalar subquery below embeds its own copy of this
    // subtree (subquery plans share nothing with the main plan), so
    // without the boundary the census runs twice. (h, nd) rows are
    // fixed-width and |distinct spans|-bounded. Lifecycle: harness
    // clearCache, as spanFrame.
    val counts = segs.select(col("h"), col("doc_id"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
      .cache()
    // sketch sized for the dup-key cardinality class: 1M estimated items
    // x 10 bits/key (~1% fpp at capacity; far lower under-filled). At
    // 100 TB these two knobs come from the census the pipeline already
    // runs (or a first-pass approx_count_distinct).
    val bloom = counts.where(col("nd") > 1)
      .agg(bridge.bloomFilterAgg(xxhash64(col("h")),
        estimatedItems = 1000000L, numBits = 10000000L).as("bf"))
    // the probe rides as a SCALAR SUBQUERY (might_contain's contract —
    // the same shape InjectRuntimeFilter plants): a one-time 1-row
    // subquery result shipped to every task, no join in the marking pass
    val marked = segs.join(counts, "h")
      .withColumn("bloom_dup",
        bridge.mightContain(bloom, xxhash64(col("h"))))
    marked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_spans"),
           sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("nd") > 1 && !col("bloom_dup"), 1L).otherwise(0L))
             .as("false_negs"),
           sum(when(col("nd") === 1 && col("bloom_dup"), 1L).otherwise(0L))
             .as("false_pos"))
      .select(col("lang"), col("n_spans"), col("n_dup_spans"), col("n_kept"),
        (col("false_negs") === 0L).as("no_false_negatives"),
        (col("false_pos") <= ceil(col("n_kept") * 0.03) + 2L)
          .as("fp_within_budget"))
      .orderBy(col("lang"))
  }

  val q101Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, $tokensSql AS toks FROM documents),
       |segs AS (
       |  SELECT doc_id, lang, i AS seg_idx,
       |    array_to_string(toks[(i*3+1):(i*3+3)], ' ') AS seg
       |  FROM t, unnest(range(0, CAST(ceil(len(toks)/3.0) AS BIGINT))) AS u(i)),
       |nd AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_spans,
       |  CAST(sum(CASE WHEN nd.nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  TRUE AS no_false_negatives,
       |  TRUE AS fp_within_budget
       |FROM segs JOIN nd USING (seg)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ─── q105: incremental dedup — new batch vs existing corpus ───────────
  // The continuous-crawl shape: a NEW batch is admitted only if it is not
  // a near-dup of anything in the EXISTING corpus. Same banded-MinHash
  // machinery as q45, but the join is cross-set (new ⋈ corpus on band
  // key), never corpus ⋈ corpus — so per-run cost is ∝ |batch|, not
  // |corpus|. At 100 TB the corpus's (band_id, band_key, doc_id) index
  // and shingle store are PRECOMPUTED once and persisted (bucketed by
  // band_key, so the candidate probe is a co-located join); only the
  // incoming batch is tokenized per run. Fixture: batch = unseen docs
  // (every 5th, re-keyed) ∪ planted near-dup copies of corpus docs
  // (rejected by construction); census per lang is the contract, and
  // TextSimSpec asserts exact planted-set rejection.
  /** Per-doc admission decisions for the new batch — (doc_id, lang,
    * is_rejected). Exposed so TextSimSpec can assert exact planted-set
    * rejection; q105 aggregates it into the per-lang census.
    */
  private[graft] def incrementalDedupDecisions(
      s: SparkSession, d: String): DataFrame = {
    val k = DefaultK; val b = DefaultB; val r = k / b
    val base = documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val corpus = base.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val fresh = base.where(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 400000).as("doc_id"), col("lang"), col("text"))
    val planted = corpus.where(pmod(col("doc_id"), lit(15)) === 1)
      .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
              concat(col("text"), lit(" zzz extra tail")).as("text"))
    val newBatch = fresh.unionByName(planted)
    // one tokenizer pass over both sides, side-tagged; cached because the
    // shingle sets feed the signatures AND both verification joins (the
    // q45 lifecycle: caller releases via clearCache)
    val sh = corpus.withColumn("side", lit(0))
      .unionByName(newBatch.withColumn("side", lit(1)))
      .withColumn("toks", tokens(col("text")))
      .select(col("side"), col("doc_id"), col("lang"),
              shingles(col("toks")).as("sh"))
      .cache()
    val sigs = sh.withColumn("sigsArr",
      graft.expr.MinHashFunctions.minhash_sigs(col("sh"), k))
    def sig(j: Int): Column = col("sigsArr").getItem(j)
    val banded = (0 until b).foldLeft(sigs) { (df, i) =>
      df.withColumn(s"band$i",
        md5(concat((0 until r).map(j => sig(r * i + j)): _*)))
    }
    val bands = banded.select(col("side"), col("doc_id"),
        posexplode(array((0 until b).map(i => col(s"band$i")): _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    val cand = bands.where(col("side") === 1).as("n")
      .join(bands.where(col("side") === 0).as("c"),
        col("n.band_id") === col("c.band_id") &&
        col("n.band_key") === col("c.band_key"))
      .select(col("n.doc_id").as("new_id"), col("c.doc_id").as("corpus_id"))
      .distinct()
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")
    val rejected = cand
      .join(sh.where(col("side") === 1)
        .select(col("doc_id").as("new_id"), col("sh").as("sa")), Seq("new_id"))
      .join(sh.where(col("side") === 0)
        .select(col("doc_id").as("corpus_id"), col("sh").as("sb")),
        Seq("corpus_id"))
      .where(jac >= 0.6)
      .groupBy(col("new_id")).agg(count(lit(1)).as("nm"))
    newBatch.join(rejected, newBatch("doc_id") === rejected("new_id"), "left")
      .select(col("doc_id"), col("lang"),
              col("new_id").isNotNull.as("is_rejected"))
  }

  def q105IncrementalDedup(s: SparkSession, d: String): DataFrame =
    incrementalDedupDecisions(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_new"),
           count(when(col("is_rejected"), lit(1))).as("n_rejected"),
           count(when(!col("is_rejected"), lit(1))).as("n_admitted"))
      .orderBy(col("lang"))

  val q105Sql: String = {
    val k = DefaultK; val b = DefaultB; val r = k / b
    val nDigests = (k + 3) / 4
    val toksE = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    val digestCols = (0 until nDigests).map(m =>
      s"list_transform(sh, x -> md5('$m:' || x)) AS h$m").mkString(",\n    ")
    val sigCols = (0 until k).map { j =>
      val src = s"h${j / 4}"
      val off = (j % 4) * 8 + 1
      s"list_aggregate(list_transform($src, h -> substring(h, $off, 8)), 'min') AS sig$j"
    }.mkString(",\n    ")
    val bandCols = (0 until b).map { i =>
      val cat = (0 until r).map(j => s"sig${r * i + j}").mkString(" || ")
      s"md5($cat) AS band$i"
    }.mkString(",\n    ")
    val bandArray = (0 until b).map(i => s"band$i").mkString("[", ", ", "]")
    val bandIdx = (0 until b).mkString("[", ",", "]")
    s"""WITH corpus AS (
       |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
       |newbatch AS (
       |  SELECT doc_id + 400000 AS doc_id, lang, text
       |  FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 500000, lang, text || ' zzz extra tail'
       |  FROM corpus WHERE doc_id % 15 = 1),
       |tagged AS (
       |  SELECT 0 AS side, doc_id, lang, text FROM corpus
       |  UNION ALL
       |  SELECT 1, doc_id, lang, text FROM newbatch),
       |shingled AS (
       |  SELECT side, doc_id, lang,
       |    CASE WHEN len(toks) >= 3 THEN
       |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |    ELSE [] END AS sh
       |  FROM (SELECT side, doc_id, lang, $toksE AS toks FROM tagged)),
       |hashed AS (
       |  SELECT side, doc_id, sh,
       |    $digestCols
       |  FROM shingled),
       |sigs AS (
       |  SELECT side, doc_id, sh,
       |    $sigCols
       |  FROM hashed),
       |banded AS (
       |  SELECT side, doc_id, sh,
       |    $bandCols
       |  FROM sigs),
       |bands AS (
       |  SELECT side, doc_id, u.i AS band_id, $bandArray[u.i + 1] AS band_key
       |  FROM banded, unnest($bandIdx) AS u(i)),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
       |  FROM (SELECT * FROM bands WHERE side = 1) n
       |  JOIN (SELECT * FROM bands WHERE side = 0) c
       |    ON n.band_id = c.band_id AND n.band_key = c.band_key),
       |rejected AS (
       |  SELECT new_id FROM cand
       |  JOIN (SELECT doc_id, sh FROM shingled WHERE side = 1) ns
       |    ON ns.doc_id = cand.new_id
       |  JOIN (SELECT doc_id, sh FROM shingled WHERE side = 0) cs
       |    ON cs.doc_id = cand.corpus_id
       |  WHERE len(list_intersect(ns.sh, cs.sh)) * 1.0
       |      / len(list_distinct(ns.sh || cs.sh)) >= 0.6
       |  GROUP BY new_id),
       |decided AS (
       |  SELECT nb.lang, nb.doc_id,
       |    (rejected.new_id IS NOT NULL) AS is_rej
       |  FROM newbatch nb LEFT JOIN rejected ON nb.doc_id = rejected.new_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_new,
       |  CAST(sum(CASE WHEN is_rej THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_rejected,
       |  CAST(sum(CASE WHEN is_rej THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_admitted
       |FROM decided
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
  }

  // ─── q103: count-min-sketch heavy hitters (frequency at 100 TB) ───────
  // Completes the sketch family (HLL=q28, approx_percentile=q96/q99,
  // Bloom=q101): per-token frequency estimation from a FIXED-SIZE
  // mergeable sketch instead of a full vocabulary aggregation. The CMS
  // builds in one pass (partial sketches merge associatively, so
  // map-side combine ships one ~width×depth counter table per partition,
  // not the vocabulary); probing is a broadcast of the 1-row sketch
  // against the candidate set. At 100 TB the exact group-by twin below
  // disappears and candidates come from a sampled pass — here the exact
  // side doubles as the DuckDB-checkable contract, with the two CMS
  // guarantees emitted AS DATA (the q28 pattern): `no_underest`
  // (CMS never undercounts) must hold always, `within_eps`
  // (est ≤ exact + eps·N) with prob ≥ confidence per item — seed is
  // fixed, so pass/fail is deterministic per corpus.
  // eps 1e-4 ⇒ width 2/eps = 20k counters ≈ 160 KB/sketch at depth 5 —
  // the broadcast and the driver never see more than that, at any SF.
  def q103CmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
    val sk = toks.agg(
      expr("count_min_sketch(token, 0.0001d, 0.99d, 42)").as("sk"),
      count(lit(1)).as("n_total"))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(15)
    // native codegen probe (expr/CmsProbe.scala — expression #9, retiring
    // the repo's last UDF): per-thread deserialize-once memo, so probing
    // stays declarative AND one counter lookup per row at any fan-out.
    top.crossJoin(broadcast(sk))
      .select(col("token"), col("n"),
              graft.expr.CmsProbeFunctions.cms_probe(col("sk"), col("token"))
                .as("est"), col("n_total"))
      .select(col("token"), col("n"),
        (col("est") >= col("n")).as("no_underest"),
        (col("est") <= col("n") + ceil(col("n_total") * 0.0001d))
          .as("within_eps"))
      .orderBy(col("n").desc, col("token"))
  }

  val q103Sql: String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS n,
       |  TRUE AS no_underest, TRUE AS within_eps
       |FROM (SELECT unnest($tokensSql) AS token FROM documents)
       |GROUP BY token
       |ORDER BY n DESC, token
       |LIMIT 15""".stripMargin

  // ─── q203: EXACT set-similarity self-join via prefix filtering ────────
  // The AllPairs/PPJoin shape (Bayardo et al., WWW'07; public algorithm):
  // find EVERY document pair with shingle-Jaccard >= 0.6 — exactly, no
  // MinHash false negatives — without the all-pairs join. Under a global
  // token order (rarest document-frequency first), two sets with
  // jac >= t MUST share a token inside each one's PREFIX of length
  // |x| - ceil(t*|x|) + 1, so joining prefixes on the token finds every
  // qualifying pair; the exact intersect/union then verifies candidates.
  // This is the exact counterpart to q45's banded LSH: LSH trades recall
  // for a fixed candidate budget, the prefix filter keeps recall = 1 and
  // prunes by rarity instead. The ORACLE is the brute-force token join —
  // a green hash-match PROVES the prefix filter dropped nothing.
  //
  // 100 TB shape: shuffles carry (doc_id, token-hash, two ints), never
  // text; the candidate join touches only prefix tokens, which the
  // rarity order biases toward document frequency ~1 (a stopword-like
  // shingle is in nobody's prefix unless the doc is near-duplicate
  // everywhere); the size filter 5*min >= 3*max (integer form of
  // min >= t*max, implied by jac >= t) prunes before the verify join.
  // All bounds are EXACT integer arithmetic — (3*sz+4) DIV 5 is
  // ceil(0.6*sz) — so no float rounding can shorten a prefix.
  def q203PrefixFilterJoin(s: SparkSession, d: String): DataFrame = {
    // CACHED like minhashPairs' shingle frame (caller owns release via
    // clearCache — Bench/Verify already do): `sh` feeds the tokenize →
    // df → prefix pipeline AND both verify-join sides, and `prefix`
    // feeds BOTH sides of the candidate self-join — uncached, Spark
    // re-executes the scan+shingle+window subtree once per branch
    // (~5×; measured 32 s → ~4 s at sf0.1 from these two lines).
    //
    // Shingles are reduced to 60-bit md5-prefix HASHES before anything
    // fans out (round-9 soak lesson: the verify join attaches BOTH
    // candidate arrays per pair, so array bytes are the multiplier on
    // the join's shuffle — hashing cuts them ~2.5× and makes the
    // intersect a long compare). Distinct shingles stay distinct with
    // probability 1 − |union|²/2⁶⁰ (~4e-15 per pair), so the STRING-
    // based DuckDB oracle and the in-process brute-force spec still
    // tie out hash-for-hash. Membership and counts are what matter;
    // the hash is never emitted.
    val sh = documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        array_distinct(transform(shingles(col("toks")),
          t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")))
          .as("sh"))
      .cache()
    val toks = sh.select(col("doc_id"), size(col("sh")).as("sz"),
                         explode(col("sh")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "tok")
    val prefix = toks.join(dfreq, "tok")
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <= expr("sz - (3 * sz + 4) DIV 5 + 1"))
      .select(col("doc_id"), col("sz"), col("tok"))
      .cache()
    val cand = prefix.as("x")
      .join(prefix.as("y"),
        col("x.tok") === col("y.tok") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("x.sz") * 5 >= col("y.sz") * 3 &&
        col("y.sz") * 5 >= col("x.sz") * 3)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")
    // SHUFFLE_HASH on the doc-keyed side: sort-merge would SORT the
    // array-attached intermediate (candidates × ~1 KB rows — the 50 GB
    // spill the sf10 soak hit); hash-building the compact sh side
    // streams the wide side through unsorted.
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
              .hint("SHUFFLE_HASH"), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb"))
              .hint("SHUFFLE_HASH"), Seq("doc_b"))
      .where(jac >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val q203Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    ${shinglesSql("toks")} AS sh
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
       |t AS (SELECT doc_id, unnest(sh) AS tok FROM sh),
       |sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
       |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(isect * 1.0 / (sa.sz + sb.sz - isect), 4) AS jaccard
       |FROM inter
       |JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |WHERE isect * 1.0 / (sa.sz + sb.sz - isect) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin

  // ─── q245: dedup-detector evaluation census (LSH vs exact truth) ──────
  // The audit that closes the near-dup family's loop: q203's prefix-
  // filter join is recall-1 BY CONSTRUCTION (the brute-force oracle
  // proves zero dropped pairs), which makes it the GROUND TRUTH an
  // approximate detector can finally be measured against — the
  // precision/recall numbers a production pipeline quotes when it picks
  // (K, B). Detected = the verified banded-MinHash pairs (q45's K=8,
  // B=4); correct = detected ∩ truth (an equi-join on the pair key);
  // precision lands 1.0 — the verify stage removes band false positives
  // — and recall is the banding's true miss rate, both emitted as
  // oracle-computed DATA (the q104 contract: the accuracy number itself
  // is cross-engine checked, not asserted). Fixture reading: recall
  // also measures 1.0 at every SF — (8, 4) banding at θ=0.6 collides
  // every natural pair in this corpus (their Jaccards sit well above
  // the S-curve's steep region); the operator's value is that the
  // number is MEASURED against a recall-1 truth, not assumed.
  // Scale: composes two green pipelines (each bucket-joined, never
  // all-pairs) plus one pair-keyed join and a ≤1-row reduce.
  def q245DetectorEval(s: SparkSession, d: String): DataFrame = {
    // minhashPairs runs over the dedup-TEST corpus (documents + planted
    // +100000-id near-dup copies); the truth side covers the raw corpus
    // — so the evaluation restricts detected to raw-id pairs and scores
    // the detector on the NATURAL near-dups only
    val det = minhashPairs(s, d, DefaultK, DefaultB)
      .where(col("doc_a") < 100000L && col("doc_b") < 100000L)
      .select(col("doc_a"), col("doc_b"))
    val truth = q203PrefixFilterJoin(s, d).select(col("doc_a"), col("doc_b"))
    // ONE full-outer-join census (r15, guide §2.4/§5): the three counts
    // used to re-derive the detector and truth pipelines across three
    // aggregate branches (det twice, truth twice — each a full
    // tokenize+shingle pass when exchange reuse misses); both pipelines
    // now derive exactly once. Pairs are UNIQUE on both sides (each
    // pipeline distinct-s its candidates before the 1:1 doc joins), so
    // the full join preserves all three counts exactly.
    det.withColumn("_d", lit(1L))
      .join(truth.withColumn("_t", lit(1L)), Seq("doc_a", "doc_b"), "full")
      .agg(count(col("_d")).as("n_detected"),
           count(when(col("_d").isNotNull && col("_t").isNotNull, 1L))
             .as("n_correct"),
           count(col("_t")).as("n_truth"))
      .select(col("n_detected"), col("n_correct"), col("n_truth"),
        round(col("n_correct") / col("n_detected"), 4).as("precision"),
        round(col("n_correct") / col("n_truth"), 4).as("recall"))
  }

  val q245Sql: String =
    s"""WITH ${minhashPairCtes(DefaultK, DefaultB)},
       |esh AS MATERIALIZED (
       |  SELECT doc_id, ${shinglesSql("toks")} AS esh
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
       |et AS (SELECT doc_id, unnest(esh) AS tok FROM esh),
       |esz AS (SELECT doc_id, count(*) AS sz FROM et GROUP BY 1),
       |einter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
       |  FROM et a JOIN et b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b
       |  FROM einter
       |  JOIN esz sa ON doc_a = sa.doc_id JOIN esz sb ON doc_b = sb.doc_id
       |  WHERE isect * 1.0 / (sa.sz + sb.sz - isect) >= 0.6),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_detected FROM pairs
       |       WHERE doc_a < 100000 AND doc_b < 100000),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_correct
       |       FROM pairs p JOIN truth t
       |         ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
       |       WHERE p.doc_a < 100000 AND p.doc_b < 100000)
       |SELECT n_detected, n_correct, n_truth,
       |  round(n_correct * 1.0 / n_detected, 4) AS precision,
       |  round(n_correct * 1.0 / n_truth, 4) AS recall
       |FROM nd, nc, nt""".stripMargin

  // ─── q247: windowed PMI co-occurrence (word-association mining) ───────
  // The word2vec-era statistic (Church & Hanks 1990): which token pairs
  // co-occur within a ±3 window more than chance — the signal behind
  // co-occurrence embeddings, collocation extraction, and phrase
  // mining. Pair generation is a PURE PROJECTION: per doc, a nested
  // sequence/transform fans each position out to its ≤3 successors and
  // canonicalizes the pair alphabetically — no self-join, no shuffle
  // keyed on doc or position (the naive positions⋈positions join
  // shuffles the corpus twice for the same pairs; this is the flatMap
  // form, map-side until ONE pair-keyed aggregate). PMI =
  // ln(c_ab·U²/(T·c_a·c_b)) over exact integer counts, rounded to 4dp
  // BEFORE the ordering (the q150 round-before-sort rule); min-support
  // 20 keeps the tail's unstable estimates out.
  // Scale: token pairs fan out ≤3× the token count; the aggregate is
  // map-side combined; the two unigram joins key on the token (at
  // 100 TB: md5 the token — the q153 note); T and U ride 1-row
  // broadcasts.
  private val PmiWindow = 3
  private val PmiMinCount = 20

  def q247PmiCooccurrence(s: SparkSession, d: String): DataFrame = {
    val toksF = documents(s, d).select(tokens(col("text")).as("ts"))
    val pairs = toksF.select(explode(flatten(
      transform(sequence(lit(1), size(col("ts")) - 1), i =>
        transform(sequence(i + 1, least(i + PmiWindow, size(col("ts")))),
          j => struct(
            least(element_at(col("ts"), i), element_at(col("ts"), j))
              .as("a"),
            greatest(element_at(col("ts"), i), element_at(col("ts"), j))
              .as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pc = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val uni = toksF.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = pc.agg(sum(col("cab")).cast("double").as("tt"))
      .crossJoin(uni.agg(sum(col("c")).cast("double").as("uu")))
    pc.where(col("cab") >= PmiMinCount.toLong)
      .join(uni.select(col("tok").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("cab"),
        round(log(col("cab").cast("double") * col("uu") * col("uu") /
                  (col("tt") * col("ca").cast("double") *
                   col("cb").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(25)
  }

  val q247Sql: String =
    s"""WITH toksf AS MATERIALIZED (
       |  SELECT $tokensSql AS ts FROM documents),
       |pairs AS (
       |  SELECT p['a'] AS a, p['b'] AS b FROM (
       |    SELECT unnest(flatten(list_transform(
       |      generate_series(1, len(ts) - 1), i ->
       |        list_transform(generate_series(i + 1,
       |                                       least(i + $PmiWindow, len(ts))),
       |          j -> {'a': least(ts[i], ts[j]),
       |                'b': greatest(ts[i], ts[j])})))) AS p
       |    FROM toksf)),
       |pc AS MATERIALIZED (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS cab
       |  FROM pairs GROUP BY a, b),
       |uni AS MATERIALIZED (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(ts) AS tok FROM toksf) GROUP BY tok),
       |tot AS (SELECT (SELECT CAST(sum(cab) AS DOUBLE) FROM pc) AS tt,
       |               (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS uu)
       |SELECT a, b, cab,
       |  round(ln(CAST(cab AS DOUBLE) * uu * uu
       |           / (tt * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 4)
       |    AS pmi
       |FROM pc
       |JOIN uni ua ON pc.a = ua.tok
       |JOIN uni ub ON pc.b = ub.tok
       |CROSS JOIN tot
       |WHERE cab >= $PmiMinCount
       |ORDER BY pmi DESC, a, b
       |LIMIT 25""".stripMargin

  // ─── q261: TextRank keyphrase extraction ──────────────────────────────
  // The graph-based keyword extractor (Mihalcea & Tarau 2004): build the
  // word co-occurrence graph (q247's ±3-window pair projection — the
  // flatMap form, no positions self-join), keep edges seen ≥ 20 times,
  // drop self-loops (a repeated token inside its own window would feed
  // rank mass back to itself), and run the SAME damped PageRank loop the
  // link-graph queries use (Graph.pageRank — localCheckpoint per round,
  // cardinality-guarded broadcast, 5 fixed iterations). Top-20 tokens by
  // the 5-dp ROUNDED rank (ties to the token) — corpus-level salient
  // vocabulary, the unsupervised keyphrase signal.
  //
  // Scale: pair generation is one projection pass (≤3× token fanout);
  // the graph is VOCAB-sized, so every per-round frame is tiny relative
  // to the corpus and the rank frame rides the ≤5M-node broadcast guard;
  // node ids here are token strings (at 100 TB: md5 the token — the
  // q153 note — so shuffles carry 16 bytes, not words).
  private val TrMinCount = 20

  def q261TextRank(s: SparkSession, d: String): DataFrame = {
    val toksF = documents(s, d).select(tokens(col("text")).as("ts"))
    val pairs = toksF.select(explode(flatten(
      transform(sequence(lit(1), size(col("ts")) - 1), i =>
        transform(sequence(i + 1, least(i + PmiWindow, size(col("ts")))),
          j => struct(
            least(element_at(col("ts"), i), element_at(col("ts"), j))
              .as("a"),
            greatest(element_at(col("ts"), i), element_at(col("ts"), j))
              .as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pc = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .where(col("cab") >= TrMinCount.toLong && col("a") =!= col("b"))
    val edges = pc.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pc.select(col("b").as("src"), col("a").as("dst")))
    Graph.pageRank(edges, iterations = 5)
      .select(col("node").as("token"), round(col("pr"), 5).as("pr"))
      .orderBy(col("pr").desc, col("token"))
      .limit(20)
  }

  val q261Sql: String = {
    val stages = (1 to 5).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node, 0.15 + 0.85 * coalesce(c.s, CAST(0 AS DOUBLE)) AS pr
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr / d.deg) AS s
         |    FROM e JOIN r${k - 1} r ON e.src = r.node JOIN d ON e.src = d.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    s"""WITH toksf AS MATERIALIZED (
       |  SELECT $tokensSql AS ts FROM documents),
       |pairs AS (
       |  SELECT p['a'] AS a, p['b'] AS b FROM (
       |    SELECT unnest(flatten(list_transform(
       |      generate_series(1, len(ts) - 1), i ->
       |        list_transform(generate_series(i + 1,
       |                                       least(i + $PmiWindow, len(ts))),
       |          j -> {'a': least(ts[i], ts[j]),
       |                'b': greatest(ts[i], ts[j])})))) AS p
       |    FROM toksf)),
       |pc AS MATERIALIZED (
       |  SELECT a, b FROM pairs GROUP BY a, b
       |  HAVING count(*) >= $TrMinCount AND a <> b),
       |e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM pc
       |  UNION ALL SELECT b, a FROM pc),
       |d AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |n AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM n),
       |${stages.mkString(",\n")}
       |SELECT node AS token, round(pr, 5) AS pr
       |FROM r5
       |ORDER BY pr DESC, token
       |LIMIT 20""".stripMargin
  }

  // ─── q204: train/test split-leakage audit ─────────────────────────────
  // The evaluation-integrity check every training pipeline should run and
  // few do: after a deterministic hash split (q72's exact convention —
  // md5("split:"||doc_id) first byte vs the cc/e6 fences), how many
  // verified NEAR-DUPLICATE pairs straddle a split boundary? Each one is
  // a test/val document whose near-copy sits in train — decontamination
  // (q84) catches benchmark n-grams, this catches the corpus leaking into
  // its own held-out set. Census per unordered boundary (least/greatest
  // of the two split names) with the worst offending Jaccard as data.
  //
  // Scale: pure composition of two green stages — stage 1 is q45's
  // banded-LSH candidate generation (bucketed equi-joins, never
  // all-pairs); the audit itself tags the VERIFIED pair list (tiny by
  // construction) with two md5 evaluations per row and reduces to a
  // ≤3-row census. Nothing beyond stage 1 touches corpus scale.
  def q204SplitLeakage(s: SparkSession, d: String): DataFrame = {
    def splitOf(idc: Column): Column = {
      val h = substring(md5(concat(lit("split:"), idc.cast("string"))), 1, 2)
      when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    }
    minhashPairs(s, d, DefaultK, DefaultB)
      .withColumn("sa", splitOf(col("doc_a")))
      .withColumn("sb", splitOf(col("doc_b")))
      .where(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("split_lo"),
              greatest(col("sa"), col("sb")).as("split_hi"),
              col("jaccard"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_leaks"),
           round(max(col("jaccard")), 4).as("worst_jaccard"))
      .orderBy("split_lo", "split_hi")
  }

  val q204Sql: String = {
    def splitSql(c: String) =
      s"""CASE WHEN substr(md5('split:' || CAST($c AS VARCHAR)), 1, 2) < 'cc'
         |  THEN 'train'
         |  WHEN substr(md5('split:' || CAST($c AS VARCHAR)), 1, 2) < 'e6'
         |  THEN 'val' ELSE 'test' END""".stripMargin
    s"""WITH ${minhashPairCtes(DefaultK, DefaultB)},
       |tagged AS (
       |  SELECT ${splitSql("doc_a")} AS sa,
       |    ${splitSql("doc_b")} AS sb, jaccard
       |  FROM pairs)
       |SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
       |  CAST(count(*) AS BIGINT) AS n_leaks,
       |  round(max(jaccard), 4) AS worst_jaccard
       |FROM tagged WHERE sa <> sb
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  // ─── q205: exact duplicated-SUBSTRING removal (suffix-window dedup) ───
  // The published training-data step q100 provably misses: remove every
  // substring of ≥ L tokens that repeats across documents, wherever it
  // starts (the suffix-array dedup of Lee et al. 2021, "Deduplicating
  // Training Data Makes Language Models Better" — re-derived for Spark
  // without the suffix array). q100 hashes FIXED stride-3 segments from
  // position 0, so a shared run whose offset differs by one token between
  // two documents lands on different segment boundaries and is invisible
  // to it (boilerplate headers shifted by a single leading word — the
  // exact case this operator exists for). Here every OVERLAPPING L-token
  // window is hashed (stride 1): a cross-doc run of m ≥ L tokens makes
  // all m−L+1 of its windows collide, and the union of overlapping
  // duplicated windows is precisely the maximal duplicated span — the
  // "extend bidirectionally to maximal matches" step falls out of
  // interval union, no extension loop needed. Token t is removed iff
  // some duplicated window covers it; documents are reassembled from the
  // surviving tokens in order.
  //
  // At 100 TB: windows shuffle as (md5, doc_id) — 32-byte rows, map-side
  // combined; only DUPLICATED windows (a tiny fraction) fan out ×L into
  // covered positions; the islands pass windows over doc_id (a leaf
  // high-cardinality key — per-doc work bounded by doc length, never
  // corpus size); reassembly is a HOF filter over the cached token
  // arrays against each doc's own ≤doc-length islands array — no
  // per-token rows ever shuffle.
  private val SubstrL = 8

  /** Per-document census of the L-token-window substring dedup over any
    * (doc_id, lang, text) frame: n_toks, n_spans (maximal duplicated
    * spans removed), n_rm (tokens removed), chars_out (length of the
    * document reassembled from surviving tokens). Exposed separately
    * from q205 so specs can run planted corpora through the REAL
    * pipeline. Caches the tokenized frame; caller owns clearCache.
    */
  def substringDedupPerDoc(docs: DataFrame, L: Int): DataFrame = {
    val toksFrame = docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .cache()
    val grams = toksFrame
      .where(size(col("toks")) >= L)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - L),
          i => struct(i.as("pos"),
            md5(array_join(slice(col("toks"), i + 1, lit(L)), " "))
              .as("h")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val dup = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("h")
    val covpos = grams.join(dup, "h")
      .select(col("doc_id"),
              explode(sequence(col("pos"), col("pos") + L - 1)).as("p"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = covpos
      .withColumn("newisl",
        when(col("p") - lag(col("p"), 1).over(w) > 1, 1L).otherwise(0L))
      .withColumn("isl", sum(col("newisl"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("p")).as("s"), max(col("p")).as("e"))
    val perDocIsl = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
           sum(col("e") - col("s") + 1L).as("n_rm"),
           array_sort(collect_list(struct(col("s"), col("e"))))
             .as("islands"))
    toksFrame.join(perDocIsl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_rm"), lit(0L)).as("n_rm"),
        // null islands (doc untouched) ⇒ exists→null ⇒ coalesce keeps
        length(array_join(
          filter(col("toks"), (_, i) =>
            coalesce(!exists(col("islands"),
                             x => i >= x("s") && i <= x("e")),
                     lit(true))),
          " ")).cast("long").as("chars_out"))
  }

  def q205SubstringDedup(s: SparkSession, d: String): DataFrame = {
    // identical tokenize plan to q100's cached frame ⇒ one shared cache
    // entry per session (lifecycle: caller/harness clearCache)
    substringDedupPerDoc(documents(s, d), SubstrL)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
           sum(col("n_spans")).as("n_spans_removed"),
           sum(col("n_toks")).as("n_toks"),
           sum(col("n_rm")).as("n_removed_toks"),
           sum(col("chars_out")).as("chars_out"))
      .orderBy(col("lang"))
  }

  val q205Sql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, lang, $tokensSql AS toks FROM documents),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, i AS pos,
       |         md5(array_to_string(toks[(i+1):(i+8)], ' ')) AS h
       |  FROM t, unnest(range(0, len(toks)-8+1)) u(i)
       |  WHERE len(toks) >= 8),
       |dup AS (SELECT h FROM grams GROUP BY h
       |        HAVING count(DISTINCT doc_id) >= 2),
       |covpos AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, u.p
       |  FROM grams JOIN dup USING (h), unnest(range(pos, pos+8)) u(p)),
       |flags AS (
       |  SELECT doc_id, p,
       |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 1
       |         THEN 1 ELSE 0 END AS newisl
       |  FROM covpos),
       |isl AS (
       |  SELECT doc_id, p,
       |    sum(newisl) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       |  FROM flags),
       |spans AS (SELECT doc_id, isl, min(p) AS s, max(p) AS e
       |          FROM isl GROUP BY doc_id, isl),
       |perisl AS (SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS n_rm
       |           FROM spans GROUP BY doc_id),
       |toksposkept AS (
       |  SELECT tp.doc_id, coalesce(length(string_agg(tp.tok, ' ' ORDER BY tp.p)), 0)
       |           AS chars_out
       |  FROM (SELECT doc_id, u.p AS p, toks[u.p+1] AS tok
       |        FROM t, unnest(range(0, len(toks))) u(p)) tp
       |  LEFT JOIN covpos c ON tp.doc_id = c.doc_id AND tp.p = c.p
       |  WHERE c.p IS NULL
       |  GROUP BY tp.doc_id),
       |perdoc AS (
       |  SELECT t.doc_id, t.lang, len(t.toks) AS n_toks,
       |    coalesce(pi.n_spans, 0) AS n_spans, coalesce(pi.n_rm, 0) AS n_rm,
       |    coalesce(k.chars_out, 0) AS chars_out
       |  FROM t LEFT JOIN perisl pi USING (doc_id)
       |         LEFT JOIN toksposkept k ON t.doc_id = k.doc_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_hit,
       |  CAST(sum(n_spans) AS BIGINT) AS n_spans_removed,
       |  CAST(sum(n_toks) AS BIGINT) AS n_toks,
       |  CAST(sum(n_rm) AS BIGINT) AS n_removed_toks,
       |  CAST(sum(chars_out) AS BIGINT) AS chars_out
       |FROM perdoc
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ─── q229: content-defined chunk dedup (CDC / rolling-boundary) ───────
  // The storage-layer dedup technique the fixed-boundary family can't
  // replicate: chunk boundaries are declared wherever a content hash of
  // the trailing 4-gram ≡ 0 (mod 16), so an INSERTION near the head of a
  // document shifts every token position yet the boundaries RE-SYNC as
  // soon as the window clears the edit — all chunks after the first
  // changed one hash identically to the source's (the rsync/LBFS
  // chunking argument; q75's fixed-stride chunks would misalign to the
  // end of the document). The catalog plants exactly that case: every
  // 30th doc gets a copy with a 2-token prefix, and the census counts
  // shared distinct chunk hashes per (source, copy) pair — near-total
  // overlap is the operator working; the oracle recomputes boundary
  // positions, chunk strings, and the intersection from scratch.
  //
  // Scale: boundaries and chunk hashes are computed INSIDE the token
  // array (one projection, zero shuffle, no per-token window); the only
  // shuffles carry (doc_id, 32-hex chunk hash) pairs — fixed-width, and
  // every aggregate below is map-side combined.
  /** CDC chunk BOUNDARIES of a token array: interior gram-hash cut
    * points plus the [0, n] frame. Kept as its own projected column by
    * the caller: the boundary array hashes every 4-gram, and the chunk
    * extractor references it three times per chunk — inlining it
    * (the pre-r14 single-expression form) re-hashed every gram
    * O(chunks) times per row, the dominant cost of q229's whole plan.
    */
  private def cdcBounds(toksCol: Column): Column = {
    val n = size(toksCol)
    def gramAt(i: Column): Column =
      concat_ws(" ", slice(toksCol, i - 3, lit(4)))
    val bpos = when(n >= 4,
      filter(sequence(lit(4), n), i =>
        pmod(conv(substring(md5(gramAt(i)), 1, 8), 16, 10).cast("long"),
             lit(16L)) === 0))
      .otherwise(array().cast("array<int>"))
    // interior boundaries only: strictly < n, so bounds is sorted+unique
    // by construction (no order-fragile distinct needed)
    concat(array(lit(0)), filter(bpos, x => x < n), array(n))
  }

  /** Chunk hashes given the token array AND its pre-computed bounds
    * column — both must be plain attributes at the call site so each is
    * evaluated once per row. */
  private def cdcChunksOf(toksCol: Column, bounds: Column): Column =
    when(size(toksCol) >= 1,
      transform(sequence(lit(1), size(bounds) - 1), k =>
        md5(concat_ws(" ", slice(toksCol,
          element_at(bounds, k) + 1,
          element_at(bounds, k + 1) - element_at(bounds, k))))))
      .otherwise(array().cast("array<string>"))

  def q229CdcChunkDedup(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val copies = base.where(pmod(col("doc_id"), lit(30)) === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
              concat(lit("zq zr "), col("text")).as("text"))
    // stepwise projection: toks and bounds are materialized as columns
    // so tokenization runs once and every gram is hashed once per row
    // (CollapseProject keeps multi-referenced non-cheap aliases apart)
    val chunked = base.unionByName(copies)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), cdcBounds(col("toks")).as("bnd"))
      .select(col("doc_id"),
              explode(array_distinct(cdcChunksOf(col("toks"), col("bnd"))))
                .as("h"))
    val srcEx = chunked.where(col("doc_id") < 200000 &&
        pmod(col("doc_id"), lit(30)) === 0)
      .select(col("doc_id").as("src_id"), col("h"))
    val copyEx = chunked.where(col("doc_id") >= 200000)
      .select((col("doc_id") - 200000).as("src_id"), col("h"))
    val nSrc = srcEx.groupBy(col("src_id"))
      .agg(count(lit(1)).as("n_src_chunks"))
    val nCopy = copyEx.groupBy(col("src_id"))
      .agg(count(lit(1)).as("n_copy_chunks"))
    val shared = srcEx.join(copyEx, Seq("src_id", "h"))
      .groupBy(col("src_id")).agg(count(lit(1)).as("n_shared"))
    nSrc.join(nCopy, "src_id").join(shared, Seq("src_id"), "left")
      .select(col("src_id"), col("n_src_chunks"), col("n_copy_chunks"),
              coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .orderBy(col("src_id"))
  }

  val q229Sql: String = {
    val gram = "concat_ws(' ', toks[i-3], toks[i-2], toks[i-1], toks[i])"
    val chunks =
      s"""list_transform(generate_series(1, len(bounds) - 1),
         |        k -> md5(array_to_string(
         |               toks[bounds[k] + 1 : bounds[k + 1]], ' ')))"""
        .stripMargin
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000, 'zq zr ' || text
       |  FROM documents WHERE doc_id % 30 = 0),
       |tk AS (SELECT doc_id, $tokensSql AS toks FROM corpus),
       |bd AS (
       |  SELECT doc_id, toks,
       |    list_concat(list_concat([0],
       |      list_filter(
       |        CASE WHEN len(toks) >= 4 THEN
       |          list_filter(generate_series(4, len(toks)),
       |            i -> CAST(('0x' || substr(md5($gram), 1, 8)) AS BIGINT)
       |                   % 16 = 0)
       |        ELSE [] END,
       |        x -> x < len(toks))),
       |      [len(toks)]) AS bounds
       |  FROM tk WHERE len(toks) >= 1),
       |ch AS (
       |  SELECT doc_id, unnest(list_distinct($chunks)) AS h
       |  FROM bd),
       |srcx AS (SELECT doc_id AS src_id, h FROM ch
       |         WHERE doc_id < 200000 AND doc_id % 30 = 0),
       |copyx AS (SELECT doc_id - 200000 AS src_id, h FROM ch
       |          WHERE doc_id >= 200000),
       |ns AS (SELECT src_id, CAST(count(*) AS BIGINT) AS n_src_chunks
       |       FROM srcx GROUP BY src_id),
       |nc AS (SELECT src_id, CAST(count(*) AS BIGINT) AS n_copy_chunks
       |       FROM copyx GROUP BY src_id),
       |sh AS (SELECT s.src_id, CAST(count(*) AS BIGINT) AS n_shared
       |       FROM srcx s JOIN copyx c ON s.src_id = c.src_id AND s.h = c.h
       |       GROUP BY s.src_id)
       |SELECT ns.src_id, n_src_chunks, n_copy_chunks,
       |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared
       |FROM ns JOIN nc ON ns.src_id = nc.src_id
       |LEFT JOIN sh ON ns.src_id = sh.src_id
       |ORDER BY ns.src_id""".stripMargin
  }

  // ─── q251: asymmetric containment dedup (near-subset detection) ──────
  // The Jaccard family (q45/q47/q203) misses the FRAGMENT case: a doc
  // that is 90 % *contained* in a larger one (a quoted excerpt, a
  // syndicated article inside a longer page) scores a low Jaccard
  // because the union is host-sized. Broder's containment
  // C(A,B) = |S(A)∩S(B)| / |S(A)| is the asymmetric measure that
  // catches it. Fragments are planted deterministically (doc_id % 15 →
  // first ⌈n/2⌉ tokens under id + 700000), so every planted fragment's
  // shingle set is a strict subset of its host's.
  //
  // Scale shape: candidate pairs come from the shingle postings join,
  // after STOP-SHINGLE removal (df > MaxShingleDf postings dropped —
  // the PPJoin-style frequency cap that bounds the join fanout to
  // df² per surviving shingle; the standard lever against boilerplate
  // 3-grams that would otherwise pair everything with everything).
  // Containment is then computed ENTIRELY within the filtered universe
  // — |S(frag)| is the FILTERED shingle count, so a subset relation
  // survives the cap exactly (g ∈ frag ⇒ g ∈ host, and the cap drops g
  // from both or neither). Shuffles carry (md5, id, count) rows only;
  // the integer gate shared·10 ≥ 9·|S(frag)| avoids float fractions;
  // best host per fragment = one window over frag_id (shared DESC,
  // smaller host first). Pairs orient by FILTERED size a < b (equal
  // sizes are exact-dup territory, q41's).
  private val MaxShingleDf = 50

  def q251ContainmentDedup(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val frags = base.where(pmod(col("doc_id"), lit(15)) === 0)
      .select((col("doc_id") + 700000).as("doc_id"),
        expr("slice(toks, 1, (size(toks) + 1) div 2)").as("toks"))
    val corpus = base.unionByName(frags)
    // the posting list feeds four consumers (df cap, per-doc counts,
    // both sides of the containment self-join) — materialized once so
    // the tokenize+shingle+hash pipeline is not re-evaluated per branch
    val posts = corpus.select(col("doc_id"),
        explode(shingles(col("toks"))).as("shingle"))
      .select(col("doc_id"), md5(col("shingle")).as("g"))
      .localCheckpoint()
    val keepG = posts.groupBy(col("g"))
      .agg(count(lit(1)).as("dfg"))
      .where(col("dfg") <= MaxShingleDf)
      .select(col("g"))
    val p = posts.join(keepG, "g")
    val nshF = p.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    // both sides of the self-join read the same counted posting list
    val pn = p.join(nshF, "doc_id").localCheckpoint()
    val pairs = pn.as("a").join(pn.as("b"),
        col("a.g") === col("b.g") && col("a.nsh") < col("b.nsh"))
      .groupBy(col("a.doc_id").as("frag_id"), col("b.doc_id").as("host_id"),
               col("a.nsh").as("nsh_frag"), col("b.nsh").as("nsh_host"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") * 10 >= col("nsh_frag") * 9)
    val w = Window.partitionBy(col("frag_id"))
      .orderBy(col("shared").desc, col("nsh_host"), col("host_id"))
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("frag_id"), col("host_id"), col("shared"),
        col("nsh_frag"),
        expr("shared * 100 div nsh_frag").as("cont_pct"))
      .orderBy(col("frag_id"))
  }

  val q251Sql: String =
    s"""WITH base AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |frags AS (
       |  SELECT doc_id + 700000 AS doc_id,
       |    list_slice(toks, 1, (len(toks) + 1) // 2) AS toks
       |  FROM base WHERE doc_id % 15 = 0),
       |corpus AS (
       |  SELECT * FROM base UNION ALL SELECT * FROM frags),
       |posts AS (
       |  SELECT doc_id, md5(unnest(sh)) AS g FROM (
       |    SELECT doc_id, ${shinglesSql("toks").replace("\n", " ")} AS sh
       |    FROM corpus)),
       |keepg AS (
       |  SELECT g FROM posts GROUP BY g HAVING count(*) <= $MaxShingleDf),
       |p AS (SELECT posts.* FROM posts JOIN keepg USING (g)),
       |nshf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh
       |         FROM p GROUP BY doc_id),
       |pn AS (SELECT p.doc_id, p.g, n.nsh FROM p JOIN nshf n USING (doc_id)),
       |pairs AS (
       |  SELECT a.doc_id AS frag_id, b.doc_id AS host_id,
       |    a.nsh AS nsh_frag, b.nsh AS nsh_host,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM pn a JOIN pn b ON a.g = b.g AND a.nsh < b.nsh
       |  GROUP BY 1, 2, 3, 4
       |  HAVING count(*) * 10 >= a.nsh * 9),
       |best AS (
       |  SELECT frag_id, host_id, shared, nsh_frag,
       |    row_number() OVER (PARTITION BY frag_id
       |      ORDER BY shared DESC, nsh_host ASC, host_id ASC) AS rn
       |  FROM pairs)
       |SELECT frag_id, host_id, shared, nsh_frag,
       |  CAST(shared * 100 // nsh_frag AS BIGINT) AS cont_pct
       |FROM best WHERE rn = 1
       |ORDER BY frag_id""".stripMargin

  // ─── q254: winnowing fingerprint match census (Schleimer 2003) ───────
  // q48's mod-p sampling has no locality guarantee — two documents can
  // share a long run yet sample disjoint shingles. Winnowing (the MOSS
  // algorithm) fixes that: hash every k-gram (k=4), slide a w=4 window
  // over the hash sequence, keep each window's minimum — any shared run
  // of ≥ w+k−1 = 7 tokens is then GUARANTEED to share a fingerprint,
  // because the ≥ w windows fully inside the run are identical in both
  // documents and select identically. Planted pairs (doc_id % 18 → its
  // id+9 partner) share a 12-token run of per-pair-unique synthetic
  // tokens: 6 interior windows ⇒ ≥ ⌈6/w⌉ = 2 shared fingerprints, the
  // census threshold.
  //
  // Scale: selection is a PURE projection (in-row transform/slice/min —
  // no explode until the selected set, which winnowing bounds to ~2/(w+1)
  // of the k-grams); the match join is fingerprint-keyed postings with
  // the q251 stop-fingerprint df-cap bounding fanout; shuffles carry
  // (hash, id) pairs. The ≥ 2 shared threshold plus the cap keeps the
  // pair census noise-bounded on a small-vocabulary corpus.
  private val WinK = 4 // k-gram width (tokens)
  private val WinW = 4 // winnowing window (hashes)

  /** Winnowing selection: (doc_id, toks) → (doc_id, fps). Both
    * intermediate frames are CACHED — the q48/q84/q100 CollapseProject
    * trap: without the InMemoryRelation barrier the k-gram lambda
    * inlines the tokenizer into every slice() reference and the window
    * lambda inlines the WHOLE hash-array expression into every
    * array_min — O(n²) md5 evaluations per document (observed: sf0.1
    * ran minutes instead of seconds). Lifecycle: caller/harness
    * clearCache, as q45/q84/q203.
    */
  private def winnowSelect(toksFrame: DataFrame): DataFrame = {
    val hashes = toksFrame.cache().select(col("doc_id"),
      expr(s"transform(sequence(1, size(toks) - ${WinK - 1}), " +
        s"i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i, " +
        s"$WinK))), 1, 8), 16, 10) AS BIGINT))").as("hs")).cache()
    hashes.select(col("doc_id"),
      expr(s"array_distinct(transform(sequence(1, size(hs) - ${WinW - 1}), " +
        s"j -> array_min(slice(hs, j, $WinW))))").as("fps"))
  }

  /** Test hook: winnowing fingerprint sets for the given RAW (unplanted)
    * docs. */
  private[graft] def q254FingerprintsForTest(
      s: SparkSession, d: String, ids: Seq[Long]): Map[Long, Set[Long]] = {
    val toksF = documents(s, d)
      .where(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    winnowSelect(toksF).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  def q254WinnowingMatch(s: SparkSession, d: String): DataFrame = {
    val runTok = (i: Int) => concat(lit("run"), col("anchor"), lit("x" + i))
    val planted = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("anchor",
        when(pmod(col("doc_id"), lit(18)) === 0, col("doc_id"))
          .when(pmod(col("doc_id"), lit(9)) === 0, col("doc_id") - 9))
      .withColumn("toks",
        when(col("anchor").isNotNull,
          concat(col("toks"), array((0 until 12).map(runTok): _*)))
          .otherwise(col("toks")))
      .select(col("doc_id"), col("toks"))
    val sels = winnowSelect(planted)
    val posts = sels.select(col("doc_id"), explode(col("fps")).as("fp"))
    val keep = posts.groupBy(col("fp")).agg(count(lit(1)).as("dfp"))
      .where(col("dfp") <= MaxShingleDf).select(col("fp"))
    val p = posts.join(keep, "fp")
    p.as("a").join(p.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q254Sql: String = {
    val runList = (0 until 12)
      .map(i => s"'run' || CAST(anchor AS VARCHAR) || 'x$i'")
      .mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks,
       |    CASE WHEN doc_id % 18 = 0 THEN doc_id
       |         WHEN doc_id % 9 = 0 THEN doc_id - 9 END AS anchor
       |  FROM documents),
       |planted AS (
       |  SELECT doc_id,
       |    CASE WHEN anchor IS NOT NULL THEN toks || $runList
       |         ELSE toks END AS toks
       |  FROM base),
       |hashes AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, len(toks) - ${WinK - 1}),
       |      i -> CAST(('0x' || substr(md5(
       |             array_to_string(list_slice(toks, i, i + ${WinK - 1}),
       |               ' ')), 1, 8)) AS BIGINT)) AS hs
       |  FROM planted),
       |sels AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, len(hs) - ${WinW - 1}),
       |      j -> list_min(list_slice(hs, j, j + ${WinW - 1})))) AS fps
       |  FROM hashes),
       |posts AS (SELECT doc_id, unnest(fps) AS fp FROM sels),
       |keep AS (
       |  SELECT fp FROM posts GROUP BY fp
       |  HAVING count(*) <= $MaxShingleDf),
       |p AS (SELECT posts.* FROM posts JOIN keep USING (fp))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_winnowing_match" -> (q254WinnowingMatch _),
    "q251_containment_dedup" -> (q251ContainmentDedup _),
    "q229_cdc_chunk_dedup" -> (q229CdcChunkDedup _),
    "q205_substring_dedup"    -> (q205SubstringDedup _),
    "q204_split_leakage"      -> (q204SplitLeakage _),
    "q203_prefix_filter_join" -> (q203PrefixFilterJoin _),
    "q41_exact_dedup"    -> (q41ExactDedup _),
    "q42_token_stats"    -> (q42TokenStats _),
    "q43_doc_quality"    -> (q43DocQuality _),
    "q44_lang_id"        -> (q44LangId _),
    "q45_minhash_lsh"    -> (q45MinhashLsh _),
    "q245_detector_eval" -> (q245DetectorEval _),
    "q247_pmi_cooccurrence" -> (q247PmiCooccurrence _),
    "q261_textrank" -> (q261TextRank _),
    "q46_simhash"        -> (q46SimHash _),
    "q47_ngram_jaccard"  -> (q47NgramJaccard _),
    "q48_fingerprint"    -> (q48Fingerprint _),
    "q64_minhash_lsh_wide" -> (q64MinhashLshWide _),
    "q68_simhash_neardup" -> (q68SimhashNearDup _),
    "q69_repetition_quality" -> (q69RepetitionQuality _),
    "q70_clean_corpus" -> (q70CleanCorpus _),
    "q100_span_dedup" -> (q100SpanDedup _),
    "q101_bloom_span_dedup" -> (q101BloomSpanDedup _),
    "q103_cms_heavy_hitters" -> (q103CmsHeavyHitters _),
    "q105_incremental_dedup" -> (q105IncrementalDedup _),
  )

  val oracleSql: Map[String, String] = Map(
    "q254_winnowing_match" -> q254Sql,
    "q251_containment_dedup" -> q251Sql,
    "q229_cdc_chunk_dedup" -> q229Sql,
    "q205_substring_dedup"    -> q205Sql,
    "q204_split_leakage"      -> q204Sql,
    "q203_prefix_filter_join" -> q203Sql,
    "q41_exact_dedup"    -> q41Sql,
    "q42_token_stats"    -> q42Sql,
    "q43_doc_quality"    -> q43Sql,
    "q44_lang_id"        -> q44Sql,
    "q45_minhash_lsh"    -> q45Sql,
    "q245_detector_eval" -> q245Sql,
    "q247_pmi_cooccurrence" -> q247Sql,
    "q261_textrank" -> q261Sql,
    "q46_simhash"        -> q46Sql,
    "q47_ngram_jaccard"  -> q47Sql,
    "q48_fingerprint"    -> q48Sql,
    "q64_minhash_lsh_wide" -> q64Sql,
    "q68_simhash_neardup" -> q68Sql,
    "q69_repetition_quality" -> q69Sql,
    "q70_clean_corpus" -> q70Sql,
    "q100_span_dedup" -> q100Sql,
    "q101_bloom_span_dedup" -> q101Sql,
    "q103_cms_heavy_hitters" -> q103Sql,
    "q105_incremental_dedup" -> q105Sql,
  )
}
