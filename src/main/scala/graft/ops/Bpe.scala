package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization — the real form of the survey's
  * "token counting" north star (SURVEY §2.3; q42 is the whitespace/regex
  * census). Two halves, mirroring how production tokenizers split the
  * problem (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — public algorithm):
  *
  *  - ENCODE (q146): apply a FIXED merge table to every word. The merge
  *    contract is explicit and engine-checkable: merges are applied in
  *    rank order, one global left-to-right non-overlapping pass each.
  *    Spark side implements it as a fold over the word's symbol array
  *    (chained higher-order `aggregate` calls — codegen-planned
  *    projection, no UDF); the DuckDB oracle implements the SAME contract
  *    completely differently, as a delimiter-anchored `replace` chain
  *    over `,sym,,sym,…` strings. Identical output ⇒ the merge semantics
  *    match, not the implementation.
  *
  *  - LEARN (q147): train the merge table itself. The corpus is read
  *    ONCE to build the distinct-word frequency dict; all iteration then
  *    runs on that vocab-sized frame (Zipf: ~10⁵–10⁷ rows at 100 TB, vs
  *    10¹¹ corpus rows — this dict-compression is exactly how reference
  *    BPE trainers scale, and why the loop is cheap). Each round is one
  *    weighted adjacent-pair aggregation + a 1-row argmax `collect()`
  *    (bounded driver traffic: 8 rounds × 1 row — the merge decision IS
  *    the algorithm's sequential dependency; same justification as the
  *    connected-components fixpoint in ops/Graph.scala). Lineage is
  *    truncated per round with `localCheckpoint` like the CC loop.
  *
  * 100 TB notes: q146's explode(word) fans the corpus out map-side and
  * collapses to |langs| rows in the partial aggregate before the single
  * shuffle — no word-level shuffle exists. q147 shuffles the corpus once
  * (word frequency build, hash-keyed by word); every later shuffle is
  * vocab-sized.
  */
object Bpe {

  /** Same tokenizer family as TextSim (ASCII-only by construction, so
    * char-level symbol splitting is multi-byte-safe).
    */
  private[graft] def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  private[graft] val tokensSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Word → initial symbol array (single chars). The empty-string filter
    * makes the result independent of Java split's zero-width-match edge
    * behavior.
    */
  private[graft] def charSyms(word: Column): Column =
    filter(split(word, ""), x => x =!= "")

  /** One merge pass: left-to-right, non-overlapping. Fold the symbol
    * array; when the accumulator's last symbol is `l` and the incoming
    * one is `r`, pop-and-push the fused symbol. A fused symbol can never
    * re-trigger within its own pass (that would need l+r == l), which is
    * what makes this equal to the oracle's single `replace` scan.
    */
  private[graft] def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** The oracle's form of the same pass: symbols ride as `,a,,b,,c,` —
    * joined by a DOUBLE comma, wrapped in single commas. Every symbol is
    * delimited on BOTH sides, so the pattern `,lhs,,rhs,` can only match
    * whole symbols (with the old `,a,b,c` form, a dict symbol that
    * merely STARTED with rhs — e.g. rhs=`e` inside `er` — falsely fused
    * and split its tail). The trailing comma of a match is only ever the
    * FIRST half of the next `,,` separator (or the final wrap comma), so
    * the remaining input still opens with `,sym,,…` and adjacent runs
    * like `a a a a` keep left-to-right non-overlap parity with the
    * engine's fold — the property a fully-consumed shared delimiter
    * would break.
    */
  private def mergeSqlPass(inner: String, l: String, r: String): String =
    s"replace($inner, ',$l,,$r,', ',$l$r,')"

  /** Word → the oracle's double-comma symbol string: `abc` → `,a,,b,,c,`. */
  private def charSymsSql(wordExpr: String): String =
    s"',' || substr(regexp_replace($wordExpr, '(.)', ',,\\1', 'g'), 2) || ','"

  /** Symbol string → DuckDB list of symbols: `,a,,bc,` → [a, bc]. */
  private def symsArrSql(sExpr: String): String =
    s"str_split(trim($sExpr, ','), ',,')"

  /** Weighted token count off the carrier: commas = 2 × symbols. */
  private def nTokensSql(sExpr: String): String =
    s"((length($sExpr) - length(replace($sExpr, ',', ''))) // 2)"

  // ─── q146: encode with a fixed merge table ────────────────────────────

  /** Rank-ordered merge table; later merges compose earlier outputs
    * (e.g. `in`+`g` needs rank-3's `i`+`n`), so rank order is semantic.
    */
  private[graft] val fixedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "s" -> "t",
    "a" -> "t", "e" -> "n", "o" -> "u", "i" -> "s", "i" -> "t",
    "in" -> "g")

  /** HOF-fold form of the encode chain — the semantic reference. Used by
    * BpeSpec to pin the native kernel bit-for-bit; too slow for the hot
    * path (16 interpreted lambda passes per word).
    */
  private[graft] def encodeWith(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) { case (s, (l, r)) => mergePass(s, l, r) }

  /** Production encode: the native one-call kernel (expr/BpeEncode.scala,
    * codegen StaticInvoke — 16 merges in one in-place scan per word).
    */
  private[graft] def encodeWord(word: Column): Column =
    graft.expr.BpeFunctions.bpe_encode(word, fixedMerges)

  private def encodeSqlChain(inner: String): String =
    fixedMerges.foldLeft(inner) { case (s, (l, r)) => mergeSqlPass(s, l, r) }

  /** Per-language BPE census: word count, char count, post-merge token
    * count, plus a constant probe word encoded through the full chain
    * (both engines encode it independently — a direct per-word parity
    * witness alongside the corpus-level sums).
    *
    * The merge chain runs on the per-lang VOCAB DICT, not on every word
    * occurrence: group to (lang, word, cnt) first, encode each distinct
    * word once, weight the sums by cnt. Zipf makes the dict orders of
    * magnitude smaller than the corpus (~7× even at sf0.1; far more at
    * 100 TB), and the dict build's shuffle is collapsed map-side by
    * partial aggregation — the same compression q147's trainer rides.
    */
  def q146BpeEncode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        (col("cnt") * length(col("word"))).as("wc"),
        (col("cnt") * size(encodeWord(col("word")))).as("tc"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("wc")).cast("long").as("n_chars"),
        sum(col("tc")).cast("long").as("n_tokens"))
      .withColumn("probe", array_join(encodeWord(lit("interesting")), " "))
      .orderBy(col("lang"))

  private val q146Sql: String = {
    val probeInner = charSymsSql("'interesting'")
    s"""WITH vocab AS (
       |  SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT lang, unnest($tokensSql) AS word FROM documents)
       |  GROUP BY 1, 2
       |), enc AS (
       |  SELECT lang, cnt, cnt * length(word) AS wc,
       |         ${encodeSqlChain(charSymsSql("word"))} AS s
       |  FROM vocab
       |)
       |SELECT lang,
       |  CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(wc) AS BIGINT) AS n_chars,
       |  CAST(sum(cnt * ${nTokensSql("s")}) AS BIGINT) AS n_tokens,
       |  replace(trim(${encodeSqlChain(probeInner)}, ','), ',,', ' ') AS probe
       |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ─── q147: learn the merge table (BPE training) ───────────────────────

  private val LearnRounds = 8

  /** Train `LearnRounds` merges: per round, the (weighted) most frequent
    * adjacent symbol pair across the vocab dict wins; ties break
    * lexicographically on (lhs, rhs) so both engines agree exactly.
    * Returns the learned table — rank, pair, and its weighted count at
    * the moment it was chosen.
    */
  def q147BpeLearn(s: SparkSession, d: String): DataFrame = {
    val pairStructT = "array<struct<lhs:string,rhs:string>>"
    var cur = documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), charSyms(col("word")).as("syms"))
      .localCheckpoint()

    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to LearnRounds) {
      // sequence(1, n) counts DOWN for n < 1 — guard single-symbol words.
      val top = cur
        .select(col("cnt"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("lhs"),
                element_at(col("syms"), i + 1).as("rhs"))))
            .otherwise(array().cast(pairStructT))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty, s"BPE learn round $round: no adjacent pairs left")
      val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      learned += ((round, l, r, n))
      cur = cur.withColumn("syms", mergePass(col("syms"), l, r)).localCheckpoint()
    }
    val spark = s; import spark.implicits._
    learned.result().toDF("merge_rank", "lhs", "rhs", "n")
  }

  /** The oracle unrolls the same 8 rounds as chained CTE stages: wK holds
    * the vocab dict's symbol strings after K merges, mK the round-K
    * argmax. Pair extraction uses struct unnest instead of the engine's
    * transform+explode; merge application uses the replace form. Every
    * stage is MATERIALIZED — each wK is referenced twice (pK+1 and wK+1),
    * so inlining would expand w8 into 2^8 parquet scans.
    */
  private val q147Sql: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ${charSymsSql("word")} AS s,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
         |  GROUP BY 1)""".stripMargin
    val stages = (1 to LearnRounds).map { k =>
      s"""p$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM w${k - 1})),
         |m$k AS MATERIALIZED (
         |  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS n FROM p$k
         |  GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM m$k) || ',,' || (SELECT rhs FROM m$k) || ',',
         |      ',' || (SELECT lhs FROM m$k) || (SELECT rhs FROM m$k) || ',') AS s, cnt
         |  FROM w${k - 1})""".stripMargin
    }
    val union = (1 to LearnRounds)
      .map(k => s"SELECT $k AS merge_rank, lhs, rhs, n FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH $w0,
       |${stages.mkString(",\n")}
       |SELECT * FROM (
       |$union
       |) ORDER BY merge_rank""".stripMargin
  }

  // ─── q224: learned-tokenizer fertility census ─────────────────────────
  // The step after training a tokenizer: measure what it DOES to the
  // corpus — per-language fertility (tokens emitted per word), the
  // metric multilingual pipelines gate vocab size and language mix on
  // (a language the vocab under-serves shows inflated tokens/word and
  // eats training budget). q146 measures this for a FIXED merge table;
  // here the table is the q147-LEARNED one, so the result is
  // data-dependent end to end: train (8 argmax rounds on the vocab
  // dict) → encode the per-lang dict through the learned table (the
  // native kernel, arbitrary merge list) → exact integer census.
  // The oracle re-trains independently (q147's unrolled stages, with
  // lang carried through — pair weights sum identically, so the argmax
  // sequence is the same) and reads its fertility off w8's strings.
  //
  // Scale: one corpus-shuffle to the (lang, word) dict; 8 trainer
  // rounds on the dict (q147's shape and bounds); the census is one
  // map-side-combined aggregate. Fertility stays exact-integer
  // (n_tokens, n_words) — the ratio is the consumer's division.
  def q224LearnedFertility(s: SparkSession, d: String): DataFrame = {
    val learned = q147BpeLearn(s, d)
      .orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val enc = graft.expr.BpeFunctions.bpe_encode(col("word"), learned)
    documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        (col("cnt") * length(col("word"))).as("wc"),
        (col("cnt") * size(enc)).as("tc"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("wc")).cast("long").as("n_chars"),
        sum(col("tc")).cast("long").as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** q147's unrolled trainer with `lang` carried through the stages: the
    * per-(lang, word) dict's pair weights sum to the same global counts,
    * so every round's argmax (and tie-break) matches the engine's; w8's
    * comma-counts then ARE the learned-vocab token counts per dict row.
    */
  private val q224Sql: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT lang, ${charSymsSql("word")} AS s,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT lang, unnest($tokensSql) AS word FROM documents)
         |  GROUP BY 1, 2)""".stripMargin
    val stages = (1 to LearnRounds).map { k =>
      s"""p$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM w${k - 1})),
         |m$k AS MATERIALIZED (
         |  SELECT lhs, rhs FROM p$k
         |  GROUP BY 1, 2 ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT lang,
         |    replace(s,
         |      ',' || (SELECT lhs FROM m$k) || ',,' || (SELECT rhs FROM m$k) || ',',
         |      ',' || (SELECT lhs FROM m$k) || (SELECT rhs FROM m$k) || ',') AS s, cnt
         |  FROM w${k - 1})""".stripMargin
    }
    s"""WITH $w0,
       |${stages.mkString(",\n")}
       |SELECT lang,
       |  CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt * (length(replace(s, ',', '')))) AS BIGINT) AS n_chars,
       |  CAST(sum(cnt * ${nTokensSql("s")}) AS BIGINT)
       |    AS n_tokens
       |FROM w$LearnRounds GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ─── q307: vocab-size compression curve ───────────────────────────────
  // The "how big should the vocabulary be" read: apply the LEARNED merge
  // table (q147) at PREFIX lengths K = 0/2/4/8 and price each vocabulary
  // by its corpus token count — the compression-vs-vocab-size curve
  // every tokenizer design doc opens with (diminishing returns per added
  // merge; the knee picks the vocab). K = 0 is the character baseline
  // (tokens ≡ chars); each K is one projection of the SAME word dict
  // through the native encode kernel with the truncated merge list —
  // greedy sequential application, so dict-at-K ≡ the trainer's own
  // round-K state, which is exactly what the oracle reads off its wK
  // stages. saved_bp = basis points of characters eliminated, an exact
  // integer cross-multiplication.
  //
  // Scale: trainer as q147 (dict-sized rounds); the curve is 4
  // projections of the checkpointed dict, one tiny union.
  private val CurveKs = Seq(0, 2, 4, 8)

  def q307VocabCurve(s: SparkSession, d: String): DataFrame = {
    val learned = q147BpeLearn(s, d)
      .orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val dict = documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val rows = CurveKs.map { k =>
      val toks =
        if (k == 0) length(col("word")).cast("long")
        else size(graft.expr.BpeFunctions.bpe_encode(col("word"),
          learned.take(k))).cast("long")
      dict.agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * length(col("word"))).as("n_chars"),
          sum(col("cnt") * toks).as("n_tokens"))
        .select(lit(k.toLong).as("vocab_merges"), col("n_words"),
          col("n_chars"), col("n_tokens"),
          expr("(10000 * (n_chars - n_tokens)) div n_chars")
            .as("saved_bp"))
    }
    rows.reduce(_ unionAll _).orderBy(col("vocab_merges"))
  }

  private val q307Sql: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ${charSymsSql("word")} AS s,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
         |  GROUP BY 1)""".stripMargin
    val stages = (1 to LearnRounds).map { k =>
      s"""p$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM w${k - 1})),
         |m$k AS MATERIALIZED (
         |  SELECT lhs, rhs FROM p$k
         |  GROUP BY 1, 2 ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM m$k) || ',,' || (SELECT rhs FROM m$k) || ',',
         |      ',' || (SELECT lhs FROM m$k) || (SELECT rhs FROM m$k) || ',') AS s, cnt
         |  FROM w${k - 1})""".stripMargin
    }
    val union = CurveKs.map { k =>
      s"""SELECT $k AS vocab_merges,
         |  CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(cnt * length(replace(s, ',', ''))) AS BIGINT)
         |    AS n_chars,
         |  CAST(sum(cnt * ${nTokensSql("s")})
         |    AS BIGINT) AS n_tokens
         |FROM w$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $w0,
       |${stages.mkString(",\n")}
       |SELECT vocab_merges, n_words, n_chars, n_tokens,
       |  (10000 * (n_chars - n_tokens)) // n_chars AS saved_bp
       |FROM ($union)
       |ORDER BY vocab_merges""".stripMargin
  }

  // ─── q332: WordPiece trainer (likelihood-scored merges) ──────────────
  // The third production tokenizer family beside BPE (q147) and
  // unigram-LM (q327): WordPiece (Schuster & Nakajima 2012; BERT's
  // tokenizer — public algorithm). Two deltas from BPE, both visible in
  // the learned table and therefore oracle-pinned:
  //  - SYMBOLS mark word position: the first character is bare, every
  //    continuation is `##`-prefixed, and a fusion keeps its lhs's
  //    prefix (`##t`+`##h` → `##th`, `t`+`##h` → `th`) — so the vocab
  //    distinguishes "the"-initial from "-the-"-medial, the property
  //    WordPiece exists for.
  //  - The merge SCORE is the likelihood ratio n(ab) / (n(a)·n(b)), not
  //    raw frequency: a pair wins by being SURPRISINGLY frequent given
  //    its parts. Counts are exact BIGINTs; the score division is one
  //    IEEE double op, bit-identical across engines; ties break on
  //    (lhs, rhs) so the argmax is deterministic.
  // Training loop is q147's dict discipline exactly: corpus read ONCE
  // into the distinct-word frequency dict, every round is vocab-sized
  // (one adjacent-pair agg + one symbol-count agg + a 1-row argmax
  // collect), lineage truncated per round. The census carries each
  // round's n_pair/c_lhs/c_rhs (exact) + floor(score·1e6) + the final
  // weighted symbol total (conservation: merges only ever reduce it).
  private val WpRounds = 6

  /** Initial WordPiece symbols: first char bare, continuations `##`-ed. */
  private[graft] def wpSyms(word: Column): Column =
    transform(charSyms(word),
      (c, i) => when(i === 0, c).otherwise(concat(lit("##"), c)))

  /** [[mergePass]] with an explicit fused symbol (WordPiece fusion drops
    * the rhs's `##`). Fused ≠ lhs always (rhs is nonempty), so a fusion
    * can never re-trigger within its own pass.
    */
  private[graft] def wpMergePass(syms: Column, l: String, r: String,
                                 fused: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
          .otherwise(concat(acc, array(x))))

  def q332WordpieceLearn(s: SparkSession, d: String): DataFrame = {
    val pairStructT = "array<struct<lhs:string,rhs:string>>"
    var cur = documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), wpSyms(col("word")).as("syms"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long, Long, Long, Long)]
    for (round <- 1 to WpRounds) {
      val pairs = cur
        .select(col("cnt"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("lhs"),
                element_at(col("syms"), i + 1).as("rhs"))))
            .otherwise(array().cast(pairStructT))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("n"))
      val symc = cur.select(col("cnt"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
      val top = pairs
        .join(symc.select(col("sym").as("lhs"), col("c").as("c_lhs")), "lhs")
        .join(symc.select(col("sym").as("rhs"), col("c").as("c_rhs")), "rhs")
        .withColumn("score",
          col("n") / (col("c_lhs").cast("double") * col("c_rhs")))
        .orderBy(col("score").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty, s"WordPiece round $round: no adjacent pairs left")
      val row = top(0)
      val (l, r) = (row.getAs[String]("lhs"), row.getAs[String]("rhs"))
      val fused = l + r.stripPrefix("##")
      learned += ((round, l, r, row.getAs[Long]("n"),
        row.getAs[Long]("c_lhs"), row.getAs[Long]("c_rhs"),
        math.floor(row.getAs[Double]("score") * 1e6).toLong))
      cur = cur.withColumn("syms", wpMergePass(col("syms"), l, r, fused))
        .localCheckpoint()
    }
    val symsFinal = cur
      .agg(sum(col("cnt") * size(col("syms")))).head().getLong(0)
    val spark = s; import spark.implicits._
    learned.result()
      .toDF("merge_rank", "lhs", "rhs", "n_pair", "c_lhs", "c_rhs",
            "score_e6")
      .withColumn("syms_final", lit(symsFinal))
      .orderBy(col("merge_rank"))
  }

  /** Unrolled WordPiece rounds: wK = dict symbol strings after K merges
    * (double-comma `,sym,,sym,` form — see [[mergeSqlPass]]; symbols
    * never contain a comma, `#` is safe), cK = weighted symbol counts,
    * mK = the likelihood-ratio argmax.
    */
  private val q332Sql: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ',' || substr(word, 1, 1) ||
         |    regexp_replace(substr(word, 2), '(.)', ',,##\\1', 'g') || ',' AS s,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
         |  GROUP BY 1)""".stripMargin
    val stages = (1 to WpRounds).map { k =>
      s"""a$k AS (SELECT ${symsArrSql("s")} AS arr, cnt
         |        FROM w${k - 1}),
         |p$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM a$k),
         |c$k AS MATERIALIZED (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT unnest(arr) AS sym, cnt FROM a$k)
         |  GROUP BY sym),
         |m$k AS MATERIALIZED (
         |  SELECT p.lhs, p.rhs, p.n, cl.c AS c_lhs, cr.c AS c_rhs,
         |    p.n / (CAST(cl.c AS DOUBLE) * cr.c) AS score
         |  FROM (SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS n
         |        FROM p$k GROUP BY 1, 2) p
         |  JOIN c$k cl ON p.lhs = cl.sym
         |  JOIN c$k cr ON p.rhs = cr.sym
         |  ORDER BY score DESC, p.lhs, p.rhs LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM m$k) || ',,' || (SELECT rhs FROM m$k) || ',',
         |      ',' || (SELECT lhs FROM m$k) ||
         |        (SELECT CASE WHEN rhs LIKE '##%' THEN substr(rhs, 3)
         |                     ELSE rhs END FROM m$k) || ',') AS s, cnt
         |  FROM w${k - 1})""".stripMargin
    }
    val union = (1 to WpRounds)
      .map(k => s"""SELECT $k AS merge_rank, lhs, rhs, n AS n_pair,
                   |  c_lhs, c_rhs,
                   |  CAST(floor(score * 1000000) AS BIGINT) AS score_e6
                   |FROM m$k""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH $w0,
       |${stages.mkString(",\n")},
       |fin AS (
       |  SELECT CAST(sum(cnt * ${nTokensSql("s")})
       |    AS BIGINT) AS syms_final
       |  FROM w$WpRounds)
       |SELECT u.*, fin.syms_final FROM (
       |$union
       |) u CROSS JOIN fin
       |ORDER BY merge_rank""".stripMargin
  }

  // ─── q335: byte-level BPE with byte fallback (GPT-2 shape) ────────────
  // The production pretraining default (Radford et al. 2019 — public
  // algorithm): the base alphabet is the 256 UTF-8 BYTES, not
  // characters, so EVERY string tokenizes with no unknown token by
  // construction — byte fallback is structural, and decoding is exact
  // byte concatenation (the lossless round-trip theorem, emitted as
  // oracle data on a multi-script probe). Symbols ride as 2-hex-digit
  // byte strings ('74', 'c3', …) — merges concatenate hex, so the whole
  // q147 dict/argmax/mergePass machinery and the double-comma oracle
  // carrier apply verbatim; a learned token IS its byte sequence, read
  // straight off the symbol.
  //
  // The census sets byte-BPE fertility NEXT TO char-BPE's at the same
  // merge budget (both trainers run on the same word dict — the q224
  // comparison the verdict asked for): on an ASCII-heavy corpus the two
  // converge, on multi-byte text bytes pay more merges for the same
  // fertility — the known byte-level cost, here as data. The probe
  // ('héllo wörld — 你好!') exercises 2- and 3-byte UTF-8: its learned
  // encoding and its decoded round-trip are both oracle-pinned.
  //
  // Scale: q147's exactly — one corpus shuffle to the dict, vocab-sized
  // rounds (byte dicts are ≤4× char dicts in symbol count, same Zipf
  // compression), 1-row argmax collects.
  private val ByteRounds = 8
  private[graft] val byteProbe = "héllo wörld — 你好!"

  /** String → array of 2-hex-digit byte symbols ('abc' → [61, 62, 63]).
    * `hex` of the UTF-8 bytes, split into pairs — uppercase on both
    * engines.
    */
  private[graft] def byteSyms(sc: Column): Column = {
    val h = hex(encode(sc, "UTF-8"))
    transform(sequence(lit(1), (length(h) / 2).cast("int")),
      i => h.substr(i * 2 - 1, lit(2)))
  }

  /** The byte-level trainer: (word dict, final dict symbol state,
    * learned merges) — shared by q335's census and q338's
    * native-encode consumer (both RETRAIN, the q224/q307 discipline).
    */
  private def byteBpeTrain(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Seq[(Int, String, String, Long)]) = {
    val pairStructT = "array<struct<lhs:string,rhs:string>>"
    val dict = documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    var cur = dict
      .select(col("cnt"), byteSyms(col("word")).as("syms"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to ByteRounds) {
      val top = cur
        .select(col("cnt"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("lhs"),
                element_at(col("syms"), i + 1).as("rhs"))))
            .otherwise(array().cast(pairStructT))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty, s"byte-BPE round $round: no pairs left")
      val (l, r, n) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      learned += ((round, l, r, n))
      cur = cur.withColumn("syms", mergePass(col("syms"), l, r))
        .localCheckpoint()
    }
    (dict, cur, learned.result())
  }

  def q335ByteBpeLearn(s: SparkSession, d: String): DataFrame = {
    val (dict, cur, learnedRows) = byteBpeTrain(s, d)
    val learnedPairs = learnedRows.map { case (_, l, r, _) => (l, r) }
    // byte census on the final dict state + the byte count off the dict
    val byteRow = cur
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("cnt") * size(col("syms"))).cast("long").as("n_toks_byte"))
      .head()
    val nBytes = dict
      .agg(sum(col("cnt") * octet_length(col("word"))).cast("long"))
      .head().getLong(0)
    // char-BPE fertility at the same merge budget, on the SAME dict
    val charLearned = q147BpeLearn(s, d)
      .orderBy(col("merge_rank")).select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val nToksChar = dict
      .agg(sum(col("cnt") * size(graft.expr.BpeFunctions
        .bpe_encode(col("word"), charLearned))).cast("long"))
      .head().getLong(0)
    // multi-script probe through the LEARNED byte merges: encoding +
    // exact byte-concatenation decode (lossless by construction). The
    // HOF fold here, the NATIVE kernel in q338 — the shared oracle
    // expression pins fold ≡ kernel on the same learned table.
    val probeSyms = learnedPairs.foldLeft(byteSyms(lit(byteProbe))) {
      case (sy, (l, r)) => mergePass(sy, l, r) }
    val probeRow = s.range(1)
      .select(array_join(probeSyms, " ").as("enc"),
        decode(unhex(concat_ws("", probeSyms)), "UTF-8").as("rt"))
      .head()
    val spark = s; import spark.implicits._
    learnedRows.toDF("merge_rank", "lhs", "rhs", "n_pair")
      .withColumn("n_words", lit(byteRow.getLong(0)))
      .withColumn("n_bytes", lit(nBytes))
      .withColumn("n_toks_byte", lit(byteRow.getLong(1)))
      .withColumn("n_toks_char", lit(nToksChar))
      .withColumn("probe_enc", lit(probeRow.getString(0)))
      .withColumn("probe_rt", lit(probeRow.getString(1)))
      .orderBy(col("merge_rank"))
  }

  /** Byte symbol string for the oracle: hex pairs in the double-comma
    * carrier ('abc' → `,61,,62,,63,`). DuckDB `hex` is byte hex of the
    * UTF-8 string, uppercase like Spark's.
    */
  private def byteSymsSql(wordExpr: String): String =
    s"',' || substr(regexp_replace(hex($wordExpr), '(..)', ',,\\1', 'g')" +
      ", 2) || ','"

  private val q335Sql: String = {
    val bStages = (1 to ByteRounds).map { k =>
      s"""bp$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM bw${k - 1})),
         |bm$k AS MATERIALIZED (
         |  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS n FROM bp$k
         |  GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 1),
         |bw$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM bm$k) || ',,' ||
         |        (SELECT rhs FROM bm$k) || ',',
         |      ',' || (SELECT lhs FROM bm$k) ||
         |        (SELECT rhs FROM bm$k) || ',') AS s, cnt
         |  FROM bw${k - 1})""".stripMargin
    }.mkString(",\n")
    val cStages = (1 to ByteRounds).map { k =>
      s"""cp$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM cw${k - 1})),
         |cm$k AS MATERIALIZED (
         |  SELECT lhs, rhs FROM cp$k
         |  GROUP BY 1, 2 ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
         |cw$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM cm$k) || ',,' ||
         |        (SELECT rhs FROM cm$k) || ',',
         |      ',' || (SELECT lhs FROM cm$k) ||
         |        (SELECT rhs FROM cm$k) || ',') AS s, cnt
         |  FROM cw${k - 1})""".stripMargin
    }.mkString(",\n")
    val probeChain = (1 to ByteRounds).foldLeft(
      byteSymsSql(s"'$byteProbe'")) { (sql, k) =>
      s"""replace($sql,
         |  ',' || (SELECT lhs FROM bm$k) || ',,' ||
         |    (SELECT rhs FROM bm$k) || ',',
         |  ',' || (SELECT lhs FROM bm$k) ||
         |    (SELECT rhs FROM bm$k) || ',')""".stripMargin
    }
    s"""WITH wd AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
       |  GROUP BY 1),
       |bw0 AS MATERIALIZED (
       |  SELECT ${byteSymsSql("word")} AS s, cnt FROM wd),
       |cw0 AS MATERIALIZED (
       |  SELECT ${charSymsSql("word")} AS s, cnt FROM wd),
       |$bStages,
       |$cStages,
       |tot AS (
       |  SELECT
       |    (SELECT CAST(sum(cnt) AS BIGINT) FROM wd) AS n_words,
       |    (SELECT CAST(sum(cnt * strlen(word)) AS BIGINT) FROM wd)
       |      AS n_bytes,
       |    (SELECT CAST(sum(cnt * ${nTokensSql("s")}) AS BIGINT)
       |     FROM bw$ByteRounds) AS n_toks_byte,
       |    (SELECT CAST(sum(cnt * ${nTokensSql("s")}) AS BIGINT)
       |     FROM cw$ByteRounds) AS n_toks_char,
       |    replace(trim(pr.s, ','), ',,', ' ') AS probe_enc,
       |    decode(from_hex(replace(pr.s, ',', ''))) AS probe_rt
       |  FROM (SELECT $probeChain AS s) pr)
       |SELECT u.merge_rank, u.lhs, u.rhs, u.n_pair,
       |  t.n_words, t.n_bytes, t.n_toks_byte, t.n_toks_char,
       |  t.probe_enc, t.probe_rt
       |FROM (
       |${(1 to ByteRounds).map(k =>
            s"  SELECT $k AS merge_rank, lhs, rhs, n AS n_pair FROM bm$k")
           .mkString("\n  UNION ALL\n")}
       |) u CROSS JOIN tot t
       |ORDER BY u.merge_rank""".stripMargin
  }

  // ─── q338: byte-level fertility census via the NATIVE byte kernel ────
  // The encode half of the GPT-2 shape (q335 trains, this consumes):
  // the corpus-wide per-language fertility of the LEARNED byte vocab,
  // encoded by native kernel #14 (`bpe_encode_bytes` — the char
  // kernel's in-place merge scan over 2-hex-digit byte symbols, one
  // StaticInvoke per word, WholeStageCodegen intact). This is q224's
  // census for the byte family: the q338/q335 pair also cross-pins the
  // kernel against the HOF fold — q335's probe encodes through the
  // fold, q338's through the kernel, and BOTH hash against the same
  // oracle expression on the same learned table.
  // Scale: q224's exactly — one corpus shuffle to the (lang, word)
  // dict, trainer rounds vocab-sized, census one map-side-combined
  // aggregate; the kernel does no per-element lambda dispatch.
  def q338ByteFertility(s: SparkSession, d: String): DataFrame = {
    val (_, _, learnedRows) = byteBpeTrain(s, d)
    val pairs = learnedRows.map { case (_, l, r, _) => (l, r) }
    val enc = graft.expr.BpeFunctions.bpe_encode_bytes(col("word"), pairs)
    documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        (col("cnt") * octet_length(col("word"))).as("bc"),
        (col("cnt") * size(enc)).as("tc"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("bc")).cast("long").as("n_bytes"),
        sum(col("tc")).cast("long").as("n_toks"))
      .withColumn("probe", array_join(graft.expr.BpeFunctions
        .bpe_encode_bytes(lit(byteProbe), pairs), " "))
      .orderBy(col("lang"))
  }

  /** The byte trainer unrolled with `lang` carried (the q224Sql
    * discipline — per-(lang, word) pair weights sum to the same global
    * counts, so the argmax sequence matches); fertility reads off the
    * final carrier strings, the probe off its own replace chain.
    */
  private val q338Sql: String = {
    val stages = (1 to ByteRounds).map { k =>
      s"""zp$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT ${symsArrSql("s")} AS arr, cnt FROM zw${k - 1})),
         |zm$k AS MATERIALIZED (
         |  SELECT lhs, rhs FROM zp$k
         |  GROUP BY 1, 2 ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
         |zw$k AS MATERIALIZED (
         |  SELECT lang, replace(s,
         |      ',' || (SELECT lhs FROM zm$k) || ',,' ||
         |        (SELECT rhs FROM zm$k) || ',',
         |      ',' || (SELECT lhs FROM zm$k) ||
         |        (SELECT rhs FROM zm$k) || ',') AS s, cnt
         |  FROM zw${k - 1})""".stripMargin
    }.mkString(",\n")
    val probeChain = (1 to ByteRounds).foldLeft(
      byteSymsSql(s"'$byteProbe'")) { (sql, k) =>
      s"""replace($sql,
         |  ',' || (SELECT lhs FROM zm$k) || ',,' ||
         |    (SELECT rhs FROM zm$k) || ',',
         |  ',' || (SELECT lhs FROM zm$k) ||
         |    (SELECT rhs FROM zm$k) || ',')""".stripMargin
    }
    s"""WITH zw0 AS MATERIALIZED (
       |  SELECT lang, ${byteSymsSql("word")} AS s,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT lang, unnest($tokensSql) AS word FROM documents)
       |  GROUP BY 1, 2),
       |$stages
       |SELECT lang,
       |  CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt * (length(replace(s, ',', '')) // 2)) AS BIGINT)
       |    AS n_bytes,
       |  CAST(sum(cnt * ${nTokensSql("s")}) AS BIGINT) AS n_toks,
       |  replace(trim($probeChain, ','), ',,', ' ') AS probe
       |FROM zw$ByteRounds GROUP BY lang ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q338_byte_fertility" -> (q338ByteFertility _),
    "q335_byte_bpe_learn" -> (q335ByteBpeLearn _),
    "q332_wordpiece_learn" -> (q332WordpieceLearn _),
    "q146_bpe_encode" -> (q146BpeEncode _),
    "q147_bpe_learn" -> (q147BpeLearn _),
    "q224_learned_fertility" -> (q224LearnedFertility _),
    "q307_vocab_curve" -> (q307VocabCurve _))

  val oracleSql: Map[String, String] = Map(
    "q338_byte_fertility" -> q338Sql,
    "q335_byte_bpe_learn" -> q335Sql,
    "q332_wordpiece_learn" -> q332Sql,
    "q146_bpe_encode" -> q146Sql,
    "q147_bpe_learn" -> q147Sql,
    "q224_learned_fertility" -> q224Sql,
    "q307_vocab_curve" -> q307Sql)
}
