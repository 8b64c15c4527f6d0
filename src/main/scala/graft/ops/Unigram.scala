package graft.ops

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece unigram
  * model), the second production tokenizer family next to BPE
  * (ops/Bpe.scala). Where BPE GROWS a vocabulary bottom-up by merging
  * the most frequent pair, unigram starts from an over-complete seed
  * (all substrings ≤ 4 chars, top-[[SeedKeep]] by corpus weight plus
  * every single character, which is never pruned) and SHRINKS it by EM:
  *
  *   E-step — Viterbi-best segmentation of every dict word under the
  *     current vocabulary, as ONE projection through the native
  *     [[graft.expr.UnigramEncodeExpr]] kernel (expression #13,
  *     codegen'd; the vocab rides as literal arrays, driver-bounded at
  *     ≤ ~130 entries — the q147 argmax-collect discipline);
  *   M-step — piece usage re-aggregated from the best paths (one
  *     map-side-combined count), then the vocabulary re-cut to the
  *     top-[[VocabKeep]] multi-char pieces by (usage, piece), chars kept
  *     unconditionally as the fallback alphabet.
  *
  * Scoring is the integer surrogate objective documented on the kernel
  * (minimize pieces·10¹² − Σ piece-count, lex tie-break): order-exact
  * across engines where float log-probs are not. The DuckDB twin
  * unrolls every E-pass as [[MaxWord]] chained dp stages with the same
  * (score, path) window cut and re-derives seed, usage, prune, and the
  * final census relationally — the oracle hash pins the ENTIRE trained
  * vocabulary plus both tokenizers' corpus token counts.
  *
  * The census carries the q224-style comparison AS DATA: the same
  * (length-capped) word dict encoded by the trained unigram vocab and
  * by an 8-round BPE table trained on the identical dict — the
  * fertility trade a tokenizer design doc opens with.
  *
  * At 100 TB: one corpus shuffle to the word dict; the seed table is
  * bounded by corpus character diversity (a dimension, not a fact — the
  * q38 argument for its ranking window); E-steps are projections
  * (kernel, whole-stage codegen) + map-side-combined usage counts; only
  * vocab-sized frames are ever collected or windowed globally.
  */
object Unigram {

  private val MaxWord = 16
  private val MaxPiece = 4
  private val SeedKeep = 96
  private val VocabKeep = 64
  private val BpeRounds = 8
  private val Big = 1000000000000L

  /** (length-capped) word dict: the training corpus for both tokenizer
    * families. Words longer than [[MaxWord]] are excluded so the
    * oracle's dp unroll is a fixed 16 stages (documented cap — a
    * production run raises it with the unroll). */
  private def wordDict(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(Bpe.tokens(col("text"))).as("word"))
      .where(length(col("word")) <= MaxWord)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** All substrings of length 1..[[MaxPiece]] of the dict words, corpus
    * weighted — the over-complete seed candidates. */
  private def seedPieces(wd: DataFrame): DataFrame =
    wd.select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
        s"transform(sequence(1, least($MaxPiece, length(word) - i + 1)), " +
        "l -> substring(word, i, l))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("w"))

  /** Chars unconditionally + top-`keep` multi-char pieces by
    * (weight desc, piece asc). r15 (guide §2.5): the top-keep cut was a
    * global row_number window — a single-partition sort of the whole
    * candidate dimension, which grows with the corpus vocabulary — and
    * is now orderBy+limit: TakeOrderedAndProject keeps a k-row heap per
    * partition and merges, no global sort. (w, piece) is a total order
    * on the grouped candidates, so the kept SET is identical. */
  private def cutVocab(cands: DataFrame, chars: DataFrame,
                       keep: Int): DataFrame =
    chars.join(cands, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("w"), lit(0L)).as("w"))
      .unionAll(cands.where(length(col("piece")) >= 2)
        .orderBy(col("w").desc, col("piece")).limit(keep))

  /** E-step: Viterbi paths under `vocab` via the native kernel; the
    * vocab is collected (driver-bounded) into literal arrays. */
  private def encodeDict(wd: DataFrame,
                         vocab: Array[(String, Long)]): DataFrame = {
    val pcs = array(vocab.map(v => lit(v._1)).toIndexedSeq: _*)
    val cts = array(vocab.map(v => lit(v._2)).toIndexedSeq: _*)
    wd.withColumn("path",
      graft.expr.UnigramFunctions.unigram_encode(col("word"), pcs, cts))
  }

  private def usageOf(enc: DataFrame): DataFrame =
    enc.select(col("cnt"), explode(col("path")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("w"))

  def q327UnigramLm(s: SparkSession, d: String): DataFrame = {
    val wd = wordDict(s, d).localCheckpoint()
    val seed = seedPieces(wd).localCheckpoint()
    val chars = seed.where(length(col("piece")) === 1).select("piece")
    def collectV(v: DataFrame): Array[(String, Long)] =
      v.orderBy(col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
    // EM: seed → E/M round 1 → E/M round 2 → final encode pass
    val v0 = collectV(cutVocab(seed, chars, SeedKeep))
    val v1 = collectV(cutVocab(usageOf(encodeDict(wd, v0)), chars,
      VocabKeep))
    val v2 = collectV(cutVocab(usageOf(encodeDict(wd, v1)), chars,
      VocabKeep))
    // BPE twin table trained on the IDENTICAL dict (q147's loop shape)
    val pairStructT = "array<struct<lhs:string,rhs:string>>"
    var cur = wd.select(col("cnt"), Bpe.charSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    for (round <- 1 to BpeRounds) {
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
      require(top.nonEmpty, s"unigram/bpe round $round: no pairs left")
      val (l, r) = (top(0).getString(0), top(0).getString(1))
      merges += ((l, r))
      cur = cur.withColumn("syms", Bpe.mergePass(col("syms"), l, r))
        .localCheckpoint()
    }
    val enc3 = encodeDict(wd, v2)
      .withColumn("bpe", Bpe.encodeWith(col("word"), merges.result()))
      .localCheckpoint()
    val totals = broadcast(enc3.agg(
      sum(col("cnt")).as("n_words"),
      sum(col("cnt") * length(col("word"))).as("n_chars"),
      sum(col("cnt") * size(col("path"))).as("n_toks_uni"),
      sum(col("cnt") * size(col("bpe"))).as("n_toks_bpe")))
    val spark = s
    import spark.implicits._
    v2.toSeq.toDF("piece", "usage")
      .withColumn("rank", row_number().over(
        Window.orderBy(col("usage").desc, col("piece"))))
      .crossJoin(totals)
      .select(col("rank").cast("long").as("rank"), col("piece"),
        col("usage"), col("n_words"), col("n_chars"),
        col("n_toks_uni"), col("n_toks_bpe"))
      .orderBy(col("rank"))
  }

  /** One unrolled Viterbi pass: `${p}d0..${p}d$MaxWord` + `${p}fin`,
    * scoring against the `vocab` CTE — the dp twin of the kernel. */
  private def dpSql(p: String, vocab: String): String = {
    val dp0 = s"${p}d0 AS (SELECT word, cnt, CAST(0 AS BIGINT) AS sc, " +
      "'' AS path FROM wd)"
    val stages = (1 to MaxWord).map { j =>
      val branches = (math.max(0, j - MaxPiece) until j).map { i =>
        s"""SELECT d.word, d.cnt, d.sc + $Big - v.w AS sc,
           |  CASE WHEN d.path = '' THEN v.piece
           |       ELSE d.path || ',' || v.piece END AS path
           |FROM ${p}d$i d JOIN $vocab v
           |  ON v.piece = substr(d.word, ${i + 1}, ${j - i})
           |WHERE length(d.word) >= $j""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""${p}d$j AS MATERIALIZED (
         |  SELECT word, cnt, sc, path FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word
         |      ORDER BY sc, path) AS rn FROM (
         |$branches))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val fin = (1 to MaxWord)
      .map(j => s"  SELECT word, cnt, path FROM ${p}d$j " +
        s"WHERE length(word) = $j")
      .mkString("\n  UNION ALL\n")
    s"""$dp0,
       |$stages,
       |${p}fin AS MATERIALIZED (
       |$fin),
       |${p}use AS (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS w FROM (
       |    SELECT unnest(str_split(path, ',')) AS piece, cnt
       |    FROM ${p}fin)
       |  GROUP BY 1)""".stripMargin
  }

  private def cutSql(name: String, cands: String, keep: Int): String =
    s"""$name AS MATERIALIZED (
       |  SELECT c.piece, coalesce(u.w, 0) AS w
       |  FROM chars c LEFT JOIN $cands u ON c.piece = u.piece
       |  UNION ALL
       |  SELECT piece, w FROM (
       |    SELECT piece, w, row_number() OVER (ORDER BY w DESC, piece)
       |      AS rn
       |    FROM $cands WHERE length(piece) >= 2)
       |  WHERE rn <= $keep)""".stripMargin

  val q327Sql: String = {
    val bpeStages = (1 to BpeRounds).map { k =>
      s"""bp$k AS (
         |  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
         |           i -> struct_pack(lhs := arr[i], rhs := arr[i + 1])),
         |         recursive := true), cnt
         |  FROM (SELECT str_split(trim(s, ','), ',,') AS arr, cnt
         |        FROM bw${k - 1})),
         |bm$k AS MATERIALIZED (
         |  SELECT lhs, rhs FROM bp$k
         |  GROUP BY 1, 2 ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
         |bw$k AS MATERIALIZED (
         |  SELECT replace(s,
         |      ',' || (SELECT lhs FROM bm$k) || ',,' ||
         |        (SELECT rhs FROM bm$k) || ',',
         |      ',' || (SELECT lhs FROM bm$k) || (SELECT rhs FROM bm$k) || ',')
         |    AS s, cnt
         |  FROM bw${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH wd AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(${Bpe.tokensSql}) AS word FROM documents)
       |  WHERE length(word) <= $MaxWord
       |  GROUP BY 1),
       |sub AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS w FROM (
       |    SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |      cnt
       |    FROM wd,
       |      unnest(range(1, ${MaxWord + 1})) u(i),
       |      unnest(range(1, ${MaxPiece + 1})) v(l)
       |    WHERE i + l - 1 <= length(word))
       |  GROUP BY 1),
       |chars AS (SELECT piece FROM sub WHERE length(piece) = 1),
       |${cutSql("v0", "sub", SeedKeep)},
       |${dpSql("e1", "v0")},
       |${cutSql("v1", "e1use", VocabKeep)},
       |${dpSql("e2", "v1")},
       |${cutSql("v2", "e2use", VocabKeep)},
       |${dpSql("e3", "v2")},
       |bw0 AS MATERIALIZED (
       |  SELECT ',' || substr(regexp_replace(word, '(.)', ',,\\1', 'g'), 2)
       |    || ',' AS s, cnt
       |  FROM wd),
       |$bpeStages,
       |vr AS (SELECT piece, w, row_number()
       |         OVER (ORDER BY w DESC, piece) AS rank FROM v2),
       |tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
       |    CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars,
       |    CAST(sum(cnt * (1 + length(path) - length(replace(path, ',', ''))))
       |      AS BIGINT) AS n_toks_uni
       |  FROM e3fin),
       |btot AS (
       |  SELECT CAST(sum(cnt *
       |      ((length(s) - length(replace(s, ',', ''))) // 2))
       |    AS BIGINT) AS n_toks_bpe
       |  FROM bw$BpeRounds)
       |SELECT CAST(rank AS BIGINT) AS rank, piece, w AS usage,
       |  n_words, n_chars, n_toks_uni, n_toks_bpe
       |FROM vr CROSS JOIN tot CROSS JOIN btot
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q327_unigram_lm" -> (q327UnigramLm _))

  val oracleSql: Map[String, String] = Map(
    "q327_unigram_lm" -> q327Sql)
}
