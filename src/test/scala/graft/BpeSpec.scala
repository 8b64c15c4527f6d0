package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE encode/learn semantics (ops/Bpe.scala). The oracle proves the
  * chain end-to-end against DuckDB's replace form; these tests pin the
  * merge-pass contract itself against an INDEPENDENT plain-Scala
  * reference (imperative left-to-right scan) on adversarial inputs the
  * corpus may not contain.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: one left-to-right non-overlapping pass per merge, in
    * rank order. Deliberately imperative — shares nothing with the
    * HOF-fold production form.
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (l, r)) =>
      val out = scala.collection.mutable.Buffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
        else out += s
      }
      out.toSeq
    }

  private def sparkEncode(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), Bpe.encodeWith(col("w"), merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("merge pass is left-to-right non-overlapping on runs (the a,a trap)") {
    // "aaaa" -> [aa, aa]; "aaa" -> [aa, a]: a fused symbol must not
    // re-merge with the next raw symbol inside the same pass.
    val got = sparkEncode(Seq("aaaa", "aaa", "aa", "a"), Seq("a" -> "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aa") == Seq("aa"))
    assert(got("a") == Seq("a"))
  }

  test("later merges see earlier merges' output, not raw chars") {
    // (a,b)->ab then (ab,c)->abc: the second pass must match the FUSED
    // symbol; raw "abc" built char-wise only merges if rank order ran.
    val merges = Seq("a" -> "b", "ab" -> "c")
    val got = sparkEncode(Seq("abc", "acb", "aabbcc"), merges)
    assert(got("abc") == Seq("abc"))
    assert(got("acb") == Seq("a", "c", "b"))
    assert(got("aabbcc") == Seq("a", "ab", "b", "c", "c"))
  }

  test("fixed-table encode matches the independent reference on random words") {
    val rnd = new scala.util.Random(20260813)
    val alphabet = "abcdefghinorstu"
    val words = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(14)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val got = sparkEncode(words, Bpe.fixedMerges)
    words.foreach { w =>
      assert(got(w) == refEncode(w, Bpe.fixedMerges), s"word '$w'")
    }
  }

  test("native kernel ≡ HOF fold bit-for-bit over the whole sf0.001 vocab") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")).as("w")).distinct()
    val diff = words
      .select(col("w"), Bpe.encodeWord(col("w")).as("native"),
        Bpe.encodeWith(col("w"), Bpe.fixedMerges).as("hof"))
      .where(not(col("native") === col("hof")))
    assert(diff.count() == 0)
  }

  test("WordPiece: position-marked symbols, ##-dropping fusion, " +
       "driver reference agrees with the fold") {
    // reference fusion: one left-to-right pass; fused = l + r minus ##
    def refWp(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val init = word.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }
      merges.foldLeft(init: Seq[String]) { case (syms, (l, r)) =>
        val out = scala.collection.mutable.Buffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r)
            out(out.length - 1) = l + s.stripPrefix("##")
          else out += s
        }
        out.toSeq
      }
    }
    val merges = Seq("t" -> "##h", "th" -> "##e", "##i" -> "##n")
    val words = Seq("the", "thin", "tint", "bathing", "t", "h")
    val got = words.toDF("w")
      .select(col("w"),
        merges.foldLeft(Bpe.wpSyms(col("w"))) { case (s, (l, r)) =>
          Bpe.wpMergePass(s, l, r, l + r.stripPrefix("##")) }.as("enc"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(got(w) == refWp(w, merges), s"word '$w'"))
    // position marking distinguishes initial from medial: word-initial
    // "th" fused; medial "##t ##h" untouched by the (t, ##h) merge
    assert(got("the") == Seq("the"))
    assert(got("bathing") == Seq("b", "##a", "##t", "##h", "##in", "##g"))
  }

  test("byte-level native kernel ≡ HOF fold over byteSyms, incl. " +
       "multi-byte UTF-8, and decoding is exact byte concatenation") {
    import graft.expr.BpeFunctions.bpe_encode_bytes
    // merges chosen to compose (65+72, then 6572+6C) and to include a
    // multi-byte UTF-8 lead byte (C3+A9 = 'é')
    val merges = Seq("65" -> "72", "6572" -> "6C", "C3" -> "A9",
      "6C" -> "6C")
    val words = Seq("hello", "erl", "héllo", "ell", "",
      "wörld", "你好", "aerlerl").toDF("w")
      .where(col("w") =!= "")
    val diff = words
      .select(col("w"), bpe_encode_bytes(col("w"), merges).as("native"),
        merges.foldLeft(Bpe.byteSyms(col("w"))) { case (sy, (l, r)) =>
          Bpe.mergePass(sy, l, r) }.as("hof"))
      .where(not(col("native") === col("hof")))
    assert(diff.count() == 0, "kernel diverged from the fold")
    // lossless: unhex(concat(tokens)) decodes back to the input
    val bad = words
      .select(col("w"),
        decode(unhex(concat_ws("", bpe_encode_bytes(col("w"), merges))),
          "UTF-8").as("rt"))
      .where(col("w") =!= col("rt"))
    assert(bad.count() == 0, "byte round-trip lost bytes")
  }

  test("encoding is lossless over the whole sf0.001 corpus") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")).as("w")).distinct()
    val bad = words
      .select(col("w"), concat_ws("", Bpe.encodeWord(col("w"))).as("rt"),
        size(Bpe.encodeWord(col("w"))).as("n"))
      .where(col("w") =!= col("rt") || col("n") > length(col("w")) || col("n") < 1)
    assert(bad.count() == 0)
  }
}
