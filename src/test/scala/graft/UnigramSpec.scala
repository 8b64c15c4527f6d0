package graft

import graft.ops.Unigram
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The unigram trainer's kernel and EM loop, pinned against independent
  * driver-side recomputes (no Spark in the reference path).
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, vocab: Seq[(String, Long)]): Seq[String] = {
    val pieces = ArrayData.toArrayData(
      vocab.map(v => UTF8String.fromString(v._1)).toArray)
    val counts = ArrayData.toArrayData(vocab.map(_._2).toArray)
    val out = graft.expr.UnigramEncodeExpr.bestPath(
      UTF8String.fromString(word), pieces, counts)
    (0 until out.numElements()).map(out.getUTF8String(_).toString)
  }

  test("unigram_encode kernel: golden paths, missing-piece regression, " +
       "count and lex tie-breaks") {
    val v = Seq(("wind", 976L), ("ow", 2763L), ("w", 3739L), ("i", 4665L),
      ("n", 4820L), ("d", 2876L), ("o", 3000L), ("s", 1808L))
    assert(enc("window", v) === Seq("wind", "ow"))
    // regression: 'wow' is NOT a piece — a boxed-null lookup bug once
    // made every substring "exist" with count 0
    assert(enc("wow", v) === Seq("w", "ow"))
    // fewest pieces dominates any count sum
    assert(enc("wind", v) === Seq("wind"))
    // equal piece count: higher total count wins ('ow' 2763 + 'w' 3739
    // beats 'o' 3000 + ... same length paths)
    assert(enc("ow", v) === Seq("ow"))
    // lex tie-break: two 2-piece paths with identical counts
    val tie = Seq(("ab", 5L), ("cd", 5L), ("a", 5L), ("b", 5L),
      ("c", 5L), ("d", 5L), ("abc", 7L), ("bcd", 7L))
    // 'abcd' → {abc,d} sc=2B-12 vs {a,bcd} sc=2B-12 vs {ab,cd} sc=2B-10:
    // tie between 'a,bcd' and 'abc,d' → lex smaller path 'a,bcd'
    assert(enc("abcd", tie) === Seq("a", "bcd"))
    // unsegmentable word fails loudly
    intercept[IllegalArgumentException] { enc("xyz", v) }
  }

  test("q327 EM ≡ independent driver recompute (seed, 2 EM rounds, " +
       "final vocab and both token counts)") {
    // reference implementation: plain Scala, no Spark
    val words = Tables.documents(spark, sfDir).select($"text").as[String]
      .collect()
      .flatMap(_.toLowerCase.split("[^a-z0-9]+"))
      .filter(w => w.nonEmpty && w.length <= 16)
    val wd = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val seed = scala.collection.mutable.Map.empty[String, Long]
    wd.foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 1 to math.min(4, w.length - i))
        seed.updateWith(w.substring(i, i + l))(
          o => Some(o.getOrElse(0L) + c))
    }
    val chars = seed.keySet.filter(_.length == 1).toSet
    def cut(cands: Map[String, Long], keep: Int): Map[String, Long] =
      chars.map(c => c -> cands.getOrElse(c, 0L)).toMap ++
        cands.filter(_._1.length >= 2).toSeq
          .sortBy { case (p, w) => (-w, p) }.take(keep)
    val Big = 1000000000000L
    def best(word: String, voc: Map[String, Long]): Seq[String] = {
      val n = word.length
      val sc = Array.fill(n + 1)(Long.MaxValue)
      val pa = Array.fill(n + 1)("")
      sc(0) = 0L
      for (j <- 1 to n; i <- math.max(0, j - 4) until j
           if sc(i) != Long.MaxValue) {
        val piece = word.substring(i, j)
        voc.get(piece).foreach { cnt =>
          val s = sc(i) + (Big - cnt)
          val p = if (pa(i).isEmpty) piece else pa(i) + "," + piece
          if (s < sc(j) || (s == sc(j) && p < pa(j))) {
            sc(j) = s; pa(j) = p
          }
        }
      }
      pa(n).split(",").toSeq
    }
    def estep(voc: Map[String, Long]): Map[String, Long] = {
      val u = scala.collection.mutable.Map.empty[String, Long]
      wd.foreach { case (w, c) =>
        best(w, voc).foreach(p =>
          u.updateWith(p)(o => Some(o.getOrElse(0L) + c))) }
      u.toMap
    }
    val v0 = cut(seed.toMap, 96)
    val v1 = cut(estep(v0), 64)
    val v2 = cut(estep(v1), 64)
    val nToksUni =
      wd.map { case (w, c) => c * best(w, v2).length }.sum
    val got = Unigram.q327UnigramLm(spark, sfDir)
      .select($"piece", $"usage", $"n_words", $"n_toks_uni")
      .collect()
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap === v2,
      "trained vocabulary must match the driver recompute")
    assert(got.head.getLong(2) === wd.values.sum)
    assert(got.head.getLong(3) === nToksUni)
  }
}
