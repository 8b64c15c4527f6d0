package graft

import graft.expr.JaroWinklerFunctions.jaro_winkler
import graft.expr.JaroWinklerExpr
import org.apache.spark.sql.functions._

/** The native Jaro-Winkler expression (expr/JaroWinkler.scala). The
  * cross-engine contract is proved by q155's DuckDB oracle (and was
  * pinned against 3000 randomized DuckDB probes during development);
  * these tests fix the textbook goldens and the algebraic properties,
  * through BOTH the codegen path (DataFrame) and interpreted eval.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val goldens = Seq(
    ("martha", "marhta", 0.9611111111),
    ("dixon", "dicksonx", 0.8133333333),
    ("jellyfish", "smellyfish", 0.8962962963), // no shared prefix: jw = jaro
    ("dwayne", "duane", 0.84),
    ("crane", "cane", 0.94),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("a", "b", 0.0),
    // below the 0.7 boost threshold the shared prefix must NOT help
    ("abqqqqqq", "abzzzzzzzzzzzz", 0.4642857143))

  test("textbook goldens through the codegen path") {
    val got = goldens.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select($"a", $"b", jaro_winkler($"a", $"b").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    goldens.foreach { case (a, b, want) =>
      assert(math.abs(got((a, b)) - want) < 1e-9, s"($a, $b)")
    }
  }

  test("interpreted kernel: symmetry, bounds, empty-vs-empty convention") {
    val rnd = new scala.util.Random(155)
    def str() = (0 until rnd.nextInt(12))
      .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (str(), str())
      val s = JaroWinklerExpr.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val t = JaroWinklerExpr.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(s >= 0.0 && s <= 1.0, s"($a, $b) out of range: $s")
      assert(s === t, s"asymmetric on ($a, $b)")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
    // DuckDB convention, pinned because the oracle is DuckDB
    assert(JaroWinklerExpr.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(""),
      org.apache.spark.unsafe.types.UTF8String.fromString("")) === 0.0)
  }

  test("q265 Fellegi–Sunter: the match band is exactly the all-agree score") {
    import spark.implicits._
    val rows = graft.ops.Warehouse.q265RecordLinkage(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dec, n, nTrue, lo, hi) =>
      assert(n > 0L && nTrue <= n)
      assert(lo >= -12892L && hi <= 16356L, s"$dec [$lo, $hi]")
      // with these weights the only score ≥ 12000 is full agreement
      // (best single-disagreement = 9893 + 4170 − 5322 = 8741), so the
      // match band is a single point by construction
      if (dec == "match") assert(lo === 16356L && hi === 16356L)
    }
  }
}
