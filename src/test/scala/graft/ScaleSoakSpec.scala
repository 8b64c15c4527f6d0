package graft

import org.apache.spark.sql.functions._

/** The 10× soak's conclusions are only as good as the synthesis
  * invariants — these pin them at factor 2 over sf0.001:
  * row scaling, key disjointness, exact join fan-out preservation, and
  * the two structure-preservation claims (alphabet rotation for text,
  * cyclic rotation for embeddings) the BASELINE.md soak table relies on.
  */
class ScaleSoakSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("soakspec").toString
    ScaleSoak.synthesize(spark, sfDir, d, factor = 2)
    d
  }
  private def base(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
  private def soak(t: String) = spark.read.parquet(s"$outDir/$t.parquet")

  test("scaled tables carry factor x rows; fixed dims stay verbatim") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(soak(t).count() === 2 * base(t).count(), t)
    for (t <- Seq("region", "nation")) {
      assert(soak(t).count() === base(t).count(), t)
      assert(soak(t).exceptAll(base(t)).isEmpty, s"$t must be verbatim")
    }
  }

  test("copy key ranges are disjoint and join fan-out is preserved exactly") {
    val oMax = base("orders").agg(max($"o_orderkey")).as[Long].head()
    assert(soak("orders").where($"o_orderkey" > oMax).count() ===
      base("orders").count(), "copy 1 must occupy the shifted key range")
    // lineitem ⋈ orders matches exactly 2x: every copy joins only within
    // itself (preserved fan-out, no cross-copy key collisions)
    val bJoin = base("lineitem").join(base("orders"),
      $"l_orderkey" === $"o_orderkey").count()
    val sJoin = soak("lineitem").join(soak("orders"),
      $"l_orderkey" === $"o_orderkey").count()
    assert(sJoin === 2 * bJoin)
    // per-order line-count distribution is identical (group SIZES carry
    // over, so aggregation skew is unchanged, just replicated)
    val dist = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy($"l_orderkey").count()
        .groupBy($"count").agg(count(lit(1)).as("orders"))
        .as[(Long, Long)].collect().toMap
    val (bd, sd) = (dist(base("lineitem")), dist(soak("lineitem")))
    assert(bd.keySet === sd.keySet)
    bd.foreach { case (sz, n) => assert(sd(sz) === 2 * n, s"group size $sz") }
  }

  test("text rotation preserves within-copy shingle structure exactly " +
       "and breaks cross-copy collisions") {
    def shingles(s: String): Set[String] =
      if (s.length < 3) Set.empty
      else (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else a.intersect(b).size.toDouble / a.union(b).size
    val dMax = base("documents").agg(max($"doc_id")).as[Long].head() + 1
    val byId = soak("documents").select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    val sample = byId.keys.filter(_ < dMax).toSeq.sorted.take(20)
    // copy-1 text: same length, same whitespace skeleton (token
    // boundaries preserved -> token/length stats identical per copy)
    sample.foreach { id =>
      val (t0, t1) = (byId(id), byId(id + dMax))
      assert(t0.length === t1.length, s"doc $id length")
      assert(t0.zip(t1).forall { case (a, b) =>
        a.isLetter == b.isLetter && (a.isLetter || a == b) },
        s"doc $id non-letter skeleton must be untouched")
    }
    // within-copy pairwise Jaccard is preserved EXACTLY (bijection
    // applied uniformly), so every near-dup relationship carries over
    sample.sliding(2).foreach {
      case Seq(i, j) =>
        val b0 = jac(shingles(byId(i)), shingles(byId(j)))
        val c1 = jac(shingles(byId(i + dMax)), shingles(byId(j + dMax)))
        assert(math.abs(b0 - c1) < 1e-12, s"pair ($i,$j): $b0 vs $c1")
      case _ => ()
    }
    // cross-copy: a doc vs its own rotated copy shares (at most) the
    // letter-free shingles — far below any near-dup threshold
    val crossJacs = sample.map(id => jac(shingles(byId(id)),
      shingles(byId(id + dMax))))
    assert(crossJacs.forall(_ < 0.3),
      s"cross-copy Jaccard should collapse, got ${crossJacs.max}")
  }

  test("embedding rotation preserves norms and within-copy cosine exactly") {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val vMax = base("embeddings").agg(max($"vec_id")).as[Long].head() + 1
    val byId = soak("embeddings").select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val sample = byId.keys.filter(_ < vMax).toSeq.sorted.take(10)
    sample.foreach { id =>
      val (v0, v1) = (byId(id), byId(id + vMax))
      assert(v0.size === v1.size)
      // rotation: same multiset of components -> identical norm
      assert(math.abs(dot(v0, v0) - dot(v1, v1)) < 1e-4, s"vec $id norm")
      assert(v1 === (v0.drop(1) ++ v0.take(1)), s"vec $id rotation by 1")
    }
    // within-copy cosine identical: rotation is orthogonal and uniform
    sample.sliding(2).foreach {
      case Seq(i, j) =>
        assert(math.abs(cos(byId(i), byId(j)) -
          cos(byId(i + vMax), byId(j + vMax))) < 1e-6, s"pair ($i,$j)")
      case _ => ()
    }
  }
}
