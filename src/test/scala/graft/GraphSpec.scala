package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Connected-components semantics + the SCALE property the operator exists
  * for: logarithmic-round convergence on chain graphs, where one-hop label
  * propagation would need O(diameter) shuffle rounds.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find on the driver — the spec's oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("64-node path converges in O(log n) rounds, not O(diameter)") {
    // worst case for hop-by-hop propagation: a single chain. 63 hops of
    // naive propagation vs a logarithmic large-star/small-star budget.
    val path = (0L until 63L).map(i => (i, i + 1))
    val got = run(path)
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
    assert(Graph.iterations <= 8,
      s"took ${Graph.iterations} rounds on a 64-chain — propagation-like, " +
      "not logarithmic")
  }

  test("matches union-find on random graphs (seeded ScalaCheck)") {
    val gen = for {
      n <- Gen.choose(5, 60)
      m <- Gen.choose(0, 80)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es
    (0 until 8).foreach { seed =>
      val edges = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val real = edges.filter(e => e._1 != e._2)
      val got = run(edges)
      assert(got === ufComponents(real),
        s"seed=$seed mismatch on ${real.size} edges")
    }
  }

  test("tolerates self-loops, duplicates, reversed edges; empty graph OK") {
    val got = run(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (1L, 2L),
                      (7L, 9L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 7L))
    assert(Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").isEmpty)
  }

  test("q71 labels every doc, keeps keeper=min, and sizes agree") {
    val out = Graph.q71DupClusters(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length === docs, "every doc must be labeled")
    assert(out.forall { case (id, cl, _) => cl <= id },
      "keeper must be the component minimum")
    val byCluster = out.groupBy(_._2)
    assert(out.forall { case (_, cl, n) => byCluster(cl).length == n },
      "cluster_size must equal the actual member count")
    // the fixture graph is non-trivial at sf0.001: multi-doc clusters exist
    assert(out.exists(_._3 > 1), "expected at least one non-singleton cluster")
  }

  test("pageRank matches an independent driver-side recurrence on a star") {
    // star: hub 0 ↔ leaves 1..6, bidirectional. Reference recurrence in
    // plain Scala maps; summation ORDER is not part of the contract
    // (Spark's partial aggregation groups addends differently than a
    // sequential fold), so the match is to 1e-12, not bit-exact.
    val k = 6
    val edges = (1 to k).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    var ref = (0 to k).map(_.toLong -> 1.0).toMap
    for (_ <- 1 to 5) {
      val hubIn = (1 to k).map(i => ref(i.toLong) / 1.0).sum
      val leafIn = ref(0L) / k
      ref = Map(0L -> (0.15 + 0.85 * hubIn)) ++
        (1 to k).map(i => i.toLong -> (0.15 + 0.85 * leafIn))
    }
    assert(got.keySet === ref.keySet)
    ref.foreach { case (n, r) =>
      assert(math.abs(got(n) - r) < 1e-12, s"node $n: ${got(n)} vs $r") }
    assert(got(0L) > got(1L), "hub must dominate leaves")
  }

  test("pageRank conserves total mass across iterations") {
    // non-normalized PageRank: Σrank' = 0.15·N + 0.85·Σrank, so with
    // init 1.0 the total stays N every iteration — a seeded random
    // bidirectional graph must hold it to float tolerance.
    val rnd = new scala.util.Random(42)
    val base = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = (base ++ base.map(_.swap)).distinct.toDF("src", "dst")
    val n = (base.flatMap(e => Seq(e._1, e._2))).distinct.size
    val total = Graph.pageRank(edges, iterations = 5)
      .agg(sum($"pr")).as[Double].head()
    assert(math.abs(total - n) < 1e-9, s"mass $total drifted from $n")
  }

  test("bfsHops: BFS distance equals driver-side reference on a known graph") {
    // path 1-2-3-4-5 plus an off-path branch 3-6; seed {1}
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
    val dir = (raw ++ raw.map(_.swap)).toDF("fid", "tid")
      .select(lit("n").as("ftyp"), $"fid", lit("n").as("ttyp"), $"tid")
    val seed = Seq(1L).toDF("id").select(lit("n").as("typ"), $"id")
    val got = Graph.bfsHops(dir, seed, maxHops = 4).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
                      6L -> 3L))
  }

  test("bfsHops: the hop cap truncates, never mislabels") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val dir = (raw ++ raw.map(_.swap)).toDF("fid", "tid")
      .select(lit("n").as("ftyp"), $"fid", lit("n").as("ttyp"), $"tid")
    val seed = Seq(1L).toDF("id").select(lit("n").as("typ"), $"id")
    val got = Graph.bfsHops(dir, seed, maxHops = 2).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // node 4 is 3 hops out: absent under the cap, NOT labeled 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("q170: bipartite parity — supplier hops even, customer hops odd") {
    val rows = Graph.q170BfsHops(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typ, hops) = (r.getString(0), r.getLong(2))
      assert(hops >= 0 && hops <= 4)
      if (typ == "s") assert(hops % 2 == 0, s"supplier at odd hop $hops")
      else assert(hops % 2 == 1, s"customer at even hop $hops")
    }
    assert(rows.exists(r => r.getString(0) == "s" && r.getLong(2) == 0L))
  }

  test("q171: triangle count matches brute force on the sf0.001 graph") {
    val row = Graph.q171TriangleCount(spark, sfDir).collect().head
    val (nTri, nEdges) = (row.getLong(0), row.getLong(1))
    assert(nEdges > 0)
    // brute-force recount on the driver from the same edge definition
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values
      .flatMap { basket =>
        val ps = basket.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }
      // filter+keySet, NOT collect{...=>e}: Map.collect with a tuple-valued
      // pf rebuilds a Map and silently collapses edges sharing a p1
      .groupBy(identity).filter(_._2.size >= 2).keySet
    val byNode = edges.groupBy(_._1)
    val expected = (for {
      (a, b) <- edges
      (b2, c) <- byNode.getOrElse(b, Set.empty)
      if edges.contains((a, c))
    } yield (a, b, c)).size
    assert(nTri == expected, s"spark $nTri vs brute $expected")
  }

  test("orientByDegree: a planted hub owns zero wedges regardless of its id") {
    import org.apache.spark.sql.functions._
    // hub = node 0 (the SMALLEST id — the adversarial case for raw
    // id-orientation, which would hand it out-degree 20 and 190 wedges)
    // connected to spokes 1..20; plus one spoke-spoke edge (1,2) so the
    // graph holds a triangle (0,1,2) to prove count invariance too.
    val canonical = ((1 to 20).map(i => (0L, i.toLong)) :+ (1L, 2L))
      .toDF("p1", "p2")
    val oriented = Graph.orientByDegree(canonical).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(oriented.length == canonical.count())
    // every hub edge points INTO the hub: deg(spoke) ≤ 2 < deg(hub) = 20
    oriented.filter(e => e._1 == 0L || e._2 == 0L)
      .foreach { case (src, dst) =>
        assert(dst == 0L, s"hub edge oriented out of the hub: ($src,$dst)") }
    // wedge census: hub out-degree 0 ⇒ no O(deg²) blowup at the hub
    val outDeg = oriented.groupBy(_._1).view.mapValues(_.length).toMap
    assert(!outDeg.contains(0L))
    assert(outDeg.values.max <= 2)
    // triangle (0,1,2) still counted exactly once under this orientation
    val es = oriented.toSet
    val tri = (for {
      (a, b) <- es; (b2, c) <- es if b2 == b; if es.contains((a, c))
    } yield (a, b, c)).size
    assert(tri == 1, s"expected exactly 1 triangle, got $tri")
  }

  test("q198: keeper is the max-(n_chars, sha2, doc_id) member of its own cluster") {
    import org.apache.spark.sql.functions._
    val labels = graft.ops.Graph.dupClusterLabels(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), sha2(col("text"), 256).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val rows = graft.ops.Graph.q198CanonicalKeeper(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture must contain dup clusters")
    rows.foreach { r =>
      val (cid, size, keeper) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val members = labels.filter(_._2 == cid).keys.toSeq
      assert(members.size == size && members.contains(keeper))
      // keeper maximizes (n_chars, content hash, doc_id) over the cluster
      val best = members.maxBy(m => (scored(m)._1, scored(m)._2, m))
      assert(keeper == best, s"cluster $cid keeper $keeper vs best $best")
      assert(r.getLong(3) == scored(keeper)._1)               // keeper_chars
      assert(r.getLong(5) == members.filter(_ != keeper).sum) // checksum
    }
  }

  /** Write a minimal documents.parquet fixture and return its dir. */
  private def docsFixture(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toFile
    dir.deleteOnExit()
    rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("q199: LSH funnel clusters FAR-APART duplicates, within and across langs") {
    // the property q71's consecutive-doc detector structurally lacks:
    // duplicate pairs whose ids are thousands apart, and across language
    // shards, must land in one cluster. ids avoid %20==0 so dedupCorpus
    // plants no extra near-dups in this fixture.
    val tA = "the quick brown fox jumps over the lazy dog while the " +
      "cold rain falls on the quiet empty street near the old stone bridge"
    val tB = "completely different content about spark catalyst optimizer " +
      "rules rewriting logical plans into efficient physical operators daily"
    val tC = "large scale data pipelines deduplicate documents using " +
      "minhash signatures banded into buckets joined on equal keys fast"
    val d = docsFixture(Seq(
      (1L, "en", tA), (5001L, "en", tA), (9003L, "fr", tA), // exact dups, far ids + cross-lang
      (7L, "en", tB),                                       // singleton
      (43L, "de", tC), (8501L, "en", tC + " with one extra clause added"))) // near dup
    val out = graft.ops.Graph.q199LshDedupFunnel(spark, d).collect()
    assert(out.length == 2, s"expected 2 clusters, got ${out.toSeq}")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val a = byId(1L) // cluster keyed by min member
    assert(a.getLong(1) == 3L, "tA cluster must span ids 1, 5001 and 9003")
    assert(a.getLong(2) == 9003L,
      "byte-identical members tie on (n_chars, sha2) — max doc_id wins")
    val c = byId(43L)
    assert(c.getLong(1) == 2L)
    assert(c.getLong(2) == 8501L, "longer member must be the keeper")
    assert(c.getLong(5) == 43L) // dropped_id_checksum
  }

  test("q199 keeper CONTENT is invariant under doc_id renumbering") {
    // LSH edges depend only on content, and the keeper order is
    // (n_chars, sha2(text), doc_id) — so renumbering every doc must keep
    // the same keeper TEXTS (ids differ, content doesn't).
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
      "one two three four five six seven eight nine ten eleven twelve more")
    val d1 = docsFixture(Seq(
      (1L, "en", texts(0)), (5003L, "en", texts(1)), (21L, "en", texts(2))))
    val d2 = docsFixture(Seq( // permuted, disjoint ids
      (9L, "en", texts(1)), (3L, "en", texts(0)), (7001L, "en", texts(2))))
    def keeperTexts(dir: String): Set[String] = {
      val keepers = graft.ops.Graph.q199LshDedupFunnel(spark, dir)
        .select(col("keeper_id")).as[Long].collect().toSet
      graft.ops.TextSim.dedupCorpus(spark, dir)
        .filter(col("doc_id").isin(keepers.toSeq: _*))
        .select(col("text")).as[String].collect().toSet
    }
    val (k1, k2) = (keeperTexts(d1), keeperTexts(d2))
    assert(k1.nonEmpty && k1 == k2,
      s"keeper content diverged under renumbering: $k1 vs $k2")
  }

  test("q198-style keeper tie-break: equal-length members pick the same " +
       "CONTENT under permuted ids") {
    // one lang, four equal-length near-identical docs (every consecutive
    // pair shares most bigrams, so the q71 detector chains them into ONE
    // cluster for any id order); keeper must be decided by sha2(text),
    // not by which id the corpus happened to assign
    val base = "the quick brown fox jumps over the lazy dog again and again "
    val texts = Seq("alpha", "bravo", "delta", "gamma").map(base + _)
    assert(texts.map(_.length).distinct.size == 1, "fixture needs equal n_chars")
    def keeperText(assign: Seq[(Long, String)]): String = {
      val d = docsFixture(assign.map { case (id, t) => (id, "en", t) })
      val keepers = graft.ops.Graph.q198CanonicalKeeper(spark, d)
        .select(col("keeper_id")).as[Long].collect()
      assert(keepers.length == 1, "fixture must form one cluster")
      Tables.documents(spark, d).filter(col("doc_id") === keepers.head)
        .select(col("text")).as[String].head()
    }
    val t1 = keeperText(Seq(11L -> texts(0), 12L -> texts(1),
                            13L -> texts(2), 14L -> texts(3)))
    val t2 = keeperText(Seq(14L -> texts(0), 11L -> texts(1),
                            13L -> texts(3), 12L -> texts(2)))
    assert(t1 == t2, s"keeper content changed with id assignment: $t1 vs $t2")
  }

  test("q222: cluster split leaks nothing while the doc split provably would") {
    import spark.implicits._
    val out = Graph.q222LeakageSafeSplit(spark, sfDir)
      .select($"split", $"n_docs", $"leak_doc_pairs", $"leak_cluster_pairs")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq === Seq("test", "train", "val"))
    // the constructive guarantee: zero near-dup pairs straddle splits
    assert(out.map(_._4).sum === 0L,
      "cluster-hash split let a near-dup pair straddle splits")
    // and the contrast is non-vacuous: the naive doc-hash split leaks
    assert(out.map(_._3).sum > 0L,
      "fixture produced no doc-split leaks — the contrast is vacuous")
    // every corpus member is assigned exactly once
    val corpusSize = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val planted = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod($"doc_id", lit(20)) === 0).count()
    assert(out.map(_._2).sum === corpusSize + planted)
  }

  test("q233 sync LPA matches a driver-side recompute on planted + random graphs") {
    // independent reference: simultaneous most-frequent-neighbour update,
    // ties to the smallest label, over an adjacency map
    def refLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keySet.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lbl = adj.map { case (n, nbrs) =>
          val counts = nbrs.groupBy(lbl).view.mapValues(_.size)
          n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lbl
    }
    def engine(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val e = edges.toDF("src", "dst")
      val sym = e.unionAll(e.select($"dst".as("src"), $"src".as("dst")))
      Graph.lpaLabels(sym, 4).as[(Long, Long)].collect().toMap
    }
    // two 4-cliques bridged by one edge: LPA keeps them as (at most) two
    // communities where CC would merge them into one
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val planted = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) ++ Seq((4L, 11L))
    assert(engine(planted) === refLpa(planted, 4))
    assert(engine(planted).values.toSet.size >= 2,
      "bridged cliques must not all merge (that would be CC, not LPA)")
    // seeded sparse random graph: exact agreement with the reference
    val rnd = new scala.util.Random(4242)
    val random = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(engine(random) === refLpa(random, 4))
    // real-data census conserves the node universe
    val census = Graph.q233LabelPropagation(spark, sfDir)
      .agg(sum($"n_members"), sum($"member_id_sum")).head()
    val nodes = Graph.coPurchaseEdges(spark, sfDir)
      .select(explode(array($"p1", $"p2")).as("n")).distinct()
      .agg(count(lit(1)), sum($"n")).head()
    assert(census.getLong(0) === nodes.getLong(0))
    assert(census.getLong(1) === nodes.getLong(1))
  }

  test("personalized PageRank: uniform tele reduces to classic; seeds anchor") {
    val e = Seq((1L,2L),(2L,1L),(2L,3L),(3L,2L),(3L,4L),(4L,3L))
      .toDF("src", "dst")
    val classic = Graph.pageRank(e, 4).as[(Long, Double)].collect().toMap
    val uniform = Graph.pageRank(e, 4,
        tele = Some(e.select($"src".as("node")).distinct()
          .withColumn("tele", lit(1.0))))
      .as[(Long, Double)].collect().toMap
    assert(uniform === classic,
      "an all-ones tele frame must reproduce classic PageRank bit-for-bit")
    // seed-anchored: teleport only to node 1 — driver-side recompute of
    // the exact recurrence pr_k = 0.15*tele + 0.85*sum(pr/deg)
    val seeded = Graph.pageRank(e, 4,
        tele = Some(Seq((1L, 1.0)).toDF("node", "tele")))
      .as[(Long, Double)].collect().toMap
    val adjIn = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
                    4L -> Seq(3L))
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0)
    val tele = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0)
    var pr = tele
    for (_ <- 1 to 4)
      pr = adjIn.map { case (n, ins) =>
        n -> (0.15 * tele(n) + 0.85 * ins.map(i => pr(i) / deg(i)).sum) }
    pr.foreach { case (n, v) =>
      assert(math.abs(seeded(n) - v) < 1e-12, s"node $n: ${seeded(n)} vs $v") }
    // the seed anchors the distribution; proximity mass reaches everyone
    // (no monotone-decay claim: path ends reflect mass back)
    assert(seeded(1L) === seeded.values.max)
    assert(seeded.values.forall(_ > 0.0))
  }

  test("q267 Borůvka: exact max spanning tree on planted bridged triangles") {
    // two triangles joined by a light bridge — the MST is known by hand:
    // each triangle keeps its two heaviest edges, the bridge joins them.
    val g = Seq((1L, 2L, 5L), (1L, 3L, 4L), (2L, 3L, 3L),
                (4L, 5L, 5L), (4L, 6L, 4L), (5L, 6L, 3L),
                (3L, 4L, 1L)).toDF("p1", "p2", "w")
    val (forestDf, lbl) = Graph.boruvkaForest(g, 3)
    val forest = forestDf.as[(Long, Long, Long, Long)].collect().toSet
    // the incremental contraction converges: one component, min label
    assert(lbl.as[(Long, Long)].collect().toMap.values.toSet === Set(1L))
    assert(forest === Set(
      (1L, 2L, 5L, 1L), (1L, 3L, 4L, 1L),   // round 1: per-node argmax
      (4L, 5L, 5L, 1L), (4L, 6L, 4L, 1L),
      (3L, 4L, 1L, 2L)))                    // round 2: the bridge merges
    // spanning-tree arithmetic: |V| − components edges, no cycles
    assert(forest.size === 6 - 1)
  }

  test("q258 Adamic–Adar: exact scores on a planted square; hubs capped") {
    // square 1-2-3-4-1: every node has degree 2; the two diagonals
    // (1,3) and (2,4) each share two common neighbours, so
    // aa_micro = 2 * round(1e6 / ln 2) and adjacent pairs never appear.
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("p1", "p2")
    val got = Graph.adamicAdarPairs(square)
      .orderBy($"p1", $"p2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val w2 = math.round(1e6 / math.log(2.0))
    assert(got === Seq((1L, 3L, 2 * w2, 2L), (2L, 4L, 2 * w2, 2L)))

    // a star whose centre exceeds the degree cap contributes NOTHING:
    // centre degree 65 > AaDegCap, leaves have degree 1 (no wedge) —
    // the quadratic-hub prune, exercised end to end.
    val star = (1L to 65L).map(l => (0L, l)).toDF("p1", "p2")
    assert(Graph.adamicAdarPairs(star).count() === 0L)

    // path 1-2-3 plus hub 4 connected to all three: wedges through the
    // hub AND through path nodes combine; driver recompute of the full
    // formula for the one non-adjacent pair (1,3): common neighbours are
    // 2 (deg 3) and 4 (deg 3).
    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L))
      .toDF("p1", "p2")
    val w3 = math.round(1e6 / math.log(3.0))
    val gotMixed = Graph.adamicAdarPairs(mixed)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotMixed === Seq((1L, 3L, 2 * w3, 2L)))
  }

  test("q295 k-core peel: planted core survives, tendrils shed in order") {
    // a 4-clique (every node degree 3 — the 3-core) with a 2-hop tendril
    // hanging off node 1: 1-10-11. Peel at k=3:
    //   round 1: 11 (deg 1) and 10 (deg 2) both drop — degree is
    //            evaluated on the round's INPUT edges, synchronously;
    //   round 2: nothing changes (the clique is the fixpoint).
    val g = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                 (3L, 4L), (1L, 10L), (10L, 11L)))
      .toDF("p1", "p2")
    val got = Graph.kCorePeel(g, 3, 3)
      .orderBy($"round")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // (round, n_before, n_kept, n_removed, n_edges)
    assert(got === Seq(
      (1L, 6L, 4L, 2L, 6L),   // 10 and 11 shed together; clique edges stay
      (2L, 4L, 4L, 0L, 6L),   // fixpoint: peeling removes nothing
      (3L, 4L, 4L, 0L, 6L)))
    spark.catalog.clearCache()

    // a 6-cycle is pure 2-core: at k=3 EVERYTHING sheds in round 1 and
    // the empty-graph census stays (0, 0) — the coalesce path sf0.1 hits.
    val cyc = (0L until 6L).map(i => (i, (i + 1) % 6))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("p1", "p2")
    val gotCyc = Graph.kCorePeel(cyc, 3, 2)
      .orderBy($"round")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gotCyc === Seq((1L, 6L, 0L, 6L, 0L), (2L, 0L, 0L, 0L, 0L)))
    spark.catalog.clearCache()
  }

  test("q296 topology census: star is assortativity −1, clique hits the " +
       "regular-graph guard") {
    // K_{1,4} star: endpoint degrees are always (1, 4) — perfectly
    // DISASSORTATIVE, textbook r = −1; no triangles, wedges = C(4,2).
    val star = (1L to 4L).map(l => (0L, l)).toDF("p1", "p2")
    val gotStar = Graph.topologyCensus(star)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    // (n_nodes, n_edges, max_deg, mean_deg_micro, wedges, triangles,
    //  transitivity_micro, assortativity_micro)
    assert(gotStar === ((5L, 4L, 4L, 1600000L, 6L, 0L, 0L, -1000000L)))
    spark.catalog.clearCache()

    // K_4 clique: 2-regular in endpoint terms (every deg = 3) — zero
    // degree variance, r undefined → pinned 0 (the guard path); every
    // wedge closes, transitivity exactly 1.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                 (3L, 4L)).toDF("p1", "p2")
    val gotK4 = Graph.topologyCensus(k4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(gotK4 === ((4L, 6L, 3L, 3000000L, 12L, 4L, 1000000L, 0L)))
    spark.catalog.clearCache()
  }
}
