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
}
