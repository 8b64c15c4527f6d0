package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** O11–O13 merge semantics (SURVEY §5.2 items 2–3): unit cases on tiny
  * frames + ScalaCheck properties behind the reference's refresh contract
  * (README.md:156–163 — re-running an ingest must not change the table).
  * Generators are driven with fixed seeds (no scalatestplus bridge in the
  * offline cache), so failures are reproducible.
  */
class MergeSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 15)(body: A => Unit): Unit =
    samples(g, n).foreach(body)
  import spark.implicits._

  test("denseIds: partition-offset fallback produces the identical id " +
       "mapping at adversarial cardinality, without leaving Tungsten") {
    // 5000 distinct keys in scrambled input order, well past the forced
    // 100-key window ceiling -> the guarded path must kick in and agree
    // with the window path bit-for-bit.
    val keys = spark.range(0, 5000)
      .select(concat(lit("k"), format_string("%05d", pmod($"id" * 2654435761L, lit(5000)))).as("nk"))
      .distinct()
    val viaWindow = graft.ops.Merge.denseIds(keys, "nk")
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    val bigDim = graft.ops.Merge.denseIds(keys, "nk", maxWindowKeys = 100)
    val viaOffsets = bigDim
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    assert(viaWindow.size === 5000)
    assert(viaWindow === viaOffsets)
    // ids are dense 1..N in ascending key order
    assert(viaOffsets.map(_._2) === (1L to 5000L))
    assert(viaOffsets.map(_._1) === viaOffsets.map(_._1).sorted)
    // the r4 fallback dropped to sorted.rdd.zipWithIndex, which plans as
    // an ExistingRDD scan deserializing every key through Row; the
    // partition-offset form must stay a DataFrame pipeline end to end
    val plan = bigDim.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan rdd"),
      s"big-dim id path left Tungsten:\n$plan")
    // and the per-flag window path is absent: no global-order Window
    assert(!plan.contains("row_number"),
      s"big-dim path still uses the global window:\n$plan")
  }

  /** insert-if-absent (O12): existing ∪ (incoming ∖ existing by key). */
  private def insertIfAbsent(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(
      incoming.join(existing.select("k"), Seq("k"), "left_anti"))

  /** latest-wins upsert (O13): union + keep first row per key ordering
    * incoming before existing.
    */
  private def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val u = incoming.withColumn("pri", lit(1))
      .unionByName(existing.withColumn("pri", lit(0)))
    u.withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"pri".desc)))
      .where($"rn" === 1).drop("pri", "rn")
  }

  test("O12 insert-if-absent keeps the first writer") {
    val existing = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    val got = insertIfAbsent(existing, incoming)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "old"), (2L, "old"), (3L, "new")))
  }

  test("O13 latest-wins upsert replaces on conflict") {
    val existing = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    val got = upsert(existing, incoming)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "old"), (2L, "new"), (3L, "new")))
  }

  test("O11 surrogate ids are dense, deterministic, and keep existing ids") {
    val existing = Seq("b", "a").toDF("k")
      .withColumn("id", row_number().over(Window.orderBy($"k")).cast("long"))
    val incoming = Seq("c", "a", "d").toDF("k")
    val newKeys = incoming.join(existing.select("k"), Seq("k"), "left_anti")
      .withColumn("rn", row_number().over(Window.orderBy($"k")).cast("long"))
      .crossJoin(broadcast(existing.agg(max($"id").as("m"))))
      .select($"k", ($"m" + $"rn").as("id"))
    val dim = existing.unionByName(newKeys.select("k", "id"))
      .orderBy("id").as[(String, Long)].collect().toSeq
    assert(dim === Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  private val kvGen: Gen[(List[(Long, String)], List[(Long, String)])] = {
    val one = Gen.listOf(
      Gen.zip(Gen.choose(0L, 20L), Gen.alphaLowerStr.map(_.take(4))))
    Gen.zip(one, one)
  }

  private def rowsOf(df: DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSeq.sorted

  test("property: upsert is idempotent (re-applying a batch is a no-op)") {
    forAll(kvGen) { case (ex, in) =>
      // one row per key on each side, as the reference's tables guarantee
      val existing = ex.toDF("k", "v").dropDuplicates("k")
      val incoming = in.toDF("k", "v").dropDuplicates("k")
      val once = upsert(existing, incoming)
      val twice = upsert(once, incoming)
      assert(rowsOf(twice) === rowsOf(once))
    }
  }

  test("property: insert-if-absent never shrinks and never rewrites") {
    forAll(kvGen) { case (ex, in) =>
      val existing = ex.toDF("k", "v").dropDuplicates("k")
      val incoming = in.toDF("k", "v").dropDuplicates("k")
      val merged = rowsOf(insertIfAbsent(existing, incoming))
      // existing rows survive verbatim
      assert((rowsOf(existing).toSet -- merged.toSet).isEmpty)
      // result keys = union of input keys
      val wantKeys = rowsOf(existing).map(_._1).toSet ++
        rowsOf(incoming).map(_._1).toSet
      assert(merged.map(_._1).toSet === wantKeys)
    }
  }
}
