package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for the optimization round: times the
  * shared ANN trainers and the index-maintenance fixture sub-steps so
  * bench seconds can be attributed to trainer / store / wave /
  * streaming components. Not part of the driver contract.
  */
object ProfileNew {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
  private val stages = new java.util.concurrent.atomic.AtomicInteger(0)
  private val tasks = new java.util.concurrent.atomic.AtomicInteger(0)

  private def t[A](name: String)(f: => A): A = {
    val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
      f"  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d" +
      f" tasks=${tasks.get - k0}%5d")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = stages.incrementAndGet()
        override def onTaskStart(
            e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          tasks.incrementAndGet()
      })
    import graft.ops.Similarity
    import graft.ops.IndexMaintainer
    import graft.sources.SnapshotStore
    def run(q: String): Unit = {
      SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    def clearAll(): Unit = {
      ops.Graph.clearLabelCache(); ops.Similarity.clearKmeansCache()
      ops.Similarity.clearNnGraphCache(); ops.Corpus.clearLrCache()
      sources.SnapshotStore.clearCdcCache()
      ops.IndexMaintain.clearIndexFixtureCache()
    }
    t("warm-up q30") { run("q30_course_flatten") }
    clearAll()
    val m10 = pmod(col("vec_id"), lit(10))
    val emb = Similarity.embFrame(spark, d)

    // inline replica of kmeansCodebooks with per-step timers
    locally {
      import org.apache.spark.sql.expressions.Window
      val mCount = 1; val w = 64; val k = 8; val iters = 2
      val p = t("kmeans: pieces localCheckpoint") {
        Similarity.pieces(emb, mCount, w).localCheckpoint() }
      val seedIds = emb
        .select(col("vec_id"), md5(col("vec_id").cast("string")).as("hh"))
        .orderBy(col("hh"), col("vec_id")).limit(k)
        .select(col("vec_id"),
          (row_number().over(Window.orderBy(col("hh"), col("vec_id"))) - 1)
            .as("cid"))
      var cents = seedIds.join(p, "vec_id")
        .select(col("m"), col("cid"), col("sub").as("carr"))
      for (i <- 1 to iters) {
        val assigned = Similarity.assignPieces(p,
          broadcast(cents.agg(collect_list(struct(col("m"), col("cid"),
            col("carr"))).as("cents"))))
        val means = assigned.groupBy(col("m"), col("cid"))
          .agg(array((1 to w).map(j =>
            round(avg(element_at(col("sub"), j)), 6)): _*).as("carr"))
        val nc = cents.select(col("m"), col("cid"), col("carr").as("prev"))
          .join(means, Seq("m", "cid"), "left")
          .select(col("m"), col("cid"),
                  coalesce(col("carr"), col("prev")).as("carr"))
        cents = t(s"kmeans: iter $i (assign+means+join+ckpt)") {
          nc.localCheckpoint() }
      }
    }
    t("kmeansCodebooks direct (1,64,8,2)") {
      Similarity.kmeansCodebooks(emb, 1, 64, 8, 2) }
    // seed graph + rounds decomposition (kmeans memo cold here — the
    // direct call above does not populate kmeansFor's memo)
    locally {
      val g0 = t("nnSeedGraph full (incl kmeansFor first call)") {
        Similarity.nnSeedGraph(spark, d).localCheckpoint() }
      var g = g0
      for (r <- 1 to 2) {
        import org.apache.spark.sql.expressions.Window
        val rev = g
          .select(col("v").as("u"), col("u").as("v"), col("bp"))
          .withColumn("rrn", row_number().over(
            Window.partitionBy(col("u")).orderBy(col("bp").desc, col("v"))))
          .where(col("rrn") <= 8).drop("rrn")
        val b = g.select("u", "v").unionAll(rev.select("u", "v")).distinct()
        val cand = b.as("x").join(b.as("y"), col("x.v") === col("y.u"))
          .where(col("x.u") =!= col("y.v"))
          .select(col("x.u").as("u"), col("y.v").as("v")).distinct()
        val scored = cand
          .join(emb.select(col("vec_id").as("u"), col("e").as("ue")), "u")
          .join(emb.select(col("vec_id").as("v"), col("e").as("ve")), "v")
          .select(col("u"), col("v"),
            Similarity.cosBp(col("ue"), col("ve")).as("bp"))
        val topk = scored.unionAll(g).distinct()
          .withColumn("trn", row_number().over(
            Window.partitionBy(col("u")).orderBy(col("bp").desc, col("v"))))
          .where(col("trn") <= 4).drop("trn")
        g = t(s"nn round $r (ckpt)") { topk.localCheckpoint() }
      }
    }
    t("nnGraphFor full (pays its own kmeans)") {
      Similarity.nnGraphFor(spark, d) }
    t("nnMemberGraphFor <>3 (kmeans warm)") {
      Similarity.nnMemberGraphFor(spark, d, m10 =!= 3) }
    t("nnMemberGraphFor <>7 (kmeans warm)") {
      Similarity.nnMemberGraphFor(spark, d, m10 =!= 7) }

    // ── q343 fixture replicated step by step (separate dirs) ──
    val names = Seq("profsrc", "profidx", "profmeta", "profckpt")
    val dirs = names.map { n =>
      val p = SnapshotStore.fixturePath(n, d)
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
      p
    }
    val Seq(vec, idx, meta, ckpt) = dirs
    t("publish vec table (emb<>3)") {
      SnapshotStore.publish(emb.where(m10 =!= 3), vec) }
    val cfg = IndexMaintainer.Config(vec, idx, meta)
    t("bootstrap (graph+meta publish, graph memo warm)") {
      IndexMaintainer.bootstrap(spark, cfg,
        Similarity.nnMemberGraphFor(spark, d, m10 =!= 3)) }
    t("applyCdcVersion v2 (delete class 7)") {
      SnapshotStore.applyCdcVersion(spark, vec,
        emb.where(m10 === 7)
          .select(col("vec_id"), col("e"), lit("D").as("op")),
        Seq("vec_id"), "op", 2) }
    t("applyCdcVersion v3 (insert class 3)") {
      SnapshotStore.applyCdcVersion(spark, vec,
        emb.where(m10 === 3)
          .select(col("vec_id"), col("e"), lit("I").as("op")),
        Seq("vec_id"), "op", 3) }
    t("subscription: start+awaitTermination (2 batches)") {
      IndexMaintainer.start(spark, cfg, ckpt).awaitTermination() }

    // ── wave + store primitives in isolation ──
    val prevG = t("read idx v2") {
      SnapshotStore.read(spark, idx, Some(2)).localCheckpoint() }
    val embEnd = t("read vec v3") {
      SnapshotStore.read(spark, vec, Some(3))
        .select(col("vec_id"), col("e")).localCheckpoint() }
    val tombs = emb.where(m10 === 7).select(col("vec_id").as("t"))
      .localCheckpoint()
    t("nnDeleteWaveKeys (class7 out of v1 graph)") {
      Similarity.nnDeleteWaveKeys(embEnd,
        SnapshotStore.read(spark, idx, Some(1)).localCheckpoint(),
        tombs)._1 }
    val newRows = emb.where(m10 === 3).select("vec_id", "e")
      .localCheckpoint()
    t("nnInsertWaveKeys (class3 into v2 graph)") {
      val entries = Similarity.nnEntriesFrom(
        embEnd.select("vec_id")
          .join(newRows.select("vec_id"), Seq("vec_id"), "left_anti"))
      Similarity.nnInsertWaveKeys(embEnd, prevG, newRows, entries) }
    t("publishVersion of a graph frame (v90)") {
      SnapshotStore.publishVersion(prevG.select("u", "v", "bp"),
        idx, 90) }
    t("changeFeed(1..3) count") {
      SnapshotStore.changeFeed(spark, vec, 2, 3, Seq("vec_id")).count() }
    t("countOf v3") { SnapshotStore.countOf(spark, vec, 3) }

    // census costs with all memos warm
    t("q343 census [warm]") { run("q343_durable_index") }
    t("q344 fixture+census [graph memos warm]") {
      run("q344_auto_retrain_policy") }
    t("q344 census [warm]") { run("q344_auto_retrain_policy") }
    t("q346 fixture+census") { run("q346_incremental_cluster") }
    t("q346 census [warm]") { run("q346_incremental_cluster") }
    spark.stop()
  }
}
