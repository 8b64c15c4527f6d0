package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-query wall seconds + Spark job/stage/task counts for a
  * list of queries (bench protocol: noop sink, memos cleared per pass,
  * min of 2 passes for time, counts from the last pass).
  */
object ProfileTop {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger(0)

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
      })
    def clearAll(): Unit = {
      ops.Graph.clearLabelCache(); ops.Similarity.clearKmeansCache()
      ops.Similarity.clearNnGraphCache(); ops.Corpus.clearLrCache()
      sources.SnapshotStore.clearCdcCache()
      ops.IndexMaintain.clearIndexFixtureCache()
    }
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    def run(q: String): (Double, Int) = {
      val j0 = jobs.get
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, jobs.get - j0)
    }
    // warm pass (untimed)
    names.foreach { q => try run(q) catch { case e: Throwable =>
      println(s"[top] $q WARM-FAIL: ${e.getMessage}") } }
    clearAll()
    // timed pass (pass-major, like Bench)
    val r1 = names.map(q => q -> run(q)).toMap
    clearAll()
    val r2 = names.map(q => q -> run(q)).toMap
    names.foreach { q =>
      val (t1, j1) = r1(q); val (t2, j2) = r2(q)
      println(f"[top] $q%-34s ${math.min(t1, t2)}%8.3f s  jobs=${math.min(j1, j2)}%4d")
    }
    spark.stop()
  }
}
