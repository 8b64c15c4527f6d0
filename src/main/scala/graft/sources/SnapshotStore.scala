package graft.sources

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Snapshot-committed parquet table: ATOMIC publish + time travel.
  *
  * The reference's refresh contract is replace-on-refresh over a live
  * database (README.md:156–163 — consumers query mid-refresh state).
  * This is the table-format answer to that problem (the Iceberg/Delta
  * publish pattern, on plain parquet + one manifest file per version):
  *
  *  - `publish(df, table)` writes data files under `snap-vNNNNN/`, then
  *    commits by creating `_snapshots/vNNNNN.manifest` with
  *    overwrite=false — on HDFS/local an ATOMIC exclusive create. The
  *    manifest is the only commit point: a crash after the data write
  *    but before the manifest leaves an orphan directory readers never
  *    see (old snapshot stays live); two concurrent publishers race on
  *    the exclusive create, the loser re-stages under the next version
  *    (optimistic concurrency, like Delta's transaction-log protocol).
  *  - `read(spark, table)` lists `_snapshots/`, takes the max committed
  *    version, and reads EXACTLY the files that manifest names —
  *    snapshot isolation: a reader never observes a half-published
  *    version, no matter when it runs.
  *  - `read(spark, table, Some(v))` is time travel: old manifests (and
  *    their data dirs) are immutable once committed.
  *
  * Manifest format: line 1 `version=N`, line 2 `count=M`, line 3
  * `schema=DDL`, remaining lines one data file each:
  * `path<TAB>col=min..max,col=min..max` — the stats suffix carries
  * per-file min/max for every integral column (the Delta/Iceberg
  * file-skipping stats), and is optional per file (all-null columns
  * contribute no entry; readers MUST keep a file whose predicate
  * column has no stats). Deliberately transparent — no JSON parser
  * needed on the read path.
  *
  * 100 TB notes: the manifest lists FILES, so reads plan from a
  * driver-side listing of one small file instead of a recursive
  * directory scan (the S3-listing bottleneck table formats exist to
  * kill). Data files are whatever the upstream writer's partitioning
  * produced — publish adds zero data movement (no repartition, no
  * rewrite; the parquet write is the same one an unversioned sink would
  * do). The exclusive-create commit is atomic on HDFS and POSIX; on
  * S3-style stores it maps to a conditional PUT (documented caveat, as
  * with every manifest-based format).
  */
object SnapshotStore {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_snapshots")

  /** Path of `p` relative to the version's data dir (e.g.
    * `om=199601/part-...parquet` for a hive-partitioned layout, plain
    * `part-...parquet` otherwise). Rel paths — not bare names — key the
    * per-file stats and bloom side files, because a partitioned write
    * reuses one task's file name in EVERY partition dir it touches.
    * Applied to both listing paths and `_metadata.file_path` URIs, so
    * URI-form differences cancel out.
    */
  private def relPath(p: String, dataDirName: String): String =
    p.substring(p.indexOf(dataDirName) + dataDirName.length + 1)

  /** All part files under `dir`, recursively (hive partition dirs). */
  private def listParquet(f: org.apache.hadoop.fs.FileSystem,
                          dir: Path): Seq[Path] = {
    val it = f.listFiles(dir, true)
    val buf = Seq.newBuilder[Path]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        buf += p
    }
    buf.result().sortBy(_.toString)
  }

  /** Stage `df` under the version's data dir and build the manifest body
    * (count + per-file integral-column min/max stats). ONE column-pruned
    * scan over the freshly written files computes both: only the stat
    * columns' chunks are read (parquet projection), so at 100 TB the
    * stats pass touches a few percent of the written bytes — the price
    * of making every later predicate read skip-capable. `_metadata
    * .file_path` keys the per-file aggregation; stats are keyed by the
    * path RELATIVE to the version's data dir (see [[relPath]]),
    * sidestepping URI-form mismatches between the scan and the listing
    * while staying collision-free under hive partition dirs.
    */
  private def stageBody(df: DataFrame, dataDir: Path,
                        bloomCols: Seq[String] = Nil,
                        bloomBits: Long = 1L << 20,
                        partitionBy: Seq[String] = Nil): String = {
    val spark = df.sparkSession
    val f = fs(spark, dataDir)
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(dataDir.toString)
    val files = listParquet(f, dataDir).map(_.toString)
    val statCols = df.schema.fields.collect {
      case fld if Seq("tinyint", "smallint", "int", "bigint")
        .contains(fld.dataType.simpleString) => fld.name
    }.toSeq
    // reading the dir root auto-discovers hive partition dirs, so a
    // PARTITION column contributes per-file stats like any other — with
    // min = max = the dir's value. Partition pruning thereby IS min/max
    // pruning: readBetween/readPoint compose it with data-column stats
    // and blooms with zero extra machinery.
    val written = spark.read.parquet(dataDir.toString)
    val aggs = (count(lit(1)).as("n") +: statCols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"min_$c"),
      max(col(c)).cast("long").as(s"max_$c")))) ++
      bloomCols.map(c => bridge.bloomFilterAgg(xxhash64(col(c)),
        estimatedItems = 100000L, numBits = bloomBits).as(s"bloom_$c"))
    val perFile = written
      .groupBy(col("_metadata.file_path").as("fp"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val dirName = dataDir.getName
    // bloom side files land INSIDE the staged data dir, so they are
    // covered by the same atomic commit (no manifest ⇒ invisible) and
    // the same vacuum delete; partition subdirs are mirrored under
    // _bloom so rel paths stay collision-free
    if (bloomCols.nonEmpty) {
      val bloomDir = new Path(dataDir, "_bloom")
      f.mkdirs(bloomDir)
      perFile.foreach { r =>
        val rel = relPath(r.getAs[String]("fp"), dirName)
        bloomCols.foreach { c =>
          val bytes = r.getAs[Array[Byte]](s"bloom_$c")
          val bp = new Path(bloomDir, s"$rel.$c.bloom")
          f.mkdirs(bp.getParent)
          val out = f.create(bp, true)
          out.write(bytes); out.close()
        }
      }
    }
    val count0 = perFile.map(_.getAs[Long]("n")).sum
    val statsByRel = perFile.map { r =>
      val rel = relPath(r.getAs[String]("fp"), dirName)
      val parts = statCols.flatMap { c =>
        val (mn, mx) = (r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c"))
        if (mn == null || mx == null) None
        else Some(s"$c=$mn..$mx")
      }
      rel -> parts.mkString(",")
    }.toMap
    // zero-row part files (empty write tasks) are dropped from the
    // manifest outright: they can serve no read, and listing them would
    // defeat skipping (no rows ⇒ no stats ⇒ never prunable)
    val fileLines = files.collect {
      case p if statsByRel.contains(relPath(p, dirName)) =>
        val stats = statsByRel(relPath(p, dirName))
        if (stats.isEmpty) p else s"$p\t$stats"
    }
    s"count=$count0\nschema=${df.schema.toDDL}\n" + fileLines.mkString("\n")
  }

  private val ManifestRe = "v(\\d{5})\\.manifest".r

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toInt
    }.sorted
  }

  /** Atomically publish `df` as the next version; returns the version
    * committed. Loops on commit conflict (another writer claimed the
    * version): the loser re-stages its data under the next number —
    * rare-path cost, the win is that NO lock is ever held.
    */
  def publish(df: DataFrame, table: String, bloomCols: Seq[String] = Nil,
              bloomBits: Long = 1L << 20,
              partitionBy: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    val tableP = new Path(table)
    val f = fs(spark, tableP)
    var v = versions(spark, table).lastOption.getOrElse(0) + 1
    var committed = -1
    while (committed < 0) {
      val dataDir = new Path(tableP, f"snap-v$v%05d")
      val body = stageBody(df, dataDir, bloomCols, bloomBits, partitionBy)
      val manifest = new Path(manifestDir(table), f"v$v%05d.manifest")
      f.mkdirs(manifestDir(table))
      try {
        // overwrite=false ⇒ exclusive create: THE atomic commit point
        val out = f.create(manifest, false)
        out.write(s"version=$v\n$body".getBytes(UTF_8))
        out.close()
        committed = v
      } catch {
        case _: java.io.IOException =>
          // lost the race: drop the stage, re-publish as the next version
          f.delete(dataDir, true)
          v = versions(spark, table).lastOption.getOrElse(v) + 1
      }
    }
    committed
  }

  /** Idempotent publish at a FIXED version — the exactly-once building
    * block for streaming. Returns true iff THIS call committed; false
    * means the version already exists (a replayed micro-batch after a
    * crash between sink commit and checkpoint advance — the standard
    * foreachBatch dup window) and nothing was written.
    */
  def publishVersion(df: DataFrame, table: String, version: Int): Boolean = {
    val spark = df.sparkSession
    val tableP = new Path(table)
    val f = fs(spark, tableP)
    if (versions(spark, table).contains(version)) return false
    val dataDir = new Path(tableP, f"snap-v$version%05d")
    val body = stageBody(df, dataDir)
    val manifest = new Path(manifestDir(table), f"v$version%05d.manifest")
    f.mkdirs(manifestDir(table))
    try {
      val out = f.create(manifest, false)
      out.write(s"version=$version\n$body".getBytes(UTF_8))
      out.close()
      true
    } catch {
      // lost a concurrent replay race: the OTHER attempt committed this
      // exact batch — drop the re-staged files, report not-committed
      case _: java.io.IOException => f.delete(dataDir, true); false
    }
  }

  /** EXACTLY-ONCE streaming sink: each micro-batch publishes as version
    * batchId+1 via [[publishVersion]]. Structured Streaming's foreachBatch
    * is at-least-once (a batch replays if the job dies after the sink
    * ran but before the checkpoint advanced); pinning version = batchId
    * makes the replay a no-op, upgrading the sink to exactly-once — the
    * same idempotent-by-batchId discipline Delta's streaming sink uses.
    * Readers see each micro-batch atomically (manifest commit) and can
    * time-travel the stream's history.
    */
  def streamSink(stream: DataFrame, table: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishVersion(batch, table, batchId.toInt + 1); ()
      }
      .start()

  /** Retention: drop all but the newest `keepLast` snapshots — data
    * dirs AND manifests (Delta VACUUM + log cleanup in one). Kept
    * versions stay time-travelable; expired reads fail loudly with the
    * surviving version list. Safe order: manifest first (the version
    * disappears from readers atomically), then the data dir.
    */
  def vacuum(spark: SparkSession, table: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = versions(spark, table)
    val expire = all.dropRight(keepLast)
    val f = fs(spark, new Path(table))
    expire.foreach { v =>
      f.delete(new Path(manifestDir(table), f"v$v%05d.manifest"), false)
      f.delete(new Path(table, f"snap-v$v%05d"), true)
    }
    expire
  }

  /** GC: delete `snap-v*` data dirs with NO committed manifest — crash
    * leftovers (stage finished, commit never happened) and lost-race
    * stages whose cleanup delete failed. `minAgeMs` is the safety fence
    * every manifest-format GC needs: a CONCURRENT publisher's
    * in-progress stage is also manifest-less, so only dirs whose last
    * modification is older than the fence are eligible (Delta VACUUM's
    * retention-window reasoning — set it well above the longest
    * plausible stage time in production; 0 only in tests).
    */
  def gcOrphans(spark: SparkSession, table: String,
                minAgeMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val tableP = new Path(table)
    val f = fs(spark, tableP)
    if (!f.exists(tableP)) return Seq.empty
    val committed = versions(spark, table).map(v => f"snap-v$v%05d").toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    f.listStatus(tableP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("snap-v")
        && !committed.contains(st.getPath.getName)
        && st.getModificationTime <= cutoff)
      .map { st => f.delete(st.getPath, true); st.getPath.getName }
      .sorted
  }

  /** Read a committed snapshot (default: latest). Reads exactly the
    * manifest's file list — never a directory scan of the table root.
    */
  def read(spark: SparkSession, table: String,
           version: Option[Int] = None): DataFrame = {
    val committed = versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    val v = version.getOrElse(committed.last)
    require(committed.contains(v),
      s"version $v not committed (have: ${committed.mkString(",")})")
    val lines = manifestLines(spark, table, v)
    val files = lines.drop(3).filter(_.nonEmpty).map(_.split('\t')(0))
    loadFiles(spark, table, v, files, lines)
  }

  /** Load a version's (possibly pruned) file list. basePath = the
    * version's data dir, so hive partition dirs rebuild their column;
    * the result is then cast/ordered to the MANIFEST schema — partition
    * discovery infers `om=199601` as int whatever the writer's type
    * was, and a reader must not see that drift.
    */
  private def loadFiles(spark: SparkSession, table: String, v: Int,
                        files: Seq[String],
                        lines: List[String]): DataFrame =
    if (files.isEmpty) emptyFrame(spark, lines)
    else {
      val dataDir = new Path(new Path(table), f"snap-v$v%05d")
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL(lines(2).stripPrefix("schema="))
      spark.read.option("basePath", dataDir.toString).parquet(files: _*)
        .select(schema.fields.toIndexedSeq
          .map(fl => col(fl.name).cast(fl.dataType).as(fl.name)): _*)
    }

  private def emptyFrame(spark: SparkSession, lines: List[String]): DataFrame = {
    // empty snapshot / all files pruned: schema comes from the manifest
    val ddl = lines(2).stripPrefix("schema=")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** Per-file stats of a committed version: file path → column →
    * (min, max). Files whose line has no stats suffix map to empty.
    */
  def statsOf(spark: SparkSession, table: String,
              version: Int): Seq[(String, Map[String, (Long, Long)])] =
    manifestLines(spark, table, version).drop(3).filter(_.nonEmpty).map { line =>
      val parts = line.split('\t')
      val stats = if (parts.length < 2) Map.empty[String, (Long, Long)]
      else parts(1).split(',').map { kv =>
        val Array(c, range) = kv.split("=", 2)
        val Array(lo, hi) = range.split("\\.\\.", 2)
        c -> (lo.toLong, hi.toLong)
      }.toMap
      parts(0) -> stats
    }

  /** A stat-pruned read: `df` contains exactly the rows of the snapshot
    * with `column` BETWEEN lo AND hi, but only `filesKept` of
    * `filesTotal` data files were ever opened — the manifest's min/max
    * ranges prove the rest can hold no matching row. Files with no
    * stats for `column` are always kept (stats are an optimization,
    * never a correctness gate), and the residual filter still runs over
    * what's read, so pruning can only skip work, not change answers.
    * This is the file-skipping half of every table format's read path;
    * it rewards writers that cluster the predicate column (contiguous
    * buckets, z-order — q132's lever) with near-perfect skip rates.
    */
  case class PrunedRead(df: DataFrame, filesTotal: Int, filesKept: Int)

  def readBetween(spark: SparkSession, table: String, version: Option[Int],
                  column: String, lo: Long, hi: Long): PrunedRead = {
    val committed = versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    val v = version.getOrElse(committed.last)
    require(committed.contains(v),
      s"version $v not committed (have: ${committed.mkString(",")})")
    val all = statsOf(spark, table, v)
    val kept = all.collect {
      case (p, st) if st.get(column).forall { case (mn, mx) => mx >= lo && mn <= hi } => p
    }
    val base = loadFiles(spark, table, v, kept,
                         manifestLines(spark, table, v))
    PrunedRead(base.where(col(column).between(lo, hi)), all.size, kept.size)
  }

  /** Point-lookup read through the per-file BLOOM index (+ min/max
    * stats): keep a file only if its range could contain a probed value
    * AND, when a bloom side file exists for `column`, at least one
    * probed value might be a member. Blooms are the complement of range
    * stats: ranges prune CLUSTERED layouts, blooms prune SCATTERED ones
    * (a hash-partitioned write leaves every file spanning the full key
    * range — ranges keep everything, the bloom still rules out all but
    * ~1 file per key). False positives only cost an extra file read;
    * false negatives are impossible, and the residual IN filter runs
    * regardless. The probe hashes ride through the same xxhash64 the
    * build used (Spark's runtime-filter contract).
    */
  def readPoint(spark: SparkSession, table: String, version: Option[Int],
                column: String, values: Seq[Long]): PrunedRead = {
    require(values.nonEmpty, "readPoint needs at least one probe value")
    val committed = versions(spark, table)
    require(committed.nonEmpty, s"no committed snapshots under $table")
    val v = version.getOrElse(committed.last)
    require(committed.contains(v),
      s"version $v not committed (have: ${committed.mkString(",")})")
    import spark.implicits._
    val hashes = values.toDF("v").select(xxhash64(col("v")))
      .as[Long].collect()
    val dataDirName = f"snap-v$v%05d"
    val bloomDir = new Path(new Path(table, dataDirName), "_bloom")
    val f = fs(spark, bloomDir)
    def bloomKeeps(rel: String): Boolean = {
      val bp = new Path(bloomDir, s"$rel.$column.bloom")
      if (!f.exists(bp)) true // no index for this file/column: must keep
      else {
        val in = f.open(bp)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64 * 1024)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
        val bloom = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new ByteArrayInputStream(bytes))
        hashes.exists(bloom.mightContainLong)
      }
    }
    val all = statsOf(spark, table, v)
    val kept = all.collect {
      case (p, st) if st.get(column).forall { case (mn, mx) =>
            values.exists(x => x >= mn && x <= mx) } &&
          bloomKeeps(relPath(p, dataDirName)) => p
    }
    val base = loadFiles(spark, table, v, kept,
                         manifestLines(spark, table, v))
    PrunedRead(base.where(col(column).isin(values: _*)), all.size, kept.size)
  }

  /** OPTIMIZE: republish the latest snapshot's data as `numFiles` files
    * (small-file compaction — the bin-packing half of Delta OPTIMIZE;
    * q132 covers the clustering half). The rewrite is a new VERSION:
    * readers mid-flight keep their snapshot, time travel still serves
    * the old layout, and a crash mid-compaction is invisible (no
    * manifest, no version). Data is byte-identical by construction —
    * the spec pins diff(vOld, vNew) = all-unchanged.
    */
  def compact(spark: SparkSession, table: String, numFiles: Int): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    publish(read(spark, table).coalesce(numFiles), table)
  }

  /** Manifest-declared row count (metadata read, no data scan). */
  def countOf(spark: SparkSession, table: String, version: Int): Long =
    manifestLines(spark, table, version)(1).stripPrefix("count=").toLong

  private def manifestLines(spark: SparkSession, table: String,
                            v: Int): List[String] = {
    val manifest = new Path(manifestDir(table), f"v$v%05d.manifest")
    val in = fs(spark, manifest).open(manifest)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** CHANGE DATA CAPTURE between two committed versions: full-outer join
    * on the key, classify each row insert/delete/update/unchanged. Non-key
    * comparison is null-safe struct equality (`<=>`), so NULL↔value
    * flips count as updates and NULL↔NULL as unchanged. At 100 TB this
    * is one co-partitioned join keyed by the table key — the same cost
    * as any merge — and it needs NO change log: any two retained
    * versions diff after the fact (the snapshot store's immutability is
    * what makes that sound).
    */
  def diff(spark: SparkSession, table: String, vOld: Int, vNew: Int,
           keyCols: Seq[String]): DataFrame = {
    val old = read(spark, table, Some(vOld))
    val neu = read(spark, table, Some(vNew))
    require(old.columns.sameElements(neu.columns),
      s"schema drift between v$vOld and v$vNew: " +
        s"${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val payload = old.columns.filterNot(keyCols.contains)
    def pack(df: DataFrame, side: String) = df.select(
      keyCols.map(col) :+
        struct(payload.map(col): _*).as(s"${side}_payload") :+
        lit(1).as(s"${side}_present"): _*)
    pack(old, "o").join(pack(neu, "n"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("o_present").isNull, lit("insert"))
          .when(col("n_present").isNull, lit("delete"))
          .when(col("o_payload") <=> col("n_payload"), lit("unchanged"))
          .otherwise(lit("update")).as("change_type"): _*)
  }

  /** Full-row CDC: [[diff]]'s classification plus the NEW row payload
    * for insert/update (what a downstream MERGE needs). Same one
    * co-partitioned full-outer join.
    */
  def diffRows(spark: SparkSession, table: String, vOld: Int, vNew: Int,
               keyCols: Seq[String]): DataFrame = {
    val old = read(spark, table, Some(vOld))
    val neu = read(spark, table, Some(vNew))
    require(old.columns.sameElements(neu.columns),
      s"schema drift between v$vOld and v$vNew")
    val payload = old.columns.filterNot(keyCols.contains)
    def pack(df: DataFrame, side: String) = df.select(
      keyCols.map(col) :+
        struct(payload.map(col): _*).as(s"${side}_payload"): _*)
    pack(old, "o").join(pack(neu, "n"), keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        when(col("o_payload").isNull && col("n_payload").isNotNull,
          lit("insert"))
          .when(col("n_payload").isNull, lit("delete"))
          .when(col("o_payload") <=> col("n_payload"), lit("unchanged"))
          .otherwise(lit("update")).as("change_type")) ++
        payload.map(c => col(s"n_payload.$c").as(c)): _*)
  }

  /** MERGE: apply a [[diffRows]] changeset to a base frame — deletes
    * drop, updates/inserts take the changeset's payload, unchanged keys
    * keep the base row. One co-partitioned outer join, same key; the
    * inverse of diff, and the spec pins the round-trip theorem
    * `apply(v1, diffRows(v1→v2)) ≡ v2`.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains)
    val packedBase = base.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as("b_payload"): _*)
    val packedChg = changes.select(
      keyCols.map(col) :+ col("change_type") :+
        struct(payload.map(col): _*).as("c_payload"): _*)
    packedBase.join(packedChg, keyCols, "full_outer")
      .where(coalesce(col("change_type"), lit("")) =!= "delete")
      .select(keyCols.map(col) :+
        when(col("change_type").isin("insert", "update"), col("c_payload"))
          .otherwise(col("b_payload")).as("m"): _*)
      .select(keyCols.map(col) ++ payload.map(c => col(s"m.$c").as(c)): _*)
  }

  // ─── q130: snapshot round-trip + time travel, oracle-checked ─────────
  // Publish v1 (even doc_ids) then v2 (all docs) into a fresh table,
  // then read v1 by TIME TRAVEL and v2 as latest — the census of each
  // must equal the census of the frames that were published. The DuckDB
  // twin computes both censuses directly from `documents`, so the hash
  // only matches if publish→read is lossless AND time travel serves the
  // v1 bytes untouched after v2 landed. (The table dir is rebuilt each
  // run — version numbers restart at 1, keeping the output
  // deterministic under bench's repeated passes.)
  def q130SnapshotRoundtrip(s: SparkSession, d: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") + "/graft-snapshots/docs"
    val tableP = new Path(table)
    fs(s, tableP).delete(tableP, true)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    publish(docs.where(col("doc_id") % 2 === 0), table)
    publish(docs, table)
    def census(df: DataFrame, v: Int) =
      df.agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"))
        .select(lit(v).as("version"), col("n_docs"), col("total_chars"))
    census(read(s, table, Some(1)), 1)
      .unionAll(census(read(s, table), 2))
      .orderBy(col("version"))
  }

  val q130Sql: String =
    """SELECT 1 AS version, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT) FROM documents
      |ORDER BY version""".stripMargin

  // ─── q133: CDC census between two published versions ─────────────────
  // v1 = even doc_ids, untouched; v2 = doc_ids not divisible by 3, with
  // n_chars bumped by 7 where doc_id % 5 = 0. The diff therefore has all
  // four change classes with closed-form membership, which the DuckDB
  // twin derives directly from `documents` — the hash matches only if
  // the store's versions are faithful AND the CDC classification
  // (including null-safe payload equality) is right.
  def q133SnapshotCdc(s: SparkSession, d: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") + "/graft-snapshots/cdc"
    val tableP = new Path(table)
    fs(s, tableP).delete(tableP, true)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    publish(docs.where(col("doc_id") % 2 === 0), table)
    publish(docs.where(col("doc_id") % 3 =!= 0)
      .withColumn("n_chars",
        when(col("doc_id") % 5 === 0, col("n_chars") + 7)
          .otherwise(col("n_chars"))), table)
    diff(s, table, 1, 2, Seq("doc_id"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("change_type"))
  }

  val q133Sql: String =
    """WITH v1 AS (
      |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0),
      |v2 AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 5 = 0 THEN n_chars + 7 ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 3 <> 0),
      |d AS (
      |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.doc_id IS NULL THEN 'insert'
      |         WHEN v2.doc_id IS NULL THEN 'delete'
      |         WHEN v1.lang IS NOT DISTINCT FROM v2.lang
      |          AND v1.n_chars IS NOT DISTINCT FROM v2.n_chars
      |           THEN 'unchanged'
      |         ELSE 'update' END AS change_type
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
      |SELECT change_type, count(*) AS n
      |FROM d
      |GROUP BY change_type
      |ORDER BY change_type""".stripMargin

  // ─── q148: stat-pruned (file-skipping) snapshot read ─────────────────
  // Publish `documents` clustered into contiguous doc_id buckets (100
  // ids per bucket, hash-routed to 32 write tasks — deterministic
  // layout), then read doc_id BETWEEN 100 AND 299 through the manifest's
  // min/max stats. The per-lang census must equal DuckDB's direct filter
  // of `documents` — pruning may only skip files, never rows. The
  // skip-rate itself (filesKept < filesTotal) is layout-dependent and is
  // asserted in SnapshotStoreSpec on a controlled layout instead.
  def q148SkippingRead(s: SparkSession, d: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") + "/graft-snapshots/skip"
    val tableP = new Path(table)
    fs(s, tableP).delete(tableP, true)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("b", floor(col("doc_id") / 100))
      .repartition(32, col("b")).drop("b")
    publish(docs, table)
    readBetween(s, table, None, "doc_id", 100L, 299L).df
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy(col("lang"))
  }

  val q148Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  min(doc_id) AS first_id, max(doc_id) AS last_id
      |FROM documents WHERE doc_id BETWEEN 100 AND 299
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ─── q151: bloom-indexed point lookup ────────────────────────────────
  // The layout is deliberately HOSTILE to range stats: hash-partitioned
  // on n_chars, so every file spans ~the full doc_id range and min/max
  // pruning keeps everything. The per-file bloom index still routes each
  // probed key to the file(s) that might hold it. The census through the
  // pruned read must equal DuckDB's direct IN-filter — blooms may only
  // skip files, never rows (false negatives impossible by construction).
  def q151BloomLookup(s: SparkSession, d: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") + "/graft-snapshots/bloomidx"
    val tableP = new Path(table)
    fs(s, tableP).delete(tableP, true)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(24, col("n_chars"))
    publish(docs, table, bloomCols = Seq("doc_id"))
    readPoint(s, table, None, "doc_id", Seq(7L, 97L, 211L, 350L, 444L)).df
      .orderBy(col("doc_id"))
  }

  val q151Sql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id IN (7, 97, 211, 350, 444)
      |ORDER BY doc_id""".stripMargin

  // ─── q210: hive-PARTITIONED snapshot + partition-pruned read ─────────
  // The standard warehouse layout lever the flat store lacked (SURVEY §8
  // assumes date-partitioned facts): publish orders partitioned by
  // month (`om=199601/` hive dirs), one file per month by construction
  // (repartition on the partition column first), then read one year
  // through readBetween — the partition column's dir value becomes a
  // min=max per-file stat at publish, so PARTITION PRUNING falls out of
  // the existing stats machinery and composes with data-column
  // stats/blooms for free. The files-opened counters ride in the output
  // AS DATA: the oracle derives them from the month population itself
  // (files_total = |distinct months|, files_kept = |months in range|),
  // so a pruning regression — opening more than the 12 in-range files —
  // is a hash mismatch, not just a slow read. Census ≡ DuckDB's direct
  // filter of the raw table: pruning may skip files, never rows.
  def q210PartitionedRead(s: SparkSession, d: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") + "/graft-snapshots/parts"
    val tableP = new Path(table)
    fs(s, tableP).delete(tableP, true)
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("int").as("om"))
      .repartition(8, col("om"))
    publish(orders, table, partitionBy = Seq("om"))
    val pr = readBetween(s, table, None, "om", 199601L, 199612L)
    pr.df.groupBy(col("om"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("total"),
           min(col("o_orderkey")).as("first_key"))
      .select(col("om").cast("long").as("om"), col("n_orders"),
              col("total"), col("first_key"),
              lit(pr.filesTotal.toLong).as("files_total"),
              lit(pr.filesKept.toLong).as("files_kept"))
      .orderBy(col("om"))
  }

  val q210Sql: String =
    """WITH m AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS om
      |  FROM orders),
      |cnt AS (
      |  SELECT CAST(count(DISTINCT om) AS BIGINT) AS files_total,
      |    CAST(count(DISTINCT CASE WHEN om BETWEEN 199601 AND 199612
      |                             THEN om END) AS BIGINT) AS files_kept
      |  FROM m)
      |SELECT om, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total,
      |  min(o_orderkey) AS first_key,
      |  (SELECT files_total FROM cnt) AS files_total,
      |  (SELECT files_kept FROM cnt) AS files_kept
      |FROM m WHERE om BETWEEN 199601 AND 199612
      |GROUP BY om
      |ORDER BY om""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_snapshot_roundtrip" -> (q130SnapshotRoundtrip _),
    "q133_snapshot_cdc" -> (q133SnapshotCdc _),
    "q148_skipping_read" -> (q148SkippingRead _),
    "q151_bloom_lookup" -> (q151BloomLookup _),
    "q210_partitioned_read" -> (q210PartitionedRead _))

  val oracleSql: Map[String, String] = Map(
    "q130_snapshot_roundtrip" -> q130Sql,
    "q133_snapshot_cdc" -> q133Sql,
    "q148_skipping_read" -> q148Sql,
    "q151_bloom_lookup" -> q151Sql,
    "q210_partitioned_read" -> q210Sql)
}
