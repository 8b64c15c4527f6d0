package graft.sources

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (the LLM-training-data pattern — BASELINE.json
  * north-star "multimodal columns").
  *
  * The Spark-side plumbing is real: binary columns, typed metadata
  * structs, per-partition batched feature extraction, and an
  * oracle-checked catalog query (q58). The CODEC is a deterministic fake —
  * this container ships no image/audio libraries — and is confined to
  * [[MediaCodec]], clearly marked, so a real decoder drops in without
  * touching schema, partitioning, or batch shape.
  *
  * At 100 TB: payloads dominate row size, so every transformation below
  * projects metadata OUT of the payload once and then drops the payload
  * column before any shuffle — media bytes never ride a shuffle.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Int, fingerprint: String,
    width: Int, height: Int, n_frames: Int)

  /** ──────────────────────────  STUB  ──────────────────────────────────
    * Deterministic fake decoder. A real implementation would parse the
    * JPEG/WAV/MP4 container headers here (and is the ONLY thing to
    * replace); the fake derives metadata from the byte content so tests
    * are exact and reproducible.
    */
  object MediaCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val width = (n % 64) * 10 + 32
      val height = (n % 48) * 10 + 24
      val frames = if (kind == "video") n % 7 + 1 else 1
      (width, height, frames)
    }
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * `mapInPandas` decode UDF: one iterator pass per partition, payloads
    * decoded in place, only fixed-width features emitted. `mapPartitions`
    * is justified here (and only here): an opaque codec is genuine
    * imperative per-record logic no Catalyst expression can express.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = MediaCodec.decode(r.kind, r.payload)
        val fp = digest.digest(r.payload).map("%02x".format(_)).mkString
        digest.reset()
        MediaFeatures(r.media_id, r.kind, r.payload.length, fp, w, h, f)
      }
    }
  }

  final case class ResizedMedia(
    media_id: Long, kind: String, width: Int, height: Int, n_bytes: Int)

  /** Batched resize — STUB geometry (a real impl rescales pixels; the
    * fake derives the output byte count deterministically from input size
    * and target box). Same per-partition batch shape as
    * [[extractFeatures]]: payloads in, fixed-width rows out, nothing
    * media-sized survives to a shuffle.
    */
  def resizeBatch(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val nOut = math.min(r.payload.length, w * h / 8) // ── STUB ──
      ResizedMedia(r.media_id, r.kind, w, h, nOut)
    })
  }

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_fp: String)

  /** Frame sampling: every `stride`-th frame of each video payload,
    * emitted as (media_id, frame_idx, frame fingerprint). The per-frame
    * "decode" is the stub (fingerprint = md5(payload ++ ":idx"), frame
    * count from [[MediaCodec.decode]]); the SHAPE is the real thing — a
    * flatMap that fans one video row out to its sampled frames inside the
    * partition iterator, so frame explosion happens before any shuffle
    * and carries 16-byte digests, not frames.
    */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val (_, _, nFrames) = MediaCodec.decode(r.kind, r.payload)
        (0 until nFrames by stride).map { idx =>
          md5.reset()
          md5.update(r.payload)
          md5.update(s":$idx".getBytes("UTF-8"))
          FrameSample(r.media_id, idx,
            md5.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Synthetic media catalog over `documents`: utf-8 bytes as payload,
    * kind assigned by id. Stands in for a parquet table with a real binary
    * column; schema and column shapes are what a 100 TB media lake uses.
    */
  def mediaCatalog(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  // ─── q58: media catalog metadata (oracle-checked plumbing) ────────────
  // Metadata projected from the binary column with codegen'd built-ins
  // (byte length, sha2 fingerprint) + the deterministic fake geometry —
  // the payload itself never leaves the scan projection.
  def q58MultimodalMeta(s: SparkSession, d: String): DataFrame =
    mediaCatalog(s, d)
      .select(
        col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("fingerprint"))
      .withColumn("width", (pmod(col("n_bytes"), lit(64)) * 10 + 32))
      .withColumn("height", (pmod(col("n_bytes"), lit(48)) * 10 + 24))
      .orderBy(col("media_id"))

  val q58Sql: String =
    """SELECT media_id, kind, n_bytes, fingerprint,
      |  n_bytes % 64 * 10 + 32 AS width,
      |  n_bytes % 48 * 10 + 24 AS height
      |FROM (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    sha256(text) AS fingerprint
      |  FROM documents)
      |ORDER BY media_id""".stripMargin

  // ─── q92: frame sampling through the REAL batched-codec path ──────────
  // Runs mediaCatalog → Dataset[MediaRecord] → sampleFrames(stride=2) —
  // the actual mapPartitions plumbing, not an expression re-derivation —
  // and the oracle recomputes the stub's arithmetic (n_frames = n%7+1,
  // fp = md5(text || ':' || idx)) relationally. Video rows only.
  def q92FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val videos = mediaCatalog(s, d).where(col("kind") === "video")
      .as[MediaRecord]
    sampleFrames(videos, 2).toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val q92Sql: String =
    """SELECT media_id, CAST(f AS INT) AS frame_idx,
      |  md5(text || ':' || CAST(f AS VARCHAR)) AS frame_fp
      |FROM (
      |  SELECT doc_id AS media_id, text,
      |    unnest(generate_series(0, octet_length(encode(text)) % 7, 2))
      |      AS f
      |  FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_multimodal_meta" -> (q58MultimodalMeta _),
    "q92_frame_sample"    -> (q92FrameSample _),
  )

  val oracleSql: Map[String, String] = Map(
    "q58_multimodal_meta" -> q58Sql,
    "q92_frame_sample"    -> q92Sql,
  )
}
