package graft.sources

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (the LLM-training-data pattern — BASELINE.json
  * north-star "multimodal columns").
  *
  * The Spark-side plumbing is real: binary columns, typed metadata
  * structs, per-partition batched feature extraction, and oracle-checked
  * catalog queries (q58/q92/q98). The codec parses REAL containers —
  * BMP and WAV via pure-JVM header parsers (q98), PNG via the JDK's own
  * `javax.imageio` reader (q320, lossless and deterministic) — and
  * falls back to a clearly marked deterministic fake for formats whose
  * decoders need native libraries this container doesn't ship (JPEG,
  * MP4 — decoder-dependent, so census-as-data territory); the fake is
  * confined to [[MediaCodec]], so further decoders drop in without
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

  /** Container codec. [[decode]] sniffs the payload's magic bytes and
    * parses REAL containers in pure JVM — BMP (`BITMAPINFOHEADER`) and
    * WAV (RIFF chunk walk) — falling back to the deterministic fake for
    * anything else (the synthetic utf-8 catalog, and stand-ins for
    * formats whose decoders need native libs this container lacks).
    *
    * Decoded tuple is (width, height, n_frames); for audio the same
    * slots carry (sample_rate, channels, sample_frames) — one fixed
    * shape keeps the feature schema stable across kinds.
    */
  object MediaCodec {
    private def le16(p: Array[Byte], off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    private def ascii4(p: Array[Byte], off: Int): String =
      new String(p, off, 4, "US-ASCII")

    /** BMP: 'BM' magic; BITMAPINFOHEADER width/height at byte 18/22
      * (LE int32). Height may be negative (top-down rows) — the image is
      * |height| rows either way. Single frame by definition.
      */
    private[graft] def decodeBmp(p: Array[Byte]): Option[(Int, Int, Int)] =
      if (p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
          le32(p, 14) >= 40) // info-header size: BITMAPINFOHEADER or later
        Some((le32(p, 18), math.abs(le32(p, 22)), 1))
      else None

    /** WAV: RIFF/WAVE; chunks are walked (not assumed at fixed offsets —
      * real files interleave LIST/fact chunks) to the `fmt ` chunk
      * (channels LE16 at +2, sample rate LE32 at +4, block align LE16 at
      * +12 within the chunk body) and the `data` chunk (byte size =
      * chunk size). Sample frames = data bytes / block align. Chunk
      * bodies are word-aligned: odd sizes carry one pad byte.
      */
    private[graft] def decodeWav(p: Array[Byte]): Option[(Int, Int, Int)] =
      if (p.length < 44 || ascii4(p, 0) != "RIFF" || ascii4(p, 8) != "WAVE")
        None
      else {
        var off = 12
        var rate, channels, blockAlign, dataBytes = -1
        while (off + 8 <= p.length && (rate < 0 || dataBytes < 0)) {
          val id = ascii4(p, off)
          val size = le32(p, off + 4)
          if (id == "fmt " && off + 8 + 16 <= p.length) {
            channels = le16(p, off + 10)
            rate = le32(p, off + 12)
            blockAlign = le16(p, off + 20)
          } else if (id == "data") dataBytes = size
          // a corrupt/overflowed chunk size must not walk backwards
          off = if (size < 0) p.length else off + 8 + size + (size & 1)
        }
        if (rate > 0 && blockAlign > 0 && dataBytes >= 0)
          Some((rate, channels, dataBytes / blockAlign))
        else None
      }

    /** SAMPLE-level WAV decode: the same RIFF walk as [[decodeWav]], but
      * folding the `data` chunk's little-endian PCM16 samples into
      * fixed-width stats — (n_samples, Σ sample², n_quiet) with quiet =
      * |s| < `quietBelow` — inside the codec, so the media-sized byte
      * array dies in the partition that decoded it. Integer-exact: a
      * 16-bit sample squares below 2^30; 2^33 samples fit the Long sum.
      */
    private[graft] def pcm16Stats(p: Array[Byte], quietBelow: Int)
        : Option[(Long, Long, Long)] =
      if (p.length < 44 || ascii4(p, 0) != "RIFF" || ascii4(p, 8) != "WAVE")
        None
      else {
        var off = 12
        var dataOff, dataBytes = -1
        while (off + 8 <= p.length && dataBytes < 0) {
          val id = ascii4(p, off)
          val size = le32(p, off + 4)
          if (id == "data") { dataOff = off + 8; dataBytes = size }
          off = if (size < 0) p.length else off + 8 + size + (size & 1)
        }
        if (dataBytes < 0) None
        else {
          val end = math.min(dataOff + dataBytes, p.length)
          var i = dataOff
          var n = 0L; var ss = 0L; var quiet = 0L
          while (i + 1 < end) {
            val s = ((p(i) & 0xff) | (p(i + 1) << 8)).toShort.toInt
            n += 1; ss += s.toLong * s
            if (math.abs(s) < quietBelow) quiet += 1
            i += 2
          }
          Some((n, ss, quiet))
        }
      }

    /** SAMPLE-level WAV decode returning the raw PCM16 samples (the
      * handle the spectral path needs) — same RIFF chunk walk as
      * [[pcm16Stats]]. The array lives only inside the partition that
      * decoded it; callers fold it to fixed-width features immediately.
      */
    private[graft] def pcm16Samples(p: Array[Byte]): Option[Array[Int]] =
      if (p.length < 44 || ascii4(p, 0) != "RIFF" || ascii4(p, 8) != "WAVE")
        None
      else {
        var off = 12
        var dataOff, dataBytes = -1
        while (off + 8 <= p.length && dataBytes < 0) {
          val id = ascii4(p, off)
          val size = le32(p, off + 4)
          if (id == "data") { dataOff = off + 8; dataBytes = size }
          off = if (size < 0) p.length else off + 8 + size + (size & 1)
        }
        if (dataBytes < 0) None
        else {
          val end = math.min(dataOff + dataBytes, p.length)
          val out = new Array[Int]((end - dataOff) / 2)
          var i = dataOff; var j = 0
          while (i + 1 < end) {
            out(j) = ((p(i) & 0xff) | (p(i + 1) << 8)).toShort.toInt
            i += 2; j += 1
          }
          Some(out)
        }
      }

    /** ──────────────────────────  STUB  ────────────────────────────────
      * Deterministic fake for payloads that are no recognized container
      * (derives metadata from byte content so tests stay exact). Real
      * JPEG/MP4 decoding needs native libs this container doesn't ship.
      */
    private def decodeFake(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val width = (n % 64) * 10 + 32
      val height = (n % 48) * 10 + 24
      val frames = if (kind == "video") n % 7 + 1 else 1
      (width, height, frames)
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
      decodeBmp(payload)
        .orElse(decodeWav(payload))
        .orElse(decodePngMeta(payload))
        .getOrElse(decodeFake(kind, payload))

    private def be32(p: Array[Byte], off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

    private def isPng(p: Array[Byte]): Boolean =
      p.length >= 24 && (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte

    /** PNG metadata from the IHDR chunk (always first, fixed offsets):
      * big-endian width/height, one frame. Header-only — no inflate. */
    private[graft] def decodePngMeta(p: Array[Byte]): Option[(Int, Int, Int)] =
      if (!isPng(p)) None else Some((be32(p, 16), be32(p, 20), 1))

    /** REAL pixel-level PNG decode through `javax.imageio` — pure JDK,
      * lossless and deterministic for PNG (unlike JPEG, whose decoders
      * legitimately differ — that format stays census-as-data). Returns
      * the same (w, h, gray) contract as [[decodeBmpGray]]: per-pixel
      * channel sum in top-down row-major order (a 1-band grayscale
      * raster contributes its single sample; RGB sums 3 bands, matching
      * the BMP b+g+r convention).
      */
    private[graft] def decodePngGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
      if (!isPng(p)) None
      else scala.util.Try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p))
        require(img != null, "ImageIO could not read PNG")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bands = math.min(raster.getNumBands, 3)
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var sum = 0
            var b = 0
            while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
            gray(y * w + x) = sum
            x += 1
          }
          y += 1
        }
        (w, h, gray)
      }.toOption

    /** Pixel-level BMP decode for 24-bpp images: returns (w, h, gray)
      * where `gray(y*w + x)` is the per-pixel channel sum (b+g+r — a
      * grayscale proxy that skips the /3, which every consumer below
      * only ever compares, never displays) in TOP-DOWN row-major order.
      * Honors the header's pixel-array offset (byte 10), the 4-byte row
      * padding rule, and both row orders (positive height = bottom-up
      * rows, the format's default; negative = top-down).
      */
    private[graft] def decodeBmpGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
      if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte ||
          le32(p, 14) < 40 || le16(p, 28) != 24) None
      else {
        val pixOff = le32(p, 10)
        val w = le32(p, 18)
        val rawH = le32(p, 22)
        val h = math.abs(rawH)
        val bottomUp = rawH > 0
        val rowSize = ((w * 3 + 3) / 4) * 4
        if (w <= 0 || h == 0 || pixOff + rowSize.toLong * h > p.length) None
        else {
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            val fileRow = if (bottomUp) h - 1 - y else y
            val base = pixOff + fileRow * rowSize
            var x = 0
            while (x < w) {
              val off = base + x * 3
              gray(y * w + x) =
                (p(off) & 0xff) + (p(off + 1) & 0xff) + (p(off + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, gray))
        }
      }
  }

  /** 64-bit average hash (aHash) over a decoded grayscale grid: sample an
    * 8×8 nearest-neighbor grid (y = ⌊sy·h/8⌋, x = ⌊sx·w/8⌋ — the
    * standard "resize to 8×8" degenerated to point sampling, which both
    * engines can reproduce exactly), then bit k = 1 iff sample k is
    * STRICTLY above the 64-sample mean. The mean compare is the integer
    * cross-multiplication `v·64 > Σv` — float-free, and invariant under
    * any uniform brightness shift (v→v+c shifts both sides by 64c), which
    * is the property that makes aHash a perceptual rather than exact
    * fingerprint. Returned as a 64-char '0'/'1' string (bit 0 first):
    * lexicographic equality == hash equality in every engine.
    */
  private[graft] def aHash64(w: Int, h: Int, gray: Array[Int]): String = {
    val v = new Array[Int](64)
    var total = 0L
    var k = 0
    while (k < 64) {
      v(k) = gray((k / 8 * h / 8) * w + (k % 8 * w / 8))
      total += v(k)
      k += 1
    }
    val sb = new java.lang.StringBuilder(64)
    k = 0
    while (k < 64) {
      sb.append(if (v(k).toLong * 64 > total) '1' else '0')
      k += 1
    }
    sb.toString
  }

  /** Fixture-side builders emitting REAL container bytes (the files any
    * external BMP/WAV reader would accept) — used by [[bmpWavCatalog]] to
    * put genuine binaries through the codec seam. Kept separate from
    * [[MediaCodec]]: encode and decode never share offset constants in
    * code, and MultimodalSpec additionally pins decode against
    * hand-written golden hex so a symmetric encode/decode bug cannot
    * pass.
    */
  private[graft] object MediaEncode {
    import java.nio.{ByteBuffer, ByteOrder}
    private def cyclic(buf: ByteBuffer, n: Int, content: Array[Byte]): Unit = {
      var i = 0
      while (i < n) {
        buf.put(if (content.isEmpty) 0.toByte else content(i % content.length))
        i += 1
      }
    }
    /** Minimal 24-bpp bottom-up BMP: 14-byte file header +
      * 40-byte BITMAPINFOHEADER + zero-padded pixel rows filled from
      * `content`. Rows pad to 4-byte boundaries (the format's rule).
      */
    def bmp(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val rowSize = ((width * 3 + 3) / 4) * 4
      val dataSize = rowSize * height
      val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54)
      buf.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24).putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      cyclic(buf, dataSize, content)
      buf.array()
    }
    /** Minimal 8-bit GRAYSCALE PNG (color type 0): signature + IHDR +
      * one IDAT (zlib-deflated scanlines, filter 0 per row, pixel bytes
      * cyclic from `content`) + IEND, CRC32s per the spec — pure JDK
      * (`Deflater`/`CRC32`), a file any external PNG reader accepts.
      */
    def png(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val out = new java.io.ByteArrayOutputStream()
      def chunk(tag: String, data: Array[Byte]): Unit = {
        val t = tag.getBytes("US-ASCII")
        val buf = ByteBuffer.allocate(12 + data.length) // big-endian
        buf.putInt(data.length).put(t).put(data)
        crc.reset(); crc.update(t); crc.update(data)
        buf.putInt(crc.getValue.toInt)
        out.write(buf.array())
      }
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val ihdr = ByteBuffer.allocate(13)
      ihdr.putInt(width).putInt(height)
        .put(8.toByte).put(0.toByte)            // bit depth 8, grayscale
        .put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array())
      val raw = new Array[Byte]((width + 1) * height)
      var y = 0
      while (y < height) {
        raw(y * (width + 1)) = 0                // filter type 0 (None)
        var x = 0
        while (x < width) {
          val i = y * width + x
          raw(y * (width + 1) + 1 + x) =
            if (content.isEmpty) 0.toByte else content(i % content.length)
          x += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zipped = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) zipped.write(tmp, 0, defl.deflate(tmp))
      defl.end()
      chunk("IDAT", zipped.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Canonical 44-byte-header PCM16 WAV; data bytes filled from
      * `content`, sized to a whole number of sample frames (≥ 1).
      */
    def wav(channels: Int, sampleRate: Int, content: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * 2
      val dataSize =
        math.max(content.length - content.length % blockAlign, blockAlign)
      val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
        .putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      cyclic(buf, dataSize, content)
      buf.array()
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

  // ─── q98: REAL container decode (BMP/WAV) through the codec seam ──────
  // The catalog builds genuine container files — alternating 24-bpp BMPs
  // (geometry from doc_id) and PCM16 WAVs (rate/channels from doc_id),
  // pixel/sample bytes from the document text — and [[extractFeatures]]
  // decodes them back through the SAME mapPartitions batch path q92
  // uses, now hitting the real header parsers instead of the fake. The
  // oracle re-derives every decoded field relationally (BMP row padding,
  // WAV block alignment), so a wrong offset, endianness, or pad rule in
  // either direction hash-mismatches. Payload construction is per-row
  // imperative (same justification as the codec), and — as everywhere in
  // this file — payload bytes exist only inside the partition iterator,
  // never in a shuffle.
  private[graft] def bmpWavCatalog(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) =>
        if (id % 2 == 0)
          MediaRecord(id, "image",
            MediaEncode.bmp((id % 16 + 1).toInt, (id % 8 + 1).toInt, content))
        else
          MediaRecord(id, "audio",
            MediaEncode.wav((id % 2 + 1).toInt, (8000 + (id % 4) * 4000).toInt,
              content))
      })
  }

  def q98ContainerDecode(s: SparkSession, d: String): DataFrame =
    extractFeatures(bmpWavCatalog(s, d)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
              col("width"), col("height"), col("n_frames"))
      .orderBy(col("media_id"))

  val q98Sql: String =
    """SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
      |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
      |  CAST(n_frames AS INT) AS n_frames
      |FROM (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN 54 + (doc_id % 8 + 1) * (((doc_id % 16 + 1) * 3 + 3) // 4 * 4)
      |         ELSE 44 + greatest(len - len % ba, ba) END AS n_bytes,
      |    CASE WHEN doc_id % 2 = 0 THEN doc_id % 16 + 1
      |         ELSE 8000 + doc_id % 4 * 4000 END AS width,
      |    CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1
      |         ELSE doc_id % 2 + 1 END AS height,
      |    CASE WHEN doc_id % 2 = 0 THEN 1
      |         ELSE greatest(len - len % ba, ba) // ba END AS n_frames
      |  FROM (
      |    SELECT doc_id, octet_length(encode(text)) AS len,
      |      (doc_id % 2 + 1) * 2 AS ba
      |    FROM documents))
      |ORDER BY media_id""".stripMargin

  // ─── q240: audio energy census from REAL PCM sample decode ────────────
  // The audio twin of q220's pixel-level step: q98 stops at container
  // HEADERS (rates, frame counts); curation needs the SAMPLES — energy
  // (Σ s², the loudness/VAD signal) and the quiet-sample fraction are
  // what an audio pipeline gates clips on before transcription. The
  // codec walks RIFF chunks to `data` and folds little-endian PCM16
  // samples into three Longs INSIDE the partition (mapPartitions is the
  // documented legitimate seam: an opaque byte codec) — integer-exact,
  // so the census is hashable cross-engine, and the media-sized payload
  // never reaches a shuffle. "Quiet" = |s| < 16384: the in-engine WAVs
  // carry text bytes as PCM, so a sample is quiet exactly when its high
  // byte is a space/digit — content-dependent, non-degenerate.
  // The oracle recomputes every sample relationally from the text bytes
  // (dataSize = len − len mod 4 never wraps the cyclic fill: min doc is
  // 47 chars).
  final case class AudioStats(
    media_id: Long, n_samples: Long, sum_sq: Long, n_quiet: Long)

  /** Sample-level audio stats through the real codec path; non-audio and
    * undecodable payloads drop out (a census, not a validator). */
  def audioStats(ds: Dataset[MediaRecord], quietBelow: Int)
      : Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      if (r.kind != "audio") Iterator.empty
      else MediaCodec.pcm16Stats(r.payload, quietBelow).iterator.map {
        case (n, ss, q) => AudioStats(r.media_id, n, ss, q) }
    })
  }

  def q240AudioEnergy(s: SparkSession, d: String): DataFrame =
    audioStats(bmpWavCatalog(s, d), quietBelow = 16384).toDF()
      .orderBy(col("media_id"))

  val q240Sql: String =
    """SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq,
      |  CAST(sum(CASE WHEN s < 16384 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_quiet
      |FROM (
      |  SELECT doc_id,
      |    ord(substr(text, CAST(2*i+1 AS INT), 1))
      |      + 256 * ord(substr(text, CAST(2*i+2 AS INT), 1)) AS s
      |  FROM (
      |    SELECT doc_id, text,
      |      greatest(octet_length(encode(text))
      |               - octet_length(encode(text)) % 4, 4) AS ds
      |    FROM documents WHERE doc_id % 2 = 1),
      |    unnest(range(0, ds // 2)) u(i))
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  // ─── q220: image near-dup dedup by perceptual hash (aHash) ────────────
  // The dedup family's missing modality: every other dedup operator in
  // this engine keys on text or embeddings; image corpora dedup on
  // PERCEPTUAL hashes, which survive re-encodes and brightness/contrast
  // tweaks that break byte-exact fingerprints. Pipeline (all inside one
  // partition iterator — payload bytes never reach a shuffle):
  //   synthesize pixel pattern → encode a REAL 24-bpp BMP container →
  //   decode it back through the header-driven pixel parser
  //   (MediaCodec.decodeBmpGray — offset/padding/row-order honored, spec
  //   has a golden-hex pin so encode/decode can't share a symmetric bug)
  //   → 8×8 average-hash → emit (media_id, 64-bit hash).
  // The catalog plants duplicate groups (pattern keyed by doc_id % 97,
  // shared geometry + pixel gradient) and perturbs every 5th image with a
  // uniform +8-per-channel brightness shift: a byte-exact dedup (q41's
  // sha2 shape) splits those off; aHash provably does not (the strict
  // mean-compare is shift-invariant), and the census's n_bright column
  // counts the shifted members each hash bucket absorbed — the oracle
  // recomputes the whole pixel→hash arithmetic relationally, so a wrong
  // pad rule, row order, or sampling index hash-mismatches.
  //
  // Scale: the shuffle carries (64-char hash, id, flag) — fixed-width,
  // map-side combined groupBy; decode cost is one linear pass over
  // payload bytes per image. At 100 TB the same plan holds with the
  // hash as the dedup key feeding the q199 CC funnel for banded-hamming
  // near-misses (q68's machinery composes unchanged — aHash is just
  // another fixed-width signature column).
  private[graft] def patternBmpCatalog(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id % 97).toInt
        val w = g % 12 + 5
        val h = g % 7 + 4
        val bright = if (id % 5 == 0) 8 else 0
        val rowSize = ((w * 3 + 3) / 4) * 4
        val content = Array.tabulate(rowSize * h) { i =>
          ((g * 37 + i * 11) % 200 + bright).toByte
        }
        MediaRecord(id, "image", MediaEncode.bmp(w, h, content))
      })
  }

  def q220ImagePhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = patternBmpCatalog(s, d)
      .mapPartitions(_.map { r =>
        val (w, h, gray) = MediaCodec.decodeBmpGray(r.payload)
          .getOrElse(sys.error(s"undecodable BMP for media ${r.media_id}"))
        (r.media_id, aHash64(w, h, gray))
      })
      .toDF("media_id", "ahash")
    hashed
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_images"),
           min(col("media_id")).as("keeper_id"),
           sum(when(pmod(col("media_id"), lit(5)) === 0, 1L).otherwise(0L))
             .as("n_bright"))
      .orderBy(col("ahash"))
  }

  val q220Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 97 AS INT) AS g,
      |    CAST(doc_id % 97 % 12 + 5 AS INT) AS w,
      |    CAST(doc_id % 97 % 7 + 4 AS INT) AS h,
      |    CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 0 END AS bright
      |  FROM documents),
      |geom AS (SELECT *, (w * 3 + 3) // 4 * 4 AS rs FROM imgs),
      |samples AS (
      |  SELECT doc_id, bright, k,
      |    (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3) * 11) % 200
      |    + (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 1) * 11) % 200
      |    + (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 2) * 11) % 200
      |    + 3 * bright AS v
      |  FROM geom, unnest(range(0, 64)) AS t(k)),
      |bits AS (
      |  SELECT doc_id, bright, k,
      |    CASE WHEN v * 64 > sum(v) OVER (PARTITION BY doc_id)
      |         THEN '1' ELSE '0' END AS b
      |  FROM samples),
      |hashes AS (
      |  SELECT doc_id, bright, string_agg(b, '' ORDER BY k) AS ahash
      |  FROM bits GROUP BY doc_id, bright)
      |SELECT ahash, CAST(count(*) AS BIGINT) AS n_images,
      |  CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |  CAST(sum(CASE WHEN bright = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
      |FROM hashes GROUP BY ahash
      |ORDER BY ahash""".stripMargin

  // ─── q223: image NEAR-MISS dedup — banded hamming over aHash ──────────
  // q220 buckets byte-different images whose aHash is IDENTICAL; real
  // image corpora also carry near-misses whose hashes differ by a few
  // bits (a logo stamped in a corner, a small crop). The standard answer
  // is hamming-radius search over the perceptual hashes, and the
  // standard scale shape — demonstrated here — is candidate generation
  // over DISTINCT SIGNATURES, not images: the signature table is orders
  // of magnitude smaller than the corpus (94 hashes for 5 000 images at
  // sf0.1), so the banded self-join runs on the small frame and image
  // multiplicities ride along as counts. Banding: 4 blocks of 16 bits —
  // hashes within hamming ≤ 6 of each other share an exact block unless
  // the flips spread across all 4 (the usual LSH recall trade, mirrored
  // bit-for-bit by the oracle).
  //
  // The catalog plants the near-misses: every 9th image gets a copy
  // (media_id + 1000000) with its top-left pixel burned to white — a
  // localized edit that flips the sampled bits it touches plus any
  // borderline bits the shifted mean tips, leaving the hash a few bits
  // off its group's. The oracle recomputes pixel→hash→bands→hamming
  // relationally, including the burned pixel.
  private[graft] def perturbedBmpCatalog(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val g = (id % 97).toInt
        val w = g % 12 + 5
        val h = g % 7 + 4
        val bright = if (id % 5 == 0) 8 else 0
        val rowSize = ((w * 3 + 3) / 4) * 4
        val content = Array.tabulate(rowSize * h) { i =>
          ((g * 37 + i * 11) % 200 + bright).toByte
        }
        val base = MediaRecord(id, "image", MediaEncode.bmp(w, h, content))
        if (id % 9 != 0) Iterator(base)
        else {
          // burn image pixel (0,0) — file row h-1 (bottom-up) — to white
          val p = content.clone()
          val off = (h - 1) * rowSize
          p(off) = -1; p(off + 1) = -1; p(off + 2) = -1
          Iterator(base,
            MediaRecord(id + 1000000, "image", MediaEncode.bmp(w, h, p)))
        }
      })
  }

  def q223ImageNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = perturbedBmpCatalog(s, d)
      .mapPartitions(_.map { r =>
        val (w, h, gray) = MediaCodec.decodeBmpGray(r.payload)
          .getOrElse(sys.error(s"undecodable BMP for media ${r.media_id}"))
        (r.media_id, aHash64(w, h, gray))
      })
      .toDF("media_id", "ahash")
    val sigs = hashed.groupBy(col("ahash")).agg(count(lit(1)).as("n_images"))
    val banded = sigs.select(col("ahash"), col("n_images"),
        explode(expr("transform(sequence(0, 3), " +
          "b -> struct(b AS band_id, substring(ahash, b*16+1, 16) AS band_key))"))
          .as("bk"))
      .select(col("ahash"), col("n_images"),
              col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.ahash") < col("y.ahash"))
      .select(col("x.ahash").as("ahash_a"), col("x.n_images").as("n_a"),
              col("y.ahash").as("ahash_b"), col("y.n_images").as("n_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("size(filter(sequence(1, 64), " +
        "i -> substring(ahash_a, i, 1) != substring(ahash_b, i, 1)))"))
      .where(col("hamming").between(1, 6))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_sig_pairs"),
           sum(col("n_a").cast("long") * col("n_b")).as("n_image_pairs"))
      .orderBy(col("hamming"))
  }

  val q223Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 97 AS INT) AS g,
      |    CAST(doc_id % 97 % 12 + 5 AS INT) AS w,
      |    CAST(doc_id % 97 % 7 + 4 AS INT) AS h,
      |    CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 0 END AS bright,
      |    0 AS perturbed
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    CAST(doc_id % 97 AS INT), CAST(doc_id % 97 % 12 + 5 AS INT),
      |    CAST(doc_id % 97 % 7 + 4 AS INT),
      |    CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 0 END, 1
      |  FROM documents WHERE doc_id % 9 = 0),
      |geom AS (SELECT *, (w * 3 + 3) // 4 * 4 AS rs FROM imgs),
      |samples AS (
      |  SELECT media_id, k,
      |    CASE WHEN perturbed = 1
      |           AND k // 8 * h // 8 = 0 AND k % 8 * w // 8 = 0 THEN 765
      |    ELSE
      |      (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3) * 11) % 200
      |    + (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 1) * 11) % 200
      |    + (g*37 + ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 2) * 11) % 200
      |    + 3 * bright END AS v
      |  FROM geom, unnest(range(0, 64)) AS t(k)),
      |bits AS (
      |  SELECT media_id, k,
      |    CASE WHEN v * 64 > sum(v) OVER (PARTITION BY media_id)
      |         THEN '1' ELSE '0' END AS b
      |  FROM samples),
      |hashes AS (
      |  SELECT media_id, string_agg(b, '' ORDER BY k) AS ahash
      |  FROM bits GROUP BY media_id),
      |sigs AS (SELECT ahash, count(*) AS n FROM hashes GROUP BY ahash),
      |banded AS (
      |  SELECT ahash, n, b, substr(ahash, CAST(b*16+1 AS INT), 16) AS key
      |  FROM sigs, unnest(range(0, 4)) t(b)),
      |cand AS (
      |  SELECT DISTINCT x.ahash AS ha, x.n AS na, y.ahash AS hb, y.n AS nb
      |  FROM banded x JOIN banded y
      |    ON x.b = y.b AND x.key = y.key AND x.ahash < y.ahash),
      |ham AS (
      |  SELECT *, CAST(length(list_filter(range(1, 65),
      |    i -> substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)))
      |    AS INT) AS hamming
      |  FROM cand)
      |SELECT hamming, CAST(count(*) AS BIGINT) AS n_sig_pairs,
      |  CAST(sum(na * nb) AS BIGINT) AS n_image_pairs
      |FROM ham WHERE hamming BETWEEN 1 AND 6
      |GROUP BY hamming
      |ORDER BY hamming""".stripMargin

  // ─── q320: PNG perceptual-hash dedup through REAL javax.imageio decode ─
  // q220's pipeline on a SECOND real image format: synthesize a
  // grayscale pixel pattern → encode a genuine PNG (zlib scanlines,
  // CRC'd chunks — MediaEncode.png) → decode it back through
  // `javax.imageio.ImageIO` (pure JDK, lossless for PNG) → 8×8
  // average-hash → hash-group census. Encode and decode share NOTHING:
  // the encoder builds chunk bytes by hand, the decoder is the JDK's
  // own PNG reader, and MultimodalSpec pins golden pixel values — a
  // symmetric bug cannot pass. Every 5th image carries the +8
  // brightness shift that aHash's strict mean-compare provably absorbs
  // (n_bright counts the shifted members per bucket). JPEG stays out by
  // design: its decoders legitimately differ, so it remains
  // census-as-data territory.
  //
  // Scale: identical plan to q220 — decode + hash inside one partition
  // iterator, payload bytes never shuffle, the groupBy carries a
  // 64-char hash + id. The grayscale content generator is padding-free
  // (sample i sits at pixel (i div w, i mod w) top-down), which is what
  // lets the oracle replay pixel→hash arithmetic relationally.
  private[graft] def pngCatalog(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id % 89).toInt
        val w = g % 11 + 6
        val h = g % 6 + 5
        val bright = if (id % 5 == 0) 8 else 0
        val content = Array.tabulate(w * h) { i =>
          ((g * 31 + i * 13) % 180 + bright).toByte
        }
        MediaRecord(id, "image", MediaEncode.png(w, h, content))
      })
  }

  def q320PngPhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = pngCatalog(s, d)
      .mapPartitions(_.map { r =>
        val (w, h, gray) = MediaCodec.decodePngGray(r.payload)
          .getOrElse(sys.error(s"undecodable PNG for media ${r.media_id}"))
        (r.media_id, aHash64(w, h, gray))
      })
      .toDF("media_id", "ahash")
    hashed
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_images"),
           min(col("media_id")).as("keeper_id"),
           sum(when(pmod(col("media_id"), lit(5)) === 0, 1L).otherwise(0L))
             .as("n_bright"))
      .orderBy(col("ahash"))
  }

  val q320Sql: String =
    """WITH imgs AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 89 AS INT) AS g,
      |    CAST(doc_id % 89 % 11 + 6 AS INT) AS w,
      |    CAST(doc_id % 89 % 6 + 5 AS INT) AS h,
      |    CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 0 END AS bright
      |  FROM documents),
      |samples AS (
      |  SELECT doc_id, bright, k,
      |    (g*31 + ((k // 8 * h // 8) * w + (k % 8 * w // 8)) * 13) % 180
      |      + bright AS v
      |  FROM imgs, unnest(range(0, 64)) AS t(k)),
      |bits AS (
      |  SELECT doc_id, bright, k,
      |    CASE WHEN v * 64 > sum(v) OVER (PARTITION BY doc_id)
      |         THEN '1' ELSE '0' END AS b
      |  FROM samples),
      |hashes AS (
      |  SELECT doc_id, bright, string_agg(b, '' ORDER BY k) AS ahash
      |  FROM bits GROUP BY doc_id, bright)
      |SELECT ahash, CAST(count(*) AS BIGINT) AS n_images,
      |  CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |  CAST(sum(CASE WHEN bright = 8 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bright
      |FROM hashes GROUP BY ahash
      |ORDER BY ahash""".stripMargin

  // ─── q326: audio near-dup dedup by spectral-peak constellation ───────
  // Completes the multimodal dedup triad (text: many tiers; images:
  // q220/q223/q320): AUDIO near-dups keyed on what survives re-encoding
  // and gain changes — the spectrum's PEAKS, not the bytes. The shape is
  // Shazam's (Wang, ISMIR 2003): frame the clip, find each frame's
  // dominant frequency, and hash PAIRS of peaks (f1, f2, Δt) so a match
  // is a multiset of landmark tokens, not a fragile whole-clip digest.
  // Two token families split the robustness space:
  //   - constellation tokens (pa, pb, gap): amplitude scaling preserves
  //     every peak (argmax is scale-invariant) and a time shift
  //     preserves all but the wrap-boundary pairs → matched by a
  //     min-count token join with a ≥8-of-13 threshold;
  //   - the Δ-sequence fingerprint (consecutive peak DELTAS, exact
  //     equi-join): a uniform pitch (bin) shift moves every peak but no
  //     delta → pitch-shifted copies collapse into one fingerprint
  //     group. Division of labor is pinned by the census: amp copies
  //     match under BOTH, time-rotated under constellation only,
  //     pitch-shifted under fingerprint only.
  //
  // The clips are TONAL by construction (per-frame sinusoid, bin mixed
  // from (src, frame)) — planted copies halve the samples (amp), shift
  // every tone bin (+1, pitch) or rotate the frame order (time). Each
  // clip round-trips a REAL WAV container (independent encode/decode
  // paths), and the spectral pass is an integer fixed-point DFT: the
  // sine/cosine tables are literal Int arrays BAKED INTO the oracle SQL
  // from the same Scala source, so C/S sums, powers and argmax ties are
  // integer-exact cross-engine. (The double radix-2 FFT ships alongside
  // as the production O(N log N) path — MultimodalSpec pins FFT ≡ DFT
  // peak-for-peak; the DFT is its exactness twin for hashing, N=32.)
  //
  // At 100 TB: payloads never shuffle (synth → encode → decode → 6
  // peaks inside one partition iterator); matching joins fixed-width
  // tokens. Constellation CANDIDATES come from 6-peak contiguous
  // WINDOWS, not single tokens: the toy 15-bin spectrum has only ~450
  // distinct (pa, pb, gap) tokens, so a token-bucket pair join is
  // corpus-quadratic (the r11 decade-1 soak MEASURED it: exponent 1.49,
  // 18.6 → 576 s at 10×); the 4-peak window space (~13⁴ observed keys —
  // tones only span 13 bins) saturated at sf10 (r11's ENOSPC boundary),
  // and 5 peaks (13⁵ ≈ 3.7·10⁵) RAN sf10 but saturated exactly there
  // (r12 decade-2 measured exp 1.61: sf10's ~3.6M window instances
  // over 371k keys). Six peaks put the key space at 13⁶ ≈ 4.8·10⁶ —
  // above sf10's instance count, so buckets stay near-dup-sized
  // (production: a 1024-bin FFT's 6-peak space is ~10¹⁸, beyond
  // Shazam's actual ~2³⁰-hash shape; the toy saturation SF tracks the
  // tone-alphabet, not the algorithm). The ≥8-of-13 min-count token
  // score then verifies ONLY candidate pairs (two equi-joins keyed by
  // clip + token). Amp copies share every window (identical peaks);
  // rotated copies share exactly the one 6-window clear of the
  // rotation wrap; scattered coincidental 8-token matches with no
  // shared 6-window are not surfaced — by design, both engines alike.
  private val AcFrames = 8
  private val AcN = 32
  private val AcBins = 15
  private val AcTones = 12
  private val AcThresh = 8
  private[graft] val ToneTab: Array[Int] =
    Array.tabulate(AcN)(i => math.round(math.sin(2 * math.Pi * i / AcN) * 12000).toInt)
  private[graft] val CosTab: Array[Int] =
    Array.tabulate(AcN)(i => math.round(math.cos(2 * math.Pi * i / AcN) * 128).toInt)
  private[graft] val SinTab: Array[Int] =
    Array.tabulate(AcN)(i => math.round(math.sin(2 * math.Pi * i / AcN) * 128).toInt)

  final case class AudioPeaks(clip_id: Long, peaks: Seq[Int])

  /** Per-(clip source, frame) tone bin via md5 (the engine's standard
    * deterministic-hash derivation — an arithmetic mix mod 12 turned
    * out to be badly non-uniform across sources, flooding the
    * fingerprint join with accidental whole-sequence collisions). */
  private def toneBin(src: Long, f: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"tone:$src:$f".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (1L + java.lang.Long.parseLong(hex, 16) % AcTones).toInt
  }

  /** Integer fixed-point DFT peak per frame: argmax over bins 1..AcBins
    * of C² + S² (C = Σ s·cosq, S = Σ s·sinq), ties to the lower bin —
    * every quantity a Long, so cross-engine exact. */
  private[graft] def dftPeaks(samples: Array[Int]): Array[Int] =
    Array.tabulate(AcFrames) { f =>
      var bestK = 1
      var bestP = -1L
      var k = 1
      while (k <= AcBins) {
        var c = 0L; var sn = 0L; var t = 0
        while (t < AcN) {
          val s = samples(f * AcN + t).toLong
          val idx = (k * t) % AcN
          c += s * CosTab(idx); sn += s * SinTab(idx)
          t += 1
        }
        val p = c * c + sn * sn
        if (p > bestP) { bestP = p; bestK = k }
        k += 1
      }
      bestK
    }

  /** In-place iterative radix-2 Cooley–Tukey FFT — the O(N log N) path
    * a production spectral pipeline runs (the integer DFT above is its
    * exactness twin for cross-engine hashing). Length must be a power
    * of two. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var p = 0
        while (p < len / 2) {
          val ur = re(blk + p); val ui = im(blk + p)
          val vr = re(blk + p + len / 2) * cr - im(blk + p + len / 2) * ci
          val vi = re(blk + p + len / 2) * ci + im(blk + p + len / 2) * cr
          re(blk + p) = ur + vr; im(blk + p) = ui + vi
          re(blk + p + len / 2) = ur - vr; im(blk + p + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          p += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Synthesize each clip spec's tonal samples, round-trip a REAL WAV
    * container (independent encode/decode), and emit the per-frame DFT
    * peaks — payload bytes never leave the partition iterator. Spec:
    * (clip_id, src, kshift, frot, halve). */
  private[graft] def clipPeaks(
      specs: Dataset[(Long, Long, Int, Int, Int)]): Dataset[AudioPeaks] = {
    import specs.sparkSession.implicits._
    specs.mapPartitions(_.map { case (clipId, src, kshift, frot, halve) =>
      val samples = new Array[Int](AcFrames * AcN)
      var f = 0
      while (f < AcFrames) {
        val k = toneBin(src, (f + frot) % AcFrames) + kshift
        var t = 0
        while (t < AcN) {
          val s0 = ToneTab((k * t) % AcN)
          samples(f * AcN + t) = if (halve == 1) s0 / 2 else s0
          t += 1
        }
        f += 1
      }
      val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => pcm.putShort(s.toShort))
      val wav = MediaEncode.wav(1, 8000, pcm.array())
      val decoded = MediaCodec.pcm16Samples(wav).get
      AudioPeaks(clipId, dftPeaks(decoded).toSeq)
    })
  }

  def q326AudioConstellation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m0 = documents(s, d).select(col("doc_id").as("src"))
    def sp(idOff: Long, only: Column, kshift: Int, frot: Int, halve: Int) =
      m0.where(only).select((col("src") + idOff).as("clip_id"), col("src"),
        lit(kshift).as("kshift"), lit(frot).as("frot"),
        lit(halve).as("halve"))
    val specs = sp(0L, lit(true), 0, 0, 0)
      .unionAll(sp(100000L, pmod(col("src"), lit(3)) === 0, 0, 0, 1))
      .unionAll(sp(200000L, pmod(col("src"), lit(4)) === 1, 1, 0, 0))
      .unionAll(sp(300000L, pmod(col("src"), lit(5)) === 2, 0, 2, 0))
      .as[(Long, Long, Int, Int, Int)]
    // materialized: peaks feed both token families
    val pk = clipPeaks(specs).toDF().localCheckpoint()
    val F = AcFrames
    val tok = pk.select(col("clip_id"), explode(expr(
        s"concat(transform(sequence(1, ${F - 1}), i -> " +
          "struct(element_at(peaks, i) AS pa, " +
          "element_at(peaks, cast(i + 1 AS int)) AS pb, 1 AS gap)), " +
        s"transform(sequence(1, ${F - 2}), i -> " +
          "struct(element_at(peaks, i) AS pa, " +
          "element_at(peaks, cast(i + 2 AS int)) AS pb, 2 AS gap)))"))
        .as("tk"))
      .select(col("clip_id"), col("tk.pa"), col("tk.pb"), col("tk.gap"))
    val tokCnt = tok.groupBy("clip_id", "pa", "pb", "gap")
      .agg(count(lit(1)).as("n"))
    // candidates on near-unique 6-peak windows; verify by token score
    val wnd = pk.select(col("clip_id"), explode(expr(
        s"transform(sequence(1, ${F - 5}), i -> " +
          "concat_ws(':', element_at(peaks, i), " +
          "element_at(peaks, cast(i + 1 AS int)), " +
          "element_at(peaks, cast(i + 2 AS int)), " +
          "element_at(peaks, cast(i + 3 AS int)), " +
          "element_at(peaks, cast(i + 4 AS int)), " +
          "element_at(peaks, cast(i + 5 AS int))))")).as("w"))
      .distinct()
    val cand = wnd.as("wa").join(wnd.as("wb"),
        col("wa.w") === col("wb.w") &&
        col("wa.clip_id") < col("wb.clip_id"))
      .select(col("wa.clip_id").as("ca"), col("wb.clip_id").as("cb"))
      .distinct()
    val shz = cand
      .join(tokCnt.as("a"), col("ca") === col("a.clip_id"))
      .join(tokCnt.as("b"), col("cb") === col("b.clip_id") &&
        col("a.pa") === col("b.pa") && col("a.pb") === col("b.pb") &&
        col("a.gap") === col("b.gap"))
      .groupBy(col("ca").as("a"), col("cb").as("b"))
      .agg(sum(least(col("a.n"), col("b.n"))).as("score"))
      .where(col("score") >= AcThresh)
      .select("a", "b")
    val fpDf = pk.select(col("clip_id"), expr(
      s"concat_ws(',', transform(sequence(1, ${F - 1}), i -> " +
        "cast(element_at(peaks, cast(i + 1 AS int)) - " +
        "element_at(peaks, i) AS string)))").as("fpv"))
    val fpp = fpDf.as("x").join(fpDf.as("y"),
        col("x.fpv") === col("y.fpv") &&
        col("x.clip_id") < col("y.clip_id"))
      .select(col("x.clip_id").as("a"), col("y.clip_id").as("b"))
    val allp = shz.select(lit("shazam").as("method"), col("a"), col("b"))
      .unionAll(fpp.select(lit("fingerprint").as("method"), col("a"),
        col("b")))
    allp.groupBy(col("method"),
        when(col("a") % 100000 === col("b") % 100000, 1L).otherwise(0L)
          .as("same_src"),
        expr("a div 100000").as("ta"), expr("b div 100000").as("tb"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("method"), col("same_src"), col("ta"), col("tb"))
  }

  private def acTblSql: String = (0 until AcN).map(i =>
    s"($i, ${ToneTab(i)}, ${CosTab(i)}, ${SinTab(i)})").mkString(", ")

  val q326Sql: String =
    s"""WITH tbl AS (SELECT * FROM (VALUES $acTblSql) v(i, sa, cq, sq)),
       |m0 AS (SELECT doc_id AS src FROM documents),
       |clips AS (
       |  SELECT src AS clip_id, src, 0 AS kshift, 0 AS frot, 0 AS halve
       |  FROM m0
       |  UNION ALL SELECT src + 100000, src, 0, 0, 1 FROM m0
       |    WHERE src % 3 = 0
       |  UNION ALL SELECT src + 200000, src, 1, 0, 0 FROM m0
       |    WHERE src % 4 = 1
       |  UNION ALL SELECT src + 300000, src, 0, 2, 0 FROM m0
       |    WHERE src % 5 = 2),
       |samp AS MATERIALIZED (
       |  SELECT c.clip_id, ff.f, tt.t,
       |    CASE WHEN c.halve = 1 THEN tb.sa // 2 ELSE tb.sa END AS s
       |  FROM clips c
       |  CROSS JOIN unnest(range(0, $AcFrames)) ff(f)
       |  CROSS JOIN unnest(range(0, $AcN)) tt(t)
       |  JOIN tbl tb ON tb.i =
       |    ((1 + CAST(('0x' || substr(md5('tone:'
       |        || CAST(c.src AS VARCHAR) || ':'
       |        || CAST((ff.f + c.frot) % $AcFrames AS VARCHAR)), 1, 8))
       |      AS BIGINT) % $AcTones + c.kshift) * tt.t) % $AcN),
       |dft AS MATERIALIZED (
       |  SELECT s.clip_id, s.f, kk.k,
       |    sum(s.s * tw.cq) AS c, sum(s.s * tw.sq) AS sn
       |  FROM samp s
       |  CROSS JOIN unnest(range(1, ${AcBins + 1})) kk(k)
       |  JOIN tbl tw ON tw.i = (kk.k * s.t) % $AcN
       |  GROUP BY s.clip_id, s.f, kk.k),
       |peaks AS (
       |  SELECT clip_id, f, k AS pk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY clip_id, f
       |      ORDER BY c*c + sn*sn DESC, k) AS rn FROM dft)
       |  WHERE rn = 1),
       |pseq AS MATERIALIZED (
       |  SELECT clip_id, list(pk ORDER BY f) AS pks
       |  FROM peaks GROUP BY clip_id),
       |tok AS (
       |  SELECT clip_id, pks[i] AS pa, pks[i + 1] AS pb, 1 AS gap
       |  FROM pseq, unnest(range(1, $AcFrames)) u(i)
       |  UNION ALL
       |  SELECT clip_id, pks[i], pks[i + 2], 2
       |  FROM pseq, unnest(range(1, ${AcFrames - 1})) u(i)),
       |tokcnt AS (
       |  SELECT clip_id, pa, pb, gap, CAST(count(*) AS BIGINT) AS n
       |  FROM tok GROUP BY clip_id, pa, pb, gap),
       |wnd AS (
       |  SELECT DISTINCT clip_id,
       |    concat_ws(':', pks[i], pks[i + 1], pks[i + 2], pks[i + 3],
       |              pks[i + 4], pks[i + 5]) AS w
       |  FROM pseq, unnest(range(1, ${AcFrames - 4})) u(i)),
       |cand AS (
       |  SELECT DISTINCT wa.clip_id AS ca, wb.clip_id AS cb
       |  FROM wnd wa JOIN wnd wb
       |    ON wa.w = wb.w AND wa.clip_id < wb.clip_id),
       |shz AS (
       |  SELECT c.ca AS a, c.cb AS b
       |  FROM cand c
       |  JOIN tokcnt a ON a.clip_id = c.ca
       |  JOIN tokcnt b ON b.clip_id = c.cb
       |    AND a.pa = b.pa AND a.pb = b.pb AND a.gap = b.gap
       |  GROUP BY 1, 2
       |  HAVING sum(least(a.n, b.n)) >= $AcThresh),
       |fpv AS (
       |  SELECT clip_id, string_agg(CAST(d AS VARCHAR), ',' ORDER BY i)
       |    AS fpv
       |  FROM (SELECT clip_id, i, pks[i + 1] - pks[i] AS d
       |        FROM pseq, unnest(range(1, $AcFrames)) u(i))
       |  GROUP BY clip_id),
       |fpp AS (
       |  SELECT x.clip_id AS a, y.clip_id AS b
       |  FROM fpv x JOIN fpv y
       |    ON x.fpv = y.fpv AND x.clip_id < y.clip_id),
       |allp AS (
       |  SELECT 'shazam' AS method, a, b FROM shz
       |  UNION ALL
       |  SELECT 'fingerprint', a, b FROM fpp)
       |SELECT method,
       |  CAST(CASE WHEN a % 100000 = b % 100000 THEN 1 ELSE 0 END
       |    AS BIGINT) AS same_src,
       |  CAST(a // 100000 AS BIGINT) AS ta,
       |  CAST(b // 100000 AS BIGINT) AS tb,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM allp
       |GROUP BY 1, 2, 3, 4
       |ORDER BY method, same_src, ta, tb""".stripMargin

  // ─── q330: VIDEO near-dup dedup — frame-pHash posting-list join ───────
  // Completes the multimodal dedup family's fourth modality (text has
  // many tiers, images q220/q223/q320, audio q326): video near-dups are
  // found on SEQUENCES of per-frame perceptual hashes — the industry
  // shape (frame-sample → pHash per frame → set/shingle overlap), which
  // survives re-encodes (aHash is brightness-invariant) AND temporal
  // trims (set overlap tolerates dropped frames) that break any
  // container-byte fingerprint.
  //
  // Fixture: each doc is a "video" of 3–5 REAL 24-bpp BMP frames
  // (pattern keyed by group g = doc_id % 89, frame index shifts the
  // gradient by f*13). Every 4th video is TRIMMED (drops frame 0) and
  // every 5th is brightness-shifted (+8/channel — aHash-invariant by
  // the strict mean compare, so it lands in the same class as its
  // group's clean members). Pipeline, all payload work inside one
  // partition pass (encode → header-driven decode → aHash; bytes never
  // shuffle):
  //   frames(video_id, f, fhash) → per-video ordered-signature classes
  //   (identical frame sequences collapse; keeper = min id) → DISTINCT
  //   (class, fhash) postings → equi-join on fhash, keeper_a < keeper_b
  //   → frame-set Jaccard ≥ 2/3 keeps a pair.
  // Trimmed variants share n-1 of n frames with their group's clean
  // class — Jaccard (n-1)/n ≥ 2/3 for n ≥ 3 — so every group with both
  // variants yields exactly its class pair. The twin recomputes the
  // whole BMP→aHash arithmetic relationally (q220's machinery plus the
  // frame dimension), so a wrong row order, pad rule, sample index, or
  // pairing flips the hash.
  //
  // Scale: candidate generation runs over DISTINCT CLASSES (bounded by
  // distinct content, orders of magnitude below the corpus — q223's
  // argument); the posting join is an equi-join on a 64-bit hash; the
  // per-class pair census is delta-sized. Never a video × video scan.
  def q330VideoNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frames = documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val g = (id % 89).toInt
        val n = g % 3 + 3
        val start = if (id % 4 == 0) 1 else 0
        val bright = if (id % 5 == 0) 8 else 0
        val w = g % 12 + 5
        val h = g % 7 + 4
        val rowSize = ((w * 3 + 3) / 4) * 4
        (start until n).iterator.map { f =>
          val content = Array.tabulate(rowSize * h)(i =>
            ((g * 37 + f * 13 + i * 11) % 200 + bright).toByte)
          val payload = MediaEncode.bmp(w, h, content)
          val (dw, dh, gray) = MediaCodec.decodeBmpGray(payload)
            .getOrElse(sys.error(s"undecodable BMP frame for video $id"))
          (id, f, aHash64(dw, dh, gray))
        }
      }).toDF("video_id", "f", "fhash")
    val sigs = frames.groupBy(col("video_id"))
      .agg(md5(concat_ws("|",
             transform(array_sort(collect_list(struct(col("f"), col("fhash")))),
                       x => x.getField("fhash")))).as("sig"),
           count(lit(1)).as("n_frames"))
    val classes = sigs.groupBy(col("sig"))
      .agg(min(col("video_id")).as("keeper"),
           count(lit(1)).as("n_videos"),
           max(col("n_frames")).as("n_frames"))
    val postings = frames
      .join(sigs.select(col("video_id"), col("sig")), Seq("video_id"))
      .join(classes.select(col("sig"), col("keeper")), Seq("sig"))
      .select(col("keeper"), col("fhash")).distinct()
    val pairs = postings.as("a")
      .join(postings.as("b"),
        col("a.fhash") === col("b.fhash") && col("a.keeper") < col("b.keeper"))
      .groupBy(col("a.keeper").as("keeper_a"), col("b.keeper").as("keeper_b"))
      .agg(count(lit(1)).as("shared"))
    val ca = classes.select(col("keeper").as("keeper_a"),
      col("n_frames").as("n_frames_a"), col("n_videos").as("n_videos_a"))
    val cb = classes.select(col("keeper").as("keeper_b"),
      col("n_frames").as("n_frames_b"), col("n_videos").as("n_videos_b"))
    pairs.join(ca, "keeper_a").join(cb, "keeper_b")
      .withColumn("n_union",
        col("n_frames_a") + col("n_frames_b") - col("shared"))
      .where(col("shared") * 3 >= col("n_union") * 2)
      .select(col("keeper_a"), col("keeper_b"), col("shared"), col("n_union"),
        expr("CAST(shared * 100 DIV n_union AS BIGINT)").as("jacc_pct"),
        col("n_frames_a"), col("n_frames_b"),
        col("n_videos_a"), col("n_videos_b"))
      .orderBy(col("keeper_a"), col("keeper_b"))
  }

  val q330Sql: String =
    """WITH vids AS (
      |  SELECT doc_id AS video_id,
      |    CAST(doc_id % 89 AS INT) AS g,
      |    CAST(doc_id % 89 % 12 + 5 AS INT) AS w,
      |    CAST(doc_id % 89 % 7 + 4 AS INT) AS h,
      |    CAST(doc_id % 89 % 3 + 3 AS INT) AS nf,
      |    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS fstart,
      |    CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 0 END AS bright
      |  FROM documents),
      |geom AS (SELECT *, (w * 3 + 3) // 4 * 4 AS rs FROM vids),
      |frames AS (
      |  SELECT video_id, g, w, h, rs, bright, CAST(f AS INT) AS fi
      |  FROM geom, unnest(range(fstart, nf)) AS t(f)),
      |samples AS (
      |  SELECT video_id, fi, k,
      |    (g*37 + fi*13 +
      |      ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3) * 11) % 200
      |    + (g*37 + fi*13 +
      |      ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 1) * 11) % 200
      |    + (g*37 + fi*13 +
      |      ((h - 1 - (k // 8 * h // 8)) * rs + (k % 8 * w // 8) * 3 + 2) * 11) % 200
      |    + 3 * bright AS v
      |  FROM frames, unnest(range(0, 64)) AS tk(k)),
      |bits AS (
      |  SELECT video_id, fi, k,
      |    CASE WHEN v * 64 > sum(v) OVER (PARTITION BY video_id, fi)
      |         THEN '1' ELSE '0' END AS b
      |  FROM samples),
      |fhashes AS (
      |  SELECT video_id, fi, string_agg(b, '' ORDER BY k) AS fhash
      |  FROM bits GROUP BY video_id, fi),
      |sigs AS (
      |  SELECT video_id, md5(string_agg(fhash, '|' ORDER BY fi)) AS sig,
      |    count(*) AS n_frames
      |  FROM fhashes GROUP BY video_id),
      |classes AS (
      |  SELECT sig, min(video_id) AS keeper, count(*) AS n_videos,
      |    max(n_frames) AS n_frames
      |  FROM sigs GROUP BY sig),
      |postings AS (
      |  SELECT DISTINCT c.keeper, f.fhash
      |  FROM fhashes f
      |  JOIN sigs s ON f.video_id = s.video_id
      |  JOIN classes c ON s.sig = c.sig),
      |pairs AS (
      |  SELECT a.keeper AS keeper_a, b.keeper AS keeper_b,
      |    count(*) AS shared
      |  FROM postings a JOIN postings b
      |    ON a.fhash = b.fhash AND a.keeper < b.keeper
      |  GROUP BY 1, 2)
      |SELECT p.keeper_a, p.keeper_b, p.shared,
      |  ca.n_frames + cb.n_frames - p.shared AS n_union,
      |  CAST(p.shared * 100 // (ca.n_frames + cb.n_frames - p.shared)
      |    AS BIGINT) AS jacc_pct,
      |  ca.n_frames AS n_frames_a, cb.n_frames AS n_frames_b,
      |  ca.n_videos AS n_videos_a, cb.n_videos AS n_videos_b
      |FROM pairs p
      |JOIN classes ca ON p.keeper_a = ca.keeper
      |JOIN classes cb ON p.keeper_b = cb.keeper
      |WHERE p.shared * 3 >= (ca.n_frames + cb.n_frames - p.shared) * 2
      |ORDER BY keeper_a, keeper_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q330_video_near_dup" -> (q330VideoNearDup _),
    "q326_audio_constellation" -> (q326AudioConstellation _),
    "q320_png_phash_dedup" -> (q320PngPhashDedup _),
    "q58_multimodal_meta" -> (q58MultimodalMeta _),
    "q92_frame_sample"    -> (q92FrameSample _),
    "q98_container_decode" -> (q98ContainerDecode _),
    "q240_audio_energy" -> (q240AudioEnergy _),
    "q220_image_phash_dedup" -> (q220ImagePhashDedup _),
    "q223_image_near_dup" -> (q223ImageNearDup _),
  )

  val oracleSql: Map[String, String] = Map(
    "q330_video_near_dup" -> q330Sql,
    "q326_audio_constellation" -> q326Sql,
    "q320_png_phash_dedup" -> q320Sql,
    "q58_multimodal_meta" -> q58Sql,
    "q92_frame_sample"    -> q92Sql,
    "q98_container_decode" -> q98Sql,
    "q240_audio_energy" -> q240Sql,
    "q220_image_phash_dedup" -> q220Sql,
    "q223_image_near_dup" -> q223Sql,
  )
}
