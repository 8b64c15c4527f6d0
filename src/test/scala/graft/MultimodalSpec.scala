package graft

import graft.sources.Multimodal
import graft.sources.Multimodal.{MediaRecord, ResizedMedia}

/** The batched codec seams q58/q92 don't reach: resize geometry and the
  * frame-sampling stride contract, driven through the real mapPartitions
  * path on tiny in-memory media.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, kind: String, n: Int): MediaRecord =
    MediaRecord(id, kind, Array.tabulate(n)(_.toByte))

  test("resizeBatch emits target geometry with the stub byte-count bound") {
    val in = Seq(rec(1, "image", 4000), rec(2, "video", 100)).toDS()
    val out = Multimodal.resizeBatch(in, 64, 48).collect().sortBy(_.media_id)
    assert(out === Seq(
      ResizedMedia(1, "image", 64, 48, math.min(4000, 64 * 48 / 8)),
      ResizedMedia(2, "video", 64, 48, 100)))
  }

  // ─── real container parsers: pinned against HAND-WRITTEN golden bytes
  // (not MediaEncode output — encode and decode must never co-validate)

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("decodeBmp reads width/height from golden BITMAPINFOHEADER bytes") {
    // 2x3 24-bpp bottom-up BMP: rowSize = ((2*3+3)/4)*4 = 8, data = 24,
    // file = 78 = 0x4E. Header spelled out byte by byte.
    val golden = hex(
      "424D 4E000000 00000000 36000000" +          // BM, size, res, offset
      "28000000 02000000 03000000 0100 1800" +     // ih=40, w=2, h=3, planes, bpp
      "00000000 18000000 130B0000 130B0000 00000000 00000000" +
      "00" * 24)                                    // pixel rows
    assert(Multimodal.MediaCodec.decodeBmp(golden) === Some((2, 3, 1)))
    // top-down variant: height stored negative (0xFFFFFFFD = -3)
    val topDown = golden.clone()
    topDown(22) = 0xFD.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    assert(Multimodal.MediaCodec.decodeBmp(topDown) === Some((2, 3, 1)))
  }

  test("decodeWav walks RIFF chunks from golden bytes, incl. a LIST chunk") {
    // PCM16 stereo @ 16 kHz: blockAlign = 4, byteRate = 64000; an odd-
    // sized 3-byte LIST chunk (plus pad byte) sits between fmt and data
    // to force the chunk walk; data = 8 bytes → 2 sample frames.
    val golden = hex(
      "52494646 38000000 57415645" +                // RIFF, size, WAVE
      "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000" +
      "4C495354 03000000 414243 00" +               // LIST len=3 'ABC' +pad
      "64617461 08000000 0102030405060708")         // data, 8 bytes
    assert(Multimodal.MediaCodec.decodeWav(golden) === Some((16000, 2, 2)))
  }

  test("codec sniffs containers and falls back to the fake for plain bytes") {
    val bmp = Multimodal.MediaEncode.bmp(5, 4, Array[Byte](9, 8, 7))
    assert(Multimodal.MediaCodec.decode("image", bmp) === ((5, 4, 1)))
    // 1-channel 12 kHz, 10 content bytes → blockAlign 2, data 10, 5 frames
    val wav = Multimodal.MediaEncode.wav(1, 12000, Array.fill(10)(1.toByte))
    assert(Multimodal.MediaCodec.decode("audio", wav) === ((12000, 1, 5)))
    // no magic → the deterministic fake (q58/q92's contract, unchanged)
    val plain = Array.tabulate(13)(_.toByte)
    assert(Multimodal.MediaCodec.decode("video", plain) ===
      (((13 % 64) * 10 + 32, (13 % 48) * 10 + 24, 13 % 7 + 1)))
  }

  test("container parsers reject malformed bytes instead of crashing or looping") {
    import Multimodal.MediaCodec
    // truncated BMP (magic but no full header) → not a container
    assert(MediaCodec.decodeBmp("BM123".getBytes("US-ASCII")) === None)
    // BITMAPCOREHEADER (info size 12 < 40) → unsupported, falls through
    val core = Multimodal.MediaEncode.bmp(3, 3, Array[Byte](1))
    core(14) = 12
    assert(MediaCodec.decodeBmp(core) === None)
    // RIFF magic but not WAVE
    val avi = Multimodal.MediaEncode.wav(1, 8000, Array[Byte](1, 2))
    avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(MediaCodec.decodeWav(avi) === None)
    // corrupt NEGATIVE chunk size must terminate (no infinite walk), and
    // the truncated walk finds no fmt/data → None
    val bad = Multimodal.MediaEncode.wav(1, 8000, Array[Byte](1, 2))
    bad(16) = 0xFF.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0xFF.toByte // fmt size = -1
    assert(MediaCodec.decodeWav(bad) === None)
    // zero block-align (division guard) → rejected
    val z = Multimodal.MediaEncode.wav(1, 8000, Array[Byte](1, 2))
    z(32) = 0; z(33) = 0
    assert(MediaCodec.decodeWav(z) === None)
    // every malformed case still decodes via the fake (total function)
    Seq(core, avi, bad, z).foreach { p =>
      val (w, h, f) = MediaCodec.decode("image", p)
      assert(w > 0 && h > 0 && f === 1)
    }
  }

  test("extractFeatures decodes real containers through the batch seam") {
    val in = Seq(
      MediaRecord(2, "image", Multimodal.MediaEncode.bmp(7, 2, Array(1.toByte))),
      MediaRecord(3, "audio", Multimodal.MediaEncode.wav(2, 20000, Array.fill(9)(2.toByte))))
      .toDS()
    val out = Multimodal.extractFeatures(in).collect().sortBy(_.media_id)
    assert(out.map(f => (f.media_id, f.width, f.height, f.n_frames)).toSeq ===
      Seq((2L, 7, 2, 1), (3L, 20000, 2, 2)))
    // n_bytes is the real container size: 54 + 2*((7*3+3)/4*4) = 102
    assert(out.head.n_bytes === 54 + 2 * 24)
  }

  test("sampleFrames strides the stub frame count and fingerprints " +
       "deterministically") {
    // n=13 video → n_frames = 13 % 7 + 1 = 7; stride 2 → frames 0,2,4,6
    val in = Seq(rec(5, "video", 13)).toDS()
    val out = Multimodal.sampleFrames(in, 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    // fingerprint matches an independent md5(payload ++ ":idx")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.update(Array.tabulate(13)(_.toByte)); md5.update(":2".getBytes("UTF-8"))
    val expected = md5.digest().map("%02x".format(_)).mkString
    assert(out.find(_.frame_idx == 2).get.frame_fp === expected)
    // non-video kinds yield exactly one frame (the codec contract)
    val img = Multimodal.sampleFrames(Seq(rec(6, "image", 50)).toDS(), 2).collect()
    assert(img.map(_.frame_idx).toSeq === Seq(0))
  }

  // ─── q220 components: pixel decode + aHash, pinned independently ──────

  test("decodeBmpGray reads padded bottom-up pixel rows from golden bytes") {
    // Same 2x3 header as the decodeBmp golden, now with hand-picked pixel
    // bytes. File rows are BOTTOM-UP: file row 0 is image row 2.
    val golden = hex(
      "424D 4E000000 00000000 36000000" +
      "28000000 02000000 03000000 0100 1800" +
      "00000000 18000000 130B0000 130B0000 00000000 00000000" +
      "0A141E 283C32 0000" +   // file row 0 → image row 2: 10+20+30, 40+60+50
      "010203 040506 0000" +   // file row 1 → image row 1: 6, 15
      "646E78 070809 0000")    // file row 2 → image row 0: 330, 24
    val Some((w, h, gray)) = Multimodal.MediaCodec.decodeBmpGray(golden)
    assert((w, h) === ((2, 3)))
    assert(gray.toSeq === Seq(330, 24, 6, 15, 60, 150))
    // negative height = top-down rows: same bytes, row order NOT flipped
    val topDown = golden.clone()
    topDown(22) = 0xFD.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    val Some((_, _, td)) = Multimodal.MediaCodec.decodeBmpGray(topDown)
    assert(td.toSeq === Seq(60, 150, 6, 15, 330, 24))
    // non-24-bpp and truncated payloads are rejected, not misread
    val bpp8 = golden.clone(); bpp8(28) = 8
    assert(Multimodal.MediaCodec.decodeBmpGray(bpp8) === None)
    assert(Multimodal.MediaCodec.decodeBmpGray(golden.take(60)) === None)
  }

  test("aHash64 bits follow the strict integer mean-compare") {
    // 1x1 image: all 64 samples identical, strictly-greater never fires
    assert(Multimodal.aHash64(1, 1, Array(42)) === "0" * 64)
    // 2x1 grid (10 | 100): sample x = (k%8 * 2) / 8 → left half of every
    // 8-bit row samples 10, right half 100; mean sits between
    assert(Multimodal.aHash64(2, 1, Array(10, 100)) === "00001111" * 8)
  }

  test("aHash survives a uniform brightness shift that breaks exact hashing") {
    // Two q220-catalog images with the same pattern group (g = 5) but a
    // +8-per-channel brightness shift — byte-distinct payloads (an exact
    // sha2 dedup separates them), same perceptual hash.
    def img(bright: Int): Array[Byte] = {
      val g = 5; val w = g % 12 + 5; val h = g % 7 + 4
      val rowSize = ((w * 3 + 3) / 4) * 4
      Multimodal.MediaEncode.bmp(w, h, Array.tabulate(rowSize * h) { i =>
        ((g * 37 + i * 11) % 200 + bright).toByte
      })
    }
    val (base, shifted) = (img(0), img(8))
    assert(!java.util.Arrays.equals(base, shifted))
    def hash(p: Array[Byte]): String = {
      val Some((w, h, gray)) = Multimodal.MediaCodec.decodeBmpGray(p)
      Multimodal.aHash64(w, h, gray)
    }
    assert(hash(base) === hash(shifted))
    // and the hash is not degenerate (both bit values present)
    assert(hash(base).distinct.sorted === "01")
  }

  test("q223's burned-pixel perturbation lands in the banded-hamming radius") {
    // For each planted near-miss (media_id + 1000000), the perturbed hash
    // must sit a SMALL hamming distance from its source's — close enough
    // that 4×16 banding can catch it, far enough that q220's exact-hash
    // census provably cannot (at least one pair strictly between 1 and 6).
    import spark.implicits._
    val hashes = Multimodal.perturbedBmpCatalog(spark, sfDir)
      .map { r =>
        val Some((w, h, gray)) = Multimodal.MediaCodec.decodeBmpGray(r.payload)
        (r.media_id, Multimodal.aHash64(w, h, gray))
      }.collect().toMap
    val dists = hashes.keys.filter(_ >= 1000000L).toSeq.sorted.map { pid =>
      val (a, b) = (hashes(pid - 1000000L), hashes(pid))
      a.zip(b).count { case (x, y) => x != y }
    }
    assert(dists.nonEmpty)
    assert(dists.max <= 10, s"burned pixel moved a hash too far: $dists")
    assert(dists.exists(d => d >= 1 && d <= 6),
      "no pair in the 1..6 near-miss band — q223's planting is vacuous")
  }

  test("pcm16Stats folds golden little-endian samples past a LIST chunk") {
    // same golden layout as the decodeWav case; data bytes
    // 01 02 03 04 05 06 07 08 decode little-endian to samples
    // 0x0201=513, 0x0403=1027, 0x0605=1541, 0x0807=2055
    val golden = hex(
      "52494646 38000000 57415645" +
      "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000" +
      "4C495354 03000000 414243 00" +
      "64617461 08000000 0102030405060708")
    val expSq = Seq(513L, 1027L, 1541L, 2055L).map(x => x * x).sum
    assert(Multimodal.MediaCodec.pcm16Stats(golden, quietBelow = 1100) ===
      Some((4L, expSq, 2L)))  // 513 and 1027 are under the quiet bar
    // negative samples: FF FF = -1, 00 80 = -32768 — abs() must apply
    val neg = hex(
      "52494646 28000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 04000000 FFFF 0080")
    val negSq = 1L + 32768L * 32768L
    assert(Multimodal.MediaCodec.pcm16Stats(neg, quietBelow = 16384) ===
      Some((2L, negSq, 1L)))  // |-1| quiet, |-32768| loud
    assert(Multimodal.MediaCodec.pcm16Stats("nope".getBytes, 1) === None)
  }

  test("PNG roundtrip: javax.imageio decodes MediaEncode.png to exact " +
       "golden pixels; IHDR metadata; brightness-shift hash invariance") {
    import Multimodal.{MediaCodec, MediaEncode}
    // 3×2 grayscale with known content — pixel (y, x) carries content
    // byte y*w + x, top-down, no padding
    val content = Array[Byte](10, 20, 30, 40, 50, 60)
    val png = MediaEncode.png(3, 2, content)
    // container sanity: signature + IHDR dims (header-only parse)
    assert(MediaCodec.decodePngMeta(png) === Some((3, 2, 1)))
    // golden pixels through the JDK's own PNG reader
    val Some((w, h, gray)) = MediaCodec.decodePngGray(png): @unchecked
    assert((w, h) === (3, 2))
    assert(gray.toSeq === Seq(10, 20, 30, 40, 50, 60))
    // the JDK reader must also accept a large cyclic payload
    val big = MediaEncode.png(17, 9, Array.tabulate(40)(i => (i * 7).toByte))
    val Some((bw, bh, bg)) = MediaCodec.decodePngGray(big): @unchecked
    assert(bw === 17 && bh === 9)
    assert(bg(0) === 0 && bg(1) === 7 && bg(40) === 0,
      "cyclic content must wrap at 40 bytes")
    // aHash is invariant under a uniform brightness shift (the q220
    // property, now on the PNG path)
    val base = Array.tabulate(64)(i => ((i * 13) % 120).toByte)
    val shifted = base.map(b => (b + 8).toByte)
    val h1 = {
      val Some((w1, hh1, g1)) =
        MediaCodec.decodePngGray(MediaEncode.png(8, 8, base)): @unchecked
      Multimodal.aHash64(w1, hh1, g1)
    }
    val h2 = {
      val Some((w2, hh2, g2)) =
        MediaCodec.decodePngGray(MediaEncode.png(8, 8, shifted)): @unchecked
      Multimodal.aHash64(w2, hh2, g2)
    }
    assert(h1 === h2, "uniform shift must not change the aHash")
    // garbage is rejected, not mis-decoded
    assert(MediaCodec.decodePngGray("notapng".getBytes) === None)
    assert(MediaCodec.decodePngMeta(Array[Byte](1, 2, 3)) === None)
  }

  test("pcm16Samples round-trips a synthesized WAV sample-for-sample") {
    val samples = Array(0, 12000, -12000, 7, -7, 32767, -32768, 1)
    val pcm = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => pcm.putShort(s.toShort))
    val wav = Multimodal.MediaEncode.wav(1, 8000, pcm.array())
    assert(Multimodal.MediaCodec.pcm16Samples(wav).get.toSeq === samples.toSeq)
  }

  test("integer DFT peaks: a pure tone at bin k peaks at bin k (golden), " +
       "and the double radix-2 FFT agrees peak-for-peak") {
    // golden: frame f carries tone bin f+1 (1..8); peaks must read back
    val n = 32
    val samples = Array.tabulate(8 * n) { i =>
      val f = i / n; val t = i % n
      Multimodal.ToneTab(((f + 1) * t) % n)
    }
    assert(Multimodal.dftPeaks(samples).toSeq === (1 to 8),
      "pure-tone peaks must land on their bins")
    // FFT agreement: per frame, argmax of |FFT|^2 over bins 1..15
    // equals the integer DFT peak
    (0 until 8).foreach { f =>
      val re = Array.tabulate(n)(t => samples(f * n + t).toDouble)
      val im = new Array[Double](n)
      Multimodal.fft(re, im)
      val powers = (1 to 15).map(k => re(k) * re(k) + im(k) * im(k))
      val fftPeak = 1 + powers.indexOf(powers.max)
      assert(fftPeak === f + 1, s"frame $f: fft peak $fftPeak")
    }
    // golden energy pin: Parseval for a pure bin-1 tone — the FFT bin
    // magnitude equals N/2 * amplitude within float tolerance
    val re = Array.tabulate(n)(t => Multimodal.ToneTab(t % n).toDouble)
    val im = new Array[Double](n)
    Multimodal.fft(re, im)
    val mag = math.sqrt(re(1) * re(1) + im(1) * im(1))
    assert(math.abs(mag - n / 2.0 * 12000.0) < n / 2.0 * 12000.0 * 1e-3,
      s"bin-1 magnitude $mag")
  }

  test("constellation robustness: halved samples keep every peak; a " +
       "one-bin tone shift keeps every delta; rotation keeps interior " +
       "tokens") {
    val n = 32
    def clip(bins: Seq[Int], halve: Boolean): Array[Int] =
      Array.tabulate(bins.length * n) { i =>
        val s = Multimodal.ToneTab((bins(i / n) * (i % n)) % n)
        if (halve) s / 2 else s
      }
    val bins = Seq(3, 7, 1, 12, 5, 9, 2, 11)
    val orig = Multimodal.dftPeaks(clip(bins, halve = false)).toSeq
    val amp = Multimodal.dftPeaks(clip(bins, halve = true)).toSeq
    assert(orig === bins && amp === bins, "amplitude must not move peaks")
    val pitch = Multimodal.dftPeaks(
      clip(bins.map(_ + 1), halve = false)).toSeq
    assert(pitch === bins.map(_ + 1))
    assert(pitch.sliding(2).map(p => p(1) - p(0)).toSeq ===
      orig.sliding(2).map(p => p(1) - p(0)).toSeq,
      "pitch shift must preserve the delta fingerprint")
    val rot = Multimodal.dftPeaks(
      clip(bins.drop(2) ++ bins.take(2), halve = false)).toSeq
    def toks(p: Seq[Int]) =
      (p.sliding(2).map(w => (w(0), w(1), 1)) ++
       p.sliding(3).map(w => (w(0), w(2), 2))).toSeq
    val shared = toks(orig).intersect(toks(rot))
    assert(shared.size >= 8,
      s"rotation must keep >= 8 of 13 tokens, got ${shared.size}")
  }
}
