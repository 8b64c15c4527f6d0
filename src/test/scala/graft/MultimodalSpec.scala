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
}
