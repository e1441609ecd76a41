package graft

import org.apache.spark.sql.functions._

import graft.operators.{ImagePayload, VideoPayload}

/** GRFV1 container + gates: real parse, real per-frame PNG decode, and the
  * preconditions that make q_video_meta / q_video_frames' planted oracles
  * exact (no natural all-equal video, truncation detected, sampling parity). */
class VideoPayloadSpec extends SparkTestBase {

  test("container roundtrip: header + every frame decodes, frame 0 pixel-exact") {
    val key = 7L
    val bytes = VideoPayload.encodeVideo(key, 16, 16, static = false, truncateLast = false)
    val Some((hdr, frames)) = VideoPayload.parseFrames(bytes)
    assert(hdr.nFrames === VideoPayload.nFramesFor(key))
    assert(hdr.fps === VideoPayload.fpsFor(key))
    assert(frames.forall(_ != null))
    // frame 0's raster is the deterministic pixel rule at frameKey(key, 0)
    val psnr = ImagePayload.psnrVsExpected(frames(0),
      VideoPayload.frameKey(key, 0, static = false), 16, 16)
    assert(psnr.isPosInfinity, s"frame 0 must be lossless, got PSNR $psnr")
  }

  test("videoMeta: static iff planted; truncated videos fail with is_static null") {
    val stat = VideoPayload.videoMeta(
      VideoPayload.encodeVideo(20L, 16, 16, static = true, truncateLast = false), 16, 16)
    assert(stat.frames_ok && stat.is_static === Some(true))
    val dyn = VideoPayload.videoMeta(
      VideoPayload.encodeVideo(21L, 16, 16, static = false, truncateLast = false), 16, 16)
    assert(dyn.frames_ok && dyn.is_static === Some(false))
    val trunc = VideoPayload.videoMeta(
      VideoPayload.encodeVideo(33L, 16, 16, static = false, truncateLast = true), 16, 16)
    assert(trunc.n_frames === Some(VideoPayload.nFramesFor(33L)) && !trunc.frames_ok
      && trunc.is_static.isEmpty)
    // garbage bytes: no header, everything unknown
    val bad = VideoPayload.videoMeta(Array[Byte](1, 2, 3), 16, 16)
    assert(bad.n_frames.isEmpty && !bad.frames_ok)
    // interior corruption (full length, damaged payload): decode-level failure
    val ok = VideoPayload.encodeVideo(5L, 16, 16, static = false, truncateLast = false)
    val mid = ok.length / 2
    val corrupted = ok.clone(); var i = mid
    while (i < mid + 40 && i < corrupted.length) { corrupted(i) = (corrupted(i) ^ 0x5a).toByte; i += 1 }
    assert(!VideoPayload.videoMeta(corrupted, 16, 16).frames_ok)
  }

  test("sampling parity: a truncated last frame is caught iff the stride lands on it") {
    // key % 4 == 0 -> n=3, last index 2 sampled by every=2 -> caught
    val caught = VideoPayload.sampledMeta(
      VideoPayload.encodeVideo(4L, 16, 16, static = false, truncateLast = true), 2, 16, 16)
    assert(caught.n_sampled === Some(2) && !caught.sampled_ok)
    // key % 4 == 1 -> n=4, last index 3 NOT sampled -> invisible to the gate
    val missed = VideoPayload.sampledMeta(
      VideoPayload.encodeVideo(5L, 16, 16, static = false, truncateLast = true), 2, 16, 16)
    assert(missed.n_sampled === Some(2) && missed.sampled_ok)
    // sampleFrames returns exactly the sampled payloads, damaged ones null
    val fs = VideoPayload.sampleFrames(
      VideoPayload.encodeVideo(4L, 16, 16, static = false, truncateLast = true), 2)
    assert(fs.length === 2 && fs(0) != null && fs(1) == null)
  }

  test("oracle precondition: no natural static video in the sf0.01 key population") {
    // dynamic frames get independent rasters from the integer mix; assert
    // frame 0 != frame 1 for every non-planted key at the driver-gate
    // scale, which is what makes `is_static <=> key % 20 == 0` exact
    (1L to 2000L).filter(k => k % 20 != 0 && k % 33 != 0).foreach { k =>
      val m = VideoPayload.videoMeta(
        VideoPayload.encodeVideo(k, 16, 16, static = false, truncateLast = false), 16, 16)
      assert(m.is_static === Some(false), s"natural static video at key $k")
    }
  }

  test("videoNearDup recovers exactly the planted re-posts with shared == n_sampled") {
    import spark.implicits._
    val videos = VideoPayload.synthesizeReposts((1L to 500L).toDF("k"), "k")
    val got = VideoPayload.videoNearDup(videos, "k", every = 2, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (1L to 500L)
      .filter(k => k % 25 == 0 && k % 33 != 0)
      .map(k => (k, k + 1000000000L, (2 + k % 4) / 2 + 1)).toSet
    assert(got === expected)
  }

  test("oracle precondition: no natural same-position dhash collision in the base population") {
    import spark.implicits._
    // base table only (no re-posts): ANY pair here would be a natural
    // collision breaking the planted oracle's exactness — require none at
    // minShared = 1, stronger than the catalog query's 2
    val videos = VideoPayload.synthesize((1L to 2000L).toDF("k"), "k")
    val natural = VideoPayload.videoNearDup(videos, "k", every = 2, minShared = 1).count()
    assert(natural === 0L, s"natural near-dup pairs in the base population: $natural")
  }

  test("explodeSampledFrames emits exactly the readable strided frames, all decodable") {
    import spark.implicits._
    val videos = VideoPayload.synthesize((1L to 150L).toDF("k"), "k")
    val frames = VideoPayload.explodeSampledFrames(videos, every = 2)
    val rows = frames.select("k", "frame_idx", "frame").collect()
    val byKey = rows.groupBy(_.getLong(0))
    (1L to 150L).foreach { k =>
      val n = VideoPayload.nFramesFor(k)
      val expected = (0 until n by 2).filterNot(i => k % 33 == 0 && i == n - 1).toSet
      assert(byKey.get(k).map(_.map(_.getInt(1)).toSet).getOrElse(Set.empty) === expected, s"key $k")
    }
    // every emitted frame is a real decodable PNG of the cataloged dims
    rows.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    }
  }

  test("metaGate / sampledGate over a synthesized table match the planted rules") {
    import spark.implicits._
    val videos = VideoPayload.synthesize((1L to 200L).toDF("k"), "k")
    val meta = VideoPayload.metaGate(videos)
      .select("k", "n_frames", "fps", "frames_ok", "is_static").collect()
    meta.foreach { r =>
      val k = r.getLong(0)
      assert(r.getInt(1) === VideoPayload.nFramesFor(k))
      assert(r.getInt(2) === VideoPayload.fpsFor(k))
      assert(r.getBoolean(3) === (k % 33 != 0))
      if (k % 33 == 0) assert(r.isNullAt(4))
      else assert(r.getBoolean(4) === (k % 20 == 0))
    }
    val sampled = VideoPayload.sampledGate(videos, every = 2)
      .select("k", "n_sampled", "sampled_ok").collect()
    sampled.foreach { r =>
      val k = r.getLong(0)
      assert(r.getInt(1).toLong === (2 + k % 4) / 2 + 1)
      assert(r.getBoolean(2) === (k % 33 != 0 || (k % 4) % 2 != 0))
    }
  }
}
