package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Variance-of-Laplacian blur gate: the deterministic noise rasters are
  * maximally sharp (independent neighboring pixels) while their
  * bilinear-downsampled-and-back copies are piecewise-linear low-pass
  * surfaces — the two populations must straddle the gate threshold with
  * wide margin, which is what makes the q_image_sharpness planted-id
  * oracle exact rather than merely expected. */
class ImageSharpnessSpec extends SparkTestBase {

  test("sharp noise rasters and blurred copies straddle the threshold with >= 4x margin") {
    import spark.implicits._
    val images = ImagePayload.synthesize(
      (1L to 200L).toDF("p_partkey"), "p_partkey")
    val sharp = ImagePayload.withSharpness(images)
      .select("sharpness").collect().map(_.getDouble(0))
    val blurred = ImagePayload.withSharpness(ImagePayload.withBlur(images))
      .select("sharpness").collect().map(_.getDouble(0))
    info(f"sharp:   min ${sharp.min}%.3e max ${sharp.max}%.3e")
    info(f"blurred: min ${blurred.min}%.3e max ${blurred.max}%.3e")
    val t = SparkEntry.SharpnessThreshold
    assert(sharp.min > 4.0 * t,
      f"sharp population dips to ${sharp.min}%.3e, < 4x the $t%.3e threshold")
    assert(blurred.max < t / 4.0,
      f"blurred population reaches ${blurred.max}%.3e, > 1/4 of the $t%.3e threshold")
  }

  test("sharpness is null for undecodable bytes and tiny rasters") {
    import spark.implicits._
    assert(ImagePayload.sharpness(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImagePayload.sharpness(ImagePayload.encodePng(7L, 2, 2)).isEmpty)
    val df = Seq(Tuple1(Array[Byte](9, 9))).toDF("bytes")
    assert(ImagePayload.withSharpness(df).head().isNullAt(1))
  }

  test("sharpness is a pure function of pixels: byte-identical re-encode agrees") {
    val a = ImagePayload.sharpness(ImagePayload.encodePng(42L, 16, 16)).get
    val b = ImagePayload.sharpness(ImagePayload.encodePng(42L, 16, 16)).get
    assert(a == b)
    assert(a > 0.0)
  }
}
