package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Colorfulness (grayscale) gate: decolorized rasters score EXACTLY zero
  * (R=G=B kills both opponent axes), the colored noise population scores
  * two orders of magnitude above the threshold — the margin that makes the
  * q_image_gray planted-id oracle exact. */
class ImageColorfulnessSpec extends SparkTestBase {

  test("colored population and grayscale copies sit far on opposite sides of the gate") {
    import spark.implicits._
    val images = ImagePayload.synthesize((1L to 200L).toDF("p_partkey"), "p_partkey")
    val colored = ImagePayload.withColorfulness(images)
      .select("colorfulness").collect().map(_.getDouble(0))
    val gray = ImagePayload.withColorfulness(ImagePayload.withGrayscale(images))
      .select("colorfulness").collect().map(_.getDouble(0))
    assert(colored.min > 10 * SparkEntry.ColorfulnessThreshold,
      s"colored min ${colored.min} too close to the gate")
    assert(gray.max == 0.0, s"grayscale must score exactly 0, got ${gray.max}")
  }

  test("colorfulness is a pure function of pixels; null for undecodable bytes") {
    val a = ImagePayload.colorfulness(ImagePayload.encodePng(42L, 16, 16)).get
    val b = ImagePayload.colorfulness(ImagePayload.encodePng(42L, 16, 16)).get
    assert(a == b)
    assert(ImagePayload.colorfulness(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("decolorize is idempotent and PSNR-comparable to its own re-encode") {
    val g1 = ImagePayload.grayscaleImage(ImagePayload.encodePng(7L, 16, 16))
    val g2 = ImagePayload.grayscaleImage(g1)
    assert(java.util.Arrays.equals(g1, g2), "grayscale of grayscale must be identical")
  }
}
