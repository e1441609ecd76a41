package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** SSIM metric identities plus the two-sided margin precondition that
  * makes q_image_ssim's planted-rule oracle exact. */
class ImageSsimSpec extends SparkTestBase {

  test("ssim identities: self = 1, symmetric, undecodable/mismatched = None") {
    val a = ImagePayload.encodePng(7L, 16, 16)
    val b = ImagePayload.encodePng(8L, 16, 16)
    assert(math.abs(ImagePayload.ssim(a, a).get - 1.0) < 1e-12)
    assert(ImagePayload.ssim(a, b) === ImagePayload.ssim(b, a))
    assert(ImagePayload.ssim(a, Array[Byte](1, 2, 3)).isEmpty)
    assert(ImagePayload.ssim(a, ImagePayload.encodePng(8L, 8, 8)).isEmpty)
  }

  test("two-sided gate margin over the full sf0.01 key population") {
    // patched copies must clear tau = 0.8 with room; unrelated neighbor
    // rasters must miss it with room — so sub-ulp decode/arithmetic noise
    // can never flip a pair across the gate
    var minTrue = Double.MaxValue
    var maxDecoy = Double.MinValue
    for (k <- 0L until 2000L) {
      val img = ImagePayload.encodePng(k, 16, 16)
      if (k % 40 == 0) {
        val patched = ImagePayload.patchImage(img, 2, 2, 1)
        minTrue = math.min(minTrue, ImagePayload.ssim(img, patched).get)
      }
      if (k % 40 == 20) {
        val other = ImagePayload.encodePng(k + 1, 16, 16)
        maxDecoy = math.max(maxDecoy, ImagePayload.ssim(img, other).get)
      }
    }
    info(f"min true-pair ssim $minTrue%.4f, max decoy ssim $maxDecoy%.4f (tau 0.8)")
    assert(minTrue > 0.9, f"true pairs too close to the gate: $minTrue%.4f")
    assert(maxDecoy < 0.5, f"decoys too close to the gate: $maxDecoy%.4f")
  }

  test("ssimGate keeps exactly the planted pairs end to end") {
    import spark.implicits._
    val images = ImagePayload.synthesize((0L until 400L).toDF("k"), "k")
    val src = images.select(col("k").as("id_a"), col("bytes").as("__ba"))
    val trueB = ImagePayload.withPatch(images.where(col("k") % 40 === 0), 2, 2, 1)
      .select(col("k").as("id_a"), (col("k") + 100000000L).as("id_b"),
        col("bytes").as("__bb"))
    val decoyB = images.select((col("k") - 1).as("id_a"),
        (col("k") + 200000000L).as("id_b"), col("bytes").as("__bb"))
      .where(pmod(col("id_a"), lit(40)) === 20)
    val got = ImagePayload.ssimGate(
        src.join(trueB.unionByName(decoyB), "id_a"), "__ba", "__bb", tau = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 400L).filter(_ % 40 == 0).map(k => (k, k + 100000000L)).toSet
    assert(got === want)
  }
}
