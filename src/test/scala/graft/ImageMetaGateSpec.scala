package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Metadata-consistency gate: each failure class (wrong width, wrong
  * height, wrong format label, undecodable bytes) is caught, and a clean
  * catalog passes wholesale — the precondition of q_image_meta_gate's
  * planted-id oracle. */
class ImageMetaGateSpec extends SparkTestBase {

  test("each mislabel class fails the gate; clean rows pass") {
    import spark.implicits._
    val png = ImagePayload.encodePng(11L, 16, 16)
    val rows = Seq(
      (1L, png, 16, 16, "png"),   // clean
      (2L, png, 17, 16, "png"),   // wrong width
      (3L, png, 16, 15, "png"),   // wrong height
      (4L, png, 16, 16, "jpeg"),  // wrong format label
      (5L, Array[Byte](1, 2, 3), 16, 16, "png")) // undecodable
      .toDF("id", "bytes", "w", "h", "fmt")
    val got = ImagePayload.metaGate(rows)
      .select("id", "meta_ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
  }

  test("clean synthesized catalog passes wholesale") {
    import spark.implicits._
    val images = ImagePayload.synthesize((1L to 50L).toDF("k"), "k")
    assert(ImagePayload.metaGate(images).where(!col("meta_ok")).count() === 0)
  }
}
