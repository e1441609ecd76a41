package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Perceptual-hash image near-duplicates: a single-pixel occlusion patch
  * must stay within the hamming-3 banding window, while unrelated synthetic
  * rasters (random noise, expected hamming ~32) must never pair. */
class ImageNearDupSpec extends SparkTestBase {

  test("patched copies pair up; unrelated images do not") {
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet")
      .select("p_partkey").orderBy("p_partkey").limit(30)
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val copies = ImagePayload.withPatch(images, 2, 2, 1)
      .withColumn("p_partkey", col("p_partkey") + 1000000L)
    val all = images.unionByName(copies)

    val pairs = ImagePayload.imageNearDup(all, "p_partkey", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
    val planted = keys.collect().map(_.getLong(0)).map(k => (k, k + 1000000L)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    info(s"pairs=${pairs.length}, max hamming=${if (pairs.isEmpty) -1 else pairs.map(_._3).max}")
    assert(got == planted, s"missing=${planted -- got}, extra=${got -- planted}")
  }

  test("no natural <= 3-bit dhash collision in the full sf0.01 population (oracle precondition)") {
    // q_image_neardup's planted-pair SQL oracle is exact ONLY if no two
    // unrelated synthesized rasters sit within hamming 3; assert that over
    // every part key the oracle query touches
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet").select("p_partkey")
    val hashes = ImagePayload.withPerceptualHash(ImagePayload.synthesize(keys, "p_partkey"))
      .select("dhash").collect().map(_.getLong(0))
    assert(hashes.length === 2000)
    var minH = 64
    var i = 0
    while (i < hashes.length) {
      var j = i + 1
      while (j < hashes.length) {
        val h = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
        if (h < minH) minH = h
        j += 1
      }
      i += 1
    }
    info(s"min pairwise dhash hamming across 2000 unrelated rasters = $minH")
    assert(minH > 3, s"natural collision at hamming $minH would break the planted-pair oracle")
  }

  test("byte-identical re-encode has hamming 0; undecodable bytes get no hash") {
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet")
      .select("p_partkey").orderBy("p_partkey").limit(5)
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val row = ImagePayload.withPerceptualHash(images).select("bytes", "dhash").head()
    val bytes = row.getAs[Array[Byte]]("bytes")
    // decode->same-size re-encode: visually identical, dhash must agree
    val reenc = ImagePayload.resizeImage(bytes, 16, 16)
    assert(ImagePayload.dhash64(reenc) === Some(row.getLong(1)))
    assert(ImagePayload.dhash64(Array[Byte](1, 2, 3)).isEmpty)
  }
}
