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

  test("no non-planted <= 3-bit dhash pair in the full q_image_neardup population (oracle precondition)") {
    // q_image_neardup's planted-pair SQL oracle is exact ONLY if, across
    // the COMPLETE population the query builds (2000 originals + 50
    // patched copies), no pair is within hamming 3 except the planted
    // (original, its-own-copy) pairs themselves — checking originals alone
    // would miss a patched copy drifting within 3 bits of an UNRELATED
    // raster (patching moves a hash by up to a few bits)
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet").select("p_partkey")
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val planted = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
      .withColumn("p_partkey", col("p_partkey") + 100000000L)
    val pop = ImagePayload.withPerceptualHash(images.unionByName(planted))
      .select("p_partkey", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pop.length === 2050)
    var minNonPlanted = 64
    var i = 0
    while (i < pop.length) {
      var j = i + 1
      while (j < pop.length) {
        val (ia, ha) = pop(i)
        val (ib, hb) = pop(j)
        val isPlantedPair =
          math.max(ia, ib) == math.min(ia, ib) + 100000000L && math.min(ia, ib) % 40 == 0
        if (!isPlantedPair) {
          val h = java.lang.Long.bitCount(ha ^ hb)
          if (h < minNonPlanted) minNonPlanted = h
        }
        j += 1
      }
      i += 1
    }
    info(s"min non-planted pairwise dhash hamming across 2050 rasters = $minNonPlanted")
    assert(minNonPlanted > 3,
      s"non-planted pair at hamming $minNonPlanted would break the planted-pair oracle")
  }

  test("q_image_dup_clusters 3-population precondition: copies pair with their original, no cross-cluster <= 3-bit pair") {
    // the cluster oracle {k, k+1e8, k+2e8} -> label k is exact iff
    // (a) both patched copies sit within hamming 3 of their original (the
    //     CC then closes the 3-member component regardless of the
    //     copy1-copy2 distance), and
    // (b) no pair from DIFFERENT clusters (or involving an unplanted
    //     original) is within hamming 3
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet").select("p_partkey")
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val sel = images.where(col("p_partkey") % 40 === 0)
    val copy1 = ImagePayload.withPatch(sel, 2, 2, 1)
      .withColumn("p_partkey", col("p_partkey") + 100000000L)
    val copy2 = ImagePayload.withPatch(sel, 3, 3, 1)
      .withColumn("p_partkey", col("p_partkey") + 200000000L)
    val pop = ImagePayload.withPerceptualHash(
      images.unionByName(copy1).unionByName(copy2))
      .select("p_partkey", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hashOf = pop.toMap
    assert(pop.length === hashOf.size)
    val clusterOf = (k: Long) => k % 100000000L
    // (a) within-cluster original<->copy distances
    for ((k, h) <- pop if k >= 100000000L) {
      val d = java.lang.Long.bitCount(h ^ hashOf(clusterOf(k)))
      assert(d <= 3, s"copy $k at hamming $d from its original")
    }
    // (b) min cross-cluster distance
    var minCross = 64
    var i = 0
    while (i < pop.length) {
      var j = i + 1
      while (j < pop.length) {
        if (clusterOf(pop(i)._1) != clusterOf(pop(j)._1)) {
          val h = java.lang.Long.bitCount(pop(i)._2 ^ pop(j)._2)
          if (h < minCross) minCross = h
        }
        j += 1
      }
      i += 1
    }
    info(s"min cross-cluster dhash hamming across ${pop.length} rasters = $minCross")
    assert(minCross > 3, s"cross-cluster pair at hamming $minCross breaks the cluster oracle")
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
