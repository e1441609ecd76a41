package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Orientation-canonical (D4-minimum) perceptual hash: rotation/mirror
  * invariance is EXACT (the dihedral orbit is a set, min is orbit-stable),
  * patched-and-rotated copies stay within the banding window, and the
  * q_image_rot_neardup planted-pair oracle's no-natural-collision
  * precondition holds over the full population. */
class RotNearDupSpec extends SparkTestBase {

  test("canonical hash is bit-identical under every quarter-turn and the mirror") {
    val bytes = ImagePayload.encodePng(4217L, 16, 16)
    val base = ImagePayload.dhashDihedral(bytes)
    assert(base.nonEmpty)
    for (t <- 1 to 3) {
      val rot = ImagePayload.dhashDihedral(ImagePayload.rotateBytes(bytes, t))
      assert(rot === base, s"quarter-turn $t changed the canonical hash")
    }
    val mir = ImagePayload.dhashDihedral(ImagePayload.mirrorBytes(bytes))
    assert(mir === base, "mirror changed the canonical hash")
    // and a rotated MIRROR (an arbitrary D4 element)
    val rm = ImagePayload.dhashDihedral(
      ImagePayload.rotateBytes(ImagePayload.mirrorBytes(bytes), 3))
    assert(rm === base)
    // undecodable bytes get no hash, exactly like dhash64
    assert(ImagePayload.dhashDihedral(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("rotateQuarter is an exact pixel permutation (4 turns = identity, PNG roundtrip exact)") {
    val bytes = ImagePayload.encodePng(99L, 16, 16)
    val r4 = (1 to 4).foldLeft(bytes)((b, _) => ImagePayload.rotateBytes(b, 1))
    // pixel-exact identity after four quarter turns (bytes may differ: PNG
    // encoder freedom), checked via the full-resolution raster hash
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val img4 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r4))
    val px0 = for (y <- 0 until 16; x <- 0 until 16) yield img0.getRGB(x, y)
    val px4 = for (y <- 0 until 16; x <- 0 until 16) yield img4.getRGB(x, y)
    assert(px0 == px4, "four quarter-turns must reproduce the source pixels exactly")
  }

  test("rotated re-uploads pair at hamming 0; patched+rotated copies still pair") {
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet")
      .select("p_partkey").orderBy("p_partkey").limit(30)
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val rotated = ImagePayload.withRotation(images, 1)
      .withColumn("p_partkey", col("p_partkey") + 1000000L)
    val patchedRot = ImagePayload.withRotation(
        ImagePayload.withPatch(images, 2, 2, 1), 2)
      .withColumn("p_partkey", col("p_partkey") + 2000000L)
    val all = images.unionByName(rotated).unionByName(patchedRot)
    val pairs = ImagePayload.rotImageNearDup(all, "p_partkey", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
    val ks = keys.collect().map(_.getLong(0))
    // every cluster {k, k+1e6, k+2e6} must close: 3 pairs per key
    val want = ks.flatMap(k =>
      Seq((k, k + 1000000L), (k, k + 2000000L), (k + 1000000L, k + 2000000L))).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(got == want, s"missing=${want -- got}, extra=${got -- want}")
    // pure rotations are exactly hamming 0 (p._1 < 1e6 keeps only the
    // (original, rotated-copy) pairs — (k+1e6, k+2e6) also differs by 1e6
    // but its left side is a copy id and it carries the patch's bits)
    val rotHams = pairs.filter(p => p._1 < 1000000L && p._2 == p._1 + 1000000L).map(_._3)
    assert(rotHams.nonEmpty && rotHams.forall(_ == 0), s"rotation pairs not at 0: ${rotHams.toSeq}")
  }

  test("no non-planted <= 3-bit canonical-hash pair in the full q_image_rot_neardup population") {
    // the planted-pair oracle is exact ONLY if nothing else in the
    // population (2000 originals + 50 rotated copies) pairs within the
    // banding window; rotated copies carry hashes IDENTICAL to their
    // source, so the check covers them by covering the originals plus the
    // planted rows
    val keys = spark.read.parquet(s"${sf("sf0.01")}/part.parquet").select("p_partkey")
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val planted = ImagePayload.withRotation(images.where(col("p_partkey") % 40 === 0), 1)
      .withColumn("p_partkey", col("p_partkey") + 100000000L)
    val pop = ImagePayload.withRotInvariantHash(images.unionByName(planted))
      .select("p_partkey", "rdhash").collect()
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
    info(s"min non-planted pairwise canonical hamming across 2050 rasters = $minNonPlanted")
    assert(minNonPlanted > 3,
      s"non-planted pair at hamming $minNonPlanted would break the planted-pair oracle")
  }
}
