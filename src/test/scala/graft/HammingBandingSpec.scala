package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SpatialJoin}

/** Property checks for the two completeness claims new in round 2:
  * 16-bit-band pigeonhole finds EVERY hamming<=3 pair, and the
  * neighbor-cell distance join finds every pair within the radius across
  * the antimeridian and the poles. */
class HammingBandingSpec extends SparkTestBase {

  test("hamming64Pairs == brute force over seeded random hashes (incl. planted near pairs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val base = Seq.fill(150)(rnd.nextLong())
    // plant pairs at hamming exactly 1, 3 and 4 off existing hashes
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((x, b) => x ^ (1L << b))
    val hashes = (base ++ Seq(
      flip(base(0), Seq(5)), flip(base(1), Seq(0, 21, 63)), flip(base(2), Seq(1, 2, 3, 4))))
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = hashes.toDF("id", "h")
    val got = Dedup.hamming64Pairs(df, "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ha, ia) <- hashes.map(t => (t._2, t._1)); (hb, ib) <- hashes.map(t => (t._2, t._1))
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.exists { case (a, b) => b >= 150 }, "planted pairs must be present")
  }

  test("distanceJoin finds pairs across the antimeridian and over the pole") {
    import spark.implicits._
    val pts = Seq(
      (1L, 10.0, 179.9), (2L, 10.0, -179.9), // ~22 km apart across the antimeridian
      (3L, 89.9, 0.0), (4L, 89.9, 180.0),    // ~22 km apart across the north pole
      (5L, -89.95, 45.0), (6L, -89.95, -135.0), // ~11 km across the south pole
      (7L, 0.0, 0.0))                        // isolated
      .toDF("id", "lat", "lon")
    val got = SpatialJoin.distanceJoin(pts, "lat", "lon", "id", radiusM = 50000.0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L), (5L, 6L)))
  }
}
