package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{R1Interval, S1Interval, S2LatLngRect}

/** Region-region intersection join: the bucketed covering-cell join must
  * reproduce the exact pairwise kernel answer, including antimeridian
  * wraps and near-polar rects (candidate completeness is the thing the
  * bucketing could get wrong; the kernel's interval math is pinned by its
  * own suite). */
class RectJoinSpec extends SparkTestBase {

  private def kernelIntersects(a: (Double, Double, Double, Double),
                               b: (Double, Double, Double, Double)): Boolean = {
    def rect(r: (Double, Double, Double, Double)) = S2LatLngRect(
      R1Interval(math.toRadians(r._1), math.toRadians(r._2)),
      S1Interval(math.toRadians(r._3), math.toRadians(r._4)))
    rect(a).intersects(rect(b))
  }

  test("rectIntersectJoin == brute-force kernel intersects (wraps, poles, touches)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def wrapLon(x: Double): Double =
      if (x < -180) x + 360 else if (x > 180) x - 360 else x
    val random = (0 until 120).map { i =>
      val clat = rnd.nextDouble() * 170 - 85
      val clon = rnd.nextDouble() * 360 - 180
      val hh = 0.5 + rnd.nextDouble() * 2
      val hw = 0.5 + rnd.nextDouble() * 3
      (i.toLong, math.max(-89.9, clat - hh), math.min(89.9, clat + hh),
        wrapLon(clon - hw), wrapLon(clon + hw))
    }
    val adversarial = Seq(
      (1000L, -5.0, 5.0, 178.0, -178.0),   // wraps the antimeridian
      (1001L, -4.0, 4.0, 179.0, -179.5),   // wraps, overlaps 1000
      (1002L, -4.0, 4.0, -179.0, -175.0),  // non-wrap, meets 1000/1001 across the seam
      (1003L, 84.0, 89.9, -170.0, -100.0), // near-polar
      (1004L, 85.0, 89.5, -120.0, -20.0),  // near-polar, overlaps 1003
      (1005L, -3.0, -1.0, 10.0, 12.0),
      (1006L, -1.0, 2.0, 12.0, 14.0))      // touches 1005 at lat=-1, lon=12 corner
    val all = random ++ adversarial
    val df = all.toDF("id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val got = SpatialJoin.rectIntersectJoin(df, "id",
      "lat_lo", "lat_hi", "lon_lo", "lon_hi", level = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- all; b <- all if a._1 < b._1
      if kernelIntersects((a._2, a._3, a._4, a._5), (b._2, b._3, b._4, b._5))
    } yield (a._1, b._1)).toSet
    assert(expected.nonEmpty)
    assert(got === expected,
      s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    // the adversarial relationships specifically
    assert(got.contains((1000L, 1001L)), "wrap-wrap overlap")
    assert(got.contains((1000L, 1002L)), "wrap meets non-wrap across the seam")
    assert(got.contains((1003L, 1004L)), "near-polar overlap")
    assert(got.contains((1005L, 1006L)), "corner touch is closed-interval intersect")
  }
}
