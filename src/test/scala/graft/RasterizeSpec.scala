package graft

import org.apache.spark.sql.functions._

import graft.operators.Vectorize
import graft.s2.{R1Interval, S1Interval, S2LatLngRect, S2RegionCoverer}

/** Distributed vector->raster: per-row coverings equal the driver-side
  * kernel, and the rasterize->tile-join->refine composition is exact. */
class RasterizeSpec extends SparkTestBase {

  private def kernelCovering(latLo: Double, latHi: Double,
                             lonLo: Double, lonHi: Double, level: Int): Set[Long] = {
    val rect = S2LatLngRect(
      R1Interval(math.toRadians(latLo), math.toRadians(latHi)),
      S1Interval(math.toRadians(lonLo), math.toRadians(lonHi)))
    S2RegionCoverer.getSimpleCovering(rect, rect.center.toPoint, level).toSet
  }

  test("rasterizeRects == kernel covering per row, including a wrapping rect") {
    import spark.implicits._
    val rects = Seq(
      (1L, 10.005, 20.005, 30.005, 50.005),
      (2L, -45.005, -35.005, 170.005, -175.005), // wraps the antimeridian
      (3L, 60.005, 70.005, -10.005, 10.005)
    ).toDF("region_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi").repartition(3)
    val got = Vectorize.rasterizeRects(rects, "lat_lo", "lat_hi", "lon_lo", "lon_hi", 6)
      .select("region_id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((rid, la, lh, lo, hi) <- Seq((1L, 10.005, 20.005, 30.005, 50.005),
      (2L, -45.005, -35.005, 170.005, -175.005), (3L, 60.005, 70.005, -10.005, 10.005))) {
      assert(got(rid) == kernelCovering(la, lh, lo, hi, 6), s"region $rid covering diverged")
    }
  }

  test("rasterize -> tile join -> refine equals brute-force rect containment") {
    import spark.implicits._
    import graft.functions.s2functions._
    val rects = Seq(
      (1L, -5.005, 5.005, -20.005, 20.005),
      (2L, 30.005, 45.005, 160.005, -170.005) // wrapping
    ).toDF("region_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val pts = (0L until 4000L).toDF("id")
      .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / 100.0 - 90.0)
      .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / 100.0 - 180.0)
      .withColumn("tile", s2_tile(col("lat"), col("lon"), 6))
    val raster = Vectorize.rasterizeRects(rects, "lat_lo", "lat_hi", "lon_lo", "lon_hi", 6)
    val refined = raster.join(pts, raster("cell") === pts("tile"))
      .where(col("lat").between(col("lat_lo"), col("lat_hi")) &&
        (((col("lon_lo") <= col("lon_hi")) && col("lon").between(col("lon_lo"), col("lon_hi"))) ||
          ((col("lon_lo") > col("lon_hi")) && (col("lon") >= col("lon_lo") || col("lon") <= col("lon_hi")))))
      .select("region_id", "id").as[(Long, Long)].collect().sorted
    val brute = rects.crossJoin(pts)
      .where(col("lat").between(col("lat_lo"), col("lat_hi")) &&
        (((col("lon_lo") <= col("lon_hi")) && col("lon").between(col("lon_lo"), col("lon_hi"))) ||
          ((col("lon_lo") > col("lon_hi")) && (col("lon") >= col("lon_lo") || col("lon") <= col("lon_hi")))))
      .select("region_id", "id").as[(Long, Long)].collect().sorted
    assert(refined.sameElements(brute))
    assert(brute.nonEmpty, "test rects should contain some points")
  }

  test("oversized per-row covering fails fast instead of exploding") {
    import spark.implicits._
    val rects = Seq((1L, -80.005, 80.005, -170.005, 170.005))
      .toDF("region_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val e = intercept[Exception] {
      Vectorize.rasterizeRects(rects, "lat_lo", "lat_hi", "lon_lo", "lon_hi", 14).collect()
    }
    assert(e.getMessage != null)
  }
}
