package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2LatLng, S2Polyline, S2RegionCoverer}

/** Polyline-table distance join: executor-side coverings equal the kernel,
  * the bucketed composition equals brute force, and the oracle's
  * radius-boundary margin precondition holds. */
class PolylineJoinSpec extends SparkTestBase {

  private def lineOf(verts: Seq[(Double, Double)]): S2Polyline =
    new S2Polyline(verts.map { case (la, lo) =>
      S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  test("s2_polyline_covering == driver kernel covering per row") {
    import spark.implicits._
    import graft.functions.s2functions._
    val lines = SparkEntry.FixturePolylines.take(5)
    val df = lines.map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons").repartition(3)
    val got = df.select(col("line_id"),
        explode(s2_polyline_covering(col("lats"), col("lons"), 7)).as("cell"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((k, verts) <- lines) {
      val line = lineOf(verts)
      val want = S2RegionCoverer.getSimpleCovering(line, line.vertex(0), 7).toSet
      assert(got(k) == want, s"line $k covering diverged from kernel")
      assert(want.size > 1, s"line $k covering degenerate (${want.size} cells)")
    }
  }

  test("polylineDistanceJoin equals brute-force min-over-edges distance (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = SparkEntry.PolylineJoinRadiusM
    val got = SpatialJoin.polylineDistanceJoin(SparkEntry.points(spark, dir), "lat", "lon",
        SparkEntry.polylineTable(spark, dir), "line_id", "lats", "lons", r)
      .select("line_id", "o_orderkey").as[(Long, Long)].collect().toSet
    val lines = SparkEntry.FixturePolylines.map { case (k, vs) => k -> lineOf(vs) }
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (id, la, lo) <- pts.iterator
      p = S2LatLng.fromDegrees(la, lo).toPoint
      (k, line) <- lines
      if line.distanceAngle(p) * S2LatLng.EarthRadiusMeters <= r
    } yield (k, id)).toSet
    assert(want.nonEmpty, "fixture produced an empty join — polylines miss every point")
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle margin: no sf0.01 point within 1e-3 m of the radius boundary") {
    val lines = SparkEntry.FixturePolylines.map { case (_, vs) => lineOf(vs) }
    val r = SparkEntry.PolylineJoinRadiusM
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minGap = Double.MaxValue
    for (row <- latLons) {
      val p = S2LatLng.fromDegrees(row.getDouble(0), row.getDouble(1)).toPoint
      for (line <- lines) {
        val gap = math.abs(line.distanceAngle(p) * S2LatLng.EarthRadiusMeters - r)
        if (gap < minGap) minGap = gap
      }
    }
    info(f"min |distance - radius| over ${latLons.length} points x ${lines.size} lines = $minGap%.3e m")
    assert(minGap > 1e-3)
  }

  test("reserved-name collision fails loudly") {
    val dir = sf("sf0.001")
    val bad = SparkEntry.polylineTable(spark, dir).withColumn("__bucket", lit(1L))
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.polylineDistanceJoin(SparkEntry.points(spark, dir), "lat", "lon",
        bad, "line_id", "lats", "lons", SparkEntry.PolylineJoinRadiusM)
    }
    assert(e.getMessage.contains("__bucket"))
  }
}
