package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2LatLng, S2Point, S2Polyline}

/** k-nearest-polylines join: bucketed composition equals kernel brute
  * force, and the oracle's exactness preconditions hold (no point near the
  * radius boundary; in-radius chain distances pairwise separated, so the
  * (distance, line_id) rank order is fp-stable across engines). */
class KnnPolylinesSpec extends SparkTestBase {

  private lazy val chains: Seq[(Long, S2Polyline)] =
    SparkEntry.FixturePolylines.map { case (k, vs) =>
      k -> new S2Polyline(vs.map { case (la, lo) =>
        S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)
    }

  private def lineDist(line: S2Polyline, p: S2Point): Double =
    line.distanceAngle(p) * S2LatLng.EarthRadiusMeters

  test("nearestPolylinesJoin equals brute force with identical ranks (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = SparkEntry.KnnPolylinesRadiusM
    val got = SpatialJoin.nearestPolylinesJoin(SparkEntry.points(spark, dir), "o_orderkey",
        "lat", "lon", SparkEntry.polylineTable(spark, dir), "line_id", "lats", "lons",
        radiusM = r, k = 2)
      .select(col("line_id"), col("o_orderkey"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = pts.iterator.flatMap { case (id, la, lo) =>
      val p = S2LatLng.fromDegrees(la, lo).toPoint
      chains.map { case (k, line) => (k, lineDist(line, p)) }
        .filter(_._2 <= r)
        .sortBy { case (k, d) => (d, k) }
        .take(2).zipWithIndex
        .map { case ((k, _), i) => (k, id, i + 1) }
    }.toSet
    assert(want.nonEmpty, "fixture degenerate: no point has a chain within radius")
    assert(want.exists(_._3 == 2), "fixture degenerate: no point has 2 chains in radius")
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle margins: radius boundary and pairwise rank separation (sf0.01)") {
    val r = SparkEntry.KnnPolylinesRadiusM
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minRadiusGap = Double.MaxValue
    var minPairGap = Double.MaxValue
    for (row <- latLons) {
      val p = S2LatLng.fromDegrees(row.getDouble(0), row.getDouble(1)).toPoint
      val ds = chains.map { case (_, line) => lineDist(line, p) }
      for (d <- ds) {
        val gap = math.abs(d - r)
        if (gap < minRadiusGap) minRadiusGap = gap
      }
      val in = ds.filter(_ <= r * 1.001).sorted
      for (Seq(a, b) <- in.sliding(2) if in.size >= 2) {
        val gap = b - a
        if (gap < minPairGap) minPairGap = gap
      }
    }
    info(f"min |dist - radius| = $minRadiusGap%.3e m; min in-radius pairwise gap = $minPairGap%.3e m")
    assert(minRadiusGap > 1e-3)
    assert(minPairGap > 1e-3)
  }
}
