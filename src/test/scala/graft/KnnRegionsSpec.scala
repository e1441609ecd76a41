package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2LatLng, S2Loop, S2Point}

/** k-nearest-regions join: bucketed composition equals kernel brute force,
  * and the oracle's exactness preconditions hold (no point near the radius
  * boundary; in-radius region distances pairwise separated, so the
  * (distance, region_id) rank order is fp-stable across engines). */
class KnnRegionsSpec extends SparkTestBase {

  private def loopOf(verts: Seq[(Double, Double)]): S2Loop =
    new S2Loop(verts.map { case (la, lo) =>
      S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  private lazy val loops: Seq[(Long, S2Loop)] =
    SparkEntry.HexPolys.map { case (k, vs, _) => k -> loopOf(vs) } ++
      SparkEntry.HexPolysVar.map { case (k, vs, _) => (k + 100L) -> loopOf(vs) }

  private def regionDist(loop: S2Loop, p: S2Point): Double =
    if (loop.contains(p)) 0.0 else loop.getDistance(p) * S2LatLng.EarthRadiusMeters

  test("nearestRegionsJoin equals brute force with identical ranks (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = SparkEntry.KnnRegionsRadiusM
    val catalog = SparkEntry.hexPolyTable(spark, dir).unionByName(
      SparkEntry.hexPolyVarTable(spark, dir).withColumn("region_id", col("region_id") + 100L))
    val got = SpatialJoin.nearestRegionsJoin(SparkEntry.points(spark, dir), "o_orderkey",
        "lat", "lon", catalog, "region_id", "lats", "lons",
        radiusM = r, k = 3)
      .select(col("region_id"), col("o_orderkey"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = pts.iterator.flatMap { case (id, la, lo) =>
      val p = S2LatLng.fromDegrees(la, lo).toPoint
      loops.map { case (k, loop) => (k, regionDist(loop, p)) }
        .filter(_._2 <= r)
        .sortBy { case (k, d) => (d, k) }
        .take(3).zipWithIndex
        .map { case ((k, _), i) => (k, id, i + 1) }
    }.toSet
    assert(want.nonEmpty, "fixture degenerate: no point has a region within radius")
    assert(want.exists(_._3 >= 2), "fixture degenerate: no point has 2+ regions in radius")
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle margins: radius boundary and pairwise rank separation (sf0.01)") {
    val r = SparkEntry.KnnRegionsRadiusM
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minRadiusGap = Double.MaxValue
    var minPairGap = Double.MaxValue
    for (row <- latLons) {
      val p = S2LatLng.fromDegrees(row.getDouble(0), row.getDouble(1)).toPoint
      val ds = loops.map { case (_, loop) => regionDist(loop, p) }
      for (d <- ds) {
        val gap = math.abs(d - r)
        if (gap < minRadiusGap) minRadiusGap = gap
      }
      // EXACT 0.0-vs-0.0 ties (a point inside two overlapping regions) are
      // fp-stable in both engines — the containment tests are bit-robust
      // given the edge-plane margins, both sides compute literally 0.0, and
      // the region_id tiebreak is integer — so only distances that are
      // actually COMPUTED (nonzero, or zero-vs-nonzero) need separation
      val in = ds.filter(_ <= r + 1.0).sorted
      for (Seq(a, b) <- in.sliding(2) if in.size >= 2 && !(a == 0.0 && b == 0.0)) {
        val gap = b - a
        if (gap < minPairGap) minPairGap = gap
      }
    }
    info(f"min |dist - radius| = $minRadiusGap%.3e m; min in-radius pairwise gap " +
      f"(exact-zero ties exempt) = $minPairGap%.3e m")
    assert(minRadiusGap > 1e-3)
    assert(minPairGap > 1e-3)
  }
}
