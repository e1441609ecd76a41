package graft

import graft.s2.{S2LatLng, S2Point}

/** Validates the q_pip_polygon oracle's exactness precondition: engine
  * (RobustCcw crossing tests) and DuckDB oracle (sign of the same triple
  * product, double arithmetic) can only disagree for points within ~1e-15
  * of a diamond edge plane. This spec pins that no derived point comes
  * within 1e-9 rad of any of the 8 planes — six orders of magnitude of
  * headroom (observed minimum at sf0.01: ~6.8e-6). */
class OracleMarginSpec extends SparkTestBase {

  private def planeNormals(verts: Seq[(Double, Double)]): Seq[S2Point] = {
    val pts = verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
    pts.indices.map(i => pts(i).cross(pts((i + 1) % pts.size)))
  }

  test("no derived point within 1e-9 of a diamond edge plane (sf0.01)") {
    val normals = planeNormals(SparkEntry.DiamondShell) ++ planeNormals(SparkEntry.DiamondHole)
    val latLons = SparkEntry.points(spark, sf("sf0.01"))
      .select("lat", "lon").collect()
    var minMargin = Double.MaxValue
    for (r <- latLons) {
      val p = S2LatLng.fromDegrees(r.getDouble(0), r.getDouble(1)).toPoint
      for (n <- normals) {
        val m = math.abs(p.dot(n)) / n.norm
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min |p . n_hat| over ${latLons.length} points x 8 planes = $minMargin%.3e")
    assert(minMargin > 1e-9)
  }
}
