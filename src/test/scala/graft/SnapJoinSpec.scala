package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2EdgeUtil, S2LatLng, S2Point, S2Polyline}

/** Map-matching snap vs driver-side brute force over the kernel, plus the
  * margin preconditions (winner gap, radius boundary) that make
  * q_snap_join's integer argmin contract exact across engines. */
class SnapJoinSpec extends SparkTestBase {

  private def lineOf(verts: Seq[(Double, Double)]): S2Polyline =
    new S2Polyline(verts.map { case (la, lo) =>
      S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  /** All (line_id, edge_idx, meters) candidates for a point. */
  private def cands(p: S2Point,
                    lines: Seq[(Long, S2Polyline)]): Seq[(Long, Int, Double)] =
    for {
      (k, line) <- lines
      i <- 0 until line.numVertices - 1
    } yield (k, i,
      S2EdgeUtil.getDistance(p, line.vertex(i), line.vertex(i + 1)) *
        S2LatLng.EarthRadiusMeters)

  test("snapToPolylines equals brute-force argmin with edge refinement (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = SparkEntry.PolylineJoinRadiusM
    val got = SpatialJoin.snapToPolylines(SparkEntry.points(spark, dir), "o_orderkey",
        "lat", "lon", SparkEntry.polylineTable(spark, dir), "line_id", "lats", "lons", r)
      .select("o_orderkey", "line_id", "edge_idx")
      .as[(Long, Long, Int)].collect().toSet
    val lines = SparkEntry.FixturePolylines.map { case (k, vs) => k -> lineOf(vs) }
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (id, la, lo) <- pts.iterator
      p = S2LatLng.fromDegrees(la, lo).toPoint
      inRange = cands(p, lines).filter(_._3 <= r)
      if inRange.nonEmpty
    } yield {
      val (bk, bi, _) = inRange.minBy { case (k, i, d) => (d, k, i) }
      (id, bk, bi)
    }).toSet
    assert(want.nonEmpty, "fixture produced an empty snap")
    assert(got === want,
      s"snap diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle margins over the sf0.01 gate population: winner gaps and boundary") {
    val lines = SparkEntry.FixturePolylines.map { case (k, vs) => k -> lineOf(vs) }
    val r = SparkEntry.PolylineJoinRadiusM
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minLineGap = Double.MaxValue
    var minEdgeGap = Double.MaxValue
    var minBoundaryGap = Double.MaxValue
    var vertexTies = 0
    for (row <- latLons) {
      val p = S2LatLng.fromDegrees(row.getDouble(0), row.getDouble(1)).toPoint
      val all = cands(p, lines)
      // cross-LINE argmin: the two nearest lines must differ by far more
      // than ulp noise (an exact cross-line tie could resolve differently
      // under the oracle's distinct SQL arithmetic)
      val byLine = all.groupBy(_._1).values.map(_.map(_._3).min).toSeq.sorted
      val lineGap = byLine(1) - byLine(0)
      if (lineGap < minLineGap) minLineGap = lineGap
      // within the winning line, the edge argmin must have a wide gap OR
      // tie EXACTLY between adjacent edges: there the nearest point is the
      // shared vertex and both engines evaluate the syntactically same
      // endpoint formula (bit-equal within each), so both pick the lower
      // index deterministically
      val winner = all.groupBy(_._1).minBy { case (k, cs) => (cs.map(_._3).min, k) }
      val edges = winner._2.sortBy(_._2).map(_._3)
      val sortedIdx = edges.indices.sortBy(edges)
      val (e0, e1) = (sortedIdx(0), sortedIdx(1))
      val eGap = edges(e1) - edges(e0)
      if (eGap == 0.0) {
        assert(math.abs(e0 - e1) == 1,
          s"exact edge tie between NON-adjacent edges $e0/$e1 — not engine-resolvable")
        // the tie resolves identically in both engines only if BOTH tied
        // edges take the endpoint branch decisively (a near-zero interior
        // wedge guard could flip the CASE branch under the oracle's
        // arithmetic and break the exact tie by an ulp)
        val line = lines.find(_._1 == winner._1).get._2
        for (i <- Seq(e0, e1)) {
          val (a, b) = (line.vertex(i), line.vertex(i + 1))
          val n = graft.s2.S2Predicates.robustCrossProd(a, b)
          val s1 = n.cross(a).dot(p)
          val s2 = b.cross(n).dot(p)
          assert(s1 < -1e-12 || s2 < -1e-12,
            s"tied edge $i of line ${winner._1} is not decisively endpoint-branch ($s1, $s2)")
        }
        vertexTies += 1
      } else if (eGap < minEdgeGap) minEdgeGap = eGap
      // the winner must not straddle the radius boundary
      val bg = math.abs(byLine(0) - r)
      if (bg < minBoundaryGap) minBoundaryGap = bg
    }
    info(f"min cross-line gap $minLineGap%.3e m, min non-tie edge gap $minEdgeGap%.3e m, " +
      f"$vertexTies shared-vertex exact ties, min |winner - radius| $minBoundaryGap%.3e m")
    assert(minLineGap > 1e-6)
    assert(minEdgeGap > 1e-6)
    assert(minBoundaryGap > 1e-3)
  }
}
