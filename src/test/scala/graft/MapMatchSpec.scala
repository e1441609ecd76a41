package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.MapMatch
import graft.s2.{S2EdgeUtil, S2LatLng, S2Point, S2Polyline}

/** Viterbi map matching: the sequence-coherence fixture (where greedy
  * snapping provably differs), brute-force path-enumeration equality on
  * the real candidate sets, and the radius/quantization margins that make
  * q_map_match's integer dynamic cross-engine exact. */
class MapMatchSpec extends SparkTestBase {

  private def lineOf(verts: Seq[(Double, Double)]): S2Polyline =
    new S2Polyline(verts.map { case (la, lo) =>
      S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  private def edgeMeters(p: S2Point, line: S2Polyline, i: Int): Double =
    S2EdgeUtil.getDistance(p, line.vertex(i), line.vertex(i + 1)) *
      S2LatLng.EarthRadiusMeters

  /** All quantized (line, edge, e) states for a point, mirroring the
    * operator's emission arithmetic. */
  private def states(p: S2Point, lines: Seq[(Long, S2Polyline)],
                     radiusM: Double): Seq[(Long, Int, Long)] =
    (for {
      (k, line) <- lines
      i <- 0 until line.numVertices - 1
      d = edgeMeters(p, line, i)
      if d <= radiusM
    } yield (k, i, math.round(d / 10.0))).sortBy(s => (s._1, s._2))

  private def linesDf(lines: Seq[(Long, Seq[(Double, Double)])]) = {
    import spark.implicits._
    lines.map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons")
  }

  private def run(pts: Seq[(Long, Long, Long, Double, Double)],
                  lines: Seq[(Long, Seq[(Double, Double)])],
                  radiusM: Double): Seq[(Long, Long, Long, Int, Long)] = {
    import spark.implicits._
    val df = pts.map { case (tr, us, tie, la, lo) =>
      (tr, new Timestamp(us / 1000), tie, la, lo) }
      .toDF("track", "ts", "ping_id", "lat", "lon")
    MapMatch.viterbi(df, "track", "ts", "ping_id", "lat", "lon",
        linesDf(lines), "line_id", "lats", "lons", radiusM)
      .as[(Long, Long, Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("coherence: Viterbi keeps the track on one line where greedy snap switches") {
    // two parallel meridian roads; the middle fix is slightly nearer road
    // 1, but two 20000-cost switches dwarf the ~44-unit emission gain
    val roads = Seq(
      0L -> Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)),
      1L -> Seq((0.0, 0.1), (1.0, 0.1), (2.0, 0.1)))
    val pts = Seq(
      (7L, 1000000L, 1L, 0.2, 0.02),
      (7L, 2000000L, 2L, 1.0, 0.052),
      (7L, 3000000L, 3L, 1.8, 0.02))
    val got = run(pts, roads, radiusM = 50000.0)
    assert(got.map(_._3) == Seq(0L, 0L, 0L), s"expected all on road 0: $got")
    // the middle fix IS greedily nearer road 1 — the test bites
    val p2 = S2LatLng.fromDegrees(1.0, 0.052).toPoint
    val lns = roads.map { case (k, vs) => k -> lineOf(vs) }
    val greedy = states(p2, lns, 50000.0).minBy(s => (s._3, s._1, s._2))
    assert(greedy._1 == 1L, s"fixture broken: greedy snap already picks road 0 ($greedy)")
    // and the matched edges advance along the road
    assert(got.map(_._4) == Seq(0, 0, 1), s"edge progression: $got")
  }

  test("total cost == brute-force minimum over ALL paths; emitted path achieves it") {
    val rnd = new scala.util.Random(23)
    val roads = (0L until 4L).map { k =>
      val lon = k * 0.3
      k -> Seq((0.0, lon), (1.0, lon + 0.05), (2.0, lon), (3.0, lon + 0.05))
    }
    val lns = roads.map { case (k, vs) => k -> lineOf(vs) }
    val radius = 120000.0
    for (track <- 1L to 4L) {
      val pts = (0 until 6).map { i =>
        (track, (i + 1) * 60000000L, i.toLong,
          rnd.nextDouble() * 3.0, rnd.nextDouble() * 1.0)
      }
      val got = run(pts, roads, radius)
      val stepStates = pts.sortBy(p => (p._2, p._3)).map { p =>
        (p._3, states(S2LatLng.fromDegrees(p._4, p._5).toPoint, lns, radius))
      }.filter(_._2.nonEmpty)
      assert(stepStates.forall(_._2.size >= 2), "fixture too sparse to branch")
      def trans(a: (Long, Int, Long), b: (Long, Int, Long)): Long =
        if (a._1 == b._1) math.abs(a._2 - b._2).toLong * 100L else 20000L
      // enumerate every full path
      def allCosts(i: Int, prev: (Long, Int, Long), acc: Long): Seq[Long] =
        if (i == stepStates.length) Seq(acc)
        else stepStates(i)._2.flatMap { s =>
          allCosts(i + 1, s, acc + trans(prev, s) + s._3) }
      val best = stepStates.head._2.flatMap { s =>
        allCosts(1, s, s._3) }.min
      assert(got.nonEmpty && got.forall(_._5 == best),
        s"track $track: engine total ${got.map(_._5).distinct} != brute $best")
      // the emitted path is valid and sums to the optimum
      val chosen = got.sortBy(_._2).map(r => (r._3, r._4))
      assert(chosen.length == stepStates.length)
      val pathCost = chosen.zip(stepStates).map { case ((l, e), (_, ss)) =>
        ss.find(s => s._1 == l && s._2 == e)
          .getOrElse(fail(s"emitted state ($l,$e) not a candidate")) }
        .sliding(2).map {
          case Seq(a, b) => trans(a, b)
          case _ => 0L
        }.sum + chosen.zip(stepStates).map { case ((l, e), (_, ss)) =>
          ss.find(s => s._1 == l && s._2 == e).get._3 }.sum
      assert(pathCost == best, s"track $track: emitted path costs $pathCost != $best")
    }
  }

  test("oracle margins (sf0.01): radius boundary and emission quantization") {
    val lns = SparkEntry.FixturePolylines.map { case (k, vs) => k -> lineOf(vs) }
    val r = SparkEntry.PolylineJoinRadiusM
    val pts = SparkEntry.mapMatchPoints(spark, sf("sf0.01"))
      .select("lat", "lon").collect()
    var minRadiusGap = Double.MaxValue
    var minQuantGap = Double.MaxValue
    var nCand = 0L
    pts.foreach { row =>
      val p = S2LatLng.fromDegrees(row.getDouble(0), row.getDouble(1)).toPoint
      lns.foreach { case (_, line) =>
        (0 until line.numVertices - 1).foreach { i =>
          val d = edgeMeters(p, line, i)
          minRadiusGap = math.min(minRadiusGap, math.abs(d - r))
          if (d <= r) {
            nCand += 1
            val frac = d / 10.0 - math.floor(d / 10.0)
            minQuantGap = math.min(minQuantGap, math.abs(frac - 0.5) * 10.0)
          }
        }
      }
    }
    assert(nCand > 10000, s"fixture degenerate: only $nCand candidates")
    assert(minRadiusGap > 1e-3, s"radius margin too thin: $minRadiusGap m")
    // engine (Java Math) and oracle (libm) evaluate the SAME formula; the
    // cross-engine delta is ulp-scale (~1e-10 m at 150 km), so 1e-6 m
    // of headroom on the 5 m rounding boundary is still ~10^4x slack
    // (the radius gate above keeps the roomier 1e-3 m bound)
    assert(minQuantGap > 1e-6, s"quantization margin too thin: $minQuantGap m")
  }
}
