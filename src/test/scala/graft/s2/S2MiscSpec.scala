package graft.s2

import org.scalatest.funsuite.AnyFunSuite
import TestFixtures._

/** Remaining reference-surface conformance: polyline ops, wedge relations,
  * coverer determinism, token error handling, E5/E6/E7 codecs. */
class S2MiscSpec extends AnyFunSuite {

  test("polyline: arc length, mayIntersect, project (S2PolylineTest.cs)") {
    val line = new S2Polyline(parseVertices("0:0, 0:90, 0:180"))
    assert(math.abs(line.arcLengthAngle - math.Pi) < 1e-12)
    assert(line.isValid)
    // cell on the path intersects; off-path does not
    assert(line.mayIntersectCell(S2Cell(OpenSkyCoverage.cellIdForCoordinates(0, 45, 6))))
    assert(!line.mayIntersectCell(S2Cell(OpenSkyCoverage.cellIdForCoordinates(60, 45, 6))))
    // interpolate endpoints and midpoint
    assert(S2Predicates.approxEquals(line.interpolate(0), makePoint("0:0"), 1e-12))
    assert(S2Predicates.approxEquals(line.interpolate(1), makePoint("0:180"), 1e-9))
    assert(S2Predicates.approxEquals(line.interpolate(0.5), makePoint("0:90"), 1e-9))
    // projection
    val idx = line.getNearestEdgeIndex(makePoint("1:30"))
    assert(idx == 0)
    val proj = line.projectToEdge(makePoint("1:30"), idx)
    assert(S2Predicates.approxEquals(proj, makePoint("0:30"), 1e-6))
    // invalid: duplicate adjacent vertices
    assert(!new S2Polyline(IndexedSeq(makePoint("0:0"), makePoint("0:0"))).isValid)
  }

  test("wedge relations — reference vectors (S2EdgeUtilTest.cs:383-470)") {
    def n(x: Double, y: Double, z: Double) = S2Point.normalize(S2Point(x, y, z))
    def assertWedge(a0: S2Point, ab1: S2Point, a2: S2Point, b0: S2Point, b2: S2Point,
                    contains: Boolean, intersects: Boolean, crosses: Boolean): Unit = {
      assert(S2EdgeUtil.wedgeContains(a0, ab1, a2, b0, b2) == (if (contains) 1 else 0))
      assert(S2EdgeUtil.wedgeIntersects(a0, ab1, a2, b0, b2) == (if (intersects) -1 else 0))
      assert(S2EdgeUtil.wedgeContainsOrIntersects(a0, ab1, a2, b0, b2) ==
        (if (contains) 1 else if (intersects) -1 else 0))
      assert(S2EdgeUtil.wedgeContainsOrCrosses(a0, ab1, a2, b0, b2) ==
        (if (contains) 1 else if (crosses) -1 else 0))
    }
    val o = S2Point(0, 0, 1)
    // Intersection in one wedge.
    assertWedge(n(-1, 0, 10), o, n(1, 2, 10), n(0, 1, 10), n(1, -2, 10), false, true, true)
    // Intersection in two wedges.
    assertWedge(n(-1, -1, 10), o, n(1, -1, 10), n(1, 0, 10), n(-1, 1, 10), false, true, true)
    // Normal containment.
    assertWedge(n(-1, -1, 10), o, n(1, -1, 10), n(-1, 0, 10), n(1, 0, 10), true, true, false)
    // Containment with equality on one side / other side / both sides.
    assertWedge(n(2, 1, 10), o, n(-1, -1, 10), n(2, 1, 10), n(1, -5, 10), true, true, false)
    assertWedge(n(2, 1, 10), o, n(-1, -1, 10), n(1, -2, 10), n(-1, -1, 10), true, true, false)
    assertWedge(n(-2, 3, 10), o, n(4, -5, 10), n(-2, 3, 10), n(4, -5, 10), true, true, false)
    // Disjoint with equality on one side / other side / both sides.
    assertWedge(n(-2, 3, 10), o, n(4, -5, 10), n(4, -5, 10), n(-2, -3, 10), false, false, false)
    assertWedge(n(-2, 3, 10), o, n(0, 5, 10), n(4, -5, 10), n(-2, 3, 10), false, false, false)
    assertWedge(n(-2, 3, 10), o, n(4, -5, 10), n(4, -5, 10), n(-2, 3, 10), false, false, false)
  }

  test("coverer determinism: identical input produces identical coverings (S2RegionCovererTest.cs)") {
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(33.3, -44.4).toPoint, 0.07)
    val c1 = new S2RegionCoverer().setMaxCells(17).getCovering(cap)
    val c2 = new S2RegionCoverer().setMaxCells(17).getCovering(cap)
    assert(c1 == c2)
    assert(c1.length <= 17 || c1.exists(S2CellId.level(_) == 0))
  }

  test("coverer levelMod constraint (S2RegionCovererTest.cs)") {
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(10, 10).toPoint, 0.03)
    for (mod <- 2 to 3) {
      val coverer = new S2RegionCoverer().setMaxCells(20).setMinLevel(2).setLevelMod(mod)
      val covering = coverer.getCovering(cap)
      for (id <- covering) {
        assert((S2CellId.level(id) - 2) % mod == 0,
          s"level ${S2CellId.level(id)} violates levelMod $mod")
      }
    }
  }

  test("token edge cases (S2CellIdTest.cs tokens)") {
    assert(S2CellId.fromToken("X") == 0L)
    assert(S2CellId.fromToken("3") == 0x3000000000000000L)
    intercept[IllegalArgumentException] { S2CellId.fromToken("zz") }
    intercept[IllegalArgumentException] { S2CellId.fromToken("") }
    // 17+ chars -> invalid id 0
    assert(S2CellId.fromToken("00000000000000001") == 0L)
    // uppercase hex accepted
    assert(S2CellId.fromToken("80855C") == S2CellId.fromToken("80855c"))
  }

  test("E5/E6/E7 fixed-point codecs (S1Angle.cs:69-143)") {
    val ll = S2LatLng.fromE7(481102790L, 165697212L)
    assert(math.abs(ll.latDegrees - 48.1102790) < 1e-9)
    assert(math.abs(ll.lngDegrees - 16.5697212) < 1e-9)
    val ll5 = S2LatLng.fromE5(4811028L, 1656972L)
    assert(math.abs(ll5.latDegrees - 48.11028) < 1e-9)
    val ll6 = S2LatLng.fromE6(48110279L, 16569721L)
    assert(math.abs(ll6.latDegrees - 48.110279) < 1e-9)
  }

  test("normalized lat/lng clamps and wraps (S2LatLng.cs:117-126)") {
    val n = S2LatLng.fromDegrees(95, 370).normalized
    assert(math.abs(n.latDegrees - 90) < 1e-12)
    assert(math.abs(n.lngDegrees - 10) < 1e-9)
    val s = S2LatLng.fromDegrees(-100, -190).normalized
    assert(math.abs(s.latDegrees + 90) < 1e-12)
    assert(math.abs(s.lngDegrees - 170) < 1e-9)
  }
}
