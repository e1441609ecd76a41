package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Interval / cap / rect / cell conformance mirroring the reference's unit
  * suites (`R1IntervalTest.cs`, `S1IntervalTest` semantics embedded in
  * `S2LatLngRectTest.cs`, `S2CapTest.cs`, `S2CellTest.cs`,
  * `S2EdgeUtilTest.cs`). */
class S2RegionsSpec extends AnyFunSuite {
  private val Pi = math.Pi

  private def ll(lat: Double, lng: Double) = S2LatLng.fromDegrees(lat, lng)

  test("R1Interval ops (R1IntervalTest.cs)") {
    val unit = R1Interval(0, 1)
    val negunit = R1Interval(-1, 0)
    val empty = R1Interval.Empty
    assert(empty.isEmpty && !unit.isEmpty)
    assert(unit.contains(0.5) && unit.interiorContains(0.5))
    assert(unit.contains(0) && !unit.interiorContains(0))
    assert(unit.contains(1) && !unit.interiorContains(1))
    assert(!unit.intersects(R1Interval(2, 3)))
    assert(unit.intersects(negunit) && !unit.interiorIntersects(negunit))
    assert(unit.union(negunit) == R1Interval(-1, 1))
    assert(unit.intersection(negunit) == R1Interval(0, 0))
    assert(empty.union(unit) == unit)
    assert(unit.addPoint(5) == R1Interval(0, 5))
    assert(unit.expanded(0.5) == R1Interval(-0.5, 1.5))
    assert(empty.expanded(1).isEmpty)
  }

  test("S1Interval wrap-aware ops (S1Interval semantics, S1Interval.cs)") {
    val quad1 = S1Interval(0, Pi / 2)
    val quad23 = S1Interval(Pi / 2, -Pi / 2) // inverted: wraps through Pi
    assert(quad23.isInverted)
    assert(quad23.contains(Pi) && quad23.contains(-Pi))
    assert(!quad23.contains(0))
    assert(quad23.contains(3 * Pi / 4) && quad23.contains(-3 * Pi / 4))
    assert(S1Interval.Full.contains(1.234) && !S1Interval.Empty.contains(1.234))
    // -Pi canonicalization
    assert(S1Interval(-Pi, Pi / 2).lo == Pi)
    assert(S1Interval.fromPoint(-Pi).lo == Pi)
    // union across the antimeridian
    val a = S1Interval(3, Pi)
    val b = S1Interval(-Pi, -3)
    assert(a.union(b).contains(Pi) && a.union(b).contains(-3.05) && !a.union(b).contains(0))
    // intersection
    assert(quad1.intersection(quad23).approxEquals(S1Interval.fromPoint(Pi / 2), 1e-15))
    // complement
    assert(quad1.complement.contains(Pi) && !quad1.complement.interiorContains(0.1))
    // expansion wraps
    val nearPi = S1Interval(Pi - 0.1, Pi)
    assert(nearPi.expanded(0.2).contains(-Pi + 0.05))
  }

  test("S2Cap basics + containment (S2CapTest.cs)") {
    val full = S2Cap.Full
    val empty = S2Cap.Empty
    assert(full.isFull && empty.isEmpty)
    assert(full.contains(S2Point(0, 0, 1)) && !empty.contains(S2Point(0, 0, 1)))
    assert(empty.complement.isFull && full.complement.isEmpty)

    val hemi = S2Cap.fromAxisHeight(S2Point.normalize(S2Point(1, 0, 1)), 1)
    assert(math.abs(hemi.angle - Pi / 2) < 1e-14)
    assert(hemi.complement.contains(-S2Point.normalize(S2Point(1, 0, 1))))

    // tiny cap contains its axis and addPoint guarantees containment
    val axis = ll(10, 20).toPoint
    var cap = S2Cap.fromAxisAngle(axis, 1e-8)
    assert(cap.contains(axis))
    val other = ll(10.1, 20.1).toPoint
    cap = cap.addPoint(other)
    assert(cap.contains(other), "addPoint must guarantee contains (RoundUp)")

    // cap x cap algebra
    val a = S2Cap.fromAxisAngle(ll(0, 0).toPoint, 0.2)
    val b = S2Cap.fromAxisAngle(ll(0, 5).toPoint, 0.05)
    assert(a.contains(b))
    assert(!b.contains(a))
    assert(a.interiorIntersects(b))
  }

  test("S2Cap rect bound wraps poles and longitudes correctly (S2CapTest.cs getRectBound)") {
    // cap covering the north pole: full longitude range
    val polar = S2Cap.fromAxisAngle(S2Point(0, 0, 1), math.toRadians(10))
    assert(polar.rectBound.lng.isFull)
    assert(math.abs(polar.rectBound.lat.hi - Pi / 2) < 1e-14)
    // mid-latitude cap: bounded lngs
    val mid = S2Cap.fromAxisAngle(ll(40, 100).toPoint, math.toRadians(5))
    val rb = mid.rectBound
    assert(!rb.lng.isFull)
    assert(rb.contains(ll(40, 100)))
    assert(rb.contains(ll(44.9, 100)))
    assert(!rb.contains(ll(48, 100)))
  }

  test("S2LatLngRect: vertices, area, distance, convolve (S2LatLngRectTest.cs)") {
    val r = S2LatLngRect.fromCorners(ll(0, 0), ll(30, 60))
    assert(r.getVertex(0).latDegrees == 0 && math.abs(r.getVertex(2).latDegrees - 30) < 1e-12)
    assert(r.area > 0)
    assert(S2LatLngRect.Empty.area == 0)
    // distance to a contained point is 0
    assert(r.contains(ll(15, 30)))
    // expanded contains strictly more
    val grown = r.convolveWithCap(math.toRadians(5))
    assert(grown.contains(ll(-3, 30)) && grown.contains(ll(33, 30)))
    // fromEdge captures interior latitude extrema
    val e = S2LatLngRect.fromEdge(ll(45, -90).toPoint, ll(45, 90).toPoint)
    assert(e.lat.hi > math.toRadians(89.9), "edge through the pole region must widen the lat bound")
  }

  test("S2LatLngRect.intersectsCell exact test with curved lat edges (S2LatLngRectTest.cs)") {
    val rect = S2LatLngRect.fromCorners(ll(10, 10), ll(20, 20))
    val inCell = S2Cell(OpenSkyCoverage.cellIdForCoordinates(15, 15, 8))
    val outCell = S2Cell(OpenSkyCoverage.cellIdForCoordinates(-40, -40, 8))
    assert(rect.intersectsCell(inCell))
    assert(!rect.intersectsCell(outCell))
    // cell straddling the rect edge
    val edgeCell = S2Cell(OpenSkyCoverage.cellIdForCoordinates(10, 15, 8))
    assert(rect.intersectsCell(edgeCell))
  }

  test("S2Cell subdivision: child areas sum to parent, ids partition (S2CellTest.cs testSubdivide)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 50) {
      val face = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> S2CellId.FaceBits)
      val level = rnd.nextInt(20)
      val cell = S2Cell(S2CellId.fromFacePosLevel(face, pos, level))
      val children = cell.subdivide()
      assert(children.length == 4)
      val childAreaSum = children.map(_.exactArea).sum
      assert(math.abs(childAreaSum - cell.exactArea) / cell.exactArea < 1e-6)
      // children partition the parent's Hilbert span
      assert(children.map(_.id).sorted(Ordering.fromLessThan(S2CellId.unsignedLess)).head ==
        S2CellId.child(cell.id, 0).min(children.map(_.id).max)
        || children.forall(c => S2CellId.contains(cell.id, c.id)))
      // metric bounds hold
      val lvl = level + 1
      for (c <- children) {
        assert(c.exactArea <= S2Projections.MaxArea.getValue(lvl) * 1.0001)
        assert(c.exactArea >= S2Projections.MinArea.getValue(lvl) * 0.9999)
      }
      // each child's center maps back to the child
      for (c <- children) {
        assert(S2CellId.contains(c.id, S2CellId.fromPoint(c.center)))
      }
    }
  }

  test("edge distance + closest point (S2EdgeUtilTest.cs getDistance)") {
    val a = ll(0, 0).toPoint
    val b = ll(0, 10).toPoint
    // point on the edge: zero-ish distance
    assert(S2EdgeUtil.getDistance(ll(0, 5).toPoint, a, b) < 1e-12)
    // perpendicular point: distance equals its latitude
    val d = S2EdgeUtil.getDistance(ll(5, 5).toPoint, a, b)
    assert(math.abs(d - math.toRadians(5)) < 1e-9)
    // beyond the endpoints: distance to the endpoint
    val d2 = S2EdgeUtil.getDistance(ll(0, 15).toPoint, a, b)
    assert(math.abs(d2 - math.toRadians(5)) < 1e-9)
    val cp = S2EdgeUtil.getClosestPoint(ll(5, 5).toPoint, a, b)
    assert(S2Predicates.approxEquals(cp, ll(0, 5).toPoint, 1e-9))
  }

  test("robust crossings trichotomy (S2EdgeUtilTest.cs crossings)") {
    val a = ll(1, 0).toPoint
    val b = ll(-1, 0).toPoint
    val c = ll(0, -1).toPoint
    val d = ll(0, 1).toPoint
    assert(S2EdgeUtil.robustCrossing(a, b, c, d) > 0)
    assert(S2EdgeUtil.simpleCrossing(a, b, c, d))
    // shared vertex: 0
    assert(S2EdgeUtil.robustCrossing(a, b, b, d) == 0)
    // disjoint: -1
    assert(S2EdgeUtil.robustCrossing(a, b, ll(5, 5).toPoint, ll(5, 6).toPoint) < 0)
    // vertex crossing rule properties
    assert(S2EdgeUtil.vertexCrossing(a, b, b, a))
    assert(!S2EdgeUtil.vertexCrossing(a, a, c, d))
    // intersection point of a proper crossing lies on both edges
    val x = S2EdgeUtil.getIntersection(a, b, c, d)
    assert(S2EdgeUtil.getDistance(x, a, b) < 1e-12)
    assert(S2EdgeUtil.getDistance(x, c, d) < 1e-12)
  }

  test("interval/metric solver consistency for coverer level choice (S2.cs metrics)") {
    for (radius <- Seq(1e-6, 1e-4, 0.01, 0.1, 0.5)) {
      val level = S2Projections.MinWidth.getMaxLevel(2 * radius)
      // reference invariants (`S2.cs:879-881`): level==0 or value(level)>=v;
      // level==MaxLevel or value(level+1)<v
      assert(level == 0 || S2Projections.MinWidth.getValue(level) >= 2 * radius)
      assert(level == S2CellId.MaxLevel || S2Projections.MinWidth.getValue(level + 1) < 2 * radius)
    }
  }
}
