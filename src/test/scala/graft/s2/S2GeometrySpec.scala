package graft.s2

import org.scalatest.funsuite.AnyFunSuite
import TestFixtures._

/** Loop/polygon/cap/rect/coverer conformance vs the reference suite
  * (`S2LoopTest.cs`, `S2PolygonTest.cs`, `S2RegionCovererTest.cs`,
  * `S2CellUnionTest.cs`, `OpenSkyS2Tests.cs`). */
class S2GeometrySpec extends AnyFunSuite {

  private def randomCellId(rnd: scala.util.Random, level: Int): Long = {
    val face = rnd.nextInt(6)
    val pos = rnd.nextLong() & (-1L >>> S2CellId.FaceBits)
    S2CellId.fromFacePosLevel(face, pos, level)
  }

  test("loop contains: candyCane(5,71)=true, hemispheres (S2LoopTest.cs:405-415)") {
    assert(candyCane.contains(S2LatLng.fromDegrees(5, 71).toPoint))
    assert(candyCane.rectBound.lng.isFull)
    val nh = northHemi
    val sh = southHemi
    assert(nh.contains(S2Point(0, 0, 1)))
    assert(!nh.contains(S2Point(0, 0, -1)))
    assert(!sh.contains(S2Point(0, 0, 1)))
    assert(sh.contains(S2Point(0, 0, -1)))
    assert(arctic80.contains(S2Point(0, 0, 1)))
    assert(!antarctic80.contains(S2Point(0, 0, 1)))
  }

  test("loop area: northHemi ~ 2*Pi (S2LoopTest.cs:292-294)") {
    assert(math.abs(northHemi.area - 2 * math.Pi) < 1e-9)
    assert(math.abs(makeLoop(NearHemi).area - 2 * math.Pi) < 1e-9)
  }

  test("polygon nesting chain NEAR0 c NEAR1 c NEAR2 c NEAR3 (S2PolygonTest.cs:70-89)") {
    val near0 = makePolygon(Near0)
    val near1 = makePolygon(Near1)
    val near2 = makePolygon(Near2)
    val near3 = makePolygon(Near3)
    assert(near1.contains(near0))
    assert(near2.contains(near1))
    assert(near3.contains(near2))
    assert(!near0.contains(near1))
    assert(near1.intersects(near0))
    assert(near2.intersects(near3))
  }

  test("shell+hole polygon: NEAR0 hole in NEAR1") {
    val poly = makePolygon(s"$Near1;$Near0")
    assert(poly.numLoops == 2)
    // center (0,0) is inside the hole -> outside the polygon
    assert(!poly.contains(S2LatLng.fromDegrees(0, 0).toPoint))
    // (0.9, 0.9) is outside the diamond hole but inside the octagon shell
    assert(poly.contains(S2LatLng.fromDegrees(0.9, 0.9).toPoint))
    // (0, 5) is outside the shell
    assert(!poly.contains(S2LatLng.fromDegrees(0, 5).toPoint))
  }

  test("antimeridian polygon FAR0 contains points near 180") {
    val far0 = makePolygon(Far0)
    assert(far0.contains(S2LatLng.fromDegrees(1, 180).toPoint))
    assert(!far0.contains(S2LatLng.fromDegrees(0, 90).toPoint))
  }

  test("polygon vs brute-force loop parity on grid points") {
    val poly = makePolygon(s"$Near1;$Near0")
    for (latI <- -20 to 20; lonI <- -20 to 20) {
      val lat = latI / 10.0
      val lon = lonI / 10.0
      val p = S2LatLng.fromDegrees(lat, lon).toPoint
      var expected = false
      for (i <- 0 until poly.numLoops) expected ^= poly.loop(i).contains(p)
      assert(poly.contains(p) == expected)
    }
  }

  test("coverer: 1-cell covering of a cell is that cell, full reference count (S2RegionCovererTest.cs:107-123)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 10000) {
      val level = rnd.nextInt(S2CellId.MaxLevel + 1)
      val id = randomCellId(rnd, level)
      val coverer = new S2RegionCoverer().setMaxCells(1)
      val covering = coverer.getCovering(S2Cell(id))
      assert(covering.length == 1, s"covering of ${S2CellId.toToken(id)} had ${covering.length} cells")
      assert(covering.head == id)
    }
  }

  test("coverer: covering covers and respects level bounds (S2RegionCovererTest.cs:14-104)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 200) {
      val coverer = new S2RegionCoverer()
        .setMinLevel(rnd.nextInt(10))
        .setMaxCells(1 + rnd.nextInt(10))
      coverer.setMaxLevel(coverer.minLevel + rnd.nextInt(10))
      // random cap with log-uniform area
      val axis = S2Point.normalize(S2Point(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1))
      val capArea = 4 * math.Pi * math.pow(2, -30 * rnd.nextDouble())
      val cap = S2Cap.fromAxisArea(axis, capArea)
      val covering = coverer.getCovering(cap)
      // level bounds
      for (id <- covering) {
        assert(S2CellId.level(id) >= coverer.minLevel)
        assert(S2CellId.level(id) <= coverer.maxLevel)
      }
      // the cap axis must be covered
      val axisLeaf = S2CellId.fromPoint(cap.axis)
      assert(covering.exists(c => S2CellId.contains(c, axisLeaf)))
      // sampled points in the cap must be covered
      val union = S2CellUnion.normalized(covering)
      for (_ <- 0 until 20) {
        // sample a point in the cap (crude rejection-free sampling near axis)
        val h = cap.height * rnd.nextDouble()
        val theta = 2 * math.Pi * rnd.nextDouble()
        val r = math.sqrt(h * (2 - h))
        val z = S2Point.normalize(cap.axis)
        val x = z.ortho
        val y = z.cross(x)
        val p = S2Point.normalize(
          (x * (math.cos(theta) * r)) + (y * (math.sin(theta) * r)) + (z * (1 - h)))
        assert(cap.contains(p))
        assert(union.contains(S2CellId.fromPoint(p)), s"point not covered")
      }
    }
  }

  test("interior covering cells are contained by the region") {
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(48.1, 16.5).toPoint, 0.05)
    val coverer = new S2RegionCoverer().setMaxCells(20)
    val interior = coverer.getInteriorCovering(cap)
    for (id <- interior) {
      assert(cap.containsCell(S2Cell(id)), s"interior cell ${S2CellId.toToken(id)} not contained")
    }
  }

  test("cell union normalize: 4 siblings merge to parent, idempotent (S2CellUnionTest.cs)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 200) {
      val parent = randomCellId(rnd, 1 + rnd.nextInt(S2CellId.MaxLevel - 1))
      val children = (0 until 4).map(S2CellId.child(parent, _))
      val u = S2CellUnion.normalized(children)
      assert(u.size == 1 && u.cellId(0) == parent)
      // contained cells dropped
      val u2 = S2CellUnion.normalized(Seq(parent, children.head))
      assert(u2.size == 1 && u2.cellId(0) == parent)
    }
  }

  test("cell union contains/intersects by Hilbert range") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 500) {
      val id = randomCellId(rnd, 5 + rnd.nextInt(10))
      val u = S2CellUnion.normalized(Seq(id))
      assert(u.contains(S2CellId.childBeginForLevel(id, S2CellId.MaxLevel)))
      assert(u.contains(id))
      assert(!u.contains(S2CellId.next(id)))
      assert(u.intersects(S2CellId.parent(id)))
    }
  }

  test("LOWW circular coverage matches reference shape (OpenSkyS2Tests.cs:64-91)") {
    val cov = OpenSkyCoverage.circularCoverage(48.11027908325195, 16.569721221923828, 150)
    assert(cov.level >= 3 && cov.level <= 9)
    assert(cov.cells.nonEmpty && cov.cells.length < 500)
    // covering must contain the center tile
    val centerTile = OpenSkyCoverage.cellIdForCoordinates(48.11027908325195, 16.569721221923828, cov.level)
    assert(cov.cells.contains(centerTile))
    // all cells at the selected level
    assert(cov.cells.forall(S2CellId.level(_) == cov.level))
  }

  test("doughnut coverage: include minus exclude leaves a ring") {
    val d = OpenSkyCoverage.doughnutCoverage(48.1, 16.5, 300, 60)
    assert(d.includeCells.nonEmpty && d.excludeCells.nonEmpty)
    val excludeSet = d.excludeCells.toSet
    val ring = d.includeCells.filterNot(excludeSet.contains)
    assert(ring.nonEmpty)
  }

  test("rectangle coverage covers both corners (OpenSkyS2Tests.cs:238-271)") {
    val r = OpenSkyCoverage.rectangleCoverage(48.11, 16.57, 47.26, 11.34)
    assert(r.cells.nonEmpty && r.cells.length < 300)
    val u = S2CellUnion.normalized(r.cells)
    assert(u.contains(S2LatLng.fromDegrees(48.11, 16.57).toPoint))
    assert(u.contains(S2LatLng.fromDegrees(47.26, 11.34).toPoint))
  }

  test("cap contains cell vs vertices sampling") {
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(10, 20).toPoint, 0.1)
    val cell = S2Cell(OpenSkyCoverage.cellIdForCoordinates(10, 20, 8))
    assert(cap.mayIntersectCell(cell))
    val farCell = S2Cell(OpenSkyCoverage.cellIdForCoordinates(-40, -120, 8))
    assert(!cap.mayIntersectCell(farCell))
  }

  test("latlng rect: wrap-aware containment") {
    val rect = S2LatLngRect.fromPointPair(
      S2LatLng.fromDegrees(-10, 170), S2LatLng.fromDegrees(10, -170))
    assert(rect.lng.isInverted)
    assert(rect.contains(S2LatLng.fromDegrees(0, 180)))
    assert(rect.contains(S2LatLng.fromDegrees(0, 175)))
    assert(rect.contains(S2LatLng.fromDegrees(0, -175)))
    assert(!rect.contains(S2LatLng.fromDegrees(0, 0)))
  }

  test("haversine distance uses 6367000m earth radius (S2LatLng.cs:16)") {
    val a = S2LatLng.fromDegrees(0, 0)
    val b = S2LatLng.fromDegrees(0, 1)
    val d = a.getEarthDistance(b)
    assert(math.abs(d - 6367000.0 * (math.Pi / 180)) < 1e-6)
  }

  test("metric level solvers: getValue/getMinLevel/getMaxLevel inverses (S2Test.cs:190-272)") {
    val m = S2Projections.MinWidth
    for (level <- 0 to S2CellId.MaxLevel) {
      val v = m.getValue(level)
      assert(m.getMaxLevel(v) == level)
      if (level > 0) assert(m.getMinLevel(v) <= level)
    }
  }

  test("polyline: interpolate + nearest edge") {
    val line = new S2Polyline(parseVertices("0:0, 0:10, 10:10"))
    assert(line.numVertices == 3)
    val mid = line.interpolate(0.5)
    assert(S2Predicates.isUnitLength(mid))
    assert(line.getNearestEdgeIndex(S2LatLng.fromDegrees(0, 5).toPoint) == 0)
    assert(line.getNearestEdgeIndex(S2LatLng.fromDegrees(8, 10.2).toPoint) == 1)
  }
}
