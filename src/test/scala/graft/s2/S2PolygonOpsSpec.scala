package graft.s2

import org.scalatest.funsuite.AnyFunSuite
import TestFixtures._

/** Boolean-op conformance (`S2PolygonTest.cs` union/intersection tests). */
class S2PolygonOpsSpec extends AnyFunSuite {

  private def pt(lat: Double, lng: Double) = S2LatLng.fromDegrees(lat, lng).toPoint

  test("intersection of overlapping squares covers exactly the overlap") {
    val a = makePolygon("0:0, 0:2, 2:2, 2:0")
    val b = makePolygon("1:1, 1:3, 3:3, 3:1")
    val inter = S2PolygonOps.intersection(a, b)
    assert(inter.numLoops == 1)
    assert(inter.contains(pt(1.5, 1.5)))
    assert(!inter.contains(pt(0.5, 0.5)))
    assert(!inter.contains(pt(2.5, 2.5)))
    // overlap ~ 1x1 degree square
    val unit = makePolygon("0:0, 0:1, 1:1, 1:0").area
    assert(math.abs(inter.area - unit) / unit < 0.01)
  }

  test("union of overlapping squares covers both and adds up") {
    val a = makePolygon("0:0, 0:2, 2:2, 2:0")
    val b = makePolygon("1:1, 1:3, 3:3, 3:1")
    val u = S2PolygonOps.union(a, b)
    assert(u.contains(pt(0.5, 0.5)))
    assert(u.contains(pt(2.5, 2.5)))
    assert(u.contains(pt(1.5, 1.5)))
    assert(!u.contains(pt(0.5, 2.5)))
    val expected = a.area + b.area - S2PolygonOps.intersection(a, b).area
    assert(math.abs(u.area - expected) / expected < 0.01)
  }

  test("intersection of disjoint polygons is empty; union keeps both shells") {
    val a = makePolygon(Near0)
    val b = makePolygon("20:20, 20:21, 21:21, 21:20")
    assert(S2PolygonOps.intersection(a, b).numLoops == 0)
    val u = S2PolygonOps.union(a, b)
    assert(u.numLoops == 2)
    assert(u.contains(pt(0, 0)))
    assert(u.contains(pt(20.5, 20.5)))
  }

  test("nested polygons: intersection is inner, union is outer (S2PolygonTest nesting)") {
    val inner = makePolygon(Near0)
    val outer = makePolygon(Near1)
    val inter = S2PolygonOps.intersection(inner, outer)
    assert(inter.boundaryApproxEquals(inner, 1e-6) ||
      math.abs(inter.area - inner.area) / inner.area < 0.01)
    val u = S2PolygonOps.union(inner, outer)
    assert(math.abs(u.area - outer.area) / outer.area < 0.01)
  }

  test("destructive union of a grid of touching squares (testUnionSloppy analogue)") {
    val squares = for (i <- 0 until 3; j <- 0 until 3) yield
      makePolygon(s"$i:$j, $i:${j + 1}, ${i + 1}:${j + 1}, ${i + 1}:$j")
    val u = S2PolygonOps.destructiveUnion(squares)
    assert(u.contains(pt(1.5, 1.5)))
    assert(u.contains(pt(0.5, 2.5)))
    assert(!u.contains(pt(3.5, 3.5)))
    val expected = squares.map(_.area).sum
    assert(math.abs(u.area - expected) / expected < 0.01)
  }
}
