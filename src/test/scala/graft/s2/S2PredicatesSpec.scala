package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Robust-predicate properties and area identities
  * (`S2Test.cs:59-134`, the RobustCcw contract in `S2.cs:454-480`). */
class S2PredicatesSpec extends AnyFunSuite {
  import S2Predicates._

  private def randomPoint(rnd: scala.util.Random): S2Point =
    S2Point.normalize(S2Point(
      2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1))

  test("robustCcw contract: rotation invariance, antisymmetry, zero iff equal points") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 2000) {
      val a = randomPoint(rnd)
      val b = randomPoint(rnd)
      val c = randomPoint(rnd)
      val ccw = robustCcw(a, b, c)
      assert(robustCcw(b, c, a) == ccw, "rotation invariance")
      assert(robustCcw(c, a, b) == ccw, "rotation invariance")
      assert(robustCcw(c, b, a) == -ccw, "antisymmetry")
      assert(ccw != 0, "distinct random points must not be 'equal'")
      assert(robustCcw(a, a, c) == 0 && robustCcw(a, b, b) == 0 && robustCcw(a, b, a) == 0)
    }
  }

  test("robustCcw on nearly colinear points stays consistent (ExpensiveCcw path)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val a = randomPoint(rnd)
      val b = randomPoint(rnd)
      // c very close to the great circle through a and b
      val t = rnd.nextDouble()
      val mid = S2Point.normalize(a * t + b * (1 - t))
      val nudge = S2Predicates.robustCrossProd(a, b)
      val c = S2Point.normalize(mid + S2Point.normalize(nudge) * (1e-16 * (rnd.nextInt(3) - 1)))
      val ccw = robustCcw(a, b, c)
      assert(robustCcw(c, b, a) == -ccw)
      assert(robustCcw(b, c, a) == ccw)
    }
  }

  test("orderedCcw properties (S2.cs:691-704)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val o = randomPoint(rnd)
      val a = randomPoint(rnd)
      val b = randomPoint(rnd)
      val c = randomPoint(rnd)
      // a==b or b==c => true
      assert(orderedCcw(a, a, c, o))
      assert(orderedCcw(a, c, c, o))
      // exactly one of orderedCcw(a,b,c,o) / orderedCcw(c,b,a,o) unless degenerate
      if (a != b && b != c && a != c) {
        val fwd = orderedCcw(a, b, c, o)
        val bwd = orderedCcw(c, b, a, o)
        assert(fwd || bwd)
      }
    }
  }

  test("triangle area identities (S2Test.cs:59-134)") {
    val x = S2Point(1, 0, 0)
    val y = S2Point(0, 1, 0)
    val z = S2Point(0, 0, 1)
    // octant: area Pi/2
    assert(math.abs(area(x, y, z) - math.Pi / 2) < 1e-12)
    assert(math.abs(girardArea(x, y, z) - math.Pi / 2) < 1e-12)
    // signed area positive for CCW, negative reversed
    assert(signedArea(x, y, z) > 0)
    assert(signedArea(z, y, x) < 0)
    assert(math.abs(signedArea(x, y, z) + signedArea(z, y, x)) < 1e-12)
    // degenerate: zero area
    assert(area(x, x, y) < 1e-15)
    // tiny triangle: area ~ planar area
    val eps = 1e-6
    val a = S2Point.normalize(S2Point(1, eps, 0))
    val b = S2Point.normalize(S2Point(1, 0, eps))
    val tiny = area(x, a, b)
    assert(math.abs(tiny - 0.5 * eps * eps) / (0.5 * eps * eps) < 1e-4)
  }

  test("true centroid sums linearly over subdivision (S2.cs:403-424)") {
    // small triangles: the asin-based weights assume edges < Pi/2 (matching
    // the reference test's sampling)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 100) {
      val center = randomPoint(rnd)
      def near() = S2Point.normalize(center + randomPoint(rnd) * 0.1)
      val a = near(); val b = near(); val c = near()
      val m = S2Point.normalize(b + c)
      val whole = trueCentroid(a, b, c)
      val sum = trueCentroid(a, b, m) + trueCentroid(a, m, c)
      assert(whole.approxEquals(sum, 1e-9))
    }
  }

  test("robustCrossProd is orthogonal and antisymmetric even for near-identical points") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 500) {
      val a = randomPoint(rnd)
      val b = S2Point.normalize(a + randomPoint(rnd) * 1e-15)
      val x = robustCrossProd(a, b)
      assert(x.norm > 0)
      assert(math.abs(S2Point.normalize(x).dot(a)) < 1e-9)
      // RCP(a,a) falls back to ortho: still nonzero and orthogonal
      val same = robustCrossProd(a, a)
      assert(same.norm > 0 && math.abs(S2Point.normalize(same).dot(a)) < 1e-9)
    }
  }
}
